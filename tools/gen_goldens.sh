#!/bin/sh
# Regenerate the golden parquets for the approximate-by-design queries
# (d04, d05, e04, e06, q34) at sf0.01. Commit the result ONLY after
# checking the diff is an intentional behavior change.
cd /root/repo && sbt -batch "runMain graft.GenGoldens ${1:-/root/testdata/sf0.01}"
