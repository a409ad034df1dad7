#!/bin/sh
# Round-gate skew smoke: the capped near-dup/ANN operators under an
# injected hot key (2x-of-linear budget) plus connected components with
# reliable checkpoints at 10x (log-bounded rounds). Env-gated out of plain
# `sbt test` because it is timing-based — THIS script is how it runs every
# round. Tees the log to SMOKE_r${ROUND:-X}.log so the round artifacts
# carry the evidence that the gate ran and passed.
cd /root/repo || exit 1
out="SMOKE_r${ROUND:-X}.log"
SPARK_GRAFT_SMOKE=1 sbt -batch "testOnly graft.ScaleSmokeSpec" 2>&1 \
  | grep -vE "^\[error\] 2[0-9]" | tee "$out.tmp"
status=$?
# keep only the informative tail (suite output, not the sbt/spark preamble)
grep -E "^\[info\]" "$out.tmp" | tail -40 > "$out"
rm -f "$out.tmp"
exit $status
