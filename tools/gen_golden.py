#!/usr/bin/env python3
"""Regenerate the pandas golden fixtures under src/test/resources/golden/
(differential targets for Interpolate.linear and QuantileBucket.qcut3).
Deterministic: seeded. Run from the repo root."""
import pandas as pd
import numpy as np
import random

random.seed(1234); np.random.seed(1234)

rows = []
for g in range(40):
    n = random.randint(1, 12)
    vals = [round(random.uniform(-50, 50), 3) if random.random() > 0.45 else None
            for _ in range(n)]
    s = pd.Series(vals, dtype="float64").interpolate()
    for i, (inp, out) in enumerate(zip(vals, s.tolist())):
        rows.append((f"g{g:02d}", i, inp, None if pd.isna(out) else round(out, 9)))
pd.DataFrame(rows, columns=["g", "i", "v_in", "v_expected"]).to_csv(
    "src/test/resources/golden/interpolate.csv", index=False)

rows = []
for g in range(40):
    n = random.randint(1, 15)
    pool = [round(random.uniform(0, 10), 2) for _ in range(3)]
    vals = [random.choice(pool) if random.random() < 0.5
            else round(random.uniform(0, 10), 3) for _ in range(n)]
    ser = pd.Series(vals, dtype="float64")
    binned, bins = pd.qcut(ser, 3, retbins=True, duplicates="drop")
    nb = len(bins) - 1
    if nb == 0:
        continue  # constant group: undefined in the reference (would crash)
    labels = {1: ["Low"], 2: ["Low", "High"], 3: ["Low", "Medium", "High"]}[nb]
    lab = pd.qcut(ser, 3, labels=False, duplicates="drop")
    interior = bins[1:-1]
    for i, (v, x) in enumerate(zip(vals, lab)):
        # within an ulp of an interior edge, pandas' and Spark/DuckDB's lerp
        # arithmetic legitimately differ in the last bit -> flag, don't drop
        # (all rows must still feed the bucketing)
        sensitive = any(abs(v - e) < 1e-9 for e in interior)
        rows.append((f"g{g:02d}", i, v,
                     labels[int(x)] if not pd.isna(x) else None,
                     1 if sensitive else 0))
pd.DataFrame(rows, columns=["g", "i", "v", "bucket", "edge_sensitive"]).to_csv(
    "src/test/resources/golden/qcut.csv", index=False)
print("regenerated golden fixtures")
