#!/usr/bin/env python3
"""Synthesize a full UCI-gas-sensor-scale input for the ingest benchmark
(BASELINE.md "effective reference envelope"): 13 day files, 3.5 Hz for
~25 h each (the pipeline's 24 h filter trims the tail), 20 columns
(Time (s) + 19 float channels) — ~4.1 M raw rows, ~3.9 M kept, matching
the reference's README.md:43-46 dataset shape. Deterministic (seeded).

Usage: python3 tools/make_gas.py <outdir>
"""
import sys
from pathlib import Path

import numpy as np

HEADER = ("Time (s),CO (ppm),Humidity (%r.h.),Temperature (C),"
          "Flow rate (mL/min),Heater voltage (V)," +
          ",".join(f"R{i} (MOhm)" for i in range(1, 15)))

out = Path(sys.argv[1])
out.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(7)

for day in range(13):
    name = f"201610{7 + day:02d}_210000.csv"
    n = int(3.5 * 3600 * 25)  # ~25 h at 3.5 Hz -> 24 h kept after filter
    t = np.round(np.arange(n) / 3.5, 2)
    cols = [t] + [np.round(rng.uniform(lo, hi, n), 4)
                  for lo, hi in [(0, 20), (10, 80), (15, 35), (180, 260),
                                 (0.2, 0.9)] + [(0.1, 60)] * 14]
    arr = np.column_stack(cols)
    with open(out / name, "w") as f:
        f.write(HEADER + "\n")
        np.savetxt(f, arr, delimiter=",", fmt="%.4f")
    print(name, n, "rows")
