#!/usr/bin/env python3
"""Synthesize gas day-file CSVs at a parameterizable sample rate for the
STREAMING cost ladder (SLADDER.json — round-10 verdict item 6): the gs
family's "state bounded by construction" claims, proven the way
GLADDER/VLADDER did for graph/vector — by measuring the same queries at
1x/8x/32x the per-window THROUGHPUT. Windows (1 h / 2 h / 6 h) and fields
stay fixed; only rows-per-window grows, which is exactly the axis a
bounded-state streaming aggregate must be flat against (state rows) and
linear against (wall clock).

One ~24 h day file at `hz` samples/s, 20 columns (the reference's day-file
shape, same header/value envelopes as make_gas.py). Deterministic (seeded).

Usage: python3 tools/make_gas_stress.py <hz> <outdir> [days=1]
  1x rung: hz=3.5 (~302k rows), 8x: hz=28 (~2.4M), 32x: hz=112 (~9.7M)
Then: java ... -Dgraft.gas.fixture.dir=<outdir> graft.Bench --repeat 1 gs22
(repeat 1: each gs helper memoizes its streamed sink per session, so only
the FIRST pass pays — and therefore measures — the streaming execution).

days > 1 (round-13: the streaming kill/restart spec) emits that many
CONSECUTIVE day files — the file-per-micro-batch axis the exactly-once
recovery claim needs (with maxFilesPerTrigger=1 each day is one batch, so
a kill can land between / inside batches and the restart has real work).
Day 1 is byte-identical to the single-day fixture at the same hz.
"""
import datetime
import sys
from pathlib import Path

import numpy as np

HEADER = ("Time (s),CO (ppm),Humidity (%r.h.),Temperature (C),"
          "Flow rate (mL/min),Heater voltage (V)," +
          ",".join(f"R{i} (MOhm)" for i in range(1, 15)))

hz = float(sys.argv[1])
out = Path(sys.argv[2])
days = int(sys.argv[3]) if len(sys.argv) > 3 else 1
out.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(11)

n = int(hz * 86400)  # exactly 24 h: every row survives the <= 86400 filter
t = np.round(np.arange(n) / hz, 4)
start = datetime.date(2016, 10, 7)
for day in range(days):
    # real calendar arithmetic (round-13 ADVICE): the old f"201610{7+day}"
    # silently produced invalid dates (20161032) past Oct 31 instead of
    # rolling into November, corrupting the filename-derived _time
    name = f"{(start + datetime.timedelta(days=day)).strftime('%Y%m%d')}_210000.csv"
    cols = [t] + [np.round(rng.uniform(lo, hi, n), 4)
                  for lo, hi in [(0, 20), (10, 80), (15, 35), (180, 260),
                                 (0.2, 0.9)] + [(0.1, 60)] * 14]
    arr = np.column_stack(cols)
    with open(out / name, "w") as f:
        f.write(HEADER + "\n")
        np.savetxt(f, arr, delimiter=",", fmt="%.4f")
    print(name, n, "rows ->", out)
