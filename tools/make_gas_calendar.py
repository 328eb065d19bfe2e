#!/usr/bin/env python3
"""Synthesize a CALENDAR-AXIS gas fixture: many consecutive THIN day files
(round-12 verdict item 3). Every ladder so far scales rows-per-day or rate
over the fixture's 13 day-partitions; 100 TB is YEARS of partitions, and
the classic failure there is driver-side planning — file listing, footer
reads, partition pruning over 1,000+ date partitions. This fixture isolates
that axis: partition COUNT grows, per-day volume stays tiny, so any
super-linear cost is planning/listing/pruning, never data.

Day files are consecutive real dates starting 2016-10-07 (the reference's
day-file naming), `rows` samples each at 1-second spacing, same 20-column
header/value envelope as make_gas.py. Deterministic (seeded).

Usage: python3 tools/make_gas_calendar.py <days> <rows_per_day> <outdir>
  calendar rung: days=1100 rows=256  (~282k rows over 3 years of partitions)
Then: java ... graft.CalendarBench <outdir> <workdir>  -> one JSON line
(CLADDER.json precedent: tools/vladder.py combines rungs).
"""
import datetime
import sys
from pathlib import Path

import numpy as np

HEADER = ("Time (s),CO (ppm),Humidity (%r.h.),Temperature (C),"
          "Flow rate (mL/min),Heater voltage (V)," +
          ",".join(f"R{i} (MOhm)" for i in range(1, 15)))

days = int(sys.argv[1])
rows = int(sys.argv[2])
out = Path(sys.argv[3])
out.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(13)
start = datetime.date(2016, 10, 7)

t = np.round(np.arange(rows, dtype=np.float64), 2)  # 1 Hz, tiny days
for d in range(days):
    day = start + datetime.timedelta(days=d)
    name = f"{day.strftime('%Y%m%d')}_210000.csv"
    cols = [t] + [np.round(rng.uniform(lo, hi, rows), 4)
                  for lo, hi in [(0, 20), (10, 80), (15, 35), (180, 260),
                                 (0.2, 0.9)] + [(0.1, 60)] * 14]
    arr = np.column_stack(cols)
    with open(out / name, "w") as f:
        f.write(HEADER + "\n")
        np.savetxt(f, arr, delimiter=",", fmt="%.4f")
print(f"{days} day files x {rows} rows -> {out}")
