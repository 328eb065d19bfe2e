#!/usr/bin/env python3
"""Combine per-rung Bench artifacts into the vector-family cost ladder
(VLADDER.json) — round-10 verdict item 8: the 100 TB extrapolation claims
in PLANS.md should ride measured curves, not prose.

Usage: python3 tools/vladder.py out.json rung1.json:label1 rung2.json:label2 ...
Each rung file is a Bench BENCH_FULL.json (full per-query map).
"""
import json
import sys

out = sys.argv[1]
rungs = []
for spec in sys.argv[2:]:
    path, label = spec.rsplit(":", 1)
    d = json.load(open(path))
    rungs.append({
        "label": label,
        "sf": d.get("sf"),
        "queries": d.get("queries"),
        "repeat": d.get("repeat"),
    })
combined = {"metric": "vector_cost_ladder", "rungs": rungs}
# per-query scaling factors vs the first rung, for the curve readout
base = rungs[0]["queries"]
for r in rungs[1:]:
    r["x_vs_base"] = {
        q: (round(r["queries"][q] / base[q], 2)
            if base.get(q, 0) > 0 and r["queries"].get(q, 0) > 0 else None)
        for q in r["queries"]
    }
json.dump(combined, open(out, "w"), indent=1)
print(f"wrote {out}: {[r['label'] for r in rungs]}")
