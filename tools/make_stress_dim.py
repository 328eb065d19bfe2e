#!/usr/bin/env python3
"""Widen the embeddings table to a production dimensionality (round-11
verdict item 8): every vector-family measurement so far ran on 64-dim
embeddings; real corpora run 512-4096 dims, which multiplies the dot-product
cost and the shuffle width. This generator keeps n (and vec_id/label)
IDENTICAL and widens each vector from 64 to <dim> by tiling the base vector
with per-block deterministic transforms (cyclic roll by the block index +
a +-1 sign mask, the make_stress.py family's trick): norms scale by
sqrt(blocks), within-corpus angle structure is preserved block-wise, and no
two blocks are equal, so nothing degenerates into repeated coordinates.

All other tables are copied unchanged. The rung isolates the d-axis: same
vectors count, same query count, d x wider arithmetic.

Usage: python3 tools/make_stress_dim.py <dim> <outdir> [basedir=/root/testdata/sf0.1]
"""
import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

dim = int(sys.argv[1])
out = Path(sys.argv[2])
base = Path(sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
out.mkdir(parents=True, exist_ok=True)

t = pq.read_table(base / "embeddings.parquet")
emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
d0 = emb.shape[1]
assert dim % d0 == 0, f"target dim {dim} must be a multiple of base {d0}"
blocks = []
for b in range(dim // d0):
    mask = np.where((np.arange(d0) * 2654435761 + b * 40503) % 7 < 3,
                    -1.0, 1.0).astype(np.float32)
    blocks.append(np.roll(emb, b % d0, axis=1) * mask)
wide = np.concatenate(blocks, axis=1)
out_t = pa.table({
    "vec_id": t["vec_id"],
    "embedding": pa.array(list(wide), pa.list_(pa.float32())),
    "label": t["label"],
})
pq.write_table(out_t, out / "embeddings.parquet")
for f in base.glob("*.parquet"):
    if f.name != "embeddings.parquet":
        shutil.copy(f, out / f.name)
print(f"{out}: {out_t.num_rows} embeddings at dim {dim} (base {d0}, n unchanged)")
