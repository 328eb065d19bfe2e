#!/usr/bin/env python3
"""Synthesize an N-x stress corpus from sf0.1 for the scale-up experiment
(PLANS.md "Scale-up experiment").

Replicates documents and embeddings N times with per-copy perturbation so
near-dup/ANN semantics stay realistic instead of exploding quadratically:

 - documents, copy k>0: every 3rd word gets a "~k" suffix and a "copyk"
   marker word is prepended.  Within-copy near-dup pairs survive (the same
   positional mutation hits both sides of a pair), while cross-copy shingle
   overlap drops to ~0, so the MinHash/SimHash pair count grows ~linearly
   in N -- matching what a genuinely larger crawl looks like.
 - embeddings, copy k>0: a copy-specific orthogonal transform (cyclic
   dimension rotation by k plus a deterministic sign-flip mask).  Norms and
   within-copy angles are preserved (cosine structure intact); copies land
   in different hyperplane-LSH buckets instead of stacking into one.
 - ids offset by k * 10_000_000 (divisible by 100 and 4, so the vec_id%100
   query selection and doc_id%2/%4/%5 container formulas keep the same
   per-copy mix).

Other tables are copied from the base dir unchanged (the heavy queries
under test -- tx05/tx08/tx11/tx14, v01-v08 -- read only documents and
embeddings).

Usage: python3 tools/make_stress.py <N> <outdir> [basedir=/root/testdata/sf0.1]
"""
import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OFFSET = 10_000_000


def perturb_text(text: str, k: int) -> str:
    words = text.split(" ")
    mutated = [w if i % 3 else f"{w}~{k}" for i, w in enumerate(words)]
    return f"copy{k} " + " ".join(mutated)


def replicate_documents(base: Path, out: Path, n: int) -> int:
    t = pq.read_table(base / "documents.parquet")
    doc_id = t["doc_id"].to_pylist()
    text = t["text"].to_pylist()
    lang = t["lang"].to_pylist()
    source = t["source"].to_pylist()
    n_chars = t["n_chars"].to_pylist()
    ids, texts, langs, sources, chars = [], [], [], [], []
    for k in range(n):
        off = k * OFFSET
        ids.extend(d + off for d in doc_id)
        if k == 0:
            texts.extend(text)
        else:
            texts.extend(perturb_text(s, k) for s in text)
        langs.extend(lang)
        sources.extend(source)
        # n_chars mirrors the text column (tx03 quality uses it)
        if k == 0:
            chars.extend(n_chars)
        else:
            chars.extend(len(s) for s in texts[-len(text):])
    out_t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(chars, pa.int64()),
        }
    )
    pq.write_table(out_t, out / "documents.parquet")
    return out_t.num_rows


def replicate_embeddings(base: Path, out: Path, n: int) -> int:
    t = pq.read_table(base / "embeddings.parquet")
    vec_id = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    label = np.asarray(t["label"].to_pylist(), dtype=np.int32)
    dim = emb.shape[1]
    ids, vecs, labels = [], [], []
    rng_mask = np.zeros((n, dim), dtype=np.float32)
    for k in range(n):
        # deterministic +-1 mask per copy (orthogonal diagonal transform)
        rng_mask[k] = np.where((np.arange(dim) * 2654435761 + k * 40503) % 7 < 3, -1.0, 1.0)
    for k in range(n):
        ids.append(vec_id + k * OFFSET)
        if k == 0:
            vecs.append(emb)
        else:
            vecs.append(np.roll(emb, k % dim, axis=1) * rng_mask[k])
        labels.append(label)
    all_vecs = np.concatenate(vecs)
    out_t = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids)),
            "embedding": pa.array(list(all_vecs), pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(labels)),
        }
    )
    pq.write_table(out_t, out / "embeddings.parquet")
    return out_t.num_rows


def replicate_events(base: Path, out: Path, n: int) -> int:
    """N-x events by TIME EXTENSION: copy k is shifted k spans later, so
    the series get N× LONGER rather than N× denser — the axis that
    stresses the per-series operators (ts35's pairwise slopes grow with
    days², ts2x windows with days). event_ids offset per copy; user_ids
    and event_types unchanged so series/cohort identities persist across
    the extended timeline (a genuinely longer history, not new users).
    Handles both shipped events schemas (int64-nanos and timestamp ts).
    """
    t = pq.read_table(base / "events.parquet")
    cols = {name: t[name] for name in t.column_names}
    ts = cols["ts"]
    is_int_ns = pa.types.is_integer(ts.type)
    ts_np = np.asarray(ts.to_pylist())
    if not is_int_ns:  # timestamp -> ns int for shifting
        ts_np = np.asarray(ts.cast(pa.int64()).to_pylist())
    day_ns = 86_400_000_000_000
    span = (ts_np.max() - ts_np.min() + day_ns) // day_ns * day_ns
    eid = np.asarray(cols["event_id"].to_pylist(), dtype=np.int64)
    parts = []
    for k in range(n):
        shifted = dict(cols)
        new_ts = ts_np + k * span
        shifted["ts"] = (pa.array(new_ts, pa.int64()) if is_int_ns
                         else pa.array(new_ts, pa.int64()).cast(ts.type))
        shifted["event_id"] = pa.array(eid + k * OFFSET, pa.int64())
        parts.append(pa.table(shifted))
    out_t = pa.concat_tables(parts)
    pq.write_table(out_t, out / "events.parquet")
    return out_t.num_rows


def replicate_part(base: Path, out: Path, n: int) -> int:
    """N-x part with id offsets: copy k's keys live at k·10M, widening the
    key space to 8-9 digits — q43's digit-trim recursion DEPTH grows as
    log10 of the widest key (the property under test), while row count
    grows linearly."""
    t = pq.read_table(base / "part.parquet")
    cols = {name: t[name] for name in t.column_names}
    pk = np.asarray(cols["p_partkey"].to_pylist(), dtype=np.int64)
    parts = []
    for k in range(n):
        shifted = dict(cols)
        shifted["p_partkey"] = pa.array(pk + k * OFFSET, pa.int64())
        parts.append(pa.table(shifted))
    out_t = pa.concat_tables(parts)
    pq.write_table(out_t, out / "part.parquet")
    return out_t.num_rows


def main() -> None:
    n = int(sys.argv[1])
    out = Path(sys.argv[2])
    base = Path(sys.argv[3]) if len(sys.argv) > 3 else Path("/root/testdata/sf0.1")
    out.mkdir(parents=True, exist_ok=True)
    nd = replicate_documents(base, out, n)
    ne = replicate_embeddings(base, out, n)
    nv = replicate_events(base, out, n)
    npart = replicate_part(base, out, n)
    for f in base.glob("*.parquet"):
        if f.name not in ("documents.parquet", "embeddings.parquet",
                          "events.parquet", "part.parquet"):
            shutil.copy(f, out / f.name)
    print(f"{out}: {nd} documents, {ne} embeddings, {nv} events, "
          f"{npart} parts ({n}x {base})")


if __name__ == "__main__":
    main()
