#!/usr/bin/env python3
"""Synthesize an N-x stress corpus for the RELATIONAL (q) and TIME-SERIES
(ts) families — the two families tools/make_stress.py does not scale (it
replicates documents/embeddings only and copies the rest).

Replication is key-consistent so every join keeps its semantics:

 - lineitem/orders: copy k offsets l_orderkey/o_orderkey by k*10^10, so
   the order->lineitem join stays 1:n per copy and never crosses copies.
 - customer/part/supplier: keys offset by k*10^7 (and the corresponding
   foreign keys in orders/lineitem), so DIMENSIONS GROW WITH THE FACTS —
   the realistic shape (a 32x business has 32x customers), and exactly
   what stresses broadcast-side assumptions.
 - events: event_id offset k*10^12, user_id offset k*10^7, ts UNCHANGED —
   the per-hour THROUGHPUT axis (hourly frames keep their hour count but
   each hour holds N times the points) plus a linearly growing user
   population for the user-keyed sessionization windows.
 - nation/region: copied (25/5 rows — genuinely fixed-size dimensions).
 - documents/embeddings: copied from base (not this ladder's subject).
 - NAME columns (p_name/c_name/s_name): copy k > 0 ROTATES the first and
   last characters by k (copy 0 byte-identical). Without a perturbation
   every name exists N times verbatim, so fuzzy/record-linkage blocking
   buckets merge all copies and TRUE cross-copy matches make the output
   itself Theta(N^2) — a duplicate-heavy pathology, not a bigger
   business. A character ROTATION (vs a prefix tag) is a bijection on
   names, so the per-copy block-key SELECTIVITY is exactly the base
   corpus's (a "k~" prefix would collapse the 3-char prefix blocks to
   one useful character and re-create the quadratic inside each copy —
   measured: 28.5 s vs 7.6 s at the 8x rung), while cross-copy pairs
   differ at both blocking ends (edit distance >= 2, killed before
   levenshtein). Same idea as make_stress.py's per-copy document
   perturbation. (Rotation collides for copies 26 apart — a bounded x2
   merge on 2 of 32 copies, noted and accepted.)

Dates, statuses, prices and values are byte-identical per copy: the data
distribution is preserved, only the volume grows.

Usage: python3 tools/make_stress_rel.py <N> <outdir> [basedir=/root/testdata/sf0.1]
"""
import shutil
import sys
from pathlib import Path

import duckdb

N = int(sys.argv[1])
out = Path(sys.argv[2])
base = Path(sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
out.mkdir(parents=True, exist_ok=True)

con = duckdb.connect()


def wrap(col, k):
    """Per-copy name perturbation: copy 0 verbatim, copy k>0 is a whole-
    string Caesar rotation by k (translate over both alphabets). A full
    character bijection leaves EVERY within-copy comparison invariant —
    edit distances, equality, block-key selectivity — while rotating the
    copies into (near-)disjoint key spaces. Measured q38 ladder: verbatim
    names 204 s at 8x (cross-copy true matches, Theta(N^2) output);
    Caesar 21.4 s at 8x = 4.4x the 1x time for 8x the data."""
    if k == 0:
        return col
    lo = "abcdefghijklmnopqrstuvwxyz"
    r = k % 26
    rlo = lo[r:] + lo[:r]
    return (f"translate({col}, '{lo}{lo.upper()}', '{rlo}{rlo.upper()}')")


def replicate(table, sql_per_copy):
    union = "\nUNION ALL\n".join(
        sql_per_copy(k).replace("BASE", f"'{base}/{table}.parquet'")
        for k in range(N))
    con.sql(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


replicate("lineitem", lambda k: f"""
  SELECT l_orderkey + {k} * 10000000000::BIGINT AS l_orderkey,
    l_partkey + {k} * 10000000::BIGINT AS l_partkey,
    l_suppkey + {k} * 10000000::BIGINT AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM BASE""")

replicate("orders", lambda k: f"""
  SELECT o_orderkey + {k} * 10000000000::BIGINT AS o_orderkey,
    o_custkey + {k} * 10000000::BIGINT AS o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM BASE""")

replicate("customer", lambda k: f"""
  SELECT c_custkey + {k} * 10000000::BIGINT AS c_custkey,
    {wrap('c_name', k)} AS c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM BASE""")

replicate("part", lambda k: f"""
  SELECT p_partkey + {k} * 10000000::BIGINT AS p_partkey,
    {wrap('p_name', k)} AS p_name, p_brand, p_type, p_size, p_retailprice
  FROM BASE""")

replicate("supplier", lambda k: f"""
  SELECT s_suppkey + {k} * 10000000::BIGINT AS s_suppkey,
    {wrap('s_name', k)} AS s_name, s_nationkey, s_acctbal
  FROM BASE""")

replicate("events", lambda k: f"""
  SELECT event_id + {k} * 1000000000000::BIGINT AS event_id, ts,
    user_id + {k} * 10000000::BIGINT AS user_id, event_type, value, props
  FROM BASE""")

for t in ["nation", "region", "documents", "embeddings"]:
    shutil.copy(base / f"{t}.parquet", out / f"{t}.parquet")
    print(f"{t}: copied")
