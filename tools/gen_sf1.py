#!/usr/bin/env python3
"""Generate an sf1-scale bench corpus (10x sf0.1) at /tmp/graft_sf1.

Replicates the driver's sf0.1 tables 10x with key shifts that keep
referential integrity inside each replica (orders<->lineitem,
customer/part/supplier keys shift together); text payloads replicate
VERBATIM — a duplicate-heavy corpus is the realistic web-scale shape and
exactly what the r9 hot-bucket discipline is built for. Fixed-slice
queries (doc_id < 250 ingest batches, vec_id < 10 probes) keep their
original rows: batch/probe sizes stay constant while the corpus grows
10x, which is the production scaling story those queries claim.

Driver-side tooling only (duckdb), like check.py. Output parquet is one
file per table, readable by graft.Tables.
"""
import os
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
SHIFT = 10_000_000
REPLICAS = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

SHIFTS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY = ["nation", "region", "events"]

for t, keys in SHIFTS.items():
    src = f"{SRC}/{t}.parquet"
    cols = [c[0] for c in con.execute(
        f"SELECT * FROM '{src}' LIMIT 0").description]
    arms = []
    for i in range(REPLICAS):
        sel = ", ".join(
            f"{c} + {i * SHIFT} AS {c}" if c in keys else c for c in cols)
        arms.append(f"SELECT {sel} FROM '{src}'")
    union = "\nUNION ALL\n".join(arms)
    con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

for t in COPY:
    src = f"{SRC}/{t}.parquet"
    if os.path.exists(src):
        con.execute(
            f"COPY (SELECT * FROM '{src}') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
