#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against views
over the sfDir parquet tables, loads the Spark result parquet from
<verifyOutDir>/<name>/, normalizes (sort columns by name, sort rows,
round floats), and reports PASS/FAIL per query.
"""
import json
import math
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(x):
    if x is None:
        return ("None",)
    if isinstance(x, Decimal):
        x = float(x)
    if isinstance(x, float):
        if math.isnan(x):
            return ("nan",)
        return ("f", round(x, 6))
    if isinstance(x, (list, tuple)) or type(x).__name__ == "ndarray":
        return ("l",) + tuple(norm_cell(v) for v in x)
    if isinstance(x, bytes):
        return ("b", x.hex())
    return (type(x).__name__[:1], str(x))


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    # optional: --json <path> writes a driver-schema per-query artifact
    # (rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) —
    # the engine-side correctness witness each certification commits so
    # an empty/glitched driver artifact is adjudicable by diff
    # (r13: CORRECTNESS_r13.json arrived empty and the only recovery was
    # a judge re-run).
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or args[i + 1].startswith("q_"):
            raise SystemExit("usage: check.py <sfDir> <outDir> [query ...]"
                             " [--json <out.json>]")
        json_out = args[i + 1]
        del args[i:i + 2]
    if len(args) < 2:
        raise SystemExit("usage: check.py <sfDir> <outDir> [query ...]"
                         " [--json <out.json>]")
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            oc = con.execute(sql)
            ocols = [d[0].lower() for d in oc.description]
            orows = oc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            record(name, False, False, False, err=f"oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            sc = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0].lower() for d in sc.description]
            srows = sc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:200]}")
            record(name, False, False, False, oracle_rows=len(orows),
                   err=f"spark result missing: {str(e)[:200]}")
            n_fail += 1
            continue
        oc2, on = norm_rows(ocols, orows)
        sc2, sn = norm_rows(scols, srows)
        if oc2 != sc2:
            print(f"FAIL {name}: columns differ oracle={oc2} spark={sc2}")
            record(name, len(on) == len(sn), False, False,
                   spark_rows=len(sn), oracle_rows=len(on),
                   err="columns differ")
            n_fail += 1
            continue
        if len(on) != len(sn):
            print(f"FAIL {name}: row count oracle={len(on)} spark={len(sn)}")
            record(name, False, True, False,
                   spark_rows=len(sn), oracle_rows=len(on), err=None)
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(on, sn)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(on)} rows differ; first at {i}:\n  oracle={a}\n  spark ={b}")
            record(name, True, True, False,
                   spark_rows=len(sn), oracle_rows=len(on), err=None)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(on)} rows)")
            record(name, True, True, True,
                   spark_rows=len(sn), oracle_rows=len(on), err=None)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"== witness written: {json_out} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
