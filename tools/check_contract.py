"""Local emulation of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark at sf0.01, run the matching
oracle_sql() on DuckDB over the same parquet, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_contract.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


import numpy as np
import pandas as pd


def norm_cell(x):
    """Dtype-aware normalization, matching the driver's hash semantics:
    a float64 3.0 and an int64 3 must NOT collapse to the same token
    (that collapse is exactly how the dd_substring HUGEINT->float64
    oracle bug shipped through this gate in round 3)."""
    if x is None or x is pd.NA or x is pd.NaT:
        return "NULL"
    if isinstance(x, (bool, np.bool_)):
        return f"b:{bool(x)}"
    if isinstance(x, (float, np.floating)):
        x = float(x)
        if math.isnan(x):
            return "f:nan"
        return f"f:{x!r}"
    if isinstance(x, (int, np.integer)):
        return f"i:{int(x)}"
    if isinstance(x, bytes):
        return "x:" + x.hex()
    if isinstance(x, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(v) for v in x) + "]"
    if isinstance(x, dict):
        return "{" + ",".join(f"{k}={norm_cell(v)}" for k, v in sorted(x.items())) + "}"
    return "s:" + str(x)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def frame_rows(df):
    """pandas DataFrame -> (cols, row tuples). Going through pandas on BOTH
    sides reproduces the driver's typing: DuckDB HUGEINT lands as float64
    here, exactly as it does in the driver's comparator."""
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False, name=None)]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=0,
                    help="check only the FIRST N registry entries in order "
                         "(the driver gate checks the first 50)")
    ap.add_argument("--json", default=None,
                    help="also write per-query results (driver-style rows/"
                         "schema/hash booleans) to this JSON file")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from knowledgegraphbuilder_spark.session import build_session

    spark = build_session("contract-check", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if args.window and args.names:
        ap.error("--window and explicit query names are mutually exclusive")
    names = list(qs)[: args.window] if args.window else (args.names or list(qs))
    failures = []
    record = {}
    for name in names:
        t0 = time.time()
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        record[name] = rec
        try:
            sdf = qs[name](spark, args.sf)
            scols, srows = frame_rows(sdf.toPandas())
            rec["spark_rows"] = len(srows)
        except Exception as e:
            failures.append(name)
            rec["err"] = f"spark error: {str(e)[:300]}"
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rec["err"] = "no oracle (rows-only)"
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            dcols, drows = frame_rows(res.df())
            rec["oracle_rows"] = len(drows)
        except Exception as e:
            failures.append(name)
            rec["err"] = f"duckdb error: {str(e)[:300]}"
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        ok = True
        rec["rows_match"] = len(sr) == len(dr)
        rec["schema_match"] = sc == dc
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            ok = False
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            ok = False
        elif sr != dr:
            diff_a = [r for r in sr if r not in set(dr)][:3]
            diff_b = [r for r in dr if r not in set(sr)][:3]
            print(f"FAIL  {name}: values differ; spark-only={diff_a} duck-only={diff_b}")
            ok = False
        else:
            rec["hash_match"] = True
        if ok:
            print(f"OK    {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    if args.json:
        import json as _json

        with open(args.json, "w") as f:
            _json.dump(record, f, indent=1)
    print("\n==", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
