#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then compares
row count, column-name set, and an order-insensitive value hash (rows sorted
by all columns, floats pre-rounded by the queries themselves).

Usage: python tools/check_correctness.py [--out FILE] [sf_dir] [name ...]

``--out FILE`` additionally writes the full per-gate result map as a
JSON artifact (committed per round as CORRECTNESS_LOCAL.json so
registry-vs-driver-artifact drift is visible in-repo).
"""

from __future__ import annotations

import hashlib
import json
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple]) -> str:
    canon = sorted(repr(tuple(r)) for r in rows)
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def normalize(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def main():
    args = sys.argv[1:]
    out_path = None
    if args and args[0] == "--out":
        out_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from websearchengine_spark.session import get_spark

    spark = get_spark("local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        entry = {"status": "?"}
        try:
            sdf = fn(spark, sf_dir)
            srows = [
                tuple(normalize(v) for v in r) for r in sdf.collect()
            ]
            scols = sdf.columns
            if name not in sqls:
                entry.update(
                    status="rows_only", spark_rows=len(srows), cols=scols
                )
                results[name] = entry
                print(f"{name:24s} rows_only  rows={len(srows)}")
                continue
            ddf = con.sql(sqls[name])
            drows = [
                tuple(normalize(v) for v in r) for r in ddf.fetchall()
            ]
            dcols = [d[0] for d in ddf.description]
            ok_rows = len(srows) == len(drows)
            ok_cols = sorted(scols) == sorted(dcols)
            # column-order alignment: sort columns by name on both sides
            sidx = [scols.index(c) for c in sorted(scols)]
            didx = [dcols.index(c) for c in sorted(dcols)]
            sh = value_hash([tuple(r[i] for i in sidx) for r in srows])
            dh = value_hash([tuple(r[i] for i in didx) for r in drows])
            ok_hash = sh == dh
            entry.update(
                status="match" if (ok_rows and ok_cols and ok_hash) else "MISMATCH",
                spark_rows=len(srows),
                duck_rows=len(drows),
                cols_ok=ok_cols,
                hash_ok=ok_hash,
            )
            print(
                f"{name:24s} {entry['status']:9s} rows={len(srows)}/{len(drows)}"
                f" cols_ok={ok_cols} hash_ok={ok_hash}"
            )
            if not ok_hash and ok_rows and ok_cols:
                s_set = set(tuple(r[i] for i in sidx) for r in srows)
                d_set = set(tuple(r[i] for i in didx) for r in drows)
                print("   spark-only:", list(s_set - d_set)[:3])
                print("   duck-only :", list(d_set - s_set)[:3])
        except Exception as e:
            entry.update(status="ERROR", error=f"{type(e).__name__}: {e}")
            print(f"{name:24s} ERROR      {type(e).__name__}: {e}")
        results[name] = entry

    n_bad = sum(1 for v in results.values() if v["status"] in ("MISMATCH", "ERROR"))
    print(json.dumps({"total": len(results), "bad": n_bad}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "total": len(results),
                    "bad": n_bad,
                    "gates": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
