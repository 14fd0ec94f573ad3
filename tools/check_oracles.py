"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() side-by-side at sf0.01,
compare row count, column names, and the order-insensitive multiset of
stringified rows.

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from ethereum_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def row_key(row):
    return tuple(norm(v) for v in row)


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark("oracle-check")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            cur = con.execute(oracles[name])
            dall = cur.fetchall()
            rawcols = [d[0] for d in cur.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        dcols = sorted(rawcols)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} != {dcols}")
            failures.append(name)
            continue
        if len(srows) != len(dall):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(dall)}")
            failures.append(name)
            continue
        order = [rawcols.index(c) for c in dcols]
        sset = sorted(row_key([r[c] for c in scols]) for r in srows)
        dset = sorted(row_key([r[i] for i in order]) for r in dall)
        if sset != dset:
            bad = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            failures.append(name)
            continue
        tag = "ok  " if len(srows) else "ok0 "
        print(f"{tag} {name}: {len(srows)} rows match")
        if len(srows) == 0:
            print(f"WARN {name}: 0 rows (trivially matching)")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall checked queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
