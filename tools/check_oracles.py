"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, then
compare row-count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from typical_spark.session import get_spark
from typical_spark.sources.tables import TABLE_NAMES


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # accept bare names, comma lists, and an optional --only flag; an
    # unknown name is a hard error — a typo'd filter must not report a
    # vacuous FAILURES: 0
    only = {
        n
        for a in sys.argv[2:]
        if a != "--only"
        for n in a.split(",")
        if n
    }
    known = set(entrymod.queries())
    unknown = only - known
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        rel = con.sql(oracles[name])
        ocols = [d[0] for d in rel.description]
        orows = rel.fetchall()
        ok_schema = sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols)
        sset = rows_to_multiset([c.lower() for c in scols], srows)
        oset = rows_to_multiset([c.lower() for c in ocols], orows)
        ok = ok_schema and sset == oset
        status = "OK " if ok else "FAIL"
        print(f"[{status}] {name}: spark={len(srows)} oracle={len(orows)} schema_match={ok_schema}")
        if not ok:
            failures += 1
            if not ok_schema:
                print(f"    spark cols:  {scols}\n    oracle cols: {ocols}")
            sd = [r for r in sset if r not in oset][:3]
            od = [r for r in oset if r not in sset][:3]
            for r in sd:
                print(f"    spark-only:  {r}")
            for r in od:
                print(f"    oracle-only: {r}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
