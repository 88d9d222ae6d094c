"""Local twin of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its
``oracle_sql()`` twin on DuckDB at the same sf, then compare
row count + column names + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    """Sort columns by name, normalize values, sort rows — the
    order-insensitive comparison shape."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.6f}".rstrip("0").rstrip(".")
            elif hasattr(v, "quantize"):  # Decimal
                v = f"{float(v):.6f}".rstrip("0").rstrip(".")
            elif v is None:
                v = "NULL"
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in order], out


def oracle_connection(sf_dir: str):
    """DuckDB connection with the standard table views registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_query(spark, con, name: str, sf_dir: str) -> str | None:
    """Run one gate query on Spark and its oracle on DuckDB, compare
    (columns, rowcount, order-insensitive values). Returns None on
    match, else a failure description. Importable — pytest uses this
    to oracle-check the queries outside the driver's window."""
    import __spark_entry__ as entry

    fn = entry.queries()[name]
    oracles = entry.oracle_sql()
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in oracles:
        return None  # rows-only query
    res = con.execute(oracles[name])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    sc, sv = normalize([tuple(r) for r in srows], scols)
    dc, dv = normalize(drows, dcols)
    if sc != dc:
        return f"columns {sc} != {dc}"
    if len(sv) != len(dv):
        return f"rowcount {len(sv)} != {len(dv)}"
    if sv != dv:
        diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
        return f"values differ, first diffs: {diff}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry

    unknown = only - set(entry.queries())
    if unknown:
        # silently matching an empty set would report success for a
        # query that was never wired into queries() — fail loudly
        print(f"unknown queries (not in __spark_entry__.queries()): {sorted(unknown)}")
        sys.exit(2)
    from tmdataloader_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = oracle_connection(sf_dir)

    failed = []
    for name in entry.queries():
        if only and name not in only:
            continue
        try:
            err = check_query(spark, con, name, sf_dir)
        except Exception as e:
            err = f"error: {e}"
        if err:
            print(f"FAIL  {name}: {err}")
            failed.append(name)
        else:
            print(f"ok    {name}")
    print()
    if failed:
        print(f"FAILED ({len(failed)}): {', '.join(failed)}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
