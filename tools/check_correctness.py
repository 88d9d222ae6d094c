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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from tmdataloader_spark.session import get_spark

    spark = get_spark("check-correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"nooracle {name}: rows={len(srows)} (rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        sc, sv = normalize([tuple(r) for r in srows], scols)
        dc, dv = normalize(drows, dcols)
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} != {dc}")
            failed.append(name)
        elif len(sv) != len(dv):
            print(f"FAIL  {name}: rowcount {len(sv)} != {len(dv)}")
            failed.append(name)
        elif sv != dv:
            diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL  {name}: values differ, first diffs: {diff}")
            failed.append(name)
        else:
            print(f"ok    {name}: {len(sv)} rows")
    print()
    if failed:
        print(f"FAILED ({len(failed)}): {', '.join(failed)}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
