"""round6_ratio (functions/ratio.py): Spark and DuckDB twins must
agree on adversarial exact-half fractions where plain
round(num/den, 6) provably splits between engines (the r7
lm_perplexity class)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (num, den): the first two are the live lm_perplexity case and its
# positive mirror — exact −3.4140895 / +3.4140895; then assorted
# halves of both parities, non-halves, negatives, and big values
CASES = [
    (-327752592, 96000000),
    (327752592, 96000000),
    (1, 2000000),        # 0.0000005 -> 0.000001 (HALF_UP)
    (3, 2000000),        # 0.0000015 -> 0.000002
    (-1, 2000000),       # -0.0000005 -> -0.000001 (away from zero)
    (5, 4000000),        # 0.00000125 -> 0.000001
    (7, 3),              # non-terminating
    (123456789, 97),
    (-999999999999, 7),  # |num| near the documented bound / 4600
    (0, 5),
]


def _py_half_up(num: int, den: int) -> float:
    n6 = 2 * abs(num) * 1_000_000 + den
    micro = n6 // (2 * den)
    if num < 0:
        micro = -micro
    return micro / 1e6


def test_round6_ratio_spark_duckdb_python_agree(spark):
    from tmdataloader_spark.functions.ratio import round6_ratio, round6_ratio_sql

    df = spark.createDataFrame(CASES, "num long, den long")
    got = {
        (r.num, r.den): r.v
        for r in df.select("num", "den", round6_ratio("num", "den").alias("v")).collect()
    }
    con = duckdb.connect()
    for num, den in CASES:
        expr = round6_ratio_sql("num", "den")
        (dv,) = con.execute(
            f"SELECT {expr} FROM (SELECT CAST({num} AS BIGINT) num, "
            f"CAST({den} AS BIGINT) den)"
        ).fetchone()
        assert got[(num, den)] == dv == _py_half_up(num, den), (num, den)


def test_plain_round_diverges_across_engines_on_the_live_case(spark):
    """Documents WHY the helper exists: (−327752592/1e6)/96 is the
    SAME double on both engines (a hair closer to zero than the true
    −3.4140895), yet Spark's round (BigDecimal HALF_UP of the exact
    binary value → −3.414089) and DuckDB's round (multiply by 1e6
    first, which re-rounds onto the exact half, then half-away-from-
    zero → −3.41409) disagree by one micro-unit — the r7 sf0.1
    lm_perplexity failure."""
    from pyspark.sql import functions as F

    (srow,) = (
        spark.range(1)
        .select(
            F.round(
                (F.lit(-327752592).cast("long") / F.lit(1000000.0))
                / F.lit(96).cast("long"),
                6,
            ).alias("v")
        )
        .collect()
    )
    con = duckdb.connect()
    (duck,) = con.execute(
        "SELECT round((CAST(-327752592 AS BIGINT) / 1000000.0) / 96, 6)"
    ).fetchone()
    assert srow.v != duck  # the split the integer form removes


def test_round6_ratio_agrees_on_pseudo_random_batch(spark):
    """500 seeded pseudo-random fractions (md5-derived, no RNG state)
    including forced half-boundary constructions — one Spark job, one
    DuckDB VALUES scan, exact三-way agreement with the Python twin."""
    import hashlib

    cases = []
    for i in range(500):
        h = hashlib.md5(f"ratio:{i}".encode()).digest()
        # stay inside the documented int64-path bound |num| <= ~4.6e12
        num = int.from_bytes(h[:6], "big") % 4_000_000_000_000
        if h[5] % 2:
            num = -num
        den = int.from_bytes(h[6:10], "big") % 999_983 + 1
        if i % 5 == 0:
            # force an exact .5 micro-unit boundary: with
            # den = 2e6·t and num = (2m+1)·t, num·1e6/den = m + 1/2
            t = int.from_bytes(h[12:14], "big") % 50 + 1
            m = int.from_bytes(h[10:12], "big")
            den = 2_000_000 * t
            num = (2 * m + 1) * t
            if h[9] % 2:
                num = -num
        cases.append((num, den))
    df = spark.createDataFrame(cases, "num long, den long")
    from tmdataloader_spark.functions.ratio import round6_ratio, round6_ratio_sql

    got = {
        (r.num, r.den): r.v
        for r in df.select("num", "den", round6_ratio("num", "den").alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c(num BIGINT, den BIGINT)"
    )
    con.executemany("INSERT INTO c VALUES (?, ?)", cases)
    expr = round6_ratio_sql("num", "den")
    duck = {
        (n, d): v for n, d, v in con.execute(f"SELECT num, den, {expr} FROM c").fetchall()
    }
    for num, den in cases:
        assert got[(num, den)] == duck[(num, den)] == _py_half_up(num, den), (num, den)
