"""Skew tooling (operators/skew.py): salted join equivalence +
determinism, skew report correctness."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_salted_join_equals_plain_join(spark):
    from tmdataloader_spark.operators.skew import salted_join

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", salt=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched left rows exactly once
    o_half = o.filter(F.col("l_orderkey") % 2 == 0)
    plain_l = li.join(o_half, "l_orderkey", "left")
    salted_l = salted_join(li, o_half, "l_orderkey", salt=4, how="left")
    assert sorted(map(tuple, plain_l.collect())) == sorted(map(tuple, salted_l.collect()))


def test_salted_join_is_deterministic_across_partitionings(spark):
    from tmdataloader_spark.operators.skew import salted_join

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    a = sorted(map(tuple, salted_join(li.repartition(2), o, "l_orderkey", 4).collect()))
    b = sorted(map(tuple, salted_join(li.repartition(13), o, "l_orderkey", 4).collect()))
    assert a == b


def test_salted_join_rejects_unsupported(spark):
    from tmdataloader_spark.operators.skew import salted_join

    df = spark.range(5).withColumn("v", F.col("id"))
    with pytest.raises(ValueError):
        salted_join(df, df, "id", how="full")
    with pytest.raises(ValueError):
        salted_join(df.select("id"), df, "id")  # no non-key salt source


def test_skew_report(spark):
    from tmdataloader_spark.operators.skew import skew_report

    rows = [(1, "a")] * 70 + [(2, "b")] * 20 + [(3, "c")] * 10
    df = spark.createDataFrame(rows, "k int, v string")
    got = skew_report(df, "k", top=2).collect()
    assert [(r.k, r.n_rows, r.share) for r in got] == [(1, 70, 0.7), (2, 20, 0.2)]
