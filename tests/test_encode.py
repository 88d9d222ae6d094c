"""operators/encode.py: deterministic dictionary encoding."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdataloader_spark.operators.encode import build_dictionary, encode_column


def test_codes_are_dense_sorted(spark):
    df = spark.createDataFrame(
        [("pear",), ("apple",), ("fig",), ("apple",), (None,)], "v string"
    )
    d = {r.value: r.code for r in build_dictionary(df, "v").collect()}
    assert d == {"apple": 0, "fig": 1, "pear": 2}  # dense, lexical, no NULL


def test_encode_maps_null_and_unseen_to_minus_one(spark):
    train = spark.createDataFrame([("a",), ("b",)], "v string")
    dictionary = build_dictionary(train, "v")
    apply_df = spark.createDataFrame(
        [(1, "a"), (2, "zzz"), (3, None)], "id long, v string"
    )
    out = {r.id: r.v_code for r in
           encode_column(apply_df, "v", dictionary).collect()}
    assert out == {1: 0, 2: -1, 3: -1}


def test_two_phase_matches_global_rank(spark):
    vals = ["w%03d" % ((i * 37) % 97) for i in range(97)]
    df = spark.createDataFrame([(v,) for v in vals], "v string").repartition(7)
    d = build_dictionary(df, "v").collect()
    got = {r.value: r.code for r in d}
    expect = {v: i for i, v in enumerate(sorted(set(vals)))}
    assert got == expect


def test_bucket_expr_override(spark):
    # single-bucket degenerate case still yields correct global codes
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "v string")
    d = {r.value: r.code for r in
         build_dictionary(df, "v", bucket_expr=F.lit(0)).collect()}
    assert d == {"a": 0, "b": 1, "c": 2}
