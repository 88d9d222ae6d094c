"""operators/rollup.py: incremental aggregate maintenance."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdataloader_spark.operators.rollup import (
    merge_rollups,
    rollup_report,
    rollup_state,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k string, value double")


def test_merge_equals_full_recompute(spark):
    rows = [("a", float(i)) for i in range(10)] + [("b", 1.5), ("b", -2.5)]
    full = _ev(spark, rows)
    a, b = _ev(spark, rows[:5]), _ev(spark, rows[5:])
    merged = merge_rollups(
        rollup_state(a, ["k"]), rollup_state(b, ["k"]), ["k"]
    )
    exp = {tuple(r) for r in rollup_state(full, ["k"]).collect()}
    got = {tuple(r) for r in merged.collect()}
    assert got == exp


def test_merge_new_and_missing_keys(spark):
    old = rollup_state(_ev(spark, [("a", 1.0)]), ["k"])
    new = rollup_state(_ev(spark, [("b", 2.0)]), ["k"])
    out = {r.k: r for r in merge_rollups(old, new, ["k"]).collect()}
    assert set(out) == {"a", "b"}  # old keys survive, new keys appear
    assert out["a"].n_rows == 1 and out["b"].n_rows == 1
    assert out["b"].min_value == 2.0 and out["b"].max_value == 2.0


def test_report_derives_avg_from_state(spark):
    st = rollup_state(_ev(spark, [("a", 1.0), ("a", 2.0)]), ["k"])
    r = rollup_report(st).collect()[0]
    assert r.avg_value == 1.5 and r.sum_value == 3.0


def test_merge_is_associative_over_three_batches(spark):
    rows = [(chr(97 + i % 3), float((i * 7) % 13) - 5) for i in range(30)]
    full = rollup_state(_ev(spark, rows), ["k"])
    b1 = rollup_state(_ev(spark, rows[:10]), ["k"])
    b2 = rollup_state(_ev(spark, rows[10:20]), ["k"])
    b3 = rollup_state(_ev(spark, rows[20:]), ["k"])
    left = merge_rollups(merge_rollups(b1, b2, ["k"]), b3, ["k"])
    right = merge_rollups(b1, merge_rollups(b2, b3, ["k"]), ["k"])
    f = {tuple(r) for r in full.collect()}
    assert {tuple(r) for r in left.collect()} == f
    assert {tuple(r) for r in right.collect()} == f
