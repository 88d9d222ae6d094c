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


def test_basket_rules_metrics_and_cap(spark):
    from tmdataloader_spark.operators.association import basket_rules

    rows = [
        # baskets: {1,2,3}, {1,2}, {1,2}, {3}, {2,4,...big}
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2),
        (12, 1), (12, 2), (12, 2),  # duplicate line collapses
        (13, 3),
        (14, 2), (14, 4), (14, 5), (14, 6),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.part_x, r.part_y): r for r in basket_rules(df, k=10).collect()}
    r = out[(1, 2)]
    # n_xy=3 of N=5 baskets; n_1=3, n_2=4
    assert (r.n_xy, r.n_x, r.n_y) == (3, 3, 4)
    assert r.support == round(3 / 5, 6)
    assert r.conf_x_y == round(3 / 3, 6)
    assert r.conf_y_x == round(3 / 4, 6)
    assert r.lift == round((3.0 * 5) / (3.0 * 4), 6)
    # min_count=2 drops every singleton pair
    assert set(out) == {(1, 2)}

    # the mega-basket guard drops basket 14 BEFORE pair generation
    capped = basket_rules(df, k=10, min_count=1, max_basket_size=3)
    assert all(
        r.part_x != 4 and r.part_y != 4 for r in capped.collect()
    )
