"""Unit tests for funnel and retention (operators/eventflow.py)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # u2 clicks BEFORE the first view: click doesn't count, and the
        # later purchase has no qualifying click before it
        (2, "click", "2024-01-02 09:00:00"),
        (2, "view", "2024-01-02 10:00:00"),
        (2, "purchase", "2024-01-02 11:00:00"),
        # u3 views only
        (3, "view", "2024-01-08 10:00:00"),
        # u4 purchases with no view at all
        (4, "purchase", "2024-01-09 10:00:00"),
        # u1 active again two weeks after first-seen
        (1, "view", "2024-01-15 10:00:00"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_funnel_ordered_steps(spark, log):
    from tmdataloader_spark.operators.eventflow import funnel

    out = {r["step"]: r for r in funnel(log, ["view", "click", "purchase"]).collect()}
    assert out[1]["n_users"] == 3  # u1, u2, u3 viewed
    assert out[2]["n_users"] == 1  # only u1 clicked after viewing
    assert out[3]["n_users"] == 1  # only u1 purchased after that click
    assert out[1]["conversion"] == 1.0
    assert out[2]["conversion"] == round(1 / 3, 6)
    assert out[2]["step_name"] == "click"


def test_funnel_same_timestamp_counts(spark, log):
    """ts >= threshold: a step event at the exact same instant as the
    previous step's first event qualifies."""
    from tmdataloader_spark.operators.eventflow import funnel

    df = spark.createDataFrame(
        [(9, "view", "2024-01-01 10:00:00"), (9, "click", "2024-01-01 10:00:00")],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["step"]: r["n_users"] for r in funnel(df, ["view", "click"]).collect()}
    assert out == {1: 1, 2: 1}


def test_funnel_empty_guard():
    from tmdataloader_spark.operators.eventflow import funnel

    with pytest.raises(ValueError):
        funnel(None, [])


def test_retention_week_cohorts(spark, log):
    from tmdataloader_spark.operators.eventflow import retention

    out = {
        (r["cohort"], r["period_offset"]): r["n_users"]
        for r in retention(log).collect()
    }
    # 2024-01-01 is a Monday: u1, u2 in that cohort; u3, u4 in 2024-01-08
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 2)] == 1  # u1 returns on Jan 15
    assert out[("2024-01-08", 0)] == 2
    assert set(k[0] for k in out) == {"2024-01-01", "2024-01-08"}


def test_retention_bad_period(spark, log):
    from tmdataloader_spark.operators.eventflow import retention

    with pytest.raises(ValueError):
        retention(log, period="month").collect()


def test_user_cardinality_exact(spark, log):
    from tmdataloader_spark.operators.eventflow import user_cardinality

    got = {
        r["event_type"]: (r["n_events"], r["n_users"])
        for r in user_cardinality(log).collect()
    }
    # invariant: distinct users never exceed events
    assert all(u <= n for n, u in got.values())
    assert got  # at least one group


def test_user_cardinality_hll_agrees_with_exact(spark, sf_dir):
    import os

    from tmdataloader_spark.operators.eventflow import user_cardinality

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    exact = {
        r["event_type"]: r["n_users"]
        for r in user_cardinality(ev).collect()
    }
    approx = {
        r["event_type"]: r["n_users"]
        for r in user_cardinality(ev, approx=True, rsd=0.02).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        # HLL++ at rsd=0.02: allow a generous 5x band (3 sigma ~ 6%)
        assert abs(approx[k] - exact[k]) <= max(2, 0.10 * exact[k]), (
            k, exact[k], approx[k],
        )
