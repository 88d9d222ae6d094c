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


def test_debounce_keeps_spaced_drops_bursts(spark):
    import datetime as dt

    from tmdataloader_spark.operators.eventflow import debounce

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, "click", t0),
        (2, 7, "click", t0 + dt.timedelta(seconds=30)),   # burst -> dropped
        (3, 7, "click", t0 + dt.timedelta(seconds=700)),  # spaced -> kept
        (4, 7, "view", t0 + dt.timedelta(seconds=31)),    # other key -> kept
        (5, 8, "click", t0 + dt.timedelta(seconds=32)),   # other user -> kept
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    kept = {r.event_id for r in debounce(ev, ["user_id", "event_type"],
                                         gap_seconds=600).collect()}
    assert kept == {1, 3, 4, 5}


def test_throttle_first_k_per_hour(spark):
    import datetime as dt

    from tmdataloader_spark.operators.eventflow import throttle

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, 7, "e", t0 + dt.timedelta(minutes=i)) for i in range(6)] + [
        (10, 7, "e", t0 + dt.timedelta(hours=1, minutes=1)),  # next hour resets
        (11, 9, "e", t0 + dt.timedelta(minutes=50)),          # other key
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    kept = {r.event_id for r in throttle(ev, ["user_id"], per_hour=3).collect()}
    assert kept == {0, 1, 2, 10, 11}  # first three of hour 12, reset at 13
    assert "_hb" not in throttle(ev, ["user_id"], per_hour=3).columns


def test_sliding_distinct_exact_vs_bruteforce(spark):
    import datetime as dt

    from tmdataloader_spark.operators.eventflow import sliding_distinct

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h, users in [(0, [1, 2]), (1, [2]), (3, [3]), (6, [1, 2, 3])]:
        for u in users:
            rows.append((eid, u, "e", t0 + dt.timedelta(hours=h, minutes=u)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r.window_end.hour: r.n_distinct
        for r in sliding_distinct(ev, "user_id", window_hours=3).collect()
    }
    # brute force: window at h covers hours h-2..h; anchors = observed hours
    by_hour = {0: {1, 2}, 1: {2}, 3: {3}, 6: {1, 2, 3}}
    expect = {}
    for h in by_hour:
        s = set()
        for hh in (h - 2, h - 1, h):
            s |= by_hour.get(hh, set())
        expect[h] = len(s)
    assert got == expect


@pytest.fixture(scope="module")
def idlog(spark):
    rows = [
        # u1: a -> b -> b -> a (3 transitions)
        (1, 1, "a", "2024-01-01 10:00:00"),
        (2, 1, "b", "2024-01-01 10:05:00"),
        (3, 1, "b", "2024-01-01 10:10:00"),
        (4, 1, "a", "2024-01-01 10:20:00"),
        # u2: single event -> no transitions, no gaps
        (5, 2, "a", "2024-01-01 11:00:00"),
        # u3: a -> a with a tie broken by event_id
        (6, 3, "a", "2024-01-01 12:00:00"),
        (7, 3, "a", "2024-01-01 12:00:00"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_event_transitions_counts_and_probs(spark, idlog):
    from tmdataloader_spark.operators.eventflow import event_transitions

    got = {
        (r.src, r.dst): (r.n_transitions, r.p)
        for r in event_transitions(idlog).collect()
    }
    # u1: a->b, b->b, b->a; u3: a->a.  Leaving 'a': a->b 1, a->a 1
    # (p=0.5 each); leaving 'b': b->b 1, b->a 1 (p=0.5 each).
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
        ("b", "a"): (1, 0.5),
    }


def test_event_transitions_single_event_user_excluded(spark, idlog):
    from tmdataloader_spark.operators.eventflow import event_transitions

    # u2's lone event produces no transition rows at all
    only_u2 = idlog.filter("user_id = 2")
    assert event_transitions(only_u2).count() == 0


def test_interarrival_profile_exact_micros(spark, idlog):
    from tmdataloader_spark.operators.eventflow import interarrival_profile

    got = {
        r.event_type: (r.n_gaps, r.min_gap_s, r.avg_gap_s, r.max_gap_s)
        for r in interarrival_profile(idlog).collect()
    }
    # per-(user,type) gaps: u1/a 1200s, u1/b 300s, u3/a 0s (tie);
    # u2 contributes none.  type a: gaps {1200, 0} -> avg 600.
    assert got == {
        "a": (2, 0.0, 600.0, 1200.0),
        "b": (1, 300.0, 300.0, 300.0),
    }


@pytest.fixture(scope="module")
def convlog(spark):
    rows = [
        # u1: view -> click -> purchase -> click(after, ignored)
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:05:00"),
        (3, 1, "purchase", "2024-01-01 10:10:00"),
        (4, 1, "click", "2024-01-01 10:20:00"),
        # u2: purchase FIRST -> no pre-conversion touch -> excluded
        (5, 2, "purchase", "2024-01-02 09:00:00"),
        (6, 2, "view", "2024-01-02 10:00:00"),
        # u3: never converts -> excluded
        (7, 3, "view", "2024-01-03 10:00:00"),
        # u4: same-timestamp tie with the purchase: the touch with a
        # SMALLER event_id at the identical ts counts (strict (ts,id)
        # tuple order), the one with a larger id does not
        (8, 4, "click", "2024-01-04 10:00:00"),
        (9, 4, "purchase", "2024-01-04 10:00:00"),
        (10, 4, "view", "2024-01-04 10:00:00"),
        # u5: single touch -> same type is both first AND last touch
        (11, 5, "error", "2024-01-05 09:00:00"),
        (12, 5, "purchase", "2024-01-05 10:00:00"),
        # u5's second purchase must not double-count
        (13, 5, "purchase", "2024-01-05 11:00:00"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_attribution_first_last_touch(spark, convlog):
    from tmdataloader_spark.operators.eventflow import attribution

    got = {
        r.event_type: (r.first_touch_users, r.last_touch_users)
        for r in attribution(convlog).collect()
    }
    # converters with >=1 touch: u1 (first=view, last=click),
    # u4 (only the id-8 click qualifies), u5 (error both)
    assert got == {
        "view": (1, 0),
        "click": (1, 2),
        "error": (1, 1),
    }


def test_attribution_no_converters(spark, convlog):
    from tmdataloader_spark.operators.eventflow import attribution

    out = attribution(convlog.filter(F.col("event_type") != "purchase"))
    assert out.count() == 0
