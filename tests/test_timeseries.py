"""operators/timeseries.py: gap-filled resampling."""

import datetime as dt
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ev(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 15)
    rows = [
        # key "a": events at hours 10, 10, 13 -> gaps at 11, 12
        (1, "a", t0, 1.5),
        (2, "a", t0 + dt.timedelta(minutes=20), 2.5),
        (3, "a", t0 + dt.timedelta(hours=3), 4.0),
        # key "b": single event -> single-bucket grid, no gaps
        (4, "b", t0 + dt.timedelta(hours=1), 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, value double"
    )


def test_grid_covers_span_and_flags_gaps(spark):
    from tmdataloader_spark.operators.timeseries import resample_fill

    out = {
        (r.key, r.bucket.hour): r
        for r in resample_fill(_ev(spark), "k").collect()
    }
    a_hours = sorted(h for (k, h) in out if k == "a")
    assert a_hours == [10, 11, 12, 13]  # dense, inclusive of both ends
    assert out[("a", 10)].n_events == 2
    assert out[("a", 10)].sum_value == 4.0
    assert not out[("a", 10)].is_gap
    for h in (11, 12):
        gap = out[("a", h)]
        assert gap.is_gap and gap.n_events == 0 and gap.sum_value is None
        assert gap.carried_value == 4.0  # carried from hour 10
    assert out[("a", 13)].carried_value == 4.0 or out[("a", 13)].sum_value == 4.0
    assert out[("a", 13)].n_events == 1
    assert [k for (k, _) in out if k == "b"] == ["b"]
    assert not out[("b", 11)].is_gap


def test_partition_invariance(spark):
    from tmdataloader_spark.operators.timeseries import resample_fill

    ev = _ev(spark)
    one = sorted(map(tuple, resample_fill(ev.repartition(1), "k").collect()))
    many = sorted(map(tuple, resample_fill(ev.repartition(7), "k").collect()))
    assert one == many


def test_cusum_changepoint_locates_level_shift(spark):
    from tmdataloader_spark.operators.timeseries import cusum_changepoint

    # 10 points at level 1.0 then 10 at level 5.0 -> peak |S_i| at the
    # boundary (position 10), where the cumulative deviation from the
    # overall mean (3.0) is largest.
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", "a", 1.0 if i < 10 else 5.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = cusum_changepoint(df, "event_type").collect()
    assert len(got) == 1
    r = got[0]
    assert r.pos == 10 and r.n == 20
    # |S_10| = |n*C_10 - 10*T| = |20*10e6 - 10*60e6| = 400e6; /n = 2e7
    assert r.stat == 400e6 / 20


def test_cusum_changepoint_tie_breaks_earliest(spark):
    from tmdataloader_spark.operators.timeseries import cusum_changepoint

    # Symmetric up-down series: |S_i| peaks equally at both ends of the
    # plateau; earliest position must win.
    vals = [0.0, 10.0, 10.0, 0.0]
    rows = [
        (i, f"2024-01-01 00:0{i}:00", "k", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = cusum_changepoint(df, "event_type").collect()[0]
    # S_1 = |4*0 - 1*20e6| = 20e6 ... S_2=|4*10e6-2*20e6|=0,
    # S_3 = |4*20e6 - 3*20e6| = 20e6 -> tie between pos 1 and 3
    assert r.pos == 1
