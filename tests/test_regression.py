"""statistic/regression.py: grouped OLS with integer-exact moments."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdataloader_spark.statistic.regression import grouped_linear_fit


def test_exact_line_recovered(spark):
    # y = 2x + 3 exactly -> slope 2, intercept 3, corr 1
    df = spark.createDataFrame(
        [("g", x, 2.0 * x + 3.0) for x in range(10)],
        "k string, x long, y double",
    )
    r = grouped_linear_fit(df, "x", "y", "k").collect()[0]
    assert (r.slope, r.intercept, r.corr) == (2.0, 3.0, 1.0)
    assert r.n == 10


def test_matches_numpy_polyfit(spark):
    import numpy as np

    xs = list(range(50))
    rng = [((x * 2654435761) % 1000) / 100.0 for x in xs]  # deterministic
    ys = [0.5 * x + 7 + e for x, e in zip(xs, rng)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "k string, x long, y double"
    )
    r = grouped_linear_fit(df, "x", "y", "k").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert r.slope == pytest.approx(slope, abs=2e-5)  # 6dp quantization
    assert r.intercept == pytest.approx(intercept, abs=2e-3)
    cc = np.corrcoef(xs, ys)[0, 1]
    assert r.corr == pytest.approx(cc, abs=1e-5)


def test_degenerate_groups_null(spark):
    df = spark.createDataFrame(
        [("constx", 5, 1.0), ("constx", 5, 2.0),
         ("consty", 1, 4.0), ("consty", 2, 4.0),
         ("single", 9, 1.5)],
        "k string, x long, y double",
    )
    out = {r.group: r for r in grouped_linear_fit(df, "x", "y", "k").collect()}
    assert out["constx"].slope is None and out["constx"].corr is None
    assert out["consty"].slope == 0.0 and out["consty"].corr is None
    assert out["single"].slope is None


def test_partition_invariance(spark):
    rows = [("g%d" % (i % 3), i, ((i * 37) % 11) / 3.0) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, x long, y double")
    a = sorted(map(tuple, grouped_linear_fit(df.repartition(1), "x", "y", "k").collect()))
    b = sorted(map(tuple, grouped_linear_fit(df.repartition(13), "x", "y", "k").collect()))
    assert a == b
