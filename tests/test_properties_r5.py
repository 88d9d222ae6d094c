"""Property tests for the round-5 statistical/eval operators."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdataloader_spark.llmdata.scoring import pr_curve
from tmdataloader_spark.statistic.stattests import chi_square, ks_test


def test_ks_invariant_under_monotone_transform(spark):
    """KS depends only on ranks: any strictly increasing transform of
    BOTH samples leaves D unchanged (the floor-bucketing is an
    implementation detail, not part of the statistic)."""
    xs = [((i * 37) % 101) / 7.0 for i in range(80)]
    ys = [((i * 53) % 97) / 5.0 for i in range(60)]
    a = spark.createDataFrame([(v,) for v in xs], "v double")
    b = spark.createDataFrame([(v,) for v in ys], "v double")
    d0 = ks_test(a, b, "v").collect()[0].d_stat
    a2 = a.select((F.col("v") * 3 + 10).alias("v"))
    b2 = b.select((F.col("v") * 3 + 10).alias("v"))
    assert ks_test(a2, b2, "v").collect()[0].d_stat == d0


def test_ks_symmetry(spark):
    xs = [(float((i * 11) % 23),) for i in range(40)]
    ys = [(float((i * 7) % 19),) for i in range(55)]
    a = spark.createDataFrame(xs, "v double")
    b = spark.createDataFrame(ys, "v double")
    ab = ks_test(a, b, "v").collect()[0]
    ba = ks_test(b, a, "v").collect()[0]
    assert ab.d_stat == ba.d_stat
    assert (ab.n_a, ab.n_b) == (ba.n_b, ba.n_a)


def test_chi_square_symmetric_in_arguments(spark):
    rows = [(chr(97 + i % 3), chr(120 + (i * 7) % 2)) for i in range(120)]
    df = spark.createDataFrame(rows, "r string, c string")
    rc = chi_square(df, "r", "c").collect()[0]
    cr = chi_square(df, "c", "r").collect()[0]
    assert (rc.n, rc.dof, rc.chi2) == (cr.n, cr.dof, cr.chi2)


def test_pr_curve_count_identities(spark):
    """Exact identities: precision·n_pred == tp (to rounding), n_pred
    is the count of rows with score >= threshold, and the largest
    threshold row has n_pred == its score's multiplicity."""
    pairs = [((i * 13 % 7) / 2.0, (i * 5) % 2) for i in range(90)]
    df = spark.createDataFrame(pairs, "s double, y long")
    rows = pr_curve(df, "s", "y").collect()
    n_total = len(pairs)
    for r in rows:
        assert 0 < r.n_pred <= n_total
        assert 0 <= r.tp <= r.n_pred
        assert abs(r.precision * r.n_pred - r.tp) < 1e-3
        got = sum(1 for s, _ in pairs if s >= r.threshold)
        assert got == r.n_pred
