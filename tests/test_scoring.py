"""llmdata/scoring.py: linear scoring and PR curves."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdataloader_spark.llmdata.scoring import linear_score, pr_curve


def test_linear_score_values_and_key_order_invariance(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0), (2, 0.0, -1.0)],
                               "id long, a double, b double")
    s1 = {r.id: r.score for r in
          linear_score(df, {"a": 0.5, "b": 2.0}, bias=1.0).collect()}
    assert s1 == {1: 1.0 + 1.0 + 6.0, 2: 1.0 - 2.0}
    # dict iteration order must not matter (sorted-key expression)
    s2 = {r.id: r.score for r in
          linear_score(df, {"b": 2.0, "a": 0.5}, bias=1.0).collect()}
    assert s2 == s1


def _pr_reference(pairs):
    """Brute-force PR at each distinct threshold (score >= t)."""
    out = {}
    all_pos = sum(y for _, y in pairs)
    for t in sorted({s for s, _ in pairs}):
        pred = [(s, y) for s, y in pairs if s >= t]
        tp = sum(y for _, y in pred)
        out[t] = (len(pred), tp,
                  round(tp / len(pred), 6),
                  round(tp / all_pos, 6) if all_pos else None)
    return out


def test_pr_curve_matches_bruteforce(spark):
    pairs = [((i * 13 % 29) / 3.0, 1 if (i * 7) % 3 == 0 else 0)
             for i in range(200)]
    df = spark.createDataFrame(pairs, "s double, y long")
    got = {
        r.threshold: (r.n_pred, r.tp, r.precision, r.recall)
        for r in pr_curve(df, "s", "y").collect()
    }
    expect = _pr_reference(pairs)
    assert got.keys() == expect.keys()
    for t in expect:
        assert got[t][:2] == expect[t][:2], t
        assert got[t][2] == pytest.approx(expect[t][2], abs=1e-6)
        assert got[t][3] == pytest.approx(expect[t][3], abs=1e-6)


def test_pr_curve_monotone_recall_and_edge(spark):
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1)], "s double, y long"
    )
    rows = sorted(pr_curve(df, "s", "y").collect(),
                  key=lambda r: -r.threshold)
    # descending thresholds: n_pred and tp cumulative, recall rises
    assert [r.n_pred for r in rows] == [1, 2, 3]
    assert [r.tp for r in rows] == [1, 1, 2]
    assert rows[0].precision == 1.0 and rows[-1].recall == 1.0


def test_pr_curve_no_positives_null_recall(spark):
    df = spark.createDataFrame([(1.0, 0), (2.0, 0)], "s double, y long")
    for r in pr_curve(df, "s", "y").collect():
        assert r.recall is None and r.tp == 0


def test_roc_auc_perfect_random_and_ties(spark):
    from tmdataloader_spark.llmdata.scoring import roc_auc

    # perfect separation -> 1.0
    rows = [(float(i), 1 if i >= 10 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "s double, y long")
    assert roc_auc(df, "s", "y").collect()[0].auc == 1.0
    # inverted -> 0.0
    inv = spark.createDataFrame([(s, 1 - y) for s, y in rows], "s double, y long")
    assert roc_auc(inv, "s", "y").collect()[0].auc == 0.0
    # all scores tied -> midranks give exactly 0.5
    tied = spark.createDataFrame([(5.0, i % 2) for i in range(30)],
                                 "s double, y long")
    r = roc_auc(tied, "s", "y").collect()[0]
    assert r.auc == 0.5 and (r.n_pos, r.n_neg) == (15, 15)


def test_roc_auc_matches_pair_counting(spark):
    from tmdataloader_spark.llmdata.scoring import roc_auc

    pairs = [((i * 13 % 7) / 2.0, (i * 5) % 2) for i in range(60)]
    df = spark.createDataFrame(pairs, "s double, y long")
    got = roc_auc(df, "s", "y").collect()[0]
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(got.auc - round(expect, 6)) < 1e-9


def test_calibration_curve_bins_and_rates(spark):
    from tmdataloader_spark.llmdata.scoring import calibration_curve

    rows = [
        (0.05, 0), (0.08, 1),          # bin 0: pos_rate 0.5
        (0.55, 1), (0.55, 1), (0.5, 0),  # bin 5: pos_rate 2/3
        (1.0, 1),                      # top edge folds into bin 9
    ]
    df = spark.createDataFrame(rows, "s double, y long")
    got = {r.bin: r for r in calibration_curve(df, "s", "y").collect()}
    assert set(got) == {0, 5, 9}
    assert got[0].n == 2 and got[0].pos_rate == 0.5
    assert got[5].n == 3 and got[5].n_pos == 2
    assert got[9].n == 1 and got[9].pos_rate == 1.0
    assert abs(got[0].avg_score - 0.065) < 1e-9
