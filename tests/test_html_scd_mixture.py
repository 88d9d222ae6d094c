"""extract_html_text, mad_outliers, scd2_history, and token-budget
mixture fractions — behavior the oracle rows can't pin down."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdataloader_spark.llmdata.sampling import (
    mixture_fractions_by_tokens,
    mixture_sample,
)
from tmdataloader_spark.llmdata.text import extract_html_text
from tmdataloader_spark.operators.diff import scd2_history
from tmdataloader_spark.statistic.profile import mad_outliers


def _extract(spark, html):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(extract_html_text("h").alias("t")).collect()[0]["t"]


def test_html_basic_strip(spark):
    got = _extract(
        spark,
        '<html><head><script>if (1 < 2) { alert("x"); }</script>'
        "<style>p{}</style></head><body><h1>Hi</h1><p>one</p>"
        "<p>two</p><!-- nope --></body></html>",
    )
    assert got == "Hi\none\ntwo"


def test_html_entities_decode_once(spark):
    # &amp;lt; must decode to the TEXT "&lt;", not to "<"
    assert _extract(spark, "<p>a &amp;lt; b &amp; c &lt;tag&gt;</p>") == (
        "a &lt; b & c <tag>"
    )


def test_html_nbsp_and_whitespace_collapse(spark):
    assert _extract(spark, "<div>a&nbsp;&nbsp;b   c\r\n d</div>") == "a b c d"


def test_html_br_and_li_newlines(spark):
    assert _extract(spark, "x<br/>y<ul><li>a</li><li>b</li></ul>") == "x\ny\na\nb"


def test_html_plain_text_passthrough(spark):
    assert _extract(spark, "no markup at all") == "no markup at all"


def test_mad_outliers_flags_the_spike(spark):
    rows = [("g", float(v)) for v in [10, 11, 10, 12, 9, 11, 10, 1000]]
    out = mad_outliers(
        spark.createDataFrame(rows, "g string, v double"), "v", "g", k=3.0
    ).collect()[0]
    assert out["n_rows"] == 8
    assert out["n_outliers"] == 1
    assert out["median_value"] == 10.5
    # deviations sorted: 0.5 x5, 1.5 x2, 989.5 -> median 0.5
    assert out["mad"] == 0.5


def test_mad_outliers_ungrouped(spark):
    df = spark.createDataFrame([(float(i),) for i in range(11)], "v double")
    out = mad_outliers(df, "v", None, k=3.0).collect()[0]
    assert out["group_key"] == "all"
    assert out["median_value"] == 5.0
    assert out["n_outliers"] == 0


def test_scd2_runs_and_intervals(spark):
    rows = [
        (1, "a", 1, 10),
        (1, "a", 2, 11),
        (1, "b", 3, 12),
        (1, "a", 4, 13),  # back to a -> NEW run, not merged with run 1
        (2, "x", 1, 20),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, v long, id long")
    hist = scd2_history(
        df, keys=["k"], attr_cols=["attr"], version_col="v", tiebreak_cols=["id"]
    ).collect()
    got = sorted(
        [(r["k"], r["attr"], r["valid_from"], r["valid_to"]) for r in hist]
    )
    assert got == [
        (1, "a", 1, 3),
        (1, "a", 4, None),
        (1, "b", 3, 4),
        (2, "x", 1, None),
    ]


def test_scd2_null_attr_runs(spark):
    rows = [(1, None, 1), (1, None, 2), (1, "z", 3)]
    df = spark.createDataFrame(rows, "k long, attr string, v long")
    hist = sorted(
        (
            (r["attr"], r["valid_from"], r["valid_to"])
            for r in scd2_history(
                df, keys=["k"], attr_cols=["attr"], version_col="v"
            ).collect()
        ),
        key=lambda t: (t[0] is not None, t[0] or "", t[1]),
    )
    # null-safe compare: the two NULL rows are ONE run
    assert hist == [(None, 1, 3), ("z", 3, None)]


def test_token_mixture_feeds_sampler(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    targets = spark.createDataFrame(
        [("en", 10000), ("zh", 5000)], "stratum string, target_tokens long"
    )
    fr = mixture_fractions_by_tokens(docs, targets, "lang", "n_chars")
    rows = {r["stratum"]: r for r in fr.collect()}
    assert set(rows) == {"en", "zh"}
    for r in rows.values():
        assert 0.0 <= r["fraction"] <= 1.0
    # the fraction table plugs into the SAME consumer as row-count
    # fractions: kept tokens land near the budget
    from tmdataloader_spark.llmdata.sampling import apply_fractions
    kept = apply_fractions(docs, fr, stratum_col="lang")
    kept_tokens = {
        r["lang"]: r["t"]
        for r in kept.groupBy("lang").agg(F.sum("n_chars").alias("t")).collect()
    }
    for stratum, target in [("en", 10000), ("zh", 5000)]:
        actual = rows[stratum]["sum_tokens"]
        expect = min(target, actual)
        assert abs(kept_tokens.get(stratum, 0) - expect) <= 0.5 * expect


def test_token_mixture_clamp_off(spark):
    docs = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 100)], "doc_id long, lang string, n_chars long"
    )
    targets = spark.createDataFrame(
        [("en", 1000)], "stratum string, target_tokens long"
    )
    f = mixture_fractions_by_tokens(
        docs, targets, "lang", "n_chars", clamp=False
    ).collect()[0]["fraction"]
    assert f == 5.0


def test_mixture_drift_shares_and_edges(spark):
    from tmdataloader_spark.llmdata.sampling import mixture_drift

    cur = spark.createDataFrame(
        [(i, "en") for i in range(6)]
        + [(10 + i, "zh") for i in range(2)]
        + [(20, "new")],
        "doc_id long, lang string",
    )
    ref = spark.createDataFrame(
        [(i, "en") for i in range(4)]
        + [(10 + i, "zh") for i in range(4)]
        + [(30, "old")],
        "doc_id long, lang string",
    )
    got = {r["stratum"]: r for r in mixture_drift(cur, ref, "lang").collect()}
    assert set(got) == {"en", "zh", "new", "old"}
    # new stratum: present now, absent in reference -> NULL kl
    assert got["new"]["n_reference"] == 0 and got["new"]["kl_term"] is None
    assert got["old"]["n_current"] == 0 and got["old"]["kl_term"] is None
    # en grew (p > q) -> positive contribution; zh shrank -> negative
    assert got["en"]["kl_term"] > 0
    assert got["zh"]["kl_term"] < 0
    assert abs(got["en"]["share_current"] - 6 / 9) < 1e-6


def test_weighted_sample_proportional_and_deterministic(spark):
    from tmdataloader_spark.llmdata.sampling import weighted_sample

    # 500 light rows (w=1) vs 500 heavy rows (w=50): the heavy half
    # must dominate a k=100 draw
    rows = [(i, 1.0) for i in range(500)] + [(500 + i, 50.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, k=100, weight_col="w")
    ids = {r["doc_id"] for r in got.collect()}
    assert len(ids) == 100
    heavy = sum(1 for i in ids if i >= 500)
    assert heavy > 80  # E[heavy] ~ 98; even 3 sigma stays > 80
    # deterministic across partitionings
    ids2 = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), k=100, weight_col="w").collect()
    }
    assert ids == ids2


def test_weighted_sample_zero_weight_never_wins(spark):
    from tmdataloader_spark.llmdata.sampling import weighted_sample

    rows = [(1, 0.0), (2, 0.0), (3, 1.0), (4, 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    ids = {r["doc_id"] for r in weighted_sample(df, k=2, weight_col="w").collect()}
    assert ids == {3, 4}


def test_weighted_sample_per_stratum_cap(spark):
    from tmdataloader_spark.llmdata.sampling import weighted_sample

    rows = [(i, "a", 1.0) for i in range(30)] + [(100 + i, "b", 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, s string, w double")
    got = weighted_sample(df, k=10, weight_col="w", stratum_col="s")
    per = {r["s"]: 0 for r in got.collect()}
    for r in got.collect():
        per[r["s"]] = per.get(r["s"], 0) + 1
    assert per["a"] == 10 and per["b"] == 5
