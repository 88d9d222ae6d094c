"""Bigram-LM perplexity (llmdata/lm.py): pure-Python reference
property test, edge cases, plan shape, and the CCNet composition with
percentile_buckets."""

import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

word_st = st.text(alphabet="abcd", min_size=1, max_size=3)


def _round_half_up(x: float) -> int:
    # twin of Spark F.round on doubles: shortest-repr BigDecimal,
    # HALF_UP — Decimal(repr(x)) is exactly that shortest repr
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _py_perplexity(docs: dict[int, str], vocab_size: int, add_k: float = 1.0):
    import re

    toks = {i: re.split(" +", t.strip().lower()) for i, t in docs.items()}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for w in ts:
            counts[w] = counts.get(w, 0) + 1
    vocab = set(
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: vocab_size - 1]
    )
    mapped = {i: [w if w in vocab else "<unk>" for w in ts] for i, ts in toks.items()}
    uni: dict[str, int] = {}
    for ts in mapped.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
    v = float(len(uni))
    bi: dict[tuple, int] = {}
    for ts in mapped.values():
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    obs = {
        p: _round_half_up(math.log((c + add_k) / (uni[p[0]] + add_k * v)) * 1e6)
        for p, c in bi.items()
    }
    bo = {
        w: _round_half_up(math.log(add_k / (c1 + add_k * v)) * 1e6)
        for w, c1 in uni.items()
    }
    out = {}
    for i, ts in mapped.items():
        prs = list(zip(ts, ts[1:]))
        if not prs:
            out[i] = (0, None, None)
            continue
        sq = sum(obs.get(p, bo[p[0]]) for p in prs)
        avg = (sq / 1e6) / len(prs)
        out[i] = (len(prs), round(avg, 6), round(math.exp(-avg), 6))
    return out


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.lists(word_st, min_size=1, max_size=25).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_prop_perplexity_matches_python_reference(spark, texts):
    from tmdataloader_spark.llmdata.lm import perplexity_scores

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob, r.perplexity)
        for r in perplexity_scores(df, vocab_size=5).collect()
    }
    ref = _py_perplexity(docs, vocab_size=5)
    assert set(got) == set(ref)
    for i in ref:
        assert got[i][0] == ref[i][0], f"doc {i} n_bigrams"
        if ref[i][1] is None:
            assert got[i][1] is None and got[i][2] is None
        else:
            assert abs(got[i][1] - ref[i][1]) <= 1.5e-6, f"doc {i} avg_logprob"
            assert abs(got[i][2] - ref[i][2]) <= max(1e-5, 1e-5 * ref[i][2]), (
                f"doc {i} perplexity"
            )


def test_single_token_and_empty_docs(spark):
    from tmdataloader_spark.llmdata.lm import perplexity_scores

    df = spark.createDataFrame(
        [(0, "one"), (1, ""), (2, "two tokens here")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in perplexity_scores(df, vocab_size=10).collect()}
    # doc 0: one token -> no bigrams; doc 1: "" tokenizes to [""] -> one
    # token -> no bigrams; doc 2: 2 bigrams
    for i in (0, 1):
        assert got[i].n_bigrams == 0
        assert got[i].avg_logprob is None and got[i].perplexity is None
    assert got[2].n_bigrams == 2
    assert got[2].avg_logprob < 0 and got[2].perplexity > 1


def test_score_with_lm_transfers(spark):
    """Fit on one corpus, score another: out-of-model bigrams hit the
    backoff floor, so unseen text scores strictly worse (higher
    perplexity) than the text the model was fit on."""
    from tmdataloader_spark.llmdata.lm import bigram_lm, lm_vocab, score_with_lm

    fit = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)], "doc_id long, text string"
    )
    vocab = lm_vocab(fit, 50)
    obs, bo = bigram_lm(fit, 50)
    seen = score_with_lm(
        spark.createDataFrame([(0, "the cat sat")], "doc_id long, text string"),
        vocab, obs, bo,
    ).collect()[0]
    unseen = score_with_lm(
        spark.createDataFrame([(0, "mat on sat cat")], "doc_id long, text string"),
        vocab, obs, bo,
    ).collect()[0]
    assert seen.perplexity < unseen.perplexity


def test_lm_plan_shape(spark):
    """Vocab mapping + backoff join via broadcast hash joins; no
    cartesian product over data-sized inputs (the only nested-loop
    broadcasts are the deliberate one-row V-count crosses)."""
    import __spark_entry__ as entry

    df = entry.q_lm_perplexity(spark, "/root/testdata/sf0.001")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ccnet_buckets_compose_with_perplexity(spark):
    """The intended composition: perplexity feeds the CCNet
    head/middle/tail percentile split (grouped, deterministic)."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.llmdata.lm import perplexity_scores
    from tmdataloader_spark.llmdata.sampling import percentile_buckets

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = perplexity_scores(d, vocab_size=100).join(
        d.select("doc_id", "lang"), "doc_id"
    ).filter(F.col("avg_logprob").isNotNull())
    out = percentile_buckets(scored, "perplexity", group_col="lang")
    rows = out.collect()
    assert len(rows) == scored.count()
    assert {r.bucket for r in rows} <= {"head", "middle", "tail"}
    # low perplexity = head (CCNet keeps the head): per group, every
    # head-bucket score <= every tail-bucket score
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for rs in by_lang.values():
        heads = [r.perplexity for r in rs if r.bucket == "head"]
        tails = [r.perplexity for r in rs if r.bucket == "tail"]
        if heads and tails:
            assert max(heads) <= min(tails)
