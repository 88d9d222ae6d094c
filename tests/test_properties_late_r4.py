"""Property-based tests for the round-4 late additions — BM25,
temperature-mixture resampling, and the duplicated-n-gram fraction —
checked against pure-Python references on randomized inputs.

Each Spark run covers a BATCH of hypothesis-generated documents (one
row per example) so the per-example cost is a dict lookup, not a
Spark job.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st

word_st = st.sampled_from(
    ["the", "a", "spark", "shuffle", "vector", "row", "scan", "alpha", "beta"]
)
doc_st = st.lists(word_st, min_size=1, max_size=20).map(" ".join)


def _bucket(doc_id: int, salt: str) -> int:
    return int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8], 16) % 1_000_000


def _py_bm25(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toked = {i: t.strip().lower().split() for i, t in docs.items()}
    n = float(len(toked))
    avgdl = sum(len(v) for v in toked.values()) / n
    out = {}
    for i, toks in toked.items():
        score = 0.0
        hits = 0
        for t in sorted(set(x.strip().lower() for x in terms)):
            tf = float(toks.count(t))
            dfreq = float(sum(1 for v in toked.values() if t in v))
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            hits += 1 if tf > 0 else 0
        if hits > 0:
            out[i] = (hits, round(score, 6))
    return out


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(doc_st, min_size=2, max_size=12))
def test_prop_bm25_matches_python_reference(spark, texts):
    from tmdataloader_spark.llmdata.retrieval import bm25_topk

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_terms_hit, r.score)
        for r in bm25_topk(df, ["spark", "vector"], k=100).collect()
    }
    expected = _py_bm25(docs, ["spark", "vector"])
    assert got.keys() == expected.keys()
    for i in got:
        assert got[i][0] == expected[i][0]
        assert abs(got[i][1] - expected[i][1]) <= 1e-6


@settings(max_examples=6, deadline=None)
@given(
    langs=st.lists(st.sampled_from(["en", "de", "zh"]), min_size=5, max_size=40),
    alpha=st.sampled_from([0.0, 0.5, 0.7, 1.0]),
    target=st.integers(min_value=1, max_value=60),
)
def test_prop_mixture_sample_matches_python_reference(spark, langs, alpha, target):
    """The kept row set equals the pure-Python replay of the fraction
    arithmetic + md5 thresholds, for any stratum mix, alpha and
    target."""
    from tmdataloader_spark.llmdata.sampling import mixture_sample

    rows = [(i, f"doc {i}", lang) for i, lang in enumerate(langs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted(
        r.doc_id
        for r in mixture_sample(df, "lang", alpha=alpha, target_rows=target).collect()
    )
    counts: dict[str, int] = {}
    for lang in langs:
        counts[lang] = counts.get(lang, 0) + 1
    wsum = sum(n**alpha for n in counts.values())
    thr = {
        lang: round(round(min(1.0, target * (n**alpha / wsum) / n), 6) * 1_000_000)
        for lang, n in counts.items()
    }
    expected = sorted(
        i for i, lang in enumerate(langs) if _bucket(i, "mixture") < thr[lang]
    )
    assert got == expected


def _py_dup_fraction(docs: dict[int, str], n=3, min_df=2):
    grams = {
        i: {tuple(t.split()[j : j + n]) for j in range(len(t.split()) - n + 1)}
        for i, t in docs.items()
    }
    df: dict[tuple, int] = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    out = {}
    for i, gs in grams.items():
        dup = sum(1 for g in gs if df[g] >= min_df)
        out[i] = (len(gs), dup, round(dup / len(gs), 6) if gs else 0.0)
    return out


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(doc_st, min_size=1, max_size=10))
def test_prop_dup_ngram_fraction_matches_python_reference(spark, texts):
    from tmdataloader_spark.llmdata.dedup import dup_ngram_fraction

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_shingles, r.n_dup, r.dup_fraction)
        for r in dup_ngram_fraction(df, n=3, min_df=2).collect()
    }
    expected = _py_dup_fraction(docs)
    assert got.keys() == expected.keys()
    for i in got:
        assert got[i][0] == expected[i][0]
        assert got[i][1] == expected[i][1]
        assert abs(got[i][2] - expected[i][2]) <= 1e-9
