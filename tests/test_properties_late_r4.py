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
    # mirrors bm25_topk's r5 determinism algebra: each per-term score
    # quantized to micro-unit ints, exact integer sum, /1e6 at the end
    toked = {i: t.strip().lower().split() for i, t in docs.items()}
    n = float(len(toked))
    avgdl = sum(len(v) for v in toked.values()) / n
    out = {}
    for i, toks in toked.items():
        score_q = 0
        hits = 0
        for t in sorted(set(x.strip().lower() for x in terms)):
            tf = float(toks.count(t))
            dfreq = float(sum(1 for v in toked.values() if t in v))
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s = idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            score_q += round(s * 1_000_000)
            hits += 1 if tf > 0 else 0
        if hits > 0:
            out[i] = (hits, score_q / 1_000_000.0)
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


def _py_substr_dedup(docs: dict[int, str], n: int):
    """Reference ExactSubstr: duplicate n-gram occurrences (corpus
    order by (doc_id, pos)) mark [pos, pos+n) for removal."""
    toked = {i: t.split(" ") for i, t in docs.items()}
    first: set[tuple[str, ...]] = set()
    dup_starts: dict[int, list[int]] = {i: [] for i in toked}
    for i in sorted(toked):
        toks = toked[i]
        for p in range(len(toks) - n + 1):
            g = tuple(toks[p : p + n])
            if g in first:
                dup_starts[i].append(p)
            else:
                first.add(g)
    out = {}
    for i, toks in toked.items():
        removed = set()
        for s in dup_starts[i]:
            removed.update(range(s, s + n))
        kept = [t for j, t in enumerate(toks) if j not in removed]
        out[i] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(st.lists(word_st, min_size=1, max_size=30).map(" ".join),
                      min_size=1, max_size=10))
def test_prop_substr_dedup_matches_python_reference(spark, texts):
    from tmdataloader_spark.llmdata.dedup import exact_substring_dedup

    n = 4
    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_removed)
        for r in exact_substring_dedup(df, n=n).collect()
    }
    assert got == _py_substr_dedup(docs, n)


def test_substr_dedup_within_doc_repeat(spark):
    """A repeat later in the SAME document is removed; the first
    occurrence survives."""
    from tmdataloader_spark.llmdata.dedup import exact_substring_dedup

    text = "a b c d x a b c d"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = exact_substring_dedup(df, n=4).collect()[0]
    assert row.text == "a b c d x"
    assert row.n_tokens == 9 and row.n_removed == 4


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_prop_prototype_scores_match_numpy(spark, vecs):
    import numpy as np

    from tmdataloader_spark.llmdata.clustering import prototype_scores

    rows = [(i, [float(np.float32(x)) for x in v], lab) for i, (lab, v) in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r.vec_id: (r.grp_n, r.proto_cos) for r in prototype_scores(df).collect()}
    by_lab: dict[int, list] = {}
    for i, v, lab in rows:
        by_lab.setdefault(lab, []).append((i, np.array(v)))
    for lab, members in by_lab.items():
        # the quantized-centroid recipe (floor(x*1000) -> exact int
        # sum -> floor(s/n)), replicated exactly
        q = np.floor(np.stack([v for _, v in members]) * 1000).astype(np.int64)
        cent = np.floor(q.sum(axis=0) / len(members)).astype(np.int64).astype(float)
        cn = np.linalg.norm(cent)
        for i, v in members:
            vn = np.linalg.norm(v)
            assert got[i][0] == len(members)
            if vn == 0 or cn == 0:
                # pinned contract: zero-norm vector or centroid ->
                # division by zero -> NULL (Spark non-ANSI divide)
                assert got[i][1] is None
                continue
            assert abs(got[i][1] - round(float(v @ cent) / (vn * cn), 6)) <= 1e-6


def test_leakage_safe_split_never_straddles(spark):
    """Every near-dup pair lands in the SAME split, and the split of a
    singleton equals the plain hash split of its own id (so the
    operator degrades to split_column on a clean corpus)."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.llmdata.dedup import minhash_lsh_pairs
    from tmdataloader_spark.llmdata.sampling import leakage_safe_split, split_column

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(d, num_perms=16, bands=4, threshold=0.8)
    out = leakage_safe_split(d, pairs, [0.8, 0.1, 0.1], ["train", "val", "test"])
    split_of = {r.doc_id: (r.cluster_id, r.split) for r in out.collect()}
    assert len(split_of) == d.count()
    p = pairs.collect()
    assert p, "fixture should contain near-dup pairs"
    for r in p:
        assert split_of[r.doc_a][1] == split_of[r.doc_b][1]
    plain = {
        r.doc_id: r.s
        for r in d.select(
            "doc_id", split_column("doc_id", [0.8, 0.1, 0.1], ["train", "val", "test"]).alias("s")
        ).collect()
    }
    for i, (cl, sp) in split_of.items():
        if cl == i:
            assert sp == plain[i]


def test_pq_encode_matches_numpy(spark):
    """PQ codes equal the NumPy per-subspace argmin (first-min ties)
    over the same quantized integers."""
    import numpy as np

    from tmdataloader_spark.llmdata.clustering import QUANT, pq_encode, pq_fit

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_fit(e, m=4, ksub=16, iters=1)
    got = {r.vec_id: list(r.codes) for r in pq_encode(e, books).collect()}
    rows = e.collect()
    Cs = [np.asarray(b, dtype=np.int64) for b in books]
    for r in rows:
        X = np.floor(np.array(r.embedding, dtype=np.float64) * QUANT).astype(np.int64)
        off, want = 0, []
        for C in Cs:
            w = C.shape[1]
            xs = X[off : off + w]
            off += w
            d = (xs * xs).sum() - 2 * (C @ xs) + (C * C).sum(axis=1)
            want.append(int(np.argmin(d)))
        assert got[r.vec_id] == want


def test_ivfpq_output_contract(spark):
    """Per query: ranks are exactly 1..k, no self-matches, and the
    reranked cosine ordering is descending with id tie-break."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.llmdata.similarity import ivfpq_ann

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 6)
    out = ivfpq_ann(q, e, k=4).collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.cand_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine_sim, r.cand_id))
    assert set(by_q) == {0, 1, 2, 3, 4, 5}
    for rows in by_q.values():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3, 4]
        assert rows == sorted(rows, key=lambda t: (-t[1], t[2]))


def test_percentile_buckets_exact_vs_approx(spark):
    """The approx path agrees with the exact path away from cut
    boundaries, buckets partition each group ~evenly, and both paths
    are deterministic across repartitionings."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.llmdata.sampling import percentile_buckets

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", F.length("text").alias("score")
    )
    exact = {r.doc_id: r.bucket for r in percentile_buckets(d, "score", group_col="lang").collect()}
    exact2 = {
        r.doc_id: r.bucket
        for r in percentile_buckets(d.repartition(7), "score", group_col="lang").collect()
    }
    assert exact == exact2
    approx = {r.doc_id: r.bucket for r in percentile_buckets(d, "score", group_col="lang", approx=True).collect()}
    agree = sum(1 for k in exact if exact[k] == approx[k])
    assert agree / len(exact) > 0.9
    from collections import Counter

    per_bucket = Counter(exact.values())
    assert set(per_bucket) == {"head", "middle", "tail"}
