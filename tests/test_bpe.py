"""BPE learn/apply (llmdata/bpe.py): pure-Python greedy-BPE
reference, the double-space replace invariant, sampling, and the
generated oracle."""

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

word_st = st.text(alphabet="abc", min_size=1, max_size=4)


def _py_bpe(texts: dict[int, str], k: int):
    corp = {i: list("|".join(t.strip().lower().split())) for i, t in texts.items()}
    merges = []
    for _ in range(k):
        counts: dict[tuple, int] = {}
        for syms in corp.values():
            for a, b in zip(syms, syms[1:]):
                if a == "|" or b == "|":
                    continue
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[0]
        merges.append(best)
        for i, syms in corp.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            corp[i] = out
    pieces = {i: [s for s in syms if s not in ("|", "")] for i, syms in corp.items()}
    return merges, pieces


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(word_st, min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_prop_bpe_matches_python_reference(spark, texts):
    """Learned merge LIST and per-doc piece counts match a
    token-level greedy BPE — proving the double-space replace trick
    implements exact greedy application (including overlapping runs
    like 'a a a a')."""
    from tmdataloader_spark.llmdata.bpe import bpe_apply, bpe_learn

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    merges = bpe_learn(df, k=4)
    ref_merges, ref_pieces = _py_bpe(docs, 4)
    assert [tuple(m) for m in merges] == ref_merges
    got = {r.doc_id: r.n_pieces for r in bpe_apply(df, merges).collect()}
    assert got == {i: len(p) for i, p in ref_pieces.items()}


def test_bpe_overlapping_run(spark):
    """'a a a a a' with merge (a,a): greedy leftmost pairing gives
    aa aa a — the exact case a naive single-space replace gets
    wrong."""
    from tmdataloader_spark.llmdata.bpe import apply_merges, symbolize
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, "aaaaa")], "doc_id long, text string")
    enc = df.select(
        apply_merges(symbolize(F.col("text")), [("a", "a")]).alias("e")
    ).collect()[0].e
    assert enc == " aa  aa  a "


def test_bpe_learning_sample_is_deterministic_subset(spark):
    """sample_fraction learns from the md5-bucket subset: merges are
    reproducible run-to-run and may differ from full-corpus merges,
    but application still covers every row."""
    from tmdataloader_spark.llmdata.bpe import bpe_apply, bpe_learn

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = bpe_learn(d, k=4, sample_fraction=0.3)
    m2 = bpe_learn(d, k=4, sample_fraction=0.3)
    assert m1 == m2 and len(m1) == 4
    out = bpe_apply(d, m1)
    assert out.count() == d.count()


def test_bpe_oracle_replays_learning_and_application(spark):
    import duckdb

    from tmdataloader_spark.llmdata.bpe import bpe_apply, bpe_learn, bpe_oracle_sql

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    merges = bpe_learn(d, k=4, sample_fraction=0.5)
    got = {r.doc_id: (r.n_pieces, r.enc_md5) for r in bpe_apply(d, merges).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    orc = {
        r[0]: (r[1], r[2])
        for r in con.execute(bpe_oracle_sql(4, sample_fraction=0.5)).fetchall()
    }
    assert got == orc


def test_local_and_distributed_learning_identical(spark):
    """The driver-local fast path (_learn_local, numpy) must select
    the EXACT merge sequence of the distributed loop — same counts,
    same max, same "X Y"-ascending tie-break, same greedy de-overlap
    — on real data including multi-byte text."""
    from tmdataloader_spark.llmdata.bpe import bpe_learn

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    local = bpe_learn(d, k=6, sample_fraction=0.5)
    dist = bpe_learn(d, k=6, sample_fraction=0.5, local_threshold_rows=0)
    assert local == dist and len(local) == 6

    rows = [
        (1, "aa bb aa bb aa"),
        (2, "aaa ümlaut aaa"),   # overlapping same-symbol runs + multibyte
        (3, ""),                  # empty doc contributes nothing
        (4, "aa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    local2 = bpe_learn(df, k=5)
    dist2 = bpe_learn(df, k=5, local_threshold_rows=0)
    assert local2 == dist2
