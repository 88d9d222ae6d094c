"""Unit tests for the vocabulary census (llmdata/vocab.py) and the
Z-order layout operator (llmdata/layout.py)."""

import pytest
from pyspark.sql import functions as F

from tmdataloader_spark.llmdata.layout import quantize, zorder_key, zorder_layout
from tmdataloader_spark.llmdata.vocab import length_profile, vocab_counts, vocab_topk


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "web", 22),
            (2, "the dog sat", "web", 11),
            (3, "cat cat cat", "books", 11),
            (4, "a b", "books", 3),
        ],
        "doc_id long, text string, source string, n_chars long",
    )


def test_vocab_counts(docs):
    rows = {r["term"]: (r["tf"], r["df"]) for r in vocab_counts(docs).collect()}
    assert rows["the"] == (3, 2)
    assert rows["cat"] == (4, 2)
    assert rows["sat"] == (2, 2)
    assert rows["mat"] == (1, 1)


def test_vocab_topk_order_and_rank(docs):
    top = vocab_topk(docs, k=3).collect()
    assert [(r["term"], r["tf"], r["rank"]) for r in top] == [
        ("cat", 4, 1),
        ("the", 3, 2),
        ("sat", 2, 3),  # tf tie with others broken by term asc
    ]


def test_length_profile_buckets(docs):
    prof = {
        (r["source_group"], r["length_bucket"]): (r["n_docs"], r["total_chars"])
        for r in length_profile(docs).collect()
    }
    # 22 -> floor(log2)=4, 11 -> 3, 3 -> 1
    assert prof[("web", 4)] == (1, 22)
    assert prof[("web", 3)] == (1, 11)
    assert prof[("books", 3)] == (1, 11)
    assert prof[("books", 1)] == (1, 3)


def test_length_profile_power_of_two_exact(spark):
    # the float-log2 failure mode: 2^k must land in bucket k, not k-1
    df = spark.createDataFrame(
        [(1, "s", 1024), (2, "s", 1023), (3, "s", 1)],
        "doc_id long, source string, n_chars long",
    )
    prof = {r["length_bucket"]: r["n_docs"] for r in length_profile(df).collect()}
    assert prof == {10: 1, 9: 1, 0: 1}


def test_quantize_bounds(spark):
    df = spark.range(1).select(
        quantize(F.lit(0), 0, 99, 4).alias("lo"),
        quantize(F.lit(99), 0, 99, 4).alias("hi"),
        quantize(F.lit(50), 0, 99, 4).alias("mid"),
        quantize(F.lit(-5), 0, 99, 4).alias("under"),
        quantize(F.lit(1000), 0, 99, 4).alias("over"),
    )
    r = df.first()
    assert r["lo"] == 0 and r["hi"] == 15 and r["mid"] == 8
    assert r["under"] == 0 and r["over"] == 15  # clamped


def test_zorder_key_interleaves(spark):
    # x=0b11, y=0b01, 2 bits: key bits are y1 x1 y0 x0 = 0 1 1 1 = 7
    df = spark.range(1).select(
        zorder_key([F.lit(3).cast("long"), F.lit(1).cast("long")], 2).alias("k")
    )
    assert df.first()["k"] == 7


def test_zorder_key_width_guard():
    with pytest.raises(ValueError):
        zorder_key([F.lit(0)] * 4, 16)


def test_zorder_locality(spark):
    """Neighbors in 2-D space get nearby keys: the average key distance
    of adjacent cells must be far below that of random pairs."""
    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    keyed = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], 4).alias("k")
    ).collect()
    keys = {(r["x"], r["y"]): r["k"] for r in keyed}
    assert len(set(keys.values())) == 256  # bijective on the grid
    adj = [
        abs(keys[(x, y)] - keys[(x + 1, y)])
        for x in range(15)
        for y in range(16)
    ]
    assert sum(adj) / len(adj) < 64  # random pairs would average ~85


def test_zorder_layout_clusters_files(spark):
    df = spark.range(1024).select(
        (F.col("id") % 32).alias("a"), (F.col("id") / 32).cast("long").alias("b")
    )
    out = zorder_layout(
        df, ["a", "b"], {"a": (0, 31), "b": (0, 31)}, bits=5, num_files=4
    )
    assert out.rdd.getNumPartitions() == 4
    # each range partition must hold a contiguous, non-overlapping key span
    spans = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(spans, spans[1:]):
        assert prev["hi"] <= cur["lo"]


def test_pair_counts_bpe_census(spark):
    from tmdataloader_spark.llmdata.vocab import pair_counts

    df = spark.createDataFrame(
        [
            (1, "a b a b c"),
            (2, "a b"),
            (3, "solo"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = pair_counts(df, k=10).collect()
    got = [(r["pair"], r["n"], r["rank"]) for r in rows]
    # pairs: doc1 -> (a b), (b a), (a b), (b c); doc2 -> (a b)
    assert got[0] == ("a b", 3, 1)
    assert set(got[1:]) == {("b a", 1, 2), ("b c", 1, 3)}  # tie: pair asc
    assert got[1] == ("b a", 1, 2)


def test_pmi_collocations_ranks_phrases(spark):
    import math

    from tmdataloader_spark.llmdata.vocab import pmi_collocations

    # "new york" always co-occurs (high PMI); "the a" pairs are
    # frequent but both words are common everywhere (low PMI)
    df = spark.createDataFrame(
        [(i, "new york " + "the a " * 3) for i in range(4)],
        "doc_id long, text string",
    )
    rows = pmi_collocations(df, k=10, min_count=2).collect()
    got = {r.pair: (r.n_pair, r.pmi, r.rank) for r in rows}
    assert rows[0].pair == "new york"
    # exact check of one PMI value: M=32 tokens (8/doc*4), N=28
    # bigrams (7/doc*4); new:4 york:4 -> ln(4*32*32/(28*4*4))
    want = round(math.log((4 * 32 * 32) / (28 * 4 * 4)), 6)
    assert got["new york"] == (4, want, 1)
    # support floor: "york the" occurs 4x (>=2) so it's present;
    # every pair here repeats per-doc, so just assert ordering sanity
    assert got["new york"][1] > got["the a"][1]


def test_pmi_min_count_floor(spark):
    from tmdataloader_spark.llmdata.vocab import pmi_collocations

    df = spark.createDataFrame(
        [(1, "x y"), (2, "p q p q")], "doc_id long, text string"
    )
    pairs = {r.pair for r in pmi_collocations(df, k=10, min_count=2).collect()}
    assert "x y" not in pairs  # count 1 < floor
    assert "p q" in pairs  # count 2
