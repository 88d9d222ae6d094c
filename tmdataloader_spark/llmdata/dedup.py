"""Deduplication families for corpus curation at 100 TB.

Every operator avoids the O(n²) cross join:
- exact: hash-groupBy (map-side partial agg; shuffle carries one row
  per distinct hash)
- MinHash+LSH: shingles → k hash permutations → min per perm → band
  keys → candidates share a band (equi-join on band key) → exact
  Jaccard verification of candidates only
- SimHash: 32-bit signature; pairs within Hamming ≤ h found by
  pigeonhole blocking (h+1 bands ⇒ a qualifying pair must agree on at
  least one band — lossless, no cross join)
- embedding cosine: NumPy block matmul inside ``mapInPandas`` against
  a broadcast corpus matrix (the vectorized-Pandas-UDF scale path)

Hashes are md5-derived (portable across engines) so every stage is
oracle-checkable; xxhash64 would be faster but engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tmdataloader_spark.functions.ratio import round6_ratio as _round6_ratio


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content-hash groups with canonical (min-id) representative."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies")
    )


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition ahead of CPU-heavy per-row work: a small corpus
    parquet arrives as ONE input split, which would serialize the
    string/NumPy stages onto a single core. The shuffle moves only the
    raw rows (cheap) and buys full-cluster parallelism."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)


def _word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams as a pure Catalyst expression.
    Output matches MLlib NGram exactly: n consecutive tokens joined
    by one space, empty array when fewer than ``n`` tokens.

    Form: ``zip_with`` folded over n SHIFTED slices of the token
    array — n whole-array slices plus n−1 element-wise concats, all
    O(len) work total. The previous ``transform(sequence(...), i ->
    concat_ws(' ', slice(toks, i, n)))`` form re-evaluated a fresh
    per-index ``slice`` inside a higher-order lambda, which Spark
    runs interpreted per element — measured ~6× slower on the sf0.1
    corpus (and it sat on the hot path of EVERY shingle pipeline:
    MinHash, exact Jaccard, incremental dedup, curate)."""
    width = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, width)
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, i + 1, width),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hashed: bool = True,
) -> DataFrame:
    """Distinct word n-gram shingles per document, array form:
    ``(id, shingle_set)``.

    This is the SHARED base subplan of every shingle pipeline —
    ``ngram_jaccard_pairs`` and the MinHash/LSH chain both build on
    this exact function, so their plans canonicalize identically and a
    warm session's CacheManager serves one query's cached shingle sets
    to the other (pure expressions canonicalize reliably; the previous
    MLlib-NGram UDF did not always).

    With ``hashed`` (the default) each shingle is md5-hashed to a
    32-bit int BEFORE dedup/explode: every downstream shuffle, agg and
    join then carries one bigint per shingle instead of an n-word
    string. Hashes are engine-portable (md5), so SQL oracles reproduce
    them; collisions are deterministic and mirrored."""
    return _spread(df, id_col).select(
        F.col(id_col), shingle_set_expr(text_col, n, hashed).alias("shingle_set")
    )


def shingle_set_expr(text_col: str, n: int = 3, hashed: bool = True) -> Column:
    """The distinct-shingle ARRAY as a single Column expression —
    usable anywhere a per-row projection is (including streaming
    DataFrames, where :func:`shingle_sets`' repartition spread does
    not apply)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), " +")
    grams = _word_ngrams(toks, n)
    if hashed:
        grams = F.transform(grams, lambda s: _hash32(s, 0))
    return F.array_distinct(grams)


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hashed: bool = True,
) -> DataFrame:
    """Exploded long form of :func:`shingle_sets`:
    ``(id, n_shingles, shingle)`` — one row per distinct shingle."""
    return shingle_sets(df, text_col, id_col, n, hashed).select(
        id_col,
        F.size("shingle_set").alias("n_shingles"),
        F.explode("shingle_set").alias("shingle"),
    )


def _hash32(col: Column, seed: int) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5(seed:value)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10
    ).cast("long")


MINHASH_PRIME = (1 << 61) - 1  # Mersenne prime; a·h+b < 2^61 stays in int64


def minhash_params(num_perms: int) -> list[tuple[int, int]]:
    """Deterministic affine constants (aᵢ odd < 2^28, bᵢ < 2^32) from
    md5 bytes — shared verbatim by the SQL oracle."""
    import hashlib

    params = []
    for i in range(num_perms):
        d = hashlib.md5(f"minhash-perm:{i}".encode()).digest()
        a = (int.from_bytes(d[:4], "big") % (1 << 28)) | 1
        b = int.from_bytes(d[4:8], "big")
        params.append((a, b))
    return params


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_perms: int = 16
) -> DataFrame:
    """Per-document MinHash signature: min over shingles of each of
    ``num_perms`` permutations — one groupBy, signature as
    ``num_perms`` columns.

    Each shingle is md5-hashed ONCE to a 32-bit base; the permutations
    are affine transforms ``(aᵢ·h + bᵢ) mod (2^61−1)`` — the standard
    universal-hash family — in exact int64 arithmetic. This replaces
    ``num_perms`` string md5s per shingle row with one md5 + cheap
    integer math (the dominant cost of the whole MinHash pipeline at
    corpus scale) while staying bit-reproducible in any engine.

    When ``sh`` comes from ``shingles(..., hashed=True)`` the shingle
    column IS the base hash already — no md5 at all in this stage."""
    base = (
        F.col("shingle")
        if dict(sh.dtypes).get("shingle") == "bigint"
        else _hash32(F.col("shingle"), 0)
    )
    aggs = [
        F.min((F.lit(a) * base + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_perms))
    ]
    return sh.groupBy(id_col, "n_shingles").agg(*aggs)


def signatures_from_sets(
    sets: DataFrame,
    id_col: str = "doc_id",
    num_perms: int = 16,
    keep_set: bool = False,
) -> DataFrame:
    """MinHash signatures computed PER ROW from the shingle-hash array
    — ``mh_i = array_min(transform(shingle_set, h → (aᵢ·h+bᵢ) mod P))``
    — with no explode and no groupBy.

    Same values as :func:`minhash_signatures` (the oracle SQL is
    unchanged), but the corpus-sized explode→shuffle→min-agg of the
    token stream disappears: at 100 TB the signature stage becomes a
    pure projection inside the same scan that shingled the text, and
    the first shuffle of the whole MinHash pipeline is the (tiny)
    band-key self-join. Documents with no shingles produce no
    signature row (mirroring the grouped form, where they have no
    exploded rows).

    This is the pure-expression form — right when the caller's plan
    re-evaluates the projection on both sides of a cached self-join
    (:func:`minhash_lsh_pairs`), where the Arrow form's per-side
    boundary crossing of the shingle arrays was MEASURED slower (r15
    A/B, 3/4 iterations). For a compute-once signature store use
    :func:`signatures_from_sets_arrow` — same values, ~2.3× faster
    when the signatures are materialized once."""
    arr = F.col("shingle_set")
    mh_cols = [
        F.array_min(
            F.transform(arr, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME))
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_perms))
    ]
    keep = [arr] if keep_set else []
    return sets.filter(F.size(arr) > 0).select(
        F.col(id_col), F.size(arr).alias("n_shingles"), *keep, *mh_cols
    )


def signatures_from_sets_arrow(
    sets: DataFrame,
    id_col: str = "doc_id",
    num_perms: int = 16,
    keep_set: bool = False,
) -> DataFrame:
    """:func:`signatures_from_sets` as an Arrow-batched NumPy kernel
    (guide §4.2 — whole batches to vectorized native code): the ragged
    shingle arrays are flattened once per batch and each permutation
    is one vectorized affine-mod pass + one ``minimum.reduceat``
    segment-min. Exact int64 arithmetic end-to-end (a < 2^28,
    h < 2^32 ⇒ a·h+b < 2^61), so values are bit-identical to the
    expression form and the DuckDB oracle; memory stays bounded (one
    permutation's |batch-shingles| vector at a time).

    Measured ~2.3× faster than the expression form when the
    signatures are computed ONCE and materialized (the
    ``incremental.signature_store`` shape: 1.2 s → 0.71 s at sf0.1,
    3/3 A/B iterations). NOT used by :func:`minhash_lsh_pairs`, whose
    band-key frame feeds both self-join sides — there the kernel
    executes once per side and the double Arrow crossing of the
    shingle arrays measured slower than the interpreted projection."""
    import numpy as np
    import pandas as pd

    params = minhash_params(num_perms)
    cols = [id_col, "n_shingles"] + (["shingle_set"] if keep_set else []) + [
        f"mh_{i}" for i in range(num_perms)
    ]
    schema = ", ".join(
        f"{c} long"
        if c == id_col or c.startswith("mh_")
        else ("n_shingles int" if c == "n_shingles" else "shingle_set array<bigint>")
        for c in cols
    )

    def fn(batches):
        A = np.array([a for a, _ in params], dtype=np.int64)
        B = np.array([b for _, b in params], dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = pdf["shingle_set"]
            lens = np.array([0 if x is None else len(x) for x in arrs])
            m = lens > 0
            if not m.any():
                continue
            kept = arrs[m]
            klens = lens[m]
            flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in kept])
            offs = np.concatenate(([0], np.cumsum(klens)[:-1]))
            out = {
                id_col: pdf[id_col].to_numpy()[m],
                "n_shingles": klens.astype("int32"),
            }
            if keep_set:
                out["shingle_set"] = list(kept)
            for i in range(num_perms):
                vals = (A[i] * flat + B[i]) % MINHASH_PRIME
                out[f"mh_{i}"] = np.minimum.reduceat(vals, offs)
            yield pd.DataFrame(out)

    return sets.select(F.col(id_col), F.col("shingle_set")).mapInPandas(
        fn, schema=schema
    )


def lsh_band_keys(
    sigs: DataFrame, id_col: str = "doc_id", num_perms: int = 16, bands: int = 4
) -> DataFrame:
    """Band keys: md5 over each band's signature slice → (doc, band,
    band_key) long frame. Docs sharing any (band, band_key) are
    candidates."""
    rows = num_perms // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws(",", *parts)).alias("band_key")
            )
        )
    return sigs.select(
        id_col, "n_shingles", F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, "n_shingles", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    ngram: int = 3,
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: returns (doc_a, doc_b,
    jaccard) for candidate pairs (band collision) whose EXACT shingle
    Jaccard ≥ threshold. Deterministic: md5 permutations, rounded
    jaccard.

    Verification joins the candidate pairs back to the cached shingle
    ARRAYS and computes ``size(array_intersect(...))`` — two narrow
    equi-joins carrying one array per candidate, instead of re-joining
    the exploded shingle stream (whose volume is the whole corpus,
    not the candidate set)."""
    # same cached base subplan as ngram_jaccard_pairs — in a warm
    # session whichever runs first feeds the other
    sets = shingle_sets(df, text_col, id_col, n=ngram).cache()
    # per-row signatures: no explode, no shuffle (signatures_from_sets)
    sigs = signatures_from_sets(sets, id_col, num_perms)
    bandkeys = lsh_band_keys(sigs, id_col, num_perms, bands)
    a = bandkeys.alias("a")
    b = bandkeys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n_shingles").alias("n_a"),
            F.col("b.n_shingles").alias("n_b"),
        )
        .distinct()
    )
    fa = sets.select(F.col(id_col).alias("doc_a"), F.col("shingle_set").alias("arr_a"))
    fb = sets.select(F.col(id_col).alias("doc_b"), F.col("shingle_set").alias("arr_b"))
    jac = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            # integer-exact HALF_UP ratio (functions/ratio.py): the
            # count ratio lands on exact .5 micro-units (e.g. odd
            # n_inter over a 640-shingle union) where engines' double
            # rounding splits
            _round6_ratio("n_inter", "n_a + n_b - n_inter"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard ≥ threshold pairs via
    shingle-explode + equi-join (candidate pairs only, no cross join).

    ``max_df`` is the skew guard: shingles appearing in more than
    ``max_df`` documents are dropped from BOTH the candidate join and
    the per-document shingle sets (standard stop-shingle practice — a
    shingle in k docs emits k² join rows, so one hot stop-phrase is a
    shuffle bomb at corpus scale). Jaccard is then computed over the
    DF-filtered sets on both sides, which keeps the result exactly
    reproducible by an oracle applying the same filter.

    Shingles are md5-hashed to 32-bit ints BEFORE the self-join: the
    DF agg, shuffle, and equi-join all carry one bigint per shingle
    instead of an ~n-word string — a large shuffle-byte and compare
    saving at corpus scale. Hash collisions (rare at 32 bits) are
    deterministic and mirrored by the oracle, so results stay exact
    between engines.

    Candidate generation uses LOSSLESS prefix filtering (the
    AllPairs / set-similarity-join principle, cf. Bayardo et al.
    WWW'07 and Vernica et al. SIGMOD'10): with every set ordered by
    the same global total order, two sets with Jaccard ≥ t must share
    a shingle inside BOTH sets' first ``|x| − ⌈t·|x|⌉ + 1`` elements.
    The self-join therefore touches only those prefix rows —
    candidate volume tracks the true-duplicate count instead of the
    quadratic shared-shingle mass — and the few candidates are
    exact-verified with ``array_intersect`` on the full sets. Same
    result set, orders-of-magnitude fewer join rows at corpus scale.
    The order used is the 32-bit shingle hash itself: effectively a
    random permutation (prefix collisions ≈ (1−t)² of shared-shingle
    mass) obtained by one narrow ``array_sort`` projection — no
    document-frequency pass, no re-aggregation."""
    # Cached: feeds the skew-guard agg, the prefix self-join, and the
    # verification joins — without the cache the tokenize+hash stage
    # runs once per consumer. MEMORY_AND_DISK, so an over-budget
    # corpus spills instead of OOMing; a warm session's later MinHash
    # run reuses the same cached subplan.
    sets = shingle_sets(df, text_col, id_col, n=n).cache()
    if max_df is not None:
        # Hot shingles are the Zipf tail above the DF cap — a bounded
        # vocabulary of stop-phrases. Keep the list INSIDE the plan: a
        # one-row collect_list aggregate broadcast-cross-joined onto
        # every document, so no driver round-trip and no extra job —
        # the DF agg is one map-side-combined shuffle of
        # (shingle, count) feeding a tiny broadcast.
        hot_arr = (
            sets.select(F.explode("shingle_set").alias("s"))
            .groupBy("s")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
            .agg(F.collect_list("s").alias("_hot"))
        )
        sets = sets.join(F.broadcast(hot_arr)).select(
            id_col,
            F.array_except(F.col("shingle_set"), F.col("_hot")).alias("shingle_set"),
        )
    # cached too: the self-join reads it twice and the verify join twice
    # more — without this the hot-shingle agg + array_except + sort
    # subplan runs four times per query
    ordered = sets.select(
        F.col(id_col),
        F.array_sort("shingle_set").alias("shingle_arr"),
        F.size("shingle_set").alias("n_sh"),
    ).cache()
    # prefix length |x| − ⌈t·|x|⌉ + 1; the 1e-9 nudge keeps a float
    # threshold from over-rounding ceil upward (a longer prefix is
    # merely more candidates — still lossless, verification is exact)
    plen = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9)) + 1
    pex = ordered.select(
        F.col(id_col), F.col("n_sh"),
        F.explode(F.slice("shingle_arr", 1, plen)).alias("shingle"),
    )
    # length filter (also lossless): Jaccard ≥ t forces
    # t·|b| ≤ |a| ≤ |b|/t, so size-mismatched pairs never qualify and
    # can be dropped inside the join before the distinct
    cand = (
        pex.alias("a")
        .join(
            pex.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("a.n_sh") * F.lit(threshold) <= F.col("b.n_sh"))
            & (F.col("b.n_sh") * F.lit(threshold) <= F.col("a.n_sh")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    fa = ordered.select(
        F.col(id_col).alias("doc_a"),
        F.col("shingle_arr").alias("arr_a"),
        F.col("n_sh").alias("n_a"),
    )
    fb = ordered.select(
        F.col(id_col).alias("doc_b"),
        F.col("shingle_arr").alias("arr_b"),
        F.col("n_sh").alias("n_b"),
    )
    jac = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            # integer-exact HALF_UP ratio (functions/ratio.py): the
            # count ratio lands on exact .5 micro-units (e.g. odd
            # n_inter over a 640-shingle union) where engines' double
            # rounding splits
            _round6_ratio("n_inter", "n_a + n_b - n_inter"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def dup_ngram_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Per-document duplicated-content signal: the fraction of a
    document's DISTINCT word ``n``-grams that also occur in at least
    ``min_df`` documents corpus-wide (itself included) — the n-gram
    granularity analogue of CCNet's duplicated-line fraction and C4's
    repeated-content filters. High values flag boilerplate, mirror
    and template pages that near-dup pair mining (which needs a
    matching PARTNER document above the Jaccard threshold) can miss.

    Output: ``(id, n_shingles, n_dup, round(dup_fraction, 6))``, one
    row per input document (0-shingle docs report fraction 0.0).

    100 TB shape: reuses the shared :func:`shingle_sets` subplan (one
    bigint per shingle in every shuffle), then ONE map-side-combined
    df aggregate over the gram stream, a LEFT SEMI equi-join of the
    stream against the duplicated-gram keys (the small side by
    construction — duplicated grams are the minority in a deduped
    crawl; AQE broadcasts it when it fits), and one per-doc count.
    No windows, no driver state, no quadratic candidate step.
    """
    sets = shingle_sets(df, text_col, id_col, n).cache()
    stream = sets.select(id_col, F.explode("shingle_set").alias("shingle"))
    dup_grams = (
        stream.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("shingle")
    )
    dup_counts = (
        stream.join(dup_grams, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup"))
    )
    return (
        sets.select(id_col, F.size("shingle_set").alias("n_shingles"))
        .join(dup_counts, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup"),
            F.round(
                F.when(
                    F.col("n_shingles") > 0,
                    F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
                    / F.col("n_shingles"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_fraction"),
        )
    )


def exact_substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
) -> DataFrame:
    """ExactSubstr deduplication: remove every duplicated ``n``-token
    span from all but its corpus-first occurrence, then reassemble the
    documents (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better" — the suffix-array ExactSubstr pass,
    re-expressed relationally so it distributes).

    Semantics: tokenization is a lossless single-space split (NOT the
    normalizing :func:`tmdataloader_spark.llmdata.text.tokens` — the
    surviving tokens must re-concatenate into the original text minus
    the removed spans). An n-gram occurrence at ``(doc, pos)`` is a
    duplicate iff any occurrence of the same n words exists at a
    smaller ``(doc_id, pos)`` — including earlier in the SAME
    document, so internal boilerplate repeats are removed too. A
    token is dropped iff it lies inside at least one duplicate span;
    overlapping spans merge naturally through the containment test.

    Output: ``(id, text, n_tokens, n_removed)`` — one row per input
    document, ``text`` rewritten with the duplicated spans cut out
    (empty string when everything was a duplicate).

    100 TB shape: one row per n-gram OCCURRENCE (not per distinct
    gram) flows into a single ``row_number`` window keyed by the
    md5 of the gram — high-cardinality key, so the shuffle spreads
    evenly and no LIKE/theta join appears. Duplicate starts come back
    to their document through one map-side-combined groupBy(id), and
    the span-containment filter runs as a per-row Catalyst
    ``filter(..., (tok, i) -> !exists(starts, ...))`` over arrays
    bounded by document length — no token-level join. Cost is
    O(corpus tokens) rows shuffled once, vs the sequential suffix
    array the paper builds (which has no distributed construction).
    """
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    base = _spread(df, id_col).select(id_col, toks.alias("_toks"))
    occ = base.select(
        id_col,
        F.posexplode(_word_ngrams(F.col("_toks"), n)).alias("pos", "gram"),
    ).select(id_col, "pos", F.md5(F.col("gram")).alias("gram"))
    w = Window.partitionBy("gram").orderBy(id_col, "pos")
    dup_starts = (
        occ.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_starts"))
    )
    joined = base.join(dup_starts, id_col, "left").withColumn(
        "_starts", F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.col("_toks"),
        lambda tok, i: ~F.exists(
            F.col("_starts"), lambda s: (s <= i) & (i < s + n)
        ),
    )
    return joined.select(
        id_col,
        F.concat_ws(" ", kept).alias(text_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """32-bit SimHash over whitespace tokens (md5-derived token
    hashes): bit b of the signature is the sign of the sum of
    (±1 per token occurrence) — computed as the equivalent ones-count
    majority ``2·ones_b > n_tokens``.

    The token hashes are md5-derived in the JVM (one codegen
    ``transform`` per row — portable, oracle-replayable); the 32 bit
    majorities run as an Arrow-batched NumPy kernel: the ragged hash
    arrays flatten once per batch and each bit is one vectorized
    ``(flat >> b) & 1`` plus an ``add.reduceat`` segment sum. Exact
    integer arithmetic ⇒ signatures bit-identical to the former
    explode → groupBy(33 aggregates) form (A/B-verified), but the
    corpus-sized token explode and its shuffle disappear: at 100 TB
    the signature stage is a per-row projection inside the scan, the
    same regime as :func:`signatures_from_sets_arrow`. Documents with
    NULL text produce no row (the explode form dropped them too)."""
    import numpy as np
    import pandas as pd

    toks = F.split(F.trim(F.lower(F.col(text_col))), " +")
    hs = _spread(df, id_col).select(
        F.col(id_col), F.transform(toks, lambda t: _hash32(t, 0)).alias("_hs")
    )

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = pdf["_hs"]
            lens = np.array([0 if x is None else len(x) for x in arrs])
            m = lens > 0
            if not m.any():
                continue
            klens = lens[m]
            flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in arrs[m]])
            offs = np.concatenate(([0], np.cumsum(klens)[:-1]))
            sig = np.zeros(len(klens), dtype=np.int64)
            for b in range(bits):
                ones = np.add.reduceat((flat >> b) & 1, offs)
                sig |= (2 * ones > klens).astype(np.int64) << b
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy()[m], "simhash": sig})

    return hs.mapInPandas(fn, schema=f"{id_col} long, simhash long")


def simhash_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Pairs within Hamming ≤ max_hamming via pigeonhole blocking:
    split the signature into (max_hamming+1) bands; any qualifying
    pair agrees on ≥1 band, so an equi-join on (band, band_bits)
    finds every pair — no cross join, exact results."""
    nb = max_hamming + 1
    width = bits // nb
    bands = []
    for b in range(nb):
        mask = ((1 << width) - 1) << (b * width)
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.col("simhash").bitwiseAND(F.lit(mask)).alias("band_bits"),
            )
        )
    # cached: both self-join sides read this frame — without it the
    # upstream signature aggregation (token explode + 32 bit-sums)
    # runs twice per query; size is n_docs × (id, sig, band) rows,
    # MEMORY_AND_DISK so an over-budget corpus spills instead of OOM
    keyed = sig.select(
        id_col, "simhash", F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, "simhash", "bk.band", "bk.band_bits").cache()
    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold — EXACT all-pairs
    semantics via a distributed block-pair matmul.

    100 TB shape: rows are hash-split into ``num_blocks`` blocks; every
    unordered block pair (i ≤ j) becomes one cogroup whose two sides
    are the two blocks; each task runs one NumPy matmul over its
    (n/B × n/B) tile. Replication is ×(B+1) per row — bounded and
    chosen by ``num_blocks`` — with NO driver-side collect or
    broadcast of the corpus; size B so a tile fits executor memory
    (B ≈ n·d·8 / tile_budget). Exact all-pairs is inherently O(n²)
    compares; for approximate-but-linear near-dup at extreme scale use
    the LSH bucketing in ``similarity.lsh_ann`` instead."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pairs = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)],
        "ba int, bb int",
    )
    tagged = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(num_blocks)).cast("int").alias("blk"),
    )
    left = (
        tagged.alias("tl")
        .join(F.broadcast(pairs.alias("pl")), F.col("tl.blk") == F.col("pl.ba"))
        .select("pl.ba", "pl.bb", "tl.vid", "tl.vec")
    )
    # distinct column names on the right side keep the cogroup's two
    # children free of shared attribute ids (self-join ambiguity)
    right = (
        tagged.alias("tr")
        .join(F.broadcast(pairs.alias("pr")), F.col("tr.blk") == F.col("pr.bb"))
        .select(
            F.col("pr.ba").alias("rba"),
            F.col("pr.bb").alias("rbb"),
            F.col("tr.vid").alias("rvid"),
            F.col("tr.vec").alias("rvec"),
        )
    )

    def tile(key, lpdf, rpdf):
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame(columns=["doc_a", "doc_b", "cosine_sim"])
        lm = np.array(list(lpdf["vec"]), dtype=np.float64)
        rm = np.array(list(rpdf["rvec"]), dtype=np.float64)
        lm = lm / np.linalg.norm(lm, axis=1, keepdims=True)
        rm = rm / np.linalg.norm(rm, axis=1, keepdims=True)
        sims = lm @ rm.T
        li, ri = np.nonzero(sims >= threshold)
        lids = lpdf["vid"].to_numpy()[li]
        rids = rpdf["rvid"].to_numpy()[ri]
        keep = lids != rids
        if key[0] == key[1]:
            # same block on both sides: each unordered pair appears
            # twice — keep the (a < b) orientation only
            keep &= lids < rids
        a = np.minimum(lids[keep], rids[keep])
        b = np.maximum(lids[keep], rids[keep])
        return pd.DataFrame(
            {"doc_a": a, "doc_b": b, "cosine_sim": np.round(sims[li, ri][keep], 6)}
        )

    return (
        left.groupby("ba", "bb")
        .cogroup(right.groupby("rba", "rbb"))
        .applyInPandas(tile, schema="doc_a long, doc_b long, cosine_sim double")
    )


def _components_local(edges: list[tuple[int, int]]):
    """Driver-local union-find over a BOUNDED edge list — identical
    semantics to the hash-min fixpoint (component label = minimum
    node id of the connected component), in one pass instead of
    diameter-many Spark rounds."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edges:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[rv] = ru
    comp_min: dict[int, int] = {}
    for node in parent:
        r = find(node)
        if r not in comp_min or node < comp_min[r]:
            comp_min[r] = node
    return [(node, comp_min[find(node)]) for node in parent]


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
    local_threshold_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components over a near-dup pair list — the step that
    turns pairwise matches (MinHash/SimHash/embedding) into dedup
    GROUPS with a canonical keeper: output is ``(node, component)``
    where ``component`` is the minimum node id of the group, i.e. the
    member a keep-one policy retains.

    Algorithm: hash-min label propagation (the map-reduce classic, cf.
    Kang et al. PEGASUS, ICDM'09) — every node starts labeled with its
    own id; each round every node takes the min of its own and its
    neighbors' labels; converged when no label changes. Rounds needed
    = graph diameter, which for near-dup clusters is tiny (they are
    clique-ish); each round is ONE shuffle (edge-label join + min agg)
    plus a cheap convergence check, with ``localCheckpoint`` breaking
    the lineage so plans stay flat no matter how many rounds run.
    No driver-side graph: state is two distributed tables (edges,
    labels) — the same loop runs on a 10^11-edge graph given executor
    memory for the label table's shuffle partitions.

    Bounded fast path (r8): near-dup edge lists are DUPLICATE-sized,
    not corpus-sized — in a curated corpus they are tiny relative to
    the documents. When at most ``local_threshold_edges`` edges exist,
    one driver-local union-find (:func:`_components_local`) replaces
    the iterative rounds — same (node, min-id component) output,
    asserted equal by tests — and the result table (≤ 2·edges rows)
    broadcasts back. Above the threshold, or with
    ``local_threshold_edges=0``, the distributed loop runs, so a
    pathological all-duplicates corpus never funnels through the
    driver.
    """
    dtypes = dict(pairs.dtypes)
    integral_ids = {dtypes.get(src_col), dtypes.get(dst_col)} <= {
        "tinyint", "smallint", "int", "bigint"
    }
    # a half-NULL edge carries no linkage: drop it in BOTH paths so
    # the fast path and the distributed loop keep identical semantics
    # (r9 ADVICE — None endpoints made the local union-find's
    # min-comparison raise while the join path silently ignored them)
    pairs = pairs.filter(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
    if local_threshold_edges and integral_ids:
        probe = pairs.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("v")
        ).limit(local_threshold_edges + 1).collect()
        if len(probe) <= local_threshold_edges:
            rows = _components_local([(r.u, r.v) for r in probe])
            spark = pairs.sparkSession
            schema = "node long, component long"
            # threshold-bounded by construction -> downstream joins
            # against the corpus should broadcast this side
            if not rows:
                return F.broadcast(spark.createDataFrame([], schema))
            return F.broadcast(spark.createDataFrame(rows, schema))
    edges = pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    edges = (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select("u").distinct().select("u", F.col("u").alias("component"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("component").alias("nc")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nc").alias("nbr_component"))
        )
        # carry a changed-flag through the SAME projection so the
        # convergence check reads the checkpointed result instead of
        # re-joining new labels against old (one join per round saved)
        new_val = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_component"), F.col("component")),
        )
        stepped = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                new_val.alias("component"),
                (new_val < F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        labels = stepped.select("u", "component")
        # the UNFILTERED count both materializes the lazy checkpoint
        # (every partition computes exactly once) and reads the
        # convergence flag — one job per round, not checkpoint + check
        changed = stepped.groupBy().agg(
            F.sum(F.col("_changed").cast("int")).alias("n")
        ).collect()[0]["n"]
        if not changed:
            break
    return labels.select(F.col("u").alias("node"), "component")


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for EVERY document: members of a near-dup
    component get its min-id as ``cluster_id``; untouched documents
    are their own singleton cluster. ``filter(cluster_id == doc_id)``
    is then exactly the deduplicated corpus (keep-one policy)."""
    comp = connected_components(pairs, src_col, dst_col)
    return df.select(F.col(id_col)).join(
        comp.select(F.col("node").alias(id_col), "component"), id_col, "left"
    ).select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
    )
