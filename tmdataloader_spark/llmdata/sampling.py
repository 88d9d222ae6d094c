"""Deterministic sampling / dataset splitting for training-data
pipelines.

``rand()``-based sampling is irreproducible across engines, runs, and
partitionings; training pipelines need splits that are STABLE under
re-runs, backfills, and engine swaps. Everything here derives from the
portable 32-bit md5 hash of the row id (the same
``conv(substring(md5(...)))`` pattern the dedup operators use), so a
DuckDB/BigQuery/Trino oracle reproduces every assignment bit-for-bit,
and adding rows never reshuffles existing assignments.

100 TB shape: pure per-row expressions — no shuffle, no state, no
sampling-time scan of the population. Filters push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKETS = 1_000_000


def _bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6): portable 32-bit md5 arithmetic."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _BUCKETS
    )


def split_column(
    id_col: Column | str,
    weights: list[float],
    labels: list[str],
    salt: str = "split",
) -> Column:
    """Label column assigning each row to one of ``labels`` with
    proportions ``weights`` (must sum to ~1). Deterministic in the row
    id and ``salt``: re-runs, engine swaps, and appends never move an
    existing row between splits."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must have the same length")
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights)}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    b = _bucket(c, salt)
    expr = None
    acc = 0.0
    for wt, label in zip(weights, labels):
        acc += wt
        bound = int(round(acc * _BUCKETS))
        cond = b < F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(F.lit(labels[-1]))


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample: keeps the rows whose hash
    bucket falls below ``fraction``. Unlike ``df.sample`` this is
    stable across runs/engines and composable (same salt ⇒ nested
    subsamples; different salts ⇒ independent samples)."""
    return df.filter(_bucket(F.col(id_col), salt) < int(round(fraction * _BUCKETS)))


def hash_sample_flag(
    fraction: float, id_col: Column | str = "doc_id", salt: str = "sample"
) -> Column:
    """Membership FLAG (0/1 int) for the deterministic Bernoulli
    sample ``hash_sample`` keeps — same bucket arithmetic, exposed as
    a column so a query can carry sample membership alongside other
    assignments without a second scan. Same salt ⇒ nested subsample
    of any other same-salt sample/stratification."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (_bucket(c, salt) < int(round(fraction * _BUCKETS))).cast("int")


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    languages, keep all rare ones). ``fractions`` maps stratum value →
    keep fraction; strata not listed keep ``default_fraction``. Pure
    per-row expression — no shuffle, no per-stratum scan."""
    b = _bucket(F.col(id_col), salt)
    thresh = None
    for value, frac in fractions.items():
        bound = F.lit(int(round(frac * _BUCKETS)))
        cond = F.col(stratum_col) == value
        thresh = F.when(cond, bound) if thresh is None else thresh.when(cond, bound)
    thresh = (
        thresh.otherwise(F.lit(int(round(default_fraction * _BUCKETS))))
        if thresh is not None
        else F.lit(int(round(default_fraction * _BUCKETS)))
    )
    return df.filter(b < thresh)


def mixture_fractions(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_rows: int = 1000,
    clamp: bool = True,
) -> DataFrame:
    """Per-stratum keep fractions for temperature-based mixture
    resampling: stratum ``s`` with ``n_s`` rows gets sampling weight
    ``n_s**alpha / Σ_t n_t**alpha`` (the multilingual-training
    "temperature" reweighting — ``alpha < 1`` upsamples rare strata
    relative to their natural share, ``alpha = 1`` keeps the natural
    mixture), scaled so the expected kept total is ``target_rows`` and
    clamped at 1.0 (a stratum is never upsampled beyond its
    population; the lost mass is reported, not silently reassigned).

    Output: ``(stratum, n_rows, round(weight, 6), round(fraction, 6))``
    — stratum-cardinality sized (tiny). One keyed agg + a one-row
    total broadcast back; fractions are rounded to 6 decimals so the
    downstream hash thresholds are engine-portable.

    ``clamp=False`` skips the 1.0 cap — the fraction table for the
    UPSAMPLING consumers (:func:`mixture_upsample` and
    ``streaming.stream_mixture_upsample``), where f > 1 means
    repeated copies rather than an impossible keep-probability.
    """
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_rows")
    )
    wexpr = F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))
    weighted = counts.select("stratum", "n_rows", wexpr.alias("_w"))
    total = weighted.agg(F.sum("_w").alias("_wsum"))
    raw = (
        F.lit(float(target_rows))
        * (F.col("_w") / F.col("_wsum"))
        / F.col("n_rows").cast("double")
    )
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "stratum",
            "n_rows",
            F.round(F.col("_w") / F.col("_wsum"), 6).alias("weight"),
            F.round(F.least(F.lit(1.0), raw) if clamp else raw, 6).alias("fraction"),
        )
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_rows: int = 1000,
    id_col: str = "doc_id",
    salt: str = "mixture",
) -> DataFrame:
    """Deterministic temperature-mixture resample: compute
    :func:`mixture_fractions` (one tiny agg), broadcast-join the
    per-stratum fraction back, and keep the rows whose md5 bucket
    falls under ``round(fraction * 1e6)``.

    100 TB shape: the corpus is scanned twice (counts + filter) and
    never shuffled — the fraction table is stratum-sized and
    broadcast. Same-salt determinism means re-runs, engine swaps, and
    backfills keep the identical row set; appends only ADD rows (an
    existing row's bucket never moves, though fractions drift as
    counts grow — pin the fraction table for strict append-stability).
    """
    # underscore-prefixed internal names (repo convention, see
    # quota_sample's _qb/_qshard) so a caller column named "stratum"
    # never makes the join condition ambiguous or gets dropped
    fracs = mixture_fractions(df, stratum_col, alpha, target_rows).select(
        F.col("stratum").alias("_mix_stratum"),
        (F.round(F.col("fraction") * _BUCKETS)).cast("long").alias("_mix_thr"),
    )
    b = _bucket(F.col(id_col), salt)
    # null-safe equality: a NULL stratum is a legitimate group (both
    # Spark and SQL GROUP BY keep it) — a plain equi-join would
    # silently drop those rows instead of sampling them
    return (
        df.join(
            F.broadcast(fracs),
            F.col(stratum_col).eqNullSafe(F.col("_mix_stratum")),
            "inner",
        )
        .filter(b < F.col("_mix_thr"))
        .drop("_mix_stratum", "_mix_thr")
    )


def quota_sample(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — the quota/budget shape
    of stratified sampling ("at most N documents per domain"), where
    :func:`stratified_hash_sample`'s FRACTION shape can't bound heavy
    strata without a population scan to size the fractions.

    Selection within a stratum is by ascending md5 bucket (id as the
    tie-break), so the chosen subset is deterministic across runs,
    engines, and partitionings, and is STABLE under appends: a new row
    only enters the quota by displacing the current highest-hash
    member, never by reshuffling the rest.

    100 TB shape: two-phase top-k. A naive per-stratum window sorts
    every row of a stratum on ONE task — a web-crawl "domain = blogspot
    .com" stratum would be a straggler. Instead phase 1 windows over
    (stratum, hash-shard) keeping each shard's local top-``cap``
    (≤ cap·shards survivors per stratum, dropped before any global
    move), and phase 2 re-ranks only those survivors per stratum.
    Selecting the global lowest-``cap`` by (bucket, id) is a
    selection problem, so the two phases return exactly the
    single-window answer."""
    from pyspark.sql import Window

    b = _bucket(F.col(id_col), salt)
    shards = 16
    w_local = Window.partitionBy(stratum_col, "_qshard").orderBy("_qb", id_col)
    w_global = Window.partitionBy(stratum_col).orderBy("_qb", id_col)
    return (
        df.withColumn("_qb", b)
        .withColumn("_qshard", F.pmod(F.col("_qb"), F.lit(shards)))
        .withColumn("_qr", F.row_number().over(w_local))
        .filter(F.col("_qr") <= cap)
        .withColumn("_qr", F.row_number().over(w_global))
        .filter(F.col("_qr") <= cap)
        .drop("_qr", "_qb", "_qshard")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: list[float],
    labels: list[str],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: the split is hashed
    from the document's near-duplicate CLUSTER id, not its own id, so
    all members of a near-dup family land in the same split. Plain
    per-doc hashing leaks — a near-copy of a training document in the
    test split inflates eval (the contamination mode measured by Lee
    et al. 2021 §6.2 and Elazar et al.'s "What's In My Big Data?");
    hashing the cluster representative removes it by construction
    while keeping every :func:`split_column` property (deterministic,
    append-stable, engine-portable).

    ``pairs`` is any near-dup edge list ((doc_a, doc_b) — MinHash/
    SimHash/embedding pairs). Output: ``(id, cluster_id, split)`` —
    one row per input document.

    100 TB shape: adds exactly the :func:`~tmdataloader_spark.llmdata.
    dedup.dedup_clusters` cost (hash-min label propagation over the
    pair list, O(diameter) rounds) plus one equi-join of the corpus
    against the id→cluster frame; the split itself stays a pure
    per-row md5 expression on ``cluster_id``.
    """
    from tmdataloader_spark.llmdata.dedup import dedup_clusters

    clusters = dedup_clusters(df, pairs, id_col=id_col)
    return clusters.select(
        id_col,
        "cluster_id",
        split_column("cluster_id", weights, labels, salt).alias("split"),
    )


def percentile_buckets(
    df: DataFrame,
    score_col: str,
    cuts: tuple[float, ...] = (0.333333, 0.666667),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    group_col: str | None = None,
    id_col: str = "doc_id",
    approx: bool = False,
) -> DataFrame:
    """CCNet-style per-group percentile bucketing (Wenzek et al.
    2020, "CCNet: Extracting high quality monolingual datasets from
    web crawl data" — the head/middle/tail split by per-language
    perplexity percentile): each row gets the bucket its score's
    percent-rank (within ``group_col``) falls into. Ordering is by
    ``(score, id)`` so ranks — and therefore buckets — are unique and
    deterministic in any engine.

    Output: input columns + ``(pctile, bucket)``.

    Scale: the exact path (``approx=False``) sorts each group once —
    fine when groups are language-sized slices of a partitioned
    corpus, but one language of a 100 TB crawl on one sort is a
    straggler; pass ``approx=True`` to switch to per-group
    ``percentile_approx`` thresholds (one tiny agg broadcast back, no
    global sort, identical buckets away from the cut boundaries —
    the trade CCNet itself makes by binning perplexities).

    Boundary semantics differ BETWEEN the two paths by design: the
    exact path buckets by strict ``percent_rank() < cut`` while the
    approx path buckets by ``score <= threshold`` — a row whose score
    equals a threshold (or ties with many rows at the cut) can land
    one bucket lower on the approx path than on the exact path, over
    and above the approximation error itself.  The approx path also
    emits no ``pctile`` column (there is no rank to report)."""
    from pyspark.sql import Window

    if len(labels) != len(cuts) + 1:
        raise ValueError("need exactly len(cuts)+1 labels")
    gcols = [group_col] if group_col else []
    if approx:
        # collision-safe temp names: a caller column literally named
        # "_t0" must survive the join+drop untouched
        tcols = [f"__pctl_t{i}" for i in range(len(cuts))]
        thr = df.groupBy(*gcols).agg(
            *[
                F.percentile_approx(score_col, c, 10_000).alias(t)
                for t, c in zip(tcols, cuts)
            ]
        )
        joined = (
            df.join(F.broadcast(thr), gcols, "left") if gcols else df.crossJoin(F.broadcast(thr))
        )
        bucket = F.when(F.col(score_col) <= F.col(tcols[0]), labels[0])
        for i in range(1, len(cuts)):
            bucket = bucket.when(F.col(score_col) <= F.col(tcols[i]), labels[i])
        return joined.withColumn("bucket", bucket.otherwise(F.lit(labels[-1]))).drop(*tcols)
    w = Window.partitionBy(*gcols).orderBy(score_col, id_col) if gcols else (
        Window.orderBy(score_col, id_col)
    )
    pr = F.percent_rank().over(w)
    bucket = F.when(pr < cuts[0], labels[0])
    for i in range(1, len(cuts)):
        bucket = bucket.when(pr < cuts[i], labels[i])
    return df.select(
        "*",
        F.round(pr, 6).alias("pctile"),
        bucket.otherwise(F.lit(labels[-1])).alias("bucket"),
    )


def mixture_upsample(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_rows: int = 1000,
    id_col: str = "doc_id",
    salt: str = "mixture",
    max_repeat: float = 10.0,
) -> DataFrame:
    """Temperature-mixture resampling WITH upsampling: like
    :func:`mixture_sample` but per-stratum fractions above 1.0 emit
    REPEATED rows instead of clamping — the true multi-epoch
    temperature mixture (rare languages/sources repeat across epochs
    while head strata subsample), the regime mixture_sample's
    clamp-at-1.0 deliberately avoids.

    Row with fraction ``f`` emits ``floor(f)`` guaranteed copies plus
    one more iff its md5 bucket falls under ``round(frac(f)·1e6)`` —
    so E[copies] = f, the expected output is ``target_rows``, and for
    ``f ≤ 1`` the kept set is EXACTLY :func:`mixture_sample`'s (same
    bucket, same threshold; pytest-asserted). Output = input columns
    + ``copy_idx`` (1-based); downstream shuffles spread copies by
    (id, copy_idx), so a 10x-upsampled stratum is not a hot key.

    ``max_repeat`` caps f (a 3-row stratum under an aggressive target
    would otherwise explode thousandfold); the cap is reported by
    :func:`mixture_fractions`-style inspection, never silent: rows
    still carry every copy the cap allows.

    100 TB shape: identical to mixture_sample — two scans, no
    shuffle, stratum-sized broadcast; the explode multiplies rows
    AFTER the filter so output volume is the target, not
    corpus x max_repeat."""
    counts = df.groupBy(F.col(stratum_col).alias("_mu_stratum")).agg(
        F.count("*").alias("_mu_n")
    )
    wexpr = F.pow(F.col("_mu_n").cast("double"), F.lit(float(alpha)))
    weighted = counts.select("_mu_stratum", "_mu_n", wexpr.alias("_w"))
    total = weighted.agg(F.sum("_w").alias("_wsum"))
    frac = F.round(
        F.least(
            F.lit(float(max_repeat)),
            F.lit(float(target_rows)) * (F.col("_w") / F.col("_wsum"))
            / F.col("_mu_n").cast("double"),
        ),
        6,
    )
    fr = weighted.crossJoin(F.broadcast(total)).select(
        "_mu_stratum",
        F.floor(frac).cast("int").alias("_mu_base"),
        F.round((frac - F.floor(frac)) * _BUCKETS).cast("long").alias("_mu_thr"),
    )
    # the md5 bucket is projected ONCE on the corpus side BELOW the
    # join: the explode's inferred not-empty filter pushes into the
    # join condition, and with the bucket inlined it re-evaluated the
    # md5 chain ~6x per row there (attribute references survive the
    # pushdown; the hash depends only on the row's own id)
    base = df.withColumn("_mu_b", _bucket(F.col(id_col), salt))
    n_copies = F.col("_mu_base") + F.when(
        F.col("_mu_b") < F.col("_mu_thr"), 1
    ).otherwise(0)
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return (
        base.join(
            F.broadcast(fr),
            F.col(stratum_col).eqNullSafe(F.col("_mu_stratum")),
            "inner",
        )
        .withColumn("_mu_copies", copies)
        .withColumn("copy_idx", F.explode(F.col("_mu_copies")))
        .drop("_mu_copies")
        .drop("_mu_stratum", "_mu_base", "_mu_thr", "_mu_b")
    )


def mixture_fractions_by_tokens(
    df: DataFrame,
    targets: DataFrame,
    stratum_col: str = "lang",
    token_col: str = "n_chars",
    clamp: bool = True,
) -> DataFrame:
    """Per-stratum keep fractions from TOKEN budgets rather than row
    counts — how production mixtures are actually specified ("20 B
    tokens of code, 5 B of math"): stratum ``s`` with ``T_s`` actual
    tokens and target ``B_s`` gets fraction ``B_s / T_s`` (expected
    kept tokens ≈ the budget, since the md5-bucket keep decision is
    independent of document length), clamped at 1.0 unless the
    consumer is an upsampler (``clamp=False`` — f > 1 means repeated
    copies, exactly the :func:`mixture_upsample` contract).

    ``targets`` is a tiny ``(stratum, target_tokens)`` frame (the
    mixture spec, config-sized).  Token counts sum as LONGS — exact,
    partition/engine-invariant (no float-sum class issue).  Output
    ``(stratum, n_rows, sum_tokens, fraction)`` feeds the SAME
    consumers as :func:`mixture_fractions` (batch + streaming
    samplers/upsamplers), so one fraction-table contract serves both
    row- and token-budgeted mixing.  One keyed agg + one broadcast
    join of spec onto stratum aggregates; the corpus never shuffles."""
    actual = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(token_col).cast("long")).alias("sum_tokens"),
    )
    spec = targets.select(
        F.col("stratum").alias("_tgt_stratum"),
        F.col("target_tokens").cast("double").alias("_tgt"),
    )
    raw = F.col("_tgt") / F.col("sum_tokens").cast("double")
    f = F.least(raw, F.lit(1.0)) if clamp else raw
    return (
        actual.join(
            F.broadcast(spec),
            F.col("stratum").eqNullSafe(F.col("_tgt_stratum")),
            "inner",
        )
        .select(
            "stratum",
            "n_rows",
            "sum_tokens",
            F.round(f, 6).alias("fraction"),
        )
    )


def apply_fractions(
    df: DataFrame,
    fractions: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mixture",
) -> DataFrame:
    """Apply a precomputed ``(stratum, fraction)`` table (from
    :func:`mixture_fractions` or :func:`mixture_fractions_by_tokens`)
    to a corpus: broadcast join + the portable md5-bucket threshold.
    Works identically on batch frames and streams (the stream-static
    join shape — ``streaming.stream_mixture_sample`` delegates here);
    content-hashed assignment means the kept set for a given fraction
    table is EXACTLY reproducible across runs/engines/backfills."""
    thr = fractions.select(
        F.col("stratum").alias("_mix_stratum"),
        (F.round(F.col("fraction") * _BUCKETS)).cast("long").alias("_mix_thr"),
    )
    b = _bucket(F.col(id_col), salt)
    return (
        df.join(
            F.broadcast(thr),
            F.col(stratum_col).eqNullSafe(F.col("_mix_stratum")),
            "inner",
        )
        .filter(b < F.col("_mix_thr"))
        .drop("_mix_stratum", "_mix_thr")
    )


def mixture_drift(
    current: DataFrame,
    reference: DataFrame,
    stratum_col: str = "lang",
) -> DataFrame:
    """Distribution-drift monitor between two corpus generations: per
    stratum, the share in each corpus and the KL-divergence
    contribution ``p·ln(p/q)`` (summing the column gives
    KL(current‖reference) — left to the consumer so no cross-row
    float sum enters the deterministic output; the per-row ln of
    long-count ratios matches across engines at 6dp, the tfidf
    precedent).

    New strata (q=0) and vanished strata (p=0) surface as rows with a
    NULL ``kl_term`` rather than infinities — at 100 TB these are
    exactly the rows a mixture owner pages on. Cost: two tiny keyed
    aggs + a stratum-sized full outer join; corpus totals are
    unbounded-window sums over the merged stratum frame (the
    zero-filled full-outer rows partition each corpus, so the window
    sum equals the corpus total exactly) — the corpora never shuffle
    and are never re-aggregated for the totals."""
    from pyspark.sql import Window
    cur = current.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_current")
    )
    ref = reference.groupBy(F.col(stratum_col).alias("_ref_stratum")).agg(
        F.count("*").alias("n_reference")
    )
    merged = cur.join(
        ref, F.col("stratum").eqNullSafe(F.col("_ref_stratum")), "full_outer"
    ).select(
        F.coalesce(F.col("stratum"), F.col("_ref_stratum")).alias("stratum"),
        F.coalesce("n_current", F.lit(0)).alias("n_current"),
        F.coalesce("n_reference", F.lit(0)).alias("n_reference"),
    )
    # totals as unbounded windows over the |strata|-sized merged
    # frame: the zero-filled full-outer rows partition each corpus,
    # so sum(n_current) == sum over the current corpus exactly (long
    # arithmetic) — no second aggregation subplan per corpus and no
    # total-broadcast joins
    w = Window.partitionBy()
    joined = merged.select(
        "*",
        F.sum("n_current").over(w).alias("_ct"),
        F.sum("n_reference").over(w).alias("_rt"),
    )
    p = F.col("n_current").cast("double") / F.col("_ct").cast("double")
    q = F.col("n_reference").cast("double") / F.col("_rt").cast("double")
    kl = F.when(
        (F.col("n_current") > 0) & (F.col("n_reference") > 0),
        F.round(p * F.log(p / q), 6),
    )
    # shares are integer count ratios -> exact HALF_UP form
    # (functions/ratio.py); kl_term keeps the verbatim-mirrored
    # double p·ln(p/q) (transcendental — no exact form exists)
    from tmdataloader_spark.functions.ratio import round6_ratio

    return joined.select(
        "stratum",
        "n_current",
        "n_reference",
        round6_ratio("n_current", "_ct").alias("share_current"),
        round6_ratio("n_reference", "_rt").alias("share_reference"),
        kl.alias("kl_term"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — ``k`` rows (per
    stratum, if given) drawn with probability proportional to
    ``weight_col`` (importance-weighted corpus selection: quality
    scores, dedup cluster sizes, domain priors).

    A-Res exponential keys (Efraimidis & Spirakis 2006): each row
    draws ``u ∈ (0,1)`` from its portable md5 bucket and competes on
    ``key = −ln(u) / w`` — the SMALLEST ``k`` keys are exactly a
    weight-proportional without-replacement draw.  ``u`` is
    content-hashed, so the sample is deterministic across
    runs/engines/partitionings and stable under appends (a new row
    enters only by displacing the current boundary key); keys are
    rounded to 6dp before ranking with the id tie-break, the BM25
    ordering-portability regime.  Zero/negative weights never win
    (key = +inf surrogate).

    100 TB shape: the same two-phase top-k as :func:`quota_sample`
    — per-(stratum,)shard local winners, then a final rank over
    ≤ k·shards survivors; a heavy stratum never sorts on one task.
    Global (no stratum) selection uses a constant stratum."""
    from pyspark.sql import Window

    u = (_bucket(F.col(id_col), salt).cast("double") + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    w = F.col(weight_col).cast("double")
    key = F.when(
        w > 0, F.round(-F.log(u) / w, 6)
    ).otherwise(F.lit(float("inf")))
    strat = F.col(stratum_col) if stratum_col else F.lit("all")
    shards = 16
    w_local = Window.partitionBy("_ws", "_wshard").orderBy("_wk", id_col)
    w_global = Window.partitionBy("_ws").orderBy("_wk", id_col)
    out = (
        df.withColumn("_ws", strat)
        .withColumn("_wk", key)
        .withColumn("_wshard", F.pmod(_bucket(F.col(id_col), salt + ":shard"), F.lit(shards)))
        .withColumn("_wr", F.row_number().over(w_local))
        .filter(F.col("_wr") <= k)
        .withColumn("_wr", F.row_number().over(w_global))
        .filter(F.col("_wr") <= k)
        .drop("_wr", "_wk", "_ws", "_wshard")
    )
    return out


def negative_samples(
    positives: DataFrame,
    corpus: DataFrame,
    k: int = 4,
    query_col: str = "query_id",
    pos_col: str = "doc_id",
    corpus_id_col: str = "doc_id",
    salt: str = "negsample",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive /
    ranking training pairs: for every positive (query, doc) pair draw
    ``k`` pseudo-random corpus documents that are NOT the positive —
    the random-negatives baseline every retrieval/embedding trainer
    starts from (hard negatives come from the ANN operators instead).

    Draw i for a pair is ``md5(salt:query:pos:i) % |corpus|`` mapped
    onto a DENSE corpus index — deterministic across runs, engines and
    partitionings (no rand()), reproducible per pair.  Collisions with
    the positive itself are dropped (not resampled: a resample loop is
    a sequential recurrence; at corpus sizes the loss is ~k/|corpus|,
    documented) and duplicate draws for one pair dedupe, so a pair
    yields ≤ k negatives, E[count] ≈ k·(1 − 1/|corpus|).

    Scale shape: positives explode ×k (bounded, k ≤ 10s), then ONE
    equi-join on the dense index against the corpus-id frame; the
    corpus is never shuffled by pair count, the one-row corpus count
    broadcasts.  Requires corpus ids dense 0..n−1 (the layout zorder /
    packing tooling emits dense ids; a non-dense corpus first gets a
    row_number index — that global window is the caller's documented
    cost, not hidden here).  The density precondition is ENFORCED:
    ``assert_true(max_id == n-1)`` rides the one-row broadcast, so a
    sparse corpus fails loudly instead of silently losing draws
    beyond the documented ~k/|corpus|."""
    n_row = (
        corpus.groupBy()
        .agg(F.count("*").alias("_n"), F.max(corpus_id_col).alias("_max_id"))
        # filter (not a dropped column) so column pruning can't
        # eliminate the assertion; assert_true yields NULL when it
        # passes, so isNull() keeps the row
        .filter(
            F.assert_true(
                # empty corpus: max(_max_id) is NULL and the dense-id
                # predicate would evaluate NULL, tripping assert_true
                # with a misleading message — an empty corpus is legal
                # and yields zero draws downstream
                (F.col("_n") == 0)
                | (F.col("_max_id") == F.col("_n") - 1),
                F.lit(
                    "negative_samples requires dense 0..n-1 corpus ids "
                    "(add a row_number index first)"
                ),
            ).isNull()
        )
        .select("_n")
    )
    draws = (
        positives.select(
            F.col(query_col).alias("query_id"),
            F.col(pos_col).alias("pos_id"),
        )
        .join(F.broadcast(n_row))
        .select(
            "query_id",
            "pos_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.lit(salt),
                                    F.col("query_id").cast("string"),
                                    F.col("pos_id").cast("string"),
                                    i.cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.col("_n"),
                )
            ).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("pos_id"))
        .distinct()
    )
    valid = corpus.select(F.col(corpus_id_col).alias("neg_id"))
    return draws.join(valid, "neg_id", "left_semi").select(
        "query_id", "pos_id", "neg_id"
    )
