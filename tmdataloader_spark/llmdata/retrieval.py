"""Lexical retrieval over the document corpus — BM25 top-k scoring
(Robertson & Zaragoza, "The Probabilistic Relevance Framework: BM25
and Beyond", Foundations and Trends in IR 2009; the Lucene-style
``ln(1 + (N - df + 0.5)/(df + 0.5))`` non-negative idf variant).

The lexical counterpart of the ANN operators in
``llmdata/similarity.py``: given a handful of query terms, rank the
corpus and keep the top-k. Extension beyond the reference surface
(BASELINE.json north-star "similarity search" family).

100 TB shape — the key design decision is that for a BOUNDED query
(tens of terms, the interactive/eval-harness case) no inverted index
and no explode of the token stream is needed:

* per-term term frequencies are pure per-row expressions over the
  token array (``size(filter(toks, t == term))``) — no shuffle;
* corpus statistics (N, avgdl, and each query term's document
  frequency) collapse into ONE one-row aggregate over the same scan,
  broadcast back via a literal cross join — no second keyed shuffle;
* top-k selection is ``orderBy().limit(k)`` (TakeOrderedAndProject:
  per-task k-heaps, driver merges k·tasks rows) — never a global
  sort of the scored corpus.

Total cost: two scans of the corpus (stats + scoring), zero wide
shuffles. Every arithmetic step is plain double math on counts, so a
SQL oracle reproduces scores bit-for-bit up to the documented
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tmdataloader_spark.llmdata.text import tokens


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 score against ``query_terms``.

    Returns ``(id_col, n_terms_hit, score, rank)`` ordered by
    (score desc, id asc); each per-term score is quantized to
    micro-units (``round(s * 1e6)`` as a long) and the document score
    is the exact integer sum divided by 1e6, so the ordering — not
    just the printed value — is engine-portable AND independent of
    summation order (float addition is not associative; integer sums
    are). Documents matching no query term are dropped before
    selection (their score is exactly 0), so the k-heaps only ever
    see the hit set.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(t.strip().lower() for t in query_terms))

    toks = tokens(F.col(text_col))
    dl = F.size(toks).cast("double")

    # One row per corpus: N, avgdl, df per query term — a single
    # map-side-combined aggregate over one scan.
    stats_aggs = [
        F.count("*").cast("double").alias("_n_docs"),
        F.avg(F.size(toks)).alias("_avgdl"),
    ] + [
        F.sum(F.array_contains(toks, t).cast("long"))
        .cast("double")
        .alias(f"_df_{i}")
        for i, t in enumerate(terms)
    ]
    stats = df.agg(*stats_aggs)

    def _eq(term: str):
        # single-arg lambda — a two-parameter function would be handed
        # (element, index) by F.filter
        return lambda x: x == F.lit(term)

    scored = df.select(
        F.col(id_col),
        dl.alias("_dl"),
        *[
            F.size(F.filter(toks, _eq(t))).cast("double").alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    ).crossJoin(F.broadcast(stats))

    def term_score(i: int):
        tf = F.col(f"_tf_{i}")
        dfreq = F.col(f"_df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
        )
        return idf * tf * F.lit(k1 + 1.0) / norm

    score_q = None
    hits = None
    for i in range(len(terms)):
        # micro-unit quantization BEFORE the sum: exact long addition
        # replaces order-sensitive float addition (same determinism
        # recipe as clustering.QUANT / sessionize's decimal sums)
        s = F.round(term_score(i) * F.lit(1_000_000.0)).cast("long")
        h = (F.col(f"_tf_{i}") > 0).cast("int")
        score_q = s if score_q is None else score_q + s
        hits = h if hits is None else hits + h

    ranked = (
        scored.select(
            F.col(id_col),
            hits.alias("n_terms_hit"),
            (score_q / F.lit(1_000_000.0)).alias("score"),
        )
        .filter(F.col("n_terms_hit") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    # rank over k rows only — the window input is already bounded by k
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))


def bm25_topk_shared(
    df: DataFrame,
    term_sets: list[list[str]],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[DataFrame]:
    """Top-``k`` lists for SEVERAL query-term sets from ONE pair of
    corpus passes — list-for-list bit-identical to calling
    :func:`bm25_topk` once per set (same normalized term order, same
    per-term micro-unit quantization, same exact long sums, same
    (score desc, id) selection), but the corpus is tokenized twice
    TOTAL instead of twice PER LIST:

    * one stats aggregate covers the UNION vocabulary (N and avgdl
      are set-independent; each df value is identical to what the
      per-list aggregate would have computed);
    * one scoring projection computes every union term's tf and folds
      each list's quantized score/hit sums into columns of a NARROW
      (id, sums...) frame;
    * the narrow frame is lazily ``localCheckpoint``-ed so the per-
      list top-k selections replay ~24 bytes/row instead of
      re-tokenizing the corpus once per list (guide-§8 "decide with
      small rows": the text pass is the heavy proxy-producing pass,
      the selections are decisions over the proxy).

    The hybrid-retrieval combiner (:func:`rrf_fuse` over two BM25
    runs) is the intended caller: its cost drops from 2× bm25_topk to
    ~1× + one narrow materialization."""
    if not term_sets or any(not ts for ts in term_sets):
        raise ValueError("term_sets must be non-empty lists of terms")
    norm_sets = [sorted(set(t.strip().lower() for t in ts)) for ts in term_sets]
    union_terms = sorted(set().union(*norm_sets))
    idx = {t: i for i, t in enumerate(union_terms)}

    toks = tokens(F.col(text_col))
    dl = F.size(toks).cast("double")
    stats_aggs = [
        F.count("*").cast("double").alias("_n_docs"),
        F.avg(F.size(toks)).alias("_avgdl"),
    ] + [
        F.sum(F.array_contains(toks, t).cast("long"))
        .cast("double")
        .alias(f"_df_{i}")
        for i, t in enumerate(union_terms)
    ]
    stats = df.agg(*stats_aggs)

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    scored = df.select(
        F.col(id_col),
        dl.alias("_dl"),
        *[
            F.size(F.filter(toks, _eq(t))).cast("double").alias(f"_tf_{i}")
            for i, t in enumerate(union_terms)
        ],
    ).crossJoin(F.broadcast(stats))

    def term_score(i: int):
        tf = F.col(f"_tf_{i}")
        dfreq = F.col(f"_df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
        )
        return idf * tf * F.lit(k1 + 1.0) / norm

    sum_cols = []
    for li, terms in enumerate(norm_sets):
        score_q = None
        hits = None
        for t in terms:  # the list's own sorted order — bm25_topk's sum order
            i = idx[t]
            s = F.round(term_score(i) * F.lit(1_000_000.0)).cast("long")
            h = (F.col(f"_tf_{i}") > 0).cast("int")
            score_q = s if score_q is None else score_q + s
            hits = h if hits is None else hits + h
        sum_cols += [score_q.alias(f"_sq_{li}"), hits.alias(f"_h_{li}")]
    narrow = scored.select(F.col(id_col), *sum_cols).localCheckpoint(eager=False)

    from pyspark.sql import Window

    outs = []
    for li in range(len(norm_sets)):
        ranked = (
            narrow.select(
                F.col(id_col),
                F.col(f"_h_{li}").alias("n_terms_hit"),
                (F.col(f"_sq_{li}") / F.lit(1_000_000.0)).alias("score"),
            )
            .filter(F.col("n_terms_hit") > 0)
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k)
        )
        w = Window.orderBy(F.col("score").desc(), F.col(id_col))
        outs.append(ranked.withColumn("rank", F.row_number().over(w).cast("int")))
    return outs


def bm25_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Inverted-index frames for :func:`bm25_batch_topk`:
    ``postings (term, id, tf, dl)`` — one row per distinct (document,
    term) with the term's occurrence count and the document length —
    and ``stats`` — ONE row ``(n_docs, avgdl)``.

    100 TB shape: one explode + one map-side-combined (doc, term) agg
    builds the postings; persisted partitioned/bucketed BY TERM they
    serve every future query batch with a term-pruned scan (the
    standard search-engine layout, here as plain DataFrames). The
    stats frame is a one-row aggregate over the postings' per-doc
    lengths — no second scan of the text."""
    toks = tokens(F.col(text_col))
    # spread ahead of the tokenize+explode stage: a small corpus
    # parquet arrives as ONE input split, which would serialize the
    # CPU-heavy stage onto a single core (same rationale as
    # dedup._spread); the shuffle moves only the raw rows
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    exploded = spread.select(
        F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term")
    )
    postings = exploded.groupBy(F.col(id_col), F.col("term")).agg(
        F.count("*").cast("double").alias("tf"),
        F.first("dl").cast("double").alias("dl"),
    )
    # (n_docs, avgdl) from the postings' per-doc lengths — NOT a
    # second tokenize scan of the text. Every document has ≥1 posting
    # (an empty/whitespace text still tokenizes to [""]), so the
    # per-doc first(dl) collapse is exact; the extra keyed agg is
    # map-side combined and postings-sized, not token-stream-sized.
    stats = (
        postings.groupBy(id_col)
        .agg(F.first("dl").alias("_dl"))
        .agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg("_dl").alias("avgdl"),
        )
    )
    return postings, stats


def bm25_batch_topk(
    postings: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents per query over a :func:`bm25_index` — the
    MANY-queries retrieval shape (eval-harness batches, hard-negative
    mining), where :func:`bm25_topk`'s per-row-expression form would
    rescan the corpus once per query.

    ``queries`` is long form ``(query_id, term)``. Returns
    ``(query_id, id, n_terms_hit, score, rank)``; scoring arithmetic
    and the micro-unit quantization match :func:`bm25_topk` exactly —
    both forms sum the SAME per-term quantized longs, and integer
    addition is order-insensitive — so the two forms agree
    query-for-query bit-for-bit, independent of partitioning.

    100 TB shape: postings are LEFT SEMI pruned to the query-term
    vocabulary before anything else (with term-partitioned postings
    that is partition pruning, not a scan), per-term document
    frequencies come from one agg over the pruned slice, the query
    set broadcasts (it is the small side by construction), and the
    per-query top-k window runs over candidate lists already bounded
    by the pruned postings. A stopword-only query degrades to its
    true candidate mass — document queries, not the engine, decide
    that cost."""
    # normalize terms exactly as bm25_topk does (strip/lower) so the
    # two forms keep their agreement contract for any input casing;
    # dedupe AFTER normalizing so case-variant duplicates collapse
    q = (
        queries.select("query_id", F.lower(F.trim(F.col("term"))).alias("term"))
        .distinct()
    )
    qterms = q.select(F.col("term")).distinct()
    p = postings.join(F.broadcast(qterms), "term", "left_semi")
    dfreq = p.groupBy("term").agg(F.count("*").cast("double").alias("_df"))
    scored = (
        p.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(q), "term")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    term_score = (
        idf
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    term_score_q = F.round(term_score * F.lit(1_000_000.0)).cast("long")
    agg = scored.groupBy("query_id", id_col).agg(
        F.count("*").cast("int").alias("n_terms_hit"),
        # exact integer sum of micro-unit term scores: independent of
        # partial-aggregation order (raw double F.sum is not)
        (F.sum(term_score_q) / F.lit(1_000_000.0)).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    lists: list[DataFrame],
    k0: int = 60,
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    of N ranked lists: ``rrf_score(d) = Σ_lists 1/(k0 + rank_d)`` —
    the standard score-free combiner for hybrid retrieval (BM25 +
    ANN, multiple query rewrites, cross-encoder ensembles), robust to
    incomparable score scales because only RANKS enter the sum.

    Each input needs ``(id_col, rank)``. Returns ``(id, n_lists,
    rrf_score, rank)`` top-``k``; each list's contribution is
    quantized to micro-units (``round(1e6/(k0+rank))`` as a long) and
    summed exactly, so the fused order is engine-portable AND
    independent of partition/summation order (ties broken by id).

    100 TB shape: the inputs are top-k lists — k·N rows total — so
    the union + keyed agg + TakeOrderedAndProject is driver-bounded
    work no matter how large the corpora behind the lists are."""
    if not lists:
        raise ValueError("lists must be non-empty")
    contribs = [
        l.select(
            F.col(id_col),
            F.round(
                F.lit(1_000_000.0) / (F.lit(float(k0)) + F.col("rank").cast("double"))
            )
            .cast("long")
            .alias("_c"),
        )
        for l in lists
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    fused = (
        u.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_lists"),
            (F.sum("_c") / F.lit(1_000_000.0)).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return fused.withColumn("rank", F.row_number().over(w).cast("int"))


def rrf_bm25_oracle_sql(
    terms_a: list[str],
    terms_b: list[str],
    k_in: int = 25,
    k0: int = 60,
    k: int = 20,
) -> str:
    """DuckDB oracle for :func:`rrf_fuse` over two :func:`bm25_topk`
    lists — the generated BM25 oracles nest as CTE subqueries, then
    the identical 1/(k0+rank) union-sum-rank algebra replays on top."""
    a = bm25_oracle_sql(terms_a, k=k_in)
    b = bm25_oracle_sql(terms_b, k=k_in)
    return f"""
        WITH la AS (SELECT doc_id, rank FROM ({a})),
        lb AS (SELECT doc_id, rank FROM ({b})),
        u AS (
          SELECT doc_id, CAST(round(1000000.0 / ({k0} + rank)) AS BIGINT) AS c FROM la
          UNION ALL
          SELECT doc_id, CAST(round(1000000.0 / ({k0} + rank)) AS BIGINT) AS c FROM lb
        ), f AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_lists,
                 sum(c) / 1000000.0 AS rrf_score
          FROM u GROUP BY doc_id
        )
        SELECT doc_id, n_lists, rrf_score,
               CAST(row_number() OVER (
                 ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
        FROM f ORDER BY rrf_score DESC, doc_id LIMIT {k}
    """


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle replaying :func:`bm25_topk`'s exact arithmetic
    (same expression shape, same 6-decimal pre-rank rounding) on the
    pre-registered ``documents`` view."""
    # single quotes doubled so a term like "o'brien" stays a valid
    # (and non-injectable) SQL string literal
    terms = [
        t.replace("'", "''")
        for t in sorted(set(t.strip().lower() for t in query_terms))
    ]
    tf_cols = ",\n".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n".join(
        f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS df_{i}"
        for i, t in enumerate(terms)
    )
    # per-term micro-unit quantization mirrors bm25_topk exactly: the
    # document score is an exact BIGINT sum / 1e6, never a float sum
    score_sum = "\n + ".join(
        f"CAST(round((ln(1.0 + (s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5))"
        f" * d.tf_{i} * {k1 + 1.0!r}"
        f" / (d.tf_{i} + {k1!r} * (1.0 - {b!r} + {b!r} * d.dl / s.avgdl)))"
        f" * 1000000.0) AS BIGINT)"
        for i in range(len(terms))
    )
    hit_sum = " + ".join(
        f"CASE WHEN d.tf_{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    return f"""
        WITH t AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), ' +') AS toks
          FROM documents
        ), d AS (
          SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
                 {tf_cols}
          FROM t
        ), s AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(len(toks)) AS avgdl,
                 {df_cols}
          FROM t
        ), scored AS (
          SELECT d.doc_id,
                 CAST({hit_sum} AS INT) AS n_terms_hit,
                 ({score_sum}) / 1000000.0 AS score
          FROM d CROSS JOIN s
        )
        SELECT doc_id, n_terms_hit, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM scored WHERE n_terms_hit > 0
        ORDER BY score DESC, doc_id LIMIT {k}
    """
