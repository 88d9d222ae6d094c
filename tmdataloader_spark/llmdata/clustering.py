"""Distributed embedding clustering + cluster-based semantic dedup.

- ``kmeans_fit``: Lloyd's k-means over an embedding column with
  INTEGER-EXACT arithmetic — vectors are quantized with
  ``floor(x*quant)`` and every distance / centroid update is integer
  math (all magnitudes ≪ 2^53), so a fixed iteration count yields
  bit-identical assignments in any engine; the DuckDB oracle unrolls
  the same iterations as CTEs.
- ``semantic_dedup``: SemDeDup-shaped near-dup pruning (Abbas et al.,
  "SemDeDup: Data-efficient learning at web-scale through semantic
  deduplication", arXiv:2303.09540): cluster first, then compare
  pairs ONLY within a cluster — the O(n²) global compare becomes
  O(Σ cell²), sub-quadratic when k scales with n.

100 TB shape (kmeans): the k×dim centroid table ships inside the
Arrow task closure (a broadcast in spirit; k·dim ≪ executor memory),
so scoring is one vectorized int64 matmul per Arrow batch with NO
shuffle. The update emits per-batch PARTIAL (cluster, pos) sums —
≤ k·dim rows per batch — so the shuffle into the final aggregate
moves codebook-sized partials regardless of corpus size. The only
driver traffic is the k·dim centroid rows per iteration (control
plane, same as MLlib's KMeans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: quantization scale: floor(x * QUANT) — matches similarity.lsh_ann
QUANT = 1000


def _quantized(vec_col: str) -> F.Column:
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * QUANT).cast("long"),
    )


def _assign_batches(centroids: list[list[int]], id_col: str):
    """mapInPandas kernel: per Arrow batch, one int64 NumPy matmul
    scores every row against every centroid (dist_j = x·x − 2·x·c_j +
    c_j·c_j) and emits (id, argmin). ``np.argmin`` returns the FIRST
    minimum ⇒ ties break to the lowest cluster index — the same
    lexicographic (dist, j) order the SQL oracle's
    ``ORDER BY d, cell`` uses. All magnitudes stay far inside int64
    (|qv_i| ≤ QUANT·|x|, dots ≤ dim·QUANT²·max|x|²), so this is exact
    integer arithmetic, not a float approximation."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.int64)
    cc = (C * C).sum(axis=1)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["qv"]), dtype=np.int64)
            d = (X * X).sum(axis=1, keepdims=True) - 2 * (X @ C.T) + cc
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": np.argmin(d, axis=1).astype("int32")}
            )

    return fn


def _partial_sum_batches(centroids: list[list[int]], id_col: str):
    """mapInPandas kernel for the update step: assign each batch row
    (same exact arithmetic as :func:`_assign_batches`) and emit the
    batch's PARTIAL per-(cluster, pos) sums — ≤ k·dim rows per Arrow
    batch, so the shuffle into the final groupBy moves k·dim-sized
    partials instead of an n·dim posexplode."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.int64)
    cc = (C * C).sum(axis=1)
    k, dim = C.shape

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["qv"]), dtype=np.int64)
            d = (X * X).sum(axis=1, keepdims=True) - 2 * (X @ C.T) + cc
            a = np.argmin(d, axis=1)
            rows = []
            for j in np.unique(a):
                mem = X[a == j]
                rows.append(
                    pd.DataFrame(
                        {
                            "cluster": np.int32(j),
                            "pos": np.arange(dim, dtype=np.int32),
                            "s": mem.sum(axis=0),
                            "n": np.int64(len(mem)),
                        }
                    )
                )
            yield pd.concat(rows, ignore_index=True)

    return fn


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means, integer-exact and deterministic.

    Init: the rows with ``id_col < k`` (deterministic; production
    swaps in k-means|| seeds — seed QUALITY only moves cluster
    quality, never the plan shape). Each of the fixed ``iters``
    rounds scores every row against the current centroids (one int64
    NumPy matmul per Arrow batch, zero shuffle) and rebuilds
    centroids as the element-wise ``floor(mean)`` of the quantized
    members (per-batch k·dim partial sums → one tiny aggregate).
    Empty cells keep their previous centroid.

    Returns ``(id_col, cluster int)`` for every input row."""
    base, centroids = _fit(df, k, iters, id_col, vec_col)
    return base.mapInPandas(
        _assign_batches(centroids, id_col), schema=f"{id_col} long, cluster int"
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """The trained quantized centroid table (k lists of ints) —
    same fit as :func:`kmeans_fit`; consumed by callers that need the
    codebook itself (e.g. ``similarity.ivf_ann`` centroid training)."""
    _, centroids = _fit(df, k, iters, id_col, vec_col)
    return centroids


def _fit(df, k, iters, id_col, vec_col):
    base = df.select(F.col(id_col), _quantized(vec_col).alias("qv")).cache()
    init = (
        base.filter(F.col(id_col) < k)
        .orderBy(id_col)
        .collect()  # k rows — the codebook, intentionally tiny
    )
    if len(init) < k:
        raise ValueError(f"need at least {k} rows with {id_col} < {k} to seed")
    centroids = [list(r["qv"]) for r in init]
    dim = len(centroids[0])
    for _ in range(iters):
        sums = (
            base.mapInPandas(
                _partial_sum_batches(centroids, id_col),
                schema="cluster int, pos int, s long, n long",
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .select(
                "cluster",
                "pos",
                F.floor(F.col("s") / F.col("n")).cast("long").alias("cv"),
            )
            .collect()  # ≤ k·dim rows — control plane only
        )
        new = {c: list(old) for c, old in enumerate(centroids)}
        for r in sums:
            new[r["cluster"]][r["pos"]] = r["cv"]
        centroids = [new[j] for j in range(k)]
        assert all(len(c) == dim for c in centroids)
    return base, centroids


def kmeans_oracle_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    prefix: str = "",
) -> str:
    """DuckDB twin of :func:`kmeans_fit`: the same fixed iterations
    unrolled as CTEs over the same quantized integers. Distances use
    DOUBLE dot products of integer-valued arrays — exact below 2^53,
    so assignments are bit-identical to the Spark plan. ``prefix``
    namespaces every CTE so multiple instantiations (the per-subspace
    product-quantizer codebooks) can share one WITH clause."""
    p = prefix
    ctes = [
        f"""{p}e AS (
          SELECT {id_col}, list_transform(CAST({vec_col} AS DOUBLE[]),
                 x -> floor(x * {QUANT})) AS qv
          FROM {table}
        )""",
        f"""{p}c0 AS (
          SELECT CAST({id_col} AS INT) AS cell, qv FROM {p}e WHERE {id_col} < {k}
        )""",
    ]
    prev = f"{p}c0"
    for t in range(iters + 1):
        ctes.append(
            f"""{p}a{t} AS (
          SELECT {id_col}, (array_agg(cell ORDER BY d, cell))[1] AS cell FROM (
            SELECT e.{id_col}, c.cell,
                   list_dot_product(e.qv, e.qv)
                     - 2 * list_dot_product(e.qv, c.qv)
                     + list_dot_product(c.qv, c.qv) AS d
            FROM {p}e e CROSS JOIN {prev} c
          ) GROUP BY {id_col}
        )"""
        )
        if t == iters:
            break
        ctes.append(
            f"""{p}u{t} AS (
          SELECT a.cell, r.range AS pos, sum(e.qv[r.range]) AS s, count(*) AS n
          FROM {p}a{t} a JOIN {p}e e USING ({id_col})
          CROSS JOIN range(1, {dim + 1}) r
          GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""{p}c{t + 1} AS (
          SELECT cell, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                            ORDER BY pos) AS qv
          FROM {p}u{t} GROUP BY cell
          UNION ALL
          SELECT cell, qv FROM {p}c{t}
          WHERE cell NOT IN (SELECT cell FROM {p}u{t})
        )"""
        )
        prev = f"{p}c{t + 1}"
    body = ",\n".join(ctes)
    # NOTE: iteration t's update uses assignment a{t}; the returned
    # frame is the assignment against the FINAL centroids (a{iters}),
    # mirroring kmeans_fit's trailing _assign_expr.
    return f"WITH {body}\nSELECT {id_col}, cell AS cluster FROM {p}a{iters}"


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shaped semantic dedup: k-means cells bound the pair
    search, then any row whose cell contains a LOWER-id row with
    cosine ≥ ``threshold`` is marked ``keep = false`` (lowest id is
    the canonical keeper, matching ``embedding_dup_pairs``' policy).

    100 TB shape: pairwise work only happens INSIDE a cell — and each
    cell is further hash-split into ``num_blocks`` blocks, so the
    compare runs as one NumPy matmul per (cell, block-pair) cogroup:
    candidates are Σ cell² instead of n², tiles stay executor-sized
    even for skewed cells (×(B+1) bounded replication, same pattern
    as ``dedup.embedding_dup_pairs``), and there is no driver-side
    collect. Raise ``k`` so cells track n/k — exactly the paper's
    regime (k ≈ n/100 at web scale).

    Returns ``(id_col, cluster int, keep boolean)`` for every row."""
    import numpy as np
    import pandas as pd

    num_blocks = 4
    spark = df.sparkSession
    # One fused assign+passthrough Arrow pass emits (mid, cell, mv,
    # blk) directly: quantization (np.floor(v·QUANT) — IEEE-identical
    # to the JVM's floor(x*QUANT) double math) and the centroid argmin
    # run on the raw vector batch, and the vector rides along to the
    # tile compare. The former shape — kmeans_fit assignment joined
    # back to the vectors on the id — shuffled the corpus-sized vector
    # frame AND ran that join once per self-join branch below (the
    # sort-merge above a ReusedExchange is re-executed per consumer);
    # here the member frame feeds all three consumers (both cogroup
    # sides + the final keep-join) from ONE lazy localCheckpoint
    # materialization, so no corpus shuffle happens before the
    # cogroup's own. A/B at sf0.1: 6/8 wins (~2.73 s → 2.65 s);
    # rows bit-identical (same quantized argmin tie-break).
    _, centroids = _fit(df, k, iters, id_col, vec_col)
    C = np.asarray(centroids, dtype=np.int64)
    cc = (C * C).sum(axis=1)

    def member_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["v"]), dtype=np.float64)
            X = np.floor(V * QUANT).astype(np.int64)
            d = (X * X).sum(axis=1, keepdims=True) - 2 * (X @ C.T) + cc
            a = np.argmin(d, axis=1)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "mid": ids,
                    "cell": a.astype("int32"),
                    "mv": list(pdf["v"]),
                    "blk": (ids % num_blocks).astype("int32"),
                }
            )

    member = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(member_fn, schema="mid long, cell int, mv array<double>, blk int")
        .localCheckpoint(eager=False)
    )
    bpairs = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)],
        "ba int, bb int",
    )
    left = (
        member.alias("tl")
        .join(F.broadcast(bpairs.alias("pl")), F.col("tl.blk") == F.col("pl.ba"))
        .select("tl.cell", "pl.ba", "pl.bb", "tl.mid", "tl.mv")
    )
    right = (
        member.alias("tr")
        .join(F.broadcast(bpairs.alias("pr")), F.col("tr.blk") == F.col("pr.bb"))
        .select(
            F.col("tr.cell").alias("rcell"),
            F.col("pr.ba").alias("rba"),
            F.col("pr.bb").alias("rbb"),
            F.col("tr.mid").alias("rmid"),
            F.col("tr.mv").alias("rmv"),
        )
    )

    def tile(key, lpdf, rpdf):
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"did": pd.Series([], dtype="int64")})
        lm = np.array(list(lpdf["mv"]), dtype=np.float64)
        rm = np.array(list(rpdf["rmv"]), dtype=np.float64)
        lm = lm / np.linalg.norm(lm, axis=1, keepdims=True)
        rm = rm / np.linalg.norm(rm, axis=1, keepdims=True)
        sims = np.round(lm @ rm.T, 6)
        li, ri = np.nonzero(sims >= threshold)
        lids = lpdf["mid"].to_numpy()[li]
        rids = rpdf["rmid"].to_numpy()[ri]
        keep = lids != rids
        if key[1] == key[2]:
            # same block both sides: unordered pairs appear twice
            keep &= lids < rids
        return pd.DataFrame({"did": np.maximum(lids[keep], rids[keep])})

    dropped = (
        left.groupby("cell", "ba", "bb")
        .cogroup(right.groupby("rcell", "rba", "rbb"))
        .applyInPandas(tile, schema="did long")
        .distinct()
    )
    return member.select(
        F.col("mid").alias(id_col), F.col("cell").alias("cluster")
    ).join(
        dropped.withColumnRenamed("did", id_col).withColumn("_drop", F.lit(True)),
        id_col,
        "left",
    ).select(
        id_col,
        "cluster",
        F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
    )


def semantic_dedup_oracle_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`semantic_dedup` built on the unrolled
    k-means CTEs plus a within-cell cosine self-join."""
    kmeans = kmeans_oracle_sql(table, k, iters, id_col, vec_col, dim)
    with_body = kmeans[len("WITH ") : kmeans.rindex("\nSELECT")]
    return f"""
        WITH {with_body},
        asn AS (SELECT {id_col}, cell FROM a{iters}),
        v AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}),
        dup AS (
          SELECT DISTINCT b.{id_col} AS did
          FROM asn a JOIN asn b ON a.cell = b.cell AND a.{id_col} < b.{id_col}
          JOIN v va ON va.{id_col} = a.{id_col}
          JOIN v vb ON vb.{id_col} = b.{id_col}
          WHERE round(list_dot_product(va.v, vb.v)
                      / (sqrt(list_dot_product(va.v, va.v))
                         * sqrt(list_dot_product(vb.v, vb.v))), 6) >= {threshold}
        )
        SELECT a.{id_col}, a.cell AS cluster,
               (d.did IS NULL) AS keep
        FROM asn a LEFT JOIN dup d ON d.did = a.{id_col}
    """


def prototype_scores(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Prototype-distance curation scores (Sorscher et al. 2022,
    "Beyond neural scaling laws: beating power law scaling via data
    pruning", arXiv:2206.14486 — the self-supervised prototype
    metric): the prototype of a group is the mean of its embeddings,
    and each example is scored by its cosine to its group's
    prototype. High cosine = prototypical/easy (the prune candidates
    when keeping hard examples); low cosine = outlier/hard.

    Output: ``(id, group, grp_n, proto_cos)`` — one row per input
    vector, ``proto_cos`` rounded to 6 decimals.

    Determinism: the centroid is built from QUANTIZED int64 partial
    sums (``floor(x*QUANT)``, exact integer sum, then ``floor(s/n)``
    — the same recipe as :func:`kmeans_fit`), never from ``F.avg``
    over raw doubles, whose cross-partition summation order is
    nondeterministic and can flip the 6th decimal of the final
    cosine.  Cosine is scale-tolerant, so the ~1e-3 quantization of
    the centroid direction costs nothing for curation ranking while
    making the score bit-identical across partitionings and engines.

    100 TB shape: the centroid is ONE map-side-combined
    ``groupBy(group, pos)`` sum over the posexploded vectors — the
    shuffle moves at most groups×dim partial rows regardless of
    corpus size — and the groups×1 centroid table joins back via
    broadcast, so the corpus itself never shuffles. The cosine is a
    pure Catalyst ``zip_with``/``aggregate`` fold (no Python in the
    hot path).
    """
    from tmdataloader_spark.llmdata.similarity import _cosine

    v = df.select(
        F.col(id_col), F.col(group_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    q = F.transform(F.col("_v"), lambda x: F.floor(x * QUANT).cast("long"))
    cent = (
        v.select(group_col, F.posexplode(q).alias("_pos", "_q"))
        .groupBy(group_col, "_pos")
        # exact long sum, then floor-divide: integer-deterministic
        .agg(F.floor(F.sum("_q") / F.count("*")).cast("long").alias("_c"))
        .groupBy(group_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_c"))),
                lambda s: s["_c"].cast("double"),
            ).alias("_cv")
        )
    )
    grp_n = v.groupBy(group_col).agg(F.count("*").alias("grp_n"))
    return (
        v.join(F.broadcast(cent), group_col)
        .join(F.broadcast(grp_n), group_col)
        .select(
            id_col,
            group_col,
            "grp_n",
            _cosine(F.col("_v"), F.col("_cv")).alias("proto_cos"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (the Faiss IVF-PQ compression path)
# ---------------------------------------------------------------------------


def pq_fit(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Per-subspace product-quantizer codebooks (Jégou, Douze &
    Schmid 2011, "Product quantization for nearest neighbor search",
    TPAMI): the vector is split into ``m`` contiguous subspaces and
    each gets its own ``ksub``-centroid codebook via the
    integer-exact distributed Lloyd of :func:`kmeans_fit` — so
    training, encoding, and ADC scoring are all deterministic and
    oracle-reproducible. Returns ``m`` codebooks of ``ksub`` quantized
    centroid lists.

    All ``m`` subspaces train TOGETHER: one seed collect (the rows
    with ``id < ksub``, sliced driver-side — slicing and element-wise
    quantization commute, so this equals per-subspace fitting), then
    per round ONE corpus scan whose Arrow kernel emits every
    subspace's partial sums (≤ m·ksub·(dim/m) rows per batch) into
    one tiny aggregate — not m separate Lloyd runs."""
    import numpy as np
    import pandas as pd

    base = df.select(F.col(id_col), _quantized(vec_col).alias("qv")).cache()
    init = base.filter(F.col(id_col) < ksub).orderBy(id_col).collect()
    if len(init) < ksub:
        raise ValueError(f"need at least {ksub} rows with {id_col} < {ksub} to seed")
    dim = len(init[0]["qv"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = [
        [list(r["qv"][s * sub : (s + 1) * sub]) for r in init] for s in range(m)
    ]

    def partials(cur: list[list[list[int]]]):
        Cs = [np.asarray(b, dtype=np.int64) for b in cur]

        def fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(list(pdf["qv"]), dtype=np.int64)
                frames = []
                for s, C in enumerate(Cs):
                    Xs = X[:, s * sub : (s + 1) * sub]
                    d = (
                        (Xs * Xs).sum(axis=1, keepdims=True)
                        - 2 * (Xs @ C.T)
                        + (C * C).sum(axis=1)
                    )
                    a = np.argmin(d, axis=1)
                    for j in np.unique(a):
                        mem = Xs[a == j]
                        frames.append(
                            pd.DataFrame(
                                {
                                    "s": np.int32(s),
                                    "cluster": np.int32(j),
                                    "pos": np.arange(sub, dtype=np.int32),
                                    "sm": mem.sum(axis=0),
                                    "n": np.int64(len(mem)),
                                }
                            )
                        )
                yield pd.concat(frames, ignore_index=True)

        return fn

    try:
        for _ in range(iters):
            sums = (
                base.mapInPandas(
                    partials(books), schema="s int, cluster int, pos int, sm long, n long"
                )
                .groupBy("s", "cluster", "pos")
                .agg(F.sum("sm").alias("sm"), F.sum("n").alias("n"))
                .select(
                    "s",
                    "cluster",
                    "pos",
                    F.floor(F.col("sm") / F.col("n")).cast("long").alias("cv"),
                )
                .collect()  # ≤ m·ksub·sub rows — control plane only
            )
            new = [[list(c) for c in b] for b in books]
            for r in sums:
                new[r["s"]][r["cluster"]][r["pos"]] = r["cv"]
            books = new
        return books
    finally:
        # the cache only serves the fit iterations — drop it so library
        # callers don't accumulate one cached frame per pq_fit call
        base.unpersist()


def pq_encode(
    df: DataFrame,
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes for every vector: ``(id, codes array<int>)`` where
    ``codes[s]`` is the index of the nearest (exact int64 L2,
    first-min tie-break) centroid of subspace ``s``'s codebook — the
    dim×4-byte vector compressed to ``m`` small ints (m/dim of the
    float footprint; at 100 TB the difference between an in-memory
    index and one that isn't).

    One Arrow-batched kernel computes all ``m`` argmins per batch
    with NumPy matmuls — no shuffle, no per-subspace pass."""
    import numpy as np
    import pandas as pd

    Cs = [np.asarray(b, dtype=np.int64) for b in books]

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.floor(
                np.array(list(pdf[vec_col]), dtype=np.float64) * QUANT
            ).astype(np.int64)
            cols = []
            off = 0
            for C in Cs:
                w = C.shape[1]
                Xs = X[:, off : off + w]
                off += w
                d = (Xs * Xs).sum(axis=1, keepdims=True) - 2 * (Xs @ C.T) + (C * C).sum(axis=1)
                cols.append(np.argmin(d, axis=1))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(np.stack(cols, axis=1).astype("int32")),
                }
            )

    spread = df.select(id_col, vec_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    )
    return spread.mapInPandas(fn, schema=f"{id_col} long, codes array<int>")


def ivfpq_oracle_sql(
    table: str = "embeddings",
    nq: int = 10,
    k: int = 5,
    ncentroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    ksub: int = 16,
    iters: int = 1,
    refine: int = 20,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`~tmdataloader_spark.llmdata.similarity.
    ivfpq_ann`: replays coarse routing (argmax integer inner
    product), per-subspace codebook training (``m`` prefixed
    :func:`kmeans_oracle_sql` instantiations over vector slices —
    their final assignments ARE the PQ codes), per-query distance
    tables, ADC candidate selection, and the exact cosine rerank —
    all in the same quantized integer arithmetic, so every
    intermediate matches bit-for-bit."""
    sub = dim // m
    bodies, code_sel, dtab_sel = [], [], []
    for s in range(m):
        sql = kmeans_oracle_sql(
            table,
            k=ksub,
            iters=iters,
            id_col=id_col,
            vec_col=f"(CAST({vec_col} AS DOUBLE[]))[{s * sub + 1}:{(s + 1) * sub}]",
            dim=sub,
            prefix=f"s{s}_",
        )
        bodies.append(sql[len("WITH ") : sql.rindex("\nSELECT")])
        code_sel.append(f"SELECT {id_col}, {s} AS s, cell FROM s{s}_a{iters}")
        dtab_sel.append(
            f"""SELECT q.{id_col} AS query_id, {s} AS s, c.cell,
                 list_dot_product(q.qv, q.qv)
                   - 2 * list_dot_product(q.qv, c.qv)
                   + list_dot_product(c.qv, c.qv) AS d
               FROM s{s}_e q CROSS JOIN s{s}_c{iters} c
               WHERE q.{id_col} < {nq}"""
        )
    subspace_body = ",\n".join(bodies)
    codes_union = "\nUNION ALL\n".join(code_sel)
    dtab_union = "\nUNION ALL\n".join(dtab_sel)
    return f"""
        WITH cent AS (
          SELECT {id_col} AS cid,
                 list_transform(CAST({vec_col} AS DOUBLE[]),
                                x -> floor(x * {QUANT})) AS cv
          FROM {table} WHERE {id_col} < {ncentroids}
        ), ev AS (
          SELECT {id_col},
                 list_transform(CAST({vec_col} AS DOUBLE[]),
                                x -> floor(x * {QUANT})) AS qv,
                 CAST({vec_col} AS DOUBLE[]) AS v
          FROM {table}
        ), ip AS (
          SELECT ev.{id_col}, cent.cid, list_dot_product(ev.qv, cent.cv) AS ip
          FROM ev CROSS JOIN cent
        ), ranked AS (
          SELECT {id_col}, cid,
                 row_number() OVER (PARTITION BY {id_col} ORDER BY ip DESC, cid) AS rn
          FROM ip
        ), cassign AS (
          SELECT {id_col} AS cand_id, cid AS cell FROM ranked WHERE rn = 1
        ), qprobe AS (
          SELECT {id_col} AS query_id, cid AS cell FROM ranked
          WHERE rn <= {nprobe} AND {id_col} < {nq}
        ),
        {subspace_body},
        codes AS (
          {codes_union}
        ), dtab AS (
          {dtab_union}
        ), adc AS (
          SELECT p.query_id, ca.cand_id, sum(dt.d) AS adc
          FROM qprobe p
          JOIN cassign ca ON ca.cell = p.cell
          JOIN codes co ON co.{id_col} = ca.cand_id
          JOIN dtab dt ON dt.query_id = p.query_id
                      AND dt.s = co.s AND dt.cell = co.cell
          WHERE ca.cand_id <> p.query_id
          GROUP BY 1, 2
        ), cand AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS rn
            FROM adc
          ) WHERE rn <= {refine}
        ), scored AS (
          SELECT cand.query_id, cand.cand_id,
                 round(list_dot_product(eq.v, ec.v) /
                       (sqrt(list_dot_product(eq.v, eq.v))
                        * sqrt(list_dot_product(ec.v, ec.v))), 6) AS cosine_sim
          FROM cand
          JOIN ev eq ON eq.{id_col} = cand.query_id
          JOIN ev ec ON ec.{id_col} = cand.cand_id
        )
        SELECT query_id, cand_id, cosine_sim, CAST(rank AS INT) AS rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, cand_id) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """
