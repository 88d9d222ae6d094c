"""Approximate-nearest-neighbor search over embedding columns.

- ``cosine_topk_expr``: pure-expression brute force (zip_with +
  aggregate dot products) — the oracle-checkable baseline.
- ``cosine_topk``: distributed block top-k — corpus split into hash
  blocks, queries replicated per block, per-block NumPy matmul via
  cogrouped ``applyInPandas``, then a global top-k window. Exact, no
  driver-side collect; scales out with the corpus.
- ``lsh_ann``: random-hyperplane LSH bucketing — the 100 TB path:
  each query only scores candidates sharing a hash bucket. Planes are
  INTEGER-valued (md5-derived) and embeddings are quantized with
  ``floor(x*1000)``, so every bucket key is exact integer arithmetic —
  bit-identical across engines and reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def _cosine(qv, cv):
    return F.round(_dot(qv, cv) / (F.sqrt(_dot(qv, qv)) * F.sqrt(_dot(cv, cv))), 6)


def _cosine_pre(qv, cv, qn, cn):
    """:func:`_cosine` with the two per-row norms precomputed BELOW
    the candidate join: ``qn``/``cn`` must be ``sqrt(_dot(v, v))`` of
    the respective side. Same doubles multiplied in the same order
    (``sqrt(x·x) * sqrt(y·y)``), so the score is bit-identical — but
    each candidate PAIR evaluates one interpreted higher-order dot
    instead of three (the two self-dots are per-ROW facts that the
    inline form recomputed once per partner)."""
    return F.round(_dot(qv, cv) / (qn * cn), 6)


def cosine_topk_expr(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k with deterministic (rounded-sim, id)
    tie-break. Cross join — use only for small query sets."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("_qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("_cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    joined = q.crossJoin(c).filter(F.col("query_id") != F.col("cand_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        joined.withColumn(
            "cosine_sim",
            _cosine_pre(F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """Exact distributed top-k: the corpus is hash-split into
    ``num_blocks`` blocks; queries are replicated once per block (a
    bounded ×B blow-up of the SMALL side); each (queries, block)
    cogroup runs one NumPy matmul and keeps a local top-k; a final
    window reduces B·k candidates per query to the global top-k.

    No full-corpus ``collect()`` anywhere — each task sees only its
    corpus block, so this survives corpora that would OOM a driver.
    Same output contract as :func:`cosine_topk_expr`."""
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    blocks = spark.range(num_blocks).select(F.col("id").cast("int").alias("blk"))
    qrep = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).crossJoin(F.broadcast(blocks))
    crep = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        F.pmod(F.col(id_col), F.lit(num_blocks)).cast("int").alias("blk"),
    )

    def local_topk(key, lpdf, rpdf):
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame(columns=["query_id", "cand_id", "cosine_sim"])
        qm = np.array(list(lpdf["qv"]), dtype=np.float64)
        cm = np.array(list(rpdf["cv"]), dtype=np.float64)
        qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        sims = np.round(qm @ cm.T, 6)
        qids = lpdf["query_id"].to_numpy()
        cids = rpdf["cand_id"].to_numpy()
        out = []
        for qi in range(len(qids)):
            s = sims[qi].copy()
            mask = cids != qids[qi]
            order = np.lexsort((cids[mask], -s[mask]))[:k]
            sel_c, sel_s = cids[mask][order], s[mask][order]
            out.append(
                pd.DataFrame(
                    {"query_id": qids[qi], "cand_id": sel_c, "cosine_sim": sel_s}
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            columns=["query_id", "cand_id", "cosine_sim"]
        )

    local = (
        qrep.groupby("blk")
        .cogroup(crep.groupby("blk"))
        .applyInPandas(local_topk, schema="query_id long, cand_id long, cosine_sim double")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def ivf_ann(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    ncentroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) ANN: a tiny coarse-quantizer codebook
    partitions the corpus into ``ncentroids`` cells; each query probes
    only its ``nprobe`` best cells and exact-reranks the vectors found
    there — the classic Faiss IVF-Flat shape, distributed.

    Codebook: with ``train_iters == 0`` (the gate-query default) the
    corpus rows with ``id < ncentroids`` — deterministic and oracle-
    reproducible. With ``train_iters > 0`` the codebook is trained by
    ``clustering.kmeans_centroids`` (integer-exact distributed Lloyd,
    still deterministic) — centroid QUALITY only moves recall, never
    the plan shape or cost model. Cell assignment is argmax integer
    inner product on floor(x·QUANT) quantized vectors — exact in any
    engine (sums ≪ 2^53), so the DuckDB oracle rebuilds the same
    cells from the same table (untrained path).

    100 TB shape: one broadcast of a 16-row codebook; assignment is a
    narrow (id, cell) frame out of an Arrow-batched int matmul (no
    ×ncentroids row blow-up, no shuffle); the probe join is an
    equi-join on ``cell`` touching ~nprobe/ncentroids of the corpus;
    only candidate vectors are re-read for the exact rerank."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    if train_iters > 0:
        from tmdataloader_spark.llmdata.clustering import kmeans_centroids

        cents = kmeans_centroids(
            corpus, k=ncentroids, iters=train_iters, id_col=id_col, vec_col=vec_col
        )
        cids = np.arange(ncentroids, dtype=np.int64)
        cmat = np.asarray(cents, dtype=np.int64)
    else:
        cent_rows = (
            corpus.filter(F.col(id_col) < ncentroids)
            .select(id_col, vec_col)
            .collect()  # codebook only: ncentroids rows, intentionally tiny
        )
        cids = np.array([r[0] for r in cent_rows], dtype=np.int64)
        cmat = np.floor(
            np.array([r[1] for r in cent_rows], dtype=np.float64) * QUANT
        ).astype(np.int64)
    b_cent = spark.sparkContext.broadcast((cids, cmat))

    def assign(nbest: int):
        def gen(it):
            ids_c, cm = b_cent.value
            for pdf in it:
                m = np.array(list(pdf[vec_col]), dtype=np.float64)
                q = np.floor(m * QUANT).astype(np.int64)
                ip = q @ cm.T  # (n, ncentroids) exact integer inner products
                out = []
                for row in range(len(pdf)):
                    order = np.lexsort((ids_c, -ip[row]))[:nbest]
                    out.append(
                        pd.DataFrame(
                            {
                                "vid": pdf[id_col].iloc[row],
                                "cell": ids_c[order],
                                "probe_rank": np.arange(1, len(order) + 1),
                            }
                        )
                    )
                yield pd.concat(out)

        return gen

    spread = corpus.select(id_col, vec_col).repartition(
        spark.sparkContext.defaultParallelism, id_col
    )
    cassign = spread.mapInPandas(
        assign(1), schema="vid long, cell long, probe_rank int"
    ).select(F.col("vid").alias("cand_id"), "cell")
    qassign = queries.select(id_col, vec_col).mapInPandas(
        assign(nprobe), schema="vid long, cell long, probe_rank int"
    ).select(F.col("vid").alias("query_id"), "cell")

    cand = qassign.join(cassign, on="cell").filter(
        F.col("query_id") != F.col("cand_id")
    ).select("query_id", "cand_id")
    # per-row norms projected BELOW the rerank join (guide §1.2):
    # each candidate pair then evaluates ONE interpreted dot, not three
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("_qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    cv = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("_cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    scored = cand.join(qv, on="query_id").join(cv, on="cand_id").withColumn(
        "cosine_sim",
        _cosine_pre(F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def int_hyperplanes(dim: int, nplanes: int) -> list[list[int]]:
    """Deterministic INTEGER hyperplanes from md5 bytes (each
    component = byte − 128 ∈ [−128, 127]). Integer-valued so sign
    tests are exact in any engine — the same plane literals drive the
    Spark plan and the DuckDB oracle."""
    planes = []
    for b in range(nplanes):
        vals: list[int] = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"plane:{b}:{i}".encode()).digest()
            vals.extend(x - 128 for x in h)
            i += 1
        planes.append(vals[:dim])
    return planes


QUANT = 1000  # embedding quantization: floor(x * QUANT) — exact in IEEE double


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 4,
    ntables: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """(id, tbl, bucket) — one narrow row per table per vector. The
    vector itself is NOT carried (no ×ntables duplication of the wide
    column); candidates are discovered on this narrow frame and
    vectors re-joined by id afterwards.

    Bucket math runs as one vectorized int64 matmul per Arrow batch —
    ``floor(x·QUANT)`` quantization then sign of the integer dot with
    each plane. Integer arithmetic (|dot| ≪ 2^53) is order-independent
    and engine-portable, so the SQL oracle reproduces every bucket
    bit-for-bit. (A pure-expression form with 64 plane literals was
    measured ~10× slower: the generated code blows past JIT limits.)"""
    import numpy as np
    import pandas as pd

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = np.array(int_hyperplanes(dim, nbits * ntables), dtype=np.int64)
    weights = 1 << np.arange(nbits, dtype=np.int64)
    spark = df.sparkSession
    b_planes = spark.sparkContext.broadcast(planes)

    def bucketize(it):
        for pdf in it:
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = np.floor(m * QUANT).astype(np.int64)
            signs = (q @ b_planes.value.T) > 0  # (n, nbits*ntables)
            out = []
            for t in range(ntables):
                bits = signs[:, t * nbits : (t + 1) * nbits]
                out.append(
                    pd.DataFrame(
                        {
                            "vid": pdf[id_col],
                            "tbl": t,
                            "bucket": (bits * weights).sum(axis=1),
                        }
                    )
                )
            yield pd.concat(out)

    # small corpus parquets arrive as one split — spread the matmul
    # across cores (the shuffle moves only raw rows)
    spread = df.select(id_col, vec_col).repartition(
        spark.sparkContext.defaultParallelism, id_col
    )
    return spread.mapInPandas(bucketize, schema="vid long, tbl int, bucket long")


def lsh_ann(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 4,
    ntables: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH ANN: ``ntables`` independent sign-hash
    buckets; a query scores only corpus rows sharing a bucket in any
    table. Approximate (may miss true neighbors) — the scale path when
    brute force is off the table.

    100 TB shape: bucket frames are (id, tbl, bucket) — narrow; the
    candidate join is an equi-join on (tbl, bucket); the pair set is
    deduped on BARE IDS before the wide vectors are joined back. All
    bucket math is exact integer arithmetic, reproducible in SQL.

    Recall/cost dial: more tables and fewer bits → more candidates →
    higher recall; raise nbits for clustered real-world corpora.

    Pass ``dim`` when the embedding width is known — it saves the
    probe job that would otherwise read one row to measure it."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    qb = lsh_buckets(queries, id_col, vec_col, nbits, ntables, dim)
    cb = lsh_buckets(corpus, id_col, vec_col, nbits, ntables, dim)
    cand = (
        qb.alias("q")
        .join(
            cb.alias("c"),
            (F.col("q.tbl") == F.col("c.tbl"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vid") != F.col("c.vid")),
        )
        .select(F.col("q.vid").alias("query_id"), F.col("c.vid").alias("cand_id"))
        .distinct()
    )
    # per-row norms projected BELOW the rerank join (guide §1.2):
    # each candidate pair then evaluates ONE interpreted dot, not three
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("_qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    cv = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("_cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    scored = cand.join(qv, on="query_id").join(cv, on="cand_id").withColumn(
        "cosine_sim",
        _cosine_pre(F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def ivfpq_ann(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    ncentroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    ksub: int = 16,
    train_iters: int = 1,
    refine: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ ANN (Jégou et al. 2011 / the Faiss IVF-PQ index),
    distributed and integer-exact: the coarse quantizer routes each
    query to ``nprobe`` cells; inside them, candidates are scored by
    ASYMMETRIC DISTANCE (ADC) — the sum of per-subspace distances
    between the query's subvectors and each candidate's product-
    quantization codewords, looked up from a per-query distance
    table — and only the ``refine`` best are exact-reranked.

    Why this is THE 100 TB path: PQ codes are ``m`` small ints per
    vector (vs dim floats — here 16 bytes vs 256), so the scan side
    of the probe join moves a narrow (id, cell, codes) frame and an
    in-memory index holds ~16× more vectors; the full-precision
    vectors are touched only for ``refine`` candidates per query.
    Everything heavier than the codes is control-plane: the coarse
    codebook broadcast, the m×ksub subspace codebooks inside the
    encode kernel closure, and per-query m×ksub distance tables.

    Determinism: quantized int64 arithmetic end-to-end (QUANT floor,
    exact L2 / inner products, first-min tie-breaks), so cell
    routing, codes, ADC scores, and the candidate set are
    bit-identical in any engine — the DuckDB oracle replays training,
    encoding, and ADC relationally. Output mirrors :func:`ivf_ann`:
    ``(query_id, cand_id, cosine_sim, rank)``."""
    import numpy as np
    import pandas as pd

    from tmdataloader_spark.llmdata.clustering import pq_fit

    spark = corpus.sparkSession
    cent_rows = (
        corpus.filter(F.col(id_col) < ncentroids)
        .select(id_col, vec_col)
        .collect()  # coarse codebook only: ncentroids rows
    )
    cids = np.array([r[0] for r in cent_rows], dtype=np.int64)
    cmat = np.floor(
        np.array([r[1] for r in cent_rows], dtype=np.float64) * QUANT
    ).astype(np.int64)
    b_cent = spark.sparkContext.broadcast((cids, cmat))

    def cell_assign(nbest: int):
        def gen(it):
            ids_c, cm = b_cent.value
            for pdf in it:
                if not len(pdf):
                    continue
                q = np.floor(
                    np.array(list(pdf[vec_col]), dtype=np.float64) * QUANT
                ).astype(np.int64)
                ip = q @ cm.T
                out = []
                for row in range(len(pdf)):
                    order = np.lexsort((ids_c, -ip[row]))[:nbest]
                    out.append(
                        pd.DataFrame(
                            {
                                "vid": pdf[id_col].iloc[row],
                                "cell": ids_c[order],
                            }
                        )
                    )
                yield pd.concat(out)

        return gen

    books = pq_fit(corpus, m=m, ksub=ksub, iters=train_iters, id_col=id_col, vec_col=vec_col)
    Cs = [np.asarray(b, dtype=np.int64) for b in books]

    def fused_index(it):
        # ONE corpus pass emitting (vid, cell, codes): the coarse cell
        # (same per-row lexsort argmax as cell_assign) and the PQ codes
        # (same per-subspace argmin as clustering.pq_encode) share the
        # quantized matrix — the split form paid a second corpus scan,
        # a second Arrow boundary, AND a corpus×corpus cand_id equi-join
        # just to recombine two columns derived from the same row
        ids_c, cm = b_cent.value
        for pdf in it:
            if not len(pdf):
                continue
            X = np.floor(
                np.array(list(pdf[vec_col]), dtype=np.float64) * QUANT
            ).astype(np.int64)
            ip = X @ cm.T
            cells = np.empty(len(pdf), dtype=np.int64)
            for row in range(len(pdf)):
                cells[row] = ids_c[np.lexsort((ids_c, -ip[row]))[0]]
            cols = []
            off = 0
            for C in Cs:
                w = C.shape[1]
                Xs = X[:, off : off + w]
                off += w
                d = (
                    (Xs * Xs).sum(axis=1, keepdims=True)
                    - 2 * (Xs @ C.T)
                    + (C * C).sum(axis=1)
                )
                cols.append(np.argmin(d, axis=1))
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col],
                    "cell": cells,
                    "codes": list(np.stack(cols, axis=1).astype("int32")),
                }
            )

    spread = corpus.select(id_col, vec_col).repartition(
        spark.sparkContext.defaultParallelism, id_col
    )
    cindex = spread.mapInPandas(
        fused_index, schema="vid long, cell long, codes array<int>"
    ).select(F.col("vid").alias("cand_id"), "cell", "codes")
    qassign = (
        queries.select(id_col, vec_col)
        .mapInPandas(cell_assign(nprobe), schema="vid long, cell long")
        .select(F.col("vid").alias("query_id"), "cell")
    )

    def dtab_gen(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.floor(
                np.array(list(pdf[vec_col]), dtype=np.float64) * QUANT
            ).astype(np.int64)
            rows = []
            for row in range(len(pdf)):
                tabs = []
                off = 0
                for C in Cs:
                    w = C.shape[1]
                    qs = X[row, off : off + w]
                    off += w
                    d = (qs * qs).sum() - 2 * (C @ qs) + (C * C).sum(axis=1)
                    tabs.append([int(x) for x in d])
                rows.append({"query_id": pdf[id_col].iloc[row], "dtabs": tabs})
            yield pd.DataFrame(rows)

    dtabs = queries.select(id_col, vec_col).mapInPandas(
        dtab_gen, schema="query_id long, dtabs array<array<bigint>>"
    )

    adc = (
        qassign.join(cindex, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .join(F.broadcast(dtabs), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("dtabs"),
                    lambda c, t: F.element_at(t, c + F.lit(1)),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("adc"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc", "cand_id")
    cand = (
        adc.withColumn("_rn", F.row_number().over(w_adc))
        .filter(F.col("_rn") <= refine)
        .select("query_id", "cand_id")
    )
    # per-row norms projected BELOW the rerank join (guide §1.2):
    # each candidate pair then evaluates ONE interpreted dot, not three
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("_qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    cv = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("_cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .withColumn(
            "cosine_sim",
            _cosine_pre(F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )
