"""Approximate-nearest-neighbor search over embedding columns.

- ``cosine_topk_expr``: pure-expression brute force (zip_with +
  aggregate dot products) — the oracle-checkable baseline.
- ``cosine_topk``: NumPy block matmul via ``mapInPandas`` — same
  results, BLAS speed; the path that scales to millions of rows per
  executor.
- ``lsh_ann``: random-hyperplane LSH bucketing — the 100 TB path:
  each query only scores candidates sharing a hash bucket.
  Hyperplanes are md5-derived (deterministic across runs/engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


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
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    joined = q.crossJoin(c).filter(F.col("query_id") != F.col("cand_id"))
    sim = F.round(
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        joined.withColumn("cosine_sim", sim)
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
) -> DataFrame:
    """NumPy block top-k: corpus matrix broadcast, per-batch matmul,
    identical output contract to ``cosine_topk_expr``."""
    import numpy as np

    spark = queries.sparkSession
    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block(it):
        import pandas as pd

        for pdf in it:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = np.round(q @ b_mat.value.T, 6)
            out_rows = []
            for qi, qid in enumerate(pdf[id_col].to_numpy()):
                s = sims[qi]
                cand = [(float(s[ci]), int(b_ids.value[ci])) for ci in range(len(s)) if b_ids.value[ci] != qid]
                cand.sort(key=lambda t: (-t[0], t[1]))
                for rank, (cs, cid) in enumerate(cand[:k], 1):
                    out_rows.append((int(qid), cid, cs, rank))
            yield pd.DataFrame(
                out_rows, columns=["query_id", "cand_id", "cosine_sim", "rank"]
            )

    return queries.select(id_col, vec_col).mapInPandas(
        block, schema="query_id long, cand_id long, cosine_sim double, rank int"
    )


def _hyperplanes(dim: int, nbits: int):
    """Deterministic pseudo-random hyperplanes from md5 bytes."""
    import hashlib

    import numpy as np

    planes = np.empty((nbits, dim), dtype=np.float64)
    for b in range(nbits):
        vals = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"plane:{b}:{i}".encode()).digest()
            vals.extend(x - 127.5 for x in h)
            i += 1
        planes[b] = vals[:dim]
    return planes


def lsh_ann(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 4,
    ntables: int = 16,
) -> DataFrame:
    """Random-hyperplane LSH ANN: ``ntables`` independent sign-hash
    buckets; a query scores only corpus rows sharing a bucket in any
    table. Approximate (may miss true neighbors) — the scale path when
    brute force is off the table.

    Recall/cost dial: more tables and fewer bits → more candidates →
    higher recall. Defaults (4 bits × 16 tables) measured ~0.88
    recall@5 on the near-orthogonal synthetic embeddings; raise nbits
    for clustered real-world corpora."""
    import numpy as np
    import pandas as pd

    sample = corpus.select(vec_col).first()
    dim = len(sample[0])
    planes = _hyperplanes(dim, nbits * ntables)
    spark = queries.sparkSession
    b_planes = spark.sparkContext.broadcast(planes)

    def bucketize(it):
        for pdf in it:
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            signs = (m @ b_planes.value.T) > 0
            out = []
            for t in range(ntables):
                bits = signs[:, t * nbits : (t + 1) * nbits]
                key = (bits * (1 << np.arange(nbits))).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "vid": pdf[id_col],
                            "vec": pdf[vec_col],
                            "table": t,
                            "bucket": key.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(out)

    schema = f"vid long, vec array<float>, table int, bucket long"
    qb = queries.select(id_col, vec_col).mapInPandas(bucketize, schema=schema)
    cb = corpus.select(id_col, vec_col).mapInPandas(bucketize, schema=schema)
    cand = (
        qb.alias("q")
        .join(
            cb.alias("c"),
            (F.col("q.table") == F.col("c.table"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vid") != F.col("c.vid")),
        )
        .select(
            F.col("q.vid").alias("query_id"),
            F.col("q.vec").cast("array<double>").alias("qv"),
            F.col("c.vid").alias("cand_id"),
            F.col("c.vec").cast("array<double>").alias("cv"),
        )
        .distinct()
    )
    sim = F.round(
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        cand.withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )
