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

100 TB shape (kmeans): assignment is pure codegen — the k×dim
centroid table rides along as literal expressions (a broadcast in
spirit; k·dim ≪ executor memory), so the scoring stage is one narrow
projection with NO shuffle and no Python. The update is
``posexplode`` → ``groupBy(cluster, pos)`` — k·dim distinct keys, so
the map-side combine collapses each task's contribution to at most
k·dim rows and the shuffle is tiny regardless of corpus size. The
only driver traffic is the k·dim centroid rows per iteration
(control plane, same as MLlib's KMeans).
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


def _int_dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign_expr(centroids: list[list[int]]) -> F.Column:
    """argmin_j ||qv - c_j||² as a pure expression over the literal
    centroid table: dist_j = qv·qv − 2·qv·c_j + c_j·c_j, min taken by
    lexicographic (dist, j) struct ordering — deterministic ties."""
    xx = _int_dot(F.col("qv"), F.col("qv"))
    cands = []
    for j, c in enumerate(centroids):
        lit = F.array(*[F.lit(int(v)).cast("long") for v in c])
        cc = sum(int(v) * int(v) for v in c)
        d = xx - F.lit(2).cast("long") * _int_dot(F.col("qv"), lit) + F.lit(cc).cast("long")
        cands.append(F.struct(d.alias("d"), F.lit(j).cast("int").alias("j")))
    return F.array_min(F.array(*cands))["j"]


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
    rounds scores every row against the current centroids (codegen
    projection, zero shuffle) and rebuilds centroids as the
    element-wise ``floor(mean)`` of the quantized members (one
    map-side-combined aggregate with k·dim output rows). Empty cells
    keep their previous centroid.

    Returns ``(id_col, cluster int)`` for every input row."""
    base = df.select(F.col(id_col), _quantized(vec_col).alias("qv"))
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
        assigned = base.withColumn("cluster", _assign_expr(centroids))
        sums = (
            assigned.select("cluster", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
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
    return base.select(id_col, _assign_expr(centroids).alias("cluster"))


def kmeans_oracle_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`kmeans_fit`: the same fixed iterations
    unrolled as CTEs over the same quantized integers. Distances use
    DOUBLE dot products of integer-valued arrays — exact below 2^53,
    so assignments are bit-identical to the Spark plan."""
    ctes = [
        f"""e AS (
          SELECT {id_col}, list_transform(CAST({vec_col} AS DOUBLE[]),
                 x -> floor(x * {QUANT})) AS qv
          FROM {table}
        )""",
        f"""c0 AS (
          SELECT CAST({id_col} AS INT) AS cell, qv FROM e WHERE {id_col} < {k}
        )""",
    ]
    prev = "c0"
    for t in range(iters + 1):
        ctes.append(
            f"""a{t} AS (
          SELECT {id_col}, (array_agg(cell ORDER BY d, cell))[1] AS cell FROM (
            SELECT e.{id_col}, c.cell,
                   list_dot_product(e.qv, e.qv)
                     - 2 * list_dot_product(e.qv, c.qv)
                     + list_dot_product(c.qv, c.qv) AS d
            FROM e CROSS JOIN {prev} c
          ) GROUP BY {id_col}
        )"""
        )
        if t == iters:
            break
        ctes.append(
            f"""u{t} AS (
          SELECT a.cell, r.range AS pos, sum(e.qv[r.range]) AS s, count(*) AS n
          FROM a{t} a JOIN e USING ({id_col})
          CROSS JOIN range(1, {dim + 1}) r
          GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""c{t + 1} AS (
          SELECT cell, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                            ORDER BY pos) AS qv
          FROM u{t} GROUP BY cell
          UNION ALL
          SELECT cell, qv FROM c{t}
          WHERE cell NOT IN (SELECT cell FROM u{t})
        )"""
        )
        prev = f"c{t + 1}"
    body = ",\n".join(ctes)
    # NOTE: iteration t's update uses assignment a{t}; the returned
    # frame is the assignment against the FINAL centroids (a{iters}),
    # mirroring kmeans_fit's trailing _assign_expr.
    return f"WITH {body}\nSELECT {id_col}, cell AS cluster FROM a{iters}"


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

    100 TB shape: the only pairwise work is the within-cell self-join
    — an equi-join on ``cluster`` whose candidate count is Σ cell²
    instead of n²; cosine is evaluated only on co-clustered pairs.
    Skewed (oversized) cells are the knob: raise ``k`` so cells track
    n/k, exactly the paper's regime (k ≈ n/100 at web scale).

    Returns ``(id_col, cluster int, keep boolean)`` for every row."""
    clusters = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    member = clusters.join(vecs, id_col).select(
        F.col(id_col).alias("mid"), F.col("cluster").alias("mcell"), F.col("v").alias("mv")
    )
    other = member.select(
        F.col("mid").alias("oid"), F.col("mcell").alias("ocell"), F.col("mv").alias("ov")
    )

    def _cos(a, b):
        num = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )
        na = F.sqrt(
            F.aggregate(
                F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
            )
        )
        nb = F.sqrt(
            F.aggregate(
                F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
            )
        )
        return F.round(num / (na * nb), 6)

    dropped = (
        member.join(
            other,
            (F.col("mcell") == F.col("ocell")) & (F.col("oid") < F.col("mid")),
        )
        .filter(_cos(F.col("mv"), F.col("ov")) >= threshold)
        .select(F.col("mid").alias(id_col))
        .distinct()
    )
    return (
        clusters.join(dropped.withColumn("_drop", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
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
