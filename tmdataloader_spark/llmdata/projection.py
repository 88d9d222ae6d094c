"""Johnson-Lindenstrauss random projection of embedding columns —
Achlioptas 2003, "Database-friendly random projections:
Johnson-Lindenstrauss with binary coins" (JCSS 66(4)): a ±1 sign
matrix preserves pairwise distances in expectation as well as a
Gaussian one, and makes the projection pure integer arithmetic.

Why it's here: every ANN / LSH / clustering operator in
``llmdata/similarity.py`` and ``llmdata/clustering.py`` costs
O(dim) per comparison; projecting 64-dim (or 1024-dim production)
embeddings down to 16 dims first cuts that constant 4× (64×) for the
candidate-generation stages, with the exact rerank still running on
the original vectors — the standard two-stage ANN recipe.

Determinism / oracle story: vectors are quantized ``floor(x·quant)``
to int64 (the clustering.QUANT recipe) and the sign matrix is
DERIVED, not sampled — ``sign(i,j) = +1 iff md5("rp:<i>:<j>")'s
first byte is even`` — computed driver-side into literal arrays
(in_dim × out_dim ints; 64×16 = 1 KiB in the task closure). Each
output component is an exact integer dot product, so the result is
bit-identical across partitionings and engines; the generated DuckDB
oracle replays the same literals with ``list_dot_product`` over
integer-valued doubles (exact far below 2^53).

100 TB shape: a pure per-row projection — no shuffle, no Python, one
whole-stage-codegen map over the corpus. The sign matrix is a plan
literal (never a join), and the output is ``out_dim`` longs per row —
4× (dim/out_dim×) narrower than the input for everything downstream.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from tmdataloader_spark.llmdata.clustering import QUANT


def projection_signs(in_dim: int, out_dim: int) -> list[list[int]]:
    """The derived ±1 sign matrix as ``out_dim`` rows of ``in_dim``
    entries: ``+1`` iff the first byte of ``md5("rp:<i>:<j>")`` is
    even. Deterministic, engine-independent, and cheap to regenerate
    anywhere (the oracle generator embeds it as SQL literals)."""
    return [
        [
            1 if hashlib.md5(f"rp:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = QUANT,
) -> DataFrame:
    """Project ``vec_col`` (``in_dim`` floats) to ``out_dim`` exact
    integer components: ``p<j> = Σ_i floor(v_i·quant)·sign(i,j)``.

    Returns ``(id_col, p0 .. p<out_dim-1>)`` as scalar BIGINT
    columns — flat on purpose: every downstream consumer (LSH
    banding, IVF assignment) reads individual components, and flat
    scalars keep the output canonicalizable by column sort (array
    columns are not orderable in a pandas sort_values). Downstream
    cosine / L2 on the components approximates the original geometry
    (JL); scale factors cancel in cosine, so no division is needed
    anywhere."""
    signs = projection_signs(in_dim, out_dim)
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * quant).cast("long"),
    )
    comps = [
        F.aggregate(
            F.zip_with(F.col("_q"), F.lit(signs[j]), lambda a, s: a * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias(f"p{j}")
        for j in range(out_dim)
    ]
    # quantize ONCE into an attribute below the component projection:
    # inlining ``q`` into all out_dim aggregates re-evaluated the
    # floor-transform once per component (16x per row at the default
    # width) — CollapseProject keeps a non-cheap multiply-referenced
    # alias split, so the two-stage select is stable (guide §1.2, the
    # same attribute-projection fix as summary_stats/zorder)
    return df.select(F.col(id_col), q.alias("_q")).select(F.col(id_col), *comps)


def random_projection_oracle_sql(
    in_dim: int,
    out_dim: int = 16,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = QUANT,
) -> str:
    """DuckDB twin: identical quantization + the same embedded sign
    literals; ``list_dot_product`` over integer-valued doubles is
    exact at these magnitudes (|proj_j| ≤ in_dim·quant·max|v|)."""
    signs = projection_signs(in_dim, out_dim)
    comp_cols = ",\n".join(
        "CAST(list_dot_product(q, ["
        + ", ".join(f"{s}.0" for s in signs[j])
        + f"]) AS BIGINT) AS p{j}"
        for j in range(out_dim)
    )
    plist = ", ".join(f"p{j}" for j in range(out_dim))
    return f"""
        WITH e AS (
          SELECT {id_col},
                 list_transform(CAST({vec_col} AS DOUBLE[]),
                                x -> floor(x * {quant})) AS q
          FROM {table}
        ), c AS (
          SELECT {id_col}, {comp_cols} FROM e
        )
        SELECT {id_col}, {plist} FROM c
    """
