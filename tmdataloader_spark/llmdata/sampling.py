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
