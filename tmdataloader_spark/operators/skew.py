"""Skew tooling: diagnose hot keys and join through them.

AQE's skew-join handling (splitting oversized sort-merge partitions)
covers most cases for free; these operators cover the two gaps:

* ``skew_report`` — the DIAGNOSIS: per-key share of the table and the
  partition-size histogram a capacity plan needs, computed with one
  top-k aggregate (per-task k-heaps — never a global sort).
* ``salted_join`` — the CURE when the build side cannot be broadcast
  and AQE cannot split (e.g. a hot key inside a hash aggregate +
  join pipeline): the standard two-sided salting rewrite, with a
  DETERMINISTIC salt (xxhash64 of stable row columns, not ``rand()``)
  so results are reproducible and the partition-invariance property
  tests hold. The generalization of the hand-salted
  ``concept_counts_salted`` (operators/tree.py).

Reference parity note: the reference leans on physical indexes +
ANALYZE for its hot keys (sql/postgres procedures; SURVEY §4) — on
Spark the equivalents are AQE plus these rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def skew_report(
    df: DataFrame,
    key: str,
    top: int = 20,
) -> DataFrame:
    """Top-``top`` hottest keys with absolute count and share of the
    table: ``(key, n_rows, share)``, ordered by (n_rows desc, key).

    One map-side-combined count per key + per-task k-heap selection
    (``orderBy().limit``); the total is a one-row aggregate crossed
    in (scalar-subquery shape). Share rounds to 6 decimals."""
    from tmdataloader_spark.functions.ratio import round6_ratio

    counts = df.groupBy(key).agg(F.count("*").alias("n_rows"))
    total = df.agg(F.count("*").alias("_total"))
    return (
        counts.orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top)
        .crossJoin(F.broadcast(total))
        .select(
            key,
            "n_rows",
            # integer-exact HALF_UP (functions/ratio.py): count ratios
            # can land on exact .5 micro-units where engines' double
            # rounding splits; decimal cast keeps 2·n·1e6 overflow-safe
            round6_ratio("CAST(n_rows AS DECIMAL(38,0))", "_total").alias("share"),
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` ⋈ ``right`` on ``key`` with the hot-key
    salting rewrite: every ``right`` row replicates ``salt`` times
    (one per salt id), every ``left`` row gets ONE deterministic salt
    id, and the join runs on ``(key, salt_id)`` — a key seen by every
    row of a 100 TB table now spreads over ``salt`` reducers instead
    of one straggler.

    ``salt_cols`` (default: all non-key left columns) feed the
    xxhash64 that assigns the left row's salt id — deterministic, so
    two runs (or two engines) place every row identically; ``rand()``
    would break the repo's partition-invariance contract. Cost:
    ``salt×`` replication of the RIGHT side only — use when right is
    too big to broadcast yet far smaller than left (else broadcast
    and salting is moot). Result equals the plain join exactly
    (row multiset; pytest-asserted), for inner and left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    scols = salt_cols or [c for c in left.columns if c != key]
    if not scols:
        raise ValueError("need at least one non-key column to derive the salt")
    sid = F.pmod(F.xxhash64(*[F.col(c) for c in scols]), F.lit(salt))
    l = left.withColumn("_salt", sid)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [key, "_salt"], how).drop("_salt")
