"""Dictionary (categorical) encoding: deterministic dense integer ids
for string values.

The training-data cousin of the reference's dimension-table id
assignment (plans/clinical.py builds patient/concept dimension ids the
same way): models want categorical columns as dense 0..V−1 codes, and
the mapping must be DETERMINISTIC — sorted lexical order, not
first-seen order — so that re-runs, engines and partitionings agree
(MLlib's StringIndexer orders by frequency with arbitrary ties; this
one is total-ordered by construction).

Scale shape: the dictionary derives from the DISTINCT value set
(vocabulary-sized, not corpus-sized).  Ranks come from the two-phase
prefix sum over ORDER-PRESERVING buckets (the packing.py/stattests.py
recipe): a local row_number within each bucket plus broadcast
bucket-base offsets — no global single-task window over the
vocabulary.  Buckets default to the value's first two characters;
pathological vocabularies that pile into one bucket degrade only that
bucket to a single-task sort.  Applying the encoding is one
broadcast-able equi-join (dictionary-sized build side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def build_dictionary(
    df: DataFrame,
    col: str,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Dense-id dictionary for the distinct values of ``col``:
    ``value, code`` with codes 0..V−1 assigned in ascending lexical
    (binary collation) order.  NULL never gets a code — encode maps it
    to −1 by convention."""
    vals = df.select(F.col(col).alias("value")).filter(
        F.col("value").isNotNull()
    ).distinct()
    bkt = (
        bucket_expr
        if bucket_expr is not None
        else F.substring(F.col("value"), 1, 2)
    )
    vals = vals.withColumn("_bkt", bkt)
    w_local = Window.partitionBy("_bkt").orderBy("value")
    local = vals.withColumn("_lr", F.row_number().over(w_local))
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        vals.groupBy("_bkt")
        .agg(F.count("*").alias("_n"))
        .withColumn("_base", F.coalesce(F.sum("_n").over(w_b), F.lit(0)))
        .select("_bkt", "_base")
    )
    return (
        local.join(F.broadcast(bases), "_bkt")
        .select(
            "value",
            (F.col("_base") + F.col("_lr") - 1).cast("long").alias("code"),
        )
    )


def encode_column(
    df: DataFrame,
    col: str,
    dictionary: DataFrame | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace/annotate ``col`` with its dense code via one broadcast
    equi-join.  Values absent from a supplied dictionary (new
    categories at apply time) and NULLs map to −1 — explicit, never a
    silent drop; callers detect drift by counting −1s (or run
    schema/mixture drift monitors upstream)."""
    d = dictionary if dictionary is not None else build_dictionary(df, col)
    out = out_col or f"{col}_code"
    dict_side = d.select(
        F.col("value").alias(f"_dict_{col}"), F.col("code").alias(out)
    )
    return (
        df.join(
            F.broadcast(dict_side),
            df[col] == dict_side[f"_dict_{col}"],
            "left",
        )
        .drop(f"_dict_{col}")
        .withColumn(out, F.coalesce(F.col(out), F.lit(-1)).cast("long"))
    )
