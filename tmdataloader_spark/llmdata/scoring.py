"""Model scoring and evaluation curves, Spark-first.

``linear_score`` is the quality-classifier stand-in (CCNet/FineWeb
pipelines score documents with a fasttext-style linear model; the
public-knowledge core of such a model is a dot product over handcrafted
features) — weights enter the PLAN as literals, so scoring is one
whole-stage-codegen projection: no UDF, no join, no shuffle, exactly
the right 100 TB shape for "score every document".

``pr_curve`` evaluates any score against binary labels at EVERY
distinct score threshold — the precision/recall sweep behind choosing
a keep/drop cut.  It reduces to integer counting: per distinct score,
(n, positives); cumulative sums DESCENDING by score give TP and
predicted-positive counts at the threshold "score ≥ s"; precision/
recall are single divisions at the end (6dp).  Cumulative sums use
the two-phase prefix recipe (statistic/stattests.py) with
order-preserving buckets — no global single-task window over the
distinct-score table.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window, functions as F

from tmdataloader_spark.functions.ratio import round6_ratio as _round6_ratio


def linear_score(
    df: DataFrame,
    weights: Mapping[str, float],
    bias: float = 0.0,
    out_col: str = "score",
    quantize: bool = True,
) -> DataFrame:
    """Append ``out_col`` = bias + Σ w_i·feature_i as pure codegen.
    Feature columns are the keys of ``weights``; weights/bias fold
    into plan literals.  With ``quantize`` (default) the result is
    rounded to 6dp — the engine-agreed rendering, and what downstream
    threshold comparisons should run on.  Iteration order of
    ``weights`` does NOT matter: the sum is built in sorted-key order
    so the double expression shape is reproducible."""
    expr: Column = F.lit(float(bias))
    for name in sorted(weights):
        expr = expr + F.col(name).cast("double") * F.lit(float(weights[name]))
    if quantize:
        expr = F.round(expr, 6)
    return df.withColumn(out_col, expr)


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Precision/recall at every distinct score threshold (predicting
    positive when ``score >= threshold``).  Returns
    ``threshold, n_pred, tp, precision, recall`` — one row per
    distinct score, ordered by whatever the consumer sorts on.

    ``label_col`` must be 0/1 (or boolean — cast yourself).  Rows
    with NULL score or label are excluded."""
    base = df.select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("long").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    per_s = base.groupBy("s").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    bkt = bucket_expr if bucket_expr is not None else F.floor(F.col("s"))
    per_s = per_s.withColumn("_bkt", bkt.cast("long"))

    # cumulative DESCENDING by score: local inclusive run per bucket...
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = per_s.withColumn("ln", F.sum("n").over(w_local)).withColumn(
        "lp", F.sum("pos").over(w_local)
    )
    # ...plus bases from the buckets ABOVE this one (descending order)
    w_b = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = (
        per_s.groupBy("_bkt")
        .agg(F.sum("n").alias("tn"), F.sum("pos").alias("tp_"))
        .withColumn("bn", F.coalesce(F.sum("tn").over(w_b), F.lit(0)))
        .withColumn("bp", F.coalesce(F.sum("tp_").over(w_b), F.lit(0)))
        .select("_bkt", "bn", "bp")
    )
    totals = per_s.groupBy().agg(F.sum("pos").alias("all_pos"))
    return (
        local.join(F.broadcast(bases), "_bkt")
        .join(F.broadcast(totals))
        .select(
            F.col("s").alias("threshold"),
            (F.col("bn") + F.col("ln")).alias("n_pred"),
            (F.col("bp") + F.col("lp")).alias("tp"),
            # integer-exact HALF_UP ratios (functions/ratio.py);
            # all_pos = 0 -> NULL via division-by-zero on both engines
            _round6_ratio("bp + lp", "bn + ln").alias("precision"),
            _round6_ratio("bp + lp", "all_pos").alias("recall"),
        )
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """EXACT ROC-AUC as one scalar row (``n_pos, n_neg, auc``), via
    the Mann-Whitney rank-sum identity — AUC = U/(n_pos·n_neg) with
    tie midranks.  The whole computation is INTEGER arithmetic until
    one final division: with c_before = count of rows scoring strictly
    below s and n = s's multiplicity, the DOUBLED midrank is
    2·c_before + n + 1 (an integer even when the midrank is x.5), so
    2U = Σ_pos(2·rank) − n_pos·(n_pos+1) accumulates exactly and
    AUC = 2U / (2·n_pos·n_neg).  No float sums anywhere — the
    partition/engine-invariance regime.

    Scale shape: one groupBy(score) (distinct-score-sized), exclusive
    prefix counts via the two-phase order-preserving-bucket recipe,
    one broadcast totals row.  NULL scores/labels excluded."""
    base = df.select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("long").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    per_s = base.groupBy("s").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    bkt = bucket_expr if bucket_expr is not None else F.floor(F.col("s"))
    per_s = per_s.withColumn("_bkt", bkt.cast("long"))
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = per_s.withColumn(
        "lcb", F.coalesce(F.sum("n").over(w_local), F.lit(0))
    )
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        per_s.groupBy("_bkt")
        .agg(F.sum("n").alias("tn"))
        .withColumn("bb", F.coalesce(F.sum("tn").over(w_b), F.lit(0)))
        .select("_bkt", "bb")
    )
    totals = per_s.groupBy().agg(
        F.sum("pos").alias("n_pos"),
        (F.sum("n") - F.sum("pos")).alias("n_neg"),
    )
    cb = F.col("bb") + F.col("lcb")
    return (
        local.join(F.broadcast(bases), "_bkt")
        .join(F.broadcast(totals))
        .groupBy("n_pos", "n_neg")
        .agg(
            F.sum(F.col("pos") * (F.lit(2) * cb + F.col("n") + 1)).alias(
                "_2ranks"
            )
        )
        .select(
            "n_pos",
            "n_neg",
            F.round(
                F.when(
                    (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                    (
                        F.col("_2ranks")
                        - F.col("n_pos") * (F.col("n_pos") + 1)
                    )
                    / (2.0 * F.col("n_pos") * F.col("n_neg")),
                ),
                6,
            ).alias("auc"),
        )
    )

def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram bins: does a score of ~0.7 actually mean a
    ~70% positive rate?  The companion readout to roc_auc/pr_curve
    (those rank; this checks the score's face value) — the standard
    probe before using a quality-classifier score as a sampling
    weight or threshold (Niculescu-Mizil & Caruana, ICML'05).

    Scores are binned into ``bins`` equal-width buckets over [0, 1]
    (the top edge closes into the last bin).  Per bin: count,
    positives, mean score, and empirical positive rate.  One
    map-side-combined aggregate over |bins| groups; mean score sums
    decimal(38,6) (the repo's float regime — per-row quantization is
    deterministic, the sum is exact, ONE division at the end).

    Output: ``bin, n, n_pos, avg_score, pos_rate``.
    """
    b = F.least(
        F.floor(F.col(score_col) * bins).cast("long"), F.lit(bins - 1)
    )
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
            F.sum(F.col(score_col).cast("decimal(38,6)")).alias("_ss"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            (F.col("_ss").cast("double") / F.col("n")).alias("avg_score"),
            (F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
        )
    )


def calibration_curve_oracle_sql(
    table: str, score_sql: str, label_sql: str, bins: int = 10
) -> str:
    """DuckDB twin of :func:`calibration_curve` — identical binning
    edge handling, decimal score sum, and report divisions."""
    return f"""
        WITH v AS (
          SELECT least(CAST(floor(({score_sql}) * {bins}) AS BIGINT),
                       {bins - 1}) AS bin,
                 CAST({label_sql} AS BIGINT) AS y,
                 CAST({score_sql} AS DECIMAL(38,6)) AS s
          FROM {table}
        )
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(s) AS DOUBLE) / count(*) AS avg_score,
               CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate
        FROM v GROUP BY bin
    """
