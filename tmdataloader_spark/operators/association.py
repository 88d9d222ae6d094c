"""Market-basket association-rule mining (support / confidence /
lift) over order lines.

The co-occurrence counterpart of the engine's text-side PMI census
(llmdata/vocab.py pmi_collocations) applied to transactional
baskets — "customers who bought X also bought Y", the classic
retail / recommender primitive (extension beyond the reference
surface; same counting regime as the concept-count family,
reference I2B2_CREATE_CONCEPT_COUNTS.sql analog counts).

Scale shape: ONE shuffle builds per-basket item sets (collect_set
partial-aggregates map-side); pair generation is then a map-side
double explode off those sets — no self-join, no second data-sized
shuffle, with per-basket fanout bounded by basket size squared
(never a corpus cross join; a basket of b items emits b·(b-1)/2
pairs, so cost tracks Σb² which is data-sized for bounded baskets).
All counts are map-side-combined aggregates; the basket total
crosses in as a one-row broadcast; item counts join the pair frame
on the item key (|items|-sized, not data-sized).  Skewed
"mega-baskets" (a basket with 10^5 items would emit 10^10 pairs) are
guarded by ``max_basket_size``.  Selection is ``orderBy().limit(k)``
(TakeOrderedAndProject per-task k-heaps), never a global sort.

Determinism regime: every metric is ONE fixed-shape double expression
over exact long counts with casts/parenthesization mirrored by the
oracle (no cross-row float sums anywhere); ranking is on the exact
``n_xy`` long with the item pair as total-order tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def basket_rules(
    df: DataFrame,
    k: int = 100,
    min_count: int = 2,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    max_basket_size: int | None = None,
) -> DataFrame:
    """Top-``k`` item pairs by co-occurrence count with association
    metrics: ``support`` = n_xy / |baskets|, directional confidences
    ``conf_x_y`` = n_xy / n_x and ``conf_y_x`` = n_xy / n_y, and
    ``lift`` = (n_xy · |baskets|) / (n_x · n_y) — lift > 1 means the
    pair co-occurs more than independence predicts.

    Pairs are unordered (``x < y``); ``min_count`` floors the
    co-occurrence support; ``max_basket_size`` (optional) drops
    baskets larger than the cap BEFORE pair generation — the
    deterministic skew guard for degenerate mega-baskets.

    Returns ``(part_x, part_y, n_xy, n_x, n_y, support, conf_x_y,
    conf_y_x, lift)`` ordered by (n_xy desc, part_x, part_y).
    """
    # ONE shuffle builds the per-basket item sets (collect_set partial-
    # aggregates map-side); pair generation is then a map-side double
    # explode — no self-join, no second data shuffle.  The frame feeds
    # three consumers (total, item counts, pairs), so collapse the
    # shared subplan once (lazy localCheckpoint — the multi-consumer
    # regime triangle_count established).
    baskets = (
        df.select(basket_col, item_col)
        .groupBy(basket_col)
        .agg(F.collect_set(item_col).alias("_items"))
    )
    if max_basket_size is not None:
        baskets = baskets.filter(F.size("_items") <= max_basket_size)
    baskets = baskets.localCheckpoint(eager=False)
    n = baskets.groupBy().agg(F.count("*").alias("_n"))
    # item counts feed TWO joins (the part_x and part_y sides); without
    # a lineage break the explode+agg subplan is planned — and executed
    # — twice, one full pass per side (visible as two identical
    # Generate→HashAggregate→Exchange subtrees in the r14 before-plan).
    # The frame is |items|-sized, so materializing it once is
    # control-plane cost at any scale (same lazy-localCheckpoint regime
    # as the baskets frame above).
    ic = (
        baskets.select(F.explode("_items").alias(item_col))
        .groupBy(item_col)
        .agg(F.count("*").alias("_cnt"))
        .localCheckpoint(eager=False)
    )
    # array_sort once per basket, then pair only with LATER elements
    # (posexplode + slice): emits exactly b·(b-1)/2 rows instead of
    # the b² a naive double explode would, with x < y by construction.
    sorted_b = baskets.select(F.array_sort("_items").alias("_s"))
    pc = (
        sorted_b.select(
            F.posexplode("_s").alias("_p", "part_x"), F.col("_s")
        )
        .select(
            "part_x",
            F.explode(
                F.slice(F.col("_s"), F.col("_p") + 2, F.size("_s"))
            ).alias("part_y"),
        )
        .groupBy("part_x", "part_y")
        .agg(F.count("*").alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    from tmdataloader_spark.functions.ratio import round6_ratio

    joined = (
        pc.join(
            ic.select(F.col(item_col).alias("part_x"), F.col("_cnt").alias("n_x")),
            "part_x",
        )
        .join(
            ic.select(F.col(item_col).alias("part_y"), F.col("_cnt").alias("n_y")),
            "part_y",
        )
        .join(F.broadcast(n))
    )
    # integer-exact HALF_UP ratios (functions/ratio.py): every metric
    # is a ratio of exact counts, so plain round(double, 6) splits
    # between engines on exact .5 micro-unit rationals; lift's count
    # products go through decimal(38,0) so they cannot overflow int64
    scored = joined.select(
        "part_x",
        "part_y",
        "n_xy",
        "n_x",
        "n_y",
        round6_ratio("n_xy", "_n").alias("support"),
        round6_ratio("n_xy", "n_x").alias("conf_x_y"),
        round6_ratio("n_xy", "n_y").alias("conf_y_x"),
        round6_ratio(
            "CAST(n_xy AS DECIMAL(38,0)) * _n",
            "CAST(n_x AS DECIMAL(38,0)) * n_y",
        ).alias("lift"),
    )
    return scored.orderBy(
        F.col("n_xy").desc(), F.col("part_x"), F.col("part_y")
    ).limit(k)


def basket_rules_oracle_sql(
    table: str = "lineitem",
    k: int = 100,
    min_count: int = 2,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> str:
    """DuckDB twin of :func:`basket_rules` — identical integer
    HALF_UP ratio form for every metric (functions/ratio.py)."""
    from tmdataloader_spark.functions.ratio import round6_ratio_sql

    support = round6_ratio_sql("n_xy", "_n")
    conf_xy = round6_ratio_sql("n_xy", "n_x")
    conf_yx = round6_ratio_sql("n_xy", "n_y")
    lift = round6_ratio_sql(
        "CAST(n_xy AS DECIMAL(38,0)) * _n",
        "CAST(n_x AS DECIMAL(38,0)) * n_y",
    )
    return f"""
        WITH items AS (
          SELECT DISTINCT {basket_col} AS b, {item_col} AS i FROM {table}
        ),
        n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS _n FROM items),
        ic AS (SELECT i, CAST(count(*) AS BIGINT) AS cnt
               FROM items GROUP BY i),
        pc AS (
          SELECT a.i AS part_x, b.i AS part_y,
                 CAST(count(*) AS BIGINT) AS n_xy
          FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
          GROUP BY a.i, b.i
        ),
        j AS (
          SELECT part_x, part_y, n_xy,
                 ix.cnt AS n_x, iy.cnt AS n_y, _n
          FROM pc
          JOIN ic ix ON pc.part_x = ix.i
          JOIN ic iy ON pc.part_y = iy.i
          CROSS JOIN n
          WHERE n_xy >= {min_count}
        )
        SELECT part_x, part_y, n_xy, n_x, n_y,
               {support} AS support,
               {conf_xy} AS conf_x_y,
               {conf_yx} AS conf_y_x,
               {lift} AS lift
        FROM j
        ORDER BY n_xy DESC, part_x, part_y
        LIMIT {k}
    """
