"""Skyline (Pareto-frontier) query: the rows not dominated on two
maximize-dimensions.

The multi-criteria "best suppliers / best documents" primitive
(Börzsönyi et al., "The Skyline Operator", ICDE 2001) — a point is
dominated iff another point is >= on both dimensions and > on at
least one; the skyline is every non-dominated point.  Extension
beyond the reference surface, same counting regime as the engine's
ranking family.

Scale shape (the two-phase reduction that makes 2-D skylines
shuffle-cheap):

1. collapse to ONE row per distinct x — ``groupBy(x).max(y)``
   (map-side combined, output |distinct x| rows, never data-sized);
   every point below its x-group maximum is dominated by that
   maximum, so nothing else can be on the frontier.
2. one window over those |distinct x| rows computes ``max(y)`` over
   STRICTLY GREATER x (RANGE 1 FOLLOWING .. UNBOUNDED) — a per-x
   maximum survives iff no greater-x group reaches its y.  The
   window is single-partition by construction, but its input is the
   distinct-x AGGREGATE (cardinality of a key's value set, e.g. a
   few thousand distinct order-counts at 100 TB), not the data.
3. an equi-join on (x, y) recovers every input row sitting exactly
   on a surviving (x, max-y) corner — per-x ties all surface.

All comparisons are exact longs, so the frontier is partition-order
invariant with no float regime needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows of ``df`` on the maximize/maximize Pareto frontier of
    (``x_col``, ``y_col``).  Both columns must be exact (integer)
    types — the determinism contract; cast/quantize floats first.
    Returns the input rows (all columns) that are non-dominated,
    including ties sharing a frontier corner."""
    perx = df.groupBy(x_col).agg(F.max(y_col).alias("_my"))
    w = (
        Window.orderBy(F.col(x_col))
        .rangeBetween(1, Window.unboundedFollowing)
    )
    front = (
        perx.withColumn("_better", F.max("_my").over(w))
        .filter(F.col("_better").isNull() | (F.col("_my") > F.col("_better")))
        .select(x_col, F.col("_my").alias(y_col))
    )
    return df.join(front, [x_col, y_col])


def supplier_frontier(lineitem: DataFrame) -> DataFrame:
    """Suppliers on the (order-breadth, volume) Pareto frontier:
    x = distinct orders served, y = total quantity shipped (exact —
    quantities are integral; each value casts to long BEFORE the sum
    so the aggregate is an exact long, no float-sum hazard).
    Returns ``(l_suppkey, n_orders, total_qty)``."""
    agg = lineitem.groupBy("l_suppkey").agg(
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    )
    # skyline() reads its input twice (the per-x aggregate AND the
    # tie-recovering equi-join); without a lineage break the
    # data-sized count_distinct aggregate above is planned — and
    # executed — twice, one full lineitem pass per side. The frame is
    # |suppliers|-sized, so materializing it once is control-plane
    # cost at any scale (lazy-localCheckpoint multi-consumer regime,
    # cf. operators/association.py).
    agg = agg.localCheckpoint(eager=False)
    return skyline(agg, "n_orders", "total_qty").select(
        "l_suppkey", "n_orders", "total_qty"
    )


def supplier_frontier_oracle_sql(table: str = "lineitem") -> str:
    """DuckDB twin of :func:`supplier_frontier` — identical two-phase
    reduction and strictly-greater RANGE frame."""
    return f"""
        WITH agg AS (
          SELECT l_suppkey,
                 CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS total_qty
          FROM {table} GROUP BY l_suppkey
        ),
        perx AS (
          SELECT n_orders, max(total_qty) AS _my FROM agg
          GROUP BY n_orders
        ),
        front AS (
          SELECT n_orders, _my AS total_qty
          FROM (
            SELECT n_orders, _my,
                   max(_my) OVER (
                     ORDER BY n_orders
                     RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
                   ) AS _better
            FROM perx
          )
          WHERE _better IS NULL OR _my > _better
        )
        SELECT a.l_suppkey, a.n_orders, a.total_qty
        FROM agg a
        JOIN front f
          ON a.n_orders = f.n_orders AND a.total_qty = f.total_qty
    """
