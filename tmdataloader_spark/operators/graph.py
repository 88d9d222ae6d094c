"""Iterative graph analytics over DataFrame edge lists — PageRank in
exact integer arithmetic (extension; the reference is batch-relational
only, but a training-data pipeline ranks pages/hosts for crawl-quality
weighting — the original use of PageRank, Brin & Page 1998).

Scale shape (the only one that survives 100 TB of edges): the edge
list NEVER collects to the driver and never materializes per-node
adjacency arrays. Each iteration is

    ranks ⋈ out-degree-annotated edges (hash join on src)
    → per-edge contribution (integer div)
    → groupBy dst sum (one shuffle, map-side combined)
    → left join back onto the node set (teleport floor for sinks)

so cost is O(iters) shuffles of the edge list, the canonical
Pregel/GraphX plan re-expressed relationally.  Per-iteration ranks
are cached and ``localCheckpoint``-ed to break lineage (same regime
as ``llmdata.dedup.dedup_clusters`` label propagation — without it
the plan doubles per round and the optimizer re-derives every prior
iteration).

Determinism: ranks are micro-units (``long``), contributions are
integer floor-division, damping is the exact rational 85/100 applied
as ``(85 * x) div 100`` — every engine that implements 64-bit integer
arithmetic reproduces the result bit-for-bit regardless of partition
count or join order (no float sums anywhere; the r04 sessionize
lesson applied from the start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: initial node mass, micro-units of 1.0
_INIT = 1_000_000
#: damping numerator/denominator (d = 0.85) and the teleport floor
#: (1 - d) * _INIT — exact integers, no float anywhere
_D_NUM, _D_DEN = 85, 100
_TELEPORT = _INIT - (_D_NUM * _INIT) // _D_DEN  # 150_000


def bipartite_edges(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Customer↔supplier interaction graph from the order log: one
    edge per DISTINCT (customer, supplier) trading pair, in BOTH
    directions so the bipartite graph is strongly connected wherever
    the undirected graph is (standard symmetrization; with only c→s
    edges every supplier would be a rank sink).

    Plan: one equi-join orders⋈lineitem on the order key (the
    fact-table key both sides are naturally clustered on), one
    distinct on the pair — then the reversal is a projection, not a
    second scan."""
    pairs = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    return pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def pagerank(
    edges: DataFrame, iters: int = 4, checkpoint_every: int = 8
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list
    ``(src, dst)``; returns ``(node, rank_micro)`` for every node
    with at least one out-edge (with symmetrized edges: every node).

    Per iteration each node sends ``rank div out_degree`` along each
    out-edge and receives ``teleport + (85 * Σ incoming) div 100``.
    Nodes nothing points at keep the teleport floor via the left
    join.  Mass lost to integer floors is NOT redistributed — the
    exactness contract (bit-identical across engines/partitionings)
    is worth more to a data-pipeline ranking signal than the ~1e-6
    normalization drift, and the oracle replays the identical
    algebra.

    Physical shape: the rank lineage is LINEAR (each iteration feeds
    exactly the next), so iterations compose LAZILY into one DAG and
    one job executes all of them under AQE — which matters twice:
    the identical degree-annotated edge subplan each round consumes
    dedupes via ReusedExchange instead of a persisted cache, and
    AQE's runtime stats convert the node-sized rank joins to
    broadcasts where they fit.  Materializing per round through
    ``persist``/``localCheckpoint`` was measured ~4x slower here
    because those paths execute the NON-adaptive plan (no runtime
    broadcast conversion, no partition coalescing) — so the operator
    stays lazy and leak-free by construction (nothing to unpersist).
    ``checkpoint_every`` still bounds plan depth for LONG runs
    (eager ``localCheckpoint`` every N rounds, the dedup_clusters
    regime); the default never triggers for the small fixed
    iteration counts analytics use, and at 100 TB — where one
    iteration is minutes of real work dwarfing any plan overhead —
    periodic checkpoints are the right trade again."""
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # out-degree folded onto each edge once; per-iteration consumers
    # of this identical subplan collapse to ReusedExchange
    ann = edges.join(deg, "src").select("src", "dst", "out_deg")
    nodes = deg.select(F.col("src").alias("node"))
    ranks = nodes.select("node", F.lit(_INIT).cast("long").alias("rank_micro"))
    for i in range(iters):
        inc = (
            ann.join(ranks, ann["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("rank_micro div out_deg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = nodes.join(inc, nodes["node"] == inc["dst"], "left").select(
            "node",
            (
                F.lit(_TELEPORT)
                + F.expr(f"({_D_NUM} * coalesce(inc, 0L)) div {_D_DEN}")
            ).cast("long").alias("rank_micro"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_oracle_sql(iters: int = 4) -> str:
    """DuckDB twin of :func:`bipartite_edges` + :func:`pagerank`:
    the fixed iterations unrolled as CTEs (the kmeans/BPE oracle
    pattern) with the identical integer algebra (``//`` floor
    division on BIGINT matches Spark's ``div``)."""
    ctes = [
        """pairs AS (
             SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                             's' || CAST(l_suppkey AS VARCHAR) AS b
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           )""",
        """edges AS (
             SELECT a AS src, b AS dst FROM pairs
             UNION ALL
             SELECT b AS src, a AS dst FROM pairs
           )""",
        """deg AS (
             SELECT src, CAST(count(*) AS BIGINT) AS out_deg
             FROM edges GROUP BY src
           )""",
        f"""r0 AS (
             SELECT src AS node, CAST({_INIT} AS BIGINT) AS rank_micro
             FROM deg
           )""",
    ]
    for i in range(iters):
        ctes.append(
            f"""i{i} AS (
              SELECT e.dst,
                     CAST(sum(r.rank_micro // d.out_deg) AS BIGINT) AS inc
              FROM edges e
                JOIN deg d ON e.src = d.src
                JOIN r{i} r ON e.src = r.node
              GROUP BY e.dst
            )"""
        )
        ctes.append(
            f"""r{i + 1} AS (
              SELECT n.node,
                     CAST({_TELEPORT}
                          + ({_D_NUM} * COALESCE(i.inc, 0)) // {_D_DEN}
                          AS BIGINT) AS rank_micro
              FROM (SELECT src AS node FROM deg) n
                LEFT JOIN i{i} i ON n.node = i.dst
            )"""
        )
    body = ",\n".join(ctes)
    return f"WITH {body}\nSELECT node, rank_micro FROM r{iters}"


def cooccurrence_edges(lineitem: DataFrame, year: int = 1995) -> DataFrame:
    """Part co-purchase graph: one canonical undirected edge
    ``(src < dst)`` per DISTINCT pair of parts shipped in the same
    order during ``year`` (the year filter is the natural partition-
    pruning predicate a 100 TB event log would carry — it reaches the
    parquet scan as a pushed filter).

    Plan: one self-equi-join of the pruned two-column projection on
    the order key with the ``<`` canonicalization INSIDE the join
    condition (no post-join filter to reorder), then one distinct.
    Pair fan-out is bounded by order size (TPC-H ≤ 7 lineitems), not
    corpus size."""
    li = lineitem.filter(F.year("l_shipdate") == year).select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation ``(node, tri_cnt)`` over a
    canonical undirected edge list (``src < dst``, deduplicated) —
    the local-clustering / spam-farm signal of a link corpus
    (extension; subgraph counting has no reference analog).

    Scale shape — DEGREE ORIENTATION (Schank/Wagner 2005; the
    MapReduce formulation of Suri & Vassilvitskii, WWW'11): each
    undirected edge is directed from its lower-(degree, id) endpoint
    to the higher one, which bounds every node's out-degree by
    O(sqrt(m)) regardless of how skewed the raw degree distribution
    is — the wedge join below fans out per HIGH-degree hub not by
    deg² (a 10M-follower hub would otherwise emit 10¹⁴ wedges) but
    by the sqrt(m) cap. Triangles are then wedges (u→v, u→w) closed
    by an oriented edge (v→w): two equi-joins + one count
    aggregation, all map-side-combinable, zero driver state. Every
    quantity is integer, so the result is bit-identical across
    engines and partitionings. The DuckDB oracle replays the
    id-ordered 3-way self-join instead — orientation changes WHICH
    join finds a triangle, never the triangle set."""
    # one pass over the edge list (explode census), not a two-branch
    # unionAll whose second branch re-plans the edge build
    deg = (
        edges.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ann = edges.join(
        deg.select(F.col("node").alias("src"), F.col("deg").alias("sdeg")), "src"
    ).join(
        deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg")), "dst"
    )
    src_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    oriented = ann.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(src_first, F.col("ddeg")).otherwise(F.col("sdeg")).alias("vdeg"),
    )
    # oriented feeds BOTH wedge-join sides AND the closing join — a
    # lazy localCheckpoint (materialized once, at first action)
    # collapses the 3x-expanded subplan (edge build + degree join
    # re-derived per consumer; ~139 Exchanges pre-AQE without it,
    # the dedup_clusters lineage-break regime with it)
    oriented = oriented.localCheckpoint(eager=False)
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u"))
        & (
            (F.col("x.vdeg") < F.col("y.vdeg"))
            | (
                (F.col("x.vdeg") == F.col("y.vdeg"))
                & (F.col("x.v") < F.col("y.v"))
            )
        ),
    ).select(
        F.col("x.u").alias("a"), F.col("x.v").alias("b"), F.col("y.v").alias("c")
    )
    closing = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    # corner census via ONE explode over the triangle rows — the
    # 3-branch unionAll form planned the wedge+closing join pipeline
    # three times (ReusedExchange dedupes only the shuffle WRITES; the
    # sort-merge work above them still ran per branch: 26 Exchanges /
    # 3 join pipelines → 1, A/B-verified faster at every iteration)
    members = tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return members.groupBy("node").agg(F.count("*").alias("tri_cnt"))


def triangle_oracle_sql(year: int = 1995) -> str:
    """DuckDB twin of :func:`cooccurrence_edges` +
    :func:`triangle_counts`: the id-ordered 3-way self-join over the
    canonical edge list. With ``src < dst`` canonical edges, the
    join ``(a,b)(b,c)(a,c)`` enumerates each triangle ``a<b<c``
    exactly once — the same set the degree-oriented wedge join
    finds, so per-node participation counts agree exactly (all
    integers, no float anywhere)."""
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) = {year}
),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
t AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1
    JOIN e e2 ON e2.src = e1.dst
    JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
n AS (
  SELECT a AS node FROM t
  UNION ALL SELECT b AS node FROM t
  UNION ALL SELECT c AS node FROM t
)
SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt FROM n GROUP BY node
"""


def common_neighbors(
    edges: DataFrame, min_common: int = 2, neighbor_cap: int | None = None
) -> DataFrame:
    """Link prediction by common-neighbor counting: for every
    NON-adjacent canonical pair ``(node_a < node_b)`` sharing at
    least ``min_common`` neighbors, emit ``(node_a, node_b,
    common_cnt)`` — the candidate-pair generator for recommender /
    graph-ML training data (Liben-Nowell & Kleinberg 2003's
    strongest simple predictor).

    Plan: symmetrize once (projection, not a second scan), wedge
    equi-join on the shared center with the ``<`` canonicalization
    inside the join condition, map-side-combinable count, LEFT ANTI
    against the existing edge list. All-integer — bit-identical
    under any partitioning.

    Scale: unlike triangle counting, the deg² wedge fan-out through
    a hub is INHERENT here (a hub's neighbor pairs ARE candidate
    links); the industrial mitigation is ``neighbor_cap`` — keep
    each center's first ``cap`` neighbors in a deterministic
    (neighbor-id) order via one row_number window partitioned by
    center (bounded work per node, reproducible candidate set) —
    plus ``min_common`` pruning at the aggregate. The cap drops
    recall on super-hubs, which is the documented trade: a
    10M-follower account's pair set is noise for link prediction
    anyway."""
    from pyspark.sql import Window

    # the edge list feeds FIVE subplan sites (both symmetrized
    # projections, each wedge-join side through them, and the closing
    # anti-join); without a lineage break the whole edge build — for
    # the co-purchase graph, a lineitem self-join + distinct — is
    # re-planned and re-executed per site (10 lineitem scans in the
    # r14 before-plan). |E|-sized, the same materialization regime as
    # triangle_counts' oriented frame.
    edges = edges.localCheckpoint(eager=False)
    adj = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if neighbor_cap is not None:
        w = Window.partitionBy("src").orderBy("dst")
        adj = (
            adj.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= neighbor_cap)
            .drop("_rn")
        )
    n1, n2 = adj.alias("n1"), adj.alias("n2")
    pairs = n1.join(
        n2,
        (F.col("n1.src") == F.col("n2.src"))
        & (F.col("n1.dst") < F.col("n2.dst")),
    ).select(F.col("n1.dst").alias("node_a"), F.col("n2.dst").alias("node_b"))
    counts = pairs.groupBy("node_a", "node_b").agg(
        F.count("*").alias("common_cnt")
    )
    non_adjacent = counts.join(
        edges,
        (counts["node_a"] == edges["src"]) & (counts["node_b"] == edges["dst"]),
        "left_anti",
    )
    return non_adjacent.filter(F.col("common_cnt") >= min_common)


def common_neighbors_oracle_sql(year: int = 1995, min_common: int = 2) -> str:
    """DuckDB twin of :func:`cooccurrence_edges` +
    :func:`common_neighbors` (uncapped): symmetrize, wedge self-join
    with the same ``<`` canonicalization, count, anti-join existing
    edges via NOT EXISTS — integer counts, exact match."""
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) = {year}
),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS (
  SELECT src, dst FROM e
  UNION ALL
  SELECT dst AS src, src AS dst FROM e
),
c AS (
  SELECT n1.dst AS node_a, n2.dst AS node_b,
         CAST(count(*) AS BIGINT) AS common_cnt
  FROM adj n1 JOIN adj n2
    ON n1.src = n2.src AND n1.dst < n2.dst
  GROUP BY n1.dst, n2.dst
)
SELECT node_a, node_b, common_cnt FROM c
WHERE common_cnt >= {min_common}
  AND NOT EXISTS (
    SELECT 1 FROM e WHERE e.src = c.node_a AND e.dst = c.node_b
  )
"""
