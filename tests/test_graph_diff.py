"""Unit tests for operators/graph.py (integer-exact PageRank) and
operators/diff.py (snapshot CDC) — invariants the oracle row can't
express: rank-mass bounds, sink handling, CDC classification on
hand-built frames, and option/validation behavior."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdataloader_spark.operators.diff import snapshot_diff
from tmdataloader_spark.operators.graph import (
    _INIT,
    _TELEPORT,
    bipartite_edges,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_cycle_is_uniform(spark):
    # a -> b -> c -> a: perfectly symmetric, every node keeps mass 1.0
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = {r["node"]: r["rank_micro"] for r in pagerank(e, iters=5).collect()}
    assert rows == {"a": _INIT, "b": _INIT, "c": _INIT}


def test_pagerank_sink_gets_teleport_floor(spark):
    # b and c both point at a; nothing points at b or c -> after the
    # first iteration b and c sit exactly at the teleport floor
    e = _edges(spark, [("b", "a"), ("c", "a"), ("a", "a")])
    rows = {r["node"]: r["rank_micro"] for r in pagerank(e, iters=3).collect()}
    assert rows["b"] == _TELEPORT
    assert rows["c"] == _TELEPORT
    assert rows["a"] > rows["b"]


def test_pagerank_mass_bounded(spark):
    # floors only LOSE mass: total rank never exceeds n * _INIT, and
    # every node keeps at least the teleport floor
    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("d", "a")],
    )
    rows = pagerank(e, iters=4).collect()
    total = sum(r["rank_micro"] for r in rows)
    assert total <= len(rows) * _INIT
    assert all(r["rank_micro"] >= _TELEPORT for r in rows)


def test_bipartite_edges_symmetric(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    e = bipartite_edges(orders, li)
    fwd = e.filter(F.col("src").startswith("c")).count()
    rev = e.filter(F.col("src").startswith("s")).count()
    assert fwd == rev and fwd > 0


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id int, s string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 30), (4, "D", 40), (5, "e", 50)],
        "id int, s string, v int",
    )
    got = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    # 1 only in old; 2 identical (filtered); 3 null->30 (null-safe
    # compare flags it); 4 cased differently; 5 only in new
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a")], "id int, s string")
    new = spark.createDataFrame([(1, "a")], "id int, s string")
    out = snapshot_diff(old, new, keys=["id"], include_unchanged=True).collect()
    assert [(r["id"], r["change_type"]) for r in out] == [(1, "unchanged")]
    assert snapshot_diff(old, new, keys=["id"]).count() == 0


def test_snapshot_diff_missing_compare_col_raises(spark):
    old = spark.createDataFrame([(1, "a")], "id int, s string")
    new = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="absent from new snapshot"):
        snapshot_diff(old, new, keys=["id"], compare_cols=["s"])


def test_snapshot_diff_composite_key(spark):
    old = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], "a int, b int, s string")
    new = spark.createDataFrame([(1, 1, "x"), (1, 3, "z")], "a int, b int, s string")
    got = {
        (r["a"], r["b"]): r["change_type"]
        for r in snapshot_diff(old, new, keys=["a", "b"]).collect()
    }
    assert got == {(1, 2): "removed", (1, 3): "added"}


# ---- triangle_counts --------------------------------------------------

from tmdataloader_spark.operators.graph import triangle_counts  # noqa: E402


def _int_edges(spark, pairs):
    # canonical form the operator contracts for: src < dst, distinct
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_counts_k4_minus_edge(spark):
    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}
    e = _int_edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])
    got = {r["node"]: r["tri_cnt"] for r in triangle_counts(e).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_star_has_none(spark):
    # a hub with many spokes but no spoke-spoke edges: the skew case
    # degree orientation exists for — zero triangles, zero rows
    e = _int_edges(spark, [(1, k) for k in range(2, 12)])
    assert triangle_counts(e).count() == 0


def test_triangle_counts_two_disjoint_triangles(spark):
    e = _int_edges(spark, [(1, 2), (1, 3), (2, 3), (10, 20), (10, 30), (20, 30)])
    got = {r["node"]: r["tri_cnt"] for r in triangle_counts(e).collect()}
    assert got == {n: 1 for n in (1, 2, 3, 10, 20, 30)}


def test_triangle_counts_k5_complete(spark):
    # K5: C(4,2)=6 triangles per node, 10 total triangles
    nodes = range(1, 6)
    e = _int_edges(
        spark, [(a, b) for a in nodes for b in nodes if a < b]
    )
    got = {r["node"]: r["tri_cnt"] for r in triangle_counts(e).collect()}
    assert got == {n: 6 for n in nodes}


# ---- common_neighbors --------------------------------------------------

from tmdataloader_spark.operators.graph import common_neighbors  # noqa: E402


def test_common_neighbors_path_graph(spark):
    # path 1-2-3-4: (1,3) share {2}, (2,4) share {3}, (1,4) share none
    e = _int_edges(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        (r["node_a"], r["node_b"]): r["common_cnt"]
        for r in common_neighbors(e, min_common=1).collect()
    }
    assert got == {(1, 3): 1, (2, 4): 1}


def test_common_neighbors_excludes_existing_edges(spark):
    # triangle 1-2-3: every pair is adjacent -> no candidates at all
    e = _int_edges(spark, [(1, 2), (1, 3), (2, 3)])
    assert common_neighbors(e, min_common=1).count() == 0


def test_common_neighbors_min_common_prunes(spark):
    # 1 and 4 share {2, 3}; threshold 3 drops them, 2 keeps them
    e = _int_edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    assert common_neighbors(e, min_common=3).count() == 0
    got = {
        (r["node_a"], r["node_b"]): r["common_cnt"]
        for r in common_neighbors(e, min_common=2).collect()
    }
    assert got == {(1, 4): 2, (2, 3): 2}


def test_common_neighbors_neighbor_cap_deterministic(spark):
    # star center 1 with spokes 2..6: uncapped gives C(5,2)=10 pairs;
    # cap=3 keeps neighbors {2,3,4} (id order) -> C(3,2)=3 pairs
    e = _int_edges(spark, [(1, k) for k in range(2, 7)])
    assert common_neighbors(e, min_common=1).count() == 10
    capped = common_neighbors(e, min_common=1, neighbor_cap=3)
    got = sorted((r["node_a"], r["node_b"]) for r in capped.collect())
    assert got == [(2, 3), (2, 4), (3, 4)]


def test_skyline_dominance(spark):
    from tmdataloader_spark.operators.skyline import skyline

    rows = [
        ("a", 5, 10),  # frontier (max x)
        ("b", 5, 10),  # tie on the same corner -> also frontier
        ("c", 5, 9),   # dominated within x-group by a/b
        ("d", 3, 20),  # frontier (higher y than any x>3)
        ("e", 3, 15),  # dominated by d
        ("f", 4, 10),  # dominated by a (x 5>=4, y 10>=10, strict on x)
        ("g", 1, 20),  # dominated by d (y equal, x strictly less)
    ]
    df = spark.createDataFrame(rows, "id string, x long, y long")
    got = sorted(r.id for r in skyline(df, "x", "y").collect())
    assert got == ["a", "b", "d"]


def test_skyline_single_point(spark):
    from tmdataloader_spark.operators.skyline import skyline

    df = spark.createDataFrame([("a", 1, 1)], "id string, x long, y long")
    assert [r.id for r in skyline(df, "x", "y").collect()] == ["a"]
