"""statistic/profile.py: table profiling and order-insensitive
content checksums."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdataloader_spark.statistic.profile import (
    profile_table,
    row_hash,
    table_checksum,
)


def test_profile_basic(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 10.0), (3, "b", None), (3, "a", 9.0)],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 3
    assert prof["s"]["n_null"] == 1
    assert prof["s"]["n_distinct"] == 2
    # numeric min/max, not lexicographic: 2.5 < 9.0 < 10.0
    assert prof["v"]["min_value"] == "2.500000"
    assert prof["v"]["max_value"] == "10.000000"


def test_profile_approx_close_to_exact(spark, sf_dir):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    exact = {r["column"]: r["n_distinct"] for r in profile_table(o, ["o_custkey"]).collect()}
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_table(o, ["o_custkey"], approx=True).collect()
    }
    e, a = exact["o_custkey"], approx["o_custkey"]
    assert abs(a - e) <= max(2, 0.10 * e)


def test_checksum_order_and_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}", i / 7.0) for i in range(100)], "id long, s string, v double"
    )
    base = table_checksum(df).collect()[0]
    shuffled = table_checksum(
        df.repartition(13).orderBy(F.rand(42))
    ).collect()[0]
    assert (base["n_rows"], base["checksum"]) == (
        shuffled["n_rows"],
        shuffled["checksum"],
    )


def test_checksum_detects_single_cell_change(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    b = spark.createDataFrame([(1, "x"), (2, "z")], "id long, s string")
    ca = table_checksum(a).collect()[0]["checksum"]
    cb = table_checksum(b).collect()[0]["checksum"]
    assert ca != cb


def test_checksum_null_vs_text_null_differ(spark):
    a = spark.createDataFrame([(1, None)], "id long, s string")
    b = spark.createDataFrame([(1, "null")], "id long, s string")
    assert (
        table_checksum(a).collect()[0]["checksum"]
        != table_checksum(b).collect()[0]["checksum"]
    )


def test_checksum_empty_table_is_zero(spark):
    df = spark.createDataFrame([], "id long, s string")
    row = table_checksum(df).collect()[0]
    assert (row["n_rows"], row["checksum"]) == (0, 0)


def test_row_hash_in_range(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    vals = [r["h"] for r in df.select(row_hash(df).alias("h")).collect()]
    assert all(0 <= v < 2**60 for v in vals)
    assert len(set(vals)) == 50


def test_approx_quantile_rank_guarantee(spark, sf_dir):
    """approx_percentile's documented contract is a RANK error bound:
    with accuracy a, the returned value's rank is within n/a of the
    target rank.  Verify it against the exact distribution (the
    agreement check quantile_profile's docstring promises): for each
    p in {0.5, 0.9, 0.99} the fraction of rows <= approx value must
    lie within p ± (1/a + 1/n) — a VALUE comparison would be wrong
    for skewed data, the rank bound is the real guarantee."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = ev.count()
    acc = 1000
    ps = [0.5, 0.9, 0.99]
    approx = ev.select(
        F.expr(
            f"approx_percentile(value, array({', '.join(f'{p}D' for p in ps)}), {acc})"
        ).alias("q")
    ).collect()[0]["q"]
    eps = 1.0 / acc + 1.0 / n
    for p, v in zip(ps, approx):
        frac_le = ev.filter(F.col("value") <= v).count() / n
        frac_lt = ev.filter(F.col("value") < v).count() / n
        # target rank must be coverable by the returned value's rank
        # interval widened by the documented error
        assert frac_lt - eps <= p <= frac_le + eps, (p, v, frac_lt, frac_le)


def test_heavy_hitters_threshold(spark):
    from tmdataloader_spark.statistic.profile import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    hh = {r.value: (r.n, r.share) for r in heavy_hitters(df, "k", 0.3).collect()}
    assert hh == {"a": (6, 0.6), "b": (3, 0.3)}  # b exactly at threshold stays


def test_histogram_edges_and_degenerate(spark):
    from tmdataloader_spark.statistic.profile import histogram

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(11)] + [("flat", 5.0)] * 3,
        "k string, v double",
    )
    rows = histogram(df, "v", nbins=5, group_col="k").collect()
    g = {r.bin: (r.n, r.bin_lo) for r in rows if r.k == "g"}
    # width 2: bins 0..4 get 2 values each, max folds into last bin
    assert {b: n for b, (n, _) in g.items()} == {0: 2, 1: 2, 2: 2, 3: 2, 4: 3}
    assert g[0][1] == 0.0 and g[4][1] == 8.0
    flat = [r for r in rows if r.k == "flat"]
    assert len(flat) == 1 and flat[0].bin == 0 and flat[0].n == 3


def test_winsorize_clamps_tails(spark):
    from tmdataloader_spark.statistic.profile import winsorize

    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, v double")
    out = {r.id: r for r in winsorize(df, "v", lo=0.1, hi=0.9).collect()}
    # exact percentiles of 1..100: p10 = 10.9, p90 = 90.1
    assert out[0].winsorized == 10.9 and out[0].was_clipped
    assert out[99].winsorized == 90.1 and out[99].was_clipped
    assert out[49].winsorized == 50.0 and not out[49].was_clipped
    assert len(out) == 100  # every row kept, never filtered


def test_equi_depth_balanced_bins(spark):
    from tmdataloader_spark.statistic.profile import equi_depth_histogram

    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "v double")
    out = {r.bin: r.n for r in equi_depth_histogram(df, "v", nbins=4).collect()}
    # 100 continuous values over quartiles: 25 per bin
    assert out == {0: 25, 1: 25, 2: 25, 3: 25}


def test_equi_depth_skew_ties_collapse_low(spark):
    from tmdataloader_spark.statistic.profile import equi_depth_histogram

    # 90% identical values: ties at the cuts collapse into bin 0
    df = spark.createDataFrame(
        [(1.0,)] * 90 + [(float(v),) for v in range(2, 12)], "v double"
    )
    out = {r.bin: r.n for r in equi_depth_histogram(df, "v", nbins=4).collect()}
    assert out[0] == 90  # documented discrete-data caveat
    assert sum(out.values()) == 100


def test_diversity_profile_simpson_exact(spark):
    from tmdataloader_spark.statistic.profile import diversity_profile

    df = spark.createDataFrame(
        [("en", "a"), ("en", "a"), ("fr", None), (None, "b")],
        "lang string, src string",
    )
    got = {
        r.column: (r.n_values, r.n_distinct, r.simpson)
        for r in diversity_profile(df, ["lang", "src"]).collect()
    }
    # lang: en:2, fr:1 (null excluded) -> 1 - (4+1)/9 = 0.444444
    # src:  a:2, b:1               -> same
    assert got == {
        "lang": (3, 2, 0.444444),
        "src": (3, 2, 0.444444),
    }


def test_diversity_profile_uniform_vs_constant(spark):
    from tmdataloader_spark.statistic.profile import diversity_profile

    df = spark.createDataFrame(
        [(str(i % 4), "k") for i in range(8)], "u string, c string"
    )
    got = {r.column: r.simpson for r in diversity_profile(df, ["u", "c"]).collect()}
    assert got["u"] == 0.75  # uniform over 4 -> 1 - 4*(1/16)
    assert got["c"] == 0.0  # constant column -> no diversity


def test_value_histograms_matches_two_query_union(spark):
    """The r14 single-pipeline ``value_histograms`` must stay
    bit-equal to the two-query union it replaced (same bin/edge
    expressions, same 6dp rounds — only the plan changed: 2 scans /
    2 data-sized shuffles instead of 4 / 4).  Uses the driver
    testdata so degenerate/NULL behavior is exercised at gate
    cardinality."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.statistic.profile import (
        equi_depth_histogram,
        histogram,
        value_histograms,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ew = histogram(ev, "value", nbins=12, group_col="event_type").select(
        F.lit("equi_width").alias("kind"), "event_type", "bin", "bin_lo", "n"
    )
    ed = equi_depth_histogram(ev, "value", nbins=4, group_col="event_type").select(
        F.lit("equi_depth").alias("kind"),
        "event_type",
        "bin",
        F.lit(None).cast("double").alias("bin_lo"),
        "n",
    )
    union = ew.unionByName(ed)
    merged = value_histograms(ev, "value", 12, 4, "event_type").select(
        "kind", "event_type", "bin", "bin_lo", "n"
    )
    assert merged.exceptAll(union).count() == 0
    assert union.exceptAll(merged).count() == 0


def test_value_histograms_plan_two_scans_no_cartesian(spark):
    """The plan property the merge exists for: the events relation is
    scanned exactly twice (stats + cells; the union shape paid four),
    the stats frames broadcast, and nothing degenerates into a
    cartesian."""
    from tmdataloader_spark.statistic.profile import value_histograms

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = value_histograms(ev, "value", 12, 4, "event_type")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(jmode)
    assert plan.count("Scan parquet") == 2, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
