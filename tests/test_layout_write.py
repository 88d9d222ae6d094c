"""Write-path tests proving the layout operators buy real scan
pruning: Z-order clustering tightens per-file min/max statistics, and
partitioned writes produce partition filters in the reader's plan."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tmdataloader_spark.llmdata.layout import zorder_layout


def _file_ranges(path, col):
    """(min, max) of ``col`` per parquet file under ``path``, via the
    footer statistics a pruning reader would consult."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    return ranges


def _coverage(ranges, domain):
    """Mean fraction of the domain each file's [min, max] spans —
    1.0 means every file could contain any value (no pruning), small
    means tight stats (good pruning)."""
    return sum((hi - lo + 1) / domain for lo, hi in ranges) / len(ranges)


def test_zorder_write_tightens_file_stats(spark, tmp_path):
    """After Z-order clustering, each output file covers a small slice
    of BOTH interleaved columns' domains; a random (unclustered)
    layout covers nearly all of each domain in every file. This is the
    property that lets a 100 TB reader skip files on either
    predicate."""
    n = 1 << 14
    side = 128  # x, y uniform on [0, 128)
    df = spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id") % side + side) % side,
    ).toDF("id", "x").withColumn(
        "y", (F.xxhash64(F.col("id") + 1) % side + side) % side
    )

    plain = str(tmp_path / "plain")
    df.repartition(16).write.parquet(plain)

    # 16 files = 4 leading key bits = each column's domain quartered
    clustered = str(tmp_path / "zorder")
    zorder_layout(
        df, ["x", "y"], {"x": (0, side - 1), "y": (0, side - 1)}, bits=7,
        num_files=16,
    ).write.parquet(clustered)

    covs = {}
    for col in ("x", "y"):
        cov_plain = _coverage(_file_ranges(plain, col), side)
        cov_z = _coverage(_file_ranges(clustered, col), side)
        # random layout: every file spans ~the whole domain
        assert cov_plain > 0.9, f"{col}: unclustered baseline unexpectedly tight"
        # z-order: each column individually much tighter...
        assert cov_z < 0.6, f"{col}: zorder coverage {cov_z:.2f}"
        covs[col] = cov_z
    # ...and the 2-D cell each file covers is a small fraction of the
    # plane (the quantity predicate-pruning actually sees)
    assert covs["x"] * covs["y"] < 0.2


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A study-partitioned warehouse write must yield PartitionFilters
    in a reader's scan — the study predicate never touches other
    studies' files (the Spark-native replacement for the reference's
    per-study partition tables, I2B2_PROCESS_MRNA_DATA.sql:127-128)."""
    df = spark.createDataFrame(
        [("GSE0", 1, 1.0), ("GSE0", 2, 2.0), ("GSE1", 3, 3.0)],
        "trial_name string, assay_id long, zscore double",
    )
    path = str(tmp_path / "wh")
    df.write.partitionBy("trial_name").parquet(path)

    q = spark.read.parquet(path).filter(F.col("trial_name") == "GSE0")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = q._jdf.queryExecution().explainString(jmode)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "trial_name" in pf, "partition filter did not reach the scan"
    assert q.count() == 2


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed by the same key into the same bucket count
    must join with ZERO Exchange operators — the write-once shuffle is
    amortized over every later join (the 100 TB co-location lever).
    A plain parquet re-write of the same data must show Exchanges, so
    the assertion is on bucketing, not on AQE luck."""
    from tmdataloader_spark.llmdata.layout import read_bucketed, write_bucketed

    # session warehouse dir is a static conf — use it and DROP the
    # managed tables afterwards (which deletes their files)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet").select("o_orderkey", "o_orderdate")
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey", "l_quantity")
    try:
        write_bucketed(orders, "b_orders", "o_orderkey", buckets=4)
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
            "o_orderkey", buckets=4,
        )
        j = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"), "o_orderkey"
        )
        # disable broadcast so the join would NEED a shuffle without
        # bucket co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        plan = j._jdf.queryExecution().explainString(jmode)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and the result is right (vs the plain join)
        expect = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert j.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_parquet_restores_file_count_and_rows(spark, tmp_path):
    """50 tiny ingest files compact to the byte-budgeted count with
    identical row content; sort_col tightens footer min/max ranges so
    future scans prune."""
    from tmdataloader_spark.llmdata.layout import compact_parquet, table_manifest

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    li.repartition(50).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 50
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    n = compact_parquet(spark, src, dst, target_bytes=total // 2, sort_col="l_orderkey")
    files = glob.glob(f"{dst}/*.parquet")
    # dir listing counts _SUCCESS/.crc alongside the parquet bytes, so
    # the byte-budgeted count can come out one above the parquet-only
    # estimate — the property is consolidation, not an exact quotient
    assert 2 <= n <= 4 and len(files) == n
    assert spark.read.parquet(dst).count() == li.count()
    # sorted rewrite -> disjoint-ish key ranges across files
    man = table_manifest(dst)
    assert sum(m["rows"] for m in man) == li.count()
    ranges = sorted(m["columns"]["l_orderkey"] for m in man)
    assert ranges[0][1] <= ranges[1][0], "range-sorted files overlap fully"


def test_epoch_shuffle_is_deterministic_and_seed_sensitive(spark):
    """Same seed → identical order and shard assignment on any input
    partitioning (the resumability contract); different seed → a
    genuinely different permutation."""
    from tmdataloader_spark.llmdata.layout import epoch_shuffle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id"
    )

    def order(df, seed, parts):
        out = epoch_shuffle(df.repartition(parts), seed=seed, n_shards=4)
        return [(r.shard, r.shuffle_key, r.doc_id) for r in out.collect()]

    a = sorted(order(docs, 7, 2))
    b = sorted(order(docs, 7, 13))
    assert a == b, "epoch order depends on input partitioning"
    c = sorted(order(docs, 8, 2))
    assert [x[2] for x in a] != [x[2] for x in c] or len(a) < 2
    # hash-shard balance: multinomial concentration, generous bound
    import collections

    by_shard = collections.Counter(s for s, _, _ in a)
    n, k = len(a), 4
    assert set(by_shard) == set(range(k))
    assert max(by_shard.values()) < 2 * n / k


def test_epoch_shuffle_plan_one_hash_shuffle_no_python(spark):
    """One codegen projection + one hash repartition + in-partition
    sort — no range sampling, no global sort, no Python boundary."""
    from tmdataloader_spark.llmdata.layout import epoch_shuffle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = epoch_shuffle(docs, n_shards=8)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(jmode)
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning" in plan
    assert "rangepartitioning" not in plan
    for bad in ("EvalPython", "MapInPandas", "Join"):
        assert bad not in plan
