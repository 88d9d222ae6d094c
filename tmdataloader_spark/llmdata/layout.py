"""Multi-dimensional data layout (Z-order) for 100 TB parquet tables.

At cluster scale the dominant cost of most queries is the SCAN, and
the scan is only cheap if file-level min/max statistics let the
reader skip files. Sorting by one column optimizes exactly one
predicate; interleaving the bits of several quantized columns
(Morton / Z-order) gives every interleaved column partial locality,
so parquet row-group stats prune on ANY of them — the technique
Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``.

Everything here is pure per-row integer arithmetic (shift/mask/or) —
no shuffle, no UDF, bit-identical across engines, so a DuckDB oracle
can verify the key and a Trino reader computes the same layout.
The only shuffle is the final ``repartitionByRange`` that actually
clusters rows before the write, which is the point of the exercise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column in ``[lo, hi]`` onto ``[0, 2**bits)`` with
    pure integer arithmetic: ``(x - lo) * 2**bits // (hi - lo + 1)``,
    clamped. Integer-exact — identical in any engine with 64-bit
    integer division (floating-point quantizers disagree at cell
    boundaries across engines).

    Bounds are caller-supplied (domain knowledge or a prior stats
    scan) so the key is a pure expression; recomputing bounds in-plan
    would make every row's key depend on a global aggregate and the
    layout unstable under appends."""
    span = hi - lo + 1
    a = (col.cast("long") - F.lit(lo)) * F.lit(1 << bits)
    # exact floor division: subtracting pmod makes the numerator an
    # exact multiple of span, so the double division is exact — `/` on
    # longs is double division in Spark and raw floor(a/span) could
    # misround near cell boundaries on other engines
    q = ((a - F.pmod(a, F.lit(span))) / F.lit(span)).cast("long")
    return F.least(F.greatest(q, F.lit(0)), F.lit((1 << bits) - 1))


def zorder_key(quantized: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each already-quantized
    column into one Morton key: bit ``b`` of column ``c`` lands at
    position ``b * ncols + c``. ``ncols * bits`` must be ≤ 63.

    The expression is a flat OR-chain of shift/mask terms — whole-stage
    codegen folds it into straight-line long arithmetic."""
    ncols = len(quantized)
    if ncols * bits > 63:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds a 63-bit key")
    key = F.lit(0).cast("long")
    for c, col in enumerate(quantized):
        for b in range(bits):
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + bit * F.lit(1 << (b * ncols + c))
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[int, int]],
    bits: int = 8,
    num_files: int | None = None,
    key_name: str = "zkey",
) -> DataFrame:
    """Attach the Z-order key and range-partition rows by it so a
    subsequent ``.write.parquet`` emits files whose per-column min/max
    stats are tight on EVERY interleaved column.

    ``repartitionByRange`` samples the key distribution (AQE-sized
    reservoir) and assigns contiguous key ranges to partitions — the
    one shuffle this operator performs, and the one that buys scan
    pruning for every future reader. ``num_files`` defaults to the
    session shuffle parallelism."""
    # quantize into attributes first: zorder_key references each input
    # once per interleaved bit, so inlining the quantize expression
    # replicates its tree bits× per column (plan bloat + per-row
    # re-evaluation wherever codegen CSE misses). CollapseProject will
    # not re-inline a non-cheap alias referenced more than once.
    qnames = [f"_zq_{c}" for c in cols]
    qcols = df.select(
        "*", *[quantize(F.col(c), *bounds[c], bits).alias(n)
               for c, n in zip(cols, qnames)]
    )
    keyed = qcols.withColumn(
        key_name, zorder_key([F.col(n) for n in qnames], bits)
    ).drop(*qnames)
    if num_files:
        return keyed.repartitionByRange(num_files, key_name)
    return keyed.repartitionByRange(key_name)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``
    — Spark's answer to co-located joins (Hive bucketing spec): two
    tables bucketed by the same key into the same bucket count
    join/aggregate WITHOUT a shuffle, because each bucket file pair is
    already co-partitioned; a sorted bucket also skips the sort of a
    sort-merge join.

    At 100 TB this is THE lever for repeatedly-joined tables (facts ×
    sample mapping, postings × postings): the shuffle is paid once at
    write time and amortized over every subsequent join — the same
    reasoning as the reference's physical indexes, re-expressed as
    Spark table layout. ``tests/test_layout_write.py`` asserts the
    shuffle-free plan mechanically (no Exchange over either scan).

    Bucketing requires a managed/metastore table (``saveAsTable``) —
    plain ``.parquet(path)`` writes carry no bucket metadata."""
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a bucketed table back (plain ``spark.table`` — the bucket
    spec rides along from the catalog; kept as a named function so
    call sites document that the frame carries co-partitioning)."""
    return spark.table(table)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction: rewrite ``src_path`` into
    ``ceil(total_bytes / target_bytes)`` files at ``dst_path``.

    The small-files problem is THE recurring operational failure of
    streaming/incremental ingestion at scale (every micro-batch
    leaves a file; a year later the NameNode/listing dominates query
    time) — compaction is the nightly job that restores scan
    efficiency. File count derives from the actual input byte size
    (filesystem listing — metadata, not data), the one shuffle is the
    repartition that buys it, and ``sort_col`` optionally range-sorts
    during the rewrite so footer min/max stats prune future scans
    (compose with :func:`zorder_layout` for multi-column pruning).

    Returns the target file count."""
    import math

    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_path)
    out = (
        df.repartitionByRange(n_files, sort_col)
        if sort_col
        else df.repartition(n_files)
    )
    out.write.mode("overwrite").parquet(dst_path)
    return n_files


def table_manifest(path: str) -> list[dict]:
    """Per-file manifest from parquet FOOTERS (no data read): rows,
    bytes, and per-column min/max — what a pruning reader consults
    and what an ops dashboard graphs to decide when to compact or
    re-cluster. Pure pyarrow metadata access; returns a list of
    dicts sorted by file name."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    out = []
    for f in sorted(_glob.glob(_os.path.join(path, "*.parquet"))):
        md = _pq.ParquetFile(f).metadata
        schema = md.schema.to_arrow_schema()
        stats = {}
        for ci, name in enumerate(schema.names):
            los, his = [], []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is not None and st.has_min_max:
                    los.append(st.min)
                    his.append(st.max)
            if los:
                stats[name] = (min(los), max(his))
        out.append(
            {
                "file": _os.path.basename(f),
                "rows": md.num_rows,
                "bytes": _os.path.getsize(f),
                "columns": stats,
            }
        )
    return out


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle — the step between
    curation/mixing and shard writing that decorrelates document
    order from ingest order (crawl order is heavily clustered by
    host/time, and a model trained in ingest order sees highly
    non-IID batches).

    Every row gets ``shuffle_key = md5("ep:<seed>:" || id)``; the
    reproducible epoch order IS the ascending key order, and
    changing ``seed`` re-derives an independent permutation —
    ``rand()`` is banned here like everywhere else in the engine
    (resuming a failed epoch must land the same order).

    With ``n_shards``, rows also get ``shard = first 60 hash bits
    mod n_shards`` — hash sharding, NOT range sharding, so the
    assignment is exact and partitioning-independent (Spark's
    ``repartitionByRange`` SAMPLES the key space; two runs over
    different input layouts may split ranges differently, which
    breaks resumability). Shard sizes concentrate tightly
    (multinomial, CV ≈ 1/sqrt(rows/shards)).

    100 TB shape: one codegen projection + exactly one hash
    shuffle (``repartition(n_shards, shard)``) with an in-partition
    sort — no global sort, no sampling pass, no Python.  Writers
    emit ``partitionBy(shard)``-style files a dataloader can stream
    in key order per shard.
    """
    key = F.md5(F.concat(F.lit(f"ep:{seed}:"), F.col(id_col).cast("string")))
    out = df.withColumn("shuffle_key", key)
    if n_shards is None:
        return out.sortWithinPartitions("shuffle_key")
    shard = (
        F.conv(F.substring("shuffle_key", 1, 15), 16, 10).cast("long")
        % F.lit(n_shards)
    ).cast("long")
    return (
        out.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key")
    )
