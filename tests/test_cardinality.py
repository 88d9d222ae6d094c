"""Deterministic HLL sketch (operators/cardinality.py): Spark/Python
hash-split agreement, register-exact stream-vs-batch reconciliation,
merge order-independence, and estimate accuracy vs exact distinct."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_spark_and_python_hash_split_agree(spark):
    """The (bucket, rank) split must be identical in both engines —
    the whole reconciliation contract rests on it."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.operators.cardinality import (
        _bucket_rank,
        _hash60,
        hll_registers,
    )

    ids = [str(i) for i in range(500)] + ["", "abc", "user-42"]
    df = spark.createDataFrame([(v, "k") for v in ids], "user_id string, event_type string")
    got = {
        (r.bucket, r.rank)
        for r in hll_registers(df, "event_type", "user_id", b=9).collect()
    }
    expected = {}
    for v in ids:
        bucket, rank = _bucket_rank(_hash60(v), 9)
        expected[bucket] = max(expected.get(bucket, 0), rank)
    assert got == set(expected.items())


def test_hll_estimate_within_rsd_of_exact(spark):
    """b=9 → rsd ≈ 4.6%; assert within 4 sigma on the events table."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.operators.cardinality import hll_cardinality

    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    est = {r.key: r.est_distinct for r in hll_cardinality(ev).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(4 * 0.046 * n, 3.0), (
            f"{k}: est {est[k]} vs exact {n}"
        )


def test_registers_merge_is_order_independent(spark):
    """Register state from A∪B equals max-merge of A's and B's
    registers — the mergeability that makes the sketch streamable."""
    from tmdataloader_spark.operators.cardinality import hll_registers

    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = ev.filter("event_id % 2 = 0")
    b_ = ev.filter("event_id % 2 = 1")

    def regmap(df):
        return {
            (r.key, r.bucket): r.rank for r in hll_registers(df).collect()
        }

    whole = regmap(ev)
    ra, rb = regmap(a), regmap(b_)
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole


def test_stream_registers_reconcile_with_batch(spark, tmp_path):
    """The streaming monitor's final estimate must equal the batch
    hll_estimate over the union of all micro-batches (registers are
    max-merged, so batching cannot change them), and the running
    filled_buckets must be non-decreasing per key."""
    from tmdataloader_spark.operators.cardinality import (
        cardinality_monitor_stream,
        hll_cardinality,
    )

    schema = "event_id long, user_id string, event_type string"
    batch1 = [(i, f"u{i % 37}", "click") for i in range(100)]
    batch2 = [(i + 100, f"u{i % 61}", "click") for i in range(100)] + [
        (999, "solo", "view")
    ]
    src = str(tmp_path / "card_in")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        cardinality_monitor_stream(stream)
        .writeStream.format("memory")
        .queryName("card_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from card_test").collect()
    finally:
        q.stop()

    # last emitted estimate per key == batch estimate over everything
    all_events = spark.createDataFrame(batch1 + batch2, schema)
    batch_est = {r.key: r.est_distinct for r in hll_cardinality(all_events).collect()}
    last = {}
    fills = {}
    for r in rows:  # memory sink preserves batch order
        last[r.key] = r.est_distinct
        fills.setdefault(r.key, []).append(r.filled_buckets)
    assert set(last) == set(batch_est)
    for k in last:
        # registers identical => same exact-integer Z => same division;
        # ln path only differs by libm-vs-JVM last-ulp
        assert last[k] == pytest.approx(batch_est[k], rel=1e-12)
        assert fills[k] == sorted(fills[k])


# ---- quantile monitor (fixed-histogram family sibling) ----


def test_fixed_histogram_matches_python_binning(spark):
    """Bin assignment is the same IEEE op sequence both engines run."""
    import math

    from tmdataloader_spark.statistic.profile import fixed_histogram

    lo, hi, nbins = 0.0, 100.0, 16
    width = (hi - lo) / nbins
    vals = [-5.0, 0.0, 6.25, 6.2499999, 50.0, 99.999999, 100.0, 250.0, 12.5]
    df = spark.createDataFrame([(v, "k") for v in vals], "value double, event_type string")
    got = {
        (r.bin): r.n
        for r in fixed_histogram(df, "value", lo, hi, nbins, "event_type").collect()
    }
    expected = {}
    for v in vals:
        if v < lo:
            b = -1
        elif v >= hi:
            b = nbins
        else:
            b = min(nbins - 1, int(math.floor((v - lo) / width)))
        expected[b] = expected.get(b, 0) + 1
    assert got == expected


def test_quantiles_from_counts_basics():
    from tmdataloader_spark.statistic.profile import quantiles_from_counts

    # 100 uniform values in [0,100) over 10 bins -> p50 = 50, p90 = 90
    counts = [10] * 10
    p50, p90 = quantiles_from_counts(counts, 0, 0, 0.0, 100.0, [0.5, 0.9])
    assert p50 == 50.0 and p90 == 90.0
    # all mass below lo pins to lo; empty histogram -> None
    assert quantiles_from_counts([0, 0], 5, 0, 0.0, 1.0, [0.5]) == [0.0]
    assert quantiles_from_counts([0, 0], 0, 0, 0.0, 1.0, [0.5]) == [None]
    # all mass above hi pins to hi
    assert quantiles_from_counts([0, 0], 0, 7, 0.0, 1.0, [0.5]) == [1.0]


def test_quantile_stream_reconciles_with_fixed_histogram(spark, tmp_path):
    """Final stream state counts == batch fixed_histogram over the
    union of micro-batches, and the emitted quantiles equal the
    shared estimator applied to the batch counts."""
    from tmdataloader_spark.statistic.profile import (
        fixed_histogram,
        quantiles_from_counts,
    )
    from tmdataloader_spark.streaming import quantile_monitor_stream

    schema = "event_id long, event_type string, value double"
    lo, hi, nbins = 0.0, 100.0, 20
    batch1 = [(i, "lat", float((7 * i) % 100)) for i in range(80)] + [
        (900, "lat", -3.0)
    ]
    batch2 = [(i + 100, "lat", float((11 * i) % 130)) for i in range(60)]
    src = str(tmp_path / "quant_in")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        quantile_monitor_stream(stream, lo=lo, hi=hi, nbins=nbins)
        .writeStream.format("memory")
        .queryName("quant_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from quant_test").collect()
    finally:
        q.stop()

    assert len(rows) == 2  # one emission per micro-batch
    last = rows[-1]
    all_events = spark.createDataFrame(batch1 + batch2, schema)
    hist = {
        r.bin: r.n
        for r in fixed_histogram(
            all_events, "value", lo, hi, nbins, "event_type"
        ).collect()
    }
    below = hist.pop(-1, 0)
    above = hist.pop(nbins, 0)
    counts = [hist.get(i, 0) for i in range(nbins)]
    assert last.n_total == below + above + sum(counts) == len(batch1) + len(batch2)
    assert last.below == below and last.above == above
    p50, p90, p99 = quantiles_from_counts(
        counts, below, above, lo, hi, [0.5, 0.9, 0.99]
    )
    assert (last.p50, last.p90, last.p99) == (p50, p90, p99)
    # running totals are cumulative: first emission covers batch1 only
    assert rows[0].n_total == len(batch1)


def test_cardinality_monitor_state_survives_restart(spark, tmp_path):
    """Stop the streaming query, start a NEW query from the SAME
    checkpoint over newly-landed files: the registers must resume
    (not reset), so the post-restart estimate equals the batch
    estimate over ALL rows ever landed — the production contract
    that makes the monitor family restartable."""
    from tmdataloader_spark.operators.cardinality import (
        cardinality_monitor_stream,
        hll_cardinality,
    )

    schema = "event_id long, user_id string, event_type string"
    gen1 = [(i, f"u{i % 29}", "click") for i in range(80)]
    gen2 = [(i + 100, f"u{i % 53}", "click") for i in range(80)]
    src = str(tmp_path / "card_restart_in")
    out = str(tmp_path / "card_restart_out")
    ckpt = str(tmp_path / "card_restart_ckpt")
    spark.createDataFrame(gen1, schema).coalesce(1).write.mode("append").parquet(src)

    def run_generation():
        # parquet sink: the memory sink refuses checkpoint recovery
        stream = spark.readStream.schema(schema).parquet(src)
        return (
            cardinality_monitor_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = run_generation()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    spark.createDataFrame(gen2, schema).coalesce(1).write.mode("append").parquet(src)
    q2 = run_generation()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    # registers only grow, so filled_buckets orders the emissions
    rows = sorted(spark.read.parquet(out).collect(), key=lambda r: r.filled_buckets)
    # one emission per generation; the second must carry
    # generation-1's registers forward and match the batch estimate
    # over everything ever landed
    assert [r.batch_rows for r in rows] == [len(gen1), len(gen2)]
    all_events = spark.createDataFrame(gen1 + gen2, schema)
    (expected,) = hll_cardinality(all_events).collect()
    assert rows[-1].est_distinct == pytest.approx(expected.est_distinct, rel=1e-12)
    (gen1_only,) = hll_cardinality(spark.createDataFrame(gen1, schema)).collect()
    assert rows[0].est_distinct == pytest.approx(gen1_only.est_distinct, rel=1e-12)


def test_null_ids_reconcile_stream_vs_batch(spark, tmp_path):
    """NULL ids must contribute to NEITHER side (r8 ADVICE): the batch
    md5(NULL)=NULL row previously landed as a (key, NULL, NULL)
    register that hll_estimate counted as a filled bucket, while the
    stream's astype(str) registered the literal 'None'/'nan' as real
    elements.  Also covers the Arrow corner where a NULL in a LONG id
    batch floats the pandas column ('123' -> '123.0')."""
    import pandas as pd

    from tmdataloader_spark.operators.cardinality import (
        cardinality_monitor_stream,
        hll_cardinality,
        hll_registers,
    )

    schema = "event_id long, user_id long, event_type string"
    rows = [(i, (i % 23) if i % 5 else None, "click") for i in range(200)]
    df = spark.createDataFrame(rows, schema)

    # batch: no NULL-bucket register rows, estimate near the true 23
    regs = hll_registers(df, "event_type", "user_id").collect()
    assert all(r.bucket is not None and r.rank is not None for r in regs)
    ref = hll_registers(
        df.filter("user_id IS NOT NULL"), "event_type", "user_id"
    ).collect()
    assert sorted(map(tuple, regs)) == sorted(map(tuple, ref))

    # stream over two micro-batches (NULLs in both) reconciles exactly
    src = str(tmp_path / "null_card_in")
    half = len(rows) // 2
    for part in (rows[:half], rows[half:]):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        cardinality_monitor_stream(stream)
        .writeStream.format("memory")
        .queryName("null_card_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from null_card_test").collect()
    finally:
        q.stop()
    batch_est = {r.key: r.est_distinct for r in hll_cardinality(df).collect()}
    last = {r.key: r.est_distinct for r in out}  # memory sink batch order
    assert set(last) == set(batch_est) == {"click"}
    assert last["click"] == pytest.approx(batch_est["click"], rel=1e-12)
    # sanity: estimate is near the true 23 distinct non-null ids
    assert abs(batch_est["click"] - 23) <= max(4 * 0.046 * 23, 3.0)


def test_large_ids_with_null_reconcile_stream_vs_batch(spark, tmp_path):
    """Ids above 2^53 sharing a micro-batch with a NULL (r9 ADVICE):
    the old pandas-side float64 round-trip rounded such ids before
    stringifying, so the stream hashed a WRONG id while batch hashed
    the exact CAST(long AS STRING). The id column is now stringified
    JVM-side, so the Arrow batch never floats — registers must match
    bit-for-bit."""
    import pytest

    from tmdataloader_spark.operators.cardinality import (
        cardinality_monitor_stream,
        hll_cardinality,
    )

    schema = "event_id long, user_id long, event_type string"
    big = 2**60
    # adjacent huge ids that collide under float64 rounding, plus NULLs
    rows = [(i, big + i, "click") for i in range(40)]
    rows += [(100 + i, None, "click") for i in range(5)]
    df = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "bigid_card_in")
    df.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        cardinality_monitor_stream(stream)
        .writeStream.format("memory")
        .queryName("bigid_card_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from bigid_card_test").collect()
    finally:
        q.stop()
    (batch,) = hll_cardinality(df).collect()
    (stream_row,) = out
    assert stream_row.est_distinct == pytest.approx(batch.est_distinct, rel=1e-12)
    # teeth: the float64 round-trip would have merged the 40 distinct
    # huge ids into far fewer register entries
    assert abs(stream_row.est_distinct - 40) <= max(4 * 0.046 * 40, 5.0)
