"""Structured Streaming surface: the streaming rollup must agree with
its batch twin on the same data (lambda reconciliation)."""

import shutil

from pyspark.sql import functions as F

from tmdataloader_spark.streaming import (
    drift_monitor_stream,
    heavy_hitters_stream,
    read_event_stream,
    sessionize_batch,
    sessionize_stream,
    stream_quality_scores,
    windowed_event_rollup,
)


def _events_batch(spark):
    # ts has been generated as TIMESTAMP(NANOS) (read as long) and as
    # TIMESTAMP_NTZ micros; normalize either to session-TZ timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_streaming_rollup_matches_batch(spark, tmp_path):
    batch = _events_batch(spark)
    src = str(tmp_path / "stream_in")
    batch.write.parquet(src)

    stream = read_event_stream(spark, src)
    rolled = windowed_event_rollup(stream, window="1 hour", watermark="2 hours")
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.hour_bucket, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("select * from rollup_test").collect()
        }
    finally:
        q.stop()

    expected = {
        (r.hour_bucket, r.event_type): (r.n_events, r.sum_value)
        for r in batch.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value")
        )
        .collect()
    }
    assert got == expected
    shutil.rmtree(src, ignore_errors=True)


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization must agree with its batch
    twin: every session the stream CLOSES (by gap or by event-time
    timeout) matches the batch result; only each user's final session —
    still open when the feed pauses — may be pending."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, minutes, value):
        return (eid, uid, "click", t0 + dt.timedelta(minutes=minutes), float(value))

    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"
    # user 1: sessions [0,10], [120,125], [360]; user 2: [0] only
    batch1 = [ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 120, 3.0),
              ev(4, 1, 125, 4.0), ev(5, 2, 0, 9.0)]
    batch2 = [ev(6, 1, 360, 5.0)]
    src = str(tmp_path / "sess_in")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize_stream(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessionize_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_seq): (
                r.session_start, r.session_end, r.n_events, r.sum_value
            )
            for r in spark.sql("select * from sessionize_test").collect()
        }
    finally:
        q.stop()

    all_events = spark.createDataFrame(batch1 + batch2, schema)
    expected_all = {
        (r.user_id, r.session_seq): (
            r.session_start, r.session_end, r.n_events, r.sum_value
        )
        for r in sessionize_batch(all_events, gap_seconds=1800).collect()
    }
    # user 1 session 1 closes by gap in micro-batch 1; session 2 closes by
    # gap in micro-batch 2; user 2's only session closes by event-time
    # TIMEOUT (watermark from batch 2 passes t0+30min). Open at end:
    # user 1 session 3.
    assert (1, 1) in got and (1, 2) in got and (2, 1) in got
    assert (1, 3) not in got  # still open — pending, not lost
    for k, v in got.items():
        assert expected_all[k] == v


def test_stateless_quality_stream(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_in")
    docs.select("doc_id", "text").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    scored = stream_quality_scores(stream)
    q = (
        scored.writeStream.format("memory")
        .queryName("quality_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.doc_id: r.n_tokens for r in spark.sql("select * from quality_test").collect()}
    finally:
        q.stop()
    expected = {
        r.doc_id: r.n_tokens for r in stream_quality_scores(docs).collect()
    }
    assert got == expected


def test_stream_mixture_sample_matches_batch(spark, tmp_path):
    """The stream applying a batch-computed fraction table keeps
    EXACTLY the batch twin's row set (content-hashed assignment, not
    probabilistic)."""
    from tmdataloader_spark.llmdata.sampling import (
        mixture_fractions,
        mixture_sample,
    )
    from tmdataloader_spark.streaming import stream_mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fracs = mixture_fractions(docs, "lang", alpha=0.5, target_rows=30)
    expected = sorted(
        r.doc_id
        for r in mixture_sample(docs, "lang", alpha=0.5, target_rows=30).collect()
    )
    src = str(tmp_path / "docs_mix_in")
    docs.select("doc_id", "text", "lang").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string, lang string").parquet(
        src
    )
    kept = stream_mixture_sample(stream, fracs, "lang")
    q = (
        kept.writeStream.format("memory")
        .queryName("mixture_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r.doc_id
            for r in spark.sql("select * from mixture_stream_test").collect()
        )
    finally:
        q.stop()
    assert got == expected
    assert 0 < len(got) < docs.count()


def test_stream_exact_dedup(spark, tmp_path):
    """Within-watermark duplicate texts collapse to their first
    occurrence; distinct texts all survive."""
    from tmdataloader_spark.streaming import stream_exact_dedup

    batch = spark.createDataFrame(
        [
            (1, "Hello,  World!", "2024-01-01 10:00:00"),
            (2, "hello world", "2024-01-01 10:05:00"),   # dup after norm
            (3, "something else", "2024-01-01 10:10:00"),
            (4, "Hello World", "2024-01-01 10:15:00"),   # dup again
        ],
        "doc_id long, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "docs_in")
    batch.write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    out = stream_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = {r.doc_id for r in spark.sql("select * from dedup_test").collect()}
    finally:
        q.stop()
    assert kept == {1, 3}, "first occurrence per fingerprint survives"


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (view → purchase within
    30 min per user) must agree with the batch twin over the same
    closed log once all micro-batches drain."""
    from tmdataloader_spark.streaming import (
        interval_join_batch,
        interval_join_stream,
        read_event_stream,
    )

    batch = _events_batch(spark)
    src = str(tmp_path / "sj_in")
    batch.write.parquet(src)

    views_b = batch.filter(F.col("event_type") == "view")
    buys_b = batch.filter(F.col("event_type") == "purchase")
    expected = {
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in interval_join_batch(views_b, buys_b, within_seconds=1800).collect()
    }
    assert expected, "fixture must produce at least one attributed pair"

    stream = read_event_stream(spark, src)
    views_s = stream.filter(F.col("event_type") == "view")
    buys_s = stream.filter(F.col("event_type") == "purchase")
    joined = interval_join_stream(views_s, buys_s, within_seconds=1800)
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.l_event_id, r.r_event_id)
            for r in spark.sql("select * from sj_test").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_mixture_upsample_agrees_with_batch(spark, tmp_path):
    """The streaming upsample applies a batch-computed UNCLAMPED
    fraction table and must emit exactly the batch twin's (doc,
    copy_idx) multiset — content-hashed assignment, stateless
    explode."""
    from tmdataloader_spark.llmdata.sampling import (
        mixture_fractions,
        mixture_upsample,
    )
    from tmdataloader_spark.streaming import stream_mixture_upsample

    batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang"
    )
    src = str(tmp_path / "docs_in")
    batch.write.parquet(src)
    fr = mixture_fractions(batch, "lang", alpha=0.3, target_rows=800, clamp=False)

    stream = spark.readStream.schema("doc_id long, lang string").parquet(src)
    out = stream_mixture_upsample(stream, fr, "lang")
    q = (
        out.writeStream.format("memory")
        .queryName("upsample_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.doc_id, r.copy_idx)
            for r in spark.sql("select * from upsample_test").collect()
        )
    finally:
        q.stop()

    expect = sorted(
        (r.doc_id, r.copy_idx)
        for r in mixture_upsample(batch, "lang", alpha=0.3, target_rows=800).collect()
    )
    assert got == expect and len(got) > len(batch.collect())


def test_sessionize_batch_agrees_with_builtin_session_window(spark):
    """sessionize_batch must match Spark's built-in
    ``F.session_window`` aggregation on real data. Boundary
    convention: our batch form keeps an exactly-gap-separated pair in
    ONE session (strict '>'), session_window's half-open window would
    split it — so the builtin runs with gap+1s, which is identical
    for integer-second timestamps."""
    from tmdataloader_spark.streaming import sessionize_batch

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")  # parquet NTZ -> session TZ
    )
    ours = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in sessionize_batch(ev, gap_seconds=1800).collect()
    }
    builtin = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in (
            ev.groupBy("user_id", F.session_window("ts", "1801 seconds").alias("w"))
            .agg(
                F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
            )
            .collect()
        )
    }
    assert ours.keys() == builtin.keys()
    assert ours == builtin


def test_foreach_batch_upsert_restart_and_replay(spark, tmp_path):
    """Exactly-once keyed upsert sink: two stream generations with a
    restart from the same checkpoint; later batch wins per key, no
    duplicates, replayed batch commits identically, vacuum bounds
    snapshots."""
    from tmdataloader_spark.streaming import (
        foreach_batch_upsert,
        read_upserted,
        upsert_batch,
    )

    src = str(tmp_path / "in")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, v string, seq long"

    spark.createDataFrame(
        [(1, "a0", 0), (2, "b0", 0)], schema
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = foreach_batch_upsert(stream, tgt, keys=["id"], checkpoint_dir=ckpt, order_col="seq")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["id"]: r["v"] for r in read_upserted(spark, tgt).collect()}
    assert got == {1: "a0", 2: "b0"}

    # second generation: update key 1, add key 3 — restart from the
    # SAME checkpoint; only the new file is processed
    spark.createDataFrame(
        [(1, "a1", 1), (3, "c0", 1)], schema
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = foreach_batch_upsert(stream2, tgt, keys=["id"], checkpoint_dir=ckpt, order_col="seq")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    table = read_upserted(spark, tgt)
    got = {r["id"]: r["v"] for r in table.collect()}
    assert got == {1: "a1", 2: "b0", 3: "c0"}
    assert table.count() == table.select("id").distinct().count()

    # crash-replay: re-running the LAST batch id with the same rows
    # must commit the identical table (idempotence)
    import os

    last = int(open(os.path.join(tgt, "_LATEST")).read())
    replay = spark.createDataFrame([(1, "a1", 1), (3, "c0", 1)], schema)
    upsert_batch(spark, replay, last, tgt, keys=["id"], order_col="seq")
    got2 = {r["id"]: r["v"] for r in read_upserted(spark, tgt).collect()}
    assert got2 == got

    # vacuum keeps at most 2 snapshots
    snaps = [n for n in os.listdir(tgt) if n.startswith("snap=")]
    assert len(snaps) <= 2


def test_upsert_batch_within_batch_dedup(spark, tmp_path):
    """A batch containing several rows per key keeps the latest by
    order_col (ties broken by key — deterministic)."""
    from tmdataloader_spark.streaming import read_upserted, upsert_batch

    tgt = str(tmp_path / "tgt2")
    b = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "x", 1)], "id long, v string, seq long"
    )
    upsert_batch(spark, b, 0, tgt, keys=["id"], order_col="seq")
    got = {r["id"]: r["v"] for r in read_upserted(spark, tgt).collect()}
    assert got == {1: "new", 2: "x"}


def test_read_upserted_time_travel_and_empty(spark, tmp_path):
    from tmdataloader_spark.streaming import read_upserted, upsert_batch

    tgt = str(tmp_path / "tgt3")
    assert read_upserted(spark, tgt) is None
    upsert_batch(
        spark,
        spark.createDataFrame([(1, "v0")], "id long, v string"),
        0,
        tgt,
        keys=["id"],
        vacuum_keep=5,
    )
    upsert_batch(
        spark,
        spark.createDataFrame([(1, "v1")], "id long, v string"),
        1,
        tgt,
        keys=["id"],
        vacuum_keep=5,
    )
    assert read_upserted(spark, tgt).collect()[0]["v"] == "v1"
    assert read_upserted(spark, tgt, batch_id=0).collect()[0]["v"] == "v0"


def test_stream_interval_join_left_outer_emits_after_watermark(spark, tmp_path):
    """Unmatched left rows must surface with NULL right columns once
    the right watermark passes l_ts + within — and not before."""
    from tmdataloader_spark.streaming import interval_join_stream

    lsrc = str(tmp_path / "lo_left")
    rsrc = str(tmp_path / "lo_right")
    schema = "event_id long, user_id long, ts timestamp"
    base = "2024-01-01 00:00:00"
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write(path, rows, mode="append"):
        spark.createDataFrame(rows, schema).write.mode(mode).parquet(path)

    # batch 1: left view with NO purchase; matched pair for user 2
    write(lsrc, [(1, 1, t0), (2, 2, t0)])
    write(rsrc, [(100, 2, t0 + dt.timedelta(minutes=10))])

    left = spark.readStream.schema(schema).parquet(lsrc)
    right = spark.readStream.schema(schema).parquet(rsrc)
    joined = interval_join_stream(
        left,
        right,
        within_seconds=3600,
        left_watermark="30 minutes",
        right_watermark="30 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("lo_join")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("select * from lo_join").collect()
        # watermark has not advanced past t0+1h yet: only the match
        assert {(r["user_id"], r["r_event_id"]) for r in first} == {(2, 100)}

        # batch 2: far-future sentinels push both watermarks past
        # t0 + within + watermark -> user 1's null row must emit
        far = t0 + dt.timedelta(hours=6)
        write(lsrc, [(9, 99, far)])
        write(rsrc, [(900, 99, far)])
        q.processAllAvailable()
        rows = {
            (r["user_id"], r["r_event_id"])
            for r in spark.sql("select * from lo_join").collect()
        }
        assert (1, None) in rows, rows
        assert (2, 100) in rows
    finally:
        q.stop()


def test_interval_join_batch_left_outer_matches_stream_contract(spark):
    from tmdataloader_spark.streaming import interval_join_batch
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_id long, user_id long, ts timestamp"
    left = spark.createDataFrame([(1, 1, t0), (2, 2, t0)], schema)
    right = spark.createDataFrame(
        [(100, 2, t0 + dt.timedelta(minutes=5))], schema
    )
    out = {
        (r["user_id"], r["r_event_id"])
        for r in interval_join_batch(left, right, how="left_outer").collect()
    }
    assert out == {(1, None), (2, 100)}


def test_heavy_hitters_stream_exact_when_k_covers(spark, tmp_path):
    """With k >= distinct users the Misra-Gries sketch degenerates to
    the exact census: the final update-mode emission must equal the
    batch groupBy count (lambda reconciliation)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    mk = lambda eid, uid: (eid, uid, "click", t0, 1.0)
    batch1 = [mk(1, 1), mk(2, 1), mk(3, 2), mk(4, 3)]
    batch2 = [mk(5, 1), mk(6, 2), mk(7, 2), mk(8, 2)]
    src = str(tmp_path / "hh_in")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        heavy_hitters_stream(stream, k=8)
        .writeStream.format("memory")
        .queryName("hh_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode re-emits per batch; keep the LAST emission per key
        rows = spark.sql(
            "select * from hh_test"
        ).collect()
    finally:
        q.stop()
    final = {}
    for r in rows:  # memory sink appends update rows in batch order
        final[(r.event_type, r.user_id)] = r.est_count
    assert final == {
        ("click", 1): 3,
        ("click", 2): 4,
        ("click", 3): 1,
    }
    shutil.rmtree(src, ignore_errors=True)


def test_heavy_hitters_stream_caps_state(spark, tmp_path):
    """With k=2 the sketch must keep <= 2 counters and still surface
    the dominant key with a count no larger than its true frequency
    (Misra-Gries undercount guarantee)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    rows = [(i, 7 if i % 4 != 3 else 100 + i, "click", t0, 1.0) for i in range(16)]
    src = str(tmp_path / "hh_cap_in")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        heavy_hitters_stream(stream, k=2)
        .writeStream.format("memory")
        .queryName("hh_cap_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from hh_cap_test").collect()
    finally:
        q.stop()
    assert len(got) <= 2
    by_uid = {r.user_id: r.est_count for r in got}
    # user 7 truly appears 12 times; sketch keeps it, undercounted
    assert 7 in by_uid and 0 < by_uid[7] <= 12
    shutil.rmtree(src, ignore_errors=True)


def test_drift_monitor_alerts_on_level_shift(spark, tmp_path):
    """Batch 1 seeds history (no alert possible); batch 2 at a shifted
    level must alert with drift = |batch mean - historical mean|."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    batch1 = [(i, 1, "m", t0, 1.0) for i in range(4)]
    batch2 = [(10 + i, 1, "m", t0, 5.0) for i in range(4)]
    src = str(tmp_path / "drift_in")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        drift_monitor_stream(stream, threshold=1.0)
        .writeStream.format("memory")
        .queryName("drift_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = sorted(
            spark.sql("select * from drift_test").collect(),
            key=lambda r: r.hist_n,
        )
    finally:
        q.stop()
    assert len(rows) == 2
    seed, shifted = rows
    assert seed.hist_n == 0 and not seed.alert and seed.drift is None
    assert shifted.hist_n == 4 and shifted.hist_mean == 1.0
    assert shifted.batch_mean == 5.0 and shifted.drift == 4.0
    assert shifted.alert


def test_micro_quantizer_matches_batch_half_up(spark):
    """The streaming micro-unit quantizer must agree with the batch
    twins' ACTUAL operation — CAST(value AS DECIMAL(38,6)) — on every
    value, including (a) exact .5 micro-unit boundaries, where
    Python's builtin round() is half-to-even and diverges (r6
    ADVICE), and (b) ordinary values whose 7th decimal digit is 5,
    where the former floor(v*1e6 + 0.5) form rounded the BINARY
    product and diverged from the cast's decimal-string HALF_UP by 1
    micro-unit (r8 ADVICE: 64.0000645 → 64000064 vs 64000065)."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.streaming import _micro_q

    # .5 micro-unit boundaries of both parities, negatives, ordinary
    # values, and a sweep of 7th-digit-5 values (k + j·1e-7·5) whose
    # binary products disagree with the decimal cast
    values = (
        [(k + 0.5) / 1e6 for k in range(0, 12)]
        + [-(k + 0.5) / 1e6 for k in range(0, 12)]
        + [0.0, 1.0, 2.7, -3.14159, 123.456789, -0.000001]
        + [64.0000645, -64.0000645]
        + [k + m / 1e7 for k in (0, 3, 17, 64, 1001) for m in (5, 15, 25, 645, 9995)]
    )
    df = spark.createDataFrame([(v,) for v in values], "v double").select(
        "v",
        (F.col("v").cast("decimal(38,6)") * 1_000_000).cast("long").alias("q"),
    )
    batch = {r.v: r.q for r in df.collect()}
    for v in values:
        assert _micro_q(v) == batch[v], (
            f"stream quantizer diverges from batch decimal(38,6) cast at "
            f"v={v!r}: {_micro_q(v)} != {batch[v]}"
        )
    # teeth: banker's rounding disagrees somewhere on this grid, and so
    # does the old binary-product form
    assert any(round(v * 1e6) != _micro_q(v) for v in values)
    import math

    def _old(v):
        x = float(v) * 1e6
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    assert any(_old(v) != _micro_q(v) for v in values)


def test_micro_quantizer_overflow_mirrors_cast_null():
    """|v| >= 1e32 does not fit decimal(38,6): Spark's cast yields
    NULL (ANSI off) and the batch SUM skips the row — _micro_q must
    return None, not raise (r9 ADVICE: the default 28-digit context
    raised decimal.InvalidOperation from 1e22 up)."""
    import math

    from tmdataloader_spark.streaming import _micro_q

    # previously-raising magnitudes now quantize exactly (on the
    # double's shortest-repr digits, same as Spark's cast)
    assert _micro_q(1e22) == 10**28
    assert _micro_q(-1.2345678901234568e20) == -123456789012345680000000000
    # past decimal(38,6) range -> None, mirroring cast overflow
    assert _micro_q(1e32) is None
    assert _micro_q(-1e33) is None
    assert _micro_q(float("nan")) is None
    assert _micro_q(float("inf")) is None
    assert _micro_q(-float("inf")) is None
    # boundary: largest double below 1e32 still fits
    below = math.nextafter(1e32, 0)
    assert _micro_q(below) is not None


def test_all_null_session_emits_null_sum(spark, tmp_path):
    """r10 ADVICE: a session whose EVERY value casts to NULL under
    decimal(38,6) (NaN / inf / |v| >= 1e32) must emit sum_value NULL —
    the batch twin's SUM(CAST(...)) is NULL over all-NULL input, and
    the stream previously emitted 0.0 there (reconciliation split)."""
    import datetime as dt

    from tmdataloader_spark.streaming import sessionize_batch, sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    # user 1 session 1: both values cast to NULL; session 2 (normal)
    # arrives 6h later and closes session 1 by gap
    batch1 = [
        (1, 1, "m", t0, float("nan")),
        (2, 1, "m", t0 + dt.timedelta(minutes=1), 1e33),
    ]
    batch2 = [(3, 1, "m", t0 + dt.timedelta(minutes=360), 7.0)]
    src = str(tmp_path / "nullsess_in")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("nullsess_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_seq): (r.n_events, r.sum_value)
            for r in spark.sql("select * from nullsess_test").collect()
        }
    finally:
        q.stop()

    assert got[(1, 1)] == (2, None)  # rows counted, sum NULL like SUM()
    batch_twin = {
        (r.user_id, r.session_seq): (r.n_events, r.sum_value)
        for r in sessionize_batch(
            spark.createDataFrame(batch1 + batch2, schema), gap_seconds=1800
        ).collect()
    }
    assert batch_twin[(1, 1)] == (2, None)


def test_all_null_drift_batch_emits_null_mean(spark, tmp_path):
    """r10 ADVICE twin for the drift monitor: a micro-batch whose every
    value casts to NULL reports batch_mean NULL (no drift, no alert),
    and an all-NULL history reports hist_mean NULL."""
    import datetime as dt

    from tmdataloader_spark.streaming import drift_monitor_stream

    t0 = dt.datetime(2024, 1, 1)
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    batch1 = [(i, 1, "m", t0, float("nan")) for i in range(3)]  # all-NULL seed
    batch2 = [(10 + i, 1, "m", t0, 2.0) for i in range(3)]
    src = str(tmp_path / "nulldrift_in")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        drift_monitor_stream(stream, threshold=1.0)
        .writeStream.format("memory")
        .queryName("nulldrift_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = sorted(
            spark.sql("select * from nulldrift_test").collect(), key=lambda r: r.hist_n
        )
    finally:
        q.stop()

    assert len(rows) == 2
    seed, second = rows
    # all-NULL batch: mean NULL, no alert
    assert seed.batch_n == 3 and seed.batch_mean is None and not seed.alert
    # history exists but holds zero non-NULL values: hist_mean NULL,
    # drift undefined, no alert
    assert second.hist_n == 3 and second.hist_mean is None
    assert second.batch_mean == 2.0 and second.drift is None and not second.alert
