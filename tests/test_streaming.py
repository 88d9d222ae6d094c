"""Structured Streaming surface: the streaming rollup must agree with
its batch twin on the same data (lambda reconciliation)."""

import shutil

from pyspark.sql import functions as F

from tmdataloader_spark.streaming import (
    read_event_stream,
    stream_quality_scores,
    windowed_event_rollup,
)


def _events_batch(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
