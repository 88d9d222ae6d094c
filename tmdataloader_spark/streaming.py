"""Structured Streaming surface (extension — SURVEY.md §2.10 notes the
reference is batch-only, so this is additive, kept out of the
correctness gate).

For a training-data pipeline the same rollups/quality scores run over
a document/event FEED: ``readStream`` on a landing directory →
watermarked windowed aggregation → ``writeStream``. Batch twins of
these transformations are gate queries (``event_rollup``,
``text_quality``), so streaming results can be reconciled against a
batch backfill — the standard lambda-check."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """File-source event stream: each new parquet dropped in ``path``
    is one micro-batch (at scale: maxFilesPerTrigger bounds batch
    size; the same code reads Kafka by swapping the source)."""
    schema = schema or "event_id long, user_id long, event_type string, ts timestamp, value double"
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window rollup with late-data watermark — the streaming
    twin of the gate's batch ``event_rollup``. State is bounded by the
    watermark: windows older than (max event time − watermark) are
    finalized and dropped from the state store."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_quality_scores(docs: DataFrame) -> DataFrame:
    """Stateless per-document quality scoring on a document stream —
    identical expressions to the batch ``text_quality`` gate query
    (stateless ⇒ no watermark needed)."""
    toks = F.split(F.trim(F.col("text")), " +")
    stop = F.lit(["the", "a", "and", "of", "to", "in", "is"])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stopword_ratio"),
    )
