"""Document chunking — fixed-size overlapping windows with character
offsets, the retrieval/embedding preprocessing step (RAG indexing,
long-document embedding) that sits between curation and the encoder.

Pure Catalyst expressions: ``sequence`` generates the chunk start
offsets per document, ``posexplode`` fans them out, ``substring``
cuts the window — no UDF, no shuffle (the explode is a per-row
flatMap; downstream writes can partition however they like). At
100 TB the chunk stream is emitted in the same scan that reads the
text, so the operator adds zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 400,
    overlap_chars: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into windows of ``chunk_chars`` characters
    starting every ``chunk_chars - overlap_chars`` characters (so
    consecutive chunks share ``overlap_chars``). Output one row per
    chunk: ``(id, chunk_id, chunk_start, chunk_text, chunk_len)``,
    ``chunk_id`` counting from 0 in offset order. Empty documents
    produce no chunks. Offsets are 0-based character positions —
    ``substr(text, chunk_start + 1, chunk_chars)`` reproduces the
    chunk in any SQL engine."""
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be smaller than chunk_chars")
    stride = chunk_chars - overlap_chars
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    return (
        df.filter(n > 0)
        .select(
            F.col(id_col),
            F.col(text_col).alias("_txt"),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.expr(f"substring(_txt, chunk_start + 1, {chunk_chars})").alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )
