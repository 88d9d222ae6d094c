"""JSONL (newline-delimited JSON) document ingestion — the de-facto
interchange format for text corpora (each line one document record).
Extension beyond the reference's TSV/VCF/GPL surface (BASELINE.json
north-star ingestion family); the reference's own strictness
philosophy (malformed rows must be SEEN, not silently dropped —
CsvLikeFile fail-fast, FileValidator) carries over as explicit
corrupt-row quarantine.

100 TB shape: ``spark.read.json`` with an EXPLICIT schema — schema
inference is a full extra scan of the corpus and nondeterministic
under dirty data, so it is opt-in here, never the default. Malformed
lines land in a ``_corrupt_record`` column (PERMISSIVE mode) and are
split into a quarantine frame the caller must look at; the loader
raises if the corrupt share exceeds ``max_corrupt_fraction`` (the
fail-fast contract). Reading is an embarrassingly parallel line
scan; gzip inputs work but are non-splittable (one task per file —
repartition after read, or prefer zstd/bzip2 at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: default document-corpus schema (matches the documents table)
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

CORRUPT_COL = "_corrupt_record"


class JsonlValidationError(Exception):
    """Raised when the corrupt-line share exceeds the caller's bound."""


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL into ``(good, quarantine)`` frames.

    ``good`` has exactly ``schema``'s columns (rows where every field
    parsed); ``quarantine`` is ``(raw_line)`` — the verbatim text of
    every line that failed to parse as a record, preserved for
    inspection/repair instead of silently dropped (a type mismatch in
    one field corrupts the whole line in PERMISSIVE mode, which is
    the behavior we want: partial records are not data).

    Implementation: ``spark.read.text`` + ``from_json`` rather than
    the JSON reader — Spark forbids projecting ONLY the corrupt
    column from a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN;
    the documented workaround is caching, which would leak), and the
    text base also hands the quarantine the VERBATIM line."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            "value",
            f"{schema}, {CORRUPT_COL} string",
            {"columnNameOfCorruptRecord": CORRUPT_COL, "mode": "PERMISSIVE"},
        ).alias("_r"),
    )
    good = (
        parsed.filter(F.col(f"_r.{CORRUPT_COL}").isNull() & F.col("_r").isNotNull())
        .select("_r.*")
        .drop(CORRUPT_COL)
    )
    quarantine = parsed.filter(
        F.col(f"_r.{CORRUPT_COL}").isNotNull() | F.col("_r").isNull()
    ).select(F.col("value").alias("raw_line"))
    return good, quarantine


def load_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    max_corrupt_fraction: float = 0.0,
) -> DataFrame:
    """Strict loader: returns the good rows, FAILING if the corrupt
    share exceeds ``max_corrupt_fraction`` (default: any corrupt line
    aborts — the reference's fail-fast validation stance). The check
    is one count aggregate over each side; at scale pass a small
    tolerance and route the quarantine frame to a repair sink."""
    good, bad = read_jsonl(spark, path, schema)
    n_bad = bad.count()
    if n_bad == 0:
        return good
    n_good = good.count()
    frac = n_bad / max(1, n_good + n_bad)
    if frac > max_corrupt_fraction:
        sample = [r.raw_line for r in bad.limit(3).collect()]
        raise JsonlValidationError(
            f"{n_bad} corrupt JSONL lines ({frac:.2%} > "
            f"{max_corrupt_fraction:.2%} allowed); first: {sample}"
        )
    return good


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a frame as JSONL (one JSON object per line) — the export
    twin, so a curated corpus round-trips to the interchange format."""
    df.write.mode(mode).json(path)
