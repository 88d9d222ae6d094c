"""Semi-structured (JSON-in-string) column flattening.

Event logs routinely carry a free-form JSON properties column next to
the typed columns (the reference's analogue is XML-in-text
``c_metadataxml``, I2B2_BUILD_METADATA_XML.sql:57-70 — typed values
embedded in a string blob). At scale the rule is: parse ONCE per row
with an explicit schema (``from_json``), never one ``get_json_object``
call per field — each of those re-parses the whole blob, multiplying
scan CPU by the field count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def flatten_json(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    prefix: str = "",
) -> DataFrame:
    """Project typed top-level fields out of a JSON string column:
    ``fields`` maps field name → Spark type DDL (e.g. ``{"k":
    "long"}``). One ``from_json`` parse per row feeds every extracted
    column; malformed rows yield nulls (PERMISSIVE, matching the
    TSV readers' tolerance). Extracted columns are appended as
    ``{prefix}{name}``."""
    schema = ", ".join(f"`{name}` {typ}" for name, typ in fields.items())
    parsed = F.from_json(F.col(json_col), schema)
    out = df.withColumn("_parsed", parsed)
    for name in fields:
        out = out.withColumn(f"{prefix}{name}", F.col(f"_parsed.`{name}`"))
    return out.drop("_parsed")


def json_props_rollup(
    events: DataFrame,
    json_col: str = "props",
    field: str = "k",
    group_col: str = "event_type",
) -> DataFrame:
    """Grouped stats over one numeric JSON property — the
    typed-extraction-then-aggregate shape. One parse per row, then a
    plain map-side-combined agg on the small group key."""
    flat = flatten_json(events, json_col, {field: "long"}, prefix="_v_")
    v = F.col(f"_v_{field}")
    return flat.groupBy(group_col).agg(
        F.count("*").alias("n_events"),
        F.count(v).alias("n_with_prop"),
        F.sum(v).alias("sum_k"),
        F.min(v).alias("min_k"),
        F.max(v).alias("max_k"),
        F.round(F.avg(v), 6).alias("avg_k"),
    )
