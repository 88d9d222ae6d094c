"""Timepoint / metadata-XML functions.

Reference parity (SURVEY.md §2.8):
- X4 timestamp_to_timepoint — sql/postgres/procedures/TIMESTAMP_TO_TIMEPOINT.sql
  (timestamp − baseline → human interval string, 'Baseline' at zero,
  leading '-' for negatives)
- X5 i2b2_build_metadata_xml — sql/postgres/procedures/I2B2_BUILD_METADATA_XML.sql:13-70
  (numeric / timepoint c_metadataxml; timepoint display names
  normalized to minutes: hour×60, day×1440, week×10080, month×43200,
  year×518400)

All built from native expressions (no Python UDFs): integer arithmetic
on epoch seconds + concat_ws assembly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _unit(n: Column, name: str) -> Column:
    """``'N unit'`` with singular/plural exactly as the reference
    (``1 day`` vs ``2 days``); null (skipped by concat_ws) when 0."""
    return F.when(
        n > 0,
        F.concat(
            n.cast("string"),
            F.lit(f" {name}"),
            F.when(n > 1, F.lit("s")).otherwise(F.lit("")),
        ),
    )


def timestamp_to_timepoint(ts: Column | str, baseline: Column | str) -> Column:
    """Render ``ts - baseline`` exactly as the reference
    (TIMESTAMP_TO_TIMEPOINT.sql): ``'N days N hours N minutes N
    seconds'`` with zero units omitted and singular/plural per unit,
    ``'Baseline'`` ONLY at exactly zero, leading ``-`` when before
    baseline. The reference parses second-precision strings; sub-second
    inputs here are floored to seconds first."""
    secs = _c(ts).cast("long") - _c(baseline).cast("long")
    a = F.abs(secs)
    body = F.concat_ws(
        " ",
        _unit((a / 86400).cast("long"), "day"),
        _unit(((a % 86400) / 3600).cast("long"), "hour"),
        _unit(((a % 3600) / 60).cast("long"), "minute"),
        _unit(a % 60, "second"),
    )
    signed = F.when(secs < 0, F.concat(F.lit("-"), body)).otherwise(body)
    return F.when(secs == 0, F.lit("Baseline")).otherwise(signed)


_UNIT_MINUTES = {
    "minute": 1,
    "minutes": 1,
    "hour": 60,
    "hours": 60,
    "day": 1440,
    "days": 1440,
    "week": 10080,
    "weeks": 10080,
    "month": 43200,
    "months": 43200,
    "year": 518400,
    "years": 518400,
}


def timepoint_minutes(name: Column | str) -> Column:
    """Parse a timepoint display name like ``'2 days 3 hours'`` /
    ``'Week 4'`` into total minutes (I2B2_BUILD_METADATA_XML.sql:24-56).
    ``Baseline`` → 0. Unparseable → null."""
    c = F.lower(F.trim(_c(name)))
    # 'N unit [N unit ...]' pairs: extract all (number, unit) pairs and sum.
    pairs_n = F.regexp_extract_all(c, F.lit(r"(-?\d+)\s*(minutes?|hours?|days?|weeks?|months?|years?)"), 1)
    pairs_u = F.regexp_extract_all(c, F.lit(r"(?:-?\d+)\s*(minutes?|hours?|days?|weeks?|months?|years?)"), 1)
    unit_map = F.create_map(*[x for k, v in _UNIT_MINUTES.items() for x in (F.lit(k), F.lit(v))])
    summed = F.aggregate(
        F.zip_with(pairs_n, pairs_u, lambda n, u: n.cast("long") * unit_map[u]),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # 'week 4' / 'visit 3' style: unit-first with trailing number.
    unit_first = F.regexp_extract(c, r"^(minutes?|hours?|days?|weeks?|months?|years?)\s+(-?\d+)$", 1)
    unit_first_n = F.regexp_extract(c, r"^(?:minutes?|hours?|days?|weeks?|months?|years?)\s+(-?\d+)$", 1)
    return (
        F.when(c == "baseline", F.lit(0).cast("long"))
        .when(unit_first != "", unit_first_n.cast("long") * unit_map[unit_first])
        .when(F.size(pairs_n) > 0, summed)
        .otherwise(F.lit(None).cast("long"))
    )


def build_metadata_xml(name: Column | str, data_type: Column | str, is_timepoint: Column | None = None) -> Column:
    """c_metadataxml for numeric / timepoint leaves
    (I2B2_BUILD_METADATA_XML.sql:57-70). Text leaves → null."""
    dt = _c(data_type)
    nm = _c(name)
    minutes = timepoint_minutes(nm) if is_timepoint is not None else F.lit(None).cast("long")
    oktousevalues = F.lit("Y")
    normal_units = F.when(
        is_timepoint if is_timepoint is not None else F.lit(False), F.lit("minutes")
    ).otherwise(F.lit("ratio"))
    xml = F.concat(
        F.lit("<?xml version=\"1.0\"?><ValueMetadata><Version>3.02</Version><CreationDateTime>"),
        F.lit("01/01/2011"),
        F.lit("</CreationDateTime><TestID>"),
        nm,
        F.lit("</TestID><TestName>"),
        F.coalesce(
            F.when(
                (is_timepoint if is_timepoint is not None else F.lit(False))
                & minutes.isNotNull(),
                minutes.cast("string"),
            ),
            nm,
        ),
        F.lit("</TestName><DataType>PosFloat</DataType><CodeType></CodeType><Loinc></Loinc>"),
        F.lit("<Flagstouse></Flagstouse><Oktousevalues>"),
        oktousevalues,
        F.lit("</Oktousevalues><MaxStringLength></MaxStringLength><LowofLowValue></LowofLowValue>"),
        F.lit("<HighofLowValue></HighofLowValue><LowofHighValue></LowofHighValue><HighofHighValue>"),
        F.lit("</HighofHighValue><LowofToxicValue></LowofToxicValue><HighofToxicValue></HighofToxicValue>"),
        F.lit("<EnumValues></EnumValues><CommentsDeterminingExclusion><Com></Com></CommentsDeterminingExclusion>"),
        F.lit("<UnitValues><NormalUnits>"),
        normal_units,
        F.lit("</NormalUnits><EqualUnits></EqualUnits><ExcludingUnits></ExcludingUnits>"),
        F.lit("<ConvertingUnits><Units></Units><MultiplyingFactor></MultiplyingFactor></ConvertingUnits>"),
        F.lit("</UnitValues><Analysis><Enums /><Counts /><New /></Analysis></ValueMetadata>"),
    )
    return F.when(dt == "N", xml).otherwise(F.lit(None).cast("string"))
