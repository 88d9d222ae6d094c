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
    """c_metadataxml exactly as i2b2_build_metadata_xml emits it
    (I2B2_BUILD_METADATA_XML.sql:13-70 — template strings VERBATIM,
    including the reference's stray ``100`` text node after
    LowofHighValue): TIMEPOINT leaves get the ValueMetadata template
    plus a ``<SeriesMeta>`` block carrying the minutes value, unit
    'minutes', and the original display name
    (ClinicalDataProcessorTest.groovy:1368-1380 parses exactly these);
    numeric ('N') leaves get the plain template; text leaves NULL.
    A TIMEPOINT name that parses to no minutes yields NULL (the
    reference RAISEs there — our loads never produce one, since the
    timepoint names come from timestamp_to_timepoint)."""
    dt = _c(data_type)
    nm = _c(name)
    head = (
        '<?xml version="1.0"?><ValueMetadata><Version>3.02</Version>'
        "<CreationDateTime>08/14/2008 01:22:59</CreationDateTime>"
        "<TestID></TestID><TestName></TestName><DataType>PosFloat</DataType>"
        "<CodeType></CodeType><Loinc></Loinc><Flagstouse></Flagstouse>"
        "<Oktousevalues>Y</Oktousevalues><MaxStringLength></MaxStringLength>"
        "<LowofLowValue>0</LowofLowValue><HighofLowValue>0</HighofLowValue>"
        "<LowofHighValue>100</LowofHighValue>100"
        "<HighofHighValue>100</HighofHighValue>"
        "<LowofToxicValue></LowofToxicValue><HighofToxicValue></HighofToxicValue>"
        "<EnumValues></EnumValues>"
        "<CommentsDeterminingExclusion><Com></Com></CommentsDeterminingExclusion>"
        "<UnitValues><NormalUnits>ratio</NormalUnits><EqualUnits></EqualUnits>"
        "<ExcludingUnits></ExcludingUnits><ConvertingUnits><Units></Units>"
        "<MultiplyingFactor></MultiplyingFactor></ConvertingUnits></UnitValues>"
        "<Analysis><Enums /><Counts /><New /></Analysis>"
    )
    numeric_xml = F.lit(head + "</ValueMetadata>")
    if is_timepoint is None:
        return F.when(dt == "N", numeric_xml).otherwise(F.lit(None).cast("string"))
    minutes = timepoint_minutes(nm)
    series_xml = F.concat(
        F.lit(head + "<SeriesMeta><Value>"),
        minutes.cast("string"),
        F.lit("</Value><Unit>minutes</Unit><DisplayName>"),
        nm,
        F.lit("</DisplayName></SeriesMeta></ValueMetadata>"),
    )
    return (
        F.when(is_timepoint & minutes.isNotNull(), series_xml)
        .when(dt == "N", numeric_xml)
        .otherwise(F.lit(None).cast("string"))
    )
