"""Timepoint / metadata-XML functions.

Reference parity (SURVEY.md §2.8):
- X4 timestamp_to_timepoint — sql/postgres/procedures/TIMESTAMP_TO_TIMEPOINT.sql
  (timestamp − baseline → human interval string, 'Baseline' at zero,
  leading '-' for negatives)
- X5 i2b2_build_metadata_xml — sql/postgres/procedures/I2B2_BUILD_METADATA_XML.sql:13-70
  (numeric / timepoint c_metadataxml; unit-first timepoint display
  names normalized to minutes with the explicit branch multipliers
  hour×60, day×1440, week×10080, month×43200, year×518400; pair names
  via interval-epoch/60 with PG month normalization; the reference's
  RAISE 'Check date format' surfaced pre-write by
  validate_timepoint_names)

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


# Unit-first ('Week 4') multipliers — the reference's EXPLICIT branch
# constants (I2B2_BUILD_METADATA_XML.sql:22-45): hour×60, day×1440,
# week×10080, month×43200 (30-day), year×518400 (360-day).
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

# Pair-path ('2 days 3 hours') epoch seconds — the reference computes
# EXTRACT(epoch FROM name::INTERVAL)/60 here instead
# (I2B2_BUILD_METADATA_XML.sql:47-50), so these are Postgres interval
# epoch factors for the units that land in the interval's time/day
# fields. Month and year pairs land in the interval's MONTH field
# instead (years fold in at 12 months each) and are normalized by
# EXTRACT(epoch) as trunc(months/12) 365.25-day years plus
# (months % 12) 30-day months — see ``_pair_epoch_minutes``. The
# 365.25-day year is deliberately DIFFERENT from the unit-first
# path's 518400-minute (360-day) year — the reference is internally
# inconsistent and we mirror it verbatim. Seconds participate
# (possibly fractional minutes: '1 minute 30 seconds' → 1.5),
# matching the interval parser.
_UNIT_SECONDS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
    "week": 604800,
    "weeks": 604800,
    # month/year pairs contribute via the interval MONTH field, not
    # a flat seconds factor — zeroed here, summed in _MONTHS_PER_UNIT
    "month": 0,
    "months": 0,
    "year": 0,
    "years": 0,
}

#: months contributed to the interval's MONTH field per unit
_MONTHS_PER_UNIT = {
    "second": 0,
    "seconds": 0,
    "minute": 0,
    "minutes": 0,
    "hour": 0,
    "hours": 0,
    "day": 0,
    "days": 0,
    "week": 0,
    "weeks": 0,
    "month": 1,
    "months": 1,
    "year": 12,
    "years": 12,
}

# PG EXTRACT(epoch FROM interval) month-field factors
# (backend/utils/adt/timestamp.c interval_part: DAYS_PER_YEAR=365.25,
# DAYS_PER_MONTH=30, C integer division/modulo — truncation toward 0)
_SECONDS_PER_EPOCH_YEAR = 31557600  # 365.25 days
_SECONDS_PER_EPOCH_MONTH = 2592000  # 30 days

# The reference's pair-path gate regex units — note NO seconds
# (I2B2_BUILD_METADATA_XML.sql:47): a name must START with a
# '-?[0-9]{1,4} <non-second unit>' pair to enter the epoch path; a
# pure sub-minute name like '30 seconds' RAISEs 'Check date format'
# in the reference (aborting the load) — we yield NULL instead in the
# column expression (cannot raise per-row), and surface the abort
# pre-write via ``invalid_timepoint_name`` (the A7/A9 validate-and-
# raise pattern).
_PAIR_GATE = r"^-?[0-9]{1,4} (week|weeks|minute|minutes|hour|hours|day|days|year|years|month|months)"

# Full-consumption requirement for the epoch path: the reference
# feeds the WHOLE name to ``trim(display_name)::INTERVAL``
# (I2B2_BUILD_METADATA_XML.sql:49), which rejects trailing junk
# ('3 days foo') by raising — so a gate-passing name whose tail is
# not (number, unit) pairs must NOT silently sum its recognized
# prefix. NULL per the NULL-for-RAISE policy. (The interval parser
# accepts a few spellings this regex does not — 'HH:MM:SS' tails,
# 'ago' — which also yield NULL here: a conservative, documented
# subset, never a fabricated value.)
_PAIR_FULL = r"^(-?\d+\s*(seconds?|minutes?|hours?|days?|weeks?|months?|years?)\s*)+$"

# _PAIR_GATE ∧ _PAIR_FULL as ONE anchored regex (hot path: one scan
# per row instead of two). Equivalent to the conjunction: the first
# pair is the gate's exact syntax (1-4 digits, ONE space, non-second
# unit — backtracking explores the unit alternations, so 'weeks'
# still matches after 'week' fails on the tail), the rest must be
# (number, unit) pairs and whitespace to the end of the string.
_PAIR_GATE_FULL = (
    r"^-?[0-9]{1,4} "
    r"(week|weeks|minute|minutes|hour|hours|day|days|year|years|month|months)"
    r"(\s*-?\d+\s*(seconds?|minutes?|hours?|days?|weeks?|months?|years?))*\s*$"
)


def _unit_first_parts(c: Column) -> tuple[Column, Column]:
    """The reference's first branch (I2B2_BUILD_METADATA_XML.sql:19-21):
    a name matching ``^[a-zA-Z]+ -?\\d+`` yields (first number
    substring, lowered first alpha substring) — ANY alpha unit, not
    just time units ('Visit 3' → ('3', 'visit'))."""
    matched = c.rlike(r"^[a-z]+ -?\d+")
    num = F.regexp_extract(c, r"(-?[0-9]+)", 1)
    unit = F.regexp_extract(c, r"([a-z]+)", 1)
    return (
        F.when(matched, num).otherwise(F.lit(None).cast("string")),
        F.when(matched, unit).otherwise(F.lit(None).cast("string")),
    )


def _pair_epoch_minutes(c: Column) -> Column:
    """Pair-path minutes: Postgres ``EXTRACT(epoch FROM c::INTERVAL)/60``
    re-expressed as a sum over (number, unit) pairs (seconds included,
    result possibly fractional). Month and year pairs fold into the
    interval's single MONTH field (years × 12 + months), which
    EXTRACT(epoch) then normalizes as ``trunc(M/12) * 31557600 +
    (M % 12) * 2592000`` with C truncation toward zero — so
    '24 months' is 2 × 365.25-day years (1051920 min), NOT 24 flat
    30-day months. NULL unless the name passes the reference's
    first-pair gate regex AND is fully consumed by pairs (the
    interval cast would otherwise raise)."""
    pairs_n = F.regexp_extract_all(
        c, F.lit(r"(-?\d+)\s*(seconds?|minutes?|hours?|days?|weeks?|months?|years?)"), 1
    )
    pairs_u = F.regexp_extract_all(
        c, F.lit(r"(?:-?\d+)\s*(seconds?|minutes?|hours?|days?|weeks?|months?|years?)"), 1
    )
    sec_map = F.create_map(*[x for k, v in _UNIT_SECONDS.items() for x in (F.lit(k), F.lit(v))])
    mon_map = F.create_map(
        *[x for k, v in _MONTHS_PER_UNIT.items() for x in (F.lit(k), F.lit(v))]
    )
    # one zip + one fold for BOTH running sums (seconds from the
    # time/day units, months from the month field) — two separate
    # aggregates doubled the per-row array work for no reason
    pair_sums = F.aggregate(
        F.zip_with(
            pairs_n,
            pairs_u,
            lambda n, u: F.struct(
                (n.cast("long") * sec_map[u]).alias("s"),
                (n.cast("long") * mon_map[u]).alias("m"),
            ),
        ),
        F.struct(
            F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("m")
        ),
        lambda acc, x: F.struct(
            (acc["s"] + x["s"]).alias("s"), (acc["m"] + x["m"]).alias("m")
        ),
    )
    other_secs = pair_sums["s"]
    months = pair_sums["m"]
    # Spark's % on longs truncates toward zero (Java semantics), same
    # as the C % in PG's interval_part — months=-14 → years=-1, rem=-2
    rem = months % F.lit(12).cast("long")
    years = ((months - rem) / F.lit(12)).cast("long")
    total_secs = (
        other_secs
        + years * F.lit(_SECONDS_PER_EPOCH_YEAR).cast("long")
        + rem * F.lit(_SECONDS_PER_EPOCH_MONTH).cast("long")
    )
    return F.when(c.rlike(_PAIR_GATE_FULL), total_secs / F.lit(60.0))


def timepoint_minutes(name: Column | str) -> Column:
    """Parse a timepoint display name like ``'2 days 3 hours'`` /
    ``'Week 4'`` into total minutes as DOUBLE
    (I2B2_BUILD_METADATA_XML.sql:13-56). ``'Baseline'`` → 0 — matched
    exactly and case-sensitively on the UNTRIMMED name, like the
    reference's ``display_name = 'Baseline'`` (:15); 'BASELINE' or
    ' baseline ' match no path (the reference RAISEs — NULL here, the
    documented NULL-for-RAISE policy). Unit-first names use the
    reference's explicit multipliers; pair names use interval-epoch/60
    (seconds included, so '1 minute 30 seconds' → 1.5; months ≥ 12
    normalize into 365.25-day years). Both gates run on the lowered
    UNTRIMMED name, mirroring the reference's ``lower(display_name)``
    (:19,:47 — only the interval CAST trims). Unknown-unit unit-first
    names ('Visit 3') and unparseable names → null (the XML emitter
    handles the reference's verbatim '<Unit>visit</Unit>' behavior
    separately)."""
    nm = _c(name)
    c = F.lower(nm)
    uf_num, uf_unit = _unit_first_parts(c)
    unit_map = F.create_map(*[x for k, v in _UNIT_MINUTES.items() for x in (F.lit(k), F.lit(v))])
    return (
        F.when(nm == "Baseline", F.lit(0.0))
        .when(uf_unit.isNotNull(), uf_num.cast("double") * unit_map[uf_unit].cast("double"))
        .otherwise(_pair_epoch_minutes(c))
    )


def invalid_timepoint_name(name: Column | str) -> Column:
    """TRUE when ``i2b2_build_metadata_xml`` would RAISE 'Check date
    format' for this TIMEPOINT display name
    (I2B2_BUILD_METADATA_XML.sql:52): not the exact case-sensitive
    literal 'Baseline', not unit-first (``^[a-zA-Z]+ -?\\d+`` on the
    lowered untrimmed name), and not a fully-parsable pair name —
    which covers both the pure sub-minute case ('30 seconds', gate
    has no seconds unit) and gate-passing names the interval cast
    would reject ('3 days foo'). NULL names count as invalid (the
    reference's IF chain falls through to the RAISE on NULL). Use
    with ``validate_timepoint_names`` for the reference's pre-write
    abort; the column expressions themselves stay NULL-safe."""
    nm = _c(name)
    c = F.lower(nm)
    return F.coalesce(
        ~(
            (nm == "Baseline")
            | c.rlike(r"^[a-z]+ -?\d+")
            | c.rlike(_PAIR_GATE_FULL)
        ),
        F.lit(True),
    )


def validate_timepoint_names(df, name_col: str, max_listed: int = 10) -> None:
    """Pre-write abort parity for the reference's 'Check date format'
    RAISE (I2B2_BUILD_METADATA_XML.sql:52) — the A7/A9
    validate-and-raise pattern: collect at most ``max_listed``
    DISTINCT offending TIMEPOINT display names (bounded driver
    round-trip) and raise LoadValidationError listing them. Call on
    the TIMEPOINT-leaf frame before sinking c_metadataxml."""
    from tmdataloader_spark.operators.dedup import LoadValidationError

    bad = (
        df.filter(invalid_timepoint_name(F.col(name_col)))
        .select(name_col)
        .distinct()
        .limit(max_listed + 1)
        .collect()
    )
    if bad:
        names = sorted(str(r[0]) for r in bad[:max_listed])
        suffix = ", …" if len(bad) > max_listed else ""
        raise LoadValidationError(
            "Check date format: TIMEPOINT display names match neither "
            f"the reference's series paths: {names}{suffix}"
        )


def _float8_str(x: Column) -> Column:
    """Format a double the way Postgres float8→varchar does: no
    trailing '.0' on integer values ('120', '-5', '1.5')."""
    as_long = x.cast("long")
    return F.when(
        x == as_long.cast("double"), as_long.cast("string")
    ).otherwise(x.cast("string"))


def build_metadata_xml(name: Column | str, data_type: Column | str, is_timepoint: Column | None = None) -> Column:
    """c_metadataxml exactly as i2b2_build_metadata_xml emits it
    (I2B2_BUILD_METADATA_XML.sql:13-70 — template strings VERBATIM,
    including the reference's stray ``100`` text node after
    LowofHighValue): TIMEPOINT leaves get the ValueMetadata template
    plus a ``<SeriesMeta>`` block carrying the minutes value, unit
    'minutes', and the original display name
    (ClinicalDataProcessorTest.groovy:1368-1380 parses exactly these);
    numeric ('N') leaves get the plain template; text leaves NULL.
    Unit-first names with an unknown unit keep it verbatim — the
    reference emits '<Unit>visit</Unit><Value>3</Value>' for
    'Visit 3' (I2B2_BUILD_METADATA_XML.sql:19-21,58-64). A TIMEPOINT
    name that matches neither path yields NULL in this column
    expression where the reference RAISEs 'Check date format' and
    aborts the load (e.g. a pure sub-minute '30 seconds' name, or a
    gate-passing name the interval cast rejects) — the abort itself
    is surfaced pre-write by ``validate_timepoint_names`` (wired in
    plans/clinical.py), keeping the expression NULL-safe. 'Baseline'
    is matched exactly and case-sensitively on the untrimmed name,
    and both gates run on the lowered UNTRIMMED name (:15,:19,:47)."""
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
    c = F.lower(nm)
    uf_num, uf_unit = _unit_first_parts(c)
    unit_map = F.create_map(*[x for k, v in _UNIT_MINUTES.items() for x in (F.lit(k), F.lit(v))])
    uf_minutes = uf_num.cast("double") * unit_map[uf_unit].cast("double")
    # series (value, unit) exactly as the reference assigns them:
    # Baseline → ('0','minutes'); unit-first known unit → converted
    # minutes; unit-first UNKNOWN unit → raw number + raw unit
    # verbatim; else pair path → epoch/60 minutes.
    value = (
        F.when(nm == "Baseline", F.lit("0"))
        .when(uf_unit.isNotNull() & uf_minutes.isNotNull(), _float8_str(uf_minutes))
        .when(uf_unit.isNotNull(), uf_num)
        .otherwise(_float8_str(_pair_epoch_minutes(c)))
    )
    unit = (
        F.when(nm == "Baseline", F.lit("minutes"))
        .when(uf_unit.isNotNull() & uf_minutes.isNull(), uf_unit)
        .otherwise(F.lit("minutes"))
    )
    series_xml = F.concat(
        F.lit(head + "<SeriesMeta><Value>"),
        value,
        F.lit("</Value><Unit>"),
        unit,
        F.lit("</Unit><DisplayName>"),
        nm,
        F.lit("</DisplayName></SeriesMeta></ValueMetadata>"),
    )
    return (
        F.when(is_timepoint & value.isNotNull(), series_xml)
        .when(dt == "N", numeric_xml)
        .otherwise(F.lit(None).cast("string"))
    )
