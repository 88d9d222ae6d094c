"""Unit tests for the scalar function library vs pure-Python oracles
(SURVEY.md §5 strategy point 1)."""

from datetime import datetime

from pyspark.sql import functions as F

from tmdataloader_spark.functions import (
    get_last_path_component,
    is_not_numeric_flag,
    normalize_chars,
    normalize_whitespace,
    parse_nth_value,
    path_components,
    path_hlevel,
    path_prefixes_expr,
    replace_last_path_component,
    timestamp_to_timepoint,
    timepoint_minutes,
    usubjid,
)

PATH = "\\Test Studies\\Test Study\\Biomarker Data\\"


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_path_components(spark):
    df = spark.createDataFrame([(PATH,)], ["p"])
    assert df.select(path_components("p").alias("c")).collect()[0].c == [
        "Test Studies",
        "Test Study",
        "Biomarker Data",
    ]


def test_parse_nth_value(spark):
    df = spark.createDataFrame([(PATH,)], ["p"])
    # raw split: position 1 is the empty token before the leading '\'
    assert df.select(parse_nth_value("p", 2).alias("v")).collect()[0].v == "Test Studies"
    assert df.select(parse_nth_value("p", 3).alias("v")).collect()[0].v == "Test Study"


def test_last_component_ops(spark):
    df = spark.createDataFrame([(PATH,)], ["p"])
    assert df.select(get_last_path_component("p").alias("v")).collect()[0].v == "Biomarker Data"
    out = df.select(replace_last_path_component("p", "XYZ").alias("v")).collect()[0].v
    assert out == "\\Test Studies\\Test Study\\XYZ\\"


def test_hlevel_and_prefixes(spark):
    df = spark.createDataFrame([(PATH,)], ["p"])
    assert df.select(path_hlevel("p").alias("v")).collect()[0].v == 2
    prefixes = df.select(path_prefixes_expr("p").alias("v")).collect()[0].v
    assert prefixes == [
        "\\Test Studies\\",
        "\\Test Studies\\Test Study\\",
        "\\Test Studies\\Test Study\\Biomarker Data\\",
    ]


def test_is_not_numeric_flag(spark):
    df = spark.createDataFrame(
        [("1.5",), ("abc",), (None,), ("2e3",), ("",)], ["v"]
    )
    flags = [r.f for r in df.select(is_not_numeric_flag("v").alias("f")).collect()]
    assert flags == [0, 1, 0, 0, 1]


def test_usubjid(spark):
    df = spark.createDataFrame([("TRIAL", None, "SUBJ"), ("TRIAL", "SITE", "S2")], ["t", "s", "u"])
    vals = [r.v for r in df.select(usubjid("t", "s", "u").alias("v")).collect()]
    assert vals == ["TRIAL:SUBJ", "TRIAL:SITE:S2"]


def test_normalize_chars_and_whitespace(spark):
    # lowercase ' and ' per I2B2_LOAD_CLINICAL_DATA.sql:438
    df = spark.createDataFrame([("a%b & c_d  ,e ",)], ["v"])
    out = df.select(normalize_whitespace(normalize_chars("v")).alias("v")).collect()[0].v
    assert out == "a Pctb and c d,e"


def test_normalize_chars_per_column(spark):
    from tmdataloader_spark.functions.values import (
        normalize_chars_category,
        normalize_chars_value,
    )

    df = spark.createDataFrame([("a_b+c&d",)], ["v"])
    # value set: no _ -> space
    out = df.select(normalize_chars_value("v").alias("v")).collect()[0].v
    assert out == "a_b and c and d"
    # category set: only % and &
    out = df.select(normalize_chars_category("v").alias("v")).collect()[0].v
    assert out == "a_b+c and d"


def test_timestamp_to_timepoint(spark):
    # TIMESTAMP_TO_TIMEPOINT.sql: singular/plural per unit, seconds
    # included, 'Baseline' only at exactly zero
    df = spark.createDataFrame(
        [
            (datetime(2020, 1, 3, 3, 0, 0), datetime(2020, 1, 1, 0, 0, 0)),
            (datetime(2020, 1, 1, 0, 0, 30), datetime(2020, 1, 1, 0, 0, 0)),
            (datetime(2019, 12, 31, 23, 0, 0), datetime(2020, 1, 1, 0, 0, 0)),
            (datetime(2020, 1, 1, 0, 0, 0), datetime(2020, 1, 1, 0, 0, 0)),
            (datetime(2020, 1, 2, 0, 1, 1), datetime(2020, 1, 1, 0, 0, 0)),
        ],
        ["ts", "base"],
    )
    vals = [r.v for r in df.select(timestamp_to_timepoint("ts", "base").alias("v")).collect()]
    assert vals == [
        "2 days 3 hours",
        "30 seconds",
        "-1 hour",
        "Baseline",
        "1 day 1 minute 1 second",
    ]


def test_fix_parens_reference_semantics(spark):
    from tmdataloader_spark.operators.cleansing import fix_parens

    df = spark.createDataFrame(
        [("a()b",), ("a( )b",), ("a (b",), ("a )b",), ("(a)",), ("a() (b)",)], ["v"]
    )
    vals = [r.v for r in df.select(fix_parens(F.col("v")).alias("v")).collect()]
    # two sequential passes with empty-string replacement; balanced
    # non-empty parens survive (I2B2_LOAD_CLINICAL_DATA.sql:280-305)
    assert vals == ["ab", "a b", "a b", "a b", "(a)", "a b"]


def test_timepoint_minutes(spark):
    # Pair names take the reference's EXTRACT(epoch FROM interval)/60
    # path (I2B2_BUILD_METADATA_XML.sql:47-50): seconds participate
    # ('1 minute 30 seconds' → 1.5) and '1 year' is 365.25 days →
    # 525960 min, while unit-first 'Year 1' uses the explicit 518400
    # multiplier — the reference's own inconsistency, mirrored.
    df = spark.createDataFrame(
        [
            ("Baseline",),
            ("2 days 3 hours",),
            ("Week 4",),
            ("1 year",),
            ("Year 1",),
            ("1 minute 30 seconds",),
            ("30 seconds",),  # ref RAISEs; we yield NULL (documented)
            ("Visit 3",),  # unknown unit → NULL minutes (XML keeps it)
            ("n/a",),
        ],
        ["v"],
    )
    vals = [r.m for r in df.select(timepoint_minutes("v").alias("m")).collect()]
    assert vals == [0.0, 2 * 1440 + 3 * 60, 4 * 10080, 525960.0, 518400.0, 1.5, None, None, None]


def test_timepoint_minutes_month_normalization(spark):
    """PG EXTRACT(epoch FROM interval) folds year/month pairs into ONE
    month field and normalizes it as trunc(M/12) 365.25-day years +
    (M%12) 30-day months — verified values on PG15: '24 months' →
    63115200 s, '18 months' → 47109600 s, '1 year 14 months' →
    68299200 s (r11 ADVICE). Truncation is toward zero like C
    (months=-14 → -1 year -2 months)."""
    df = spark.createDataFrame(
        [
            ("24 months",),
            ("18 months",),
            ("1 year 14 months",),
            ("11 months",),  # below a year: flat 30-day months
            ("-14 months",),
            ("2 years 3 days",),  # mixed month-field + day-field units
        ],
        ["v"],
    )
    vals = [r.m for r in df.select(timepoint_minutes("v").alias("m")).collect()]
    assert vals == [
        63115200 / 60,
        47109600 / 60,
        68299200 / 60,
        11 * 43200.0,
        -(31557600 + 2 * 2592000) / 60,
        (2 * 31557600 + 3 * 86400) / 60,
    ]


def test_timepoint_minutes_reference_gate_fidelity(spark):
    """r11 ADVICE low items: (1) a gate-passing name NOT fully
    consumed by (number, unit) pairs would fail the reference's
    ::INTERVAL cast and abort — NULL here, never a value summed from
    the recognized prefix; (2) 'Baseline' matches exactly and
    case-sensitively on the UNTRIMMED name (I2B2_BUILD_METADATA_XML
    .sql:15) — 'BASELINE' and ' baseline ' RAISE in the reference,
    NULL here; (3) the gates run on the untrimmed name (:19,:47), so
    a leading space matches no path."""
    from tmdataloader_spark.functions.timepoints import invalid_timepoint_name

    df = spark.createDataFrame(
        [
            ("3 days foo",),
            ("BASELINE",),
            (" baseline ",),
            (" 2 days",),
            ("2 days ",),  # trailing space: gate + interval both fine
            ("1 day 2 hours 3 minutes 4 seconds",),
        ],
        ["v"],
    )
    vals = [r.m for r in df.select(timepoint_minutes("v").alias("m")).collect()]
    assert vals == [
        None,
        None,
        None,
        None,
        2 * 1440.0,
        1440 + 120 + 3 + 4 / 60,
    ]
    bad = [
        r.b for r in df.select(invalid_timepoint_name("v").alias("b")).collect()
    ]
    assert bad == [True, True, True, True, False, False]


def test_validate_timepoint_names_abort(spark):
    """VERDICT r11 item 6: the reference RAISEs 'Check date format'
    for a TIMEPOINT name matching neither series path
    (I2B2_BUILD_METADATA_XML.sql:52); we abort pre-write with the
    A7/A9 LoadValidationError pattern, listing offenders."""
    import pytest

    from tmdataloader_spark.functions.timepoints import validate_timepoint_names
    from tmdataloader_spark.operators.dedup import LoadValidationError

    ok = spark.createDataFrame(
        [("Baseline",), ("Week 4",), ("2 days 3 hours",), ("Visit 3",)], ["name"]
    )
    validate_timepoint_names(ok, "name")  # no raise

    bad = ok.unionByName(
        spark.createDataFrame([("30 seconds",), ("3 days foo",)], ["name"])
    )
    with pytest.raises(LoadValidationError, match="Check date format") as ei:
        validate_timepoint_names(bad, "name")
    assert "30 seconds" in str(ei.value) and "3 days foo" in str(ei.value)


def test_build_metadata_xml_series_units(spark):
    """I2B2_BUILD_METADATA_XML.sql:19-21,58-64 — unit-first unknown
    units keep the raw unit/value verbatim ('Visit 3' →
    <Unit>visit</Unit><Value>3</Value>); fractional epoch minutes
    render float8-style ('1.5'); sub-minute-only names NULL."""
    import xml.etree.ElementTree as ET

    from tmdataloader_spark.functions.timepoints import build_metadata_xml

    df = spark.createDataFrame(
        [("Visit 3",), ("1 minute 30 seconds",), ("2 hours",), ("30 seconds",)], ["v"]
    )
    xmls = [
        r.x
        for r in df.select(
            build_metadata_xml("v", F.lit("T"), is_timepoint=F.lit(True)).alias("x")
        ).collect()
    ]
    s = ET.fromstring(xmls[0]).find("SeriesMeta")
    assert (s.findtext("Value"), s.findtext("Unit"), s.findtext("DisplayName")) == (
        "3", "visit", "Visit 3",
    )
    s = ET.fromstring(xmls[1]).find("SeriesMeta")
    assert (s.findtext("Value"), s.findtext("Unit")) == ("1.5", "minutes")
    s = ET.fromstring(xmls[2]).find("SeriesMeta")
    assert (s.findtext("Value"), s.findtext("Unit")) == ("120", "minutes")
    assert xmls[3] is None


def test_tag_value_types_null_group_key(spark):
    """A NULL visit_name group must still receive its inferred type
    (eqNullSafe join keys — plain equality would leave valtype_cd NULL
    and silently store numeric values as text)."""
    from tmdataloader_spark.operators.type_inference import tag_value_types

    df = spark.createDataFrame(
        [
            ("C1", "WEIGHT", None, "70.5"),
            ("C1", "WEIGHT", None, "81"),
            ("C1", "SEX", "V1", "Male"),
        ],
        "category_cd string, data_label string, visit_name string, data_value string",
    )
    out = {
        (r.data_label, r.visit_name): (r.valtype_cd, r.tval_char, r.nval_num)
        for r in tag_value_types(df).collect()
    }
    assert out[("WEIGHT", None)][0] == "N"
    assert out[("WEIGHT", None)][1] == "E"
    assert out[("SEX", "V1")] == ("T", "Male", None)


def test_escape_like(spark):
    """X12 (I2B2_FILL_IN_TREE.sql:52): LIKE metachars * % _ get a *
    escape prefix."""
    from tmdataloader_spark.functions.paths import escape_like

    df = spark.createDataFrame([("a*b%c_d",), ("plain",)], ["v"])
    vals = [r.e for r in df.select(escape_like("v").alias("e")).collect()]
    assert vals == ["a**b*%c*_d", "plain"]


def test_pair_gate_full_regex_equivalence():
    """The merged hot-path regex must accept EXACTLY the conjunction
    of the reference's two conditions (first-pair gate ∧ interval
    full-consumption) — checked in pure Python over the adversarial
    corpus (backtracking 'weeks' tails, 5-digit counts, double
    spaces, unit-less tails, sub-minute firsts, negatives)."""
    import re

    from tmdataloader_spark.functions.timepoints import (
        _PAIR_FULL,
        _PAIR_GATE,
        _PAIR_GATE_FULL,
    )

    cases = [
        "2 days", "2 days 3 hours", "-1 hour", "-2 days 3 hours",
        "1 minute 30 seconds", "30 seconds", "2 weeks", "2 weeks 1 day",
        "12345 days", "2  days", "2 days foo", "3 days ago", "2days",
        "2 days3 hours", "1 year 14 months", "-14 months", "4 weeks ",
        "2 weeks3", "1 week 2 weeks 3 weeks", "0 days", "9999 years",
        "1 second 1 minute", "baseline", "week 4", "", "7 days 03:00:00",
    ]
    units = ["day", "days", "weeks", "seconds", "minute", "x"]
    for i, u1 in enumerate(units):
        for u2 in units:
            cases.append(f"{i} {u1} {i + 1} {u2}")
            cases.append(f"{i} {u1}{i + 1} {u2}")
    for s in cases:
        both = bool(re.search(_PAIR_GATE, s)) and bool(re.search(_PAIR_FULL, s))
        merged = bool(re.search(_PAIR_GATE_FULL, s))
        assert merged == both, (s, merged, both)
