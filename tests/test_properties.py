r"""Property-based tests (hypothesis): scalar parity functions and the
sessionizer checked against independent pure-Python references on
randomized inputs.

The reference repo has no property tests (SURVEY.md §5 — fixture
integration tests only); these harden exactly the string-edge cases
fixtures never cover (empty components, repeated separators, metachars
in path names, gap boundaries)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from tmdataloader_spark.functions.paths import (
    get_last_path_component,
    parse_nth_value,
    path_components,
    path_hlevel,
    path_prefixes_expr,
    replace_last_path_component,
)
from tmdataloader_spark.functions.timepoints import (
    timepoint_minutes,
    timestamp_to_timepoint,
)
from tmdataloader_spark.functions.values import (
    normalize_chars_label,
    normalize_whitespace,
    usubjid,
)
from tmdataloader_spark.streaming import sessionize_batch

# printable ASCII without the path separator
component = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters="\\"),
    min_size=1,
    max_size=12,
).filter(lambda s: s.strip() != "")


def _one_row(spark, exprs: dict, data: list[tuple], schema: str):
    df = spark.createDataFrame(data, schema)
    return df.select(*[v.alias(k) for k, v in exprs.items()]).collect()


@settings(max_examples=25, deadline=None)
@given(comps=st.lists(component, min_size=1, max_size=6), newname=component)
def test_prop_path_functions(spark, comps, newname):
    path = "\\" + "\\".join(comps) + "\\"
    [row] = _one_row(
        spark,
        {
            "comps": path_components("p"),
            "last": get_last_path_component("p"),
            "hlevel": path_hlevel("p"),
            "repl": replace_last_path_component("p", newname),
            "prefixes": path_prefixes_expr("p"),
            # raw-split indexing: 1 = '' before the leading '\'
            "second": parse_nth_value("p", 2),
        },
        [(path,)],
        "p string",
    )
    assert row.comps == comps
    assert row.last == comps[-1]
    assert row.hlevel == len(comps) - 1
    assert row.repl == "\\" + "\\".join(comps[:-1] + [newname]) + "\\"
    assert row.prefixes == [
        "\\" + "\\".join(comps[: i + 1]) + "\\" for i in range(len(comps))
    ]
    assert row.second == comps[0]


def _render_timepoint(diff: int) -> str:
    if diff == 0:
        return "Baseline"
    a = abs(diff)
    parts = []
    for n, unit in (
        (a // 86400, "day"),
        ((a % 86400) // 3600, "hour"),
        ((a % 3600) // 60, "minute"),
        (a % 60, "second"),
    ):
        if n > 0:
            parts.append(f"{n} {unit}" + ("s" if n > 1 else ""))
    body = " ".join(parts)
    return ("-" + body) if diff < 0 else body


@settings(max_examples=25, deadline=None)
@given(diff=st.integers(min_value=-(10**7), max_value=10**7))
def test_prop_timestamp_to_timepoint(spark, diff):
    base = dt.datetime(2020, 6, 1, 12, 0, 0)
    [row] = _one_row(
        spark,
        {"tp": timestamp_to_timepoint("ts", "base")},
        [(base + dt.timedelta(seconds=diff), base)],
        "ts timestamp, base timestamp",
    )
    assert row.tp == _render_timepoint(diff)


@settings(max_examples=25, deadline=None)
@given(diff=st.integers(min_value=0, max_value=10**7))
def test_prop_timepoint_minutes_roundtrip(spark, diff):
    """Rendering a nonnegative offset then parsing it back is EXACT
    (diff/60, fractional when seconds are present — the reference's
    EXTRACT(epoch FROM interval)/60). A seconds-only name fails the
    reference's pair gate (it RAISEs; we yield NULL)."""
    base = dt.datetime(2020, 6, 1, 12, 0, 0)
    [row] = _one_row(
        spark,
        {"mins": timepoint_minutes(timestamp_to_timepoint("ts", "base"))},
        [(base + dt.timedelta(seconds=diff), base)],
        "ts timestamp, base timestamp",
    )
    if diff == 0:
        assert row.mins == 0  # Baseline
    elif diff < 60:
        assert row.mins is None  # seconds-only name fails the pair gate
    else:
        assert row.mins == diff / 60


def _norm_label(s: str) -> str:
    for old, new in [("%", " Pct"), ("&", " and "), ("+", " and "), ("_", " "), ("(plus)", "+")]:
        s = s.replace(old, new)
    return s


def _norm_ws(s: str) -> str:
    s = s.replace("  ", " ").replace(" ,", ",").strip(" ")
    return s.rstrip(",")


@settings(max_examples=25, deadline=None)
@given(
    s=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=20
    )
)
def test_prop_normalize_chains(spark, s):
    [row] = _one_row(
        spark,
        {"lab": normalize_chars_label("s"), "ws": normalize_whitespace("s")},
        [(s,)],
        "s string",
    )
    assert row.lab == _norm_label(s)
    assert row.ws == _norm_ws(s)


@settings(max_examples=25, deadline=None)
@given(
    trial=st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=122), min_size=1, max_size=6),
    site=st.one_of(st.none(), st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=122), max_size=4)),
    subj=st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=122), min_size=1, max_size=6),
)
def test_prop_usubjid(spark, trial, site, subj):
    [row] = _one_row(
        spark,
        {"u": usubjid("t", "si", "su")},
        [(trial, site, subj)],
        "t string, si string, su string",
    )
    joined = ":".join([trial, site or "", subj])
    assert row.u == joined.replace("::", ":")


def _sessionize_py(events, gap_seconds):
    """events: (event_id, user_id, ts_datetime, value) — reference
    sessionizer returning {(user, seq): (start, end, n, sum)}."""
    out = {}
    by_user: dict = {}
    for e in sorted(events, key=lambda e: (e[1], e[2], e[0])):
        by_user.setdefault(e[1], []).append(e)
    fmt = "%Y-%m-%d %H:%M:%S"
    for uid, evs in by_user.items():
        seq = 0
        cur = None
        for eid, _, ts, val in evs:
            if cur is None or (ts - cur["end"]).total_seconds() > gap_seconds:
                if cur is not None:
                    out[(uid, seq)] = (
                        cur["start"].strftime(fmt), cur["end"].strftime(fmt),
                        cur["n"], float(cur["sum"]),
                    )
                seq += 1
                cur = {"start": ts, "end": ts, "n": 1, "sum": val}
            else:
                cur["end"], cur["n"], cur["sum"] = ts, cur["n"] + 1, cur["sum"] + val
        out[(uid, seq)] = (
            cur["start"].strftime(fmt), cur["end"].strftime(fmt), cur["n"], float(cur["sum"]),
        )
    return out


event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # user_id
        st.integers(min_value=0, max_value=20000),    # ts offset seconds
        st.integers(min_value=-100, max_value=100),   # integer-valued double
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(raw=event_strategy)
def test_prop_sessionize_batch(spark, raw):
    t0 = dt.datetime(2024, 3, 1)
    events = [
        (i, uid, t0 + dt.timedelta(seconds=off), float(v))
        for i, (uid, off, v) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        events, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.session_seq): (r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize_batch(df, gap_seconds=600).collect()
    }
    assert got == _sessionize_py(events, 600)


_PAIR_UNITS = ["second", "minute", "hour", "day", "week", "month", "year"]
_PAIR_SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _py_pair_minutes(name: str) -> float | None:
    """Pure-Python twin of the pair path: the reference's first-pair
    gate + full interval consumption, then PG EXTRACT(epoch)/60 with
    the month field normalized as trunc(M/12) 365.25-day years plus
    (M%12) 30-day months, truncation toward zero (timestamp.c
    interval_part)."""
    import re as _re

    from tmdataloader_spark.functions.timepoints import (
        _PAIR_FULL,
        _PAIR_GATE,
    )

    low = name.lower()
    if not (_re.search(_PAIR_GATE, low) and _re.search(_PAIR_FULL, low)):
        return None
    months = 0
    secs = 0
    for n, u in _re.findall(
        r"(-?\d+)\s*(seconds?|minutes?|hours?|days?|weeks?|months?|years?)", low
    ):
        n = int(n)
        base = u.rstrip("s") if u != "s" else u
        if base == "month":
            months += n
        elif base == "year":
            months += 12 * n
        else:
            secs += n * _PAIR_SECS[base]
    rem = months - (months // 12) * 12 if months >= 0 else -((-months) % 12)
    years = (months - rem) // 12
    return (secs + years * 31557600 + rem * 2592000) / 60.0


@settings(max_examples=40, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(min_value=-9999, max_value=9999),
                  st.sampled_from(_PAIR_UNITS),
                  st.booleans(),   # pluralize
                  st.sampled_from([" ", "  ", ""])),  # pre-unit gap
        min_size=1,
        max_size=4,
    ),
    tail=st.sampled_from(["", " ", " foo", "3", " ago"]),
    lead=st.sampled_from(["", " "]),
)
def test_prop_pair_epoch_matches_python_oracle(spark, pairs, tail, lead):
    """timepoint_minutes' pair path equals the pure-Python PG-epoch
    oracle on ARBITRARY pair strings — including gate-failing leads,
    month/year folding across sign, and junk tails that must yield
    NULL (never a prefix-summed value)."""
    name = lead + " ".join(
        f"{n}{gap}{u}{'s' if plural else ''}" for n, u, plural, gap in pairs
    ) + tail
    [row] = _one_row(
        spark, {"m": timepoint_minutes("v")}, [(name,)], "v string"
    )
    expect = None if name == "Baseline" else _py_pair_minutes(name)
    if name.strip() and name == "Baseline":
        expect = 0.0
    # unit-first names ('Week 4') never arise here: every generated
    # name starts with the lead/sign/digits, so the unit-first regex
    # cannot match and the pair path is the only live branch
    got = row.m
    if expect is None:
        assert got is None, (name, got)
    else:
        assert got == expect, (name, got, expect)
