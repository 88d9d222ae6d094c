"""Postgres COPY sink (SURVEY.md §2.1 S8, Postgres dialect): live
round-trip against a scratch PostgreSQL server — the dialect the
reference's production DataLoader actually targets (COPY-based,
build.gradle:48-49), which the embedded-Derby JDBC test cannot prove
(bytea literals, ON CONFLICT upsert, NULL-vs-empty-string CSV rules).

The fixture initdb's into tmp and serves on a private unix socket; the
whole module skips when the postgres binaries are absent.
"""

import csv
import datetime
import io
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdataloader_spark.sinks import (
    pg_create_table_sql,
    run_psql,
    write_postgres_copy,
)

pytestmark = pytest.mark.skipif(
    shutil.which("initdb") is None
    or shutil.which("pg_ctl") is None
    or shutil.which("psql") is None,
    reason="postgres binaries not available",
)


def _copy_out(dsn, sql):
    out = run_psql(dsn, f"\\copy ({sql}) TO STDOUT WITH (FORMAT csv, NULL '<N>')")
    return list(csv.reader(io.StringIO(out)))


def test_copy_round_trip_all_types(spark, pg_dsn):
    """Every warehouse-relevant Spark type survives COPY in and out —
    including the CSV corner cases: embedded commas/quotes/newlines,
    unicode, empty string distinct from NULL, and bytea."""
    ts = datetime.datetime(2024, 3, 1, 12, 34, 56, 789000)
    rows = [
        (1, 10, 1.5, 'a,b "quoted"\nline2', True, b"\x00\xffbin", ts,
         datetime.date(2024, 3, 1)),
        (2, None, None, "", False, None, None, None),
        (3, 30, -0.25, "ünïcodé", None, b"", ts, datetime.date(1999, 12, 31)),
        (4, 40, 4.0, None, True, b"\x01", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "pk long, n int, x double, s string, b boolean, blob binary, "
        "ts timestamp, d date",
    )
    ddl = pg_create_table_sql(df, "rt")
    assert '"blob" bytea' in ddl and '"ts" timestamp' in ddl
    run_psql(pg_dsn, 'DROP TABLE IF EXISTS "rt"')
    assert write_postgres_copy(df, pg_dsn, "rt", chunk_rows=2) == 4

    got = _copy_out(
        pg_dsn,
        "SELECT pk, n, x, s, b, encode(blob, 'hex'), ts, d FROM rt ORDER BY pk",
    )
    expect = [
        ["1", "10", "1.5", 'a,b "quoted"\nline2', "t", "00ff62696e",
         "2024-03-01 12:34:56.789", "2024-03-01"],
        ["2", "<N>", "<N>", "", "f", "<N>", "<N>", "<N>"],
        ["3", "30", "-0.25", "ünïcodé", "<N>", "", "2024-03-01 12:34:56.789",
         "1999-12-31"],
        ["4", "40", "4", "<N>", "t", "01", "<N>", "<N>"],
    ]
    assert got == expect


def test_copy_upsert_on_conflict(spark, pg_dsn):
    """mode='upsert' proves the Postgres-only ON CONFLICT path: the
    second batch updates matched keys in place and appends the rest."""
    run_psql(pg_dsn, 'DROP TABLE IF EXISTS "facts"')
    first = spark.createDataFrame(
        [(1, "C1", 1.0), (2, "C2", 2.0)], "patient long, concept string, v double"
    )
    write_postgres_copy(
        first, pg_dsn, "facts", mode="upsert", conflict_cols=["patient", "concept"]
    )
    second = spark.createDataFrame(
        [(2, "C2", 20.0), (3, "C3", 3.0)], "patient long, concept string, v double"
    )
    write_postgres_copy(
        second, pg_dsn, "facts", mode="upsert", conflict_cols=["patient", "concept"]
    )
    got = _copy_out(pg_dsn, "SELECT patient, concept, v FROM facts ORDER BY patient")
    assert got == [["1", "C1", "1"], ["2", "C2", "20"], ["3", "C3", "3"]]
    # staging table cleaned up
    left = run_psql(
        pg_dsn,
        "SELECT count(*) FROM pg_tables WHERE tablename = 'facts__staging'",
    )
    assert "0" in left


def test_copy_loads_reference_shaped_facts(spark, pg_dsn):
    """An observation_fact-shaped frame (the reference's COPY target,
    ExpressionDataProcessor.groovy:187-195) lands with exact counts
    and aggregate parity."""
    facts = spark.createDataFrame(
        [
            (i, f"C{i % 7}", "@", "N" if i % 3 else "T",
             None if i % 3 == 0 else float(i) / 4, "GSE0")
            for i in range(1, 201)
        ],
        "patient_num long, concept_cd string, modifier_cd string, "
        "valtype_cd string, nval_num double, sourcesystem_cd string",
    )
    run_psql(pg_dsn, 'DROP TABLE IF EXISTS "observation_fact"')
    assert write_postgres_copy(facts, pg_dsn, "observation_fact", chunk_rows=64) == 200
    got = _copy_out(
        pg_dsn,
        "SELECT count(*)::bigint, count(nval_num)::bigint, "
        "sum(nval_num)::double precision FROM observation_fact",
    )
    [n, n_val, s] = got[0]
    rows = facts.collect()
    assert int(n) == 200
    assert int(n_val) == sum(1 for r in rows if r.nval_num is not None)
    assert float(s) == sum(r.nval_num for r in rows if r.nval_num is not None)


def test_sequence_dictionary_dense_and_invariant(spark):
    """sinks.sequence_dictionary: dense start..start+V-1 ids in
    ascending surrogate order, deterministic across partitionings;
    apply_sequence keeps NULLs NULL and maps consistently across
    frames sharing the dictionary (FK consistency)."""
    from tmdataloader_spark.sinks import apply_sequence, sequence_dictionary

    surr = [9_223_372_036_854_000_000, -5, 42, 0, 7_777_777_777]
    dim = spark.createDataFrame(
        [(s,) for s in surr] * 3, "assay_id long"  # dupes collapse
    )
    dic = sequence_dictionary(dim, "assay_id", start=100)
    rows = sorted((r.value, r.seq_id) for r in dic.collect())
    # dense bijection over start..start+V-1 (order arbitrary-but-stable,
    # like a DB sequence), every distinct surrogate covered exactly once
    assert sorted(r[1] for r in rows) == [100, 101, 102, 103, 104]
    assert [r[0] for r in rows] == sorted(surr)
    # partitioning-invariant
    dic13 = sequence_dictionary(dim.repartition(13), "assay_id", start=100)
    assert sorted(map(tuple, dic13.collect())) == sorted(map(tuple, dic.collect()))

    facts = spark.createDataFrame(
        [(1, 42), (2, None), (3, 9_223_372_036_854_000_000)],
        "pk long, assay_id long",
    )
    out = {r.pk: r.assay_id for r in apply_sequence(facts, "assay_id", dic).collect()}
    by_val = dict(rows)
    assert out[1] == by_val[42]
    assert out[2] is None
    assert out[3] == by_val[9_223_372_036_854_000_000]


def test_q_ident_escapes_embedded_quotes():
    """Identifier quoting must double embedded double quotes (r9
    ADVICE) — pure string checks, no live database needed."""
    from pyspark.sql import SparkSession

    from tmdataloader_spark.sinks import _q_ident, _q_table

    assert _q_ident('plain') == '"plain"'
    assert _q_ident('we"ird') == '"we""ird"'
    assert _q_table('sch"ema.ta"ble') == '"sch""ema"."ta""ble"'

    spark = SparkSession.getActiveSession()
    if spark is not None:
        from tmdataloader_spark.sinks import pg_create_table_sql

        df = spark.createDataFrame([(1,)], ['col"umn'])
        ddl = pg_create_table_sql(df, 'evil"name')
        assert '"col""umn" bigint' in ddl
        assert '"evil""name"' in ddl


def _expected_staging(table: str, counter: int) -> str:
    """Mirror of the sink's staging-name derivation (hash nonce +
    41-char prefix so the identifier never exceeds NAMEDATALEN)."""
    import hashlib
    import socket

    nonce = hashlib.sha256(
        f"{socket.gethostname()}:{os.getpid()}:{counter}".encode()
    ).hexdigest()[:12]
    return f"{table.rpartition('.')[2][:41]}__staging_{nonce}"


def test_upsert_staging_per_run_and_self_healing(spark, pg_dsn):
    """r10/r11 ADVICE: the upsert staging name carries a
    host+pid+counter nonce (concurrent upserts — even from two hosts
    against one database — must not drop each other's staging), and
    the sink pre-drops its staging name before CREATE so a
    hard-crashed prior run (kill -9 before the finally, then
    pid/counter reuse) cannot brick every subsequent upsert."""
    import tmdataloader_spark.sinks as sinks

    df = spark.createDataFrame([(1, "a"), (2, "b")], "pk long, s string")
    run_psql(pg_dsn, 'DROP TABLE IF EXISTS "ups_heal"')
    # leak a stale staging table under the NAME THE NEXT UPSERT WILL
    # USE, with a conflicting schema — the pre-drop must heal it
    nxt = next(sinks._staging_counter) + 1
    leaked = _expected_staging("ups_heal", nxt)
    run_psql(pg_dsn, f'CREATE TABLE "{leaked}" ("wrong" text)')
    n = write_postgres_copy(
        df, pg_dsn, "ups_heal", mode="upsert", conflict_cols=["pk"]
    )
    assert n == 2
    rows = _copy_out(pg_dsn, 'SELECT "pk", "s" FROM "ups_heal" ORDER BY "pk"')
    assert rows == [["1", "a"], ["2", "b"]]
    # no staging table survives the run
    left = run_psql(
        pg_dsn,
        "SELECT count(*) FROM pg_tables WHERE tablename ~ '^ups_heal__staging'",
    )
    assert left.strip() == "0"


def test_upsert_staging_respects_namedatalen(spark, pg_dsn):
    """r11 ADVICE: a long target table name must NOT push the staging
    identifier past Postgres's 63-byte NAMEDATALEN — the server
    silently truncates the tail, cutting off the distinguishing nonce
    first, so two concurrent upserts could collapse onto one truncated
    name and the pre-drop would kill the other run's live staging
    mid-COPY. The sink hashes the nonce and truncates the PREFIX."""
    import tmdataloader_spark.sinks as sinks

    # 56-char base name: old scheme would have been 56+10+host(<=24)
    # +pid+ctr > 63; new scheme is 41 + 10 + 12 = 63 exactly
    long_name = "de_subject_sample_mapping_with_a_very_long_suffix_tail_x"
    assert len(long_name) == 56
    nxt = next(sinks._staging_counter) + 1
    staged = _expected_staging(long_name, nxt)
    assert len(staged.encode()) == 63
    df = spark.createDataFrame([(1, "a"), (2, "b")], "pk long, s string")
    run_psql(pg_dsn, f'DROP TABLE IF EXISTS "{long_name}"')
    n = write_postgres_copy(
        df, pg_dsn, long_name, mode="upsert", conflict_cols=["pk"]
    )
    assert n == 2
    # upsert the same keys again (fresh counter → fresh staging) to
    # prove the second run's staging never collides with residue
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "pk long, s string")
    assert write_postgres_copy(
        df2, pg_dsn, long_name, mode="upsert", conflict_cols=["pk"]
    ) == 2
    rows = _copy_out(pg_dsn, f'SELECT "pk", "s" FROM "{long_name}" ORDER BY "pk"')
    assert rows == [["1", "a"], ["2", "B"], ["3", "c"]]
    left = run_psql(
        pg_dsn,
        "SELECT count(*) FROM pg_tables WHERE tablename ~ '__staging_'",
    )
    assert left.strip() == "0"


def test_upsert_drop_failure_does_not_mask_body_error(spark, monkeypatch):
    """r10 ADVICE: when the database dies mid-COPY, the finally's
    staging DROP also fails — that failure must be suppressed (warned)
    so the ORIGINAL COPY error propagates, not the drop's."""
    import tmdataloader_spark.sinks as sinks

    calls = []

    def fake_run_psql(dsn, sql, stdin=None):
        calls.append(sql)
        if "\\copy" in sql:
            raise RuntimeError("db unreachable (copy)")
        if sql.startswith("DROP TABLE IF EXISTS") and len(calls) > 2:
            raise RuntimeError("db unreachable (drop)")
        return ""

    monkeypatch.setattr(sinks, "run_psql", fake_run_psql)
    df = spark.createDataFrame([(1, "a")], "pk long, s string")
    with pytest.warns(UserWarning, match="staging"):
        with pytest.raises(RuntimeError, match="copy"):
            sinks.write_postgres_copy(
                df, "dsn://dead", "t", mode="upsert", conflict_cols=["pk"],
                create=False,
            )
