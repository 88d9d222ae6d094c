"""Live-database SQL script runner (sqlscripts.py — the
RunSqlScriptsCommand.groovy twin): manifest collection order, the
DBA-credentials hard error, psql \\i include resolution against a real
scratch PostgreSQL, --procedures-only scoping, and the CLI entry."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdataloader_spark.sinks import run_psql
from tmdataloader_spark.sqlscripts import collect_scripts, run_sql_scripts

pytestmark = pytest.mark.skipif(
    shutil.which("initdb") is None
    or shutil.which("pg_ctl") is None
    or shutil.which("psql") is None,
    reason="postgres binaries not available",
)


@pytest.fixture()
def sql_dir(tmp_path):
    """A miniature of the reference's sql/ tree: manifests that \\i
    relative include files, exactly like sql/postgres/migrations.sql
    does for its 20 migrations."""
    d = tmp_path / "sql" / "postgres"
    (d / "migrations").mkdir(parents=True)
    (d / "migrations" / "001_create.sql").write_text(
        "CREATE TABLE IF NOT EXISTS tm_demo (id bigint PRIMARY KEY, v text);\n"
    )
    (d / "migrations" / "002_alter.sql").write_text(
        "ALTER TABLE tm_demo ADD COLUMN IF NOT EXISTS n integer;\n"
    )
    (d / "migrations.sql").write_text(
        "\\i migrations/001_create.sql\n\\i migrations/002_alter.sql\n"
    )
    (d / "permissions.sql").write_text(
        "GRANT SELECT ON tm_demo TO PUBLIC;\n"
    )
    (d / "procedures.sql").write_text(
        "CREATE OR REPLACE FUNCTION tm_demo_count() RETURNS bigint AS "
        "$$ SELECT count(*) FROM tm_demo $$ LANGUAGE sql;\n"
    )
    return str(tmp_path / "sql")


def test_collect_scripts_order_and_scoping(sql_dir):
    full = collect_scripts(sql_dir)
    names = [os.path.basename(s) for s in full.dba_scripts]
    assert names == ["migrations.sql", "permissions.sql", "procedures.sql"]
    assert full.user_scripts == []
    proc = collect_scripts(sql_dir, procedures_only=True)
    assert [os.path.basename(s) for s in proc.dba_scripts] == ["procedures.sql"]
    with pytest.raises(ValueError, match="oracle"):
        collect_scripts(sql_dir, dialect="oracle")
    with pytest.raises(FileNotFoundError):
        collect_scripts(os.path.join(sql_dir, "nope"))


def test_dba_credentials_required(sql_dir):
    """RunSqlScriptsCommand.groovy:22-25 — the reference's message."""
    with pytest.raises(RuntimeError, match="DBA credentials"):
        run_sql_scripts(None, sql_dir, dba_dsn=None)


def test_scripts_apply_to_live_db(sql_dir, pg_dsn):
    run_psql(pg_dsn, "DROP TABLE IF EXISTS tm_demo; "
                     "DROP FUNCTION IF EXISTS tm_demo_count()")
    assert run_sql_scripts(pg_dsn, sql_dir, dba_dsn=pg_dsn) == 3
    # \i includes resolved: both migration files ran (column n exists)
    run_psql(pg_dsn, "INSERT INTO tm_demo VALUES (1, 'a', 10), (2, 'b', 20)")
    assert "2" in run_psql(pg_dsn, "SELECT tm_demo_count()")
    # idempotent re-run (IF NOT EXISTS / OR REPLACE), reference-style
    assert run_sql_scripts(pg_dsn, sql_dir, dba_dsn=pg_dsn) == 3

    # procedures_only touches only procedures.sql
    run_psql(pg_dsn, "DROP FUNCTION tm_demo_count()")
    assert run_sql_scripts(pg_dsn, sql_dir, dba_dsn=pg_dsn,
                           procedures_only=True) == 1
    assert "2" in run_psql(pg_dsn, "SELECT tm_demo_count()")


def test_failing_statement_aborts(sql_dir, pg_dsn):
    bad = os.path.join(sql_dir, "postgres", "procedures.sql")
    with open(bad, "w") as fh:
        fh.write("SELECT 1;\nSELECT * FROM table_that_never_exists;\n")
    with pytest.raises(RuntimeError, match="procedures.sql failed"):
        run_sql_scripts(pg_dsn, sql_dir, dba_dsn=pg_dsn, procedures_only=True)


def test_cli_entry(sql_dir, pg_dsn, capsys):
    from tmdataloader_spark.cli import main

    run_psql(pg_dsn, "DROP TABLE IF EXISTS tm_demo; "
                     "DROP FUNCTION IF EXISTS tm_demo_count()")
    rc = main(["--run-sql-scripts", sql_dir, "--dba-dsn", pg_dsn])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Running script as dba: migrations.sql..." in out
    assert "Completed: 3 scripts executed" in out
    # missing credentials -> reference's error, nonzero exit
    assert main(["--run-sql-scripts", sql_dir]) == 1
    assert "DBA credentials" in capsys.readouterr().err


def test_reference_manifests_parse_shape():
    """The REAL sql/postgres manifests (which target a full tranSMART
    database with roles/tablespaces we cannot create here) are at
    least structurally what the runner expects: existing files whose
    \\i targets all exist relative to the manifest directory."""
    ref = "/root/reference/sql"
    if not os.path.isdir(os.path.join(ref, "postgres")):
        pytest.skip("reference sql tree not present")
    scripts = collect_scripts(ref)
    assert [os.path.basename(s) for s in scripts.dba_scripts] == [
        "migrations.sql", "permissions.sql", "procedures.sql",
    ]
    base = os.path.join(ref, "postgres")
    for manifest in scripts.dba_scripts:
        with open(manifest) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("\\i "):
                    inc = line[3:].strip()
                    assert os.path.isfile(os.path.join(base, inc)), inc
