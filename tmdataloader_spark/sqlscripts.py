"""Live-database SQL script runner — the twin of the reference's
``RunSqlScriptsCommand`` (src/main/groovy/.../etl/
RunSqlScriptsCommand.groovy), which applies the shipped schema
migrations / permissions / stored-procedure definitions to a live
tranSMART database before any load runs against it.

Semantics mirrored from RunSqlScriptsCommand.groovy:39-66 (Postgres
branch):

- script set = ``sql/postgres/{migrations.sql, permissions.sql}``
  (skipped under ``procedures_only``) followed by
  ``sql/postgres/procedures.sql``; ALL of these are DBA scripts for
  Postgres, so a DBA connection is required and its absence is the
  reference's hard error (:22-25, "You should provide DBA
  credentials to run these scripts").
- each manifest is a psql ``\\i``-include file (e.g.
  sql/postgres/migrations.sql lists 20 ``\\i migrations/…`` lines),
  so execution goes through ``psql -f`` with the working directory
  set to the manifest's directory — a JDBC statement splitter cannot
  resolve ``\\i``, which is why the runner shells out exactly like
  the reference's command-line-backed ``Database.runScript``.
- the Oracle branch (:53-59) is not implemented: this engine targets
  the Postgres dialect (see sinks.write_postgres_copy) and no Oracle
  client exists here; asking for it raises, mirroring the
  reference's "Invalid database config" exit for unknown types.

This is a warehouse-bootstrap utility, not a data-plane operator —
it runs once per database, driver-side, no Spark session involved.
"""

from __future__ import annotations

import os
import subprocess
from dataclasses import dataclass, field


@dataclass
class Scripts:
    """RunSqlScriptsCommand.groovy:12-15."""

    dba_scripts: list[str] = field(default_factory=list)
    user_scripts: list[str] = field(default_factory=list)


def collect_scripts(
    sql_dir: str, dialect: str = "postgres", procedures_only: bool = False
) -> Scripts:
    """RunSqlScriptsCommand.groovy:39-66 — resolve the manifest set
    for the dialect; missing files are a hard error here (the
    reference would fail later inside runScript)."""
    if dialect != "postgres":
        raise ValueError(
            f"unsupported dialect {dialect!r} (reference Oracle branch "
            "needs an Oracle client; this engine targets Postgres)"
        )
    d = os.path.join(sql_dir, "postgres")
    scripts = Scripts()
    if not procedures_only:
        scripts.dba_scripts += [
            os.path.join(d, "migrations.sql"),
            os.path.join(d, "permissions.sql"),
        ]
    scripts.dba_scripts.append(os.path.join(d, "procedures.sql"))
    for s in scripts.dba_scripts + scripts.user_scripts:
        if not os.path.isfile(s):
            raise FileNotFoundError(s)
    return scripts


def run_script(dsn: str, script: str) -> None:
    """One manifest through ``psql -f`` with cwd at the manifest's
    directory so its relative ``\\i`` includes resolve; ON_ERROR_STOP
    makes any failed statement abort the run (Database.runScript's
    failOnError=true at RunSqlScriptsCommand.groovy:17-19)."""
    res = subprocess.run(
        [
            "psql", "-X", "-q", "-v", "ON_ERROR_STOP=1", dsn,
            "-f", os.path.basename(script),
        ],
        cwd=os.path.dirname(os.path.abspath(script)),
        capture_output=True,
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"script {os.path.basename(script)} failed: "
            f"{res.stderr.decode(errors='replace')}"
        )


def run_sql_scripts(
    dsn: str | None,
    sql_dir: str,
    dba_dsn: str | None = None,
    procedures_only: bool = False,
    dialect: str = "postgres",
) -> int:
    """RunSqlScriptsCommand.groovy:21-37 — run DBA scripts under the
    DBA connection (required when any exist), then user scripts under
    the regular one. Returns the number of scripts executed."""
    scripts = collect_scripts(sql_dir, dialect, procedures_only)
    if scripts.dba_scripts and not dba_dsn:
        raise RuntimeError(
            "You should provide DBA credentials to run these scripts"
        )
    for s in scripts.dba_scripts:
        print(f"Running script as dba: {os.path.basename(s)}...")
        run_script(dba_dsn, s)
    for s in scripts.user_scripts:
        print(f"Running script: {os.path.basename(s)}...")
        run_script(dsn, s)
    n = len(scripts.dba_scripts) + len(scripts.user_scripts)
    print(f"Completed: {n} scripts executed")
    return n
