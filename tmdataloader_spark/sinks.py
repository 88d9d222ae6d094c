"""Warehouse sinks (SURVEY.md §2.1 S8) + the single-instance process
lock (S10).

- Parquet (primary): partitioned-by-study writes live in
  plans/hdd.write_partitioned.
- JDBC (optional tranSMART sink): the BASELINE north-star names a
  JDBC sink for loading a real tranSMART database — a thin wrapper
  over ``df.write.jdbc`` with the reference's batch sizing
  (ExpressionDataProcessor.groovy:200: 1000-row batches for matrix
  data; 100/500 for mappings/platforms).
- Process lock: tools/ProcessLocker.groovy / CommandLineTool.groovy:
  76-86 — one loader instance per lock file.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import socket
import subprocess
import warnings
from contextlib import contextmanager

#: per-process monotonic suffix for upsert staging tables — combined
#: with the pid it keeps concurrent upserts to one table from sharing
#: (and dropping) each other's staging
_staging_counter = itertools.count()

from pyspark.sql import DataFrame, functions as F


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
    properties: dict | None = None,
    num_partitions: int | None = None,
) -> None:
    """Batched JDBC write (S8). ``batch_size`` maps to the JDBC
    ``batchsize`` option — the Spark analog of the reference's
    ``sql.withBatch(1000, ...)``; ``num_partitions`` caps concurrent
    connections (each partition opens one)."""
    props = {"batchsize": str(batch_size), **(properties or {})}
    out = df
    if num_partitions is not None:
        out = df.coalesce(num_partitions)
    out.write.mode(mode).options(**props).jdbc(url, table, properties=props)


# ---------------------------------------------------------------------------
# Postgres COPY sink — the reference's ACTUAL production write path.
# The reference loads tranSMART through COPY-based bulk loading
# (build.gradle:48-49 pulls a CSV-to-COPY DataLoader, wrapped by the
# reference's CsvFileLoader.groovy; e.g.
# ExpressionDataProcessor.groovy:187-195 streams matrix rows into it),
# one COPY stream from the ETL host. This sink mirrors that shape:
# partitions stream through the driver (toLocalIterator — one
# partition resident at a time) into a single `psql \copy ... FROM
# STDIN (FORMAT csv)` pipe. That single-stream funnel is NOT a Spark
# limitation leaking in — it is the reference's own topology; on a
# cluster with a pg wire driver on the executors the same CSV encoding
# moves into foreachPartition for parallel COPY, but this container
# has psql only.
# ---------------------------------------------------------------------------

_PG_TYPES = {
    "long": "bigint",
    "bigint": "bigint",
    "int": "integer",
    "integer": "integer",
    "smallint": "smallint",
    "tinyint": "smallint",
    "double": "double precision",
    "float": "real",
    "string": "text",
    "boolean": "boolean",
    "binary": "bytea",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "date": "date",
}



def _q_ident(name: str) -> str:
    """Quote ONE SQL identifier, doubling embedded double quotes —
    without the doubling a name containing ``"`` produces malformed
    (and injectable, were names attacker-influenced) SQL handed to
    ``psql -c`` (r9 ADVICE)."""
    return '"' + str(name).replace('"', '""') + '"'


def _q_table(table: str) -> str:
    """Quote a possibly schema-qualified table name part-by-part
    ('deapp.de_variant_dataset' -> '"deapp"."de_variant_dataset"') so
    frames can land directly in the reference's schema-organized DDL."""
    return ".".join(_q_ident(p) for p in table.split("."))


def pg_create_table_sql(df: DataFrame, table: str) -> str:
    """``CREATE TABLE IF NOT EXISTS`` DDL for a frame's schema in
    Postgres types (decimals pass through as ``numeric(p,s)``)."""
    cols = []
    for name, dtype in df.dtypes:
        if dtype.startswith("decimal"):
            pg = dtype.replace("decimal", "numeric")
        else:
            pg = _PG_TYPES.get(dtype)
            if pg is None:
                raise ValueError(f"no Postgres mapping for Spark type {dtype!r}")
        cols.append(f'{_q_ident(name)} {pg}')
    return f'CREATE TABLE IF NOT EXISTS {_q_table(table)} ({", ".join(cols)})'


def _pg_csv_field(v) -> str:
    """One CSV field under ``NULL ''`` convention: None → bare empty,
    strings always quoted (so the empty STRING stays distinct from
    NULL), bytes → Postgres hex bytea literal, bool → t/f,
    datetime/date/numerics → ISO/repr text."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\x" + bytes(v).hex()
    if isinstance(v, str):
        return '"' + v.replace('"', '""') + '"'
    return str(v)  # int/float/Decimal/datetime/date


def run_psql(dsn: str, sql: str, stdin: bytes | None = None) -> str:
    """One ``psql`` invocation with ON_ERROR_STOP; returns stdout."""
    res = subprocess.run(
        # -t -A: tuples-only, unaligned — SELECT output is raw values
        # (one line per row, |-separated), no headers or footers
        ["psql", "-X", "-q", "-t", "-A", "-v", "ON_ERROR_STOP=1", dsn, "-c", sql],
        input=stdin,
        capture_output=True,
    )
    if res.returncode != 0:
        raise RuntimeError(f"psql failed: {res.stderr.decode(errors='replace')}")
    return res.stdout.decode()


def write_postgres_copy(
    df: DataFrame,
    dsn: str,
    table: str,
    mode: str = "append",
    conflict_cols: list[str] | None = None,
    create: bool = True,
    chunk_rows: int = 10000,
) -> int:
    """S8, Postgres dialect: bulk-load a frame via COPY — the
    reference's production mechanism (see module comment). Returns the
    row count written.

    ``mode='append'`` streams straight into ``table``;
    ``mode='upsert'`` (requires ``conflict_cols``) COPYs into a
    per-run ``{table[:41]}__staging_{hash12}`` table — the 12-hex
    nonce hashes (host, pid, counter) and the whole identifier stays
    ≤ 63 bytes (NAMEDATALEN), so concurrent upserts never share a
    staging even after server-side truncation — dropped in a
    ``finally`` (each chunked COPY is its own psql session, so TEMP
    won't span them)
    then applies
    ``INSERT ... ON CONFLICT (cols) DO UPDATE SET …`` — the dialect
    quirk a Derby round-trip cannot prove. ``chunk_rows`` bounds the
    bytes buffered per psql feed."""
    if mode not in ("append", "upsert"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "upsert" and not conflict_cols:
        raise ValueError("upsert mode requires conflict_cols")
    if create:
        run_psql(dsn, pg_create_table_sql(df, table))
        if mode == "upsert":
            # ON CONFLICT arbitration needs a unique index on the keys
            keys = ", ".join(_q_ident(c) for c in conflict_cols)
            # index names are schema-local — strip any schema qualifier
            idx = table.split(".")[-1] + "__conflict_key"
            run_psql(
                dsn,
                f'CREATE UNIQUE INDEX IF NOT EXISTS {_q_ident(idx)} '
                f'ON {_q_table(table)} ({keys})',
            )
    target = table
    if mode == "upsert":
        # per-run staging name (r10 ADVICE): concurrent upserts to the
        # same table must not share one staging — a fixed name let one
        # run's finally drop the other's staging mid-COPY and
        # interleaved COPYs mix rows. pid+counter alone still collides
        # when two HOSTS hit one database, so the host joins the nonce.
        # The nonce is a short HASH of (host, pid, counter) and the
        # base table name is truncated so the FULL identifier stays
        # within Postgres's 63-byte NAMEDATALEN (r11 ADVICE): a longer
        # name is silently truncated server-side, which cuts off the
        # distinguishing suffix first — two concurrent upserts then
        # collapse onto one truncated name and the unconditional
        # pre-drop below kills the other run's live staging mid-COPY.
        nonce = hashlib.sha256(
            f"{socket.gethostname()}:{os.getpid()}:{next(_staging_counter)}".encode()
        ).hexdigest()[:12]
        schema, _, base = table.rpartition(".")
        # '__staging_' (10) + 12-hex nonce = 22; 63 - 22 = 41 prefix
        stem = base[:41]
        staging_name = f"{stem}__staging_{nonce}"
        target = f"{schema}.{staging_name}" if schema else staging_name
        # self-healing pre-drop (r10 ADVICE): a prior hard-crashed run
        # (kill -9, OOM) can leak a staging table past its finally —
        # with pid reuse that name can collide, so drop unconditionally
        # before creating
        run_psql(dsn, f"DROP TABLE IF EXISTS {_q_table(target)}")
        run_psql(dsn, pg_create_table_sql(df, target).replace(
            "CREATE TABLE IF NOT EXISTS", "CREATE TABLE"))
    # explicit column list: the target may carry MORE columns than the
    # frame (serial id defaults, audit columns) — COPY then fills them
    # server-side, which is how our frames land in the reference's own
    # DDL (its tables all lead with a sequence-defaulted id)
    col_list = ", ".join(_q_ident(c) for c in df.columns)
    copy_sql = (
        f'\\copy {_q_table(target)} ({col_list}) FROM STDIN WITH (FORMAT csv, NULL \'\')'
    )
    n = 0
    buf: list[str] = []
    # the staging table cannot be a true TEMP table — each chunked
    # COPY is its own psql session — so it is a permanent table with a
    # GUARANTEED drop: the finally below removes it even when the run
    # dies between COPY and the final INSERT (r9 ADVICE — it used to
    # leak on that path)
    try:
        # toLocalIterator: ONE partition resident at a time — the
        # driver is a stream funnel, not an accumulator (reference
        # topology, above)
        for row in df.toLocalIterator():
            buf.append(",".join(_pg_csv_field(v) for v in row))
            n += 1
            if len(buf) >= chunk_rows:
                run_psql(dsn, copy_sql, ("\n".join(buf) + "\n").encode())
                buf = []
        if buf:
            run_psql(dsn, copy_sql, ("\n".join(buf) + "\n").encode())
        if mode == "upsert":
            cols = ", ".join(_q_ident(c) for c in df.columns)
            keys = ", ".join(_q_ident(c) for c in conflict_cols)
            sets = ", ".join(
                f'{_q_ident(c)} = EXCLUDED.{_q_ident(c)}'
                for c in df.columns
                if c not in conflict_cols
            )
            action = f"DO UPDATE SET {sets}" if sets else "DO NOTHING"
            run_psql(
                dsn,
                f'INSERT INTO {_q_table(table)} ({cols}) SELECT {cols} FROM {_q_table(target)} '
                f"ON CONFLICT ({keys}) {action}",
            )
    finally:
        if mode == "upsert":
            try:
                run_psql(dsn, f"DROP TABLE IF EXISTS {_q_table(target)}")
            except Exception as drop_exc:  # noqa: BLE001
                # an unreachable database makes this drop fail too —
                # suppress so the body's COPY/INSERT error propagates
                # instead of being masked (r10 ADVICE); the original
                # stays reachable via __context__ when we ARE the error
                warnings.warn(
                    f"failed to drop upsert staging table {target}: {drop_exc}",
                    stacklevel=2,
                )
    return n


def sequence_dictionary(df: DataFrame, col: str, start: int = 1) -> DataFrame:
    """Export-time sequence allocation: map the engine's 64-bit
    deterministic surrogates (xxhash64 of natural keys — see
    plans/hdd.build_sample_mapping) onto dense ids ``start..start+V−1``,
    the shape the reference's DDL expects: its surrogate columns are
    ``int`` filled from sequences (``nextval('deapp.seq_assay_id')``,
    I2B2_LOAD_SAMPLES.sql:729), so 64-bit hashes overflow them.

    Returns ``(value, seq_id int)`` — a dense bijection that is
    DETERMINISTIC and partitioning-invariant (ids follow the
    two-phase (pmod-bucket, value) prefix-sum order of
    operators/encode.build_dictionary — no global sort, no
    single-partition window; like a DB sequence, allocation order is
    arbitrary-but-stable, not numerically ascending). Build ONE
    dictionary per surrogate domain and apply it to every table
    referencing it so the foreign keys stay consistent."""
    from tmdataloader_spark.operators.encode import build_dictionary

    dic = build_dictionary(df, col, bucket_expr=F.pmod(F.col("value"), F.lit(64)))
    return dic.select(
        "value", (F.col("code") + F.lit(start)).cast("int").alias("seq_id")
    )


def apply_sequence(df: DataFrame, col: str, dictionary: DataFrame) -> DataFrame:
    """Replace surrogate ``col`` with its dense ``seq_id`` (NULL stays
    NULL — sequences never allocate for absent references)."""
    dic = dictionary.select(
        F.col("value").alias(col), F.col("seq_id").alias(f"_{col}_seq")
    )
    out = df.join(F.broadcast(dic), col, "left")
    return out.withColumn(col, F.col(f"_{col}_seq")).drop(f"_{col}_seq")


class ProcessLockError(RuntimeError):
    pass


@contextmanager
def process_lock(lock_path: str):
    """S10: single-instance lock via O_EXCL create; the pid goes into
    the file for debuggability. Raises ProcessLockError when another
    loader holds it."""
    try:
        fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ProcessLockError(f"another loader instance holds {lock_path}") from None
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield lock_path
    finally:
        try:
            os.unlink(lock_path)
        except FileNotFoundError:
            pass
