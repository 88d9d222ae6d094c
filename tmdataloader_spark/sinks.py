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

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame


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
