"""Deterministic HyperLogLog distinct-count sketch with a
register-exact streaming twin.

Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA). The engine already exposes
two cardinality paths (operators/eventflow.py ``user_cardinality``:
exact ``count_distinct`` — the oracle-checked gate query — and
Spark's built-in ``approx_count_distinct`` HLL++ for the one-pass
100 TB shape). What NEITHER gives is a sketch the STREAMING side can
hold as bounded per-key state and that batch replay can reconcile
REGISTER-FOR-REGISTER — Spark's built-in sketch is opaque to
``applyInPandasWithState``. This module closes that: the hash, the
bucket/rank split, and the register merge are all integer-exact and
engine-independent, so

    ``cardinality_monitor_stream`` final registers
        == ``hll_registers`` over the landed log, bit for bit,

the same reconciliation contract as drift_monitor_stream ↔
cusum_changepoint.

Determinism recipe (no engine may disagree):
- hash = first 15 hex chars of ``md5(id)`` as a 60-bit integer
  (Spark ``conv(substring(md5,1,15),16,10)``; Python
  ``int(hexdigest[:15],16)``),
- bucket = low ``b`` bits, v = high ``60-b`` bits,
- rank = ``w - bit_length(v) + 1`` (``w+1`` when v = 0) — bit_length
  via ``length(conv(v,10,2))`` in Spark, ``int.bit_length`` in
  Python: both exact,
- the harmonic sum Σ2^-rank is kept as the EXACT integer
  Z = Σ 2^(w+1-rank) (≤ m·2^(w+1) < 2^63 for b ≥ 9), so the only
  float ops are the final α·m²·2^(w+1)/Z division and the
  linear-counting ``ln`` — compared to 1e-12 in tests (libm vs JVM
  log may differ in the last ulp; registers compare exactly).

100 TB shape: ``hll_registers`` is two map-side-combined keyed
aggregates (at most |keys|·m rows after the first); the stream holds
m longs per key (b=9 → 4 KiB) forever — constant state, like the
Misra-Gries and CUSUM monitors.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

#: default precision: 2^9 = 512 registers, rsd ≈ 1.04/√512 ≈ 4.6%
DEFAULT_B = 9


def _alpha(m: int) -> float:
    """HLL bias-correction constant (Flajolet 2007 §4)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hash60(value: str) -> int:
    """60-bit md5 hash — Python twin of the Spark expression."""
    return int(hashlib.md5(value.encode()).hexdigest()[:15], 16)


def _bucket_rank(h: int, b: int) -> tuple[int, int]:
    """(bucket, rank) split of a 60-bit hash."""
    w = 60 - b
    bucket = h & ((1 << b) - 1)
    v = h >> b
    rank = (w + 1) if v == 0 else (w - v.bit_length() + 1)
    return bucket, rank


def estimate_from_registers(regs: list[int], b: int) -> float:
    """HLL estimate from one key's register array (0 = empty bucket).
    Shared by the streaming monitor; the batch ``hll_estimate``
    mirrors the same arithmetic in Spark expressions."""
    m = 1 << b
    w = 60 - b
    z_int = sum(1 << (w + 1 - r) for r in regs)  # exact integer
    e_raw = _alpha(m) * m * m * float(1 << (w + 1)) / float(z_int)
    zeros = sum(1 for r in regs if r == 0)
    if e_raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return e_raw


def hll_registers(
    df: DataFrame,
    key_col: str = "event_type",
    id_col: str = "user_id",
    b: int = DEFAULT_B,
) -> DataFrame:
    """Batch registers: ``(key, bucket, rank)`` — the mergeable sketch
    state, one map-side-combined aggregate, at most |keys|·2^b rows.
    Empty buckets are absent (rank 0 implied)."""
    w = 60 - b
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    v = F.shiftright(h, b)
    # bit_length(v) = length of the binary string; conv(0,10,2)='0'
    # would give 1, so the v=0 case is explicit
    rank = F.when(v == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.conv(v, 10, 2)) + F.lit(1)
    )
    return (
        # drop NULL ids: md5(NULL) is NULL, which would emit a
        # (key, NULL bucket, NULL rank) row that hll_estimate's
        # count(*)-based _n_present would count as a filled bucket,
        # skewing the zeros/linear-counting branch (r8 ADVICE); the
        # stream twin drops the same rows so registers stay
        # bit-identical
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            (h % F.lit(1 << b)).cast("long").alias("bucket"),
            rank.cast("long").alias("rank"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(registers: DataFrame, b: int = DEFAULT_B) -> DataFrame:
    """Per-key cardinality estimate from a ``hll_registers`` frame:
    ``(key, est_distinct double)``. The harmonic sum is an exact
    integer (Z = Σ 2^(w+1-rank), absent buckets contribute
    2^(w+1)), so the estimate is bit-stable across partitionings;
    only the final division / ln are float."""
    m = 1 << b
    w = 60 - b
    # the Python F.shiftleft only takes a literal bit count; the SQL
    # form accepts an expression for both operands
    per_key = registers.groupBy("key").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({w + 1} - rank AS INT))"))
        .cast("long")
        .alias("_z_present"),
        F.count("*").cast("long").alias("_n_present"),
    )
    zeros = F.lit(m) - F.col("_n_present")
    z_int = F.col("_z_present") + zeros * F.lit(1 << (w + 1)).cast("long")
    e_raw = (
        F.lit(_alpha(m) * m * m * float(1 << (w + 1))) / z_int.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return per_key.select("key", est.alias("est_distinct"))


def hll_cardinality(
    df: DataFrame,
    key_col: str = "event_type",
    id_col: str = "user_id",
    b: int = DEFAULT_B,
) -> DataFrame:
    """Convenience: ``hll_estimate(hll_registers(df))`` —
    ``(key, est_distinct)``."""
    return hll_estimate(hll_registers(df, key_col, id_col, b), b)


_MONITOR_OUTPUT_SCHEMA = (
    "key string, batch_rows long, est_distinct double, filled_buckets long"
)


def cardinality_monitor_stream(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "user_id",
    b: int = DEFAULT_B,
) -> DataFrame:
    """Streaming per-key distinct-count monitor: HLL registers as
    ``applyInPandasWithState`` state (``array<long>`` of 2^b
    registers — constant ~4 KiB/key at b=9, runs indefinitely), one
    output row per key per micro-batch with the running estimate.

    Reconciliation contract: after any prefix of the stream, the
    state registers equal ``hll_registers`` over the same landed
    rows bit-for-bit (register merge is a max — order/batching
    independent), and the emitted estimate equals
    ``hll_estimate``'s to float-division determinism."""
    m = 1 << b
    # Stringify the id JVM-side: the batch twin hashes
    # md5(CAST(id AS STRING)), and casting in the plan means pandas
    # never sees a numeric column at all. The previous pandas-side
    # pin-back (float64→int64 after a NULL floated the Arrow batch)
    # was lossy for ids > 2^53 — float64 has 53 mantissa bits, so the
    # stream hashed a rounded id while batch hashed the exact one
    # (r9 ADVICE); Spark's own long→string cast is exact at any width.
    events = events.withColumn(id_col, F.col(id_col).cast("string"))

    def fn(key, pdfs: Iterable, state) -> Iterator:
        import pandas as pd

        (key_val,) = key
        (regs,) = state.get if state.exists else ([0] * m,)
        regs = list(regs)
        n_rows = 0
        for pdf in pdfs:
            n_rows += len(pdf)
            # dropna BEFORE astype(str): stringifying first would
            # register the literal 'None'/'nan' as real elements while
            # the batch twin's md5(NULL)=NULL contributes nothing —
            # breaking the register-exact reconciliation (r8 ADVICE)
            ids = pdf[id_col].dropna()
            for raw in ids.astype(str):
                bucket, rank = _bucket_rank(_hash60(raw), b)
                if rank > regs[bucket]:
                    regs[bucket] = rank
        if n_rows == 0:
            return
        state.update((regs,))
        yield pd.DataFrame(
            [
                {
                    "key": key_val,
                    "batch_rows": n_rows,
                    "est_distinct": estimate_from_registers(regs, b),
                    "filled_buckets": sum(1 for r in regs if r > 0),
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=_MONITOR_OUTPUT_SCHEMA,
        stateStructType="regs array<long>",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
