"""Engine-portable 6dp rounding of exact integer ratios.

The class of bug this kills (caught live in r7 at sf0.1,
``lm_perplexity``): ``round(num/den, 6)`` where ``num`` and ``den``
are exact integers.  Whenever the true rational lands EXACTLY on a
.5 micro-unit boundary (num·10⁶·2 ≡ den (mod 2·den) — e.g.
−327752592/96·10⁶ = −3.4140895), the nearest double is a hair above
or below the half, and different engines' ``round`` implementations
(Spark: BigDecimal HALF_UP of the shortest decimal representation;
DuckDB: C-library rounding of the binary value) legitimately
disagree.  No amount of "round before comparing" fixes an exact
half — the only portable form is HALF_UP computed in INTEGER
arithmetic, then one exact ``/1e6``.

``round6_ratio`` (Spark Column) and ``round6_ratio_sql`` (the DuckDB
oracle twin) emit the same formula:

    micro = sign(num) · ((2·|num|·10⁶ + den) intdiv (2·den))
    result = micro / 1e6        -- double; exact, same bits anywhere

``intdiv`` is ``div`` in Spark (truncates toward zero) and ``//`` in
DuckDB (floors) — both branches feed them non-negative operands, on
which the two agree.

Preconditions (asserted by the call sites' semantics, not checked
here): ``den > 0``; ``|num| ≤ ~4.6e12`` so ``2·|num|·10⁶`` fits
int64 — fine for the per-group counts these ratios are built from.
For numerators that can exceed that at 100 TB (micro-unit SUMS),
embed a decimal cast in ``num_sql`` ("CAST(x AS DECIMAL(38,0))"):
Spark's ``div`` and DuckDB's ``//`` both take decimal/HUGEINT
dividends, and the QUOTIENT — a 6dp micro value — always fits
int64.  NULL num/den propagates to NULL, matching plain division.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _micro_case(num_sql: str, den_sql: str, intdiv: str, cast: str = "") -> str:
    # `cast` (DuckDB twin only) promotes the NUMERATOR before the
    # ×2·10⁶ blow-up and the operands of the integral division:
    # DuckDB evaluates inner arithmetic in INT64 (erroring on
    # overflow before any outer cast applies), and its `//` floors
    # only INTEGER operands (on DECIMALs it performs fractional
    # division) — HUGEINT fixes both, and oracle-side cost is
    # irrelevant.  Spark's `div` is integral on longs AND decimals,
    # so the Spark form stays as the caller wrote it: int64 by
    # default (hot-path cheap), decimal via the documented
    # CAST(x AS DECIMAL(38,0)) escape hatch in num_sql.
    n, d = f"({num_sql})", f"({den_sql})"
    if cast:
        # BOTH operands promote, or a stray DECIMAL term re-infects
        # the dividend and `//` goes fractional again
        n, d = f"CAST({n} AS {cast})", f"CAST({d} AS {cast})"
    return (
        f"(CASE WHEN {n} >= 0 "
        f"THEN (2 * {n} * 1000000 + {d}) {intdiv} (2 * {d}) "
        f"ELSE -((2 * (-{n}) * 1000000 + {d}) {intdiv} (2 * {d})) END)"
    )


def round6_ratio(num_sql: str, den_sql: str) -> Column:
    """Spark Column: ``round(num/den, 6)`` with integer-exact HALF_UP.
    ``num_sql``/``den_sql`` are SQL sub-expressions over columns in
    scope (integer-valued)."""
    micro = F.expr(_micro_case(num_sql, den_sql, "div"))
    return micro.cast("double") / F.lit(1e6)


def round6_ratio_sql(num_sql: str, den_sql: str) -> str:
    """DuckDB twin of :func:`round6_ratio` — splice into oracle SQL."""
    return (
        f"(CAST({_micro_case(num_sql, den_sql, '//', cast='HUGEINT')} AS DOUBLE)"
        f" / 1000000.0)"
    )
