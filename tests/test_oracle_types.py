"""Oracle OUTPUT-TYPE assertions over EVERY gate query (r5 VERDICT
item 4, made permanent).

The driver's value hash is type-sensitive at the Arrow level: DuckDB
widens integer ``sum()`` to HUGEINT, which Arrow exports as
decimal128(38,0), so a bit-identical result still hash-mismatches
(this exact class cost rounds 4 AND 5 — sessionize, roc_auc,
pr_curve, ks_drift).  tests/test_oracle_tail.py only covers queries
outside the driver's 50-row window; this module DESCRIBEs every
oracle (window included) against its Spark plan schema WITHOUT
executing either, so a generated oracle (bpe_encode, lm_perplexity,
triangle_count, ...) can never reintroduce the class.

Cheap by construction: no collect() on either engine — Spark only
builds the plan, DuckDB only binds the SQL.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_TAIL_SF_DIR", "/root/testdata/sf0.01")


def _names():
    import __spark_entry__ as entry

    return list(entry.queries())


@pytest.fixture(scope="module")
def oracle_con():
    from tools.check_correctness import oracle_connection

    return oracle_connection(SF)


@pytest.mark.parametrize("name", _names())
def test_oracle_types_match_spark(spark, oracle_con, name):
    from tools.check_correctness import check_query

    err = check_query(spark, oracle_con, name, SF, types_only=True)
    assert err is None, f"{name}: {err}"


@pytest.mark.parametrize("name", _names())
def test_no_complex_output_types(spark, name):
    """No gate query may emit a top-level ARRAY/MAP/STRUCT column —
    the driver's pandas canonicalizer sorts output columns with
    ``sort_values`` and raises ``unhashable type: 'list'`` on them
    (r6 random_projection).  Plan-only; covers rows-only queries the
    oracle DESCRIBE sweep skips."""
    import __spark_entry__ as entry
    from tools.check_correctness import is_complex_dtype

    sdf = entry.queries()[name](spark, SF)
    bad = [(c, t) for c, t in sdf.dtypes if is_complex_dtype(t)]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} — the driver "
        f"cannot canonicalize these; flatten to scalar columns"
    )
