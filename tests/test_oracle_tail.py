"""DuckDB-oracle checks for the gate queries OUTSIDE the driver's
50-entry correctness window (__spark_entry__.queries() positions
51+). The driver never re-verifies these — this test keeps them
oracle-checked on every pytest run (at sf0.001, so the whole batch
stays fast) instead of merely pytest-covered.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

#: everything from position 51 on — keep in sync with queries()
TAIL = [
    "vcf_genotypes",
    "visit_suppression",
    "hash_split",
    "stratified_sample",
    "pair_counts",
    "rollup_agg",
    "moving_avg",
    "simhash",
    "multimodal_meta",
    "cleansing",
    "dedup_exact",
    "text_quality",
    "pii_redaction",
    "decontamination",
    "token_count",
    "fingerprint",
    "langid",
    "anti_join",
    "semi_join",
    "except_dropped",
    "union_exclusion",
    "first_value",
    "path_functions",
    "move_study",
    "delete_study",
    "visual_attributes",
    "timepoints",
    "bm25",
    "bm25_batch",
    "rrf_fuse",
    "mixture_sample",
    "dup_ngrams",
    "curation_report",
    "substr_dedup",
    "prototype_scores",
    "leakage_split",
    "ann_ivfpq",
    "ccnet_buckets",
]


@pytest.fixture(scope="module")
def oracle_con():
    from tools.check_correctness import oracle_connection

    return oracle_connection(SF)


def test_tail_list_matches_entry_order():
    import __spark_entry__ as entry

    assert list(entry.queries())[50:] == TAIL, (
        "queries() tail changed — update TAIL so every out-of-window "
        "query stays oracle-checked here"
    )


@pytest.mark.parametrize("name", TAIL)
def test_tail_query_matches_oracle(spark, oracle_con, name):
    from tools.check_correctness import check_query

    err = check_query(spark, oracle_con, name, SF)
    assert err is None, f"{name}: {err}"
