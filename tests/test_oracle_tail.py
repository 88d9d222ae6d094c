"""DuckDB-oracle checks for the gate queries OUTSIDE the driver's
50-entry correctness window (__spark_entry__.queries() positions
51+). The driver never re-verifies these — this test keeps them
oracle-checked on every pytest run instead of merely pytest-covered.

Scale factor: sf0.01 — the SAME scale the driver checks the window
at. Round 4 proved sf0.001 (~500 docs) can miss cardinality-dependent
divergence (the sessionize float-sum flip only showed at sf0.01), so
the tail now pays the extra runtime for driver-equivalent evidence.
Override with SPARK_GRAFT_TAIL_SF_DIR for a quick local loop.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_TAIL_SF_DIR", "/root/testdata/sf0.01")

#: everything from position 51 on — keep in sync with queries()
TAIL = [
    # --- r12-checked cohort (driver rows in CORRECTNESS_r12.json;
    # due back in the window at r15) ---
    "profile_table",
    "table_checksum",
    "user_cardinality",
    "pagerank",
    "snapshot_diff",
    "html_extract",
    "mad_outliers",
    "scd2_history",
    "token_mixture",
    "trending",
    "range_window",
    "mixture_drift",
    "weighted_sample",
    "quantile_profile",
    "intersect_retained",
    "fuzzy_dedup",
    "linear_score",
    "dict_encode",
    "incremental_rollup",
    "negative_samples",
    "chi_square",
    "rate_limit",
    "sliding_distinct",
    "winsorize",
    "trend_fit",
    "resample_fill",
    "heavy_hitters",
    "value_histograms",
    "bm25",
    "bm25_batch",
    "rrf_fuse",
    "mixture_sample",
    "curation_report",
    "substr_dedup",
    "prototype_scores",
    "leakage_split",
    "ccnet_buckets",
    "pair_counts",
    "rollup_agg",
    "sessionize",
    "ks_drift",
    "pr_curve",
    "roc_auc",
    "lm_perplexity",
    "visit_suppression",
    "moving_avg",
    # r14 debut (DEBUT_OVERFLOW until the r15 window): merged
    # epoch-shuffle + HLL gate
    "epoch_shuffle_hll",
    # --- r13-checked cohort (driver rows in CORRECTNESS_r13.json;
    # due back in the window at r16) ---
    "skew_report",
    "salted_join",
    "bpe_encode",
    "triangle_count",
    "link_predict",
    "event_transitions",
    "interarrival_profile",
    "diversity_profile",
    "vcf_genotypes",
    "simhash",
    "cleansing",
    "dedup_exact",
    "text_quality",
    "pii_redaction",
    "decontamination",
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
    "funnel",
    "event_rollup",
    "curate",
    "fact_assembly",
    "quota_sample",
    "dedup_clusters",
    "json_rollup",
    "embedding_dedup",
    "chunk_docs",
    "ann_ivf",
    "plink_fam",
    "vcf_assay_link",
    "add_nodes",
    "security_tokens",
    "text_signals",
    "snp_gene_novelty",
    "prune_nodes",
    "audit_ordering",
    "stratified_sample",
    "random_projection",
    "pmi_collocations",
    "dup_ngrams",
    "sliding_rollup",
    "ann_lsh",
    "cube_agg",
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
