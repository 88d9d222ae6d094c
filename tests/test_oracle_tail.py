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
    # --- r11-green cohort (driver rows in CORRECTNESS_r11.json;
    # due back in the window at r14) ---
    "attribution",
    "basket_rules",
    "skyline",
    "cusum_changepoint",
    "calibration_curve",
    "quantile_normalize",
    "retention",
    "incremental_dedup",
    "semantic_dedup",
    "kmeans",
    "length_profile",
    "zorder",
    "hdd_leaf_paths",
    "seq_pack",
    "interval_join",
    "vocab_topk",
    "asof_join",
    "range_join",
    "gpl_info_join",
    "timepoint_minutes",
    "ann_block",
    "summary_stats",
    "validation_rules",
    "duplicate_detection",
    "demographics_pivot",
    "winnow",
    "merge_update",
    "tfidf",
    "repetition",
    "ann_cosine",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash_pairs",
    "pricing_summary",
    "probe_stats",
    "zscore",
    "median_exact",
    "probeset_collapse",
    "dedup_keep_one",
    "type_inference",
    "clinical_melt",
    "fill_in_tree",
    "tree_closure",
    "concept_counts",
    "visit_consistency",
    "study_uniqueness",
    "tag_substitution",
    "ann_ivfpq",
    "acgh_gene_backfill",
    "mixture_upsample",
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
