"""A9/A10 violation-report operators and the F12 public tag
substitution API (r7 debut gate queries: visit_consistency,
study_uniqueness, tag_substitution).

The abort ASSERTS were already e2e-covered (test_clinical_fixtures);
these pin the report-frame shapes the new gate queries expose —
exactly which groups/ids surface, and that the reports agree with
the asserts they feed.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_visit_consistency_report_flags_only_mixed_groups(spark):
    from tmdataloader_spark.operators.dedup import visit_consistency_report

    df = spark.createDataFrame(
        [
            # group A: all visits set -> consistent
            ("c1", "l1", "v1", "V1"),
            ("c1", "l1", "v1", "V2"),
            # group B: all null -> consistent
            ("c1", "l2", "v1", None),
            ("c1", "l2", "v1", None),
            # group C: mixed -> VIOLATION (2 set, 1 null)
            ("c2", "l1", "v1", "V1"),
            ("c2", "l1", "v1", None),
            ("c2", "l1", "v1", "V3"),
        ],
        "category_cd string, data_label string, data_value string, visit_name string",
    )
    rows = visit_consistency_report(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.category_cd, r.data_label, r.data_value) == ("c2", "l1", "v1")
    assert (r.n_null, r.n_set) == (1, 2)


def test_visit_consistency_assert_uses_report(spark):
    from tmdataloader_spark.operators.dedup import (
        LoadValidationError,
        assert_visit_name_consistency,
    )

    good = spark.createDataFrame(
        [("c1", "l1", "v1", "V1"), ("c1", "l2", "v1", None)],
        "category_cd string, data_label string, data_value string, visit_name string",
    )
    assert_visit_name_consistency(good)  # no raise
    bad = good.union(
        spark.createDataFrame(
            [("c1", "l1", "v1", None)],
            "category_cd string, data_label string, data_value string, visit_name string",
        )
    )
    with pytest.raises(LoadValidationError, match="inconsistent visit names"):
        assert_visit_name_consistency(bad)


def test_study_id_report_counts_rows_and_files(spark):
    from tmdataloader_spark.operators.dedup import study_id_report

    df = spark.createDataFrame(
        [
            ("GSE1", "a.txt"),
            ("GSE1", "a.txt"),
            ("GSE1", "b.txt"),
            ("GSE2", "c.txt"),
        ],
        "study_id string, source_file string",
    )
    got = {
        r.study_id: (r.n_rows, r.n_files)
        for r in study_id_report(df, file_col="source_file").collect()
    }
    assert got == {"GSE1": (3, 2), "GSE2": (1, 1)}
    # >1 report row IS the abort condition the reference raises on
    assert len(got) > 1

    # without file_col: just (study_id, n_rows)
    slim = study_id_report(df)
    assert slim.columns == ["study_id", "n_rows"]


def test_substitute_tags_markers_plus_mapping_and_drop(spark):
    from tmdataloader_spark.sources.mapping import substitute_tags

    df = spark.createDataFrame(
        [
            (1, "AUTOMOBILE", "Grp+3"),  # '+' in value -> (plus)
            (2, "BUILDING", ""),  # empty referenced tag -> dropped
            (3, "MACHINERY", None),  # null referenced tag -> dropped
        ],
        "id long, segment string, cohort string",
    )
    out = substitute_tags(
        df,
        "Clinical+$$SEGMENT+Data+$${COHORT}",
        {"SEGMENT": "segment", "COHORT": "cohort"},
    )
    rows = out.select("id", "category_cd").collect()
    assert len(rows) == 1
    # SEGMENT mangles to A (first appearance), COHORT to B; partial
    # tag keeps its braces around the substituted value
    assert rows[0].category_cd == "Clinical+$$AAUTOMOBILE+Data+$$B{Grp(plus)3}"


def test_substitute_tags_unknown_tag_raises(spark):
    from tmdataloader_spark.sources.mapping import MappingError, substitute_tags

    df = spark.createDataFrame([(1, "x")], "id long, segment string")
    with pytest.raises(MappingError, match="unknown tag"):
        substitute_tags(df, "A+$$NOPE", {"SEGMENT": "segment"})
