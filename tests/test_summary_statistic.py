"""Golden-file test: SummaryStatistic.txt byte-compare against the
reference's shipped expectation (SURVEY.md §5, ClinicalDataProcessorTest
.groovy:48-61)."""

import io

from tmdataloader_spark.statistic.summary import summary_statistics, write_report

MAPPING = (
    "/root/reference/fixtures/Test Studies/Test Study_GSE0/"
    "ClinicalDataToUpload/Test Study_GSE0_Mapping_File.txt"
)
GOLDEN = (
    "/root/reference/fixtures/Test Studies/Test Study_GSE0/"
    "ClinicalDataToUpload/ExpectedSummaryStatistic.txt"
)


def test_summary_statistic_golden(spark):
    rows = summary_statistics(spark, MAPPING)
    buf = io.StringIO()
    write_report(rows, buf)
    actual = buf.getvalue().splitlines()
    expected = open(GOLDEN, encoding="utf-8").read().splitlines()
    assert len(actual) == len(expected), (
        f"line count {len(actual)} != {len(expected)}\n" + "\n".join(actual)
    )
    for i, (a, e) in enumerate(zip(actual, expected)):
        assert a == e, f"line {i} differs:\n  actual:   {a!r}\n  expected: {e!r}"


def test_exact_stats_guard_rejects_oversized_file(spark, monkeypatch):
    """The exact-median kernel is contract-bounded: a file larger than
    MAX_EXACT_STAT_ROWS fails fast with LoadValidationError instead of
    materializing a giant collect_list buffer."""
    import pytest

    from tmdataloader_spark.operators.dedup import LoadValidationError
    from tmdataloader_spark.sources.mapping import parse_mapping_file
    from tmdataloader_spark.statistic import summary
    from pathlib import Path

    monkeypatch.setattr(summary, "MAX_EXACT_STAT_ROWS", 5)
    fname, fm = next(iter(parse_mapping_file(Path(MAPPING)).items()))
    with pytest.raises(LoadValidationError, match="exact-statistics"):
        summary.collect_file_statistics(spark, Path(MAPPING).parent / fname, fm)
