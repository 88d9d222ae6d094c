"""llmdata/fuzzy.py: blocked edit-distance near-dup detection."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdataloader_spark.llmdata.fuzzy import fuzzy_dedup_keep_one, fuzzy_dup_pairs


def _docs(spark):
    rows = [
        (1, "The quick brown fox"),
        (2, "The quick brown fax"),          # dist 1 from 1
        (3, "The quick  Brown fox "),        # canon-equal to 1 -> dist 0
        (4, "The quick brown foxes jump"),   # dist 6 from 1 -> not a dup
        (5, "A totally different title"),    # different prefix block
        (6, "The quick crown fox"),          # dist 1 from 1, 2 from 2
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pairs_within_distance(spark):
    pairs = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_dup_pairs(_docs(spark), max_dist=2).collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 0  # canonicalization: case + whitespace collapse
    assert pairs[(1, 6)] == 1
    assert pairs[(2, 6)] == 2
    assert (1, 4) not in pairs  # beyond max_dist
    assert all(a < b for (a, b) in pairs)  # ordered, no self/mirror pairs


def test_prefix_blocking_misses_head_edits(spark):
    """Documented recall caveat: an edit inside the prefix window puts
    the pair in different blocks."""
    df = _docs(spark).union(
        _docs(spark).sparkSession.createDataFrame(
            [(7, "Xhe quick brown fox")], "doc_id long, text string"
        )
    )
    pairs = {(r.id_a, r.id_b) for r in fuzzy_dup_pairs(df, max_dist=2).collect()}
    assert (1, 7) not in pairs  # head edit -> different prefix-8 block


def test_keep_one_min_id_wins(spark):
    kept = {
        r.doc_id for r in fuzzy_dedup_keep_one(_docs(spark), max_dist=2).collect()
    }
    # 1 survives its cluster {1,2,3,6}; 4 and 5 are not duplicated
    assert kept == {1, 4, 5}


def test_length_band_is_lossless_within_block(spark):
    """A pair at edit distance d can differ in length by at most d, so
    the band never drops a true pair: construct a pair exactly at the
    band edge (length diff == max_dist) and assert it is found."""
    df = _docs(spark).sparkSession.createDataFrame(
        [(10, "prefix99 abcdef"), (11, "prefix99 abcdefgh")],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_dup_pairs(df, max_dist=2).collect()
    }
    assert pairs[(10, 11)] == 2
