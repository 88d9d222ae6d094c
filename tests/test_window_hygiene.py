"""Window-rotation hygiene (r04 VERDICT item 8, made permanent).

The driver's correctness gate only re-verifies the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so a query parked in the
tail can silently go unverified-by-the-driver forever (rounds 3 and 4
each caught real bugs — ten unchecked queries in r3, the sessionize
float-sum flip in r4 — purely by rotating stale queries back in).

This test makes the rotation policy enforceable: every gate query must
either sit in the CURRENT window (it will be driver-checked next run)
or have a recorded driver row in one of the LAST TWO
``CORRECTNESS_r*.json`` files. A query that would sit out two driver
rounds in a row turns this red, and the fix is always the same —
rotate it into the window and move a recently-checked query out.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _last_correctness_files(n: int = 2, repo: str = REPO) -> list[str]:
    files = glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))

    def roundno(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return sorted(files, key=roundno)[-n:]


def _keys(path: str) -> set[str]:
    with open(path) as f:
        return set(json.load(f))


def _effective_recent_files(window: set[str], files3: list[str]) -> list[str]:
    """The CORRECTNESS files staleness is measured against.

    ``files3`` is the last (up to) three files, oldest first.  At
    JUDGE time the newest file IS the current window: the driver just
    checked these 50 and the next round's head-swap hasn't happened
    yet (r11 VERDICT item 1 — the structural transient that made the
    hygiene tests red at every judge instant).  In that pre-swap
    state the round was closed green against the two files BEFORE the
    newest, and the newest file adds no coverage the window doesn't
    already have — so evaluate against those two.  In every other
    state (the builder's mid-round view, after the swap) the newest
    file is a genuine second recency source: use the last two.
    """
    if files3 and _keys(files3[-1]) == window:
        return files3[:-1][-2:]
    return files3[-2:]


def _stale_queries(names: list[str], files3: list[str], exempt: set[str]) -> list[str]:
    window = set(names[:WINDOW])
    recent: set[str] = set()
    for path in _effective_recent_files(window, files3):
        recent |= _keys(path)
    return [
        q
        for q in names
        if q not in window and q not in recent and q not in exempt
    ]


def _next_obligation(names: list[str], files3: list[str]) -> list[str]:
    """Queries next round's window MUST take (their only recent
    driver row is in the file that ages out next round)."""
    window = set(names[:WINDOW])
    recents = _effective_recent_files(window, files3)
    if len(recents) < 2:
        return []
    newest = _keys(recents[-1])
    return [q for q in names if q not in newest and q not in window]


# Debut overflow: when one round introduces more never-driver-checked
# queries than the 50-row window holds, the overflow may wait in the
# tail — but ONLY until the correctness file for its debut round
# exists.  The exemption is SELF-EXPIRING: the moment
# CORRECTNESS_r{debut}.json lands (i.e. the driver ran the round the
# query debuted in), the query must either be in the window or have a
# driver row, like everyone else.  Tail queries stay oracle-checked at
# sf0.01 by test_oracle_tail.py on every pytest run meanwhile.
DEBUT_OVERFLOW: dict[str, int] = {
    # (r8 debuts plink_fam/vcf_assay_link/add_nodes/security_tokens
    # expired when CORRECTNESS_r08.json landed and are windowed at
    # r10.)
    # r14 debut waiting for the r15 window's slack slots — the r14
    # window is fully obligated by the window-sized r11 cohort, so
    # the debut sits in the tail (oracle-checked every pytest run by
    # test_oracle_tail.py) until the r15 head-swap windows it; the
    # exemption self-expires when CORRECTNESS_r15.json lands.
    "epoch_shuffle_hll": 15,
}

# (The one-time r10 amnesty — 48 r7-cohort queries orphaned by r9's
# skipped rotation — self-expired when CORRECTNESS_r10.json landed and
# was discharged by the r11 head-swap.  No live amnesty entries.)
AMNESTY: dict[str, int] = {}

# STEADY-STATE ROTATION MAP (r11 onward; VERDICT r10 item 2).
# With a 50-row window, two-round hygiene, and 147 gate queries, the
# rotation is period-3 over three cohort blocks that queries() keeps
# in POSITION ORDER so every rotation is a mechanical head-swap of
# the next block (+ slack picks from the freshest cohort):
#
#   queries() positions | cohort (last driver row) | due in window
#   --------------------+--------------------------+--------------
#          1-50         | r11-checked (50 queries) | checked now
#         51-96         | r12-checked (46 queries) | round 15
#           97          | epoch_shuffle_hll debut  | round 15
#        98-147         | r13-checked (50 queries) | round 16
#
# (The r11 cohort is exactly window-sized, so the r14 window has no
# slack and the epoch_shuffle_hll debut waits in the tail under
# DEBUT_OVERFLOW — oracle-checked every pytest run by
# test_oracle_tail.py — until the r15 window's slack slots open.)
# After each rotation the just-checked 50 move to the END of the
# tail, the next-due block moves to the head, and the map shifts
# by one round.  NEVER skip a round's swap: one skipped rotation
# strands two cohorts (98 > 50) and forces another amnesty (the
# r9/r10 incident this table exists to prevent).


def test_every_query_recently_driver_checked():
    import __spark_entry__ as entry

    names = list(entry.queries())

    recorded_rounds = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            recorded_rounds.add(int(m.group(1)))
    live_exemptions = {
        q
        for q, rnd in {**DEBUT_OVERFLOW, **AMNESTY}.items()
        if rnd not in recorded_rounds
    }

    stale = _stale_queries(names, _last_correctness_files(3), live_exemptions)
    assert not stale, (
        f"{stale} are outside the driver's {WINDOW}-row window AND have no "
        "driver row in the last two CORRECTNESS files — rotate them into "
        "the window (and update tests/test_oracle_tail.py TAIL) so they "
        "cannot sit unverified for two rounds running"
    )


def test_recorded_driver_rows_were_green():
    """The most recent driver verdicts for queries we KEPT in the tail
    must have been green — parking a red query out of the window would
    hide a known failure from the next driver run."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    tail = set(names[WINDOW:])
    latest: dict[str, dict] = {}
    for path in _last_correctness_files(2):  # oldest -> newest wins
        with open(path) as f:
            for q, row in json.load(f).items():
                latest[q] = row

    parked_red = [
        q
        for q in tail
        if q in latest
        and not (
            latest[q].get("rows_match")
            and latest[q].get("schema_match")
            and latest[q].get("hash_match", True)
        )
    ]
    assert not parked_red, (
        f"{parked_red} were RED in their most recent driver check but sit "
        "in the tail — keep failing queries in the window until green"
    )


def test_rotation_capacity_not_exceeded():
    """Forward guards on the rotation math.

    (1) Hard ceiling: with a 50-row window and the two-round hygiene
    rule, a period-3 rotation covers at most 3×WINDOW queries.  The
    144th gate query left only 6 slots of lifetime headroom — a new
    gate query beyond 150 makes the hygiene rule UNSATISFIABLE for
    somebody, forever.

    (2) Next-round obligation: assuming the current window all lands
    green, next round must re-window every query whose only recent
    driver row is in the OLDER of the last-two files.  If that count
    exceeds WINDOW, the crunch is already unavoidable — fail now, at
    authoring time, not next round."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert len(names) <= 3 * WINDOW, (
        f"{len(names)} gate queries > {3 * WINDOW} — the 50-row window "
        "with two-round hygiene cannot rotate this many; retire or "
        "merge queries before adding more"
    )

    next_obligation = _next_obligation(names, _last_correctness_files(3))
    assert len(next_obligation) <= WINDOW, (
        f"{len(next_obligation)} queries will need next round's "
        f"{WINDOW}-row window (only rows in the aging-out file): "
        f"{next_obligation[:10]}… — restructure THIS round's window"
    )


def test_hygiene_stable_when_a_correctness_file_lands(tmp_path):
    """r11 VERDICT item 2: the hygiene checks must be green both
    immediately BEFORE and immediately AFTER the driver drops the
    current round's CORRECTNESS file (whose key set IS the current
    window).  Simulate the landing with synthetic files."""
    # 9 gate queries, 3-row window, period-3 cohorts a/b/c
    names = ["a1", "a2", "a3", "b1", "b2", "b3", "c1", "c2", "c3"]
    global WINDOW
    saved = WINDOW
    WINDOW = 3
    try:
        def drop(rnd: int, keys: list[str]) -> None:
            with open(tmp_path / f"CORRECTNESS_r{rnd:02d}.json", "w") as f:
                json.dump({k: {} for k in keys}, f)

        # history: r1 checked the b-cohort, r2 checked the c-cohort;
        # the current window is the a-cohort (due this round).
        drop(1, ["b1", "b2", "b3"])
        drop(2, ["c1", "c2", "c3"])
        before = _last_correctness_files(3, repo=str(tmp_path))
        assert _stale_queries(names, before, set()) == []
        assert _next_obligation(names, before) == ["b1", "b2", "b3"]

        # the driver lands r3 = the current window (pre-swap state)
        drop(3, ["a1", "a2", "a3"])
        after = _last_correctness_files(3, repo=str(tmp_path))
        assert _stale_queries(names, after, set()) == []
        assert _next_obligation(names, after) == ["b1", "b2", "b3"]

        # after the NEXT head-swap (b-cohort windowed) it is still
        # green and the obligation advances to the c-cohort
        swapped = ["b1", "b2", "b3", "c1", "c2", "c3", "a1", "a2", "a3"]
        assert _stale_queries(swapped, after, set()) == []
        assert _next_obligation(swapped, after) == ["c1", "c2", "c3"]

        # a genuinely stranded query (never checked, not windowed)
        # still fails in both states
        stranded = names + ["z1"]
        assert _stale_queries(stranded, before, set()) == ["z1"]
        assert _stale_queries(stranded, after, set()) == ["z1"]
    finally:
        WINDOW = saved


def test_every_gate_query_has_a_bench_baseline():
    """bench.py's regression guard compares only the COMMON query set
    against bench_baseline.json — a gate query with no baseline entry
    silently escapes the guard forever.  Adding a gate query requires
    recording a solo bench number (memory'd protocol)."""
    import __spark_entry__ as entry

    with open(os.path.join(REPO, "bench_baseline.json")) as f:
        baseline = set(json.load(f)["queries"])
    missing = [q for q in entry.queries() if q not in baseline]
    assert not missing, (
        f"{missing} have no bench_baseline.json entry — record a solo "
        "SPARK_GRAFT_BENCH_QUERIES=<q> run (never refresh existing "
        "entries upward)"
    )
