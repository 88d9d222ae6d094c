"""Smoke test for bench.py: the driver runs it per-round, so an
import error, a broken warmup, or a JSON-shape regression in the
bench harness must surface in the suite, not in the round report.
Runs a 3-query subset at sf0.001 in a subprocess (own JVM)."""

import json
import os
import subprocess
import sys


def test_bench_runs_and_emits_contract_json(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="pricing_summary,zorder,vocab_topk",
        SPARK_GRAFT_BENCH_NO_GUARD="1",
        SPARK_GRAFT_CPUS="8",
        # never clobber the driver's full-run sidecar (r6 VERDICT #3)
        SPARK_GRAFT_BENCH_OUT=str(tmp_path / "bench_smoke.json"),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["metric"] == "total_query_seconds" and d["unit"] == "sec"
    assert set(d["queries"]) == {"pricing_summary", "zorder", "vocab_topk"}
    assert all(v == v and v >= 0 for v in d["queries"].values())  # no NaN errors
    assert d["sf"] == 0.001
    # the ambient context survives on the printed line (r14): the
    # subset contains one control (pricing_summary), so the factor is
    # computable and must ride at the END of the line where the round
    # artifact's stdout-tail truncation cannot eat it
    assert d["ambient_factor"] > 0 and len(d["control_ratios"]) >= 1
    assert list(d)[-2:] == ["ambient_factor", "control_ratios"]
    # sidecar honored SPARK_GRAFT_BENCH_OUT (didn't clobber repo-root copy)
    side = json.load(open(env["SPARK_GRAFT_BENCH_OUT"]))
    assert set(side["queries"]) == set(d["queries"])
