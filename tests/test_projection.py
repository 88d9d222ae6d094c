"""Random projection (llmdata/projection.py): exact NumPy twin,
determinism, JL geometry preservation, and plan shape."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _np_project(vecs: dict[int, list[float]], in_dim: int, out_dim: int, quant=1000):
    from tmdataloader_spark.llmdata.projection import projection_signs

    S = np.array(projection_signs(in_dim, out_dim), dtype=np.int64)  # out×in
    return {
        i: list((S @ np.floor(np.array(v) * quant).astype(np.int64)).astype(int))
        for i, v in vecs.items()
    }


def test_projection_matches_numpy_exactly(spark):
    from tmdataloader_spark.llmdata.projection import random_projection

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(e.first().embedding)
    got = {
        r.vec_id: [r[f"p{j}"] for j in range(16)]
        for r in random_projection(e, dim, 16).collect()
    }
    vecs = {r.vec_id: list(r.embedding) for r in e.collect()}
    assert got == _np_project(vecs, dim, 16)


def test_projection_preserves_geometry(spark):
    """JL sanity: cosine on 32-dim projections correlates with cosine
    on the original 64-dim vectors. The fixture embeddings are
    near-orthogonal random vectors (|cos| ≤ 0.35), the hardest case —
    the cosine estimator's own noise is ~1/sqrt(out_dim), so 32 dims
    gives a deterministic ~0.57 here; the bound is a smoke check that
    the derived sign matrix isn't degenerate, not a JL proof."""
    from tmdataloader_spark.llmdata.projection import random_projection

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    dim = len(e.first().embedding)
    orig = {r.vec_id: np.array(r.embedding) for r in e.collect()}
    proj = {
        r.vec_id: np.array([r[f"p{j}"] for j in range(32)], dtype=float)
        for r in random_projection(e, dim, 32).collect()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    ids = sorted(orig)[:30]
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    co = np.array([cos(orig[a], orig[b]) for a, b in pairs])
    cp = np.array([cos(proj[a], proj[b]) for a, b in pairs])
    r = np.corrcoef(co, cp)[0, 1]
    assert r > 0.4, f"projection destroyed geometry: corr={r}"


def test_projection_plan_is_pure_map(spark):
    """No shuffle, no Python boundary, no join — one codegen map."""
    from tmdataloader_spark.llmdata.projection import random_projection

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = random_projection(e, 64, 16)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = df._jdf.queryExecution().explainString(jmode)
    for bad in ("Exchange", "MapInPandas", "EvalPython", "Join"):
        assert bad not in plan, f"{bad} in projection plan"


def test_projection_oracle_matches_duckdb(spark):
    import duckdb

    from tmdataloader_spark.llmdata.projection import (
        random_projection,
        random_projection_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = {
        r.vec_id: [r[f"p{j}"] for j in range(8)]
        for r in random_projection(e, 64, 8).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    oracle = {
        r[0]: list(r[1:])
        for r in con.execute(random_projection_oracle_sql(64, 8)).fetchall()
    }
    assert got == oracle
