"""Vector-math expression edge cases."""

from __future__ import annotations

import math

from pipeline_query_engine_demo_spark.functions import vectors


def _one(spark, vec_a, vec_b, col):
    df = spark.createDataFrame([(vec_a, vec_b)], "a array<float>, b array<float>")
    return df.select(col.alias("v")).collect()[0].v


def test_dot_norm_euclidean(spark):
    a, b = [3.0, 4.0], [1.0, 0.0]
    assert _one(spark, a, b, vectors.dot("a", "b")) == 3.0
    assert _one(spark, a, b, vectors.norm("a")) == 5.0
    assert _one(spark, a, b, vectors.euclidean("a", "b")) == math.sqrt(4 + 16)


def test_cosine_zero_vector_is_null(spark):
    assert _one(spark, [0.0, 0.0], [1.0, 2.0], vectors.cosine("a", "b")) is None


def test_normalize(spark):
    out = _one(spark, [3.0, 4.0], [0.0, 0.0], vectors.normalize("a"))
    assert out == [0.6, 0.8]
    assert _one(spark, [0.0, 0.0], [1.0, 1.0], vectors.normalize("a")) == [None, None]


def test_gram_matrix_matches_numpy(spark, sf_dir):
    import numpy as np
    import math
    import pytest

    from pipeline_query_engine_demo_spark.plans.retrieval import gram_matrix_embeddings

    out = {(r["i"], r["j"]): r for r in gram_matrix_embeddings(spark, sf_dir).collect()}
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    n, d = x.shape
    g = x.T @ x
    assert set(out) == {(i, j) for i in range(d) for j in range(i, d)}
    for (i, j), r in out.items():
        assert r["n"] == n
        # 9-dp per-term rounding bounds the drift by n * 5e-10
        assert r["gram"] == pytest.approx(g[i, j], abs=n * 5e-10 + 1e-6)
    # Gram matrices are PSD: numpy eigvals of the reconstructed matrix
    full = np.zeros((d, d))
    for (i, j), r in out.items():
        full[i, j] = full[j, i] = r["gram"]
    assert np.linalg.eigvalsh(full).min() > -1e-6


def test_time_decayed_engagement_matches_replay(spark, sf_dir):
    import math
    import pytest

    from pipeline_query_engine_demo_spark.plans.llm import (
        time_decayed_engagement,
    )

    out = {r["user_id"]: r for r in time_decayed_engagement(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    hday = max(r["ts"] for r in ev).date()
    exp: dict = {}
    for r in ev:
        v = r["value"]
        if v is None or not math.isfinite(v):
            continue
        age = (hday - r["ts"].date()).days
        cents = math.floor(v * 100.0 + 0.5)
        t = math.floor(
            math.exp(-0.1 * age) * (cents / 100.0) * 1e9 + 0.5
        ) / 1e9
        n, s = exp.get(r["user_id"], (0, 0.0))
        exp[r["user_id"]] = (n + 1, s + t)
    assert set(out) == set(exp)
    for uid, (n, s) in exp.items():
        r = out[uid]
        assert r["n_events"] == n
        assert r["decayed_value"] == pytest.approx(s, abs=1e-5)
    # decay sanity: a user's decayed value never exceeds the raw sum
    raw: dict = {}
    for r in ev:
        v = r["value"]
        if v is None or not math.isfinite(v):
            continue
        raw[r["user_id"]] = raw.get(r["user_id"], 0.0) + v
    for uid in out:
        assert out[uid]["decayed_value"] <= raw[uid] + 1e-6
