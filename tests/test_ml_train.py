"""Semantic tests for the round-7 session-4 batch-E queries:
distributed logistic-regression GD and Kneser-Ney perplexity.

The registry gate proves DuckDB parity; these replay the math in
numpy/pure python so a parity-preserving-but-wrong formula can't slip
through on both engines at once.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pipeline_query_engine_demo_spark.plans.stats import logistic_regression_gd
from pipeline_query_engine_demo_spark.plans.curation import (
    kneser_ney_perplexity,
)


def _r9(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e9 + 0.5) / 1e9


def test_logistic_gd_matches_numpy_replay(spark, sf_dir):
    out = logistic_regression_gd(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_discount", "l_returnflag"
    ).collect()
    x1 = np.array(
        [math.floor(q["l_quantity"] * 100.0 + 0.5) / 5000.0 for q in li]
    )
    x2 = np.array(
        [math.floor(q["l_discount"] * 10000.0 + 0.5) / 1000.0 for q in li]
    )
    y = np.array([1.0 if q["l_returnflag"] == "R" else 0.0 for q in li])
    n = len(y)
    a = b = c = 0.0
    for _ in range(5):
        z = a + b * x1 + c * x2
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        a -= 0.5 * (_r9(err).sum() / n)
        b -= 0.5 * (_r9(err * x1).sum() / n)
        c -= 0.5 * (_r9(err * x2).sum() / n)
    z = a + b * x1 + c * x2
    p = 1.0 / (1.0 + np.exp(-z))
    acc = float(((z > 0.0) == (y == 1.0)).sum()) / n
    ll = float(
        _r9(-(y * np.log(p) + (1.0 - y) * np.log(1.0 - p))).sum() / n
    )
    assert r["n"] == n
    assert r["w0"] == pytest.approx(a, abs=1e-5)
    assert r["w1"] == pytest.approx(b, abs=1e-5)
    assert r["w2"] == pytest.approx(c, abs=1e-5)
    assert r["accuracy"] == pytest.approx(acc, abs=1e-6)
    assert r["log_loss"] == pytest.approx(ll, abs=1e-5)
    # five GD steps from the origin must beat the ln(2) starting loss
    assert r["log_loss"] < math.log(2.0)


def test_kneser_ney_matches_python_replay(spark, sf_dir):
    out = {r["source"]: r for r in kneser_ney_perplexity(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    bigrams: list = []
    for r in docs:
        w = r["text"].split(" ")
        for v, nxt in zip(w, w[1:]):
            bigrams.append((r["source"], v, nxt))
    cvw: dict = {}
    for _, v, nxt in bigrams:
        cvw[(v, nxt)] = cvw.get((v, nxt), 0) + 1
    cv: dict = {}
    n1v: dict = {}
    n1w: dict = {}
    for (v, nxt), c2 in cvw.items():
        cv[v] = cv.get(v, 0) + c2
        n1v[v] = n1v.get(v, 0) + 1
        n1w[nxt] = n1w.get(nxt, 0) + 1
    n1dd = len(cvw)
    per_src: dict = {}
    for src, v, nxt in bigrams:
        p = (cvw[(v, nxt)] - 0.75) / cv[v] + 0.75 * (n1v[v] / cv[v]) * (
            n1w[nxt] / n1dd
        )
        assert 0.0 < p <= 1.0 + 1e-12
        t = math.floor(-math.log2(p) * 1e9 + 0.5) / 1e9
        cnt, s = per_src.get(src, (0, 0.0))
        per_src[src] = (cnt + 1, s + t)
    assert set(out) == set(per_src)
    for src, (cnt, s) in per_src.items():
        r = out[src]
        assert r["n_bigrams"] == cnt
        assert r["avg_nll_bits"] == pytest.approx(s / cnt, abs=1e-5)
        assert r["perplexity"] == pytest.approx(2.0 ** (s / cnt), rel=1e-5)
    # KN probabilities over all observed continuations of a context sum
    # to <= 1 (discount mass is redistributed, never invented)
    some_v = max(cv, key=cv.get)
    mass = sum(
        (c2 - 0.75) / cv[some_v] + 0.75 * (n1v[some_v] / cv[some_v]) * (n1w[nxt] / n1dd)
        for (v, nxt), c2 in cvw.items()
        if v == some_v
    )
    assert mass <= 1.0 + 1e-9


def test_ridge_normal_eq_matches_numpy_solve(spark, sf_dir):
    """β from the in-plan Cramer solve must equal numpy's solve of the
    same regularized normal equations assembled from the raw rows —
    an independent full-precision replay (same λ, same integer-cent
    lattice)."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.analytics import _RIDGE_LAMBDA
    from pipeline_query_engine_demo_spark.plans.stats import ridge_regression_normal_eq
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = {r.feature: r.beta for r in ridge_regression_normal_eq(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    q = rows["l_quantity"].to_numpy(np.float64)
    d = np.floor(rows["l_discount"].to_numpy(np.float64) * 100 + 0.5)
    y = np.floor(rows["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5)
    X = np.column_stack([np.ones_like(q), q, d])
    A = X.T @ X + _RIDGE_LAMBDA * np.eye(3)
    beta = np.linalg.solve(A, X.T @ y)
    exp = dict(zip(["intercept", "quantity", "discount_pct"], beta))
    for k in exp:
        assert abs(got[k] - exp[k]) <= 1e-9 * max(1.0, abs(exp[k])), (k, got[k], exp[k])
    # sanity: price grows with quantity on TPC-H-ish data
    assert got["quantity"] > 0


def test_decision_stump_matches_numpy_brute_force(spark, sf_dir):
    """Brute-force every 1000-wide bucket boundary in numpy over the raw
    orders rows and confirm the engine's single-pass window scan picks
    the same (threshold, accuracy) — including the majority-vote scoring
    on each side and the smallest-threshold tie-break."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.stats import decision_stump_totalprice
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = decision_stump_totalprice(spark, sf_dir).collect()[0]
    pdf = (
        load_table(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderstatus")
        .toPandas()
    )
    x = np.floor(pdf["o_totalprice"].to_numpy() / 1000.0).astype(np.int64)
    y = (pdf["o_orderstatus"] == "F").to_numpy().astype(np.int64)
    n, pos_total = len(y), int(y.sum())
    best = None
    for b in np.unique(x):
        left = x <= b
        n_left, pos_left = int(left.sum()), int(y[left].sum())
        neg_left = n_left - pos_left
        pos_right = pos_total - pos_left
        neg_right = (n - n_left) - pos_right
        n_correct = max(pos_left + neg_right, neg_left + pos_right)
        key = (-n_correct, (b + 1) * 1000)
        if best is None or key < best[0]:
            best = (key, n_left, n_correct)
    (neg_nc, split), n_left, n_correct = best
    assert got.split_value == split
    assert got.n_left == n_left
    assert got.n_right == n - n_left
    assert got.n_correct == n_correct
    assert got.accuracy == n_correct / n


def test_ridge_cv_one_pass_matches_numpy_per_fold(spark, sf_dir):
    """Per-fold replay in numpy: rebuild each held-out fold's training
    normal equations from the raw rows, solve with numpy.linalg.solve,
    and recompute the held-out MSE on the same integer micro-lattice.
    Betas must agree to float tolerance; the lattice-summed MSE and the
    integer fold sizes must agree exactly."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.analytics import (
        _RIDGE_CV_FOLDS,
        _RIDGE_LAMBDA,
    )
    from pipeline_query_engine_demo_spark.plans.stats import ridge_cv_one_pass
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = {r.fold: r for r in ridge_cv_one_pass(spark, sf_dir).collect()}
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_quantity AS BIGINT) AS q",
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y",
            f"CAST((l_orderkey * 31 + l_linenumber) % {_RIDGE_CV_FOLDS}"
            " AS BIGINT) AS fold",
        )
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["q"].to_numpy(float), pdf["d"].to_numpy(float)]
    )
    yv = pdf["y"].to_numpy(float)
    folds = pdf["fold"].to_numpy()
    assert set(got) == set(range(_RIDGE_CV_FOLDS))
    for k in range(_RIDGE_CV_FOLDS):
        tr, va = folds != k, folds == k
        A = X[tr].T @ X[tr] + _RIDGE_LAMBDA * np.eye(3)
        beta = np.linalg.solve(A, X[tr].T @ yv[tr])
        r = got[k]
        assert r.n_train == int(tr.sum()) and r.n_val == int(va.sum())
        np.testing.assert_allclose(
            [r.beta_intercept, r.beta_quantity, r.beta_discount_pct],
            beta,
            rtol=1e-9,
        )
        resid_d = (
            yv[va]
            - (
                r.beta_intercept
                + r.beta_quantity * X[va][:, 1]
                + r.beta_discount_pct * X[va][:, 2]
            )
        ) / 100.0
        t = np.floor(resid_d * resid_d * 1e6 + 0.5).astype(np.int64)
        assert r.val_mse == float(t.sum()) / 1e6 / va.sum()
