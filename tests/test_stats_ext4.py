"""Semantic tests for the round-7 session-3 statistics queries:
Mann-Kendall trend, isotonic regression (minimax form), and the
two-proportion z-test.

The registry gate proves DuckDB parity; these pin the math against
independent numpy/pure-python recomputation so a
parity-preserving-but-wrong formula can't slip through on both engines
at once.
"""

from __future__ import annotations

import math

import numpy as np

from pipeline_query_engine_demo_spark.plans.stats import (
    isotonic_regression_minimax,
    two_proportion_ztest,
)
from pipeline_query_engine_demo_spark.plans.timeseries import mann_kendall_trend


def _r9_int(v: float) -> int:
    """floor(v*1e9 + 0.5) — the repo's round-half-up at 9 dp, kept as
    an exact integer so day-total comparisons are tie-exact."""
    return math.floor(v * 1e9 + 0.5)


def _daily_ints(rows, scale_fn):
    by_key: dict = {}
    for r in rows:
        day = (r["ts"].year, r["ts"].month, r["ts"].day)
        k = (r["event_type"], day)
        by_key[k] = by_key.get(k, 0) + scale_fn(r["value"])
    by_type: dict = {}
    for (et, day), tot in by_key.items():
        by_type.setdefault(et, []).append((day, tot))
    for et in by_type:
        by_type[et].sort()
    return by_type


def test_mann_kendall_matches_bruteforce(spark, sf_dir):
    out = {r["event_type"]: r for r in mann_kendall_trend(spark, sf_dir).collect()}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "ts", "value")
        .collect()
    )
    by_type = _daily_ints(ev, _r9_int)
    assert set(out) == set(by_type)
    for et, series in by_type.items():
        xs = [tot for _, tot in series]
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_counts: dict = {}
        for v in xs:
            tie_counts[v] = tie_counts.get(v, 0) + 1
        tie = sum(t * (t - 1) * (2 * t + 5) for t in tie_counts.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        if s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        r = out[et]
        assert r["n_days"] == n
        assert r["s_stat"] == s
        assert math.isclose(r["var_s"], var_s, rel_tol=0, abs_tol=1e-5)
        assert math.isclose(r["z_stat"], z, rel_tol=0, abs_tol=1e-5)


def _pava(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators, the classic stack form — independent of
    the query's minimax identity."""
    means: list = []
    weights: list = []
    counts: list = []
    for i in range(len(y)):
        means.append(float(y[i]))
        weights.append(float(w[i]))
        counts.append(1)
        while len(means) > 1 and means[-2] > means[-1]:
            m2, w2, c2 = means.pop(), weights.pop(), counts.pop()
            m1, w1, c1 = means.pop(), weights.pop(), counts.pop()
            wt = w1 + w2
            means.append((m1 * w1 + m2 * w2) / wt)
            weights.append(wt)
            counts.append(c1 + c2)
    out = np.empty(len(y))
    pos = 0
    for m, c in zip(means, counts):
        out[pos : pos + c] = m
        pos += c
    return out


def test_isotonic_matches_pava(spark, sf_dir):
    rows = isotonic_regression_minimax(spark, sf_dir).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (r["day"], r["actual"], r["iso_fit"])
        )
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "ts", "value")
        .collect()
    )
    daily = _daily_ints(ev, lambda v: math.floor(v * 100 + 0.5))
    assert set(by_type) == set(daily)
    for et, series in by_type.items():
        series.sort()
        cents = np.array([tot for _, tot in daily[et]], dtype=np.float64)
        assert len(series) == len(cents)
        fit = _pava(cents / 100.0, np.ones(len(cents)))
        got = np.array([f for _, _, f in series])
        # monotone non-decreasing
        assert np.all(np.diff(got) >= -1e-9)
        np.testing.assert_allclose(got, fit, rtol=0, atol=1e-5)
        # actuals round-trip the daily cents
        np.testing.assert_allclose(
            np.array([a for _, a, _ in series]), cents / 100.0, rtol=0, atol=1e-9
        )


def test_two_proportion_ztest_matches_bruteforce(spark, sf_dir):
    out = {
        (r["segment_a"], r["segment_b"]): r
        for r in two_proportion_ztest(spark, sf_dir).collect()
    }
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderpriority")
        .collect()
    )
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    stats: dict = {}
    for o in orders:
        seg = cust[o["o_custkey"]]
        x, n = stats.get(seg, (0, 0))
        stats[seg] = (x + (o["o_orderpriority"] == "1-URGENT"), n + 1)
    segs = sorted(stats)
    expected_pairs = {
        (a, b) for i, a in enumerate(segs) for b in segs[i + 1 :]
    }
    assert set(out) == expected_pairs
    for (a, b), r in out.items():
        xa, na = stats[a]
        xb, nb = stats[b]
        assert (r["x_a"], r["n_a"], r["x_b"], r["n_b"]) == (xa, na, xb, nb)
        pa, pb = xa / na, xb / nb
        pool = (xa + xb) / (na + nb)
        z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
        assert math.isclose(r["diff"], pa - pb, rel_tol=0, abs_tol=1e-5)
        assert math.isclose(r["z_stat"], z, rel_tol=0, abs_tol=1e-5)
