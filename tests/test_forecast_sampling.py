"""Semantic tests for the round-7 session-4 batch-D queries:
Holt linear-trend smoothing, split-conformal intervals, and
unigram^0.75 negative sampling.

The registry gate proves DuckDB parity; these replay the math in pure
python so a parity-preserving-but-wrong formula can't slip through on
both engines at once.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from pipeline_query_engine_demo_spark.plans.timeseries import (
    conformal_interval_daily,
    holt_linear_forecast,
)
from pipeline_query_engine_demo_spark.plans.training import negative_sampling_unigram


def _daily_cents(events):
    daily: dict = {}
    for r in events:
        v = r["value"]
        if v is None or not math.isfinite(v):
            continue
        k = (r["event_type"], r["ts"].date())
        daily[k] = daily.get(k, 0) + math.floor(v * 100.0 + 0.5)
    by_type: dict = {}
    for (et, day), c in daily.items():
        by_type.setdefault(et, []).append((day, c))
    for et in by_type:
        by_type[et].sort()
    return by_type


def test_holt_matches_sequential_replay(spark, sf_dir):
    out = {r["event_type"]: r for r in holt_linear_forecast(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type = _daily_cents(ev)
    assert set(out) == set(by_type)
    for et, series in by_type.items():
        xs = [c / 100.0 for _, c in series]
        n = len(xs)
        assert n >= 3
        level, trend = xs[1], xs[1] - xs[0]
        sse = 0.0
        for x in xs[2:]:
            e = x - (level + trend)
            sse += e * e
            l_new = 0.3 * x + 0.7 * (level + trend)
            trend = 0.1 * (l_new - level) + 0.9 * trend
            level = l_new
        r = out[et]
        assert r["n_days"] == n
        assert r["level"] == pytest.approx(level, abs=1e-5)
        assert r["trend"] == pytest.approx(trend, abs=1e-5)
        assert r["forecast_7d"] == pytest.approx(level + 7.0 * trend, abs=1e-5)
        assert r["rmse"] == pytest.approx(math.sqrt(sse / (n - 2)), abs=1e-5)


def test_conformal_matches_rank_replay(spark, sf_dir):
    out = {r["event_type"]: r for r in conformal_interval_daily(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type = _daily_cents(ev)
    for et, series in by_type.items():
        cs = [c for _, c in series]
        resid = [(i + 2, abs(b - a)) for i, (a, b) in enumerate(zip(cs, cs[1:]))]
        cal = sorted(r for rn, r in resid if rn <= 16)
        test = [r for rn, r in resid if rn > 16]
        n_cal = len(cal)
        k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
        q = cal[k - 1]
        cov = sum(1 for r in test if r <= q) / len(test)
        r = out[et]
        assert r["n_cal"] == n_cal
        assert r["n_test"] == len(test)
        assert r["q_dollars"] == pytest.approx(q / 100.0, abs=1e-6)
        assert r["coverage"] == pytest.approx(cov, abs=1e-6)
        # split-conformal at 90% should cover roughly that much
        assert r["coverage"] >= 0.5


def test_negative_sampling_matches_cdf_replay(spark, sf_dir):
    rows = negative_sampling_unigram(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt: dict = {}
    for r in docs:
        for t in r["text"].split(" "):
            if t:
                cnt[t] = cnt.get(t, 0) + 1
    vocab = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    # 9-dp-rounded weights, exact cumulative lattice in nanos
    w9 = [math.floor(c**0.75 * 1e9 + 0.5) for _, c in vocab]
    total_n = sum(w9)
    t_d = total_n / 1e9
    his = []
    acc = 0
    for w in w9:
        acc += w
        his.append(acc)
    los = [h - w for h, w in zip(his, w9)]
    draws: dict = {}
    for s in range(1000):
        u = int(hashlib.md5(f"neg:{s}".encode()).hexdigest()[:15], 16) / 1152921504606846976.0
        target = u * t_d
        for i, (tok, _) in enumerate(vocab):
            hi = his[i] / 1e9 if i < len(vocab) - 1 else t_d * 2.0
            if los[i] / 1e9 <= target < hi:
                draws[tok] = draws.get(tok, 0) + 1
                break
    got = {r["token"]: r for r in rows}
    assert set(got) == {tok for tok, _ in vocab}
    n_drawn_total = 0
    for i, (tok, c) in enumerate(vocab):
        r = got[tok]
        assert r["cnt"] == c
        assert r["share"] == pytest.approx(w9[i] / total_n, abs=1e-6)
        assert r["n_drawn"] == draws.get(tok, 0)
        n_drawn_total += r["n_drawn"]
    assert n_drawn_total == 1000
    # draw frequencies track the ^0.75 mass: the top decile's draw
    # count lands near its expected share (loose Monte-Carlo bound)
    k10 = max(1, len(vocab) // 10)
    exp_share = sum(w9[:k10]) / total_n
    top = sum(got[tok]["n_drawn"] for tok, _ in vocab[:k10])
    assert 0.4 * exp_share * 1000 < top < 2.5 * exp_share * 1000 + 10


def test_hash_mod_sample_is_deterministic_and_unbiased(spark, sf_dir):
    """Hash-mod sampling must select exactly the python-md5-predicted
    ids (reproducible across runs by construction) at a rate close to
    the nominal 10%."""
    import hashlib

    from pipeline_query_engine_demo_spark.plans.training import hash_mod_sample_docs
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    all_ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    exp = {
        d: int(hashlib.md5(f"{d}#sample".encode()).hexdigest()[:15], 16) % 100
        for d in all_ids
    }
    expected = {d: b for d, b in exp.items() if b < 10}
    got = {r.doc_id: r.bucket for r in hash_mod_sample_docs(spark, sf_dir).collect()}
    assert got == expected
    rate = len(got) / len(all_ids)
    assert 0.05 < rate < 0.15, rate
