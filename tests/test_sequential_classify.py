"""Semantic tests for the round-7 session-4 batch-F queries:
Wald SPRT sequential A/B test and the multinomial Naive Bayes
source classifier.

The registry gate proves DuckDB parity; these replay the math in pure
python so a parity-preserving-but-wrong formula can't slip through on
both engines at once.
"""

from __future__ import annotations

import math

import pytest

from pipeline_query_engine_demo_spark.plans.analytics import (
    _SPRT_A_N,
    _SPRT_B_N,
    _SPRT_C0_N,
    _SPRT_C1_N,
)
from pipeline_query_engine_demo_spark.plans.stats import sprt_ab_conversion
from pipeline_query_engine_demo_spark.plans.training import naive_bayes_source_classify


def test_sprt_constants_are_the_9dp_wald_values():
    assert _SPRT_C1_N == math.floor(math.log(0.22 / 0.18) * 1e9 + 0.5)
    assert _SPRT_C0_N == math.floor(math.log(0.78 / 0.82) * 1e9 + 0.5)
    assert _SPRT_A_N == math.floor(math.log(0.95 / 0.05) * 1e9 + 0.5)
    assert _SPRT_B_N == -_SPRT_A_N


def test_sprt_matches_sequential_replay(spark, sf_dir):
    out = {r["variant"]: r for r in sprt_ab_conversion(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_v: dict = {}
    for r in ev:
        by_v.setdefault(r["user_id"] % 2, []).append(
            (r["ts"], r["event_id"], 1 if r["event_type"] == "purchase" else 0)
        )
    assert set(out) == set(by_v)
    for v, seq in by_v.items():
        seq.sort()
        k = ln9 = 0
        decision, n_at, l_at = None, None, None
        for rn, (_, _, y) in enumerate(seq, start=1):
            k += y
            ln9 = k * _SPRT_C1_N + (rn - k) * _SPRT_C0_N
            if decision is None:
                if ln9 >= _SPRT_A_N:
                    decision, n_at, l_at = "accept_h1", rn, ln9
                elif ln9 <= _SPRT_B_N:
                    decision, n_at, l_at = "accept_h0", rn, ln9
        r = out[v]
        assert r["n_total"] == len(seq)
        assert r["n_conv"] == k
        assert r["llr_final"] == pytest.approx(ln9 / 1e9, abs=1e-6)
        assert r["decision"] == (decision or "continue")
        assert r["n_at_decision"] == n_at
        if l_at is None:
            assert r["llr_at_decision"] is None
        else:
            assert r["llr_at_decision"] == pytest.approx(l_at / 1e9, abs=1e-6)
        # a decision, once recorded, is the FIRST boundary crossing:
        # no earlier index may cross either boundary
        if n_at is not None:
            kk = 0
            for rn, (_, _, y) in enumerate(seq[: n_at - 1], start=1):
                kk += y
                w9 = kk * _SPRT_C1_N + (rn - kk) * _SPRT_C0_N
                assert _SPRT_B_N < w9 < _SPRT_A_N


def test_naive_bayes_matches_python_replay(spark, sf_dir):
    out = {
        (r["true_src"], r["pred_src"]): r["n_docs"]
        for r in naive_bayes_source_classify(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    # train
    cst: dict = {}
    ns: dict = {}
    d_s: dict = {}
    dt: dict = {}
    for r in docs:
        d_s[r["source"]] = d_s.get(r["source"], 0) + 1
        for t in r["text"].split(" "):
            if not t:
                continue
            cst[(r["source"], t)] = cst.get((r["source"], t), 0) + 1
            ns[r["source"]] = ns.get(r["source"], 0) + 1
            dt.setdefault(r["doc_id"], {}).setdefault(t, 0)
            dt[r["doc_id"]][t] += 1
    vocab = len({t for _, t in cst})
    dtot = len(docs)
    sources = sorted(ns)

    def r9(x: float) -> float:
        return math.floor(x * 1e9 + 0.5) / 1e9

    conf: dict = {}
    for r in docs:
        best = None
        for s in sources:
            post = r9(math.log(d_s[s] / dtot))
            for t, c in dt.get(r["doc_id"], {}).items():
                post += c * r9(
                    math.log((cst.get((s, t), 0) + 1) / (ns[s] + vocab))
                )
            # tie-break: higher post wins, then lexicographically
            # smaller source (matches ORDER BY post DESC, cand)
            key = (round(post, 7), s)
            if best is None or post > best[0] + 1e-9 or (
                abs(post - best[0]) <= 1e-9 and s < best[1]
            ):
                if best is None or post > best[0] + 1e-9:
                    best = (post, s)
                elif abs(post - best[0]) <= 1e-9 and s < best[1]:
                    best = (post, s)
        conf[(r["source"], best[1])] = conf.get((r["source"], best[1]), 0) + 1
    assert out == conf
    # training accuracy beats the prior-only baseline
    correct = sum(n for (t, p), n in conf.items() if t == p)
    assert correct / dtot > max(d_s.values()) / dtot


def test_bh_fdr_step_up_matches_python(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.stats import (
        bh_fdr_segment_tests,
        permutation_test_mean_diff,
    )

    out = [r.asDict() for r in bh_fdr_segment_tests(spark, sf_dir).collect()]
    pt = [
        (r["p_value"], r["s1"], r["s2"])
        for r in permutation_test_mean_diff(spark, sf_dir).collect()
    ]
    pt.sort()
    m = len(pt)
    flags = [
        k if p <= 0.05 * k / m else 0
        for k, (p, _, _) in enumerate(pt, start=1)
    ]
    k_star = max(flags)
    assert len(out) == m
    for row, (k, (p, s1, s2)) in zip(out, enumerate(pt, start=1)):
        assert (row["s1"], row["s2"], row["k"]) == (s1, s2, k)
        assert row["p_value"] == pytest.approx(p, abs=1e-9)
        assert row["bh_threshold"] == pytest.approx(
            math.floor(0.05 * k / m * 1e6 + 0.5) / 1e6, abs=1e-9
        )
        assert row["rejected"] == (1 if k <= k_star else 0)
    # BH rejects a PREFIX of the sorted p-values, never a gap
    rejected = [r["rejected"] for r in out]
    assert rejected == sorted(rejected, reverse=True)


def test_sax_symbols_match_python(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.timeseries import sax_symbolic_daily

    out = {r["event_type"]: r for r in sax_symbolic_daily(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily: dict = {}
    for r in ev:
        v = r["value"]
        if v is None or not math.isfinite(v):
            continue
        k = (r["event_type"], r["ts"].date())
        daily[k] = daily.get(k, 0) + math.floor(v * 100.0 + 0.5)
    by_type: dict = {}
    for (et, day), c in daily.items():
        by_type.setdefault(et, []).append((day, c))
    bp = 0.6744897501960817
    assert set(out) == set(by_type)
    for et, series in by_type.items():
        series.sort()
        cs = [c for _, c in series]
        n = len(cs)
        mu = sum(cs) / n
        nvar = n * sum(c * c for c in cs) - sum(cs) ** 2
        sd = math.sqrt(nvar / (n * n))
        syms = []
        for c in cs:
            if nvar <= 0:
                syms.append("b")
                continue
            z = (c - mu) / sd
            syms.append("a" if z < -bp else "b" if z < 0 else "c" if z < bp else "d")
        sax = "".join(syms)
        motifs: dict = {}
        for a, b in zip(syms, syms[1:]):
            motifs[a + b] = motifs.get(a + b, 0) + 1
        top = min(motifs.items(), key=lambda kv: (-kv[1], kv[0]))
        r = out[et]
        assert r["n_days"] == n
        assert r["sax_string"] == sax
        assert (r["top_motif"], r["motif_count"]) == top
        # symbols are roughly balanced under z-normalization: no
        # single symbol owns the whole series on real data
        assert len(set(sax)) >= 2
