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
    sprt_ab_conversion,
)
from pipeline_query_engine_demo_spark.plans.llm import (
    naive_bayes_source_classify,
)


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
