"""Semantic tests for the round-7 session-4 batch-C queries:
Markov entropy rate, Monte-Carlo randomization test, and the
delete-one-group jackknife.

The registry gate proves DuckDB parity; these replay the math in pure
python so a parity-preserving-but-wrong formula can't slip through on
both engines at once.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from pipeline_query_engine_demo_spark.plans.analytics import (
    markov_entropy_rate,
    permutation_test_mean_diff,
)
from pipeline_query_engine_demo_spark.plans.llm import jackknife_source_loo


def test_markov_entropy_rate_matches_bruteforce(spark, sf_dir):
    out = {r["event_type"]: r for r in markov_entropy_rate(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    trans: dict = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    outs: dict = {}
    for (a, _), c in trans.items():
        outs[a] = outs.get(a, 0) + c
    n = sum(outs.values())
    assert set(out) == set(outs)
    rate = 0.0
    for a, n_i in outs.items():
        h = -sum(
            (c / n_i) * math.log2(c / n_i)
            for (x, _), c in trans.items()
            if x == a
        )
        r = out[a]
        assert r["n_transitions"] == n_i
        assert r["pi_share"] == pytest.approx(n_i / n, abs=1e-6)
        assert r["h_cond_bits"] == pytest.approx(h, abs=1e-5)
        assert r["rate_contrib_bits"] == pytest.approx(h * n_i / n, abs=1e-5)
        rate += h * n_i / n
    # conditioning can't exceed the log of the alphabet size
    assert 0.0 <= rate <= math.log2(len(outs)) + 1e-9


def _u01(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) / 1152921504606846976.0


def test_permutation_test_matches_hash_replay(spark, sf_dir):
    out = {(r["s1"], r["s2"]): r for r in permutation_test_mean_diff(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    by_seg: dict = {}
    for r in cust:
        by_seg.setdefault(r["c_mktsegment"], []).append(
            (r["c_custkey"], math.floor(r["c_acctbal"] * 100.0 + 0.5))
        )
    segs = sorted(by_seg)
    for i, s1 in enumerate(segs):
        for s2 in segs[i + 1:]:
            a, b = by_seg[s1], by_seg[s2]
            n1, n2 = len(a), len(b)
            t_obs = sum(c for _, c in a) / (n1 * 100.0) - sum(
                c for _, c in b
            ) / (n2 * 100.0)
            pooled = a + b
            thresh = n1 / (n1 + n2)
            n_extreme = n_reps = 0
            for rep in range(64):
                sa = na = sb = nb = 0
                for ck, cents in pooled:
                    if _u01(f"{ck}:{rep}:{s1}:{s2}") < thresh:
                        sa += cents
                        na += 1
                    else:
                        sb += cents
                        nb += 1
                if na == 0 or nb == 0:
                    continue
                n_reps += 1
                t_b = sa / (na * 100.0) - sb / (nb * 100.0)
                n_extreme += abs(t_b) >= abs(t_obs)
            r = out[(s1, s2)]
            assert (r["n1"], r["n2"]) == (n1, n2)
            assert r["t_obs"] == pytest.approx(t_obs, abs=1e-6)
            assert r["n_extreme"] == n_extreme
            assert r["p_value"] == pytest.approx(
                (n_extreme + 1) / (n_reps + 1), abs=1e-6
            )
            # a valid Monte-Carlo p-value is always in (0, 1]
            assert 0.0 < r["p_value"] <= 1.0


def test_jackknife_matches_loo_replay(spark, sf_dir):
    out = {r["source"]: r for r in jackknife_source_loo(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    per_src: dict = {}
    for r in docs:
        n, s = per_src.get(r["source"], (0, 0))
        per_src[r["source"]] = (n + 1, s + int(r["n_chars"]))
    nn = sum(n for n, _ in per_src.values())
    ss = sum(s for _, s in per_src.values())
    g = len(per_src)
    theta = ss / nn
    loos = {
        src: (ss - s) / (nn - n) for src, (n, s) in per_src.items()
    }
    mean_loo = sum(loos.values()) / g
    se = math.sqrt(
        (g - 1) / g * sum((t - mean_loo) ** 2 for t in loos.values())
    )
    assert set(out) == set(per_src)
    for src, (n, _) in per_src.items():
        r = out[src]
        assert r["n_docs"] == n
        assert r["loo_mean"] == pytest.approx(loos[src], abs=1e-5)
        assert r["influence"] == pytest.approx(theta - loos[src], abs=1e-5)
        assert r["jack_se"] == pytest.approx(se, abs=1e-5)
    # influences sum to ~G*(theta - mean_loo); spot the identity
    infl_sum = sum(theta - t for t in loos.values())
    assert infl_sum == pytest.approx(g * (theta - mean_loo), abs=1e-9)
