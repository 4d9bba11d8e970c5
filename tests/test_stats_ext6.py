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

from pipeline_query_engine_demo_spark.plans.stats import permutation_test_mean_diff
from pipeline_query_engine_demo_spark.plans.timeseries import markov_entropy_rate
from pipeline_query_engine_demo_spark.plans.training import jackknife_source_loo


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


def test_target_encoding_leave_fold_out(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.stats import target_encoding_kfold

    out = {(r["category"], r["fold"]): r for r in target_encoding_kfold(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cells: dict = {}
    for r in orders:
        k = (r["o_orderpriority"], r["o_orderkey"] % 5)
        n, s = cells.get(k, (0, 0))
        cells[k] = (n + 1, s + (1 if r["o_orderstatus"] == "F" else 0))
    cats: dict = {}
    for (c, _), (n, s) in cells.items():
        cn, cs = cats.get(c, (0, 0))
        cats[c] = (cn + n, cs + s)
    assert set(out) == set(cells)
    for (c, f), (n, s) in cells.items():
        cn, cs = cats[c]
        r = out[(c, f)]
        assert r["n_fold"] == n
        assert r["encoding"] == pytest.approx((cs - s) / (cn - n), abs=1e-6)
        assert r["full_rate"] == pytest.approx(cs / cn, abs=1e-6)
        # the defining property: the fold's own labels never enter its
        # encoding — removing them shifts it away from the full rate
        # whenever the fold's rate differs from the rest
        if n and (s / n) != ((cs - s) / (cn - n)):
            assert r["encoding"] != pytest.approx(s / n, abs=1e-12)


def test_user_feature_matrix_matches_replay(spark, sf_dir):
    import datetime

    from pipeline_query_engine_demo_spark.plans.llm import (  # noqa: F401
        time_decayed_engagement,
    )
    from pipeline_query_engine_demo_spark.plans.stats import user_feature_matrix

    out = {r["user_id"]: r for r in user_feature_matrix(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    hday = max(r["ts"] for r in ev).date()
    feats: dict = {}
    for r in ev:
        f = feats.setdefault(
            r["user_id"],
            {"n": 0, "p": 0, "types": set(), "days": set(), "ages": [], "cents": 0},
        )
        f["n"] += 1
        f["p"] += r["event_type"] == "purchase"
        f["types"].add(r["event_type"])
        day = r["ts"].date()
        f["days"].add(day)
        f["ages"].append((hday - day).days)
        v = r["value"]
        if v is not None and math.isfinite(v):
            f["cents"] += math.floor(v * 100.0 + 0.5)
    assert set(out) == set(feats)
    for uid, f in feats.items():
        r = out[uid]
        assert r["n_events"] == f["n"]
        assert r["n_purchases"] == f["p"]
        assert r["n_types"] == len(f["types"])
        assert r["active_days"] == len(f["days"])
        assert r["recency_days"] == min(f["ages"])
        assert r["total_cents"] == f["cents"]
        assert r["avg_value"] == pytest.approx(
            f["cents"] / (f["n"] * 100.0), abs=1e-6
        )
        assert r["churned_7d"] == (1 if min(f["ages"]) > 7 else 0)


def test_ar1_forecast_matches_numpy_ols(spark, sf_dir):
    """phi/intercept/forecast must equal a numpy lstsq over the same
    lag pairs built from the collected daily series."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.timeseries import ar1_forecast_daily
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = {r.event_type: r for r in ar1_forecast_daily(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev[np.isfinite(ev["value"])]
    ev["day"] = ev["ts"].dt.floor("D")
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype("int64")
    for et, grp in ev.groupby("event_type"):
        s = grp.groupby("day")["cents"].sum().sort_index().to_numpy(np.float64)
        x, y = s[:-1], s[1:]
        X = np.column_stack([np.ones_like(x), x])
        (b0, b1), *_ = np.linalg.lstsq(X, y, rcond=None)
        r = got[et]
        assert r.n_pairs == len(x)
        assert abs(r.phi - b1) <= 1e-9 * max(1.0, abs(b1))
        assert abs(r.intercept - b0) <= 1e-6 * max(1.0, abs(b0))
        assert abs(r.forecast_cents - (b0 + b1 * s[-1])) <= 1e-6 * max(
            1.0, abs(r.forecast_cents)
        )


def test_repetition_filter_planted_doc(spark):
    """A planted doc made of ONE phrase repeated must be rejected with
    dup_frac near 1 and top_frac dominated by the repeated 3-gram; a
    phrase-diverse doc must be kept."""
    from pipeline_query_engine_demo_spark.plans.registry import REGISTRY
    import pyspark.sql.functions as F
    from pipeline_query_engine_demo_spark.functions.text import shingles

    docs = spark.createDataFrame(
        [
            (1, " ".join(["spam ham eggs"] * 20)),
            (2, " ".join(f"w{i}" for i in range(60))),
        ],
        "doc_id long, text string",
    )
    grams = docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("g"))
    per = grams.groupBy("doc_id", "g").count()
    sig = {
        r.doc_id: (r.total, r.distinct_n, r.top)
        for r in per.groupBy("doc_id")
        .agg(
            F.sum("count").alias("total"),
            F.count(F.lit(1)).alias("distinct_n"),
            F.max("count").alias("top"),
        )
        .collect()
    }
    total, distinct_n, top = sig[1]
    assert distinct_n == 3  # the 3 rotations of the repeated phrase
    assert top >= total // 3  # dominated by one gram
    assert (total == distinct_n) is False  # would be rejected
    t2, d2, top2 = sig[2]
    assert t2 == d2 and top2 * 20 <= t2  # kept by the integer predicate


def test_vocab_coverage_p90_brute_force(spark, sf_dir):
    """n_types_p90 must equal the brute-force smallest prefix of the
    (count desc, token asc) ordering covering >= 90% of occurrences."""
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.training import vocab_coverage_p90
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = {r.source: r for r in vocab_coverage_p90(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    for src, grp in docs.groupby("source"):
        c = Counter()
        for t in grp["text"]:
            c.update(t.split(" "))
        total = sum(c.values())
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        cum = 0
        for k, (_, cnt) in enumerate(ordered, 1):
            cum += cnt
            if cum * 10 >= 9 * total:
                break
        r = got[src]
        assert (r.total_tokens, r.vocab_size, r.n_types_p90) == (total, len(c), k)


def test_adamic_adar_brute_force(spark, sf_dir):
    """Top-50 AA candidates must match a pure-python brute force over
    the collected co-purchase graph (same hub cap, same rounding)."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from pipeline_query_engine_demo_spark.plans.analytics import _AA_HUB_CAP
    from pipeline_query_engine_demo_spark.plans.graph import link_prediction_adamic_adar
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = [
        (r.u, r.v, r.common_neighbors, r.aa_score)
        for r in link_prediction_adamic_adar(spark, sf_dir).collect()
    ]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas()
    by_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[o].add(p)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    scores = defaultdict(lambda: [0, Decimal(0)])
    for w, nb in nbrs.items():
        if len(nb) > _AA_HUB_CAP:
            continue
        term = Decimal(math.floor(1.0 / math.log(float(len(nb))) * 1e9 + 0.5)) / Decimal(10**9)
        ns = sorted(nb)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                pair = (ns[i], ns[j])
                if pair not in edges:
                    s = scores[pair]
                    s[0] += 1
                    s[1] += term
    exp = sorted(
        (
            (u, v, cn, math.floor(float(aa) * 1e6 + 0.5) / 1e6)
            for (u, v), (cn, aa) in scores.items()
        ),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:50]
    assert got == exp


def test_nelson_aalen_python_replay(spark, sf_dir):
    """H(t) must equal the pure-python at-risk walk over collected
    per-customer lifetimes (same censoring rule, same 9dp lattice)."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from pipeline_query_engine_demo_spark.plans.timeseries import nelson_aalen_hazard
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = [
        (r.mktsegment, r.t_days, r.at_risk, r.deaths, r.cum_hazard)
        for r in nelson_aalen_hazard(spark, sf_dir).collect()
    ]
    orders = load_table(spark, sf_dir, "orders").toPandas()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    seg = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    hmax = orders["o_orderdate"].max()
    per = orders.groupby("o_custkey")["o_orderdate"].agg(["min", "max"])
    lifetimes = defaultdict(list)
    for ck, row in per.iterrows():
        t = (row["max"] - row["min"]).days
        churn = 1 if (hmax - row["max"]).days > 90 else 0
        lifetimes[seg[ck]].append((t, churn))
    exp = []
    for s in sorted(lifetimes):
        lst = sorted(lifetimes[s])
        n = len(lst)
        by_t = defaultdict(lambda: [0, 0])
        for t, ch in lst:
            by_t[t][0] += 1
            by_t[t][1] += ch
        at_risk = n
        h = Decimal(0)
        for t in sorted(by_t):
            cnt, d = by_t[t]
            if d > 0:
                h += Decimal(math.floor(d / at_risk * 1e9 + 0.5)) / Decimal(10**9)
                exp.append((s, t, at_risk, d, math.floor(float(h) * 1e6 + 0.5) / 1e6))
            at_risk -= cnt
    assert got == exp


def test_bigram_greedy_decode_python_replay(spark, sf_dir):
    """The decoded chain must equal the pure-python greedy walk over
    Counter-built bigrams (same seed rule, same tie-breaks)."""
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.llm import _DECODE_STEPS
    from pipeline_query_engine_demo_spark.plans.training import bigram_greedy_decode
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = [r.token for r in bigram_greedy_decode(spark, sf_dir).collect()]
    docs = load_table(spark, sf_dir, "documents").select("text").toPandas()
    bi = Counter()
    for t in docs["text"]:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    heads = Counter()
    for (a, _), c in bi.items():
        heads[a] += c
    cur = min(heads, key=lambda w: (-heads[w], w))
    exp = [cur]
    for _ in range(_DECODE_STEPS):
        succ = [(w2, c) for (w1, w2), c in bi.items() if w1 == cur]
        cur = min(succ, key=lambda t: (-t[1], t[0]))[0]
        exp.append(cur)
    assert got == exp


def test_two_step_transition_probs_sum_to_one(spark, sf_dir):
    """Per seed, Σ_v P²(seed→v) must be ~1 (each hop distributes 1/d
    over ALL neighbors) and every target must be within 2 hops of the
    seed in a python adjacency replay."""
    from collections import defaultdict

    from pipeline_query_engine_demo_spark.plans.timeseries import (
        two_step_transition_probs,
    )
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    rows = two_step_transition_probs(spark, sf_dir).collect()
    by_seed = defaultdict(float)
    for r in rows:
        by_seed[r.seed] += r.p2
    for s, tot in by_seed.items():
        assert abs(tot - 1.0) < 1e-3, (s, tot)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas()
    nbrs = defaultdict(set)
    by_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[o].add(p)
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                nbrs[ps[i]].add(ps[j])
                nbrs[ps[j]].add(ps[i])
    for r in rows:
        two_hop = {v for w in nbrs[r.seed] for v in nbrs[w]}
        assert r.target in two_hop
