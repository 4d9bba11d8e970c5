"""Semantic tests for the round-4 session-2 extension queries: EWMA
smoothing, interval sweep concurrency, Welch's t-test, and
Mann-Whitney U.

The registry gate proves DuckDB parity; these pin the math against
independent numpy/pandas recomputation so a parity-preserving-but-wrong
formula can't slip through on both engines at once.
"""

from __future__ import annotations

import math

import numpy as np

from pipeline_query_engine_demo_spark.plans.stats import (
    mann_whitney_u_events,
    welch_ttest_acctbal,
)
from pipeline_query_engine_demo_spark.plans.timeseries import interval_sweep_concurrency
from pipeline_query_engine_demo_spark.plans.windows import (
    _EWMA_WEIGHTS,
    ewma_smoothed_values,
)


def test_ewma_matches_direct_recomputation(spark, sf_dir):
    out = {r["user_id"]: r for r in ewma_smoothed_values(spark, sf_dir).collect()}
    assert out
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["value"]))
    assert set(out) == set(by_user)
    for uid, rows in by_user.items():
        rows.sort()
        tail = [v for _, _, v in rows][-8:][::-1]  # most recent first
        num = sum(w * v for w, v in zip(_EWMA_WEIGHTS, tail))
        den = sum(w for w, _ in zip(_EWMA_WEIGHTS, tail))
        r = out[uid]
        assert r["n_events"] == len(rows)
        assert math.isclose(r["last_value"], rows[-1][2], abs_tol=1e-6)
        # micro-unit scaling introduces <=0.5e-6 per tap before the final round
        assert math.isclose(r["ewma_value"], num / den, abs_tol=5e-6)


def test_sweep_concurrency_matches_bruteforce(spark, sf_dir):
    out = {
        r["event_type"]: r for r in interval_sweep_concurrency(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "ts").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["ts"].timestamp())
    assert set(out) == set(by_type)
    hour = 3600.0
    for et, starts in by_type.items():
        s = np.array(sorted(starts))
        # for half-open intervals the max concurrency is attained at a start
        best = max(int(((t >= s) & (t < s + hour)).sum()) for t in s)
        assert out[et]["n_intervals"] == len(s)
        assert out[et]["max_concurrent"] == best


def test_welch_matches_numpy(spark, sf_dir):
    row = welch_ttest_acctbal(spark, sf_dir).collect()[0]
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    g1 = np.array([r["c_acctbal"] for r in cust if r["c_mktsegment"] == "BUILDING"])
    g2 = np.array([r["c_acctbal"] for r in cust if r["c_mktsegment"] == "MACHINERY"])
    v1, v2 = g1.var(ddof=1), g2.var(ddof=1)
    se = v1 / len(g1) + v2 / len(g2)
    t = (g1.mean() - g2.mean()) / math.sqrt(se)
    df = se * se / (
        (v1 / len(g1)) ** 2 / (len(g1) - 1) + (v2 / len(g2)) ** 2 / (len(g2) - 1)
    )
    assert row["n1"] == len(g1) and row["n2"] == len(g2)
    assert math.isclose(row["mean_1"], g1.mean(), abs_tol=1e-4)
    assert math.isclose(row["mean_2"], g2.mean(), abs_tol=1e-4)
    assert math.isclose(row["t_stat"], t, abs_tol=1e-4)
    assert math.isclose(row["df_welch"], df, rel_tol=1e-6, abs_tol=1e-3)


def _midranks(values: np.ndarray) -> np.ndarray:
    order = np.argsort(values, kind="mergesort")
    ranks = np.empty(len(values), dtype=np.float64)
    sorted_v = values[order]
    i = 0
    while i < len(values):
        j = i
        while j < len(values) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    return ranks


def test_mann_whitney_matches_numpy(spark, sf_dir):
    row = mann_whitney_u_events(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    g1 = np.array([r["value"] for r in ev if r["event_type"] == "click"])
    g2 = np.array([r["value"] for r in ev if r["event_type"] == "view"])
    combined = np.concatenate([g1, g2])
    ranks = _midranks(combined)
    r1 = ranks[: len(g1)].sum()
    n1, n2 = len(g1), len(g2)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    _, counts = np.unique(combined, return_counts=True)
    tie = float((counts**3 - counts).sum())
    var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert row["n1"] == n1 and row["n2"] == n2
    assert math.isclose(row["u_stat"], u1, abs_tol=1e-6)
    assert math.isclose(row["z_stat"], z, abs_tol=1e-5)


def test_interval_overlap_join_matches_bruteforce(spark, sf_dir):
    from datetime import timedelta

    from pipeline_query_engine_demo_spark.plans.windows import interval_overlap_join

    out = {r["promo_month"]: r for r in interval_overlap_join(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    months = sorted({r["o_orderdate"].replace(day=1, hour=0, minute=0, second=0, microsecond=0) for r in orders})
    assert set(out) == set(months)
    for m in months:
        p_end = m + timedelta(days=10)
        hits = [
            r for r in orders
            if r["o_orderdate"] < p_end and m < r["o_orderdate"] + timedelta(days=7)
        ]
        assert out[m]["n_orders"] == len(hits)
        assert abs(out[m]["revenue"] - round(sum(round(r["o_totalprice"], 2) for r in hits), 2)) < 1e-6


def test_event_transition_matrix_matches_bruteforce(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.timeseries import (
        event_transition_matrix,
    )

    out = {(r["from_type"], r["to_type"]): r for r in event_transition_matrix(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["event_type"]))
    counts: dict = {}
    for rows in by_user.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    assert set(out) == set(counts)
    totals: dict = {}
    for (a, _), n in counts.items():
        totals[a] = totals.get(a, 0) + n
    for key, n in counts.items():
        assert out[key]["n"] == n
        assert abs(out[key]["prob"] - n / totals[key[0]]) < 1e-6
    # rows of the matrix must sum to 1 (up to rounding)
    for a, tot in totals.items():
        s = sum(r["prob"] for (f, _), r in out.items() if f == a)
        assert abs(s - 1.0) < 1e-4


def test_assoc_rules_match_bruteforce(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    from pipeline_query_engine_demo_spark.plans.graph import assoc_rules_copurchase

    out = assoc_rules_copurchase(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey").collect()
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n_orders = len(baskets)
    supp = Counter()
    pair_supp = Counter()
    for parts in baskets.values():
        supp.update(parts)
        pair_supp.update(combinations(sorted(parts), 2))
    expected = []
    for (p1, p2), sp in pair_supp.items():
        if sp >= 2:
            lift = n_orders * sp / (supp[p1] * supp[p2])
            expected.append((round(lift * 1e6 + 1e-9) / 1e6, p1, p2, sp))
    expected.sort(key=lambda t: (-t[0], t[1], t[2]))
    assert len(out) == min(20, len(expected))
    for row, (lift, p1, p2, sp) in zip(out, expected):
        assert (row["p1"], row["p2"], row["pair_support"]) == (p1, p2, sp)
        assert abs(row["lift"] - lift) < 1e-6
        assert abs(row["conf_12"] - sp / supp[p1]) < 1e-6
        assert abs(row["conf_21"] - sp / supp[p2]) < 1e-6


def test_cohens_kappa_matches_bruteforce(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.stats import cohens_kappa_quality

    row = cohens_kappa_quality(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    labs = [(r["n_chars"] >= 500, len(r["text"].split(" ")) >= 90) for r in docs]
    n = len(labs)
    n11 = sum(1 for a, b in labs if a and b)
    n10 = sum(1 for a, b in labs if a and not b)
    n01 = sum(1 for a, b in labs if not a and b)
    n00 = sum(1 for a, b in labs if not a and not b)
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    assert (row["n"], row["n11"], row["n10"], row["n01"], row["n00"]) == (n, n11, n10, n01, n00)
    assert abs(row["kappa"] - (po - pe) / (1 - pe)) < 1e-6
    assert -1.0 <= row["kappa"] <= 1.0


def test_hhi_matches_bruteforce_and_bounds(spark, sf_dir):
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.analytics import source_concentration_hhi

    row = source_concentration_hhi(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    dc = Counter(r["source"] for r in docs)
    tc = Counter()
    for r in docs:
        tc[r["source"]] += len(r["text"].split(" "))
    k = len(dc)
    hhi_d = sum(v * v for v in dc.values()) / sum(dc.values()) ** 2
    hhi_t = sum(v * v for v in tc.values()) / sum(tc.values()) ** 2
    assert row["n_sources"] == k
    assert abs(row["hhi_docs"] - hhi_d) < 1e-8
    assert abs(row["hhi_tokens"] - hhi_t) < 1e-8
    assert 1.0 / k - 1e-9 <= row["hhi_docs"] <= 1.0
    assert 1.0 <= row["effective_sources_docs"] <= k + 1e-6


def test_diversity_capped_topk_respects_cap(spark, sf_dir):
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.curation import diversity_capped_topk_docs

    out = diversity_capped_topk_docs(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    per_source = Counter(r["source"] for r in out)
    assert all(v <= 2 for v in per_source.values())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    # brute-force: cap two longest per source, then global top
    best: dict = {}
    for r in sorted(docs, key=lambda r: (-r["n_chars"], r["doc_id"])):
        best.setdefault(r["source"], []).append(r)
    pool = [r for rows in best.values() for r in rows[:2]]
    pool.sort(key=lambda r: (-r["n_chars"], r["doc_id"]))
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in pool[: len(out)]]


def test_bfs_matches_networkx_free_bruteforce(spark, sf_dir):
    from collections import deque

    from pipeline_query_engine_demo_spark.plans.graph import bfs_reachability_copurchase

    out = {r["dist"]: r for r in bfs_reachability_copurchase(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey").collect()
    orders: dict = {}
    for r in li:
        orders.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    adj: dict = {}
    for parts in orders.values():
        for p in parts:
            adj.setdefault(p, set()).update(x for x in parts if x != p)
    seed = min(p for parts in orders.values() for p in parts)
    dist = {seed: 0}
    dq = deque([seed])
    while dq:
        u = dq.popleft()
        if dist[u] >= 3:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    from collections import Counter

    per = Counter(dist.values())
    assert {d: r["n_nodes"] for d, r in out.items()} == dict(per)
    for d, r in out.items():
        nodes = [n for n, dd in dist.items() if dd == d]
        assert r["min_partkey"] == min(nodes) and r["max_partkey"] == max(nodes)


def test_nearest_rank_percentiles_match_bruteforce(spark, sf_dir):
    import math

    from pipeline_query_engine_demo_spark.plans.stats import nearest_rank_percentiles

    out = {r["event_type"]: r for r in nearest_rank_percentiles(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append((r["value"], r["event_id"]))
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        r = out[et]
        assert r["n"] == n
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.95, "p95"), (0.99, "p99")):
            assert r[col] == vals[math.ceil(p * n) - 1][0]
        assert r["p50"] <= r["p90"] <= r["p95"] <= r["p99"]


def test_rolling_distinct_users_matches_bruteforce(spark, sf_dir):
    from datetime import timedelta

    from pipeline_query_engine_demo_spark.plans.windows import rolling_distinct_users

    out = {r["day"]: r["users_7d"] for r in rolling_distinct_users(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    ud = {(r["ts"].replace(hour=0, minute=0, second=0, microsecond=0), r["user_id"]) for r in ev}
    days = sorted({d for d, _ in ud})
    assert set(out) == set(days)
    for day in days:
        users = {u for d, u in ud if day - timedelta(days=6) <= d <= day}
        assert out[day] == len(users)


def test_token_log_odds_matches_bruteforce(spark, sf_dir):
    import math
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.training import token_log_odds_by_source

    out = token_log_odds_by_source(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    c1: Counter = Counter()
    c2: Counter = Counter()
    for r in docs:
        if r["source"] == "src0":
            c1.update(r["text"].split(" "))
        elif r["source"] == "src1":
            c2.update(r["text"].split(" "))
    n1, n2 = sum(c1.values()), sum(c2.values())
    scored = []
    for tok in set(c1) | set(c2):
        a, b = c1.get(tok, 0), c2.get(tok, 0)
        delta = math.log((a + 0.5) / (n1 - a + 0.5)) - math.log(
            (b + 0.5) / (n2 - b + 0.5)
        )
        z = delta / math.sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5))
        scored.append((round(z * 1e6 + 1e-9) / 1e6, tok, a, b))
    scored.sort(key=lambda t: (-t[0], t[1]))
    assert len(out) == 10
    for row, (z, tok, a, b) in zip(out, scored[:10]):
        assert row["tok"] == tok
        assert (row["c1"], row["c2"]) == (a, b)
        assert abs(row["log_odds_z"] - z) < 1e-6


def test_cusum_matches_bruteforce(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.analytics import _CUSUM_H, _CUSUM_K
    from pipeline_query_engine_demo_spark.plans.timeseries import cusum_change_detection

    out = {r["user_id"]: r for r in cusum_change_detection(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["value"]))
    assert set(out) == set(by_user)
    for uid, rows in by_user.items():
        rows.sort()
        s = mx = alarms = 0
        for _, _, v in rows:
            s = max(0, s + round(v * 100) - _CUSUM_K)
            mx = max(mx, s)
            if s >= _CUSUM_H:
                alarms += 1
        r = out[uid]
        assert r["n_events"] == len(rows)
        assert (r["final_cusum"], r["max_cusum"], r["n_alarms"]) == (s, mx, alarms)


def test_winsorized_mean_matches_numpy(spark, sf_dir):
    import math

    from pipeline_query_engine_demo_spark.plans.stats import winsorized_mean_events

    out = {r["event_type"]: r for r in winsorized_mean_events(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append((r["value"], r["event_id"]))
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        lo = vals[math.ceil(0.05 * n) - 1][0]
        hi = vals[math.ceil(0.95 * n) - 1][0]
        wv = [min(max(v, lo), hi) for v, _ in vals]
        r = out[et]
        assert r["n"] == n
        assert abs(r["raw_mean"] - sum(v for v, _ in vals) / n) < 1e-6
        assert abs(r["winsorized_mean"] - sum(wv) / n) < 1e-6
        # winsorizing pulls the mean toward the median, never outside [lo, hi]
        assert lo <= r["winsorized_mean"] <= hi


def test_mutual_information_matches_bruteforce(spark, sf_dir):
    import math
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.stats import (
        mutual_information_source_lang,
    )

    row = mutual_information_source_lang(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cells = Counter((r["source"], r["lang"]) for r in docs)
    ni = Counter(r["source"] for r in docs)
    nj = Counter(r["lang"] for r in docs)
    n = len(docs)
    mi = sum(
        (c / n) * math.log(c * n / (ni[s] * nj[l]))
        for (s, l), c in cells.items()
    )
    hs = -sum((c / n) * math.log(c / n) for c in ni.values())
    hl = -sum((c / n) * math.log(c / n) for c in nj.values())
    assert row["n"] == n
    assert abs(row["mi_nats"] - mi) < 1e-6
    assert abs(row["h_source"] - hs) < 1e-6
    assert abs(row["h_lang"] - hl) < 1e-6
    assert abs(row["nmi"] - mi / math.sqrt(hs * hl)) < 1e-6
    # information bounds: 0 <= MI <= min(H_source, H_lang)
    assert -1e-9 <= row["mi_nats"] <= min(hs, hl) + 1e-9
    assert 0.0 <= row["nmi"] <= 1.0 + 1e-9


def test_wilson_ci_matches_bruteforce(spark, sf_dir):
    import math

    from pipeline_query_engine_demo_spark.plans.stats import wilson_ci_conversion

    out = {r["day"]: r for r in wilson_ci_conversion(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    flags: dict = {}
    for r in ev:
        day = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        f = flags.setdefault((day, r["user_id"]), [False, False])
        if r["event_type"] == "click":
            f[0] = True
        elif r["event_type"] == "purchase":
            f[1] = True
    per_day: dict = {}
    for (day, _), (c, p) in flags.items():
        n, k = per_day.get(day, (0, 0))
        per_day[day] = (n + (1 if c else 0), k + (1 if c and p else 0))
    z = 1.96
    for day, (n, k) in per_day.items():
        if n == 0:
            assert day not in out
            continue
        p = k / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        r = out[day]
        assert (r["n"], r["k"]) == (n, k)
        assert abs(r["conversion"] - p) < 1e-6
        assert abs(r["wilson_lo"] - (center - half)) < 1e-6
        assert abs(r["wilson_hi"] - (center + half)) < 1e-6
        assert 0.0 <= r["wilson_lo"] <= r["conversion"] <= r["wilson_hi"] <= 1.0


def test_signup_latency_matches_bruteforce(spark, sf_dir):
    import math

    from pipeline_query_engine_demo_spark.plans.timeseries import (
        signup_to_purchase_latency,
    )

    row = signup_to_purchase_latency(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    signup: dict = {}
    for r in ev:
        if r["event_type"] == "signup":
            u = r["user_id"]
            if u not in signup or r["ts"] < signup[u]:
                signup[u] = r["ts"]
    first_p: dict = {}
    for r in ev:
        if r["event_type"] == "purchase" and r["user_id"] in signup and r["ts"] >= signup[r["user_id"]]:
            u = r["user_id"]
            if u not in first_p or r["ts"] < first_p[u]:
                first_p[u] = r["ts"]
    lats = sorted(
        (int((first_p[u] - signup[u]).total_seconds() * 1e6), u) for u in first_p
    )
    n = len(lats)
    assert row["n_converted"] == n
    mids = [m for i, (m, _) in enumerate(lats, start=1)
            if 2 * i in (n, n + 1, n + 2)]
    assert abs(row["median_latency_sec"] - sum(mids) / len(mids) / 1e6) < 1e-5
    assert abs(row["p90_latency_sec"] - lats[math.ceil(0.9 * n) - 1][0] / 1e6) < 1e-6


def test_rfm_matches_bruteforce(spark, sf_dir):
    import math
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.analytics import rfm_segmentation

    out = {(r["r_score"], r["f_score"], r["m_score"]): r
           for r in rfm_segmentation(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    per: dict = {}
    for r in orders:
        c = per.setdefault(r["o_custkey"], {"last": r["o_orderdate"], "n": 0, "m": 0})
        c["last"] = max(c["last"], r["o_orderdate"])
        c["n"] += 1
        c["m"] += round(r["o_totalprice"] * 100)
    ref = max(c["last"] for c in per.values())
    users = [
        (ck, (ref - c["last"]).days, c["n"], c["m"]) for ck, c in per.items()
    ]
    n = len(users)

    def quintile(ranked_keys):
        return {ck: math.ceil(5 * (i + 1) / n) for i, ck in enumerate(ranked_keys)}

    qr = quintile([ck for ck, d, _, _ in sorted(users, key=lambda t: (t[1], t[0]))])
    qf = quintile([ck for ck, _, f, _ in sorted(users, key=lambda t: (t[2], t[0]))])
    qm = quintile([ck for ck, _, _, m in sorted(users, key=lambda t: (t[3], t[0]))])
    cells = Counter()
    money = Counter()
    for ck, _, _, m in users:
        key = (6 - qr[ck], qf[ck], qm[ck])
        cells[key] += 1
        money[key] += m
    assert {k: r["n_users"] for k, r in out.items()} == dict(cells)
    for k, r in out.items():
        assert r["total_monetary_cents"] == money[k]
    assert sum(r["n_users"] for r in out.values()) == n
    # every score in 1..5
    for (a, b, c) in out:
        assert 1 <= a <= 5 and 1 <= b <= 5 and 1 <= c <= 5


def test_benford_matches_bruteforce(spark, sf_dir):
    import math
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.stats import benford_digit_test

    out = {r["digit"]: r for r in benford_digit_test(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    digits = Counter(
        int(str(int(r["o_totalprice"]))[0])
        for r in orders if r["o_totalprice"] >= 1.0
    )
    n = sum(digits.values())
    assert {d: r["observed"] for d, r in out.items()} == dict(digits)
    for d, r in out.items():
        e = n * math.log10(1 + 1 / d)
        assert abs(r["expected"] - e) < 1e-4
        assert abs(r["chi2_term"] - (digits[d] - e) ** 2 / e) < 1e-4
    # expectations themselves must sum to ~n
    assert abs(sum(r["expected"] for r in out.values()) - n) < 1e-2


def test_seasonal_naive_matches_bruteforce(spark, sf_dir):
    from collections import defaultdict

    from pipeline_query_engine_demo_spark.plans.timeseries import (
        seasonal_naive_backtest,
    )

    out = {r["month"]: r for r in seasonal_naive_backtest(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    rev = defaultdict(int)
    for r in orders:
        m = r["o_orderdate"].replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        rev[m] += round(r["o_totalprice"] * 100)
    expected = {}
    for m, a in rev.items():
        ly = m.replace(year=m.year - 1)
        if ly in rev:
            expected[m] = (a, rev[ly])
    assert set(out) == set(expected)
    for m, (a, f) in expected.items():
        r = out[m]
        assert (r["actual_cents"], r["forecast_cents"]) == (a, f)
        assert abs(r["ape"] - abs(a - f) / a) < 1e-6


def test_seasonal_baseline_outliers_matches_bruteforce(spark, sf_dir):
    import math
    from collections import defaultdict

    from pipeline_query_engine_demo_spark.plans.timeseries import (
        seasonal_baseline_outliers,
    )

    out = {r["day"]: r for r in seasonal_baseline_outliers(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cells = defaultdict(list)
    rows = []
    for r in ev:
        day = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        dowi = int(day.timestamp() // 86400) % 7
        key = (dowi, r["ts"].hour)
        cells[key].append(r["value"])
        rows.append((day, key, r["value"]))
    stats = {}
    for k, vs in cells.items():
        n = len(vs)
        s = sum(round(v * 100) for v in vs) / 100.0
        ss = sum(round(v * 100) ** 2 for v in vs) / 10000.0
        mean = s / n
        var = ss / n - mean * mean
        stats[k] = (mean, var)
    per_day = defaultdict(lambda: [0, 0])
    for day, key, v in rows:
        mean, var = stats[key]
        per_day[day][0] += 1
        if var > 0 and abs((v - mean) / math.sqrt(var)) > 3.0:
            per_day[day][1] += 1
    assert set(out) == set(per_day)
    for day, (n, k) in per_day.items():
        assert (out[day]["n_events"], out[day]["n_outliers"]) == (n, k)
        assert abs(out[day]["outlier_rate"] - k / n) < 1e-6


def test_gap_histogram_matches_bruteforce(spark, sf_dir):
    import math
    from collections import Counter, defaultdict

    from pipeline_query_engine_demo_spark.plans.timeseries import (
        inter_event_gap_histogram,
    )

    out = {(r["event_type"], r["log2_bucket"]): r["n_gaps"]
           for r in inter_event_gap_histogram(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    streams = defaultdict(list)
    for r in ev:
        streams[(r["user_id"], r["event_type"])].append((r["ts"], r["event_id"]))
    cells = Counter()
    total_gaps = 0
    for (_, et), rows in streams.items():
        rows.sort()
        for (a, _), (b, _) in zip(rows, rows[1:]):
            gap_us = round((b - a).total_seconds() * 1e6)
            if gap_us > 0:
                total_gaps += 1
                cells[(et, math.floor(math.log(gap_us / 1e6, 2)))] += 1
    assert dict(cells) == out
    assert sum(out.values()) == total_gaps


def test_k_anonymity_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.privacy import k_anonymity_audit

    out = {r["size_band"]: r for r in k_anonymity_audit(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    classes = Counter((r["c_mktsegment"], r["c_nationkey"]) for r in cust)

    def band(n):
        return "1" if n == 1 else ("2-4" if n < 5 else ("5-9" if n < 10 else "10+"))

    bands = Counter(band(n) for n in classes.values())
    rows = Counter()
    for n in classes.values():
        rows[band(n)] += n
    assert {b: r["n_classes"] for b, r in out.items()} == dict(bands)
    assert {b: r["n_rows"] for b, r in out.items()} == dict(rows)
    total = len(cust)
    for b, r in out.items():
        assert abs(r["row_frac"] - rows[b] / total) < 1e-6
        assert r["corpus_min_class"] == min(classes.values())
    assert sum(r["n_rows"] for r in out.values()) == total


def test_trimmed_mean_matches_bruteforce(spark, sf_dir):
    import math

    from pipeline_query_engine_demo_spark.plans.stats import trimmed_mean_events

    out = {r["event_type"]: r for r in trimmed_mean_events(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append((r["value"], r["event_id"]))
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        lo, hi = math.ceil(0.05 * n), math.ceil(0.95 * n)
        kept = [v for v, _ in vals[lo:hi]]
        r = out[et]
        assert r["n_kept"] == len(kept)
        assert abs(r["trimmed_mean"] - sum(kept) / len(kept)) < 1e-6


def test_l_diversity_matches_bruteforce(spark, sf_dir):
    import math
    from collections import defaultdict

    from pipeline_query_engine_demo_spark.plans.privacy import l_diversity_audit

    row = l_diversity_audit(spark, sf_dir).collect()[0]
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    classes = defaultdict(lambda: [0, set()])
    for r in cust:
        c = classes[(r["c_mktsegment"], r["c_nationkey"])]
        c[0] += 1
        c[1].add(math.floor(r["c_acctbal"] / 1000.0))
    assert row["n_classes"] == len(classes)
    assert row["k_anonymity"] == min(c[0] for c in classes.values())
    assert row["l_diversity"] == min(len(c[1]) for c in classes.values())
    below = sum(c[0] for c in classes.values() if len(c[1]) < 3)
    assert row["rows_below_l3"] == below
    assert abs(row["frac_below_l3"] - below / len(cust)) < 1e-6


def test_entity_merge_matches_bruteforce(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.relational import (
        entity_merge_precedence,
    )

    out = {r["entity_id"]: r for r in entity_merge_precedence(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    events = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    a: dict = {}
    for r in orders:
        c = a.setdefault(r["o_custkey"], [0, None])
        c[0] += 1
        c[1] = max(c[1], r["o_orderdate"]) if c[1] else r["o_orderdate"]
    b: dict = {}
    for r in events:
        c = b.setdefault(r["user_id"], [0, None])
        c[0] += 1
        c[1] = max(c[1], r["ts"]) if c[1] else r["ts"]
    assert set(out) == set(a) | set(b)
    for k, r in out.items():
        na, la = a.get(k, (0, None))
        nb, lb = b.get(k, (0, None))
        assert (r["n_orders"], r["n_events"]) == (na, nb)
        exp_presence = "both" if k in a and k in b else ("orders_only" if k in a else "events_only")
        assert r["presence"] == exp_presence
        assert r["last_seen"] == max(t for t in (la, lb) if t is not None)


def test_cusum_window_identity_matches_sequential_scan(spark, sf_dir):
    """The registered cusum query now runs on the prefix-sum /
    running-min window identity (Lindley's recursion closed form).
    This test keeps the ORIGINAL applyInPandas sequential scan alive
    as an independent distributed implementation and asserts exact
    equality on the real fixture — so the identity is proven against
    the literal recurrence, not assumed (VERDICT r5 task 1)."""
    import pandas as pd
    import pyspark.sql.functions as F

    from pipeline_query_engine_demo_spark.plans.analytics import _CUSUM_H, _CUSUM_K
    from pipeline_query_engine_demo_spark.plans.timeseries import cusum_change_detection

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    c = F.col("value").cast("double")
    finite = ~(
        F.isnan(c) | (c == F.lit(float("inf"))) | (c == F.lit(float("-inf")))
    )
    x = F.when(finite, F.floor(c * F.lit(100.0) + F.lit(0.5)))
    rows = ev.filter(finite).select(
        "user_id", "ts", "event_id", x.cast("bigint").alias("x")
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = mx = alarms = n = 0
        for xv in pdf["x"]:
            n += 1
            s = max(0, s + int(xv) - _CUSUM_K)
            mx = max(mx, s)
            if s >= _CUSUM_H:
                alarms += 1
        return pd.DataFrame(
            [(pdf["user_id"].iloc[0], n, s, mx, alarms)],
            columns=["user_id", "n_events", "final_cusum", "max_cusum", "n_alarms"],
        )

    seq = {
        r["user_id"]: r
        for r in rows.groupBy("user_id")
        .applyInPandas(
            scan,
            schema="user_id long, n_events long, final_cusum long, "
            "max_cusum long, n_alarms long",
        )
        .collect()
    }
    win = {r["user_id"]: r for r in cusum_change_detection(spark, sf_dir).collect()}
    assert set(seq) == set(win)
    for uid, a in seq.items():
        b = win[uid]
        assert (a["n_events"], a["final_cusum"], a["max_cusum"], a["n_alarms"]) == (
            b["n_events"],
            b["final_cusum"],
            b["max_cusum"],
            b["n_alarms"],
        )


def test_cusum_window_identity_adversarial_resets(spark):
    """Synthetic sequence engineered to hit every branch of the
    reflecting barrier: deep negative excursions (barrier absorbs),
    exact zero touches, multi-alarm plateaus, and a reset-then-climb
    tail — the cases where a wrong prefix-sum identity would diverge
    from the literal recurrence."""
    from pipeline_query_engine_demo_spark.plans.analytics import _CUSUM_H, _CUSUM_K

    import datetime as dt

    # cents-scale values around k; one user per regime
    seqs = {
        1: [0, -50000, 200000, 200000, -500000, 900000, 0],
        2: [150.0] * 5,                      # hovers exactly at k: s stays 0
        3: [151.0] * (_CUSUM_H // 100 + 5),  # +100/step grind past h
        4: [10000.0, -10000.0] * 6,          # sawtooth around the barrier
    }
    rows = []
    eid = 0
    t0 = dt.datetime(2024, 1, 1)
    for uid, vals in seqs.items():
        for i, v in enumerate(vals):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(seconds=i), uid, float(v)))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        from pipeline_query_engine_demo_spark.plans.timeseries import (
            cusum_change_detection,
        )

        out = {r["user_id"]: r for r in cusum_change_detection(spark, d).collect()}
    for uid, vals in seqs.items():
        s = mx = alarms = 0
        for v in vals:
            s = max(0, s + round(v * 100) - _CUSUM_K)
            mx = max(mx, s)
            if s >= _CUSUM_H:
                alarms += 1
        r = out[uid]
        assert r["n_events"] == len(vals)
        assert (r["final_cusum"], r["max_cusum"], r["n_alarms"]) == (s, mx, alarms), uid
