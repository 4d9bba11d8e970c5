"""Semantic tests for the round-7 session-4 statistics queries:
Kaplan-Meier survival, two-sample KS, Kendall tau-b, Page-Hinkley,
Poisson bootstrap, and closed-form 2D PCA.

The registry gate proves DuckDB parity; these pin the math against
independent numpy/pure-python recomputation so a
parity-preserving-but-wrong formula can't slip through on both engines
at once.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from pipeline_query_engine_demo_spark.plans.stats import (
    kendall_tau_event_pairs,
    ks_two_sample_acctbal,
    pca_2d_parts_by_brand,
    poisson_bootstrap_ci_acctbal,
)
from pipeline_query_engine_demo_spark.plans.timeseries import (
    kaplan_meier_retention,
    page_hinkley_drift,
)


def _cents(v: float) -> int:
    return math.floor(v * 100.0 + 0.5)


def test_kaplan_meier_matches_direct_product(spark, sf_dir):
    out = kaplan_meier_retention(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    hmax = max(r["o_orderdate"] for r in orders)
    span: dict = {}
    for r in orders:
        k = r["o_custkey"]
        f, last = span.get(k, (r["o_orderdate"], r["o_orderdate"]))
        span[k] = (min(f, r["o_orderdate"]), max(last, r["o_orderdate"]))
    # per-segment lifetimes + churn flags
    by_seg: dict = {}
    for k, (f, last) in span.items():
        t = (last.date() - f.date()).days
        churn = (hmax.date() - last.date()).days > 90
        by_seg.setdefault(cust[k], []).append((t, churn))
    expect = {}
    for seg, lifetimes in by_seg.items():
        times = sorted({t for t, c in lifetimes if c})
        s = 1.0
        for t in times:
            d = sum(1 for tt, c in lifetimes if c and tt == t)
            at_risk = sum(1 for tt, _ in lifetimes if tt >= t)
            s *= (at_risk - d) / at_risk
            expect[(seg, t)] = (at_risk, d, s)
    got = {(r["mktsegment"], r["t_days"]): r for r in out}
    assert set(got) == set(expect)
    for key, (at_risk, d, s) in expect.items():
        r = got[key]
        assert r["at_risk"] == at_risk
        assert r["deaths"] == d
        assert r["survival"] == pytest.approx(s, abs=1e-5)
    # survival is non-increasing within each segment
    for seg in by_seg:
        curve = [r["survival"] for r in out if r["mktsegment"] == seg]
        assert all(a >= b - 1e-12 for a, b in zip(curve, curve[1:]))


def test_ks_two_sample_matches_bruteforce_ecdf(spark, sf_dir):
    out = {(r["s1"], r["s2"]): r for r in ks_two_sample_acctbal(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    by_seg: dict = {}
    for r in cust:
        by_seg.setdefault(r["c_mktsegment"], []).append(_cents(r["c_acctbal"]))
    segs = sorted(by_seg)
    pairs = [(a, b) for i, a in enumerate(segs) for b in segs[i + 1:]]
    assert set(out) == set(pairs)
    for s1, s2 in pairs:
        x, y = sorted(by_seg[s1]), sorted(by_seg[s2])
        n1, n2 = len(x), len(y)
        vals = sorted(set(x) | set(y))
        d = max(
            abs(
                sum(1 for v in x if v <= u) * n2
                - sum(1 for v in y if v <= u) * n1
            )
            for u in vals
        ) / (n1 * n2)
        r = out[(s1, s2)]
        assert (r["n1"], r["n2"]) == (n1, n2)
        assert r["ks_d"] == pytest.approx(d, abs=1e-6)
        lam = d * math.sqrt(n1 * n2 / (n1 + n2))
        assert r["ks_lambda"] == pytest.approx(lam, abs=1e-5)


def _daily_cents(events):
    daily: dict = {}
    for r in events:
        v = r["value"]
        if v is None or not math.isfinite(v):
            continue
        k = (r["event_type"], r["ts"].date())
        daily[k] = daily.get(k, 0) + _cents(v)
    return daily


def test_kendall_tau_matches_bruteforce(spark, sf_dir):
    out = {(r["t1"], r["t2"]): r for r in kendall_tau_event_pairs(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily = _daily_cents(ev)
    types = sorted({et for et, _ in daily})
    for i, t1 in enumerate(types):
        for t2 in types[i + 1:]:
            days = sorted(
                {d for et, d in daily if et == t1}
                & {d for et, d in daily if et == t2}
            )
            xs = [daily[(t1, d)] for d in days]
            ys = [daily[(t2, d)] for d in days]
            n = len(days)
            conc = disc = tx = ty = 0
            for a in range(n):
                for b in range(a + 1, n):
                    sx = (xs[b] > xs[a]) - (xs[b] < xs[a])
                    sy = (ys[b] > ys[a]) - (ys[b] < ys[a])
                    conc += sx * sy == 1
                    disc += sx * sy == -1
                    tx += sx == 0
                    ty += sy == 0
            n0 = n * (n - 1) // 2
            r = out[(t1, t2)]
            assert (r["n0"], r["conc"], r["disc"]) == (n0, conc, disc)
            tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
            assert r["tau_b"] == pytest.approx(tau, abs=1e-5)


def test_page_hinkley_matches_sequential_replay(spark, sf_dir):
    out = {r["event_type"]: r for r in page_hinkley_drift(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily = _daily_cents(ev)
    by_type: dict = {}
    for (et, day), c in daily.items():
        by_type.setdefault(et, []).append((day, c))
    for et, series in by_type.items():
        series.sort()
        g = 0.0
        gmin = 0.0
        p = 0
        max_ph = 0.0
        n_alarms = 0
        first_alarm = None
        for i, (day, c) in enumerate(series, start=1):
            p += c
            g += c / 100.0 - p / (i * 100.0) - 25.0
            gmin = min(gmin, g)
            ph = g - gmin
            max_ph = max(max_ph, ph)
            if ph > 1500.0:
                n_alarms += 1
                if first_alarm is None:
                    first_alarm = day
        r = out[et]
        assert r["n_days"] == len(series)
        assert r["max_ph"] == pytest.approx(max_ph, abs=1e-5)
        assert r["n_alarms"] == n_alarms
        got_day = r["first_alarm_day"].date() if r["first_alarm_day"] else None
        assert got_day == first_alarm


def _pois_weight(custkey: int, b: int) -> int:
    from pipeline_query_engine_demo_spark.plans.analytics import _POIS1_CDF

    h = hashlib.md5(f"{custkey}:{b}".encode()).hexdigest()[:15]
    u = int(h, 16) / 1152921504606846976.0
    for k, c in enumerate(_POIS1_CDF):
        if u < c:
            return k
    return 7


def test_poisson_bootstrap_matches_hash_replay(spark, sf_dir):
    out = {r["mktsegment"]: r for r in poisson_bootstrap_ci_acctbal(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    by_seg: dict = {}
    for r in cust:
        by_seg.setdefault(r["c_mktsegment"], []).append(
            (r["c_custkey"], _cents(r["c_acctbal"]))
        )
    for seg, rows in by_seg.items():
        means = []
        for b in range(32):
            swc = sw = 0
            for ck, cents in rows:
                w = _pois_weight(ck, b)
                swc += w * cents
                sw += w
            if sw > 0:
                means.append((swc / (sw * 100.0), b))
        means.sort()
        lo, hi = means[1][0], means[30][0]
        m = sum(c for _, c in rows) / (len(rows) * 100.0)
        r = out[seg]
        assert r["n"] == len(rows)
        assert r["mean_bal"] == pytest.approx(m, abs=1e-6)
        assert r["ci_lo"] == pytest.approx(lo, abs=1e-6)
        assert r["ci_hi"] == pytest.approx(hi, abs=1e-6)
        # the interval brackets the point estimate on real data
        assert r["ci_lo"] <= r["mean_bal"] <= r["ci_hi"]


def test_pca_2d_matches_numpy_eigh(spark, sf_dir):
    out = {r["brand"]: r for r in pca_2d_parts_by_brand(spark, sf_dir).collect()}
    part = spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    by_brand: dict = {}
    for r in part:
        by_brand.setdefault(r["p_brand"], []).append(
            (_cents(r["p_retailprice"]) / 100.0, float(r["p_size"]))
        )
    for brand, pts in by_brand.items():
        a = np.array(pts)
        c = np.cov(a, rowvar=False, bias=True)  # population covariance
        evals, evecs = np.linalg.eigh(c)
        l1, l2 = float(evals[1]), float(evals[0])
        r = out[brand]
        assert r["n"] == len(pts)
        assert r["lambda1"] == pytest.approx(l1, rel=1e-9, abs=1e-5)
        assert r["lambda2"] == pytest.approx(l2, rel=1e-9, abs=1e-5)
        assert r["evr"] == pytest.approx(l1 / (l1 + l2), abs=1e-6)
        # theta is the principal-axis direction (numpy's top eigenvector
        # angle, modulo the pi ambiguity of axis orientation)
        top = evecs[:, 1]
        t_np = math.atan2(top[1], top[0])
        diff = (r["theta"] - t_np + math.pi / 2) % math.pi - math.pi / 2
        assert abs(diff) == pytest.approx(0.0, abs=1e-5)
