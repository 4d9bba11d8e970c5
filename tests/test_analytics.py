"""Semantic invariants for the analytics pack (plans/analytics.py) that
the oracle hash can't express: CMS one-sided error, Bloom-prefilter
result equivalence, and the constraint audit actually firing on
planted violations."""

from __future__ import annotations

import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.plans.analytics import (
    bloom_prefilter_join,
    cms_token_counts,
    constraint_audit,
    random_projection_embeddings,
)
from pipeline_query_engine_demo_spark.sources.catalog import load_table


def test_cms_estimate_is_one_sided(spark, sf_dir):
    """Count-min estimates NEVER undercount: est >= exact for every
    probed token (the sketch's defining guarantee)."""
    rows = cms_token_counts(spark, sf_dir).collect()
    assert rows, "probe set empty"
    for r in rows:
        assert r.cms_est >= r.exact_cnt, (r.token, r.cms_est, r.exact_cnt)


def test_bloom_prefilter_matches_exact_join(spark, sf_dir):
    """The Bloom stage only discards rows that cannot join: the
    prefiltered plan's result equals the plain join + agg."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    exact = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .orderBy("l_returnflag")
        .collect()
    )
    got = bloom_prefilter_join(spark, sf_dir).select("l_returnflag", "n_items").collect()
    assert [(r.l_returnflag, r.n_items) for r in got] == [
        (r.l_returnflag, r.n_items) for r in exact
    ]


def test_bloom_prefilter_plan_has_semi_joins_before_shuffle_join(spark, sf_dir):
    plan = bloom_prefilter_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") >= 2, plan


def test_random_projection_is_linear(spark, sf_dir):
    """y = P·x is linear, so the projection of any vector equals the
    integer-matrix dot product computed independently in Python."""
    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id").limit(3).collect()
    got = {
        r.vec_id: [r[f"y{j}"] for j in range(1, 9)]
        for r in random_projection_embeddings(spark, sf_dir)
        .filter(F.col("vec_id").isin([r.vec_id for r in emb]))
        .collect()
    }
    for r in emb:
        vec = [float(v) for v in r.embedding]
        for j in range(1, 9):
            expect = sum(
                round(vec[i - 1] * ((7 * i + 11 * j) % 5 - 2), 9)
                for i in range(1, 65)
            )
            assert abs(got[r.vec_id][j - 1] - expect) < 1e-6


def test_constraint_audit_clean_on_fixtures_and_fires_on_planted(spark, sf_dir, tmp_path):
    clean = {r.check_name: r.violations for r in constraint_audit(spark, sf_dir).collect()}
    assert set(clean) == {
        "lineitem_null_orderkey",
        "lineitem_orphan_orderkey",
        "orders_dup_orderkey",
        "orders_negative_totalprice",
        "orders_orphan_custkey",
    }
    assert all(v == 0 for v in clean.values()), clean

    # Plant one violation of each class in a copied fixture dir.
    planted = str(tmp_path / "sf_planted")
    for t in ("lineitem", "orders", "customer"):
        df = load_table(spark, sf_dir, t)
        if t == "lineitem":
            extra = df.limit(2)
            df = df.unionAll(extra.withColumn("l_orderkey", F.lit(None).cast("bigint"))).unionAll(
                extra.withColumn("l_orderkey", F.lit(-12345).cast("bigint"))
            )
        if t == "orders":
            extra = df.limit(1)
            df = (
                df.unionAll(extra)  # duplicate key
                .unionAll(
                    extra.withColumn("o_orderkey", F.lit(-77).cast("bigint"))
                    .withColumn("o_totalprice", F.lit(-1.0))
                    .withColumn("o_custkey", F.lit(-99).cast("bigint"))
                )
            )
        df.write.mode("overwrite").parquet(f"{planted}/{t}.parquet")
    got = {r.check_name: r.violations for r in constraint_audit(spark, planted).collect()}
    assert got["lineitem_null_orderkey"] == 2
    assert got["lineitem_orphan_orderkey"] == 2
    assert got["orders_dup_orderkey"] >= 1
    assert got["orders_negative_totalprice"] == 1
    assert got["orders_orphan_custkey"] == 1


def test_psi_terms_nonnegative_and_fracs_sum_to_one(spark, sf_dir):
    """(a-b)*ln(a/b) >= 0 for any a,b > 0 — every PSI term is
    non-negative — and each window's bucket fractions re-sum to ~1."""
    from pipeline_query_engine_demo_spark.plans.analytics import dataset_drift_psi

    rows = dataset_drift_psi(spark, sf_dir).collect()
    assert rows, "no bins"
    for r in rows:
        assert r.psi_term >= 0.0, (r.bin, r.psi_term)
    assert abs(sum(r.ref_frac for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.cur_frac for r in rows) - 1.0) < 1e-4


def test_embedding_drift_matches_numpy_centroids(spark, sf_dir):
    """The per-dim cohort means equal an independent numpy computation
    over the same parquet (and abs_shift is their absolute delta)."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.analytics import (
        embedding_drift_centroid,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ref = np.array([r.embedding for r in emb if r.vec_id % 2 == 0], dtype=np.float64)
    cur = np.array([r.embedding for r in emb if r.vec_id % 2 == 1], dtype=np.float64)
    ref_m, cur_m = ref.mean(axis=0), cur.mean(axis=0)
    got = embedding_drift_centroid(spark, sf_dir).orderBy("dim").collect()
    assert len(got) == 64
    for r in got:
        i = r.dim - 1
        assert abs(r.ref_mean - ref_m[i]) < 1e-5, (r.dim, r.ref_mean, ref_m[i])
        assert abs(r.cur_mean - cur_m[i]) < 1e-5
        assert abs(r.abs_shift - abs(r.ref_mean - r.cur_mean)) < 2e-6


def test_key_skew_profile_resums_to_table_count(spark, sf_dir):
    """Histogram conservation: bucket row totals re-sum to the table's
    row count, and every bucket's max fits its log2 range."""
    from pipeline_query_engine_demo_spark.plans.analytics import key_skew_profile

    rows = key_skew_profile(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert r.max_key_rows < 2 ** (r.log2_bucket + 1), r


def test_chi2_terms_nonnegative_and_expected_conserves(spark, sf_dir):
    """Chi-square contributions are sums of squares (>= 0), and the
    expected counts re-sum to each window's observed total."""
    from pipeline_query_engine_demo_spark.plans.stats import chi2_categorical_drift

    rows = chi2_categorical_drift(spark, sf_dir).collect()
    assert rows, "no categories"
    for r in rows:
        assert r.chi2_term >= 0.0, r
    ref_total = sum(r.ref_cnt for r in rows)
    cur_total = sum(r.cur_cnt for r in rows)
    assert abs(sum(r.exp_ref for r in rows) - ref_total) < 1e-3
    assert abs(sum(r.exp_cur for r in rows) - cur_total) < 1e-3


def test_event_type_value_ranks_equals_bare_window(spark, sf_dir):
    """_event_type_value_ranks' bucketed two-phase rank must equal a
    plain PARTITION BY event_type row_number row-for-row (the form the
    nearest-rank/winsorized/trimmed oracles use) — the monotone-bucket
    offset argument checked directly, per (event_type, event_id)."""
    from pyspark.sql import Window
    from pipeline_query_engine_demo_spark.plans.analytics import (
        _event_type_value_ranks,
    )

    ev = load_table(spark, sf_dir, "events")
    bucketed = _event_type_value_ranks(
        ev.select("event_type", "value", "event_id")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    bare = ev.select(
        "event_type",
        "value",
        "event_id",
        F.row_number().over(w).cast("bigint").alias("rn_ref"),
        F.count("*").over(wp).cast("bigint").alias("n_ref"),
    )
    # value+event_type uniquely identify a rank position only with the
    # event_id tiebreak, so compare on (event_type, value, rn): both
    # sides sorted identically means rn sequences must coincide.
    j = bucketed.alias("a").join(
        bare.alias("b"),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.rn") == F.col("b.rn_ref")),
    )
    total = ev.count()
    assert bucketed.count() == total
    assert (
        j.filter(
            (F.col("a.value") != F.col("b.value"))
            | (F.col("a.n") != F.col("b.n_ref"))
        ).count()
        == 0
    )
    assert j.count() == total


def test_event_type_value_ranks_null_and_nan_values(spark):
    """ADVICE r5: a NULL value used to get a NULL bucket and silently
    vanish through the null-unsafe equi-join, while the plain window
    form ranks NULLs first. The helper now sentinels NULL to -(2^62)
    (ranks FIRST, Spark's NULLS FIRST default) and NaN to +2^62 (ranks
    LAST — Spark sorts NaN above every double). Verify row-for-row
    against the bare window on a fixture that ships both."""
    from pyspark.sql import Window
    from pipeline_query_engine_demo_spark.plans.analytics import (
        _event_type_value_ranks,
    )

    rows = [
        ("a", None, 1),
        ("a", 5.0, 2),
        ("a", float("nan"), 3),
        ("a", -3.0, 4),
        ("a", None, 5),
        ("a", 120.5, 6),
        ("b", float("nan"), 7),
        ("b", 0.0, 8),
        ("b", None, 9),
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, value double, event_id long"
    )
    bucketed = {
        (r["event_type"], r["rn"]): r
        for r in _event_type_value_ranks(ev).collect()
    }
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    bare = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(wp).cast("bigint").alias("n"),
    ).collect()
    assert len(bucketed) == len(rows)
    for r in bare:
        g = bucketed[(r["event_type"], r["rn"])]
        same = (g["value"] == r["value"]) or (
            g["value"] is None and r["value"] is None
        ) or (
            g["value"] is not None
            and r["value"] is not None
            and g["value"] != g["value"]
            and r["value"] != r["value"]
        )
        assert same and g["n"] == r["n"], (r, g)


def test_ordered_funnel_rejects_out_of_order_conversions(spark, tmp_path):
    """The funnel is ORDERED: a purchase before the first view, or a
    click before the first view, must not convert. Planted fixture with
    hand-known step membership."""
    import datetime as dt

    from pipeline_query_engine_demo_spark.plans.timeseries import (
        ordered_funnel_conversion,
    )

    t = lambda m: dt.datetime(2025, 1, 1, 0, m)
    rows = [
        # user 1: view -> click -> purchase, fully ordered (converts all)
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # user 2: click BEFORE first view -> no click step
        (2, "click", t(0)), (2, "view", t(1)),
        # user 3: purchase BEFORE the ordered click -> view+click only
        (3, "purchase", t(0)), (3, "view", t(1)), (3, "click", t(2)),
        # user 4: never views (no funnel entry at all)
        (4, "click", t(0)), (4, "purchase", t(1)),
        # user 5: view at same ts as click (>= counts) then purchase
        (5, "view", t(3)), (5, "click", t(3)), (5, "purchase", t(4)),
    ]
    ev = spark.createDataFrame(
        [(uid, et, ts, i, float(i)) for i, (uid, et, ts) in enumerate(rows)],
        "user_id long, event_type string, ts timestamp, event_id long, value double",
    )
    sfd = tmp_path / "sf_funnel"
    ev.coalesce(1).write.parquet(str(sfd / "events.parquet"))
    row = ordered_funnel_conversion(spark, str(sfd)).collect()[0]
    assert (row.n_view, row.n_click, row.n_purchase) == (4, 3, 2)


def test_sequential_pattern_identity_vs_bruteforce(spark, sf_dir):
    """The first/last-rank identity ("exists a-before-b iff
    first_rank(a) < last_rank(b)") replaces quadratic i<j pair
    enumeration in sequential_pattern_support. Verify it against the
    literal subsequence check on the real fixture, per (user, a, b)."""
    from pipeline_query_engine_demo_spark.plans.timeseries import (
        sequential_pattern_support,
    )

    ev = load_table(spark, sf_dir, "events").collect()
    seqs: dict = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(r["event_type"])
    types = sorted({r["event_type"] for r in ev})
    expect: dict = {}
    for _uid, seq in seqs.items():
        for a in types:
            for b in types:
                # literal subsequence check: some a strictly before some b
                found = False
                seen_a = False
                for t in seq:
                    if seen_a and t == b:
                        found = True
                        break
                    if t == a:
                        seen_a = True
                if found:
                    expect[(a, b)] = expect.get((a, b), 0) + 1
    got = {
        (r["type_a"], r["type_b"]): (r["n_users"], r["support"])
        for r in sequential_pattern_support(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    n_users = len(seqs)
    import math

    for key, n in expect.items():
        assert got[key][0] == n, key
        assert got[key][1] == math.floor(n / n_users * 1e6 + 0.5) / 1e6


def test_acf_matches_numpy_reference(spark, sf_dir):
    """The distributed ACF (decimal-accumulated, lag windows) equals a
    literal numpy autocorrelation of the same daily series to within
    the output rounding, and every |r_L| <= 1 (Cauchy-Schwarz)."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.timeseries import acf_daily_event_values

    got = {
        (r["event_type"], r["lag"]): (r["acf"], r["n_days"])
        for r in acf_daily_event_values(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    rows = events.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    ).collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r["event_type"], {}).setdefault(r["day"], 0.0)
        series[r["event_type"]][r["day"]] += r["value"]
    for et, by_day in series.items():
        x = np.array([v for _, v in sorted(by_day.items())])
        dev = x - x.mean()
        denom = float(dev @ dev)
        for L in range(1, 6):
            expect = float(dev[L:] @ dev[:-L]) / denom
            acf, n_days = got[(et, L)]
            assert n_days == len(x)
            assert abs(acf - expect) < 5e-6, (et, L, acf, expect)
            assert abs(acf) <= 1.0 + 1e-9
    assert len(got) == 5 * len(series)


def test_gini_matches_numpy_and_bounds(spark, sf_dir):
    """The two-phase-ranked Gini equals the literal sorted-array
    formula, top-decile share equals a literal slice sum, and both
    sit in their theoretical ranges (0 <= G < 1, share >= decile
    mass fraction)."""
    import math

    from pipeline_query_engine_demo_spark.plans.stats import gini_revenue_concentration

    got = {
        r["segment"]: r
        for r in gini_revenue_concentration(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rows = (
        orders.join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
            ).alias("cents")
        )
        .collect()
    )
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(int(r["cents"]))
    assert set(by_seg) == set(got)
    for seg, xs in by_seg.items():
        xs.sort()
        n, total = len(xs), sum(xs)
        num = sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1))
        expect_g = math.floor(num / (n * total) * 1e6 + 0.5) / 1e6
        k = (n + 9) // 10
        expect_s = math.floor(sum(xs[n - k:]) / total * 1e6 + 0.5) / 1e6
        row = got[seg]
        assert row["n_customers"] == n and row["total_cents"] == total
        assert row["gini"] == expect_g, seg
        assert row["top_decile_share"] == expect_s, seg
        assert 0.0 <= row["gini"] < 1.0
        assert row["top_decile_share"] >= k / n - 1e-9


def test_t_closeness_matches_python_emd(spark, sf_dir):
    """The integer-arithmetic ordered EMD equals a literal python
    fractions replay (exact rationals, no floats) for the worst class
    and the violation mass; max_t respects 0 <= t <= 1."""
    import math
    from fractions import Fraction

    from pipeline_query_engine_demo_spark.plans.privacy import t_closeness_audit

    row = t_closeness_audit(spark, sf_dir).collect()[0]
    cust = load_table(spark, sf_dir, "customer")
    rows = cust.select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint").alias("band"),
    ).collect()
    from collections import Counter

    global_h: Counter = Counter()
    by_class: dict = {}
    for r in rows:
        global_h[r["band"]] += 1
        by_class.setdefault((r["c_mktsegment"], r["c_nationkey"]), Counter())[
            r["band"]
        ] += 1
    bands = sorted(global_h)
    n, m = sum(global_h.values()), len(bands)
    emds = {}
    for cls, h in by_class.items():
        n_c = sum(h.values())
        cp = cq = Fraction(0)
        s = Fraction(0)
        for b in bands:
            cp += Fraction(h.get(b, 0), n_c)
            cq += Fraction(global_h[b], n)
            s += abs(cp - cq)
        emds[cls] = s / (m - 1)
    expect_max = max(emds.values())
    above = sum(
        sum(by_class[c].values()) for c, t in emds.items() if t > Fraction(1, 5)
    )
    assert row["n_classes"] == len(by_class)
    assert row["m_bands"] == m
    assert row["rows_above_t02"] == above
    assert row["max_t"] == math.floor(float(expect_max) * 1e6 + 0.5) / 1e6
    assert 0 <= row["max_t"] <= 1


def test_stl_decomposition_identity_and_numpy_trend(spark, sf_dir):
    """Decomposition invariants the hash can't state: (a) observed =
    trend + seasonal + remainder wherever trend exists (additive
    identity, up to output rounding), (b) trend equals numpy's
    centered 7-day convolution, (c) per-type seasonal effects are
    mean-centered, (d) exactly 6 edge days per type have NULL trend."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.timeseries import (
        stl_decompose_daily_values,
    )

    rows = stl_decompose_daily_values(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        x = np.array([r["observed"] for r in rs])
        trend = np.convolve(x, np.ones(7) / 7.0, mode="valid")
        nulls = [r for r in rs if r["trend"] is None]
        assert len(nulls) == 6, et
        mids = [r for r in rs if r["trend"] is not None]
        assert len(mids) == len(x) - 6
        for r, t in zip(mids, trend):
            assert abs(r["trend"] - t) < 5e-6, (et, r["day"])
            assert (
                abs(r["observed"] - (r["trend"] + r["seasonal"] + r["remainder"]))
                < 5e-6
            )
        seasonal_by_dow = {}
        for r in rs:
            seasonal_by_dow[r["seasonal"]] = True
        svals = sorted(seasonal_by_dow)
        assert len(svals) == 7, et
        assert abs(sum(svals)) < 5e-5, et


def test_theil_sen_matches_numpy_median_and_robustness(spark, sf_dir):
    """ts_slope equals numpy's median of all pairwise slopes of the
    same exact daily series; n_pairs = n_days*(n_days-1)/2. Robustness
    property: corrupting ONE day by 1000x moves the Theil-Sen slope
    far less than the OLS slope on the same corrupted series."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.timeseries import theil_sen_daily_trend

    got = {
        r["event_type"]: r for r in theil_sen_daily_trend(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    daily = (
        events.groupBy(
            "event_type",
            (F.unix_micros(day) / F.lit(86400000000)).cast("bigint").alias("t"),
        )
        .agg(F.sum("value").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["t"], r["x"]))
    for et, pts in series.items():
        pts.sort()
        t = np.array([p[0] for p in pts], dtype=float)
        x = np.array([p[1] for p in pts], dtype=float)
        slopes = [
            (x[j] - x[i]) / (t[j] - t[i])
            for i in range(len(t))
            for j in range(i + 1, len(t))
        ]
        row = got[et]
        assert row["n_days"] == len(t)
        assert row["n_pairs"] == len(t) * (len(t) - 1) // 2
        assert abs(row["ts_slope"] - float(np.median(slopes))) < 5e-5, et

        # robustness: corrupt one day by 1000x
        xc = x.copy()
        xc[len(xc) // 2] *= 1000
        slopes_c = np.median(
            [
                (xc[j] - xc[i]) / (t[j] - t[i])
                for i in range(len(t))
                for j in range(i + 1, len(t))
            ]
        )
        ols = np.polyfit(t, xc, 1)[0]
        clean_ols = np.polyfit(t, x, 1)[0]
        assert abs(slopes_c - np.median(slopes)) < 0.1 * abs(ols - clean_ols)


def test_dp_noisy_counts_matches_python_laplace(spark, sf_dir):
    """The deterministic Laplace draw must equal a hashlib+math
    replication (inverse CDF over the md5-uniform lattice), and the
    noisy count must be exactly n + noise."""
    import hashlib
    import math

    from pipeline_query_engine_demo_spark.plans.privacy import dp_noisy_counts
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    true = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rhu6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    got = {r.source: r for r in dp_noisy_counts(spark, sf_dir).collect()}
    assert set(got) == set(true)
    for src, r in got.items():
        u = int(hashlib.md5(f"{src}#dp".encode()).hexdigest()[:15], 16) / 2**60
        noise = math.log(2.0 * u) if u < 0.5 else -math.log(2.0 - 2.0 * u)
        assert r.n == true[src]
        assert r.noise == rhu6(noise), src
        assert r.noisy_n == rhu6(true[src] + noise), src


def test_session_window_dynamic_gap_boundary_semantics(spark):
    """Planted micro-case for the dynamic gap: a purchase's 10-min
    window bridges a 7-min silence a click's 3-min window would not,
    and an event landing EXACTLY at the running end starts a new
    session (half-open, matching the fixed-gap query)."""
    import datetime as dt

    import pyspark.sql.functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes, seconds=0):
        return t0 + dt.timedelta(minutes=minutes, seconds=seconds)

    rows = [
        # user 1: purchase at 0 (end 10), next at 7 -> SAME session
        (1, at(0), "purchase"), (1, at(7), "view"),
        # user 2: click at 0 (end 3), next at 7 -> NEW session
        (2, at(0), "click"), (2, at(7), "view"),
        # user 3: view at 0 (end 5), next EXACTLY at 5 -> MERGES
        # (Spark starts a new session only when the silence strictly
        # exceeds the gap; the oracles' strict `>` mirrors this), and a
        # third event past the extended end -> NEW session
        (3, at(0), "view"), (3, at(5), "view"), (3, at(10, 1), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("10 minutes"))
        .when(F.col("event_type") == "click", F.lit("3 minutes"))
        .otherwise(F.lit("5 minutes"))
    )
    got = {
        (r.user_id, r.n): r.cnt
        for r in df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("cnt"))
        .collect()
    }
    # (user, n_sessions) -> total events
    assert got == {(1, 1): 2, (2, 2): 2, (3, 2): 3}
