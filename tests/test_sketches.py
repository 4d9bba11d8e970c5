"""KMV / theta-sketch semantics the oracle hash can't see: the oracle
proves Spark and DuckDB build bit-identical sketches; these tests
prove the sketch MATH — bottom-k correctness against a literal sort,
the unsaturated-sketch exact path, and estimator accuracy inside the
KMV error envelope against ground truth the sketches never saw."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from pipeline_query_engine_demo_spark.plans import sketches

SF01 = "/root/testdata/sf0.01"
needs_sf01 = pytest.mark.skipif(
    not os.path.exists(f"{SF01}/documents.parquet"), reason="sf0.01 fixture absent"
)


def _load_docs(spark, sf_dir):
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "documents")


def test_kmv_sketch_is_bottom_k_of_literal_sort(spark, sf_dir):
    hashes = sketches._source_shingle_hashes(_load_docs(spark, sf_dir))
    got = sketches.kmv_sketch(hashes, k=10).collect()
    by_src: dict = {}
    for r in hashes.collect():
        by_src.setdefault(r["source"], []).append(r["hv"])
    for src, hvs in by_src.items():
        expect = sorted(hvs)[:10]
        mine = sorted(
            (r["rn"], r["hv"]) for r in got if r["source"] == src
        )
        assert [hv for _, hv in mine] == expect
        assert [rn for rn, _ in mine] == list(range(1, len(expect) + 1))


def test_unsaturated_sketch_estimates_exactly(spark):
    """Fewer distinct values than k: the sketch IS the set, θ = the
    whole universe, and the estimate must equal the exact count."""
    docs = spark.createDataFrame(
        [
            (1, "srcA", "alpha beta gamma delta epsilon"),
            (2, "srcA", "beta gamma delta epsilon zeta"),
            (3, "srcB", "one two three four five six"),
        ],
        "doc_id long, source string, text string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        rows = sketches.kmv_distinct_shingles_by_source(spark, d).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["kmv_estimate"] == float(r["exact_distinct"])


def test_sketch_meta_respects_non_default_k(spark):
    """A sketch built with k=10 must be read with k=10: 15 distinct
    values saturate it, so θ must be the 10th-smallest hv, not the
    whole universe (which would silently take the 'exact' path)."""
    hvs = spark.createDataFrame(
        [("srcA", (i + 1) * 1000) for i in range(15)], "source string, hv long"
    )
    sk = sketches.kmv_sketch(hvs, k=10)
    meta = sketches._sketch_meta(sk, k=10).collect()[0]
    assert meta["n_ret"] == 10
    assert meta["theta"] == 10_000  # 10th smallest, NOT the universe
    # the old hardcoded-K misread: n_ret=10 < K=128 -> theta=U ("exact")
    bad = sketches._sketch_meta(sk).collect()[0]
    assert bad["theta"] == sketches.U


@needs_sf01
def test_kmv_estimate_within_error_envelope(spark):
    """k=128 gives σ ≈ 1/sqrt(127) ≈ 8.9%; measured fixture errors are
    mean ~7-11%, max ~21%. Bounds at ~2x the measured values so the
    test detects a broken estimator, not an unlucky hash draw."""
    rows = sketches.kmv_distinct_shingles_by_source(spark, SF01).collect()
    assert len(rows) == 20
    errs = [
        abs(r["kmv_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        for r in rows
    ]
    assert sum(errs) / len(errs) <= 0.20
    assert max(errs) <= 0.40


@needs_sf01
def test_theta_intersection_tracks_exact_overlap(spark):
    """est_common vs the exact pairwise distinct-shingle intersection
    (computed with a full join the sketches never saw). Intersection
    estimates are noisier than cardinalities — assert the mean
    relative error (measured ~0.31) and that the estimates are
    unbiased enough to preserve the aggregate overlap mass."""
    docs = _load_docs(spark, SF01)
    s = docs.select(
        "source",
        F.explode(
            sketches.dedup._units(F.col("text"), sketches.dedup.DEFAULT_SHINGLE_N)
        ).alias("tok"),
    ).distinct()
    a = s.select(F.col("source").alias("source_a"), "tok")
    b = s.select(F.col("source").alias("source_b"), "tok")
    exact = {
        (r["source_a"], r["source_b"]): r["c"]
        for r in a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    est = sketches.theta_sketch_shingle_overlap(spark, SF01).collect()
    assert len(est) == 190
    rel = []
    tot_exact = tot_est = 0.0
    for r in est:
        e = exact.get((r["source_a"], r["source_b"]), 0)
        tot_exact += e
        tot_est += r["est_common"]
        if e > 0:
            rel.append(abs(r["est_common"] - e) / e)
        assert r["est_jaccard"] is None or 0.0 <= r["est_jaccard"] <= 1.0
    assert sum(rel) / len(rel) <= 0.50
    # aggregate mass within 15%: individual estimates are noisy but an
    # estimator bias would shift the total
    assert abs(tot_est - tot_exact) / tot_exact <= 0.15


def test_kmv_merge_equals_sketch_of_full_stream(spark, sf_dir):
    """Mergeability, the property the kmv_merge_global_distinct query
    rides on: bottom-k of the union of per-source bottom-k sets ==
    bottom-k of the full hash stream (any global bottom-k value is
    bottom-k within its own source). Asserted value-for-value."""
    hashes = sketches._source_shingle_hashes(_load_docs(spark, sf_dir))
    k = 16
    per_source = sketches.kmv_sketch(hashes, k=k)
    merged = sorted(
        r["hv"] for r in per_source.select("hv").distinct().orderBy("hv").limit(k).collect()
    )
    full = sorted(set(r["hv"] for r in hashes.collect()))[:k]
    assert merged == full


def _hll_python_registers(tokens_by_source):
    """Literal python replay of the HLL register build: md5 15-hex-digit
    bigint, j = hv % 64, rho = 55 - bitlength(hv // 64) (55 if zero)."""
    import hashlib

    regs = {}
    for src, toks in tokens_by_source.items():
        m = [0] * 64
        for t in set(toks):
            hv = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            j = hv % 64
            rest = hv // 64
            rho = 55 if rest == 0 else 55 - rest.bit_length()
            m[j] = max(m[j], rho)
        regs[src] = m
    return regs


@needs_sf01
def test_hll_registers_match_python_replay(spark):
    """The Spark register build (bin-length rho, groupBy max) equals a
    literal hashlib replay register-for-register on real fixture data."""
    docs = _load_docs(spark, SF01)
    hashes = sketches._source_shingle_hashes(docs)
    import pyspark.sql.functions as F2

    rest = F2.expr("hv div 64")
    rho = F2.when(rest == 0, F2.lit(55)).otherwise(55 - F2.length(F2.bin(rest)))
    got = {}
    rows = (
        hashes.select("source", F2.pmod("hv", F2.lit(64)).alias("j"), rho.alias("rho"))
        .groupBy("source", "j")
        .agg(F2.max("rho").alias("m"))
        .collect()
    )
    for r in rows:
        got.setdefault(r["source"], [0] * 64)[r["j"]] = r["m"]

    toks = {}
    for r in docs.select("source", "text").collect():
        ws = r["text"].split(" ")
        toks.setdefault(r["source"], []).extend(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )
    expect = _hll_python_registers(toks)
    assert set(got) == set(expect)
    for src in expect:
        assert got[src] == expect[src], src


@needs_sf01
def test_hll_estimate_within_error_envelope(spark):
    """Raw HLL at m=64: sigma ~ 1.04/sqrt(64) ~ 13%. Bound at ~2.5x
    measured so the test catches a broken estimator, not an unlucky
    hash draw (same convention as the KMV envelope test)."""
    rows = sketches.hll_distinct_shingles_by_source(spark, SF01).collect()
    assert len(rows) == 20
    errs = [
        abs(r["hll_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        for r in rows
    ]
    assert sum(errs) / len(errs) <= 0.25
    assert max(errs) <= 0.50
    # far above the 2.5m bias zone, every register should be hit
    assert all(r["registers_hit"] == 64 for r in rows)


@needs_sf01
def test_hll_merge_by_register_max_equals_full_sketch(spark):
    """HLL's union-ability: registers built on two disjoint halves of
    the corpus (split at the doc_id MEDIAN — key-parity splits never
    exercise the merge, r6 lesson) then merged by per-register MAX must
    equal the whole-corpus registers bit-for-bit."""
    import pyspark.sql.functions as F2

    docs = _load_docs(spark, SF01)
    med = docs.approxQuantile("doc_id", [0.5], 0.0)[0]

    def regs(d):
        hashes = sketches._source_shingle_hashes(d)
        rest = F2.expr("hv div 64")
        rho = F2.when(rest == 0, F2.lit(55)).otherwise(55 - F2.length(F2.bin(rest)))
        return (
            hashes.select(
                "source", F2.pmod("hv", F2.lit(64)).alias("j"), rho.alias("rho")
            )
            .groupBy("source", "j")
            .agg(F2.max("rho").alias("m"))
        )

    lo = regs(docs.filter(F2.col("doc_id") <= med))
    hi = regs(docs.filter(F2.col("doc_id") > med))
    merged = (
        lo.unionByName(hi).groupBy("source", "j").agg(F2.max("m").alias("m"))
    )
    full = regs(docs)
    a = {(r["source"], r["j"]): r["m"] for r in merged.collect()}
    b = {(r["source"], r["j"]): r["m"] for r in full.collect()}
    assert a == b
    # both halves actually contributed registers (split is non-trivial)
    assert lo.count() > 0 and hi.count() > 0


@needs_sf01
def test_anotb_identity_and_accuracy(spark):
    """Sketch algebra identity: for every pair, a_not_b_retained +
    common_retained (from the overlap query) must EXACTLY equal the
    count of A-retained hashes below th — the two queries partition
    the same set. Then accuracy: est_a_not_b tracks the exact
    |shingles(A) \\ shingles(B)| within the KMV envelope on average."""
    diff = {
        (r["source_a"], r["source_b"]): r
        for r in sketches.theta_sketch_anotb_difference(spark, SF01).collect()
    }
    over = {
        (r["source_a"], r["source_b"]): r["common_retained"]
        for r in sketches.theta_sketch_shingle_overlap(spark, SF01).collect()
    }
    assert set(diff) == set(over) and len(diff) == 190

    docs = _load_docs(spark, SF01)
    hashes = sketches._source_shingle_hashes(docs)
    sk_rows = sketches.kmv_sketch(hashes).collect()
    meta = {}
    by_src: dict = {}
    for r in sk_rows:
        by_src.setdefault(r["source"], set()).add(r["hv"])
    for src, hvs in by_src.items():
        meta[src] = max(hvs) if len(hvs) >= sketches.K else sketches.U

    for (a, b), r in diff.items():
        th = min(meta[a], meta[b])
        below = sum(1 for hv in by_src[a] if hv < th)
        assert r["a_not_b_retained"] + over[(a, b)] == below, (a, b)

    exact: dict = {}
    for row in hashes.collect():
        exact.setdefault(row["source"], set()).add(row["hv"])
    errs = []
    for (a, b), r in diff.items():
        true_diff = len(exact[a] - exact[b])
        if true_diff:
            errs.append(abs(r["est_a_not_b"] - true_diff) / true_diff)
    # KMV k=128 sigma ~ 9%; difference compounds two sketches' noise.
    assert sum(errs) / len(errs) <= 0.30
    assert max(errs) <= 0.90


@needs_sf01
def test_anotb_symmetry_consistency(spark):
    """A\\B and B\\A come from the same th: est_a_not_b - est_b_not_a
    must equal (|A<th| - |B<th|) * U / th (the common part cancels) —
    a cross-column consistency a per-cell hash compare can't state."""
    rows = sketches.theta_sketch_anotb_difference(spark, SF01).collect()
    hashes = sketches._source_shingle_hashes(_load_docs(spark, SF01))
    sk_rows = sketches.kmv_sketch(hashes).collect()
    by_src: dict = {}
    for r in sk_rows:
        by_src.setdefault(r["source"], set()).add(r["hv"])
    meta = {
        s: (max(h) if len(h) >= sketches.K else sketches.U)
        for s, h in by_src.items()
    }
    for r in rows:
        a, b = r["source_a"], r["source_b"]
        th = min(meta[a], meta[b])
        na = sum(1 for hv in by_src[a] if hv < th)
        nb = sum(1 for hv in by_src[b] if hv < th)
        lhs = r["a_not_b_retained"] - r["b_not_a_retained"]
        assert lhs == na - nb, (a, b)


def test_hll_rollup_trailing_window_matches_python_replay(spark, sf_dir):
    """Pure-python replay of the sketch cube: per-month registers from
    hashlib.md5, trailing-3-month register-wise max, harmonic estimate
    — value-for-value against the registered query, independent of the
    mirrored DuckDB SQL. Also proves window-merge == sketch-of-union by
    rebuilding each window's sketch from the raw month union."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey", "l_shipdate"]
    ).to_pandas()
    M, CAP = sketches._HLL_M, sketches._HLL_RHO_CAP
    regs: dict[int, list[int]] = {}
    months_parts: dict[int, set[int]] = {}
    for pk, d in zip(tbl["l_partkey"], tbl["l_shipdate"]):
        mi = d.year * 12 + d.month
        hv = int(hashlib.md5(str(int(pk)).encode()).hexdigest()[:15], 16)
        r = regs.setdefault(mi, [0] * M)
        j, rest = hv % M, hv // M
        rho = CAP if rest == 0 else CAP - rest.bit_length()
        r[j] = max(r[j], rho)
        months_parts.setdefault(mi, set()).add(int(pk))

    months = sorted(regs)
    expect = {}
    for mi in months:
        merged = [0] * M
        union_parts: set[int] = set()
        for back in range(sketches._HLL_WIN):
            if mi - back in regs:
                merged = [max(a, b) for a, b in zip(merged, regs[mi - back])]
                union_parts |= months_parts[mi - back]
        denom = sum(1 << (CAP - m) for m in merged)
        est = math.floor(sketches._HLL_ALPHA_NUM / float(denom) * 1e6 + 0.5) / 1e6
        hit = sum(1 for m in merged if m > 0)
        expect[mi] = (hit, est, len(union_parts))
        # window-merge == sketch built over the unioned raw months
        direct = [0] * M
        for pk in union_parts:
            hv = int(hashlib.md5(str(pk).encode()).hexdigest()[:15], 16)
            j, rest = hv % M, hv // M
            rho = CAP if rest == 0 else CAP - rest.bit_length()
            direct[j] = max(direct[j], rho)
        assert direct == merged, mi

    got = {
        r["month_idx"]: (r["registers_hit"], r["hll_estimate"], r["exact_distinct"])
        for r in sketches.hll_rollup_trailing_parts(spark, sf_dir).collect()
    }
    assert got == expect


def test_quantile_sketch_merge_and_accuracy(spark, sf_dir):
    """(a) Mergeability: union of per-orderstatus bottom-k sketches,
    re-cut to bottom-k, is bit-for-bit the global sketch — the combiner
    -tree property that makes this a distributed aggregate. (b) The
    sample's nearest-rank quantiles sit within the expected rank error
    of numpy's exact population quantiles. Both independent of the
    mirrored SQL oracle (hashlib + numpy replay)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    k = sketches._QSK_K
    tbl = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    ).to_pandas()
    hv = tbl["o_orderkey"].map(
        lambda x: int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15], 16)
    )
    tbl = tbl.assign(hv=hv).sort_values("hv", kind="mergesort")
    global_sk = list(tbl.head(k)[["hv", "o_totalprice"]].itertuples(index=False))
    merged = sorted(
        (
            row
            for _, g in tbl.groupby("o_orderstatus")
            for row in g.head(k)[["hv", "o_totalprice"]].itertuples(index=False)
        ),
    )[:k]
    assert merged == sorted(global_sk)

    got = {
        r["pct"]: (r["n_retained"], r["est_quantile"])
        for r in sketches.quantile_sketch_totalprice(spark, sf_dir).collect()
    }
    vals = np.sort(np.array([v for _, v in global_sk]))
    n = len(vals)
    all_vals = np.sort(tbl["o_totalprice"].to_numpy())
    for p in sketches._QSK_PCTS:
        n_got, est = got[p]
        assert n_got == n
        # exact nearest-rank replay of the sketch estimate
        assert est == vals[(p * n + 99) // 100 - 1]
        # rank error vs the population: ecdf(est) within 0.1 of p/100
        ecdf = np.searchsorted(all_vals, est, side="right") / len(all_vals)
        assert abs(ecdf - p / 100.0) < 0.1, (p, ecdf)


def test_ams_f2_matches_python_replay_and_tracks_exact(spark, sf_dir):
    """hashlib/numpy replay of the 40-bit AMS sketch — sums, groups,
    median-of-means — value-for-value against the registered query,
    plus linearity (sketch of a split stream = sum of part sketches)
    and a pinned deterministic accuracy band vs exact F2."""
    import collections
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    u = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    ).to_pandas()["user_id"]
    hv = u.map(
        lambda x: int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15], 16)
    ).to_numpy()
    J, G, NG = sketches._AMS_J, sketches._AMS_G, sketches._AMS_NG
    S = [int(np.sum(((hv >> j) & 1) * 2 - 1)) for j in range(J)]
    g = [sum(S[i] * S[i] for i in range(k * G, (k + 1) * G)) for k in range(NG)]
    est = sorted(g)[NG // 2] / float(G)
    f2 = sum(c * c for c in collections.Counter(u).values())

    row = sketches.ams_f2_skew_events(spark, sf_dir).collect()[0]
    assert row["n_rows"] == len(u)
    assert row["exact_f2"] == f2
    assert row["ams_estimate"] == est

    # linearity: per-half sign sums ADD to the full-stream sums
    half = len(hv) // 2
    for j in range(0, J, 7):
        a = int(np.sum(((hv[:half] >> j) & 1) * 2 - 1))
        b = int(np.sum(((hv[half:] >> j) & 1) * 2 - 1))
        assert a + b == S[j]

    # deterministic accuracy band (measured 0.70-1.12 across fixture SFs)
    assert 0.5 * f2 <= est <= 1.5 * f2
