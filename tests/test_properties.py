"""Property-based validation (hypothesis): the as-of join against
pandas.merge_asof on random inputs, and salted join equivalence."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_query_engine_demo_spark.operators.joins import asof_join, salted_join

_EPOCH = dt.datetime(2024, 1, 1)

# (key, minutes) pairs; right side additionally carries a value
_left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=1, max_size=12
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=1, max_size=12
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    # dedupe right on (key, ts) — the documented precondition
    right = list({(k, m): None for k, m in right})
    lpdf = pd.DataFrame(
        {
            "event_id": range(len(left)),
            "k": [k for k, _ in left],
            "ts": [_EPOCH + dt.timedelta(minutes=m) for _, m in left],
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": [k for k, _ in right],
            "ts": [_EPOCH + dt.timedelta(minutes=m) for _, m in right],
            "val": [float(k * 1000 + m) for k, m in right],
        }
    )
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    got = {
        r.event_id: r.val
        for r in asof_join(ldf, rdf, "k", "ts", "ts", ["val"]).collect()
    }
    expected_df = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    )
    for _, row in expected_df.iterrows():
        exp = None if pd.isna(row.val) else float(row.val)
        assert got[row.event_id] == exp, (row.event_id, got[row.event_id], exp)


_words = st.sampled_from("alpha beta gamma delta epsilon zeta".split())
_docs = st.lists(
    st.lists(_words, min_size=3, max_size=12).map(" ".join), min_size=2, max_size=5
)


def _py_shingle_jaccard(a: str, b: str, n: int = 3) -> float | None:
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sa, sb = sh(a), sh(b)
    inter = len(sa & sb)
    return inter / len(sa | sb) if inter else None


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_docs)
def test_jaccard_pairs_matches_python_reference(spark, texts):
    from pipeline_query_engine_demo_spark.operators import dedup

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    all_pairs = [(i, j) for i in range(len(texts)) for j in range(i + 1, len(texts))]
    pairs = spark.createDataFrame(all_pairs, "id_a long, id_b long")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, pairs, "doc_id", "text").collect()
    }
    for i, j in all_pairs:
        exp = _py_shingle_jaccard(texts[i], texts[j])
        if exp is None:  # empty intersection pairs drop out by contract
            assert (i, j) not in got
        else:
            assert abs(got[(i, j)] - exp) < 1e-12, (i, j, got.get((i, j)), exp)


_texts = st.lists(
    st.lists(st.sampled_from("a b c d".split()), min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_exact_dedup_matches_counter(spark, texts):
    from collections import Counter

    from pipeline_query_engine_demo_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = exact_dedup(docs, "doc_id", "text").collect()
    expected = Counter(texts)
    assert {r.text: r.n_copies for r in rows} == dict(expected)
    # representative is the minimum id per text
    first_idx = {}
    for i, t in enumerate(texts):
        first_idx.setdefault(t, i)
    assert {r.text: r.doc_id for r in rows} == first_idx


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=st.lists(st.sampled_from("x y z".split()), min_size=1, max_size=10))
def test_shingle_count_formula(spark, words):
    from pipeline_query_engine_demo_spark.functions.text import shingles

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = df.select(shingles("text", 3).alias("s")).collect()[0].s
    assert len(got) == max(0, len(words) - 2)
    for i, s in enumerate(got):
        assert s == " ".join(words[i : i + 3])


_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] < e[1]),
    min_size=0,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_connected_components_matches_bfs(spark, edges):
    from pipeline_query_engine_demo_spark.operators.dedup import connected_components

    nodes = list(range(8))
    # python reference: BFS from each node over the undirected graph
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for n in nodes:
        seen, todo = {n}, [n]
        while todo:
            cur = todo.pop()
            for nb in adj[cur]:
                if nb not in seen:
                    seen.add(nb)
                    todo.append(nb)
        expected[n] = min(seen)

    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    edf = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )  # self-loop placeholder when edge list is empty (no-op edge)
    got = {r.id: r.cluster_id for r in connected_components(ndf, edf, "doc_id").collect()}
    assert got == expected


def test_salted_join_rejects_outer(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError, match="outer"):
        salted_join(None, None, "k", None, how="full")


def test_salted_join_equals_plain_join(spark, sf_dir):
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("c_custkey")
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salted = salted_join(events, customer, "c_custkey", F.col("event_id"), buckets=8)
    plain = events.join(customer, "c_custkey")
    assert salted.count() == plain.count()
    assert (
        salted.select("event_id", "c_mktsegment")
        .exceptAll(plain.select("event_id", "c_mktsegment"))
        .count()
        == 0
    )


def test_salted_join_rejects_reserved_salt_column(spark):
    import pytest
    import pyspark.sql.functions as F

    df = spark.range(5).withColumn("_salt", F.lit(1))
    other = spark.range(5).withColumnRenamed("id", "id2")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(df, other, "id", F.col("id"))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_connected_components_star_matches_bfs(spark, edges):
    """Large-star/small-star contraction against the same python BFS
    reference as the propagation variant — random graphs including
    empty edge lists, multi-edges after canonicalization, and isolates."""
    from pipeline_query_engine_demo_spark.operators.dedup import (
        connected_components_star,
    )

    nodes = list(range(8))
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for n in nodes:
        seen, todo = {n}, [n]
        while todo:
            cur = todo.pop()
            for nb in adj[cur]:
                if nb not in seen:
                    seen.add(nb)
                    todo.append(nb)
        expected[n] = min(seen)

    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    edf = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    got = {
        r.id: r.cluster_id
        for r in connected_components_star(ndf, edf, "doc_id").collect()
    }
    assert got == expected


@settings(max_examples=300, deadline=None)
@given(
    xs=st.lists(st.integers(-(10**6), 10**6), min_size=1, max_size=60),
    s0=st.integers(0, 10**6),
    k=st.integers(0, 1000),
    h=st.integers(1, 10**5),
)
def test_cusum_lindley_identity_property(xs, s0, k, h):
    """The prefix-sum/running-min closed form both CUSUM rewrites ride
    on (batch window query and seeded streaming vectorization), checked
    against the literal recurrence on random integer sequences with a
    random carried state s0: s_t = S_t - min(-s0, running_min(S)),
    S = cumsum(x - k)."""
    import numpy as np

    s = s0
    exp_states = []
    for x in xs:
        s = max(0, s + x - k)
        exp_states.append(s)

    y = np.array(xs, dtype=np.int64) - k
    ps = np.cumsum(y)
    w = ps - np.minimum(np.int64(-s0), np.minimum.accumulate(ps))
    assert w.tolist() == exp_states
    # the derived outputs both implementations report
    assert int(w.max()) == max(exp_states)
    assert int((w >= h).sum()) == sum(1 for v in exp_states if v >= h)
    assert int(w[-1]) == exp_states[-1]


@settings(max_examples=200, deadline=None)
@given(
    seq=st.lists(st.sampled_from("abcde"), min_size=0, max_size=40),
)
def test_sequential_pattern_first_last_rank_identity(seq):
    """sequential_pattern_support's identity on random sequences:
    ∃ i<j with seq[i]=a, seq[j]=b  ⟺  first_index(a) < last_index(b)."""
    types = sorted(set(seq))
    first = {t: min(i for i, v in enumerate(seq) if v == t) for t in types}
    last = {t: max(i for i, v in enumerate(seq) if v == t) for t in types}
    for a in types:
        for b in types:
            literal = any(
                seq[i] == a and seq[j] == b
                for i in range(len(seq))
                for j in range(i + 1, len(seq))
            )
            assert literal == (first[a] < last[b]), (seq, a, b)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(-10, 10, allow_nan=False, width=32),
            st.floats(-10, 10, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=25,
    ),
    r=st.sampled_from([0.5, 1.0, 2.5]),
)
def test_radius_join_property_vs_bruteforce(spark, pts, r):
    """Grid radius join == brute-force distance filter on random float
    point sets (hypothesis drives boundary-adjacent coordinates the
    hand-written adversarial test can't enumerate)."""
    from pipeline_query_engine_demo_spark.operators import spatial

    left = [(i, float(la), float(lo)) for i, (la, lo) in enumerate(pts)]
    right = [(100 + i, float(lo), float(la)) for i, (la, lo) in enumerate(pts)]
    ldf = spark.createDataFrame(left, "id long, lat double, lon double")
    rdf = spark.createDataFrame(right, "id long, lat double, lon double")
    got = {
        (row["_lid"], row["_rid"])
        for row in spatial.radius_join(ldf, rdf, r).collect()
    }
    brute = {
        (lid, rid)
        for lid, llat, llon in left
        for rid, rlat, rlon in right
        if (llat - rlat) ** 2 + (llon - rlon) ** 2 <= r * r
    }
    assert got == brute


# --- Spark 4.0 DataFrame-API subquery builders vs their SQL twins ------
#
# The registered queries pin the fixture result against DuckDB; these
# pin the API itself against spark.sql on RANDOM inputs, so a future
# Spark version changing lateralJoin/scalar/exists semantics (null
# handling, tie order, decorrelation) fails here even if the fixture
# happens not to exercise the changed edge.

_groups = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-50, 50)), min_size=1, max_size=16
)


# NAME-COLLISION LANDMINE (pinned by construction here): when the
# inner and outer relations share a column name, Column.outer() binds
# to the INNER attribute — the correlation silently becomes k == k
# (always true) and the subquery decorrelates as uncorrelated. Found
# by the first draft of these tests; every registered DF-API subquery
# uses schema-distinct correlation names (n_nationkey/s_nationkey,
# c_custkey/o_custkey, p_partkey/l_partkey), and these tests give the
# outer side a distinct name (`ok`) for the same reason.


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_groups)
def test_lateral_join_df_api_matches_sql(spark, rows):
    pdf = pd.DataFrame({"k": [k for k, _ in rows], "v": [v for _, v in rows]})
    pdf["rid"] = range(len(pdf))
    df = spark.createDataFrame(pdf)
    keys = spark.createDataFrame(pd.DataFrame({"ok": sorted({k for k, _ in rows})}))
    sub = (
        df.where(F.col("k") == F.col("ok").outer())
        .orderBy(F.col("v").desc(), F.col("rid"))
        .limit(2)
        .select(F.col("v").alias("top_v"), F.col("rid").alias("top_rid"))
    )
    got = sorted(
        keys.lateralJoin(sub).select("ok", "top_v", "top_rid").collect(),
        key=lambda r: (r.ok, r.top_rid),
    )
    df.createOrReplaceTempView("prop_t")
    keys.createOrReplaceTempView("prop_keys")
    want = sorted(
        spark.sql(
            """
            SELECT p.ok, l.top_v, l.top_rid
            FROM prop_keys p, LATERAL (
                SELECT v AS top_v, rid AS top_rid FROM prop_t t
                WHERE t.k = p.ok ORDER BY v DESC, rid LIMIT 2) l
            """
        ).collect(),
        key=lambda r: (r.ok, r.top_rid),
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_groups)
def test_scalar_and_exists_df_api_match_sql(spark, rows):
    pdf = pd.DataFrame({"k": [k for k, _ in rows], "v": [v for _, v in rows]})
    pdf["rid"] = range(len(pdf))
    df = spark.createDataFrame(pdf)
    outer = spark.createDataFrame(pd.DataFrame({"ok": list(range(0, 5))}))
    # correlated scalar: per-key SUM(v) via the select(F.sum) form
    total = df.where(F.col("k") == F.col("ok").outer()).select(F.sum("v"))
    got_sc = sorted(
        outer.where(F.lit(10) < total.scalar()).select("ok").collect(),
        key=lambda r: r.ok,
    )
    # correlated EXISTS with a predicate
    pos = df.where((F.col("k") == F.col("ok").outer()) & (F.col("v") > 0))
    got_ex = sorted(
        outer.where(pos.exists()).select("ok").collect(), key=lambda r: r.ok
    )
    df.createOrReplaceTempView("prop_t2")
    outer.createOrReplaceTempView("prop_o2")
    want_sc = sorted(
        spark.sql(
            "SELECT ok FROM prop_o2 o WHERE 10 < "
            "(SELECT SUM(v) FROM prop_t2 t WHERE t.k = o.ok)"
        ).collect(),
        key=lambda r: r.ok,
    )
    want_ex = sorted(
        spark.sql(
            "SELECT ok FROM prop_o2 o WHERE EXISTS "
            "(SELECT 1 FROM prop_t2 t WHERE t.k = o.ok AND t.v > 0)"
        ).collect(),
        key=lambda r: r.ok,
    )
    assert [r.ok for r in got_sc] == [r.ok for r in want_sc]
    assert [r.ok for r in got_ex] == [r.ok for r in want_ex]


# ---------------------------------------------------------------------------
# numpy ANN tier: full top-k parity with the expression tier on random
# vectors (r12). Hash equality on the fixture is checked by the driver
# gate; THIS pins the operator pair on adversarial inputs — negative
# values, zero vectors (NULL-sim, sorts last), duplicate scores (id
# tie-break), corpora smaller than k.
# ---------------------------------------------------------------------------

_vec = st.lists(
    st.integers(-100, 100).map(lambda i: i / 10.0), min_size=4, max_size=4
)
_corpus = st.lists(_vec, min_size=1, max_size=24)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=_corpus)
def test_numpy_cosine_topk_matches_expression(spark, vecs):
    from pipeline_query_engine_demo_spark.operators.similarity import (
        cosine_topk,
        numpy_cosine_topk,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 2)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    expr_rows = {key(r): (r.vec_id, r.cosine_sim) for r in cosine_topk(df, q, "vec_id", "embedding", k=5).collect()}
    np_rows = {key(r): (r.vec_id, r.cosine_sim) for r in numpy_cosine_topk(df, q, "vec_id", "embedding", k=5, buckets=4).collect()}
    assert set(expr_rows) == set(np_rows)
    for k_ in expr_rows:
        ev, es = expr_rows[k_]
        nv, ns = np_rows[k_]
        if es is None or ns is None:
            # zero-norm rows: both tiers must agree the sim is NULL
            assert es is None and ns is None and ev == nv
        else:
            assert abs(es - ns) <= 1e-6
            # ids may differ only where rounded scores tie exactly
            if ev != nv:
                assert es == ns
