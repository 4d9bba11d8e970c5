"""Semantic tests for the retrieval/classification extension queries:
BM25 top-k and k-NN majority-vote classification.

The registry gate proves DuckDB parity; these pin the math against
independent pure-Python/numpy recomputation.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from pipeline_query_engine_demo_spark.plans.llm import _BM25_B, _BM25_K1, _BM25_TERMS
from pipeline_query_engine_demo_spark.plans.retrieval import (
    bm25_topk_docs,
    knn_classify_embeddings,
)


def test_bm25_matches_pure_python(spark, sf_dir):
    out = bm25_topk_docs(spark, sf_dir).collect()
    assert 0 < len(out) <= 15
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in _BM25_TERMS
    }
    def score(toks: list) -> float:
        s = 0.0
        c = Counter(toks)
        for t in _BM25_TERMS:
            tf = c.get(t, 0)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (_BM25_K1 + 1.0)) / (
                tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * len(toks) / avgdl)
            )
        return s

    expected = sorted(
        ((score(toks), did) for did, toks in docs.items()),
        key=lambda p: (-p[0], p[1]),
    )[: len(out)]
    for row, (exp_score, exp_id) in zip(out, expected):
        assert row["doc_id"] == exp_id
        assert math.isclose(row["bm25_score"], exp_score, abs_tol=1e-5)
        toks = set(docs[exp_id])
        assert row["matched_terms"] == sum(1 for t in _BM25_TERMS if t in toks)


def test_knn_classify_matches_numpy(spark, sf_dir):
    out = {r["query_id"]: r for r in knn_classify_embeddings(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    labels = {r["vec_id"]: r["label"] for r in emb}
    mat = np.array([r["embedding"] for r in emb], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    qids = [i for i in ids if i % 97 == 0]
    assert set(out) == set(qids)
    for qid in qids:
        qi = int(np.where(ids == qid)[0][0])
        sims = mat @ mat[qi] / (norms * norms[qi])
        # replicate the engine's rounding before ranking, ties by id
        order = sorted(
            (
                (-round(s * 1e6 + 1e-9) / 1e6, int(i))
                for s, i in zip(sims, ids)
                if i != qid
            ),
        )[:5]
        votes = Counter(labels[i] for _, i in order)
        best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
        r = out[qid]
        assert r["true_label"] == labels[qid]
        assert r["predicted_label"] == best[0]
        assert r["votes"] == best[1]
        assert r["correct"] == (best[0] == labels[qid])


def _fold_cosine(a, b):
    """Replicates the engine's strict left-fold double cosine and its
    floor-half-up rounding bit-for-bit (plain Python floats are IEEE
    doubles), so this oracle cannot ulp-flake against the Spark side."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    for x in a:
        na = na + float(x) * float(x)
    for y in b:
        nb = nb + float(y) * float(y)
    raw = dot / (math.sqrt(na) * math.sqrt(nb))
    return math.floor(raw * 1000000.0 + 0.5) / 1000000.0


def test_mmr_matches_pure_python_greedy(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.retrieval import mmr_diversified_topk

    out = mmr_diversified_topk(spark, sf_dir).collect()
    emb = {r["vec_id"]: r["embedding"] for r in
           spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()}
    lam = 0.7
    expected = []
    for qid in sorted(i for i in emb if i < 3):
        rel = {
            i: _fold_cosine(v, emb[qid]) for i, v in emb.items() if i != qid
        }
        cand = sorted(rel, key=lambda i: (-rel[i], i))[:20]
        sims = {
            (i, j): _fold_cosine(emb[i], emb[j])
            for i in cand for j in cand if i != j
        }
        selected: list = []
        remaining = sorted(cand)
        for step in range(1, 6):
            if not remaining:
                break
            if not selected:
                best = max(remaining, key=lambda x: (rel[x], -x))
                raw = rel[best]
            else:
                score = lambda x: lam * rel[x] - (1.0 - lam) * max(
                    sims[(x, j)] for j in selected
                )
                best = max(remaining, key=lambda x: (score(x), -x))
                raw = score(best)
            expected.append(
                (qid, step, best, math.floor(raw * 1000000.0 + 0.5) / 1000000.0)
            )
            selected.append(best)
            remaining.remove(best)
    got = [(r["query_id"], r["mmr_rank"], r["vec_id"], r["mmr_score"]) for r in out]
    assert got == expected
    # diversity sanity: each query's picks are distinct and step-1 is the top-1
    for qid in {g[0] for g in got}:
        picks = [g[2] for g in got if g[0] == qid]
        assert len(picks) == len(set(picks)) == 5


def test_ndcg_matches_recomputation_from_topk(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.llm import (
        _NDCG_DISCOUNTS,
        _NDCG_IDCG,
        _NDCG_K,
    )
    from pipeline_query_engine_demo_spark.plans.retrieval import (
        ann_lsh_topk_embeddings,
        ann_ndcg_at_k,
        cosine_topk_embeddings,
    )

    out = {r["query_id"]: r for r in ann_ndcg_at_k(spark, sf_dir).collect()}
    gt = {
        (r["query_id"], r["vec_id"]): r["rank"]
        for r in cosine_topk_embeddings(spark, sf_dir).collect()
    }
    ann: dict = {}
    for r in ann_lsh_topk_embeddings(spark, sf_dir).collect():
        ann.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    assert set(out) == set(ann)
    for qid, hits in ann.items():
        dcg = 0.0
        for rank, vid in sorted(hits):
            gain = _NDCG_K + 1 - gt.get((qid, vid), _NDCG_K + 1)
            dcg += gain * _NDCG_DISCOUNTS[rank - 1]
        assert abs(out[qid]["dcg_at_k"] - dcg) < 1e-6
        assert abs(out[qid]["ndcg_at_k"] - dcg / _NDCG_IDCG) < 1e-6
        assert 0.0 <= out[qid]["ndcg_at_k"] <= 1.0 + 1e-9


def test_lang_confusion_consistent_with_predictions(spark, sf_dir):
    from collections import Counter

    from pipeline_query_engine_demo_spark.plans.training import (
        lang_id_confusion,
        lang_id_docs,
    )

    out = lang_id_confusion(spark, sf_dir).collect()
    pred = {r["doc_id"]: r["predicted"] for r in lang_id_docs(spark, sf_dir).collect()}
    truth = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    cells = Counter((truth[d], p) for d, p in pred.items())
    assert {(r["true_lang"], r["predicted"]): r["n"] for r in out} == dict(cells)
    # row fractions sum to 1 per true language
    rows: dict = {}
    for r in out:
        rows.setdefault(r["true_lang"], []).append(r["row_frac"])
    for fr in rows.values():
        assert abs(sum(fr) - 1.0) < 1e-4


def test_grouped_split_is_leakage_free(spark, sf_dir):
    import hashlib

    from pipeline_query_engine_demo_spark.plans.curation import grouped_split_by_user

    out = {r["split"]: r for r in grouped_split_by_user(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()

    def split_of(uid: int) -> str:
        h = hashlib.md5(f"{uid}|gsplit-v1".encode()).hexdigest()[0]
        return "train" if h < "c" else ("val" if h < "e" else "test")

    users: dict = {}
    counts: dict = {}
    for r in ev:
        s = split_of(r["user_id"])
        users.setdefault(s, set()).add(r["user_id"])
        counts[s] = counts.get(s, 0) + 1
    # a user appears in exactly one split by construction of the key
    seen = [users.get(s, set()) for s in ("train", "val", "test")]
    assert not (seen[0] & seen[1]) and not (seen[0] & seen[2]) and not (seen[1] & seen[2])
    for s, r in out.items():
        assert r["n_events"] == counts[s]
        assert r["n_users"] == len(users[s])
    assert abs(sum(r["event_frac"] for r in out.values()) - 1.0) < 1e-4


def test_simhash_banding_equals_bruteforce_full_corpus(spark, sf_dir):
    """The pigeonhole claim itself: on the FULL small-SF corpus (no
    slice), the banded candidate join followed by the Hamming filter
    finds exactly the brute-force all-pairs <=3 set."""
    from pipeline_query_engine_demo_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash(docs, "doc_id", "text", bits=16).collect()
    }
    ids = sorted(sigs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = sum(1 for x, y in zip(sigs[a], sigs[b]) if x != y)
            if ham <= 3:
                expected.add((a, b, ham))
    # replicate the banded plan without the slice
    bands: dict = {}
    for d, s in sigs.items():
        for band in range(4):
            bands.setdefault((band, s[band * 4:band * 4 + 4]), []).append(d)
    got = set()
    for members in bands.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                ham = sum(1 for x, y in zip(sigs[a], sigs[b]) if x != y)
                if ham <= 3:
                    got.add((a, b, ham))
    assert got == expected


def test_dedup_funnel_is_monotone_and_consistent(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.dedup import dedup_funnel_report

    out = dedup_funnel_report(spark, sf_dir).collect()
    assert out
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    raw = {}
    for r in docs:
        raw[r["source"]] = raw.get(r["source"], 0) + 1
    assert {r["source"]: r["n_raw"] for r in out} == raw
    for r in out:
        assert r["n_raw"] >= r["n_after_exact"] >= r["n_after_neardup"] >= r["n_final"] >= 0
        assert abs(r["retention"] - r["n_final"] / r["n_raw"]) < 1e-6
    # the exact stage corpus-wide must equal distinct texts
    total_exact = sum(r["n_after_exact"] for r in out)
    assert total_exact == len({r["text"] for r in docs})


def test_ivf_recall_curve_is_monotone_and_anchored(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.retrieval import ivf_recall_vs_probes

    out = ivf_recall_vs_probes(spark, sf_dir).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["nprobe"]] = r["recall_at_k"]
        assert r["k"] == 10 and 0 <= r["hits"] <= 10
    assert by_q
    for _, curve in by_q.items():
        assert set(curve) == {1, 2, 4}
        # more probes can only help, and probing all 4 cells is exact
        assert curve[1] <= curve[2] + 1e-9 <= curve[4] + 2e-9
        assert abs(curve[4] - 1.0) < 1e-9


def test_heaps_law_matches_bruteforce_and_is_sublinear(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.training import heaps_law_vocab_growth

    out = {r["n_docs_prefix"]: r for r in heaps_law_vocab_growth(spark, sf_dir).collect()}
    docs = sorted(
        (r["doc_id"], r["text"].split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    )
    for c, row in out.items():
        prefix = [toks for did, toks in docs if did < c]
        n_tokens = sum(len(t) for t in prefix)
        vocab = len({w for t in prefix for w in t})
        assert row["n_tokens"] == (n_tokens if prefix else None) or row["n_tokens"] == n_tokens
        assert row["vocab_size"] == (vocab if prefix else None) or row["vocab_size"] == vocab
    # vocab grows monotonically and sub-linearly vs tokens
    cps = sorted(out)
    vs = [out[c]["vocab_size"] for c in cps if out[c]["vocab_size"] is not None]
    assert vs == sorted(vs)


def test_dataset_card_matches_bruteforce(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.training import dataset_card_summary

    row = dataset_card_summary(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n_docs = len(docs)
    toks = [r["text"].split(" ") for r in docs]
    n_tokens = sum(len(t) for t in toks)
    vocab = len({w for t in toks for w in t})
    assert row["n_docs"] == n_docs
    assert row["n_tokens"] == n_tokens
    assert row["vocab_size"] == vocab
    assert row["n_langs"] == len({r["lang"] for r in docs})
    assert row["n_sources"] == len({r["source"] for r in docs})
    uniq = len({r["text"] for r in docs})
    assert abs(row["exact_dup_rate"] - (n_docs - uniq) / n_docs) < 1e-6
    assert abs(row["mean_doc_tokens"] - n_tokens / n_docs) < 1e-6
    assert abs(row["type_token_ratio"] - vocab / n_tokens) < 1e-6


def test_mmr_degenerate_zero_norm_embedding_ranks_last(spark):
    """ADVICE r4: a zero-norm embedding yields NULL cosine (Spark's
    0/0 division is NULL) for both its relevance and every pair sim.
    The greedy must mirror SQL NULL semantics — skip NULL sims like
    MAX(p.s), sort NULL scores last with the vec_id tiebreak — instead
    of letting NaN poison the comparisons: the degenerate vector is
    selected LAST, with a NULL mmr_score, and every other score is
    finite and deterministic."""
    from pipeline_query_engine_demo_spark.operators.similarity import mmr_rerank

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.5, 0.5, 0.0]),
            (9, [0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    query = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = mmr_rerank(
        corpus, query, "vec_id", "embedding",
        n_candidates=5, k=5, lam=0.7,
    ).orderBy("mmr_rank").collect()
    assert [r["mmr_rank"] for r in out] == [1, 2, 3, 4, 5]
    picks = [r["vec_id"] for r in out]
    assert picks[0] == 1          # top relevance
    assert picks[-1] == 9         # NULL rel sorts last
    assert out[-1]["mmr_score"] is None
    for r in out[:-1]:
        assert r["mmr_score"] is not None
        assert math.isfinite(r["mmr_score"])
    # rerun is bit-stable (no NaN nondeterminism)
    again = mmr_rerank(
        corpus, query, "vec_id", "embedding",
        n_candidates=5, k=5, lam=0.7,
    ).orderBy("mmr_rank").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_rrf_fusion_matches_python_reference(spark, sf_dir):
    """rrf_hybrid_retrieval vs a python replay: rebuild both rankings
    from their own outputs (BM25 from the registered query, Jaccard
    from a literal set computation over the parquet), fuse with
    1/(60+rank), and compare the fused top-10 exactly."""
    import math

    from pipeline_query_engine_demo_spark.plans.llm import _BM25_TERMS, _RRF_K
    from pipeline_query_engine_demo_spark.plans.retrieval import (
        bm25_topk_docs,
        rrf_hybrid_retrieval,
    )

    bm = bm25_topk_docs(spark, sf_dir).collect()
    bm_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["bm25_score"], r["doc_id"]))
        )
    }
    docs = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    q = set(_BM25_TERMS)
    jscore = {
        did: len(toks & q) / (len(toks) + len(q) - len(toks & q))
        for did, toks in docs.items()
    }
    j_top = sorted(jscore, key=lambda d: (-jscore[d], d))[:15]
    j_rank = {d: i + 1 for i, d in enumerate(j_top)}
    fused = {}
    for d in set(bm_rank) | set(j_rank):
        s = 0.0
        if d in bm_rank:
            s += 1.0 / (_RRF_K + bm_rank[d])
        if d in j_rank:
            s = s + 1.0 / (_RRF_K + j_rank[d])
        fused[d] = s
    expect = sorted(fused, key=lambda d: (-fused[d], d))[:10]
    got = rrf_hybrid_retrieval(spark, sf_dir).collect()
    assert [r["doc_id"] for r in got] == expect
    for r in got:
        assert r["rank_bm25"] == bm_rank.get(r["doc_id"])
        assert r["rank_jacc"] == j_rank.get(r["doc_id"])
        assert r["rrf_score"] == math.floor(fused[r["doc_id"]] * 1e9 + 0.5) / 1e9
    # fusion sanity: every fused doc present in at least one list, and
    # any doc in BOTH lists outscores a doc holding strictly worse
    # ranks in both
    assert all(
        r["rank_bm25"] is not None or r["rank_jacc"] is not None for r in got
    )


def test_zipf_fit_matches_numpy_polyfit(spark, sf_dir):
    """The decimal-accumulated OLS equals numpy's lstsq fit on the
    identical (ln rank, ln count) points to within output rounding;
    the fit is a genuine decreasing power-law head (negative slope,
    r² in [0, 1]) — the fixture's synthetic unigram draw is flatter
    than natural text (slope ≈ −0.18), which is exactly the signal
    the query exists to surface."""
    import numpy as np
    import pyspark.sql.functions as F

    from pipeline_query_engine_demo_spark.functions import text
    from pipeline_query_engine_demo_spark.plans.training import zipf_rank_frequency_fit
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    row = zipf_rank_frequency_fit(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(text.tokens("text")).alias("tok"))
    cnt = {
        r["tok"]: r["c"]
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([c for _, c in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row["n_ranks"] == len(top)
    assert abs(row["slope"] - slope) < 1e-4
    assert abs(row["intercept"] - intercept) < 1e-4
    assert abs(row["r2"] - r * r) < 1e-4
    assert row["slope"] < 0
    assert 0.0 <= row["r2"] <= 1.0


def test_pmi_matches_python_counter_replay(spark, sf_dir):
    """Literal Counter replay: same top-100 doc-frequency vocabulary,
    same document-level co-occurrence counts, same ln(N·c_ab/(c_a·c_b))
    — the top-30 selection and every PMI must match to output
    rounding. Sanity: PMI > 0 pairs co-occur more than independence
    predicts."""
    import math
    from collections import Counter
    from itertools import combinations

    import pyspark.sql.functions as F

    from pipeline_query_engine_demo_spark.plans.training import pmi_token_cooccurrence
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    got = pmi_token_cooccurrence(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    df: Counter = Counter()
    doc_sets = []
    for r in docs:
        s = set(r["text"].split(" "))
        doc_sets.append(s)
        df.update(s)
    top = dict(
        sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    )
    co: Counter = Counter()
    for s in doc_sets:
        present = sorted(t for t in s if t in top)
        co.update(combinations(present, 2))
    n = len(docs)
    scored = [
        (math.log(n * c / (top[a] * top[b])), a, b, c)
        for (a, b), c in co.items()
        if c >= 5
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = scored[:30]
    assert len(got) == len(expect) == 30
    for row, (p, a, b, c) in zip(got, expect):
        assert (row["tok_a"], row["tok_b"], row["c_ab"]) == (a, b, c)
        assert row["pmi"] == math.floor(p * 1e6 + 0.5) / 1e6
