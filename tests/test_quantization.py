"""Product-quantization invariants (plans.quantization)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.plans.quantization import (
    _DSUB,
    _K,
    _M,
    _TOPK,
    _codeword,
    pq_adc_topk_embeddings,
    pq_encode,
    pq_encode_embeddings,
)


def test_pq_codes_in_range_and_complete(spark, sf_dir):
    out = pq_encode_embeddings(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(out) == n
    for row in out[:50]:
        for s in range(_M):
            assert 0 <= row[f"code_{s}"] < _K


def test_pq_encode_picks_nearest_codeword_on_planted_vector(spark):
    # A vector equal to codeword c=2 in every subspace must encode to
    # all-2 codes (distance 0 beats every other codeword — the planted
    # vector is bit-exactly representable).
    vec = [
        float(_codeword(s, 2, j)) for s in range(_M) for j in range(_DSUB)
    ]
    df = spark.createDataFrame([(1, vec)], "id long, embedding array<float>")
    row = pq_encode(df, "id", "embedding").collect()[0]
    assert all(row[f"code_{s}"] == 2 for s in range(_M))


def test_adc_topk_shape_and_monotone_distance(spark, sf_dir):
    out = pq_adc_topk_embeddings(spark, sf_dir)
    rows = out.collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, group in by_q.items():
        assert [r.rank for r in group] == list(range(1, _TOPK + 1))
        dists = [r.adc_dist for r in group]
        assert dists == sorted(dists)
        assert all(d >= 0.0 for d in dists)


def test_adc_distance_zero_for_vector_on_codebook_grid(spark):
    # Corpus = the planted codeword vector; query = the same vector.
    # ADC reconstructs it exactly, so the approximate distance is 0.
    # array<double>, not float: float32 storage would round 0.7 etc.
    # away from the double codeword literal and leave a ~1e-14 residue.
    vec = [float(_codeword(s, 0, j)) for s in range(_M) for j in range(_DSUB)]
    df = spark.createDataFrame([(1, vec)], "id long, embedding array<double>")
    codes = pq_encode(df, "id", "embedding")
    from pipeline_query_engine_demo_spark.plans.quantization import _adc_dist_col

    scored = codes.withColumn("_qe", F.col("embedding")).select(
        _adc_dist_col("_qe").alias("d")
    )
    assert scored.collect()[0].d == 0.0


def test_int8_quantized_topk_recall_vs_float(spark, sf_dir):
    """Quantized-cosine top-10 must substantially agree with the exact
    float cosine top-10 (int8 at d=64 typically preserves ranking) —
    the quality dial the compression trades against."""
    from pipeline_query_engine_demo_spark.plans.retrieval import cosine_topk_embeddings
    from pipeline_query_engine_demo_spark.plans.quantization import (
        int8_quantized_topk,
    )

    exact = {}
    for r in cosine_topk_embeddings(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    quant = {}
    for r in int8_quantized_topk(spark, sf_dir).collect():
        quant.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(exact) == set(quant)
    recalls = [len(exact[q] & quant[q]) / len(exact[q]) for q in exact]
    assert min(recalls) >= 0.6 and sum(recalls) / len(recalls) >= 0.8, recalls
    # the query vector itself must always be its own top hit
    for q in quant:
        assert q in quant[q]


def test_binary_sign_hamming_matches_numpy(spark, sf_dir):
    """The sign-bit pack and Hamming ranking must equal an independent
    numpy replication (pack bits, xor, popcount) — and the query vector
    itself must always be its own rank-1 hit (Hamming 0)."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.quantization import (
        binary_sign_hamming_topk,
    )
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    bits = {v: (e > 0) for v, e in emb.items()}
    got = {}
    for r in binary_sign_hamming_topk(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.hamming))
    assert set(got) == {q for q in emb if q < 5}
    for q, rows in got.items():
        dists = sorted(
            (int(np.count_nonzero(bits[v] != bits[q])), v) for v in emb
        )
        exp = [(i + 1, v, h) for i, (h, v) in enumerate(dists[:10])]
        assert sorted(rows) == exp, (q, rows[:3], exp[:3])
        assert rows[0][1:] == (q, 0) or (1, q, 0) in rows  # self at Hamming 0


def test_matryoshka_truncated_recall_matches_numpy(spark, sf_dir):
    """Truncated-dimension recall must equal the overlap of two numpy
    brute-force rankings (full 64-dim vs first-16-dim cosine, rounded
    to 6 like the engine, vec_id tie-break)."""
    import numpy as np

    from pipeline_query_engine_demo_spark.plans.quantization import (
        matryoshka_truncated_recall,
    )
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def topk(dims):
        out = {}
        for q in (v for v in emb if v < 5):
            qv = emb[q][:dims]
            scored = []
            for v, e in emb.items():
                c = float(np.dot(e[:dims], qv)) / (
                    float(np.sqrt(np.dot(e[:dims], e[:dims])))
                    * float(np.sqrt(np.dot(qv, qv)))
                )
                scored.append((-np.floor(c * 1e6 + 0.5) / 1e6, v))
            out[q] = {v for _, v in sorted(scored)[:10]}
        return out

    full, trunc = topk(64), topk(16)
    got = {r.query_id: (r.hits, r.k, r.recall_at_k)
           for r in matryoshka_truncated_recall(spark, sf_dir).collect()}
    for q in full:
        hits = len(full[q] & trunc[q])
        assert got[q][0] == hits and got[q][1] == 10
        assert abs(got[q][2] - np.floor(hits / 10 * 1e6 + 0.5) / 1e6) < 1e-12
