"""Product quantization (PQ) — the compression tier of the ANN stack.

The similarity family already covers exact brute force, sign/hyperplane
LSH, IVF coarse search, and int8 scalar quantization. PQ is the missing
production piece (FAISS's ``IVFPQ``): split each vector into M
subvectors, quantize every subvector to its nearest codeword from a
small per-subspace codebook, and store only the M code ids — here
64 float32 dims (256 bytes) become 8 one-byte codes, a 32x compression
that is what makes billion-vector indexes fit in RAM at 100 TB corpus
scale. Queries then score compressed vectors WITHOUT decompressing via
asymmetric distance computation (ADC): per query, the 32 subvector→
codeword distances form a lookup table and each corpus vector's
approximate distance is the sum of 8 table entries.

The reference has no vector surface at all (its executor is 4
relational operators over u32 columns, /root/reference/src/executor/
mod.rs:250-466); this module exists for the north-star LLM-pipeline
scope (/root/repo/BASELINE.json).

Spark shape:
- Codebooks are deterministic literals (production trains them with
  per-subspace k-means — ``operators.clustering.kmeans_train`` is the
  in-repo trainer; fixed codebooks keep the oracle exact).
- Encoding is a pure map-side expression tree: 4 codeword distances per
  subspace as fixed-order float arithmetic, argmin via a CASE chain
  with lowest-index tie-break. Zero shuffles, scales with the scan.
- ADC scoring joins the broadcast query set and sums reconstruction
  distances in one fixed left-to-right order, so Spark and DuckDB
  produce bit-identical doubles. Top-k uses the same two-phase
  (salt-partial, then final) ranking as operators.similarity so no
  reducer ever sees a whole query's corpus.

Cross-engine determinism: every arithmetic step is double-precision
IEEE ops in an identical evaluation order on both sides (float32
elements widen exactly; codebook literals are identical decimal text),
so results are compared unrounded-equal after round(9) cosmetics.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pipeline_query_engine_demo_spark.functions.rounding import (
    round_half_up,
    sql_round_half_up,
)
from pipeline_query_engine_demo_spark.functions.text import let
from pipeline_query_engine_demo_spark.plans.registry import query
from pipeline_query_engine_demo_spark.sources.catalog import load_table

#: PQ geometry: 64 dims = _M subspaces x _DSUB dims, _K codewords each.
_M = 8
_DSUB = 8
_K = 4

#: Number of query vectors / neighbors for the ADC search demo.
_NQ = 5
_TOPK = 10

#: Salt fan-out for the two-phase top-k (see operators.similarity).
_SALTS = 16


def _codeword(s: int, c: int, j: int) -> float:
    """Deterministic codebook entry for subspace ``s``, codeword ``c``,
    dim ``j`` — a fixed mixing formula into [-1.0, 1.0] in 0.1 steps.
    Production replaces this with per-subspace k-means centroids; the
    demo pins literals so the DuckDB oracle replays them verbatim."""
    return ((7 * s + 13 * c + 29 * j) % 21 - 10) / 10.0


def _dist_col(vec: str, s: int, c: int) -> F.Column:
    """Squared L2 distance from subvector ``s`` of ``vec`` to codeword
    ``(s, c)`` — 8 squared-diff terms summed left-to-right.

    Built as ONE ``F.expr`` string, not a py4j expression tree: the
    PQ plans contain hundreds of these terms, and constructing them
    call-by-call costs seconds of driver time per query build (one
    py4j round-trip per operator node), where the SQL parser builds
    the identical tree JVM-side in a single call. Text is shared with
    the DuckDB oracle generator modulo indexing syntax, so both
    engines still evaluate the same fixed-order arithmetic."""
    return F.expr(_dist_sql(vec, s, c, dialect="spark"))


def _ix(vec: str, n: int, dialect: str) -> str:
    """1-based element access in either dialect (Spark's [] is 0-based,
    so the Spark text uses element_at; DuckDB's [] is 1-based)."""
    return f"element_at({vec}, {n})" if dialect == "spark" else f"{vec}[{n}]"


def _dist_sql(vec: str, s: int, c: int, dialect: str = "duckdb") -> str:
    terms = []
    for j in range(_DSUB):
        e = (
            f"(CAST({_ix(vec, s * _DSUB + j + 1, dialect)} AS DOUBLE)"
            f" - ({_codeword(s, c, j)!r}))"
        )
        terms.append(f"({e} * {e})")
    return "(" + " + ".join(terms) + ")"


def _argmin4_sql(d: list[str]) -> str:
    """Index of the smallest of four distances, lowest index on ties —
    the deterministic argmin both engines agree on (the text is valid
    in both SQL dialects)."""
    return (
        f"CAST(CASE WHEN {d[0]} <= {d[1]} AND {d[0]} <= {d[2]} AND {d[0]} <= {d[3]} THEN 0 "
        f"WHEN {d[1]} <= {d[2]} AND {d[1]} <= {d[3]} THEN 1 "
        f"WHEN {d[2]} <= {d[3]} THEN 2 ELSE 3 END AS INTEGER)"
    )


def pq_encode(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """PQ-encode ``vec_col``: one ``code_{s}`` int column per subspace.
    Pure map-side expression — the encode pass scales with the scan and
    shuffles nothing. Each code column is one parsed SQL expression
    (see _dist_col's rationale); the per-subspace distances are bound
    to intermediate columns so the argmin CASE references each one
    instead of re-inlining its 8-term text."""
    out = df
    for s in range(_M):
        for c in range(_K):
            out = out.withColumn(
                f"_d{s}_{c}", F.expr(_dist_sql(vec_col, s, c, dialect="spark"))
            )
        out = out.withColumn(
            f"code_{s}", F.expr(_argmin4_sql([f"_d{s}_0", f"_d{s}_1", f"_d{s}_2", f"_d{s}_3"]))
        )
    return out.drop(*[f"_d{s}_{c}" for s in range(_M) for c in range(_K)])


def _codes_cte() -> str:
    """Shared oracle CTE: PQ codes for every embedding."""
    cols = []
    for s in range(_M):
        d = [_dist_sql("embedding", s, c) for c in range(_K)]
        cols.append(f"{_argmin4_sql(d)} AS code_{s}")
    return (
        "codes AS (SELECT vec_id, label, embedding, "
        + ", ".join(cols)
        + " FROM embeddings)"
    )


_CODE_COLS = ", ".join(f"code_{s}" for s in range(_M))


@query(
    "pq_encode_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH {_codes_cte()}
        SELECT vec_id, label, {_CODE_COLS}
        FROM codes
        ORDER BY vec_id
    """,
)
def pq_encode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding of the embedding corpus: 64 float32
    dims -> 8 one-byte codes (32x compression), the storage layout that
    lets a 100 TB vector corpus keep its index in executor memory.

    Scale shape: codebooks are broadcast literals, assignment is a
    whole-stage-codegen expression over the scan — zero shuffles, and
    the output table (id + 8 ints) is what downstream ADC search scans
    instead of raw vectors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        pq_encode(emb, "vec_id", "embedding")
        .select("vec_id", "label", *[f"code_{s}" for s in range(_M)])
        .orderBy("vec_id")
    )


def _recon_elem_sql(s: int, j: int) -> str:
    """Reconstructed element (s, j) from the row's code: a 4-way CASE
    over the codeword literals."""
    return (
        f"(CASE code_{s} WHEN 0 THEN ({_codeword(s, 0, j)!r}) "
        f"WHEN 1 THEN ({_codeword(s, 1, j)!r}) "
        f"WHEN 2 THEN ({_codeword(s, 2, j)!r}) "
        f"ELSE ({_codeword(s, 3, j)!r}) END)"
    )


def _recon_elem_col(s: int, j: int) -> F.Column:
    code = F.col(f"code_{s}")
    return (
        F.when(code == 0, F.lit(_codeword(s, 0, j)))
        .when(code == 1, F.lit(_codeword(s, 1, j)))
        .when(code == 2, F.lit(_codeword(s, 2, j)))
        .otherwise(F.lit(_codeword(s, 3, j)))
    )


def _adc_dist_col(qvec: str) -> F.Column:
    """ADC distance: sum over all 64 dims of (q[i] - reconstructed[i])^2
    in one fixed left-to-right order. Algebraically the per-subspace
    LUT sum (the production form precomputes the 32 subvector-to-
    codeword entries once per query); the flat order is pinned so the
    oracle's text-identical expression is bit-identical."""
    terms = []
    for s in range(_M):
        for j in range(_DSUB):
            d = F.element_at(F.col(qvec), s * _DSUB + j + 1).cast(
                "double"
            ) - _recon_elem_col(s, j)
            terms.append(d * d)
    return reduce(lambda a, b: a + b, terms)


def _adc_dist_sql(qvec: str) -> str:
    terms = []
    for s in range(_M):
        for j in range(_DSUB):
            e = (
                f"(CAST({qvec}[{s * _DSUB + j + 1}] AS DOUBLE) - "
                f"{_recon_elem_sql(s, j)})"
            )
            terms.append(f"({e} * {e})")
    return "(" + " + ".join(terms) + ")"


# --- true ADC: per-query lookup tables -------------------------------
# Production ADC never re-derives reconstruction distances per corpus
# row: the M x K subvector-to-codeword distances are computed ONCE per
# query (a 32-entry LUT here) and each corpus vector costs M table
# lookups + M-1 adds. The LUT lives on the broadcast query side; the
# per-row pick is element_at(lut_s, code_s) — identical arithmetic to
# the naive form grouped per subspace, mirrored exactly in the oracle.


def _lut_arrays(qvec: str) -> list[F.Column]:
    """One array<double> LUT per subspace: entry c = ||q_sub - w_sc||^2
    (fixed-order sums — _dist_col works on any vector column)."""
    return [
        F.array(*[_dist_col(qvec, s, c) for c in range(_K)]).alias(f"_lut_{s}")
        for s in range(_M)
    ]


def _lut_sql_cols(qvec: str) -> str:
    """The same LUT as scalar columns lut_{s}_{c} for the oracle CTE."""
    return ", ".join(
        f"{_dist_sql(qvec, s, c)} AS lut_{s}_{c}"
        for s in range(_M)
        for c in range(_K)
    )


def _lut_pick_col() -> F.Column:
    """Corpus-row ADC distance: 8 LUT lookups summed left-to-right."""
    terms = [
        F.element_at(F.col(f"_lut_{s}"), F.col(f"code_{s}") + 1)
        for s in range(_M)
    ]
    return reduce(lambda a, b: a + b, terms)


def _lut_pick_sql() -> str:
    terms = [
        f"(CASE code_{s} WHEN 0 THEN lut_{s}_0 WHEN 1 THEN lut_{s}_1 "
        f"WHEN 2 THEN lut_{s}_2 ELSE lut_{s}_3 END)"
        for s in range(_M)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "pq_adc_topk_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH {_codes_cte()},
        q AS (
            SELECT vec_id AS query_id, {_lut_sql_cols('embedding')}
            FROM embeddings WHERE vec_id < {_NQ}
        ),
        scored AS (
            SELECT q.query_id, codes.vec_id,
                   {sql_round_half_up(_lut_pick_sql(), 9)} AS adc_dist
            FROM codes CROSS JOIN q
        ),
        ranked AS (
            SELECT query_id, vec_id, adc_dist,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY adc_dist, vec_id
                   ) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= {_TOPK}
        ORDER BY query_id, rank
    """,
)
def pq_adc_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-k over the PQ-compressed corpus: each of
    {_NQ} query vectors scores every corpus vector from its 8 codes
    alone — the raw 64-dim corpus vectors are never touched after the
    one-time encode, which is PQ's whole point at scale (the scan reads
    ~8 bytes/vector instead of 256).

    Scale shape: the 32-entry distance LUT is computed once per query
    on the broadcast side (true ADC — never re-derived per corpus
    row); each corpus row costs 8 array lookups + 7 adds inside
    whole-stage codegen. Top-k runs the same two-phase salted ranking
    as operators.similarity (partial top-k per (query, salt), final
    re-rank of <= k*16 rows) so a small query set over a huge corpus
    never funnels into a handful of reducers. Recall vs the exact
    baseline is graded by ``ann_recall_at_k``'s pattern; ADC error
    comes from codebook granularity (K=4 here — production uses K=256
    per subspace).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    codes = pq_encode(emb, "vec_id", "embedding").select(
        "vec_id", *[f"code_{s}" for s in range(_M)]
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") < _NQ).select(
            F.col("vec_id").alias("query_id"), *_lut_arrays("embedding")
        )
    )
    scored = codes.crossJoin(q).select(
        "query_id",
        "vec_id",
        round_half_up(_lut_pick_col(), 9).alias("adc_dist"),
    )
    salt = F.pmod(F.hash(F.col("vec_id")), F.lit(_SALTS))
    pre = Window.partitionBy("query_id", "_salt").orderBy("adc_dist", "vec_id")
    partial = (
        scored.withColumn("_salt", salt)
        .withColumn("_prank", F.row_number().over(pre))
        .filter(F.col("_prank") <= _TOPK)
        .drop("_salt", "_prank")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "vec_id", "adc_dist", "rank")
        .orderBy("query_id", "rank")
    )


#: IVF-PQ probe width (matches ivf_topk_embeddings' nprobe).
_NPROBE = 2

#: Cell-assignment CASE over the 4 one-hot centroids (cosine argmax
#: against a one-hot unit vector reduces to a raw coordinate argmax —
#: same derivation as plans.llm.ivf_assign_embeddings, first-max wins).
_CELL_SQL = """
    CASE WHEN CAST(embedding[1] AS DOUBLE) >= CAST(embedding[2] AS DOUBLE)
              AND CAST(embedding[1] AS DOUBLE) >= CAST(embedding[3] AS DOUBLE)
              AND CAST(embedding[1] AS DOUBLE) >= CAST(embedding[4] AS DOUBLE) THEN 0
         WHEN CAST(embedding[2] AS DOUBLE) >= CAST(embedding[3] AS DOUBLE)
              AND CAST(embedding[2] AS DOUBLE) >= CAST(embedding[4] AS DOUBLE) THEN 1
         WHEN CAST(embedding[3] AS DOUBLE) >= CAST(embedding[4] AS DOUBLE) THEN 2
         ELSE 3 END
"""


def _cell_col() -> F.Column:
    e = [F.element_at(F.col("embedding"), i + 1).cast("double") for i in range(4)]
    return (
        F.when((e[0] >= e[1]) & (e[0] >= e[2]) & (e[0] >= e[3]), F.lit(0))
        .when((e[1] >= e[2]) & (e[1] >= e[3]), F.lit(1))
        .when(e[2] >= e[3], F.lit(2))
        .otherwise(3)
        .cast("int")
    )


@query(
    "ivfpq_topk_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH {_codes_cte()},
        cc AS (
            SELECT vec_id, {_CELL_SQL} AS cell, {_CODE_COLS}
            FROM codes
        ),
        qs AS (
            SELECT vec_id AS query_id, {_lut_sql_cols('embedding')},
                   unnest([
                       struct_pack(cell := 0, s := CAST(embedding[1] AS DOUBLE)),
                       struct_pack(cell := 1, s := CAST(embedding[2] AS DOUBLE)),
                       struct_pack(cell := 2, s := CAST(embedding[3] AS DOUBLE)),
                       struct_pack(cell := 3, s := CAST(embedding[4] AS DOUBLE))
                   ]) AS t
            FROM embeddings WHERE vec_id < {_NQ}
        ),
        qcells AS (
            SELECT query_id, {", ".join(f"lut_{s}_{c}" for s in range(_M) for c in range(_K))},
                   t.cell AS cell
            FROM qs
            QUALIFY row_number() OVER (PARTITION BY query_id
                                       ORDER BY t.s DESC, t.cell) <= {_NPROBE}
        ),
        scored AS (
            SELECT q.query_id, cc.vec_id,
                   {sql_round_half_up(_lut_pick_sql(), 9)} AS adc_dist
            FROM cc JOIN qcells q ON cc.cell = q.cell
        ),
        ranked AS (
            SELECT query_id, vec_id, adc_dist,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY adc_dist, vec_id
                   ) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= {_TOPK}
        ORDER BY query_id, rank
    """,
)
def ivfpq_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production billion-vector index shape (FAISS
    ``IVFPQ``), composed from the engine's own tiers: IVF coarse cells
    bound WHERE to look (each query probes its nprobe=2 closest of the
    4 one-hot cells — the same assignment as ivf_topk_embeddings), PQ
    codes bound WHAT is read there (8 bytes/vector instead of 256 —
    the ADC scoring of pq_adc_topk_embeddings). Cost per query drops
    from scan-everything to ~corpus * nprobe/cells * 8 bytes.

    Scale shape: the one corpus pass computes cell + codes map-side;
    the probe is a cell equi-join against the broadcast query set;
    top-k is the two-phase salted ranking. At 100 TB the codes table
    is the only thing re-read per query batch — it's 32x smaller than
    the raw vectors and prunes by cell like any partitioned join."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes = (
        pq_encode(emb, "vec_id", "embedding")
        .withColumn("_cell", _cell_col())
        .select("vec_id", "_cell", *[f"code_{s}" for s in range(_M)])
    )
    q_scored = emb.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"),
        *_lut_arrays("embedding"),
        F.posexplode(
            F.array(
                *[
                    F.element_at(F.col("embedding"), i + 1).cast("double")
                    for i in range(4)
                ]
            )
        ).alias("_cell", "_cell_score"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cell_score").desc(), F.col("_cell")
    )
    q_cells = F.broadcast(
        q_scored.withColumn("_cell_rank", F.row_number().over(wq))
        .filter(F.col("_cell_rank") <= _NPROBE)
        .select("query_id", *[f"_lut_{s}" for s in range(_M)], "_cell")
    )
    scored = codes.join(q_cells, on="_cell").select(
        "query_id",
        "vec_id",
        round_half_up(_lut_pick_col(), 9).alias("adc_dist"),
    )
    salt = F.pmod(F.hash(F.col("vec_id")), F.lit(_SALTS))
    pre = Window.partitionBy("query_id", "_salt").orderBy("adc_dist", "vec_id")
    partial = (
        scored.withColumn("_salt", salt)
        .withColumn("_prank", F.row_number().over(pre))
        .filter(F.col("_prank") <= _TOPK)
        .drop("_salt", "_prank")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "vec_id", "adc_dist", "rank")
        .orderBy("query_id", "rank")
    )


def _pq_recall_oracle() -> str:
    from pipeline_query_engine_demo_spark.plans.registry import REGISTRY as _REG

    return f"""
        WITH gt AS ({_REG["cosine_topk_embeddings"].oracle}),
             ann AS ({_REG["ivfpq_topk_embeddings"].oracle})
        SELECT gt.query_id,
               CAST(COUNT(ann.rank) AS BIGINT) AS hits,
               CAST(COUNT(*) AS BIGINT) AS k,
               CASE WHEN isfinite(COUNT(ann.rank) / CAST(COUNT(*) AS DOUBLE)) THEN floor((COUNT(ann.rank) / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END AS recall_at_k
        FROM gt
        LEFT JOIN ann
          ON ann.query_id = gt.query_id AND ann.vec_id = gt.vec_id
        GROUP BY gt.query_id
        ORDER BY gt.query_id
    """


@query(
    "pq_recall_at_k",
    category="llm-similarity",
    oracle=_pq_recall_oracle(),
)
def pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF-PQ index against brute-force cosine ground
    truth — the compression half of the evaluation story
    (ann_recall_at_k grades the LSH bucketing tier): IVF-PQ loses
    recall BOTH from probing nprobe/cells of the corpus AND from
    scoring 8-byte codes instead of raw vectors, and this is the
    harness that prices that double trade before a production rollout.
    Composes the two verified pipelines' oracles verbatim as CTEs.

    Scale: identical to ann_recall_at_k — ground truth on a sampled
    query set is the expensive branch; the overlap join is
    top-k-sized."""
    from pipeline_query_engine_demo_spark.plans.retrieval import cosine_topk_embeddings

    gt = cosine_topk_embeddings(spark, sf_dir)
    ann = ivfpq_topk_embeddings(spark, sf_dir).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    return (
        gt.join(ann, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            F.count(F.lit(1)).alias("k"),
            round_half_up(F.count("hit") / F.count(F.lit(1)), 6).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


@query(
    "binary_sign_hamming_topk",
    category="llm-similarity",
    oracle="""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        p AS (SELECT vec_id,
                     CAST(list_sum(list_transform(generate_series(0, 31),
                          i -> CASE WHEN e[i + 1] > 0 THEN 1::BIGINT << i
                               ELSE 0 END)) AS BIGINT) AS w0,
                     CAST(list_sum(list_transform(generate_series(32, 63),
                          i -> CASE WHEN e[i + 1] > 0 THEN 1::BIGINT << (i - 32)
                               ELSE 0 END)) AS BIGINT) AS w1
              FROM v),
        q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
              FROM p WHERE vec_id < 5),
        scored AS (
            SELECT q.query_id, p.vec_id,
                   CAST(bit_count(xor(p.w0, q.q0))
                        + bit_count(xor(p.w1, q.q1)) AS BIGINT) AS hamming
            FROM p CROSS JOIN q),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY hamming, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, hamming, rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def binary_sign_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-BIT (sign) quantization + Hamming top-k — the extreme end of
    the compression tier (float32 → int8 → PQ codes → 1 bit/dim, 256x):
    each 64-dim embedding packs into two 32-bit sign words (32-bit
    halves keep every BIGINT positive across Spark/DuckDB/numpy — the
    repo's Bloom recipe), and the search metric is pure integer
    Hamming distance bit_count(xor) — no float in the entire pipeline,
    so the oracle match is exact by construction. Sign-bit Hamming is
    the standard candidate-generation tier in front of exact rerank
    (the sign-LSH family rows); tests/test_quantization.py measures
    its recall@10 against the float baseline.

    Scale: the 5-query side broadcasts; the corpus streams map-side
    through pack + xor + per-query top-k and never shuffles; payload
    per corpus vector is 16 BYTES instead of 256 — the tier that keeps
    a trillion-vector sweep in cache."""
    emb = load_table(spark, sf_dir, "embeddings")
    pack = (
        "aggregate(sequence({lo}, {hi}), 0L, (acc, i) -> acc + "
        "IF(element_at(CAST(embedding AS ARRAY<DOUBLE>), i + 1) > 0D, "
        "shiftleft(1L, i - {lo}), 0L))"
    )
    p = emb.selectExpr(
        "vec_id",
        pack.format(lo=0, hi=31) + " AS w0",
        pack.format(lo=32, hi=63) + " AS w1",
    )
    q = p.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    scored = p.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (
            F.bit_count(F.col("w0").bitwiseXOR(F.col("q0")))
            + F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
        )
        .cast("bigint")
        .alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("query_id", "rank")
    )


def _matryoshka_oracle() -> str:
    from pipeline_query_engine_demo_spark.plans.registry import REGISTRY as _REG

    tcos = sql_round_half_up(
        "list_dot_product(c.tv, q.tq)"
        " / (sqrt(list_dot_product(c.tv, c.tv))"
        " * sqrt(list_dot_product(q.tq, q.tq)))",
        6,
    )
    recall = sql_round_half_up(
        "COUNT(ann.vec_id) / CAST(COUNT(*) AS DOUBLE)", 6
    )
    return f"""
        WITH gt AS ({_REG["cosine_topk_embeddings"].oracle}),
        tvv AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS tv
                FROM embeddings),
        tqq AS (SELECT vec_id AS query_id, tv AS tq
                FROM tvv WHERE vec_id < 5),
        tsc AS (SELECT q.query_id, c.vec_id, {tcos} AS tcos
                FROM tvv c CROSS JOIN tqq q),
        trk AS (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY tcos DESC, vec_id) AS rank
                FROM tsc),
        ann AS (SELECT query_id, vec_id FROM trk WHERE rank <= 10)
        SELECT gt.query_id,
               CAST(COUNT(ann.vec_id) AS BIGINT) AS hits,
               CAST(COUNT(*) AS BIGINT) AS k,
               {recall} AS recall_at_k
        FROM gt
        LEFT JOIN ann
          ON ann.query_id = gt.query_id AND ann.vec_id = gt.vec_id
        GROUP BY gt.query_id
        ORDER BY gt.query_id
    """


@query(
    "matryoshka_truncated_recall",
    category="llm-similarity",
    oracle=_matryoshka_oracle(),
)
def matryoshka_truncated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / truncated-dimension retrieval dial: recall@10 of
    cosine search on only the FIRST 16 of 64 dimensions against the
    full-dimension ground truth — the production question for
    MRL-style embeddings ("how much recall does a 4x-narrower index
    keep?"), the dimension-axis twin of the precision-axis dials
    (int8, PQ, sign bits) and the banding sweep. Both rankings use the
    repo's exact cosine recipe (left-to-right double fold, round 6,
    vec_id tie-break), so the overlap join is deterministic.

    Scale: identical shape to ann_recall_at_k — the truncated branch
    scans 16-dim slices (a quarter of the bytes); queries broadcast,
    the corpus never shuffles."""
    from pipeline_query_engine_demo_spark.functions import vectors
    from pipeline_query_engine_demo_spark.plans.retrieval import cosine_topk_embeddings

    gt = cosine_topk_embeddings(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    tv = F.slice(F.col("embedding").cast("array<double>"), 1, 16)
    c = emb.select("vec_id", tv.alias("tv"))
    q = c.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("tv").alias("tq")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        round_half_up(vectors.cosine("tv", "tq"), 6).alias("tcos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("tcos").desc(), "vec_id")
    ann = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        gt.join(ann, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            F.count(F.lit(1)).alias("k"),
            round_half_up(F.count("hit") / F.count(F.lit(1)), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


@query(
    "int8_quantized_topk",
    category="llm-similarity",
    oracle=f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        s AS (SELECT vec_id, e,
                     list_max(list_transform(e, x -> abs(x))) AS ma
              FROM v),
        qz AS (SELECT vec_id,
                      list_transform(e, x -> CASE WHEN isfinite(x * 127.0 / ma) THEN floor((x * 127.0 / ma) * 1.0 + 0.5) / 1.0 END) AS qv
               FROM s WHERE ma <> 0),
        qs AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 5),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   {sql_round_half_up(
                       "list_dot_product(c.qv, q.qq)"
                       " / (sqrt(list_dot_product(c.qv, c.qv))"
                       " * sqrt(list_dot_product(q.qq, q.qq)))", 6)}
                       AS qcos
            FROM qz c CROSS JOIN qs q),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY qcos DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, qcos, rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def int8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k search DIRECTLY on int8-quantized vectors — the serving
    companion of embedding_quantize_int8 (which pins the 4x-compressed
    storage format): cosine over the quantized codes needs no
    dequantization because the per-vector max-abs scales cancel,
    qcos = Σ qa·qb / (√Σqa² · √Σqb²). Every code is a small exact
    integer carried in doubles, so the dot products are exact and
    order-independent; the one division and two sqrts are identical
    IEEE ops on both engines. tests/test_quantization.py measures
    recall@10 against the float cosine_topk baseline.

    Scale: same shape as cosine_topk_embeddings — the 5-query side
    broadcasts, the corpus streams map-side through score + per-query
    top-k, never shuffling; the payload per corpus vector is 64 bytes
    of codes instead of 256 bytes of float32."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    ma = F.array_max(F.transform(e, F.abs))
    # ma is let-bound: captured directly in the quantize lambda it
    # would re-scan the vector per element (O(d²) per row).
    qv = let(ma, lambda m: F.transform(e, lambda x: round_half_up(x * 127.0 / m)))
    # All-zero embeddings (ma = 0) are dropped on BOTH sides — mirror
    # of the oracle's WHERE ma <> 0: a zero max-abs makes every code
    # 0/0 and the cosine denominator 0, the exact divergence class the
    # r8 advisor flagged. A nonzero ma guarantees a nonzero code norm
    # (the max-abs element quantizes to ±127), so no further guard is
    # needed downstream.
    qz = emb.filter(ma != 0).select("vec_id", qv.alias("qv"))
    qs = qz.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731 — exact int-valued doubles
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = qz.crossJoin(F.broadcast(qs)).select(
        "query_id",
        "vec_id",
        round_half_up(
            dot("qv", "qq")
            / (F.sqrt(dot("qv", "qv")) * F.sqrt(dot("qq", "qq"))),
            6,
        ).alias("qcos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("query_id", "rank")
    )
