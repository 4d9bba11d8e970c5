"""LLM-training-data-pipeline query corpus: dedup (exact, MinHash+LSH,
SimHash, n-gram Jaccard), embedding similarity search (brute force,
sign-LSH ANN, IVF), multimodal column plumbing, and text analysis —
the north-star surface beyond the reference's four operators
(``/root/reference`` has none of this; scope per SURVEY.md §2.3
'LLM-data-pipeline extensions').

Everything here is oracle-checked in DuckDB — including the Pandas-UDF
paths, whose round(6) + NaN-to-NULL canonicalization makes the numpy
arithmetic SQL-reproducible (plus parity tests in tests/ vs the
expression-based twins).

Cross-engine determinism notes:
- md5/sha256 hex is identical in both engines for identical bytes;
- integer-over-integer division (Jaccard, ratios) is one IEEE double op
  on exact operands — bit-identical;
- cosine folds left-to-right in both engines (F.aggregate vs DuckDB's
  list_dot_product loop) over doubles, then rounds to 6 — identical;
- every rounded comparison column uses functions.rounding's shared
  ``floor(x*10^d + 0.5)/10^d`` form on BOTH sides — Spark's round()
  (BigDecimal HALF_UP on the shortest repr) and DuckDB's round()
  (scaled-double) disagree by one ulp on boundary doubles (observed
  at sf0.1 on PageRank ranks), and fixtures regenerate each round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pipeline_query_engine_demo_spark.functions import multimodal, text, vectors
from pipeline_query_engine_demo_spark.functions.rounding import (
    round_half_up,
    sql_round_half_up,
)
from pipeline_query_engine_demo_spark.operators import dedup, similarity
from pipeline_query_engine_demo_spark.plans.registry import query
from pipeline_query_engine_demo_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Shared oracle CTE fragments (kept in lockstep with operators/dedup.py:
# DEFAULT_NUM_HASHES=8 MinHash functions in DEFAULT_BANDS=4 bands of 2)
# --------------------------------------------------------------------------

_NUM_HASHES = dedup.DEFAULT_NUM_HASHES
_BANDS = dedup.DEFAULT_BANDS
_ROWS_PER_BAND = _NUM_HASHES // _BANDS

_TOKS_CTE = (
    "toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok "
    "FROM documents)"
)
def _shingle_units_sql(
    n: int = dedup.DEFAULT_SHINGLE_N, source: str = "documents", alias: str = "tok"
) -> str:
    """DuckDB expression for a row's distinct n-word shingles — the SQL
    twin of operators.dedup._units, parameterized on n so the oracles
    stay in lockstep with DEFAULT_SHINGLE_N."""
    words = ", ".join(f"string_split(text, ' ')[i + {j}]" for j in range(n))
    return (
        f"SELECT doc_id, unnest(list_distinct(list_transform("
        f"generate_series(1, len(string_split(text, ' ')) - {n - 1}), "
        f"i -> concat_ws(' ', {words})))) AS {alias} FROM {source}"
    )


#: MinHash/Jaccard similarity units = distinct n-word shingles
#: (operators.dedup.DEFAULT_SHINGLE_N) — bag-of-tokens saturates at
#: corpus scale; see operators/dedup.py.
_UNITS_CTE = f"units AS ({_shingle_units_sql()})"
_SIGS_CTE = "sigs AS (SELECT doc_id, " + ", ".join(
    f"min(md5(tok || '#{i}')) AS mh{i}" for i in range(_NUM_HASHES)
) + " FROM units GROUP BY doc_id)"
_BUCKETS_CTE = "buckets AS (" + " UNION ALL ".join(
    "SELECT doc_id, {b} AS band_id, md5(concat_ws('|', {cols})) AS band_hash FROM sigs".format(
        b=b,
        cols=", ".join(f"mh{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)),
    )
    for b in range(_BANDS)
) + ")"
_CAND_CTE = (
    "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
    "FROM buckets a JOIN buckets b "
    "ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)"
)
#: Estimated-Jaccard prefilter between banding and exact verification
#: (operators.dedup.DEFAULT_EST_PREFILTER): candidates whose signature
#: agreement fraction is below the cutoff never reach the explode-verify
#: join. Integer agreement count / 8.0 is exact IEEE on both engines.
_EST_PREFILTER = dedup.DEFAULT_EST_PREFILTER
_ESTF_CTE = (
    "estf AS (SELECT c.id_a, c.id_b FROM cand c "
    "JOIN sigs sa ON sa.doc_id = c.id_a JOIN sigs sb ON sb.doc_id = c.id_b "
    "WHERE ("
    + " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(_NUM_HASHES)
    )
    + f") / {float(_NUM_HASHES)!r} >= {_EST_PREFILTER!r})"
)

#: Fixture-vocabulary stopwords (the synthetic corpus is word soup over
#: ~31 engine terms; 'the' and 'a' play the stopword role).
STOPWORDS = ["the", "a"]
#: SQL IN-list built from the same constant so the oracle tracks any
#: STOPWORDS change automatically.
_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

#: Language marker tokens for the lang-ID heuristic. The real-world
#: version uses char-n-gram frequency profiles; on the synthetic corpus
#: fixed marker sets exercise the same plumbing (map build, intersect,
#: argmax) deterministically.
LANG_MARKERS = {
    "de": ["data", "value", "slow"],
    "en": ["the", "a", "fast"],
    "fr": ["table", "row", "merge"],
}

# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------


@query(
    "exact_dedup_docs",
    category="llm-dedup",
    oracle="""
        SELECT sha256(text) AS content_hash,
               MIN(doc_id) AS doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY sha256(text) ORDER BY doc_id
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (operators.dedup.exact_dedup): group
    on sha2-256 of the text so the shuffle key is 32 fixed bytes, never
    the document body. At 100 TB the exchange carries (hash, id) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.exact_dedup(docs, "doc_id", "text")
        .select("content_hash", "doc_id", "n_copies")
        .orderBy("doc_id")
    )


@query(
    "doc_fingerprints",
    category="llm-dedup",
    oracle="""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS set_fingerprint,
               md5(array_to_string(string_split(text, ' '), chr(31))) AS seq_fingerprint
        FROM documents ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier document fingerprinting (functions.text): an
    order-insensitive token-set fingerprint (bag dedup) and a
    position-sensitive rolling content hash (permutation-distinguishing).
    Pure map-side expressions — zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.doc_fingerprint("text").alias("set_fingerprint"),
        text.rolling_content_hash("text").alias("seq_fingerprint"),
    ).orderBy("doc_id")


@query(
    "minhash_signatures_docs",
    category="llm-dedup",
    oracle=f"WITH {_UNITS_CTE}, {_SIGS_CTE} SELECT * FROM sigs ORDER BY doc_id",
)
def minhash_signatures_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 hash functions over 3-word shingles): one
    explode + one groupBy with k map-side min() aggregates — the shuffle
    is one row per document regardless of document length."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, "doc_id", "text").orderBy("doc_id")


@query(
    "lsh_candidate_pairs_docs",
    category="llm-dedup",
    oracle=f"""
        WITH {_UNITS_CTE}, {_SIGS_CTE}, {_BUCKETS_CTE}, {_CAND_CTE}
        SELECT id_a, id_b FROM cand ORDER BY id_a, id_b
    """,
)
def lsh_candidate_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding candidates (4 bands x 2 rows): the self-join is keyed
    on (band_id, band_hash) so only intra-bucket pairs are generated —
    never the corpus square. The whole MinHash->banding->candidate
    pipeline is pure SQL-expressible (this oracle is that proof)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(docs, "doc_id", "text").orderBy("id_a", "id_b")


@query(
    "near_dup_pairs_docs",
    category="llm-dedup",
    oracle=f"""
        WITH {_UNITS_CTE}, {_SIGS_CTE}, {_BUCKETS_CTE}, {_CAND_CTE}, {_ESTF_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM units GROUP BY doc_id),
        inter AS (
            SELECT c.id_a, c.id_b, COUNT(*) AS n_common
            FROM estf c
            JOIN units ta ON ta.doc_id = c.id_a
            JOIN units tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
            GROUP BY c.id_a, c.id_b
        )
        SELECT i.id_a, i.id_b,
               i.n_common / (sa.n + sb.n - i.n_common) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE i.n_common / (sa.n + sb.n - i.n_common) >= 0.6
        ORDER BY id_a, id_b
    """,
)
def near_dup_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH banding -> candidate-
    restricted exact Jaccard -> threshold. The verification join touches
    candidate pairs only (see operators.dedup.jaccard_pairs) — the
    oracle reproduces the same restriction in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.near_dup_pairs(docs, "doc_id", "text", threshold=0.6).orderBy("id_a", "id_b")


#: Near-dup pair graph as SQL (id_a < id_b, jaccard >= 0.6) — shared by
#: the clustering oracles below.
_NEAR_DUP_EDGES = f"""
        {_UNITS_CTE}, {_SIGS_CTE}, {_BUCKETS_CTE}, {_CAND_CTE}, {_ESTF_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM units GROUP BY doc_id),
        inter AS (
            SELECT c.id_a, c.id_b, COUNT(*) AS n_common
            FROM estf c
            JOIN units ta ON ta.doc_id = c.id_a
            JOIN units tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
            GROUP BY c.id_a, c.id_b
        ),
        edges AS (
            SELECT i.id_a, i.id_b
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE i.n_common / (sa.n + sb.n - i.n_common) >= 0.6
        ),
        sym AS (SELECT id_a AS a, id_b AS b FROM edges
                UNION SELECT id_b, id_a FROM edges)
"""

_CLUSTERS_SQL = f"""
        WITH RECURSIVE {_NEAR_DUP_EDGES.strip()},
        reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        ),
        labels AS (
            SELECT d.doc_id,
                   LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
            GROUP BY d.doc_id
        )
"""


def _simhash_oracle(bits: int) -> str:
    odd = "('1','3','5','7','9','b','d','f')"
    votes = ", ".join(
        f"SUM(CASE WHEN substr(h, {j + 1}, 1) IN {odd} THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    sig = ", ".join(f"CASE WHEN b{j} > 0 THEN '1' ELSE '0' END" for j in range(bits))
    return f"""
        WITH {_TOKS_CTE},
        h AS (SELECT doc_id, md5(tok) AS h FROM toks),
        votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
        SELECT doc_id, concat({sig}) AS simhash FROM votes ORDER BY doc_id
    """


@query(
    "dedup_clusters_docs",
    category="llm-dedup",
    oracle=_CLUSTERS_SQL + "SELECT doc_id, cluster_id FROM labels ORDER BY doc_id",
)
def dedup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: the LSH+Jaccard pair graph collapsed into
    connected components by iterative min-label propagation
    (operators.dedup.connected_components). The oracle computes the same
    components with a recursive transitive-closure CTE — feasible for
    DuckDB at fixture scale, quadratic at corpus scale, which is exactly
    why the Spark side iterates joins instead."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_clusters(docs, "doc_id", "text", threshold=0.6).select(
        F.col("id").alias("doc_id"), "cluster_id"
    ).orderBy("doc_id")


@query(
    "dedup_clusters_starcontract",
    category="llm-dedup",
    oracle=_CLUSTERS_SQL + "SELECT doc_id, cluster_id FROM labels ORDER BY doc_id",
)
def dedup_clusters_starcontract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters_docs' exact twin, but the pair graph collapses via
    alternating large-star/small-star contraction
    (operators.dedup.connected_components_star) instead of min-label
    propagation: O(log n) rounds regardless of component DIAMETER,
    versus O(diameter) for propagation — the variant that survives an
    adversarial duplicate chain at 100 TB. Same recursive-CTE oracle as
    dedup_clusters_docs (the algorithms must agree on every label);
    tests/test_dedup.py additionally plants a 40-node chain where
    propagation at max_iter=15 provably cannot converge and
    star-contraction does."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.near_dup_pairs(docs, "doc_id", "text", threshold=0.6)
    return (
        dedup.connected_components_star(docs.select("doc_id"), pairs, "doc_id")
        .select(F.col("id").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )


@query(
    "clean_corpus_pipeline",
    category="llm-dedup",
    oracle=_CLUSTERS_SQL
    + """ ,
        kept AS (SELECT doc_id FROM labels WHERE doc_id = cluster_id)
        SELECT d.doc_id,
               len(string_split(d.text, ' ')) AS n_tokens,
               d.lang, d.source
        FROM documents d JOIN kept k ON d.doc_id = k.doc_id
        WHERE len(string_split(d.text, ' ')) >= 20
        ORDER BY d.doc_id
    """,
)
def clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data cleaning pipeline in one plan:
    near-dup clustering → keep each cluster's min-id representative →
    drop short documents. This is the composition the LLM-operator
    family exists for; every stage is the scale-shaped variant (LSH
    candidates, candidate-restricted verification, iterative
    components)."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup.dedup_clusters(docs, "doc_id", "text", threshold=0.6)
    reps = clusters.filter(F.col("id") == F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    return (
        docs.join(reps, "doc_id")
        .filter(text.token_count("text") >= 20)
        .select("doc_id", text.token_count("text").alias("n_tokens"), "lang", "source")
        .orderBy("doc_id")
    )


@query(
    "token_count_bpeish",
    category="llm-text",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpeish_tokens
        FROM documents ORDER BY doc_id
    """,
)
def token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs | digit runs | single other symbols) — the cheap
    pre-tokenizer estimate every training-data budget starts from. Both
    are map-side regexes inside codegen."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).alias(
            "bpeish_tokens"
        ),
    ).orderBy("doc_id")


@query("simhash_docs", category="llm-dedup", oracle=_simhash_oracle(16))
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: one explode + one groupBy, all bit
    votes folding into a single partial aggregate (operators.dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text", bits=16).orderBy("doc_id")


@query(
    "ngram_jaccard_pairs_docs",
    category="llm-dedup",
    oracle=f"""
        WITH sh AS (
            {_shingle_units_sql(source="documents", alias="s")} WHERE doc_id < 100
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.id_a, i.id_b,
               i.n_common / (sa.n + sb.n - i.n_common) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE i.n_common / (sa.n + sb.n - i.n_common) >= 0.2
        ORDER BY id_a, id_b
    """,
)
def ngram_jaccard_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram (word shingle) Jaccard over a bounded slice (doc_id < 100).
    The inverted-shingle self-join is quadratic in per-shingle document
    frequency, so at corpus scale this runs only post-LSH or on bounded
    inputs — which the slice makes explicit (operators.dedup docstring)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2).orderBy(
        "id_a", "id_b"
    )


@query(
    "setsim_prefix_join_docs",
    category="llm-dedup",
    oracle=f"""
        WITH sh AS (
            {_shingle_units_sql(source="documents", alias="s")} WHERE doc_id < 150
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.id_a, i.id_b,
               i.n_common / (sa.n + sb.n - i.n_common) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE i.n_common / (sa.n + sb.n - i.n_common) >= 0.3
        ORDER BY id_a, id_b
    """,
)
def setsim_prefix_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT tau=0.3 shingle-Jaccard self-join via AllPairs/PPJoin
    prefix filtering (operators.dedup.setsim_join_prefix) — the third
    near-dup route (LSH = probabilistic recall, inverted self-join =
    bounded slices only, prefix filtering = exact AND scalable). The
    brute-force all-pairs oracle proves the no-false-negative claim on
    every pair of the slice; candidate generation touched only each
    document's rarest shingles, so the df^2 stopword meltdown the
    inverted join suffers never happens. The doc_id < 150 slice exists
    for the ORACLE's O(n^2) cost, not the operator's."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return dedup.setsim_join_prefix(
        docs, "doc_id", "text", n=3, threshold=0.3
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------

_COSINE_SQL = sql_round_half_up(
    "list_dot_product(c.v, q.qv)"
    " / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv)))",
    6,
)


@query(
    "cosine_topk_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (SELECT q.query_id, c.vec_id, {_COSINE_SQL} AS cosine_sim
                   FROM c CROSS JOIN q),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def cosine_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 5 query vectors
    (operators.similarity.cosine_topk): the query side is broadcast, the
    corpus streams map-side through the score + per-query window top-k —
    the corpus never shuffles. Both engines fold the dot product
    left-to-right in double, so rounded scores match bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(emb, q, "vec_id", "embedding", k=10).orderBy(
        "query_id", "rank"
    )


_BUCKET_SQL = (
    "((embedding[1] > 0)::INT * 1 + (embedding[8] > 0)::INT * 2 + "
    "(embedding[22] > 0)::INT * 4 + (embedding[43] > 0)::INT * 8)"
)


@query(
    "ann_lsh_topk_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                          {_BUCKET_SQL} AS bucket
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_BUCKET_SQL} AS bucket
              FROM embeddings),
        scored AS (SELECT q.query_id, c.vec_id, {_COSINE_SQL} AS cosine_sim
                   FROM c JOIN q ON c.bucket = q.bucket),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def ann_lsh_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via sign-LSH bucketing (4 hyperplane bits on
    fixed dims): the bucket equi-join replaces the cross join, scanning
    ~corpus/16 per query at some recall cost (operators.similarity.
    ann_topk_lsh). Recall vs the exact query is asserted in tests/."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_topk_lsh(
        emb, q, "vec_id", "embedding", k=10, dims=(0, 7, 21, 42)
    ).orderBy("query_id", "rank")


#: Seeded random hyperplanes for the production-form sign-LSH (4 bits,
#: 64 dims, seed 42) — the same literals are embedded in the SQL oracle.
_HYPERPLANES = similarity.random_hyperplanes(dim=64, bits=4, seed=42)


def _hyperplane_bucket_sql() -> str:
    terms = []
    for i, plane in enumerate(_HYPERPLANES):
        lits = ", ".join(repr(x) for x in plane)
        terms.append(f"(list_dot_product(embedding::DOUBLE[], [{lits}]) > 0)::INT * {2**i}")
    return "(" + " + ".join(terms) + ")"


@query(
    "ann_hyperplane_topk_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                          {_hyperplane_bucket_sql()} AS bucket
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_hyperplane_bucket_sql()} AS bucket
              FROM embeddings),
        scored AS (SELECT q.query_id, c.vec_id, {_COSINE_SQL} AS cosine_sim
                   FROM c JOIN q ON c.bucket = q.bucket),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def ann_hyperplane_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded random-hyperplane LSH ANN (operators.similarity.
    ann_topk_hyperplane): the production upgrade of the coordinate-sign
    variant — buckets partition by the data's directional distribution.
    Same bucket-equi-join scan shape (~corpus/16 per query); the oracle
    embeds the identical seeded hyperplane literals."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_topk_hyperplane(
        emb, q, "vec_id", "embedding", k=10, planes=_HYPERPLANES
    ).orderBy("query_id", "rank")


#: Fixed one-hot IVF centroids (unit vectors on dims 0..3). Centroid
#: *training* is out of scope (pyspark.ml KMeans slots in); the engine
#: owns assignment + probe plumbing (operators.similarity.ivf_assign).
_IVF_DIM = 64
IVF_CENTROIDS = [[1.0 if i == d else 0.0 for i in range(_IVF_DIM)] for d in range(4)]


@query(
    "ivf_topk_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH c AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   CASE WHEN embedding[1] >= embedding[2] AND embedding[1] >= embedding[3]
                             AND embedding[1] >= embedding[4] THEN 0
                        WHEN embedding[2] >= embedding[3] AND embedding[2] >= embedding[4] THEN 1
                        WHEN embedding[3] >= embedding[4] THEN 2
                        ELSE 3 END AS cell
            FROM embeddings
        ),
        qs AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                   unnest([
                       struct_pack(cell := 0, s := embedding[1]::DOUBLE),
                       struct_pack(cell := 1, s := embedding[2]::DOUBLE),
                       struct_pack(cell := 2, s := embedding[3]::DOUBLE),
                       struct_pack(cell := 3, s := embedding[4]::DOUBLE)
                   ]) AS t
            FROM embeddings WHERE vec_id < 5
        ),
        qcells AS (
            SELECT query_id, qv, t.cell AS cell
            FROM qs
            QUALIFY row_number() OVER (PARTITION BY query_id
                                       ORDER BY t.s DESC, t.cell) <= 2
        ),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   {_COSINE_SQL} AS cosine_sim
            FROM c JOIN qcells q ON c.cell = q.cell
        ),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def ivf_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF search path (operators.similarity.ivf_topk): corpus
    pre-assigned to nearest-centroid cells, each query probes its
    nprobe=2 closest cells — the recall/cost dial of every IVF index.
    With unit one-hot centroids the cell ordering reduces to raw
    coordinate comparisons, which the oracle mirrors (ties broken
    first-cell-wins on both sides)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk(
        emb, q, "vec_id", "embedding", IVF_CENTROIDS, k=10, nprobe=2
    ).orderBy("query_id", "rank")


@query(
    "ivf_assign_embeddings",
    category="llm-similarity",
    oracle="""
        WITH s AS (SELECT vec_id,
                          embedding[1]::DOUBLE AS s0, embedding[2]::DOUBLE AS s1,
                          embedding[3]::DOUBLE AS s2, embedding[4]::DOUBLE AS s3
                   FROM embeddings)
        SELECT vec_id,
               CASE WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 THEN 0
                    WHEN s1 >= s2 AND s1 >= s3 THEN 1
                    WHEN s2 >= s3 THEN 2
                    ELSE 3 END AS cell
        FROM s ORDER BY vec_id
    """,
)
def ivf_assign_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse assignment to 4 one-hot centroids: broadcast literal
    centroids, map-side argmax — zero shuffles. With unit centroids the
    cosine argmax reduces to an argmax over raw coordinates, which is
    what the oracle computes (first-max-wins tie-break on both sides)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_assign(emb, "vec_id", "embedding", IVF_CENTROIDS).orderBy("vec_id")


@query(
    "pandas_cosine_topk_embeddings",
    category="llm-similarity",
    oracle="""
        WITH qv AS (SELECT list_transform(range(0, 64),
                        i -> CASE WHEN i % 8 = 0 THEN 1.0 ELSE 0.0 END)::DOUBLE[] AS q),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
            SELECT vec_id,
                   CASE WHEN isfinite(list_dot_product(v, q) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q)))) THEN floor((list_dot_product(v, q) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q)))) * 1000000.0 + 0.5) / 1000000.0 END AS cosine_sim
            FROM c CROSS JOIN qv)
        SELECT vec_id, cosine_sim FROM scored
        ORDER BY cosine_sim DESC NULLS LAST, vec_id LIMIT 10
    """,
)
def pandas_cosine_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Pandas-UDF brute-force top-10 against one fixed query
    vector: Arrow batches -> numpy matmul, one Python worker per core,
    no collect (operators.similarity.pandas_cosine_topk). The scale path
    for high-dim embeddings where expression trees lose to BLAS. The
    round(6) + NaN-to-NULL canonicalization inside the operator makes
    the scores SQL-reproducible (BLAS pairwise summation and DuckDB's
    sequential fold agree to well within 1e-6 at dim=64), so the oracle
    recomputes the same dot/norm/ratio in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [1.0 if i % 8 == 0 else 0.0 for i in range(_IVF_DIM)]
    return similarity.pandas_cosine_topk(emb, qv, "vec_id", "embedding", k=10)


@query(
    "embedding_vector_math",
    category="llm-similarity",
    oracle="""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        SELECT vec_id,
               sqrt(list_dot_product(e, e)) AS l2_norm,
               list_max(list_transform(e, x -> abs(x))) AS max_abs,
               e[1] / sqrt(list_dot_product(e, e)) AS unit_first
        FROM v ORDER BY vec_id
    """,
)
def embedding_vector_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-math expression surface (functions.vectors): L2 norm,
    max-abs, unit-normalized elements — all zip_with/aggregate
    higher-order folds, JVM-side, bit-identical to DuckDB's sequential
    list arithmetic."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        vectors.norm("embedding").alias("l2_norm"),
        F.array_max(F.transform(vectors.as_double("embedding"), F.abs)).alias("max_abs"),
        F.element_at(vectors.normalize("embedding"), 1).alias("unit_first"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# Multimodal columns
# --------------------------------------------------------------------------


@query(
    "multimodal_pack_meta",
    category="llm-multimodal",
    oracle="""
        SELECT doc_id,
               'text' AS kind,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS checksum
        FROM documents ORDER BY doc_id
    """,
)
def multimodal_pack_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal payload packing (functions.multimodal.pack_media):
    opaque binary payload + typed metadata struct. The metadata (kind,
    byte length, md5 checksum) lives in plain columns Parquet can index —
    at 100 TB filters and joins touch metadata, never blobs. Fixture
    payloads are the utf-8 document bytes (no codecs in this container)."""
    docs = load_table(spark, sf_dir, "documents")
    packed = docs.select(
        "doc_id",
        multimodal.pack_media(F.encode(F.col("text"), "utf-8"), F.lit("text")).alias("media"),
    )
    return packed.select(
        "doc_id",
        F.col("media.meta.kind").alias("kind"),
        F.col("media.meta.n_bytes").alias("n_bytes"),
        F.col("media.meta.checksum").alias("checksum"),
    ).orderBy("doc_id")


@query(
    "multimodal_features",
    category="llm-multimodal",
    oracle="""
        WITH b AS (
            SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i FROM documents
        ),
        nib AS (SELECT doc_id, unicode(text[i]) // 16 AS nb FROM b)
        SELECT doc_id,
               'text' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_bytes,
               CAST(SUM(CASE WHEN nb = 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS f_punct,
               CAST(SUM(CASE WHEN nb = 3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS f_digit,
               CAST(SUM(CASE WHEN nb = 4 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   + CAST(SUM(CASE WHEN nb = 5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   AS f_upper,
               CAST(SUM(CASE WHEN nb = 6 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   + CAST(SUM(CASE WHEN nb = 7 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   AS f_lower
        FROM nib
        GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/featurize plumbing over binary payloads via mapInPandas
    (functions.multimodal.fake_decode_features — the decode step is a
    documented stub; the batch contract, schema, and map-side-only
    distribution are the real thing). The 16-bin high-nibble histogram
    is projected to named scalar bins (punct/digit/upper/lower byte
    classes) because array cells crash the driver's hasher; on the
    ASCII fixture the oracle recomputes the same bins from code points.
    Bin fractions are exact-int IEEE divisions — bit-equal across
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"), F.lit("text").alias("kind")
    )
    feats = multimodal.fake_decode_features(payloads, "doc_id", "payload", "kind")
    return feats.select(
        "doc_id",
        "kind",
        "n_bytes",
        F.element_at("feat", 3).alias("f_punct"),
        F.element_at("feat", 4).alias("f_digit"),
        (F.element_at("feat", 5) + F.element_at("feat", 6)).alias("f_upper"),
        (F.element_at("feat", 7) + F.element_at("feat", 8)).alias("f_lower"),
    ).orderBy("doc_id")


@query(
    "embedding_quantize_int8",
    category="llm-similarity",
    oracle="""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        s AS (SELECT vec_id, e,
                     list_max(list_transform(e, x -> abs(x))) AS max_abs
              FROM v)
        SELECT vec_id,
               max_abs,
               CAST(CASE WHEN isfinite(e[1] * 127.0 / max_abs) THEN floor((e[1] * 127.0 / max_abs) * 1.0 + 0.5) / 1.0 END AS INT) AS q1,
               CAST(CASE WHEN isfinite(e[2] * 127.0 / max_abs) THEN floor((e[2] * 127.0 / max_abs) * 1.0 + 0.5) / 1.0 END AS INT) AS q2,
               CAST(CASE WHEN isfinite(e[64] * 127.0 / max_abs) THEN floor((e[64] * 127.0 / max_abs) * 1.0 + 0.5) / 1.0 END AS INT) AS q64
        FROM s ORDER BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (per-vector max-abs scaling) — the
    4x storage cut that makes a 100 TB embedding corpus hold-able; the
    dequantize error is bounded by max_abs/254 per element. Rounding is
    the shared floor-form half-up (functions.rounding), which on a
    NEGATIVE exact half-boundary gives half-toward-+inf (-2.5 -> -2)
    where classic int8 quantizers round half away from zero (-2.5 ->
    -3); both engines agree with each other, the divergence from the
    away-from-zero convention is confined to exact .5 scaled values
    IEEE doubles essentially never produce, and max error stays
    max_abs/254. A zero vector (max_abs = 0) quantizes to NULL codes on
    both sides rather than 0/0 artifacts."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = vectors.as_double("embedding")
    max_abs = F.array_max(F.transform(e, F.abs))
    q = F.transform(e, lambda x: round_half_up(x * 127.0 / max_abs).cast("int"))
    return emb.select(
        "vec_id",
        max_abs.alias("max_abs"),
        F.element_at(q, 1).alias("q1"),
        F.element_at(q, 2).alias("q2"),
        F.element_at(q, 64).alias("q64"),
    ).orderBy("vec_id")


@query(
    "multimodal_frame_sample",
    category="llm-multimodal",
    oracle="""
        SELECT doc_id, t.idx AS frame_idx,
               length(t.frame)::INT AS frame_len,
               md5(t.frame) AS checksum
        FROM (SELECT doc_id,
                     unnest(list_transform(
                         generate_series(0, (octet_length(encode(text)) - 1) // 128),
                         i -> struct_pack(idx := i, frame := substr(text, i * 128 + 1, 64))))
                         AS t
              FROM documents)
        ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (functions.multimodal.frame_sample): a 64-byte
    window every 128 bytes of each payload, one output row per frame —
    the video keyframe access pattern with the decode swapped for a
    byte slice. Payloads are the ASCII document bytes, so the oracle
    reproduces the slices with substr + md5 exactly."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return multimodal.frame_sample(payloads, "doc_id", "payload").orderBy(
        "doc_id", "frame_idx"
    )


@query(
    "multimodal_decode_stats",
    category="llm-multimodal",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   CAST(4 + doc_id % 5 AS INT) AS width,
                   CAST(3 + doc_id % 4 AS INT) AS height,
                   CASE CAST(doc_id % 3 AS INT)
                        WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                        ELSE 'pgm' END AS format,
                   CAST(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 3 END AS INT)
                       AS channels
            FROM documents
        ),
        px AS (
            SELECT *, CAST(width * height * channels AS BIGINT)
                       AS n_pixel_bytes
            FROM d
        ),
        v0 AS (
            SELECT doc_id, format, width, height, channels, n_pixel_bytes,
                   unnest(range(n_pixel_bytes)) AS i
            FROM px
        ),
        v AS (
            SELECT *, (doc_id * 7 + i * 13) % 256 AS v FROM v0
        )
        SELECT doc_id, format, width, height, channels, n_pixel_bytes,
               CAST(SUM(v) AS BIGINT) AS pixel_sum,
               CAST(SUM((i + 1) * v) % 2147483647 AS BIGINT) AS weighted_sum,
               {mean} AS mean_pixel
        FROM v
        GROUP BY doc_id, format, width, height, channels, n_pixel_bytes
        ORDER BY doc_id
    """.format(
        mean=sql_round_half_up(
            "CAST(SUM(v) AS DOUBLE) / CAST(n_pixel_bytes AS DOUBLE)", 6
        )
    ),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (functions.multimodal.decode_media
    — no stub left): per document a deterministic synthetic raster is
    ENCODED to genuine on-disk bytes (BMP with 4-byte row padding and
    alternating bottom-up/top-down row order for doc_id%3==0, binary
    P6 PPM for %3==1, P5 PGM for %3==2; pixel i carries
    (doc_id*7 + i*13) mod 256), then decoded back by the pure-numpy
    decoder and reduced to exact-integer stats. The oracle recomputes
    width/height/channels/sums straight from the arithmetic pixel
    formula — so a decoder bug in stride handling, BGR order, or
    bottom-up flip breaks the ORDER-SENSITIVE weighted checksum and
    fails the hash gate; the encoders can't mask a decoder bug because
    tests/test_multimodal.py pins both against hand-built byte
    fixtures independently.

    Scale: encode and decode are one fused mapInPandas pass each —
    map-side only, zero shuffles, blobs never leave the executor; only
    the narrow stat columns survive. The mean is a single IEEE division
    of exact integers on both engines."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            # row-loop-ok: per-row format/geometry heterogeneity (BMP vs
            # P6 vs P5, w/h from doc_id) makes the encode genuinely
            # per-row; the interior byte math is numpy-vectorized and
            # each payload is <=170 bytes (a fixture generator, not a
            # data path).
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w = 4 + did % 5
                h = 3 + did % 4
                fmt = did % 3
                nch = 1 if fmt == 2 else 3
                px = (
                    ((did * 7 + np.arange(w * h * nch, dtype=np.int64) * 13) % 256)
                    .astype(np.uint8)
                    .tobytes()
                )
                if fmt == 0:
                    payloads.append(
                        multimodal.encode_bmp(w, h, px, top_down=bool(did % 2))
                    )
                elif fmt == 1:
                    payloads.append(multimodal.encode_pnm(w, h, px))
                else:
                    payloads.append(multimodal.encode_pnm(w, h, px, gray=True))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, schema="doc_id long, payload binary")
    decoded = multimodal.decode_media(media, "doc_id", "payload", with_stats=True)
    return decoded.select(
        "doc_id",
        "format",
        "width",
        "height",
        "channels",
        "n_pixel_bytes",
        "pixel_sum",
        "weighted_sum",
        round_half_up(
            F.col("pixel_sum").cast("double")
            / F.col("n_pixel_bytes").cast("double"),
            6,
        ).alias("mean_pixel"),
    ).orderBy("doc_id")


@query(
    "audio_decode_stats",
    category="llm-multimodal",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   CAST(8000 + 4000 * (doc_id % 3) AS INT) AS sample_rate,
                   CAST(1 + doc_id % 2 AS INT) AS channels,
                   CAST(64 + doc_id % 129 AS BIGINT) AS n_frames
            FROM documents
        ),
        v0 AS (
            SELECT doc_id, sample_rate, channels, n_frames,
                   unnest(range(n_frames * channels)) AS i
            FROM d
        ),
        v AS (
            SELECT *, (doc_id * 31 + i * 17) % 65536 - 32768 AS val FROM v0
        )
        SELECT doc_id, sample_rate, channels, n_frames,
               CAST(n_frames * 1000000 // sample_rate AS BIGINT) AS duration_us,
               CAST(MAX(abs(val)) AS BIGINT) AS peak,
               CAST(SUM(val * val) AS BIGINT) AS sum_sq,
               CAST(SUM(CASE WHEN i % channels = 0 THEN val ELSE 0 END)
                    AS BIGINT) AS ch0_sum,
               {rms} AS rms
        FROM v
        GROUP BY doc_id, sample_rate, channels, n_frames
        ORDER BY doc_id
    """.format(
        rms=sql_round_half_up(
            "sqrt(CAST(SUM(val * val) AS DOUBLE)"
            " / CAST(n_frames * channels AS DOUBLE))",
            6,
        )
    ),
)
def audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end — the WAV/PCM member that completes
    the multimodal column family beyond images (r8 verdict gap #3): per
    document a deterministic 16-bit PCM clip is ENCODED to genuine
    RIFF/WAVE bytes (functions.multimodal.encode_wav — 8/12/16 kHz,
    mono/stereo by doc_id, sample i carrying
    (doc_id·31 + i·17) mod 65536 − 32768, every 4th doc with a LIST
    junk chunk so the decoder must walk chunks), then decoded back by
    the pure-numpy RIFF parser (decode_audio) and reduced to
    exact-integer stats: duration (integer µs), peak, energy (Σ v²),
    and the ORDER-SENSITIVE channel-0 sum that breaks if the stereo
    interleave is mis-strided. The oracle recomputes everything from
    the arithmetic sample formula; RMS is one sqrt of one exact-int
    division on both engines. tests/test_multimodal.py pins the
    encoder and decoder independently against hand-built byte fixtures
    (planted square wave, junk-chunk walk, corrupt payloads → err).

    Scale: encode and decode are one fused mapInPandas pass each —
    map-side only, zero shuffles, blobs never leave the executor."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import numpy as np

        for pdf in batches:
            payloads = []
            # row-loop-ok: per-row geometry heterogeneity (rate/channels/
            # length from doc_id) makes the encode genuinely per-row; the
            # sample synthesis is numpy-vectorized and each clip is <1 KB
            # (a fixture generator, not a data path).
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                rate = 8000 + 4000 * (did % 3)
                ch = 1 + did % 2
                frames = 64 + did % 129
                idx = np.arange(frames * ch, dtype=np.int64)
                vals = ((did * 31 + idx * 17) % 65536 - 32768).astype("<i2")
                payloads.append(
                    multimodal.encode_wav(
                        rate, ch, vals.tobytes(), junk_chunk=(did % 4 == 0)
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, schema="doc_id long, payload binary")
    decoded = multimodal.decode_audio(media, "doc_id", "payload")
    return decoded.select(
        "doc_id",
        "sample_rate",
        "channels",
        "n_frames",
        "duration_us",
        "peak",
        "sum_sq",
        "ch0_sum",
        round_half_up(
            F.sqrt(
                F.col("sum_sq").cast("double")
                / (F.col("n_frames") * F.col("channels")).cast("double")
            ),
            6,
        ).alias("rms"),
    ).orderBy("doc_id")


@query(
    "hash_mod_sample_docs",
    category="llm-curation",
    oracle="""
        SELECT doc_id,
               CAST(CAST('0x' || substring(
                        md5(CAST(doc_id AS VARCHAR) || '#sample'), 1, 15)
                    AS BIGINT) % 100 AS BIGINT) AS bucket
        FROM documents
        WHERE CAST('0x' || substring(
                  md5(CAST(doc_id AS VARCHAR) || '#sample'), 1, 15)
              AS BIGINT) % 100 < 10
        ORDER BY doc_id
    """,
)
def hash_mod_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-mod sampling — the production way to sample
    at 100 TB: bucket = md5(key) mod 100, keep buckets < rate. Unlike
    Bernoulli ``sample()`` (partitioning-dependent, unreproducible
    across runs/engines) a hash sample is (a) exactly reproducible,
    (b) CONSISTENT across tables — sampling users by the same key
    expression in every table yields joinable samples — and (c) a pure
    map-side filter Parquet scans can pipeline. The 15-hex-digit md5
    bigint is the repo's cross-engine hash lattice, so the oracle
    selects the identical rows.

    Scale: zero shuffles, no RNG state, no seed-per-partition hazards;
    downsizing to 0.01% just changes the modulus."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#sample"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(100),
    )
    return (
        docs.select("doc_id", bucket.cast("bigint").alias("bucket"))
        .filter(F.col("bucket") < 10)
        .orderBy("doc_id")
    )


#: Dictionary for the keyword-tagging row: fixture-vocabulary terms
#: playing the role of a topic/blocklist lexicon.
KEYWORDS = ["fast", "merge", "slow", "table"]
_KEYWORDS_SQL = ", ".join(f"'{w}'" for w in KEYWORDS)


@query(
    "keyword_tag_docs",
    category="llm-text",
    oracle=f"""
        SELECT doc_id,
               CAST(len(matched) AS BIGINT) AS n_matches,
               COALESCE(array_to_string(matched, ','), '') AS matched
        FROM (
            SELECT doc_id,
                   list_sort(list_filter(
                       list_distinct(string_split(text, ' ')),
                       t -> t IN ({_KEYWORDS_SQL}))) AS matched
            FROM documents
        )
        ORDER BY doc_id
    """,
)
def keyword_tag_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary keyword tagging — the curation primitive behind topic
    labeling, blocklist filtering, and licence-string detection: tag
    each document with the sorted set of lexicon terms it contains.
    For a small lexicon this is a pure map-side ``array_intersect``
    against a broadcast literal array (zero shuffles — this query);
    at lexicon scale (millions of phrases) the same answer comes from
    explode(tokens) ⋈ broadcast(lexicon) + collect_set, the shape
    pii_scrub_patterns' regex alternative cannot reach. Documents with
    no matches keep a 0/'' row — curation filters need the negatives.
    """
    docs = load_table(spark, sf_dir, "documents")
    matched = F.array_sort(
        F.array_intersect(
            text.distinct_tokens(F.col("text")),
            F.array(*[F.lit(w) for w in KEYWORDS]),
        )
    )
    return docs.select(
        "doc_id",
        F.size(matched).cast("bigint").alias("n_matches"),
        F.array_join(matched, ",").alias("matched"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@query(
    "text_stats_docs",
    category="llm-text",
    oracle=f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               len(list_distinct(string_split(text, ' '))) /
                   len(string_split(text, ' ')) AS ttr,
               length(replace(text, ' ', '')) /
                   len(string_split(text, ' ')) AS avg_tok_len,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ({_STOPWORDS_SQL}))) /
                   len(string_split(text, ' ')) AS stop_ratio,
               len(list_distinct(string_split(text, ' '))) /
                       len(string_split(text, ' ')) * 0.5
                   + len(list_filter(string_split(text, ' '),
                                     t -> t IN ({_STOPWORDS_SQL}))) /
                       len(string_split(text, ' ')) * 0.2
                   + (len(string_split(text, ' ')) >= 10)::INT::DOUBLE * 0.3 AS quality
        FROM documents ORDER BY doc_id
    """,
)
def text_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics (functions.text): token counts,
    type-token ratio, mean token length, stopword share, and the
    composite quality score — all pure Column expressions inside
    whole-stage codegen; zero shuffles, scales with the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        F.size(text.distinct_tokens("text")).alias("n_distinct"),
        text.type_token_ratio("text").alias("ttr"),
        text.avg_token_len("text").alias("avg_tok_len"),
        text.stopword_ratio("text", STOPWORDS).alias("stop_ratio"),
        text.quality_score("text", STOPWORDS).alias("quality"),
    ).orderBy("doc_id")


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"len(list_intersect(list_distinct(string_split(text, ' ')), [{words}]))"
    )


@query(
    "lang_id_docs",
    category="llm-text",
    oracle=f"""
        WITH hits AS (
            SELECT doc_id,
                   {_lang_hits_sql("de")} AS de_hits,
                   {_lang_hits_sql("en")} AS en_hits,
                   {_lang_hits_sql("fr")} AS fr_hits
            FROM documents
        )
        SELECT doc_id, de_hits, en_hits, fr_hits,
               CASE WHEN de_hits >= en_hits AND de_hits >= fr_hits THEN 'de'
                    WHEN en_hits >= fr_hits THEN 'en'
                    ELSE 'fr' END AS predicted
        FROM hits ORDER BY doc_id
    """,
)
def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (functions.text.lang_scores): marker-token
    hit counts per language as a map column, argmax with a deterministic
    first-win tie-break over sorted language keys."""
    docs = load_table(spark, sf_dir, "documents")
    m = text.lang_scores("text", LANG_MARKERS)
    scored = docs.select(
        "doc_id",
        F.element_at(m, "de").alias("de_hits"),
        F.element_at(m, "en").alias("en_hits"),
        F.element_at(m, "fr").alias("fr_hits"),
    )
    return scored.select(
        "doc_id",
        "de_hits",
        "en_hits",
        "fr_hits",
        F.when(
            (F.col("de_hits") >= F.col("en_hits")) & (F.col("de_hits") >= F.col("fr_hits")), "de"
        )
        .when(F.col("en_hits") >= F.col("fr_hits"), "en")
        .otherwise("fr")
        .alias("predicted"),
    ).orderBy("doc_id")


@query(
    "tfidf_top_terms",
    category="llm-text",
    oracle="""
        WITH tf AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        tfc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tf GROUP BY doc_id, tok),
        dfc AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT t.doc_id, t.tok,
                   CASE WHEN isfinite(t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0))) THEN floor((t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0))) * 1000000.0 + 0.5) / 1000000.0 END AS tfidf
            FROM tfc t JOIN dfc d ON t.tok = d.tok CROSS JOIN n
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, tok) AS rn
            FROM scored
        )
        SELECT doc_id, tok, tfidf, rn FROM ranked WHERE rn <= 3
        ORDER BY doc_id, rn
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document, built from relational primitives
    (explode -> two aggregations -> broadcast of the 1-row corpus count
    -> window top-k) — no ml-lib dependency, fully plan-optimizable.
    Smoothed idf = ln((N+1)/(df+1)); both engines' ln agree on these
    operands (libm double, identical inputs), rounded to 6."""
    docs = load_table(spark, sf_dir, "documents")
    tf = docs.select("doc_id", F.explode(text.tokens("text")).alias("tok"))
    tfc = tf.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tfc.join(dfc, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            round_half_up(
                F.col("tf") * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


@query(
    "decontamination_overlap",
    category="llm-dedup",
    oracle=f"""
        WITH csh AS (
            SELECT doc_id AS corpus_id, sh FROM (
                {_shingle_units_sql(source="documents", alias="sh")}
                WHERE doc_id < 450)
        ),
        rsh AS (
            SELECT doc_id AS bench_id, sh FROM (
                {_shingle_units_sql(source="documents", alias="sh")}
                WHERE doc_id >= 450)
        ),
        sizes AS (SELECT corpus_id, COUNT(*) AS n FROM csh GROUP BY corpus_id),
        o AS (SELECT c.corpus_id, r.bench_id, COUNT(*) AS n_common
              FROM csh c JOIN rsh r ON c.sh = r.sh
              GROUP BY c.corpus_id, r.bench_id)
        SELECT o.corpus_id AS corpus_id, o.bench_id, o.n_common,
               o.n_common / s.n AS corpus_frac
        FROM o JOIN sizes s ON s.corpus_id = o.corpus_id
        WHERE o.n_common / s.n >= 0.1
        ORDER BY o.corpus_id, bench_id
    """,
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination (operators.dedup.cross_corpus_overlap):
    docs >= 450 play the held-out benchmark; training docs sharing >=10%
    of their 3-gram shingles with any benchmark doc are flagged. The
    benchmark side broadcasts — the training corpus never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 450).select(
        F.col("doc_id").alias("corpus_id"), "text"
    )
    bench = docs.filter(F.col("doc_id") >= 450).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return (
        dedup.cross_corpus_overlap(corpus, bench, "corpus_id", "bench_id", "text")
        .filter(F.col("corpus_frac") >= 0.1)
        .orderBy("corpus_id", "bench_id")
    )


@query(
    "pii_scrub_patterns",
    category="llm-text",
    oracle="""
        WITH synth AS (
            SELECT doc_id,
                   concat(string_split(text, ' ')[1], '@', string_split(text, ' ')[2],
                          '.com call 555-', CAST(1000 + doc_id % 9000 AS VARCHAR),
                          ' ', substr(text, 1, 40)) AS raw
            FROM documents
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(raw,
                   '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
                   '\\d{3}-\\d{4}', '<PHONE>', 'g') AS scrubbed
        FROM synth ORDER BY doc_id
    """,
)
def pii_scrub_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email and phone patterns replaced with placeholder
    tags — the redaction pass every training corpus gets. The fixture
    has no real PII, so deterministic synthetic contact strings are
    built per document and scrubbed; both regex dialects (Java, RE2)
    agree on these patterns. Pure map-side regexes in codegen."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    raw = F.concat(
        F.element_at(toks, 1),
        F.lit("@"),
        F.element_at(toks, 2),
        F.lit(".com call 555-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" "),
        F.substring("text", 1, 40),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
        r"\d{3}-\d{4}",
        "<PHONE>",
    )
    return docs.select("doc_id", scrubbed.alias("scrubbed")).orderBy("doc_id")


@query(
    "repetition_scores",
    category="llm-text",
    oracle="""
        WITH sh AS (
            SELECT doc_id, unnest(
                list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                               i -> concat_ws(' ', string_split(text, ' ')[i],
                                              string_split(text, ' ')[i + 1],
                                              string_split(text, ' ')[i + 2]))) AS s
            FROM documents
        ),
        counts AS (SELECT doc_id, s, COUNT(*) AS c FROM sh GROUP BY doc_id, s)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_shingles,
               CAST(MAX(c) AS BIGINT) AS max_repeat,
               MAX(c) / SUM(c) AS top_shingle_frac,
               SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / SUM(c) AS repeated_frac
        FROM counts GROUP BY doc_id ORDER BY doc_id
    """,
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the Gopher/C4-style quality rule):
    fraction of 3-gram shingles that are repeats and the share of the
    single most-repeated shingle — boilerplate and degenerate generation
    both light these up. Ratios are exact-int divisions. One explode +
    one two-level aggregation; scales with the scan."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(text.shingles("text", 3)).alias("s"))
    counts = sh.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_shingles"),
            F.max("c").alias("max_repeat"),
            (F.max("c") / F.sum("c")).alias("top_shingle_frac"),
            (F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c")).alias(
                "repeated_frac"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_length_histogram",
    category="llm-text",
    oracle="""
        SELECT CAST(n_chars // 100 AS BIGINT) AS bucket,
               COUNT(*) AS n_docs,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents GROUP BY bucket ORDER BY bucket
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document length distribution in 100-char buckets — the first
    chart every corpus report shows, and the basis for length cutoffs.
    A single partial+final aggregation over integer bucket keys."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy((F.floor(F.col("n_chars") / 100)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("bucket")
    )


@query(
    "token_stats_by_source",
    category="llm-text",
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents GROUP BY source ORDER BY source
    """,
)
def token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition stats per source — the aggregate every
    training-data pipeline reports before/after filtering. Token counts
    are exact integer sums (order-independent)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count("text")).alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Embedding-space near-dup + deterministic sampling
# --------------------------------------------------------------------------


@query(
    "embedding_near_dup_pairs",
    category="llm-dedup",
    oracle="""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          ((embedding[1] > 0)::INT * 1 + (embedding[8] > 0)::INT * 2 +
                           (embedding[22] > 0)::INT * 4 + (embedding[43] > 0)::INT * 8)
                              AS bucket
                   FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CASE WHEN isfinite(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) THEN floor((list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1000000.0 + 0.5) / 1000000.0 END AS cosine_sim
        FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE CASE WHEN isfinite(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) THEN floor((list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1000000.0 + 0.5) / 1000000.0 END >= 0.4
        ORDER BY id_a, id_b
    """,
)
def embedding_near_dup_pairs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection
    (operators.similarity.embedding_near_dup_pairs): sign-LSH bucket
    self-join — only intra-bucket pairs are scored, ~1/2^bits of the
    corpus square — then a cosine threshold. The fixture has no planted
    embedding clones (max intra-bucket cosine ~0.49), so the threshold
    is calibrated to 0.4 to exercise a non-empty result; production
    near-dup uses ~0.95+, where sign-bucket recall is near 1."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4
    ).orderBy("id_a", "id_b")


@query(
    "deterministic_sample_docs",
    category="llm-sampling",
    oracle="""
        SELECT doc_id, source, n_chars,
               md5(doc_id::VARCHAR || '|sample-v1') AS sample_key
        FROM documents
        WHERE md5(doc_id::VARCHAR || '|sample-v1') < '28'
        ORDER BY doc_id
    """,
)
def deterministic_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling — the reproducible way to cut
    a training subset at 100 TB: the keep decision is a pure function of
    the row key (md5 < hex threshold '28' ~ 15.6%), so re-runs,
    backfills, and multi-site runs agree without seed coordination or a
    global sort, and the filter rides the scan (no shuffle at all).
    ``sample()``/TABLESAMPLE give per-partition RNG instead — not
    reproducible under repartitioning — which is why pipelines hash."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|sample-v1")))
    return (
        docs.withColumn("sample_key", key)
        .filter(F.col("sample_key") < "28")
        .select("doc_id", "source", "n_chars", "sample_key")
        .orderBy("doc_id")
    )


@query(
    "stratified_sample_by_source",
    category="llm-sampling",
    oracle="""
        SELECT source, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(doc_id::VARCHAR), doc_id) AS INT) AS rn
        FROM documents
        QUALIFY rn <= 10
        ORDER BY source, rn
    """,
)
def stratified_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-k sampling: exactly k=10 documents per source,
    chosen by md5 rank — deterministic, shuffle-bounded (one hash
    partition per stratum, each keeping k rows), and rebalances a
    source-skewed corpus the way mixture weighting does before
    training. For strata too hot for one reducer, compose with the
    two-phase top-k pattern (operators.similarity._topk_per_query)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("source", "doc_id", "rn")
        .orderBy("source", "rn")
    )


@query(
    "chunk_documents_for_training",
    category="llm-text",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        s AS (SELECT doc_id, toks,
                     unnest(generate_series(1, greatest(len(toks), 1), 48)) AS start
              FROM t)
        SELECT doc_id,
               CAST((start - 1) // 48 AS BIGINT) AS chunk_idx,
               array_to_string(toks[start:start + 63], ' ') AS chunk_text,
               CAST(len(toks[start:start + 63]) AS BIGINT) AS n_tokens
        FROM s ORDER BY doc_id, chunk_idx
    """,
)
def chunk_documents_for_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the step that turns documents
    into fixed-size training sequences: 64-token chunks every 48 tokens
    (16-token overlap preserves context across boundaries; the final
    chunk clamps at EOF). One generate-series explode + array slice,
    all map-side from the scan — at 100 TB chunking adds zero shuffles;
    row count grows ~tokens/stride, which is the intended output, not
    amplification. functions.text.chunk_starts/chunk_slice."""
    chunk_tokens, stride = 64, 48
    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id",
        "text",
        F.explode(text.chunk_starts("text", stride)).alias("start"),
    )
    toks = text.chunk_slice("text", F.col("start"), chunk_tokens)
    return exploded.select(
        "doc_id",
        F.expr(f"CAST((start - 1) DIV {stride} AS BIGINT)").alias("chunk_idx"),
        F.array_join(toks, " ").alias("chunk_text"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "pack_sequences_for_training",
    category="llm-text",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        s AS (SELECT doc_id, toks,
                     unnest(generate_series(1, greatest(len(toks), 1), 48)) AS start
              FROM t),
        chunks AS (
            SELECT doc_id,
                   CAST((start - 1) // 48 AS BIGINT) AS chunk_idx,
                   CAST(len(toks[start:start + 63]) AS BIGINT) AS n_tokens
            FROM s),
        cum AS (
            SELECT doc_id, chunk_idx, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY doc_id ORDER BY chunk_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tokens AS tokens_before
            FROM chunks)
        SELECT doc_id, chunk_idx,
               CAST(tokens_before // 512 AS BIGINT) AS pack_id,
               n_tokens,
               CAST(tokens_before % 512 AS BIGINT) AS pack_offset
        FROM cum ORDER BY doc_id, chunk_idx
    """,
)
def pack_sequences_for_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign each training chunk to a fixed-capacity
    context window (512 tokens) by cutting the in-order token stream at
    capacity boundaries — the standard concat-then-cut packing that
    keeps padding waste near zero. pack_id/pack_offset derive from an
    exclusive running token count (one window over the chunk order per
    document), so packing is deterministic under any partitioning and
    costs one shuffle on the group key — no driver-side loop, no UDF.
    Composes directly with chunk_documents_for_training's output."""
    from pyspark.sql import Window

    chunk_tokens, stride, capacity = 64, 48, 512
    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id",
        "text",
        F.explode(text.chunk_starts("text", stride)).alias("start"),
    )
    chunks = exploded.select(
        "doc_id",
        F.expr(f"CAST((start - 1) DIV {stride} AS BIGINT)").alias("chunk_idx"),
        F.size(text.chunk_slice("text", F.col("start"), chunk_tokens))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = chunks.withColumn("tokens_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return cum.select(
        "doc_id",
        "chunk_idx",
        F.expr(f"CAST(tokens_before DIV {capacity} AS BIGINT)").alias("pack_id"),
        "n_tokens",
        (F.col("tokens_before") % capacity).cast("bigint").alias("pack_offset"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "dedup_representatives_docs",
    category="llm-dedup",
    oracle=_CLUSTERS_SQL
    + """ ,
        sized AS (
            SELECT l.cluster_id, l.doc_id,
                   len(string_split(d.text, ' ')) AS n_tokens
            FROM labels l JOIN documents d ON d.doc_id = l.doc_id)
        SELECT cluster_id,
               doc_id AS rep_doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        FROM sized
        QUALIFY row_number() OVER (
            PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) = 1
        ORDER BY cluster_id
    """,
)
def dedup_representatives_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection — the step after near-dup
    clustering that decides WHICH copy survives: keep each cluster's
    longest document (tie-break min doc_id), not the arbitrary min-id
    member, because near-dup clusters usually contain truncated/mangled
    variants of one canonical page. One window per cluster over rows
    carrying (cluster_id, doc_id, n_tokens) — the text itself never
    re-shuffles; at 100 TB the exchange is ~24 bytes/doc."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup.dedup_clusters(docs, "doc_id", "text", threshold=0.6)
    sized = clusters.join(
        docs.select("doc_id", text.token_count("text").alias("n_tokens")),
        clusters["id"] == docs["doc_id"],
    ).select("cluster_id", "doc_id", "n_tokens")
    w = Window.partitionBy("cluster_id")
    ranked = sized.withColumn(
        "rn",
        F.row_number().over(w.orderBy(F.col("n_tokens").desc(), F.col("doc_id"))),
    ).withColumn("cluster_size", F.count("*").over(w))
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
        )
        .orderBy("cluster_id")
    )


@query(
    "unigram_surprisal_scores",
    category="llm-text",
    oracle="""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
        vocab AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab),
        probs AS (
            SELECT tok,
                   CAST(CASE WHEN isfinite(-ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) THEN floor((-ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000000.0 + 0.5) / 1000000000.0 END
                        AS DECIMAL(20, 9)) AS s
            FROM vocab, tot)
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CASE WHEN isfinite(CAST(SUM(p.s) AS DOUBLE) / COUNT(*)) THEN floor((CAST(SUM(p.s) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 END AS avg_surprisal
        FROM tok t JOIN probs p ON p.tok = t.tok
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def unigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring — the cheapest perplexity proxy: train
    token probabilities on the corpus itself (one groupBy), then score
    each document by mean token surprisal -ln(p). High scores flag
    gibberish/rare-token soup; low scores flag boilerplate. Scale shape:
    the model is vocab-sized, not corpus-sized, so it broadcasts and
    scoring is map-side; the only corpus-wide shuffles are the vocab
    count and the per-doc mean. Determinism: each surprisal is rounded
    to 9 places and summed as DECIMAL so the per-doc sum is
    order-independent, then the mean rounds to 6 (same recipe as the
    cosine family)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(text.tokens("text")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        round_half_up(-F.log(F.col("c").cast("double") / F.col("n").cast("double")), 9)
        .cast("decimal(20,9)")
        .alias("s"),
    )
    return (
        toks.join(F.broadcast(probs), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            round_half_up(F.sum("s").cast("double") / F.count("*"), 6).alias(
                "avg_surprisal"
            ),
        )
        .orderBy("doc_id")
    )


def _shuffle_positions(df: DataFrame, id_col: str, salt: str) -> DataFrame:
    """Dense global position in md5-of-key order via two-phase rank:
    rows rank within their 256 hash-prefix buckets in parallel, and
    bucket offsets come from a 256-row cumulative count that
    broadcasts. Because the bucket is a prefix of the sort key,
    bucket-then-within order IS the global md5 order — no
    single-reducer row_number anywhere. Adds ``shuffle_pos``."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    hashed = df.withColumn("h", h).withColumn("bucket", F.substring("h", 1, 2))
    w_in = Window.partitionBy("bucket").orderBy("h", id_col)
    within = hashed.withColumn("rn", F.row_number().over(w_in))
    counts = hashed.groupBy("bucket").agg(F.count("*").alias("n"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    return (
        within.join(F.broadcast(offsets), "bucket")
        .withColumn("shuffle_pos", (F.col("offset") + F.col("rn")).cast("bigint"))
        .drop("h", "bucket", "rn", "offset")
    )


@query(
    "global_shuffle_positions",
    category="llm-sampling",
    oracle="""
        SELECT doc_id,
               CAST(row_number() OVER (
                   ORDER BY md5(doc_id::VARCHAR || '|shuffle-v1'), doc_id
               ) AS BIGINT) AS shuffle_pos
        FROM documents ORDER BY shuffle_pos
    """,
)
def global_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a dense position in md5-of-key order, reproducible across runs and
    repartitioning (no RNG, no zipWithIndex); see _shuffle_positions
    for the two-phase rank that avoids a single-reducer row_number."""
    docs = load_table(spark, sf_dir, "documents")
    return _shuffle_positions(
        docs.select("doc_id"), "doc_id", "|shuffle-v1"
    ).select("doc_id", "shuffle_pos").orderBy("shuffle_pos")


#: Target mixture for mixture_sample_by_weights: source → md5-hex keep
#: threshold ('g' sorts above every hex digit = keep all; '80' ≈ 50%,
#: '40' ≈ 25%; unlisted sources fall through to '20' ≈ 12.5%).
MIXTURE_THRESHOLDS = {"src0": "g", "src1": "80", "src2": "40"}
_MIXTURE_DEFAULT = "20"


@query(
    "mixture_sample_by_weights",
    category="llm-sampling",
    oracle=f"""
        SELECT source, doc_id,
               md5(doc_id::VARCHAR || '|mix-v1') AS mix_key
        FROM documents
        WHERE mix_key < CASE source
            {' '.join(f"WHEN '{s}' THEN '{t}'" for s, t in MIXTURE_THRESHOLDS.items())}
            ELSE '{_MIXTURE_DEFAULT}' END
        ORDER BY doc_id
    """,
)
def mixture_sample_by_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture sampling — the knob that turns a raw
    crawl into a training mixture (upweight curated sources, downsample
    the long tail). The keep decision compares the row's md5 key against
    a per-source hex threshold, so it is a pure map-side filter that
    rides the scan: reproducible under repartitioning, no shuffle, no
    seed coordination, and re-weighting is a literal change, not a
    re-shuffle. Deterministic analog of weighted TABLESAMPLE."""
    docs = load_table(spark, sf_dir, "documents")
    thr = F.lit(_MIXTURE_DEFAULT)
    for s, t in reversed(MIXTURE_THRESHOLDS.items()):
        thr = F.when(F.col("source") == s, F.lit(t)).otherwise(thr)
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix-v1")))
    return (
        docs.withColumn("mix_key", key)
        .filter(F.col("mix_key") < thr)
        .select("source", "doc_id", "mix_key")
        .orderBy("doc_id")
    )


@query(
    "markup_strip_docs",
    category="llm-text",
    oracle="""
        WITH html AS (
            SELECT doc_id,
                   '<p id="d">' || regexp_replace(text, ' the ', ' &amp; the ', 'g')
                   || '</p><br/>' AS html
            FROM documents),
        clean AS (
            SELECT doc_id, html,
                   trim(regexp_replace(regexp_replace(
                       regexp_replace(html, '<[^>]+>', '', 'g'),
                       '&amp;', '&', 'g'), ' +', ' ', 'g')) AS clean_text
            FROM html)
        SELECT doc_id,
               CAST(len(html) AS BIGINT) AS html_chars,
               CAST(len(clean_text) AS BIGINT) AS clean_chars,
               md5(clean_text) AS clean_hash
        FROM clean ORDER BY doc_id
    """,
)
def markup_strip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup stripping — the HTML→text cleaning stage of a crawl
    pipeline: drop tags, decode entities, collapse whitespace. The
    fixture corpus is plain text, so the query plants deterministic
    markup (tag wrapper + &amp; entities) and then strips it, proving
    the strip inverts the wrap; the pipeline shape (pure regexp
    expressions, zero UDFs, rides the scan) is exactly what runs on a
    real crawl. Output keeps lengths + a hash, not the body, so the
    result stays narrow."""
    html = F.concat(
        F.lit('<p id="d">'),
        F.regexp_replace("text", " the ", " &amp; the "),
        F.lit("</p><br/>"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(html, "<[^>]+>", ""), "&amp;", "&"
            ),
            " +",
            " ",
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.length(html).cast("bigint").alias("html_chars"),
            F.length(clean).cast("bigint").alias("clean_chars"),
            F.md5(clean).alias("clean_hash"),
        )
        .orderBy("doc_id")
    )


@query(
    "length_bucketed_batches",
    category="llm-sampling",
    oracle="""
        WITH sized AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(string_split(text, ' ')) // 16 AS BIGINT)
                       AS length_bucket
            FROM documents),
        ranked AS (
            SELECT doc_id, n_tokens, length_bucket,
                   row_number() OVER (
                       PARTITION BY length_bucket ORDER BY doc_id) AS rn
            FROM sized)
        SELECT length_bucket, doc_id, n_tokens,
               CAST((rn - 1) // 8 AS BIGINT) AS batch_in_bucket
        FROM ranked ORDER BY length_bucket, doc_id
    """,
)
def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment — group similar-length documents
    into fixed-size batches (8 docs) so padding waste inside a training
    batch stays small. Documents shuffle once on their length bucket
    (n_tokens DIV 16) and rank deterministically by doc_id; batch id is
    the rank cut every 8 rows. Hot buckets at 100 TB compose with the
    same two-phase rank used by global_shuffle_positions."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n = text.token_count("text").cast("bigint")
    sized = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        (n / 16).cast("bigint").alias("length_bucket"),
    )
    w = Window.partitionBy("length_bucket").orderBy("doc_id")
    return (
        sized.withColumn("rn", F.row_number().over(w))
        .select(
            "length_bucket",
            "doc_id",
            "n_tokens",
            ((F.col("rn") - 1) / 8).cast("bigint").alias("batch_in_bucket"),
        )
        .orderBy("length_bucket", "doc_id")
    )


_KMEANS_K, _KMEANS_ITERS = 4, 2

_KMEANS_ITER_SQL = """
        d{i} AS (
            SELECT e.vec_id, c.cell,
                   CAST(SUM(CAST(CASE WHEN isfinite(e.val * c.c) THEN floor((e.val * c.c) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12)))
                        AS DOUBLE) AS dot
            FROM e JOIN c{p} c ON c.dim = e.dim
            GROUP BY e.vec_id, c.cell),
        nc{i} AS (
            SELECT cell,
                   CAST(SUM(CAST(CASE WHEN isfinite(c * c) THEN floor((c * c) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12)))
                        AS DOUBLE) AS nc
            FROM c{p} GROUP BY cell),
        a{i} AS (
            SELECT d.vec_id, d.cell
            FROM d{i} d JOIN nv ON nv.vec_id = d.vec_id
                        JOIN nc{i} nc ON nc.cell = d.cell
            QUALIFY row_number() OVER (
                PARTITION BY d.vec_id
                ORDER BY d.dot / sqrt(nv.nv * nc.nc) DESC, d.cell) = 1),
        c{i} AS (
            SELECT a.cell, e.dim,
                   CASE WHEN isfinite(CAST(SUM(CAST(CASE WHEN isfinite(e.val) THEN floor((e.val) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)) THEN floor((CAST(SUM(CAST(CASE WHEN isfinite(e.val) THEN floor((e.val) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 END AS c
            FROM e JOIN a{i} a ON a.vec_id = e.vec_id
            GROUP BY a.cell, e.dim)"""


@query(
    "kmeans_train_embeddings",
    category="llm-similarity",
    oracle="""
        WITH e AS (
            SELECT vec_id, t.d AS dim, embedding[t.d]::DOUBLE AS val
            FROM embeddings, unnest(generate_series(1, 64)) AS t(d)),
        c0 AS (
            SELECT g.cell, t.d AS dim,
                   CASE WHEN t.d = g.cell + 1 THEN 1.0 ELSE 0.0 END AS c
            FROM unnest(generate_series(0, 3)) AS g(cell),
                 unnest(generate_series(1, 64)) AS t(d)),
        nv AS (
            SELECT vec_id,
                   CAST(SUM(CAST(CASE WHEN isfinite(val * val) THEN floor((val * val) * 1000000000.0 + 0.5) / 1000000000.0 END AS DECIMAL(28,12)))
                        AS DOUBLE) AS nv
            FROM e GROUP BY vec_id),
    """
    + _KMEANS_ITER_SQL.format(i=1, p=0)
    + ","
    + _KMEANS_ITER_SQL.format(i=2, p=1)
    + """ ,
        n2 AS (SELECT cell, COUNT(*) AS n FROM a2 GROUP BY cell)
        SELECT CAST(m.cell AS BIGINT) AS cell,
               CAST(m.dim AS BIGINT) AS dim,
               m.c AS centroid,
               CAST(n2.n AS BIGINT) AS n_members
        FROM c2 m JOIN n2 ON n2.cell = m.cell
        ORDER BY cell, dim
    """,
)
def kmeans_train_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means training (operators.clustering.kmeans_train):
    2 Lloyd's iterations, k=4, seeded from the same one-hot centroids
    IVF serves from — so the engine now owns the IVF index's *training*
    step, not just assignment and probe. Per iteration the corpus
    shuffles twice (dot-product agg, mean agg) and the k x dim centroid
    table broadcasts; nothing corpus-sized reaches the driver. The
    oracle replays both iterations as chained CTEs from the same
    DECIMAL-exact accumulators, so every centroid matches to the digit.
    Output is long-format (cell, dim) — array-free by driver contract."""
    from pipeline_query_engine_demo_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    init = spark.createDataFrame(
        [
            (cell, dim, 1.0 if dim == cell + 1 else 0.0)
            for cell in range(_KMEANS_K)
            for dim in range(1, _IVF_DIM + 1)
        ],
        "cell long, dim long, c double",
    )
    cent, assign = clustering.kmeans_train(
        emb, "vec_id", "embedding", init, iterations=_KMEANS_ITERS
    )
    n = assign.groupBy("cell").agg(F.count("*").alias("n"))
    return (
        cent.join(n, "cell")
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            F.col("dim").cast("bigint").alias("dim"),
            F.col("c").alias("centroid"),
            F.col("n").cast("bigint").alias("n_members"),
        )
        .orderBy("cell", "dim")
    )


def _side_buckets_sql(p: str, where: str) -> str:
    """units→sigs→buckets CTE chain for one side of the incremental
    dedup (same constants as the corpus-wide _UNITS/_SIGS/_BUCKETS
    CTEs, parameterized on a documents filter)."""
    units = _shingle_units_sql(source=f"(SELECT * FROM documents WHERE {where})")
    sigs = ", ".join(
        f"min(md5(tok || '#{i}')) AS mh{i}" for i in range(_NUM_HASHES)
    )
    buckets = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, md5(concat_ws('|', {cols})) AS band_hash "
        "FROM {p}_sigs".format(
            b=b,
            p=p,
            cols=", ".join(
                f"mh{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)
            ),
        )
        for b in range(_BANDS)
    )
    return (
        f"{p}_units AS ({units}), "
        f"{p}_sigs AS (SELECT doc_id, {sigs} FROM {p}_units GROUP BY doc_id), "
        f"{p}_buckets AS ({buckets})"
    )


@query(
    "incremental_dedup_docs",
    category="llm-dedup",
    oracle=f"""
        WITH inc AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
        ex AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        exact AS (SELECT DISTINCT i.doc_id FROM inc i JOIN ex e ON e.text = i.text),
        {_side_buckets_sql("i", "doc_id % 5 = 0")},
        {_side_buckets_sql("e", "doc_id % 5 <> 0")},
        cand AS (
            SELECT DISTINCT ib.doc_id AS id_i, eb.doc_id AS id_e
            FROM i_buckets ib JOIN e_buckets eb
              ON ib.band_id = eb.band_id AND ib.band_hash = eb.band_hash),
        sz_i AS (SELECT doc_id, COUNT(*) AS n FROM i_units GROUP BY doc_id),
        sz_e AS (SELECT doc_id, COUNT(*) AS n FROM e_units GROUP BY doc_id),
        inter AS (
            SELECT c.id_i, c.id_e, COUNT(*) AS n_common
            FROM cand c
            JOIN i_units ui ON ui.doc_id = c.id_i
            JOIN e_units ue ON ue.doc_id = c.id_e AND ue.tok = ui.tok
            GROUP BY c.id_i, c.id_e),
        near AS (
            SELECT DISTINCT t.id_i AS doc_id
            FROM inter t
            JOIN sz_i si ON si.doc_id = t.id_i
            JOIN sz_e se ON se.doc_id = t.id_e
            WHERE t.n_common / (si.n + se.n - t.n_common) >= 0.6)
        SELECT i.doc_id,
               CASE WHEN x.doc_id IS NOT NULL THEN 'exact_dup'
                    WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                    ELSE 'new' END AS status
        FROM inc i
        LEFT JOIN exact x ON x.doc_id = i.doc_id
        LEFT JOIN near nr ON nr.doc_id = i.doc_id
        ORDER BY i.doc_id
    """,
)
def incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) dedup — the production dedup shape
    (operators.dedup.incremental_dedup): an ingest batch (doc_id % 5 ==
    0 plays the role) checks against the existing corpus's content-hash
    set and LSH band-bucket index without any corpus re-clustering.
    Every incoming doc gets exact_dup / near_dup / new. At 100 TB the
    existing side's two index tables are precomputed sinks; here they
    derive inline from the fixture."""
    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    return (
        dedup.incremental_dedup(existing, incoming, "doc_id", "text", threshold=0.6)
        .orderBy("doc_id")
    )


@query(
    "source_overlap_matrix",
    category="llm-dedup",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT source, tok AS sh
            FROM ({_shingle_units_sql()})
                 u JOIN documents d USING (doc_id)),
        sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   COUNT(*) AS n_common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
            GROUP BY a.source, b.source)
        SELECT p.source_a, p.source_b,
               CAST(p.n_common AS BIGINT) AS n_common,
               CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) AS jaccard
        FROM pairs p
        JOIN sizes sa ON sa.source = p.source_a
        JOIN sizes sb ON sb.source = p.source_b
        ORDER BY source_a, source_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: shingle-set Jaccard between
    every pair of sources — the corpus-curation view that tells you two
    crawls are mirroring each other before you double-count them in the
    mixture. Scale shape: the join is keyed on the shingle, and each
    shingle contributes at most n_sources^2 pair rows (sources are
    enumerable, unlike documents), aggregated map-side — so the output
    is n_sources^2 rows no matter the corpus size; no per-document pair
    ever materializes."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "source", F.explode(text.shingles("text", dedup.DEFAULT_SHINGLE_N)).alias("sh")
        )
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        sh.select(F.col("source").alias("source_a"), "sh")
        .join(sh.select(F.col("source").alias("source_b"), "sh"), "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.withColumnsRenamed({"source": "source_a", "n": "n_a"})),
            "source_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed({"source": "source_b", "n": "n_b"})),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


_VOCAB_SIZE = 16


@query(
    "vocab_induction_oov",
    category="llm-text",
    oracle=f"""
        WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
        freq AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
        vocab AS (
            SELECT tok FROM freq
            QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= {_VOCAB_SIZE})
        SELECT t.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(count_if(v.tok IS NULL) AS BIGINT) AS n_oov,
               CAST(count_if(v.tok IS NULL) AS DOUBLE) / COUNT(*) AS oov_rate
        FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
        GROUP BY t.source ORDER BY t.source
    """,
)
def vocab_induction_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-cutoff vocabulary induction + per-source OOV rate —
    the first step of tokenizer training and the coverage check that
    follows it. The vocab (top `_VOCAB_SIZE` tokens, count-desc with
    deterministic tie-break) ranks over the FREQUENCY table, which is
    vocab-sized, not corpus-sized — the only corpus-wide work is the
    count groupBy and the broadcast-vocab membership join, both
    map-side combinable."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(text.tokens("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("tok"))
    vocab = (
        freq.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _VOCAB_SIZE)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    oov_count = F.count(F.when(F.col("_in_vocab").isNull(), F.lit(1)))
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            oov_count.cast("bigint").alias("n_oov"),
            (oov_count.cast("double") / F.count(F.lit(1))).alias("oov_rate"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_resize",
    category="llm-multimodal",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS n,
                   640 + octet_length(encode(text)) % 97 AS w0,
                   360 + octet_length(encode(text)) % 53 AS h0
            FROM documents),
        s AS (SELECT doc_id, w0, h0,
                     least(256.0 / w0, 256.0 / h0) AS scale
              FROM m)
        SELECT doc_id,
               'text' AS kind,
               CAST(w0 AS BIGINT) AS width_in,
               CAST(h0 AS BIGINT) AS height_in,
               CAST(floor(w0 * scale) AS BIGINT) AS width_out,
               CAST(floor(h0 * scale) AS BIGINT) AS height_out,
               md5('text:' || CAST(CAST(floor(w0 * scale) AS BIGINT) AS VARCHAR)
                   || 'x' || CAST(CAST(floor(h0 * scale) AS BIGINT) AS VARCHAR))
                   AS resized_checksum
        FROM s ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plumbing over binary payloads
    (functions.multimodal.fake_resize): mapInPandas batches compute the
    fit of header-derived source dimensions into a 256x256 box — the
    decode is the documented deterministic stand-in (no codecs in this
    container), the geometry math, Arrow batch contract, and map-side
    distribution are real. The resized payload is represented by a
    checksum of its deterministic description so the output stays
    narrow; the oracle replays the same integer-exact IEEE ops."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text").alias("kind"),
    )
    resized = multimodal.fake_resize(payloads, "doc_id", "payload", "kind")
    return resized.select(
        "doc_id",
        "kind",
        "width_in",
        "height_in",
        "width_out",
        "height_out",
        F.md5(
            F.concat(
                F.col("kind"),
                F.lit(":"),
                F.col("width_out").cast("string"),
                F.lit("x"),
                F.col("height_out").cast("string"),
            )
        ).alias("resized_checksum"),
    ).orderBy("doc_id")


@query(
    "dynamic_length_filter",
    category="llm-text",
    oracle="""
        WITH sized AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
        thr AS (
            SELECT CAST(quantile_disc(n_tokens, 0.25) AS BIGINT) AS p25
            FROM sized)
        SELECT s.doc_id, s.source, s.n_tokens, t.p25
        FROM sized s, thr t
        WHERE s.n_tokens >= t.p25
        ORDER BY s.doc_id
    """,
)
def dynamic_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative quality filtering: drop the shortest quartile,
    where the threshold is COMPUTED FROM the corpus (discrete p25 over
    an integer domain — exact and engine-agnostic, unlike interpolated
    percentiles of doubles), not hard-coded. The threshold is a 1-row
    aggregate broadcast onto the scan, so the filter stays map-side;
    at 100 TB this is one extra corpus aggregation, not a sort. The
    integer-domain discrete percentile matches DuckDB's quantile_disc
    exactly (same recipe as approx_percentile_quantities)."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source", text.token_count("text").cast("bigint").alias("n_tokens")
    )
    thr = sized.agg(
        F.expr("approx_percentile(n_tokens, 0.25, 1000000)")
        .cast("bigint")
        .alias("p25")
    )
    return (
        sized.crossJoin(F.broadcast(thr))
        .filter(F.col("n_tokens") >= F.col("p25"))
        .select("doc_id", "source", "n_tokens", "p25")
        .orderBy("doc_id")
    )


@query(
    "training_manifest_pipeline",
    category="llm-dedup",
    oracle=_CLUSTERS_SQL
    + f""" ,
        kept AS (
            SELECT d.doc_id, d.source,
                   CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
            FROM documents d
            JOIN labels l ON l.doc_id = d.doc_id AND l.doc_id = l.cluster_id
            WHERE len(string_split(d.text, ' ')) >= 20),
        mixed AS (
            SELECT * FROM kept
            WHERE md5(doc_id::VARCHAR || '|mix-v1') < CASE source
                {' '.join(f"WHEN '{s}' THEN '{t}'" for s, t in MIXTURE_THRESHOLDS.items())}
                ELSE '{_MIXTURE_DEFAULT}' END)
        SELECT doc_id, source, n_tokens,
               CAST(row_number() OVER (
                   ORDER BY md5(doc_id::VARCHAR || '|shuffle-v1'), doc_id
               ) AS BIGINT) AS shuffle_pos
        FROM mixed ORDER BY shuffle_pos
    """,
)
def training_manifest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain in ONE lazy plan — what actually runs
    before a training job reads its manifest: near-dup clustering →
    keep each cluster's representative → drop the sub-20-token tail →
    source-weighted mixture sampling (map-side md5 threshold) →
    deterministic global shuffle order (two-phase rank). Every stage is
    the scale-shaped variant already proven green on its own; the
    composition shows they chain without materialization barriers —
    Catalyst plans the whole manifest as one DAG."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup.dedup_clusters(docs, "doc_id", "text", threshold=0.6)
    reps = clusters.filter(F.col("id") == F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    kept = (
        docs.join(reps, "doc_id")
        .filter(text.token_count("text") >= 20)
        .select(
            "doc_id", "source", text.token_count("text").cast("bigint").alias("n_tokens")
        )
    )
    thr = F.lit(_MIXTURE_DEFAULT)
    for s, t in reversed(MIXTURE_THRESHOLDS.items()):
        thr = F.when(F.col("source") == s, F.lit(t)).otherwise(thr)
    mixed = kept.filter(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix-v1"))) < thr
    )
    return (
        _shuffle_positions(mixed, "doc_id", "|shuffle-v1")
        .select("doc_id", "source", "n_tokens", "shuffle_pos")
        .orderBy("shuffle_pos")
    )


@query(
    "event_sessions_gaps_islands",
    category="relational-window",
    oracle="""
        WITH o AS (
            SELECT user_id, event_id, ts, value,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events),
        s AS (SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                             THEN 1 ELSE 0 END AS is_new
              FROM o),
        n AS (SELECT *, SUM(is_new) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) AS session_seq
              FROM s)
        SELECT user_id,
               CAST(session_seq AS BIGINT) AS session_seq,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM n GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
)
def event_sessions_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization — the window-function encoding of
    sessions (new session when >30 min elapses since the user's previous
    event), complementary to the built-in session_window aggregation:
    one lag + one running sum over the same (user, time) window, then a
    per-session rollup. Both windows share one partitioning, so the
    whole query is a single shuffle on user_id. Gap math in integer
    microseconds (unix_micros / epoch_us — identical after the
    catalog's ns→µs truncation); value sums accumulate as DECIMAL so
    partitioning can't reorder float addition."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = ev.withColumn("session_seq", F.sum(is_new).over(wc))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("bigint").alias("session_seq"),
            "n_events",
            "session_start",
            "session_end",
            "total_value",
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "funnel_conversion_steps",
    category="relational-window",
    oracle="""
        WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS t2
              FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
              WHERE e.event_type = 'click' GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS t3
              FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
              WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT step, n_users FROM (
            SELECT 1 AS ord, 'view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
            UNION ALL
            SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
            UNION ALL
            SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM p
        ) ORDER BY ord
    """,
)
def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that click — the strictly
    ordered-sequence semantics (not mere event-type membership). Three
    per-user min-aggregations chained by range-predicated joins, all
    hash-partitioned on user_id so AQE plans one exchange reused down
    the chain; the 3-row result is the classic conversion report."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def step(df: DataFrame, ord_: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(ord_).alias("ord"),
            F.lit(name).alias("step"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    return (
        step(v, 1, "view")
        .unionByName(step(c, 2, "view>click"))
        .unionByName(step(p, 3, "view>click>purchase"))
        .orderBy("ord")
        .select("step", "n_users")
    )


@query(
    "variant_functions",
    category="relational-scalar",
    oracle="""
        SELECT event_id,
               CAST(props::JSON ->> '$.k' AS BIGINT) AS k,
               CAST(NULL AS VARCHAR) AS missing_str,
               replace(props, ' ', '') AS json_compact
        FROM events ORDER BY event_id
    """,
)
def variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: parse_json → semi-structured binary
    VARIANT, path access via variant_get (shreds at the scan on
    VARIANT-aware readers — the point of the type at 100 TB is
    predicate/path pushdown without a declared schema),
    try_variant_get's NULL-on-missing behavior, and to_json
    round-tripping. The oracle reads the same paths with DuckDB's JSON
    operators (compact form compared via whitespace-stripped source —
    the fixture's props format is fixed)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_str"),
        F.to_json(v).alias("json_compact"),
    ).orderBy("event_id")


from pipeline_query_engine_demo_spark.plans.registry import REGISTRY as _REG  # noqa: E402


@query(
    "ann_recall_at_k",
    category="llm-similarity",
    oracle=f"""
        WITH gt AS ({_REG["cosine_topk_embeddings"].oracle}),
             ann AS ({_REG["ann_lsh_topk_embeddings"].oracle})
        SELECT gt.query_id,
               CAST(COUNT(ann.rank) AS BIGINT) AS hits,
               CAST(COUNT(*) AS BIGINT) AS k,
               CASE WHEN isfinite(COUNT(ann.rank) / CAST(COUNT(*) AS DOUBLE)) THEN floor((COUNT(ann.rank) / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END AS recall_at_k
        FROM gt
        LEFT JOIN ann
          ON ann.query_id = gt.query_id AND ann.vec_id = gt.vec_id
        GROUP BY gt.query_id
        ORDER BY gt.query_id
    """,
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the sign-LSH ANN index against brute-force cosine
    ground truth, per query — the evaluation harness every production
    ANN deployment runs before trading exactness for speed. Composes
    the two already-verified pipelines (their oracles are reused
    verbatim as CTEs, so this query is exactly as trustworthy as its
    parts) and reduces each query's top-10 overlap to hits/k.

    Scale shape: ground truth is the expensive branch (brute-force over
    the corpus — in production run on a SAMPLED query set, as here with
    5 probe queries); the overlap join is top-k-sized (50 rows a side),
    broadcast-trivial. Output is one row per probe query.
    """
    gt = cosine_topk_embeddings(spark, sf_dir)
    ann = ann_lsh_topk_embeddings(spark, sf_dir).select(
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


#: Media-fingerprint geometry: 16 positional stripes, 4 hex chars of
#: md5 per stripe (the 64-char fingerprint), banded 4 stripes x 4 bands
#: for the candidate join; near-dup = >= 14 of 16 stripes agree.
_FP_STRIPES = 16
_FP_SIG = 4
_FP_BANDS = 4
_FP_MIN_MATCH = 14


def _stripe_sql(i: int, dialect: str, txt: str = "text") -> str:
    """Stripe ``i``'s signature: md5 of the i-th of 16 equal positional
    byte ranges. Integer floor division spells ``//`` in DuckDB but
    ``DIV`` in Spark SQL — the only dialect split in the whole
    fingerprint expression."""
    div = "//" if dialect == "duckdb" else "DIV"
    lo = f"(({i} * length({txt})) {div} {_FP_STRIPES})"
    hi = f"((({i} + 1) * length({txt})) {div} {_FP_STRIPES})"
    return f"substr(md5(substr({txt}, {lo} + 1, {hi} - {lo})), 1, {_FP_SIG})"


_FP_CONCAT_DUCK = " || ".join(_stripe_sql(i, "duckdb") for i in range(_FP_STRIPES))
_FP_CONCAT_SPARK = " || ".join(_stripe_sql(i, "spark") for i in range(_FP_STRIPES))
_FP_MATCH_TERMS = " + ".join(
    f"(CASE WHEN substr(fa, {i * _FP_SIG} + 1, {_FP_SIG}) = "
    f"substr(fb, {i * _FP_SIG} + 1, {_FP_SIG}) THEN 1 ELSE 0 END)"
    for i in range(_FP_STRIPES)
)
_FP_PLANT_IDS = (17, 123, 401)
#: Hot-bucket cap for the band self-join — same 100 TB safety valve as
#: operators.dedup.DEFAULT_MAX_BUCKET_SIZE: a constant payload (black
#: frames, logo stills) floods one bucket with B docs and B^2 pairs; a
#: band shared by >1000 payloads carries no discriminating signal.
_FP_MAX_BUCKET = 1000


@query(
    "media_fingerprint_near_dup",
    category="llm-multimodal",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000,
                   'X' || substr(text, 2, length(text) - 1)
            FROM documents WHERE doc_id IN {_FP_PLANT_IDS}
        ),
        fp AS (
            SELECT doc_id, ({_FP_CONCAT_DUCK}) AS f
            FROM corpus WHERE length(text) >= {_FP_STRIPES * 2}
        ),
        bands_all AS (
            SELECT doc_id, f, b.b AS band,
                   substr(f, b.b * {_FP_SIG * _FP_BANDS} + 1,
                          {_FP_SIG * _FP_BANDS}) AS band_key
            FROM fp, unnest(generate_series(0, {_FP_BANDS - 1})) AS b(b)
        ),
        bands AS (
            SELECT doc_id, f, band, band_key
            FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band, band_key) AS _n
                FROM bands_all
            ) WHERE _n <= {_FP_MAX_BUCKET}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, a.f AS fa,
                            c.doc_id AS id_b, c.f AS fb
            FROM bands a JOIN bands c
              ON a.band = c.band AND a.band_key = c.band_key
             AND a.doc_id < c.doc_id
        )
        SELECT id_a, id_b,
               CAST(({_FP_MATCH_TERMS}) AS BIGINT) AS n_match
        FROM cand
        WHERE ({_FP_MATCH_TERMS}) >= {_FP_MIN_MATCH}
        ORDER BY id_a, id_b
    """,
)
def media_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-duplicate detection over opaque media
    payloads — the image/video analog of MinHash dedup: a positional
    stripe fingerprint (16 stripes x 4 hex chars; a real pipeline swaps
    the byte-stripe hash for a DCT perceptual hash — same shape),
    banded into 4 bucket keys so candidates come from a bucket
    equi-self-join (NEVER all pairs), then verified by stripe
    agreement >= 14/16. Planted single-byte mutations of 3 fixture
    payloads (length-preserving, so only stripe 0 changes) are found at
    15/16; exact dups at 16/16.

    Scale shape: fingerprints are 64 bytes/doc — the only thing
    shuffled; the band join scans ~corpus/16^16ths of the square per
    band; verification is a 16-term expression on the carried
    fingerprints, no payload re-read. The hot-bucket cap is ON by
    default (same valve as operators.dedup.DEFAULT_MAX_BUCKET_SIZE,
    same one-shuffle window-count form): a constant payload — black
    frames, logo stills — would otherwise put B^2 pairs from one
    bucket on one reducer."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (
        docs.filter(F.col("doc_id").isin(*_FP_PLANT_IDS))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.lit("X"), F.expr("substr(text, 2, length(text) - 1)")
            ).alias("text"),
        )
    )
    corpus = docs.unionAll(planted)
    fp = corpus.filter(F.length("text") >= _FP_STRIPES * 2).select(
        "doc_id", F.expr(_FP_CONCAT_SPARK).alias("f")
    )
    bands = fp.select(
        "doc_id",
        "f",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"substr(f, {b * _FP_SIG * _FP_BANDS} + 1,"
                        f" {_FP_SIG * _FP_BANDS})"
                    )
                    for b in range(_FP_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    from pyspark.sql import Window as _W

    bucket_n = F.count(F.lit(1)).over(_W.partitionBy("band", "band_key"))
    bands = (
        bands.withColumn("_n", bucket_n)
        .filter(F.col("_n") <= _FP_MAX_BUCKET)
        .drop("_n")
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("f").alias("fa"), "band", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("f").alias("fb"), "band", "band_key"
    )
    cand = (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "fa", "id_b", "fb")
        .distinct()
    )
    n_match = F.expr(_FP_MATCH_TERMS)
    return (
        cand.withColumn("n_match", n_match.cast("bigint"))
        .filter(F.col("n_match") >= _FP_MIN_MATCH)
        .select("id_a", "id_b", "n_match")
        .orderBy("id_a", "id_b")
    )


@query(
    "tokenizer_fertility_by_source",
    category="llm-text",
    oracle=f"""
        WITH per_doc AS (
            SELECT source,
                   len(string_split(text, ' ')) AS ws,
                   len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe
            FROM documents
        )
        SELECT source,
               CAST(SUM(ws) AS BIGINT) AS ws_tokens,
               CAST(SUM(bpe) AS BIGINT) AS bpeish_tokens,
               {sql_round_half_up('CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE)', 6)}
                   AS fertility
        FROM per_doc GROUP BY source ORDER BY source
    """,
)
def tokenizer_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE-ish tokens per whitespace word) per
    source — the metric that decides whether a tokenizer is efficient
    on a corpus slice (fertility creep on a domain means its text is
    being shredded into too many pieces, inflating training cost for
    the same content). Uses the same two counters as token_count_bpeish,
    aggregated per source.

    Scale shape: both token counts are map-side regexes inside codegen;
    one combinable groupBy on source; output is source-count-sized.
    The ratio divides two exact BIGINT sums in double, so both engines
    produce the identical IEEE value."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        text.token_count("text").alias("ws"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).alias(
            "bpe"
        ),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("ws").cast("bigint").alias("ws_tokens"),
            F.sum("bpe").cast("bigint").alias("bpeish_tokens"),
            round_half_up(
                F.sum("bpe").cast("double") / F.sum("ws").cast("double"), 6
            ).alias("fertility"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Preference-pair construction + shingle novelty
# --------------------------------------------------------------------------

#: The quality_score(text, STOPWORDS) expression as DuckDB SQL — kept in
#: lockstep with functions.text.quality_score (same operand doubles, same
#: operation order, deliberately unrounded; see text_stats_docs).
_QUALITY_SQL = (
    "len(list_distinct(string_split(text, ' '))) / "
    "len(string_split(text, ' ')) * 0.5 "
    f"+ len(list_filter(string_split(text, ' '), t -> t IN ({_STOPWORDS_SQL}))) / "
    "len(string_split(text, ' ')) * 0.2 "
    "+ (len(string_split(text, ' ')) >= 10)::INT::DOUBLE * 0.3"
)


@query(
    "preference_pairs_rlhf",
    category="llm-curation",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, source, {_QUALITY_SQL} AS quality FROM documents
        ),
        ranked AS (
            SELECT doc_id, source, quality,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY quality DESC, doc_id) AS rn_top,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY quality ASC, doc_id) AS rn_bot
            FROM scored
        )
        SELECT t.source AS source,
               t.doc_id AS chosen_doc_id,
               b.doc_id AS rejected_doc_id,
               t.quality AS chosen_quality,
               b.quality AS rejected_quality,
               t.quality - b.quality AS quality_margin
        FROM ranked t
        JOIN ranked b ON t.source = b.source
        WHERE t.rn_top = 1 AND b.rn_bot = 1 AND t.doc_id <> b.doc_id
        ORDER BY source
    """,
)
def preference_pairs_rlhf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for reward-model / DPO training
    data: within each prompt group (source stands in for the prompt
    key), the highest-quality document becomes `chosen` and the lowest
    `rejected`, with the score margin carried for margin-weighted
    losses. Ranking is two row_number windows over the same partition
    key (one exchange, two in-partition sorts) with doc_id tie-breaks,
    so pair selection is deterministic; groups with a single document
    produce no pair.

    Scale: the per-group extremes shrink the corpus to |groups| rows
    before the self-join, so the join is group-count-sized regardless
    of corpus size — the standard shape for pairing exemplars at
    100 TB. Quality is functions.text.quality_score, the same unrounded
    double both engines compute identically (see text_stats_docs)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", text.quality_score("text", STOPWORDS).alias("quality")
    )
    w_top = Window.partitionBy("source").orderBy(F.desc("quality"), "doc_id")
    w_bot = Window.partitionBy("source").orderBy(F.asc("quality"), "doc_id")
    ranked = scored.select(
        "*",
        F.row_number().over(w_top).alias("rn_top"),
        F.row_number().over(w_bot).alias("rn_bot"),
    )
    top = ranked.filter(F.col("rn_top") == 1).select(
        "source",
        F.col("doc_id").alias("chosen_doc_id"),
        F.col("quality").alias("chosen_quality"),
    )
    bot = ranked.filter(F.col("rn_bot") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_doc_id"),
        F.col("quality").alias("rejected_quality"),
    )
    return (
        top.join(bot, "source")
        .filter(F.col("chosen_doc_id") != F.col("rejected_doc_id"))
        .select(
            "source",
            "chosen_doc_id",
            "rejected_doc_id",
            "chosen_quality",
            "rejected_quality",
            (F.col("chosen_quality") - F.col("rejected_quality")).alias(
                "quality_margin"
            ),
        )
        .orderBy("source")
    )


@query(
    "shingle_novelty_docs",
    category="llm-text",
    oracle=f"""
        WITH sh AS ({_shingle_units_sql(alias="sh")}),
        df AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY sh),
        per AS (
            SELECT s.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(COUNT(*) FILTER (WHERE d.df = 1) AS BIGINT) AS n_unique
            FROM sh s JOIN df d ON s.sh = d.sh
            GROUP BY s.doc_id
        )
        SELECT doc_id, n_shingles, n_unique,
               n_unique / n_shingles AS novelty_frac
        FROM per ORDER BY doc_id
    """,
)
def shingle_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's distinct
    3-word shingles that occur in NO other document. Low novelty marks
    boilerplate/template text worth down-weighting in a training mix —
    the inverse signal of near-dup detection (a doc can be globally
    unique yet assembled from corpus-common phrases).

    Plan: explode distinct shingles per doc, one groupBy for corpus
    document frequency (each doc contributes a shingle once, so
    COUNT(*) is the document frequency), join back on the shingle, and
    re-aggregate per doc. Two map-side-combinable shuffles on the
    shingle key plus one on doc_id; the df table is the corpus inverted
    index and both joins carry (hash, count) pairs only — the 100 TB
    shape. Uniqueness ratio is BIGINT/BIGINT, one exact double division
    per row."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(text.shingles("text", dedup.DEFAULT_SHINGLE_N))).alias(
            "sh"
        ),
    )
    df = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    per = (
        sh.join(df, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count(F.when(F.col("df") == 1, 1)).cast("bigint").alias("n_unique"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_unique",
        (F.col("n_unique") / F.col("n_shingles")).alias("novelty_frac"),
    ).orderBy("doc_id")


@query(
    "rouge2_eval_pairs",
    category="llm-text",
    oracle=f"""
        WITH {_UNITS_CTE}, {_SIGS_CTE}, {_BUCKETS_CTE}, {_CAND_CTE},
        cids AS (SELECT id_a AS doc_id FROM cand
                 UNION SELECT id_b AS doc_id FROM cand),
        bg AS ({_shingle_units_sql(
            n=2,
            source="(SELECT * FROM documents"
            " WHERE doc_id IN (SELECT doc_id FROM cids))",
            alias="bg")}),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bg
                  FROM bg GROUP BY doc_id),
        inter AS (
            SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM cand c
            JOIN bg a ON a.doc_id = c.id_a
            JOIN bg b ON b.doc_id = c.id_b AND b.bg = a.bg
            GROUP BY c.id_a, c.id_b
        )
        SELECT i.id_a, i.id_b, i.n_common,
               i.n_common / sb.n_bg AS rouge2_precision,
               i.n_common / sa.n_bg AS rouge2_recall,
               2.0 * (i.n_common / sb.n_bg) * (i.n_common / sa.n_bg)
                   / ((i.n_common / sb.n_bg) + (i.n_common / sa.n_bg)) AS rouge2_f1
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        ORDER BY id_a, id_b
    """,
)
def rouge2_eval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 precision/recall/F1 between LSH candidate pairs — the
    n-gram-overlap evaluation metric (summarization eval, distillation
    quality checks) computed at corpus scale by restricting the bigram
    join to MinHash-LSH candidates instead of all pairs. id_a plays the
    reference (recall denominator), id_b the candidate (precision
    denominator); pairs sharing zero bigrams drop out structurally.
    Ratios are exact BIGINT/BIGINT divisions and the F1 combiner is one
    identical IEEE expression tree on both engines, so no rounding is
    needed.

    Scale: candidate generation is the banded bucket self-join
    (operators.dedup.lsh_candidate_pairs — capped buckets, materialized
    bucket table); the bigram overlap join is candidate-restricted, so
    total cost tracks true-pair output, not corpus²."""
    docs = load_table(spark, sf_dir, "documents")
    # Lazy checkpoint: cand feeds three consumers (the id semi-filter
    # and both overlap joins) — without the cut each would replay the
    # whole MinHash/banding chain (same rationale as near_dup_pairs).
    cand = dedup.lsh_candidate_pairs(docs, "doc_id", "text").localCheckpoint(
        eager=False
    )
    # Only candidate documents ever need bigrams: semi-filter before the
    # explode so the overlap joins shuffle candidate-doc bigrams, not the
    # whole corpus's (candidates ~ output-sized, corpus ~ 100 TB).
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    # bg also feeds three consumers (both overlap joins + sizes); cut its
    # lineage too so the semi-join + explode runs once.
    bg = (
        docs.join(ids, "doc_id", "left_semi")
        .select(
            "doc_id", F.explode(F.array_distinct(text.shingles("text", 2))).alias("bg")
        )
        .localCheckpoint(eager=False)
    )
    sizes = bg.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_bg"))
    inter = (
        cand.join(bg.withColumnsRenamed({"doc_id": "id_a"}), "id_a")
        .join(bg.withColumnsRenamed({"doc_id": "id_b"}), ["id_b", "bg"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    joined = inter.join(
        sizes.withColumnsRenamed({"doc_id": "id_a", "n_bg": "n_a"}), "id_a"
    ).join(sizes.withColumnsRenamed({"doc_id": "id_b", "n_bg": "n_b"}), "id_b")
    p = F.col("n_common") / F.col("n_b")
    r = F.col("n_common") / F.col("n_a")
    return joined.select(
        "id_a",
        "id_b",
        "n_common",
        p.alias("rouge2_precision"),
        r.alias("rouge2_recall"),
        (F.lit(2.0) * p * r / (p + r)).alias("rouge2_f1"),
    ).orderBy("id_a", "id_b")


@query(
    "char_entropy_docs",
    category="llm-text",
    oracle=f"""
        WITH chars AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, length(text)),
                                         i -> substr(text, i, 1))) AS ch
            FROM documents
        ),
        cnts AS (
            SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM chars GROUP BY doc_id, ch
        ),
        tot AS (
            SELECT doc_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_total,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_chars
            FROM cnts GROUP BY doc_id
        ),
        terms AS (
            SELECT c.doc_id,
                   CAST({sql_round_half_up(
                       "(c.cnt / t.n_total) * ln(c.cnt / t.n_total)", 9)}
                        AS DECIMAL(28,12)) AS term
            FROM cnts c JOIN tot t ON c.doc_id = t.doc_id
        )
        SELECT t.doc_id, t.n_total, t.n_distinct_chars,
               CAST(-SUM(s.term) AS DOUBLE) AS char_entropy_nats
        FROM terms s JOIN tot t ON s.doc_id = t.doc_id
        GROUP BY t.doc_id, t.n_total, t.n_distinct_chars
        ORDER BY t.doc_id
    """,
)
def char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (nats) — the cheap
    gibberish/compression detector every quality-filter stack carries:
    natural text sits in a narrow entropy band, base64 blobs and
    repeated-character junk fall far outside it.

    Determinism: each p·ln(p) term is floor-rounded to 9 digits and
    summed as DECIMAL, so the per-document sum is exact and
    order-independent — float accumulation order (the usual
    cross-engine killer for entropy) never appears. One explode to
    (doc, char) counts, two map-side-combinable groupBys; the char
    domain is tiny so the shuffles carry ~alphabet rows per doc."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text")),
                lambda i: F.col("text").substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    cnts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = cnts.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
    )
    p = F.col("cnt") / F.col("n_total")
    terms = cnts.join(tot, "doc_id").select(
        "doc_id",
        round_half_up(p * F.log(p), 9).cast("decimal(28,12)").alias("term"),
    )
    return (
        terms.groupBy("doc_id")
        .agg((-F.sum("term")).cast("double").alias("char_entropy_nats"))
        .join(tot, "doc_id")
        .select("doc_id", "n_total", "n_distinct_chars", "char_entropy_nats")
        .orderBy("doc_id")
    )


#: BM25 retrieval constants: Robertson k1/b defaults and a fixed
#: 3-term query over the fixture vocabulary. The same literals are
#: interpolated into the DuckDB oracle.
_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "bm25_topk_docs",
    category="llm-text",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
               FROM toks GROUP BY doc_id),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(dl) AS BIGINT) AS total_tokens
                  FROM dl),
        tfc AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                FROM toks WHERE tok IN {_BM25_TERMS!r}
                GROUP BY doc_id, tok),
        dfc AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                FROM toks WHERE tok IN {_BM25_TERMS!r}
                GROUP BY tok),
        scored AS (
            SELECT t.doc_id, t.tok,
                   ln((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                      / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(t.tf AS DOUBLE) * {_BM25_K1 + 1.0!r})
                   / (CAST(t.tf AS DOUBLE) + {_BM25_K1!r}
                      * (1.0 - {_BM25_B!r} + {_BM25_B!r}
                         * CAST(l.dl AS DOUBLE)
                         / (CAST(s.total_tokens AS DOUBLE)
                            / CAST(s.n_docs AS DOUBLE)))) AS term_score
            FROM tfc t
            JOIN dfc d ON t.tok = d.tok
            JOIN dl l ON l.doc_id = t.doc_id
            CROSS JOIN stats s
        ),
        agg AS (
            SELECT doc_id,
                   SUM(CASE WHEN tok = '{_BM25_TERMS[0]}' THEN term_score END) AS s0,
                   SUM(CASE WHEN tok = '{_BM25_TERMS[1]}' THEN term_score END) AS s1,
                   SUM(CASE WHEN tok = '{_BM25_TERMS[2]}' THEN term_score END) AS s2
            FROM scored GROUP BY doc_id
        ),
        fin AS (
            SELECT doc_id,
                   CAST((CASE WHEN s0 IS NOT NULL THEN 1 ELSE 0 END)
                        + (CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END)
                        + (CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS matched_terms,
                   COALESCE(s0, 0.0) + COALESCE(s1, 0.0) + COALESCE(s2, 0.0)
                       AS score_raw
            FROM agg
        )
        SELECT doc_id, matched_terms,
               {sql_round_half_up('score_raw', 6)} AS bm25_score
        FROM fin ORDER BY bm25_score DESC, doc_id LIMIT 15
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-15 retrieval for a fixed 3-term query over an inverted
    index built from relational primitives: explode -> per-doc term
    frequencies and lengths -> document frequencies -> the
    Robertson/Lucene BM25 formula (idf = ln((N-df+0.5)/(df+0.5)+1),
    always positive). Per-doc scores sum the <=3 term contributions in
    a FIXED coalesce order (conditional aggregate per term), so the
    double addition order is engine-independent.

    Scale: the term filter prunes the exploded stream to query-term
    postings before any shuffle (the inverted-index access path); df
    and the 1-row corpus stats broadcast; no window over the corpus —
    the final top-15 is a TakeOrdered. The same plan serves a stored
    posting-list table; here the index is built in-flight."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(text.tokens("text")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
    )
    qtoks = toks.filter(F.col("tok").isin(*_BM25_TERMS))
    tfc = qtoks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfc = qtoks.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    scored = (
        tfc.join(F.broadcast(dfc), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    nd = F.col("n_docs").cast("double")
    tt = F.col("total_tokens").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    k1, b = _BM25_K1, _BM25_B
    term_score = (
        F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
        * (tfd * F.lit(k1 + 1.0))
        / (tfd + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * dld / (tt / nd)))
    )
    scored = scored.select("doc_id", "tok", term_score.alias("term_score"))
    agg = scored.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("tok") == t, F.col("term_score"))).alias(f"s{i}")
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    matched = (
        F.when(F.col("s0").isNotNull(), 1).otherwise(0)
        + F.when(F.col("s1").isNotNull(), 1).otherwise(0)
        + F.when(F.col("s2").isNotNull(), 1).otherwise(0)
    ).cast("bigint")
    score_raw = (
        F.coalesce(F.col("s0"), F.lit(0.0))
        + F.coalesce(F.col("s1"), F.lit(0.0))
        + F.coalesce(F.col("s2"), F.lit(0.0))
    )
    return (
        agg.select(
            "doc_id",
            matched.alias("matched_terms"),
            round_half_up(score_raw, 6).alias("bm25_score"),
        )
        .orderBy(F.col("bm25_score").desc(), "doc_id")
        .limit(15)
    )


@query(
    "knn_classify_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                          label AS true_label
                   FROM embeddings WHERE vec_id % 97 = 0),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        scored AS (SELECT q.query_id, c.vec_id, c.label,
                          {_COSINE_SQL} AS cosine_sim
                   FROM c CROSS JOIN q
                   WHERE c.vec_id <> q.query_id),
        top AS (SELECT * FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY cosine_sim DESC, vec_id) AS rnk
                    FROM scored)
                WHERE rnk <= 5),
        votes AS (SELECT query_id, label,
                         CAST(COUNT(*) AS BIGINT) AS votes
                  FROM top GROUP BY query_id, label),
        pred AS (SELECT query_id, label AS predicted_label, votes FROM (
                     SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY votes DESC, label) AS vr
                     FROM votes)
                 WHERE vr = 1)
        SELECT p.query_id, q.true_label, p.predicted_label, p.votes,
               (p.predicted_label = q.true_label) AS correct
        FROM pred p JOIN q ON q.query_id = p.query_id
        ORDER BY p.query_id
    """,
)
def knn_classify_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction (k=5, cosine, majority vote) for a ~1%
    deterministic query sample (vec_id % 97 == 0), self-matches
    excluded — the classification use of the similarity stack
    (operators.similarity.knn_classify). Vote ties break on the
    smaller label; `correct` compares against the held-out true label,
    so the query doubles as a labeled-recall probe of the embedding
    space. Same broadcast + salted-top-k scale shape as
    cosine_topk_embeddings."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 97 == 0)
    return similarity.knn_classify(
        emb, q, "vec_id", "embedding", "label", k=5
    ).orderBy("query_id")


def _mmr_cos_sql(a: str, b: str) -> str:
    """Guarded rounded-cosine SQL between two DOUBLE[] expressions —
    the oracle twin of vectors.cosine + round_half_up."""
    return sql_round_half_up(
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})))",
        6,
    )


@query(
    "mmr_diversified_topk",
    category="llm-similarity",
    oracle=f"""
        WITH RECURSIVE
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 3),
        c0 AS (SELECT q.query_id, e.vec_id, e.embedding::DOUBLE[] AS v,
                      {_mmr_cos_sql('e.embedding::DOUBLE[]', 'q.qv')} AS rel
               FROM embeddings e CROSS JOIN q
               WHERE e.vec_id <> q.query_id),
        cand AS (SELECT query_id, vec_id, v, rel FROM (
                     SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY rel DESC, vec_id) AS rn
                     FROM c0)
                 WHERE rn <= 20),
        pair AS (SELECT a.query_id, a.vec_id AS i, b.vec_id AS j,
                        {_mmr_cos_sql('a.v', 'b.v')} AS s
                 FROM cand a JOIN cand b
                   ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
        sel AS (
            SELECT query_id, 1 AS step, vec_id AS picked, rel AS raw_score,
                   [vec_id] AS selected
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY rel DESC, vec_id) AS rn
                  FROM cand)
            WHERE rn = 1
          UNION ALL
            SELECT s.query_id, s.step + 1, nxt.vec_id, nxt.score,
                   list_append(s.selected, nxt.vec_id)
            FROM sel s, LATERAL (
                SELECT c.vec_id,
                       CAST(0.7 AS DOUBLE) * c.rel
                       - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * (
                           SELECT MAX(p.s) FROM pair p
                           WHERE p.query_id = c.query_id
                             AND p.i = c.vec_id
                             AND list_contains(s.selected, p.j)) AS score
                FROM cand c
                WHERE c.query_id = s.query_id
                  AND NOT list_contains(s.selected, c.vec_id)
                ORDER BY score DESC, c.vec_id LIMIT 1
            ) nxt
            WHERE s.step < 5
        )
        SELECT query_id, CAST(step AS BIGINT) AS mmr_rank,
               picked AS vec_id,
               {sql_round_half_up('raw_score', 6)} AS mmr_score
        FROM sel ORDER BY query_id, mmr_rank
    """,
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 over a 20-candidate ANN pool per query
    (operators.similarity.mmr_rerank, lambda = 0.7): the greedy
    relevance-vs-redundancy re-rank every retrieval stack runs between
    ANN and the consumer. The greedy loop is sequential per query, so
    it executes in applyInPandas over the BOUNDED candidate pool;
    relevance and pairwise sims are pre-rounded Spark-side, the loop
    does only comparisons plus one lam-blend, and the DuckDB oracle
    replays the identical greedy as a recursive CTE (LATERAL argmax
    per step) — bit-for-bit parity on an iterative algorithm.

    Note the SQL writes CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE), not
    0.3: the Python operator computes 1.0 - lam in IEEE doubles
    (0.30000000000000004), while DuckDB folds bare 1.0 - 0.7 in exact
    DECIMAL to 0.3 — a one-ulp penalty-weight divergence that this
    cast forces back to the Python bits."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    return similarity.mmr_rerank(
        emb, q, "vec_id", "embedding", n_candidates=20, k=5, lam=0.7
    ).orderBy("query_id", "mmr_rank")


@query(
    "token_log_odds_by_source",
    category="llm-text",
    oracle=f"""
        WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE source IN ('src0', 'src1')
        ),
        c AS (
            SELECT tok,
                   CAST(COUNT(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c1,
                   CAST(COUNT(*) FILTER (WHERE source = 'src1') AS BIGINT) AS c2
            FROM toks GROUP BY tok
        ),
        n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                     CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        s AS (
            SELECT c.tok, c.c1, c.c2,
                   (ln((CAST(c.c1 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       / (CAST(n.n1 - c.c1 AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                    - ln((CAST(c.c2 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                         / (CAST(n.n2 - c.c2 AS DOUBLE) + CAST(0.5 AS DOUBLE))))
                   / sqrt(CAST(1.0 AS DOUBLE)
                          / (CAST(c.c1 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                          + CAST(1.0 AS DOUBLE)
                            / (CAST(c.c2 AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                       AS z_raw
            FROM c CROSS JOIN n
        )
        SELECT tok, c1, c2, {sql_round_half_up('z_raw', 6)} AS log_odds_z
        FROM s ORDER BY log_odds_z DESC, tok LIMIT 10
    """,
)
def token_log_odds_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary between two sources by smoothed log-odds
    ratio with an informative z-score (Monroe et al.'s 'Fightin'
    Words' keyness statistic, +0.5 smoothing) — the drift/keyness
    probe that surfaces which tokens make src0 read differently from
    src1, used for contamination triage and mixture debugging. Counts
    stay BIGINT to the end; the z expression evaluates on identical
    doubles (every literal CAST to DOUBLE in the oracle — bare 0.5
    would fold in DECIMAL on DuckDB).

    Scale: explode → one combinable conditional-count aggregate on the
    token vocabulary; the 1-row totals broadcast. Top-10 is a
    TakeOrdered over the vocabulary table."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    toks = docs.select("source", F.explode(text.tokens("text")).alias("tok"))
    c = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    n = c.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    j = c.crossJoin(F.broadcast(n))
    c1d = F.col("c1").cast("double")
    c2d = F.col("c2").cast("double")
    half = F.lit(0.5)
    one = F.lit(1.0)
    delta = F.log(
        (c1d + half) / ((F.col("n1") - F.col("c1")).cast("double") + half)
    ) - F.log((c2d + half) / ((F.col("n2") - F.col("c2")).cast("double") + half))
    z = delta / F.sqrt(one / (c1d + half) + one / (c2d + half))
    return (
        j.select("tok", "c1", "c2", round_half_up(z, 6).alias("log_odds_z"))
        .orderBy(F.col("log_odds_z").desc(), "tok")
        .limit(10)
    )


#: Positional discount literals for nDCG@10: 1/log2(rank+1), folded to
#: Python doubles once so BOTH engines consume the identical constants
#: (no runtime ln/log2 divergence possible). IDCG is the ideal DCG of
#: graded gains 10..1 — a pure constant for a fixed k.
import math as _math  # noqa: E402

_NDCG_K = 10
_NDCG_DISCOUNTS = [1.0 / _math.log2(i + 1.0) for i in range(1, _NDCG_K + 1)]
_NDCG_IDCG = sum(
    (_NDCG_K + 1 - i) * d for i, d in enumerate(_NDCG_DISCOUNTS, start=1)
)


@query(
    "ann_ndcg_at_k",
    category="llm-similarity",
    oracle=f"""
        WITH gt AS ({_REG["cosine_topk_embeddings"].oracle}),
             ann AS ({_REG["ann_lsh_topk_embeddings"].oracle}),
        g AS (
            SELECT ann.query_id, ann.rank,
                   COALESCE({_NDCG_K + 1} - gt.rank, 0) AS gain
            FROM ann LEFT JOIN gt
              ON gt.query_id = ann.query_id AND gt.vec_id = ann.vec_id
        ),
        p AS (
            SELECT query_id,
                   {", ".join(
                       f"MAX(CASE WHEN rank = {i} THEN gain END) AS g{i}"
                       for i in range(1, _NDCG_K + 1))}
            FROM g GROUP BY query_id
        ),
        d AS (
            SELECT query_id,
                   ({" + ".join(
                       f"COALESCE(g{i}, 0) * CAST({d!r} AS DOUBLE)"
                       for i, d in enumerate(_NDCG_DISCOUNTS, start=1))})
                       AS dcg
            FROM p
        )
        SELECT query_id,
               {sql_round_half_up('dcg', 6)} AS dcg_at_k,
               {sql_round_half_up(f'dcg / CAST({_NDCG_IDCG!r} AS DOUBLE)', 6)}
                   AS ndcg_at_k
        FROM d ORDER BY query_id
    """,
)
def ann_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the sign-LSH ANN index against brute-force cosine
    ground truth — the rank-sensitive companion to ann_recall_at_k
    (recall treats all top-10 slots equally; nDCG pays more for
    getting the top of the list right). Gains are integer (11 - true
    rank, 0 for misses), positional discounts 1/log2(rank+1) are
    PRE-FOLDED Python literals embedded in both engines, and the DCG
    sums its 10 per-rank terms in one fixed coalesce chain — no
    runtime transcendentals, no float summation-order hazard. IDCG for
    fixed k is a constant, so nDCG is one more literal division.

    Scale shape: composes two verified top-k pipelines; everything
    after them is top-k-sized per query."""
    gt = cosine_topk_embeddings(spark, sf_dir).select(
        "query_id", "vec_id", F.col("rank").alias("gt_rank")
    )
    ann = ann_lsh_topk_embeddings(spark, sf_dir).select(
        "query_id", "vec_id", "rank"
    )
    g = ann.join(gt, ["query_id", "vec_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce(F.lit(_NDCG_K + 1) - F.col("gt_rank"), F.lit(0)).alias("gain"),
    )
    p = g.groupBy("query_id").agg(
        *[
            F.max(F.when(F.col("rank") == i, F.col("gain"))).alias(f"g{i}")
            for i in range(1, _NDCG_K + 1)
        ]
    )
    dcg = None
    for i, disc in enumerate(_NDCG_DISCOUNTS, start=1):
        term = F.coalesce(F.col(f"g{i}"), F.lit(0)) * F.lit(disc)
        dcg = term if dcg is None else dcg + term
    d = p.select("query_id", dcg.alias("dcg"))
    return d.select(
        "query_id",
        round_half_up(F.col("dcg"), 6).alias("dcg_at_k"),
        round_half_up(F.col("dcg") / F.lit(_NDCG_IDCG), 6).alias("ndcg_at_k"),
    ).orderBy("query_id")


@query(
    "lang_id_confusion",
    category="llm-text",
    oracle=f"""
        WITH pred AS ({_REG["lang_id_docs"].oracle}),
        j AS (
            SELECT d.lang AS true_lang, p.predicted
            FROM pred p JOIN documents d ON d.doc_id = p.doc_id
        ),
        conf AS (
            SELECT true_lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
            FROM j GROUP BY true_lang, predicted
        ),
        tot AS (
            SELECT true_lang, CAST(SUM(n) AS BIGINT) AS n_true
            FROM conf GROUP BY true_lang
        )
        SELECT c.true_lang, c.predicted, c.n,
               {sql_round_half_up(
                   'CAST(c.n AS DOUBLE) / CAST(t.n_true AS DOUBLE)', 6)}
                   AS row_frac
        FROM conf c JOIN tot t ON t.true_lang = c.true_lang
        ORDER BY c.true_lang, c.predicted
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lang_id_docs heuristic against the
    fixture's ground-truth language labels, with row-normalized
    fractions (per-language recall on the diagonal) — the evaluation
    loop that decides whether a cheap classifier is good enough to
    gate a corpus. Composes the verified lang-ID pipeline (its oracle
    is reused verbatim as a CTE); counts stay BIGINT and the row
    fraction is one exact-integer division.

    Scale: the predictor is a map-side expression over the scan; the
    confusion aggregate is |langs|² rows."""
    pred = lang_id_docs(spark, sf_dir).select("doc_id", "predicted")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    conf = (
        pred.join(docs, "doc_id")
        .groupBy("true_lang", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = conf.groupBy("true_lang").agg(
        F.sum("n").cast("bigint").alias("n_true")
    )
    return (
        conf.join(F.broadcast(tot), "true_lang")
        .select(
            "true_lang",
            "predicted",
            "n",
            round_half_up(
                F.col("n").cast("double") / F.col("n_true").cast("double"), 6
            ).alias("row_frac"),
        )
        .orderBy("true_lang", "predicted")
    )


def _hamming16_sql(a: str, b: str) -> str:
    """Fixed-order 16-term character-Hamming chain between two 16-char
    '0'/'1' signatures — pure integer adds, identical on both engines."""
    terms = " + ".join(
        f"(CASE WHEN substr({a}, {j + 1}, 1) <> substr({b}, {j + 1}, 1)"
        f" THEN 1 ELSE 0 END)"
        for j in range(16)
    )
    return f"({terms})"


@query(
    "simhash_hamming_pairs",
    category="llm-dedup",
    oracle=f"""
        WITH sig0 AS ({_REG["simhash_docs"].oracle}),
        sig AS (SELECT * FROM sig0 WHERE doc_id < 1000)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST({_hamming16_sql('a.simhash', 'b.simhash')} AS BIGINT)
                   AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE {_hamming16_sql('a.simhash', 'b.simhash')} <= 3
        ORDER BY id_a, id_b
    """,
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs at Hamming distance <= 3 over the
    16-bit signatures, found the scale way: the signature splits into
    4 bands of 4 bits and candidates come from a band equi-self-join —
    by pigeonhole, any pair within distance 3 agrees exactly on at
    least one band, so banding is RECALL-LOSSLESS for this radius.
    The oracle is the opposite construction (brute-force all-pairs
    theta join with the same fixed-order character-Hamming chain), so
    the gate independently proves the banded plan drops nothing. The
    query runs on a bounded slice (doc_id < 1000) purely to keep the
    QUADRATIC ORACLE affordable — the banded Spark plan itself needs no
    slice (tests/test_retrieval_ext verifies banding-vs-brute-force
    equality on the full small-SF corpus).

    Scale: candidates are bucketed (4 × 2^4 band values here; 64-bit
    production signatures band into 2^16 buckets), the pair set is
    DISTINCT-ed because near-identical pairs match in several bands,
    and the verify filter touches only candidates — the standard
    in-production simhash dedup shape (Manku et al., WWW'07)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 1000
    )
    sig = dedup.simhash(docs, "doc_id", "text", bits=16)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.substring("simhash", i * 4 + 1, 4).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.val")
    a = bands.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sig_a"),
        "band",
        "val",
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sig_b"),
        "band",
        "val",
    )
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = None
    for j in range(16):
        term = (
            F.substring("sig_a", j + 1, 1) != F.substring("sig_b", j + 1, 1)
        ).cast("int")
        hamming = term if hamming is None else hamming + term
    return (
        cand.select("id_a", "id_b", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_funnel_report",
    category="llm-dedup",
    oracle=_CLUSTERS_SQL
    + f""" ,
        ex AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM documents)
            WHERE rn = 1
        ),
        reps AS (SELECT doc_id FROM labels WHERE doc_id = cluster_id),
        flags AS (
            SELECT d.source,
                   CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS ex_ok,
                   CASE WHEN e.doc_id IS NOT NULL AND r.doc_id IS NOT NULL
                        THEN 1 ELSE 0 END AS nd_ok,
                   CASE WHEN e.doc_id IS NOT NULL AND r.doc_id IS NOT NULL
                             AND len(string_split(d.text, ' ')) >= 20
                        THEN 1 ELSE 0 END AS fin_ok
            FROM documents d
            LEFT JOIN ex e ON e.doc_id = d.doc_id
            LEFT JOIN reps r ON r.doc_id = d.doc_id
        ),
        agg AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_raw,
                   CAST(SUM(ex_ok) AS BIGINT) AS n_after_exact,
                   CAST(SUM(nd_ok) AS BIGINT) AS n_after_neardup,
                   CAST(SUM(fin_ok) AS BIGINT) AS n_final
            FROM flags GROUP BY source
        )
        SELECT source, n_raw, n_after_exact, n_after_neardup, n_final,
               {sql_round_half_up(
                   'CAST(n_final AS DOUBLE) / CAST(n_raw AS DOUBLE)', 6)}
                   AS retention
        FROM agg ORDER BY source
    """,
)
def dedup_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup funnel: raw → exact-dedup survivors (first
    doc per content hash) → near-dup cluster representatives → length
    filter, with end-to-end retention — the observability report a
    curation pipeline publishes per run so a source silently losing
    90% of its documents gets noticed. Stage predicates are computed
    once on the full corpus and intersected (standard funnel
    semantics); counts are monotone non-increasing by construction,
    asserted in tests.

    Scale: one content-hash window (hash-partitioned, never global),
    the verified near-dup pipeline it composes, two survivor joins,
    and a source-sized aggregate."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    flagged = docs.select(
        "source",
        "doc_id",
        "text",
        (F.row_number().over(w) == 1).alias("ex_ok"),
    )
    clusters = dedup.dedup_clusters(docs, "doc_id", "text", threshold=0.6)
    reps = clusters.filter(F.col("id") == F.col("cluster_id")).select(
        F.col("id").alias("doc_id"), F.lit(True).alias("is_rep")
    )
    j = flagged.join(reps, "doc_id", "left").select(
        "source",
        F.col("ex_ok").cast("int").alias("ex_ok"),
        (F.col("ex_ok") & F.col("is_rep").isNotNull())
        .cast("int")
        .alias("nd_ok"),
        (
            F.col("ex_ok")
            & F.col("is_rep").isNotNull()
            & (text.token_count("text") >= 20)
        )
        .cast("int")
        .alias("fin_ok"),
    )
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.sum("ex_ok").cast("bigint").alias("n_after_exact"),
        F.sum("nd_ok").cast("bigint").alias("n_after_neardup"),
        F.sum("fin_ok").cast("bigint").alias("n_final"),
    )
    return agg.select(
        "source",
        "n_raw",
        "n_after_exact",
        "n_after_neardup",
        "n_final",
        round_half_up(
            F.col("n_final").cast("double") / F.col("n_raw").cast("double"), 6
        ).alias("retention"),
    ).orderBy("source")


def _ivf_oracle_sql(nprobe: int) -> str:
    """The ivf_topk_embeddings oracle parameterized by nprobe (same
    one-hot-centroid coordinate reduction, same tie-breaks)."""
    return f"""
        WITH c AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   CASE WHEN embedding[1] >= embedding[2] AND embedding[1] >= embedding[3]
                             AND embedding[1] >= embedding[4] THEN 0
                        WHEN embedding[2] >= embedding[3] AND embedding[2] >= embedding[4] THEN 1
                        WHEN embedding[3] >= embedding[4] THEN 2
                        ELSE 3 END AS cell
            FROM embeddings
        ),
        qs AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                   unnest([
                       struct_pack(cell := 0, s := embedding[1]::DOUBLE),
                       struct_pack(cell := 1, s := embedding[2]::DOUBLE),
                       struct_pack(cell := 2, s := embedding[3]::DOUBLE),
                       struct_pack(cell := 3, s := embedding[4]::DOUBLE)
                   ]) AS t
            FROM embeddings WHERE vec_id < 5
        ),
        qcells AS (
            SELECT query_id, qv, t.cell AS cell
            FROM qs
            QUALIFY row_number() OVER (PARTITION BY query_id
                                       ORDER BY t.s DESC, t.cell) <= {nprobe}
        ),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   {_COSINE_SQL} AS cosine_sim
            FROM c JOIN qcells q ON c.cell = q.cell
        ),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= 10
    """


@query(
    "ivf_recall_vs_probes",
    category="llm-similarity",
    oracle=f"""
        WITH gt AS ({_REG["cosine_topk_embeddings"].oracle}),
        a1 AS ({_ivf_oracle_sql(1)}),
        a2 AS ({_ivf_oracle_sql(2)}),
        a4 AS ({_ivf_oracle_sql(4)}),
        ann AS (
            SELECT CAST(1 AS INTEGER) AS nprobe, query_id, vec_id FROM a1
            UNION ALL
            SELECT CAST(2 AS INTEGER), query_id, vec_id FROM a2
            UNION ALL
            SELECT CAST(4 AS INTEGER), query_id, vec_id FROM a4
        ),
        probes AS (SELECT CAST(unnest([1, 2, 4]) AS INTEGER) AS nprobe),
        g AS (
            SELECT p.nprobe, gt.query_id, gt.vec_id
            FROM gt CROSS JOIN probes p
        ),
        j AS (
            SELECT g.nprobe, g.query_id,
                   CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM g LEFT JOIN ann a
              ON a.nprobe = g.nprobe AND a.query_id = g.query_id
                 AND a.vec_id = g.vec_id
        )
        SELECT nprobe, query_id,
               CAST(SUM(hit) AS BIGINT) AS hits,
               CAST(COUNT(*) AS BIGINT) AS k,
               {sql_round_half_up(
                   'CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)', 6)}
                   AS recall_at_k
        FROM j GROUP BY nprobe, query_id
        ORDER BY nprobe, query_id
    """,
)
def ivf_recall_vs_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall/cost curve: recall@10 against brute-force ground
    truth at nprobe ∈ {1, 2, 4} — the measurement that picks the
    operating point of every IVF deployment (nprobe=4 probes all 4
    cells, so its recall is exactly 1.0 and anchors the curve). Each
    arm composes the already-verified IVF pipeline at a different
    probe count; arms run as one unioned plan.

    Scale shape: ground truth over a sampled query set (5 probes); the
    per-arm overlap joins are top-k-sized."""
    gt = cosine_topk_embeddings(spark, sf_dir).select("query_id", "vec_id")
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    arms = None
    for p in (1, 2, 4):
        arm = similarity.ivf_topk(
            emb, q, "vec_id", "embedding", IVF_CENTROIDS, k=10, nprobe=p
        ).select(
            F.lit(p).cast("int").alias("nprobe"),
            "query_id",
            "vec_id",
            F.lit(1).alias("hit"),
        )
        arms = arm if arms is None else arms.unionByName(arm)
    probes = spark.createDataFrame([(1,), (2,), (4,)], "nprobe int")
    g = gt.crossJoin(F.broadcast(probes))
    j = g.join(arms, ["nprobe", "query_id", "vec_id"], "left")
    return (
        j.groupBy("nprobe", "query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("hits"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
            round_half_up(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("recall_at_k"),
        )
        .orderBy("nprobe", "query_id")
    )


@query(
    "heaps_law_vocab_growth",
    category="llm-text",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        first_seen AS (
            SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS first_doc
            FROM toks GROUP BY tok
        ),
        doc_tok AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
            FROM toks GROUP BY doc_id
        ),
        checkpoints AS (
            SELECT CAST(unnest([100, 200, 300, 400, 500]) AS BIGINT) AS c
        )
        SELECT cp.c AS n_docs_prefix,
               (SELECT CAST(SUM(n_toks) AS BIGINT) FROM doc_tok
                WHERE doc_id < cp.c) AS n_tokens,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM first_seen
                WHERE first_doc < cp.c) AS vocab_size
        FROM checkpoints cp
        ORDER BY n_docs_prefix
    """,
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law): distinct-token count at
    doc-id-prefix checkpoints, computed WITHOUT re-scanning per
    checkpoint — each token contributes only its FIRST-appearance
    doc_id (a min aggregate), and every checkpoint then counts tokens
    whose first appearance precedes it. The sub-linearity of this
    curve is the sanity check that a corpus is natural text rather
    than noise (vocab ~ tokens^beta, beta < 1), and its flattening
    point sizes tokenizer vocab budgets.

    Scale: one explode + two combinable aggregates + a 5-row
    checkpoint probe — the per-checkpoint work is a filtered count of
    the token-vocabulary table, never a corpus re-scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(text.tokens("text")).alias("tok"))
    first_seen = toks.groupBy("tok").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    doc_tok = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks")
    )
    cps = spark.createDataFrame([(c,) for c in (100, 200, 300, 400, 500)], "c long")
    tok_counts = (
        doc_tok.crossJoin(F.broadcast(cps))
        .filter(F.col("doc_id") < F.col("c"))
        .groupBy("c")
        .agg(F.sum("n_toks").cast("bigint").alias("n_tokens"))
    )
    vocab_counts = (
        first_seen.crossJoin(F.broadcast(cps))
        .filter(F.col("first_doc") < F.col("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_size"))
    )
    return (
        cps.join(tok_counts, "c", "left")
        .join(vocab_counts, "c", "left")
        .select(
            F.col("c").alias("n_docs_prefix"), "n_tokens", "vocab_size"
        )
        .orderBy("n_docs_prefix")
    )


@query(
    "dataset_card_summary",
    category="llm-text",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        per_doc AS (
            SELECT d.doc_id, d.lang, d.source, d.text,
                   CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks
            FROM documents d
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
            FROM per_doc
        ),
        v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size
              FROM toks)
        SELECT s.n_docs, s.n_tokens, v.vocab_size, s.n_langs, s.n_sources,
               {sql_round_half_up(
                   'CAST(s.n_docs - s.n_unique_texts AS DOUBLE)'
                   ' / CAST(s.n_docs AS DOUBLE)', 6)} AS exact_dup_rate,
               {sql_round_half_up(
                   'CAST(s.n_tokens AS DOUBLE) / CAST(s.n_docs AS DOUBLE)',
                   6)} AS mean_doc_tokens,
               {sql_round_half_up(
                   'CAST(v.vocab_size AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)',
                   6)} AS type_token_ratio
        FROM s CROSS JOIN v
    """,
)
def dataset_card_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dataset card: corpus size, token count, vocabulary,
    language/source cardinalities, exact-duplicate rate, mean document
    length, and type-token ratio — the header block of every dataset
    release document, computed in one pass plus a vocabulary count.
    All counts BIGINT; three exact-integer ratios.

    Scale: combinable aggregates + two COUNT(DISTINCT)s (hash +
    partial-distinct shuffles); swap approx_count_distinct in at
    extreme cardinalities — same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(text.tokens("text")).alias("tok"))
    s = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(text.token_count("text")).cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_unique_texts"),
    )
    v = toks.agg(F.countDistinct("tok").cast("bigint").alias("vocab_size"))
    j = s.crossJoin(F.broadcast(v))
    return j.select(
        "n_docs",
        "n_tokens",
        "vocab_size",
        "n_langs",
        "n_sources",
        round_half_up(
            (F.col("n_docs") - F.col("n_unique_texts")).cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("exact_dup_rate"),
        round_half_up(
            F.col("n_tokens").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("mean_doc_tokens"),
        round_half_up(
            F.col("vocab_size").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("type_token_ratio"),
    )


#: RRF smoothing constant (Cormack et al. 2009's k=60 — the standard).
_RRF_K = 60


@query(
    "rrf_hybrid_retrieval",
    category="llm-text",
    oracle=f"""
        WITH bm AS ({_REG["bm25_topk_docs"].oracle}),
        bmr AS (
            SELECT doc_id, row_number() OVER (
                ORDER BY bm25_score DESC, doc_id) AS rank_bm25
            FROM bm
        ),
        toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
        nt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks
               GROUP BY doc_id),
        inter AS (
            SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS i
            FROM toks t WHERE t.tok IN {_BM25_TERMS!r}
            GROUP BY t.doc_id
        ),
        jac AS (
            SELECT nt.doc_id,
                   CAST(COALESCE(i.i, 0) AS DOUBLE)
                   / CAST(nt.n + {len(_BM25_TERMS)} - COALESCE(i.i, 0)
                          AS DOUBLE) AS jscore
            FROM nt LEFT JOIN inter i ON i.doc_id = nt.doc_id
        ),
        jr AS (
            SELECT doc_id, row_number() OVER (
                ORDER BY jscore DESC, doc_id) AS rank_jacc
            FROM jac ORDER BY jscore DESC, doc_id LIMIT 15
        ),
        fused AS (
            SELECT COALESCE(b.doc_id, j.doc_id) AS doc_id,
                   b.rank_bm25, j.rank_jacc,
                   COALESCE(1.0 / ({_RRF_K}.0 + CAST(b.rank_bm25 AS DOUBLE)), 0.0)
                   + COALESCE(1.0 / ({_RRF_K}.0 + CAST(j.rank_jacc AS DOUBLE)), 0.0)
                       AS raw
            FROM bmr b FULL OUTER JOIN jr j ON j.doc_id = b.doc_id
        )
        SELECT doc_id, rank_bm25, rank_jacc,
               {sql_round_half_up('raw', 9)} AS rrf_score
        FROM fused ORDER BY raw DESC, doc_id LIMIT 10
    """,
)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009,
    the standard fusion in today's BM25-plus-dense stacks): two
    retrievers rank the same corpus for the same query — the BM25
    top-15 (bm25_topk_docs, composed verbatim) and a Jaccard retriever
    (query-term set vs distinct-token set, the set-overlap proxy for a
    second scoring model with DIFFERENT length normalization, so the
    two rankings genuinely disagree) — and fuse as
    Σ 1/(k + rank) with k={_RRF_K}, absent-from-a-list contributing 0.
    Top-10 fused docs with both source ranks exposed (NULL when a doc
    appeared in only one list).

    RRF is the scale-correct fusion: it consumes only RANKS, so the
    two retrievers never need score calibration, and each list is
    already top-k-bounded before the full-outer fusion join — at
    100 TB the fusion stage touches 2k rows per query regardless of
    corpus size.

    Determinism: ranks are integers with doc_id tiebreaks; the fused
    score is a fixed-order two-term sum of exact-input divisions —
    identical IEEE on both engines, hash-compared raw."""
    from pyspark.sql import Window

    bm = bm25_topk_docs(spark, sf_dir)
    bmr = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_score").desc(), "doc_id"))
        .alias("rank_bm25"),
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    nt = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    inter = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    jscore = F.coalesce(F.col("i"), F.lit(0)).cast("double") / (
        F.col("n") + F.lit(len(_BM25_TERMS)) - F.coalesce(F.col("i"), F.lit(0))
    ).cast("double")
    jac = nt.join(inter, "doc_id", "left").select("doc_id", jscore.alias("jscore"))
    jr = (
        jac.orderBy(F.col("jscore").desc(), "doc_id")
        .limit(15)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("jscore").desc(), "doc_id"))
            .alias("rank_jacc"),
        )
    )
    raw = F.coalesce(
        F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("rank_bm25").cast("double")),
        F.lit(0.0),
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("rank_jacc").cast("double")),
        F.lit(0.0),
    )
    return (
        bmr.join(jr, "doc_id", "full_outer")
        .select(
            "doc_id",
            "rank_bm25",
            "rank_jacc",
            raw.alias("_raw"),
        )
        .orderBy(F.col("_raw").desc(), "doc_id")
        .limit(10)
        .select(
            "doc_id",
            "rank_bm25",
            "rank_jacc",
            round_half_up(F.col("_raw"), 9).alias("rrf_score"),
        )
    )


@query(
    "ann_multiprobe_topk_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH qh AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                           {_BUCKET_SQL} AS home
                    FROM embeddings WHERE vec_id < 5),
        q AS (SELECT query_id, qv, xor(home, m.mask) AS bucket
              FROM qh, LATERAL (SELECT unnest([0, 1, 2, 4, 8]) AS mask) m),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_BUCKET_SQL} AS bucket
              FROM embeddings),
        scored AS (SELECT q.query_id, c.vec_id, {_COSINE_SQL} AS cosine_sim
                   FROM c JOIN q ON c.bucket = q.bucket),
        ranked AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, cosine_sim, rank
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def ann_multiprobe_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-10 (Lv et al., VLDB'07 — see
    operators.similarity.ann_topk_multiprobe): each query scores its
    home bucket plus the 4 Hamming-distance-1 buckets, raising recall
    toward brute force (asserted >= the single-probe recall in tests)
    while the scanned fraction grows only 1/16 -> 5/16 — the recall
    dial that does NOT rebuild the index. Probe buckets are pairwise
    distinct and corpus rows live in one bucket, so no candidate is
    scored twice; the fan-out multiplies only the broadcast query
    side."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_topk_multiprobe(
        emb, q, "vec_id", "embedding", k=10, dims=(0, 7, 21, 42)
    ).orderBy("query_id", "rank")


_ZIPF_TOP = 1000
_ZIPF_DSUM = (
    "CAST(SUM(CAST(CASE WHEN isfinite({e}) THEN floor(({e}) * 1000000000.0"
    " + 0.5) / 1000000000.0 END AS DECIMAL(28,12))) AS DOUBLE)"
)


@query(
    "zipf_rank_frequency_fit",
    category="llm-text",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
                FROM toks GROUP BY tok),
        top AS (SELECT tok, c,
                       row_number() OVER (ORDER BY c DESC, tok) AS r
                FROM cnt ORDER BY c DESC, tok LIMIT {_ZIPF_TOP}),
        terms AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
                         ln(CAST(c AS DOUBLE)) AS y
                  FROM top),
        s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     {_ZIPF_DSUM.format(e="x")} AS sx,
                     {_ZIPF_DSUM.format(e="y")} AS sy,
                     {_ZIPF_DSUM.format(e="x * y")} AS sxy,
                     {_ZIPF_DSUM.format(e="x * x")} AS sxx,
                     {_ZIPF_DSUM.format(e="y * y")} AS syy
              FROM terms)
        SELECT n AS n_ranks,
               {sql_round_half_up(
                   "(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)} AS slope,
               {sql_round_half_up(
                   "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)"
                   " / n", 6)} AS intercept,
               {sql_round_half_up(
                   "((n * sxy - sx * sy) * (n * sxy - sx * sy))"
                   " / ((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)}
                   AS r2
        FROM s
    """,
)
def zipf_rank_frequency_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS of ln(frequency) on ln(rank) over the top
    1000 corpus token ranks — the rank-frequency twin of
    heaps_law_vocab_growth (slope ≈ −1 for natural language; a far
    shallower or steeper slope flags template spam or truncated
    vocabularies before tokenizer training). Fitting the HEAD is
    standard practice (the unigram tail departs from the power law)
    and is also what makes the plan scale: top-k, never a full-vocab
    rank.

    Determinism: every logarithm both engines take is ln of the SAME
    integer; the quadratic sums use the order-independent round9 →
    DECIMAL(28,12) recipe, then slope/intercept/r² are closed-form
    doubles from six scalars, gate-hashed raw.

    Scale: token counting is one combinable aggregate; the top-1000
    cut compiles to TakeOrderedAndProject (per-partition k-heaps, a
    k·partitions driver merge — no global sort). Ranks attach on the
    1000-row result via the bucketed two-phase row_number, and the
    OLS is a 1000-row aggregate."""
    from pipeline_query_engine_demo_spark.plans.analytics import (
        _bucketed_row_number,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(text.tokens("text")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = (
        cnt.orderBy(F.col("c").desc(), "tok")
        .limit(_ZIPF_TOP)
        .withColumn("negc", -F.col("c"))
    )
    ranked = _bucketed_row_number(top, "negc", "tok", F.col("negc"), "r")
    terms = ranked.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )

    def _dsum(col):
        return F.sum(round_half_up(col, 9).cast("decimal(28,12)")).cast("double")

    s = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum(F.col("x")).alias("sx"),
        _dsum(F.col("y")).alias("sy"),
        _dsum(F.col("x") * F.col("y")).alias("sxy"),
        _dsum(F.col("x") * F.col("x")).alias("sxx"),
        _dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return s.select(
        F.col("n").alias("n_ranks"),
        round_half_up(slope, 6).alias("slope"),
        round_half_up((F.col("sy") - slope * F.col("sx")) / n, 6).alias(
            "intercept"
        ),
        round_half_up((cov * cov) / (varx * vary), 6).alias("r2"),
    )


_PMI_TOP_TOKENS = 100
_PMI_MIN_CO = 5
_PMI_TOP_PAIRS = 30


@query(
    "pmi_token_cooccurrence",
    category="llm-text",
    oracle=f"""
        WITH dt AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents),
        df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY tok),
        top AS (SELECT tok, c FROM df
                ORDER BY c DESC, tok LIMIT {_PMI_TOP_TOKENS}),
        dtt AS (SELECT dt.doc_id, dt.tok, top.c
                FROM dt JOIN top ON top.tok = dt.tok),
        n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS v
              FROM documents),
        co AS (
            SELECT a.tok AS tok_a, b.tok AS tok_b,
                   MAX(a.c) AS c_a, MAX(b.c) AS c_b,
                   CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM dtt a JOIN dtt b
              ON b.doc_id = a.doc_id AND a.tok < b.tok
            GROUP BY a.tok, b.tok)
        SELECT tok_a, tok_b, c_ab,
               {sql_round_half_up(
                   "ln(CAST(n.v * c_ab AS DOUBLE)"
                   " / CAST(c_a * c_b AS DOUBLE))", 6)} AS pmi
        FROM co CROSS JOIN n
        WHERE c_ab >= {_PMI_MIN_CO}
        ORDER BY ln(CAST(n.v * c_ab AS DOUBLE) / CAST(c_a * c_b AS DOUBLE))
                 DESC, tok_a, tok_b
        LIMIT {_PMI_TOP_PAIRS}
    """,
)
def pmi_token_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs (document-level
    co-occurrence of the top {_PMI_TOP_TOKENS} document-frequency
    tokens): PMI = ln(N·c_ab / (c_a·c_b)) — the classic collocation /
    word-association score (Church & Hanks 1990) that seeds phrase
    mining and embedding evaluation; distinct from
    mutual_information_source_lang, which scores two CATEGORICAL
    columns, not item pairs. Pairs with support ≥ {_PMI_MIN_CO} rank
    by PMI; top {_PMI_TOP_PAIRS} emitted.

    Determinism: every PMI is ln of ONE quotient of exact BIGINT
    products, identical IEEE on both engines; ordering ties break on
    the token pair.

    Scale: document-frequency counting is combinable; the restriction
    to a top-k vocabulary (TakeOrderedAndProject + broadcast semi
    join) bounds the pair join's fan-out per document at k, so the
    co-occurrence shuffle is O(docs · k²_present) with k fixed —
    never vocabulary × vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(text.tokens("text"))).alias("tok")
    )
    df_ = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = df_.orderBy(F.col("c").desc(), "tok").limit(_PMI_TOP_TOKENS)
    dtt = dt.join(F.broadcast(top), "tok").select("doc_id", "tok", "c")
    n = docs.agg(F.count_distinct("doc_id").cast("bigint").alias("v"))
    a = dtt.select(
        F.col("doc_id"), F.col("tok").alias("tok_a"), F.col("c").alias("ca")
    )
    b = dtt.select(
        F.col("doc_id"), F.col("tok").alias("tok_b"), F.col("c").alias("cb")
    )
    co = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.max("ca").alias("c_a"),
            F.max("cb").alias("c_b"),
            F.count(F.lit(1)).cast("bigint").alias("c_ab"),
        )
    )
    pmi = F.log(
        (F.col("v") * F.col("c_ab")).cast("double")
        / (F.col("c_a") * F.col("c_b")).cast("double")
    )
    return (
        co.crossJoin(F.broadcast(n))
        .filter(F.col("c_ab") >= _PMI_MIN_CO)
        .withColumn("pmi_raw", pmi)
        .orderBy(F.col("pmi_raw").desc(), "tok_a", "tok_b")
        .limit(_PMI_TOP_PAIRS)
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            round_half_up(F.col("pmi_raw"), 6).alias("pmi"),
        )
    )


# --------------------------------------------------------------------------
# BPE tokenizer training: iterative pair-merge learning over the vocabulary
# --------------------------------------------------------------------------

#: Learned merge rounds. Each round is one vocabulary-sized pair count
#: + a 1-row argmax + one merge application — model state is the merge
#: table itself (rounds x 1 row), never corpus-sized.
_BPE_ROUNDS = 6

#: Adjacent symbol pairs of a word's current symbol array (every
#: position, overlapping included — standard BPE pair statistics).
_BPE_PAIRS = (
    "zip_with(slice(sym, 1, size(sym) - 1), slice(sym, 2, size(sym) - 1), "
    "(x, y) -> named_struct('a', x, 'b', y))"
)

#: Leftmost-first NON-overlapping application of the merge (pa, pb) to
#: the symbol array, as a single fold: carry (emitted, pending); a
#: pending pa followed by pb emits the merged symbol and clears the
#: carry, so in a run like 'aaa' only positions 1-2 merge — the exact
#: semantics of Sennrich et al.'s reference merge loop.
_BPE_MERGE = """aggregate(sym,
  named_struct('out', cast(array() as array<string>), 'pend', cast(null as string)),
  (acc, s) -> CASE
      WHEN acc.pend IS NULL THEN named_struct('out', acc.out, 'pend', s)
      WHEN acc.pend = pa AND s = pb THEN named_struct(
          'out', array_append(acc.out, concat(pa, pb)),
          'pend', cast(null as string))
      ELSE named_struct('out', array_append(acc.out, acc.pend), 'pend', s)
  END,
  acc -> CASE WHEN acc.pend IS NULL THEN acc.out
              ELSE array_append(acc.out, acc.pend) END)"""


def _bpe_round_sql(r: int) -> str:
    """One BPE learning round as DuckDB CTEs, on the POSITIONAL (word,
    pos, sym) representation — deliberately a different algorithm shape
    than the Spark fold (window-parity leftmost-nonoverlap instead of a
    sequential carry), so engine agreement is evidence, not mirroring.
    Overlapping matches chain only when a = b; within each maximal run
    of consecutive match positions the leftmost-nonoverlap winners are
    exactly the even offsets from the run start."""
    keep = f"""
        p{r} AS MATERIALIZED (
            SELECT x.sym AS a, y.sym AS b, SUM(x.wt) AS cnt
            FROM s{r} x JOIN s{r} y
              ON y.word = x.word AND y.pos = x.pos + 1
            GROUP BY 1, 2),
        t{r} AS MATERIALIZED (
            SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
        m{r} AS MATERIALIZED (
            SELECT word, pos FROM (
                SELECT word, pos,
                       pos - MIN(pos) OVER (PARTITION BY word, grp) AS off
                FROM (SELECT mm.word, mm.pos,
                             mm.pos - ROW_NUMBER() OVER (
                                 PARTITION BY mm.word ORDER BY mm.pos) AS grp
                      FROM (SELECT x.word, x.pos
                            FROM s{r} x
                            JOIN s{r} y
                              ON y.word = x.word AND y.pos = x.pos + 1
                            CROSS JOIN t{r} t
                            WHERE x.sym = t.a AND y.sym = t.b) mm) q)
            WHERE off % 2 = 0)"""
    nxt = f""",
        s{r + 1} AS MATERIALIZED (
            SELECT word, wt,
                   ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
                   sym
            FROM (SELECT s.word, s.wt, s.pos,
                         CASE WHEN m.pos IS NOT NULL THEN t.a || t.b
                              ELSE s.sym END AS sym
                  FROM s{r} s
                  CROSS JOIN t{r} t
                  LEFT JOIN m{r} m
                    ON m.word = s.word AND m.pos = s.pos
                  LEFT JOIN m{r} mp
                    ON mp.word = s.word AND mp.pos = s.pos - 1
                  WHERE mp.pos IS NULL) u)"""
    return keep + (nxt if r < _BPE_ROUNDS - 1 else "")


_BPE_ORACLE = (
    """
        WITH base AS MATERIALIZED (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS wt
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> ''
            GROUP BY word),
        s0 AS MATERIALIZED (
            SELECT word, wt, pos, substring(word, pos, 1) AS sym
            FROM (SELECT word, wt,
                         unnest(generate_series(1, length(word))) AS pos
                  FROM base)),
    """
    + ",".join(_bpe_round_sql(r) for r in range(_BPE_ROUNDS))
    + """
        SELECT * FROM (
    """
    + " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, a AS left_sym, "
        f"b AS right_sym, a || b AS merged_sym, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM t{r}"
        for r in range(_BPE_ROUNDS)
    )
    + """
        ) ORDER BY merge_round
    """
)


@query("bpe_learn_merges", category="llm-text", oracle=_BPE_ORACLE)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TOKENIZER TRAINING (Sennrich et al., ACL'16): learn the
    first 6 byte-pair merges of the corpus — per round, count adjacent
    symbol pairs weighted by word frequency, take the most frequent
    pair (ties broken lexicographically), and merge it everywhere
    (leftmost-first, non-overlapping) before the next count. Returns
    the learned merge table (round, pair, merged symbol, count) — the
    exact artifact a training pipeline ships to its tokenizer.

    The distributed shape is the one that matters at 100 TB: the
    corpus is touched ONCE (word-frequency aggregate, combinable);
    every learning round then runs on the VOCABULARY (words x current
    symbols), orders of magnitude smaller than the corpus, with the
    argmax pair as a 1-row broadcast onto the vocab (no driver
    round-trips — the whole 6-round train is one lazy DAG, lineage-cut
    per round like the k-means/PageRank loops). Pair counting and the
    merge application are pure JVM higher-order array expressions
    (zip_with / aggregate fold), no Python workers.

    The DuckDB oracle replays learning on a POSITIONAL representation
    with window-parity non-overlap resolution — an independently
    derived algorithm, so cross-engine agreement checks the semantics,
    and the literal-python Sennrich loop in tests pins both.
    All-integer counts + lexicographic tie-break make every round
    deterministic in any engine."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wt"))
    )
    vocab = words.select(
        "word", "wt", F.split("word", "").alias("sym")
    ).localCheckpoint(eager=False)
    out = None
    for r in range(_BPE_ROUNDS):
        pairs = vocab.select(
            "wt", F.explode(F.expr(_BPE_PAIRS)).alias("p")
        ).select("wt", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("wt").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        row = top.select(
            F.lit(r).cast("bigint").alias("merge_round"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.concat("a", "b").alias("merged_sym"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionAll(row)
        if r < _BPE_ROUNDS - 1:
            vocab = (
                vocab.crossJoin(
                    F.broadcast(
                        top.select(
                            F.col("a").alias("pa"), F.col("b").alias("pb")
                        )
                    )
                )
                .withColumn("sym", F.expr(_BPE_MERGE))
                .drop("pa", "pb")
                .localCheckpoint(eager=False)
            )
    return out.orderBy("merge_round")


@query(
    "feature_hashing_docs",
    category="llm-text",
    oracle="""
        WITH sample AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        toks AS (
            SELECT doc_id, md5('fh|' || t.tok) AS h
            FROM sample, unnest(string_split(text, ' ')) AS t(tok)
            WHERE t.tok <> ''),
        hashed AS (
            SELECT doc_id,
                   CAST('0x' || substring(h, 1, 8) AS BIGINT) % 64 AS bucket,
                   CASE WHEN CAST('0x' || substring(h, 9, 1) AS BIGINT) % 2
                             = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM toks)
        SELECT doc_id, bucket,
               CAST(SUM(sgn) AS BIGINT) AS weight,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM hashed
        GROUP BY doc_id, bucket
        ORDER BY doc_id, bucket
    """,
)
def feature_hashing_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML 2009): tokens map to
    a FIXED 64-dim signed feature space via bucket = md5 mod 64 and a
    ±1 sign bit from the next hash digit — the vocabulary-free
    vectorizer used when a 100 TB corpus can't afford a fitted
    vocabulary (signs make collisions cancel in expectation, keeping
    inner products unbiased). Emitted sparse as (doc_id, bucket,
    weight, n_terms) for a deterministic 1/97 doc sample.

    Determinism: both engines take bucket and sign from the same md5
    hex prefix (F.conv ↔ '0x'||substr cast), weights are integer sums.

    Scale: one token explode → one combinable (doc, bucket) groupBy;
    output dimensionality is FIXED at 64 per doc regardless of corpus
    or vocabulary size (that is the point of the trick), so the shuffle
    carries at most 64 rows per document. The 1/97 sample bounds this
    demo's output only — the full-corpus path is the same plan."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.md5(F.concat(F.lit("fh|"), F.col("tok")))
    hashed = toks.select(
        "doc_id",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 64).alias(
            "bucket"
        ),
        F.when(
            F.conv(F.substring(h, 9, 1), 16, 10).cast("bigint") % 2 == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(
            F.sum("sgn").cast("bigint").alias("weight"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy("doc_id", "bucket")
    )


#: ln(2) pre-folded to a Python literal so both engines divide by the
#: identical double (the Benford/log2-discount recipe).
_LN2 = 0.6931471805599453

#: JSD support size: the top-K global tokens (deterministic tie-break).
_JSD_TOPK = 500


@query(
    "js_divergence_sources",
    category="llm-text",
    oracle=f"""
        WITH toks AS (
            SELECT source, t.tok AS token
            FROM documents, unnest(string_split(text, ' ')) AS t(tok)
            WHERE t.tok <> ''),
        cnt AS (
            SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2),
        support AS (
            SELECT token FROM cnt
            GROUP BY token
            ORDER BY SUM(c) DESC, token LIMIT {_JSD_TOPK}),
        srcs AS (SELECT DISTINCT source FROM cnt),
        grid AS (
            SELECT s.source, v.token, COALESCE(cnt.c, 0) AS c
            FROM srcs s CROSS JOIN support v
            LEFT JOIN cnt ON cnt.source = s.source AND cnt.token = v.token),
        tot AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n
            FROM grid GROUP BY source),
        probs AS (
            SELECT g.source, g.token,
                   CAST(g.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS p
            FROM grid g JOIN tot t ON t.source = g.source),
        terms AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   (CASE WHEN a.p > 0
                         THEN a.p * ln(a.p / ((a.p + b.p) / 2.0))
                         ELSE CAST(0.0 AS DOUBLE) END)
                   + (CASE WHEN b.p > 0
                          THEN b.p * ln(b.p / ((a.p + b.p) / 2.0))
                          ELSE CAST(0.0 AS DOUBLE) END) AS term
            FROM probs a JOIN probs b
              ON b.token = a.token AND a.source < b.source)
        SELECT source_a, source_b,
               {sql_round_half_up(
                   f"CAST(SUM(CAST({sql_round_half_up('term', 9)}"
                   " AS DECIMAL(28,12))) AS DOUBLE)"
                   f" / (2.0 * {_LN2!r})", 6)} AS jsd_bits
        FROM terms
        GROUP BY source_a, source_b
        ORDER BY source_a, source_b
    """,
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (in bits, so 0 = identical, 1 =
    disjoint) between every pair of sources' token distributions over
    the shared top-{_JSD_TOPK} support — the symmetric, bounded
    distribution distance used to pick mixture weights and detect
    source drift (PSI's multi-class sibling; unlike KL it never blows
    up on zero cells).

    Determinism: probabilities are single divisions of exact BIGINTs;
    each p·ln(p/m) term is one identical expression tree (shared libm
    ln), and the per-pair sum uses the order-independent 9-dp →
    DECIMAL(28,12) recipe before one division by the pre-folded 2·ln2
    literal.

    Scale: corpus-sized work is one combinable (source, token) count;
    everything after runs on the FIXED {_JSD_TOPK}-token support —
    grid is |sources|×K rows, the pair join is K rows per source pair
    (token-hash equi-join), never corpus-quadratic. Truncating to a
    top-K support is the standard practice for distribution distances
    over unbounded vocabularies (the tail mass is per-source
    negligible and the support is IDENTICAL for every pair, so
    comparisons stay apples-to-apples)."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    cnt = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    support = (
        cnt.groupBy("token")
        .agg(F.sum("c").alias("g"))
        .orderBy(F.desc("g"), "token")
        .limit(_JSD_TOPK)
        .select("token")
    )
    srcs = cnt.select("source").distinct()
    grid = (
        srcs.crossJoin(F.broadcast(support))
        .join(cnt, ["source", "token"], "left")
        .select("source", "token", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    tot = grid.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    probs = grid.join(F.broadcast(tot), "source").select(
        "source",
        "token",
        (F.col("c").cast("double") / F.col("n").cast("double")).alias("p"),
    )
    a, b = probs.alias("a"), probs.alias("b")
    m = (F.col("a.p") + F.col("b.p")) / F.lit(2.0)
    term = F.when(
        F.col("a.p") > 0, F.col("a.p") * F.log(F.col("a.p") / m)
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("b.p") > 0, F.col("b.p") * F.log(F.col("b.p") / m)
    ).otherwise(
        F.lit(0.0)
    )
    terms = a.join(
        b,
        (F.col("b.token") == F.col("a.token"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        term.alias("term"),
    )
    return (
        terms.groupBy("source_a", "source_b")
        .agg(
            round_half_up(
                F.sum(
                    round_half_up(F.col("term"), 9).cast("decimal(28,12)")
                ).cast("double")
                / (F.lit(2.0) * F.lit(_LN2)),
                6,
            ).alias("jsd_bits")
        )
        .orderBy("source_a", "source_b")
    )


@query(
    "wasserstein_doc_lengths",
    category="llm-text",
    oracle=f"""
        WITH hist AS (
            SELECT source, CAST(n_chars AS BIGINT) AS v,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM documents GROUP BY 1, 2),
        tot AS (
            SELECT source, CAST(SUM(cnt) AS BIGINT) AS n
            FROM hist GROUP BY 1),
        srcs AS (SELECT DISTINCT source FROM hist),
        pairs AS (
            SELECT a.source AS s1, b.source AS s2
            FROM srcs a JOIN srcs b ON a.source < b.source),
        e AS (
            SELECT p.s1, p.s2, h.v, h.cnt AS a1, CAST(0 AS BIGINT) AS a2
            FROM pairs p JOIN hist h ON h.source = p.s1
            UNION ALL
            SELECT p.s1, p.s2, h.v, CAST(0 AS BIGINT), h.cnt
            FROM pairs p JOIN hist h ON h.source = p.s2),
        g AS (
            SELECT s1, s2, v,
                   CAST(SUM(a1) AS BIGINT) AS a1,
                   CAST(SUM(a2) AS BIGINT) AS a2
            FROM e GROUP BY 1, 2, 3),
        c AS (
            SELECT s1, s2, v,
                   CAST(SUM(a1) OVER w AS BIGINT) AS c1,
                   CAST(SUM(a2) OVER w AS BIGINT) AS c2,
                   lead(v) OVER (PARTITION BY s1, s2 ORDER BY v) AS nv
            FROM g
            WINDOW w AS (PARTITION BY s1, s2 ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        segsum AS (
            SELECT c.s1, c.s2, t1.n AS n1, t2.n AS n2,
                   CAST(SUM(CASE WHEN c.nv IS NULL THEN 0
                        ELSE abs(c.c1 * t2.n - c.c2 * t1.n) * (c.nv - c.v)
                        END) AS BIGINT) AS mass
            FROM c
            JOIN tot t1 ON t1.source = c.s1
            JOIN tot t2 ON t2.source = c.s2
            GROUP BY 1, 2, 3, 4)
        SELECT s1, s2, n1, n2,
               {sql_round_half_up(
                   "CAST(mass AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)", 6)}
                   AS w1_chars
        FROM segsum ORDER BY s1, s2
    """,
)
def wasserstein_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between every pair of
    sources' document-length distributions: W1 = integral over v of
    |F1(v) - F2(v)| dv, evaluated exactly on the step ECDFs — the
    drift metric that, unlike KS's max gap or PSI's fixed bins, weighs
    HOW FAR mass must move, which is what matters when rebalancing a
    training mixture's length profile (the reference has no
    distribution-distance surface).

    Determinism: the integral is a sum of per-segment terms
    |c1*n2 - c2*n1| * (v_next - v), every factor BIGINT-exact; one
    final division by n1*n2 per pair.

    Scale: corpus rows feed one combinable (source, length) histogram;
    the pairwise stage runs on histogram rows (distinct lengths), with
    the ECDF walk window-partitioned by source pair and the histogram
    broadcast onto the |sources|^2/2-row pair list. At 100 TB the
    histogram is still ~|sources| x |distinct lengths| — KBs."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.select(
            "source", F.col("n_chars").cast("bigint").alias("v")
        )
        .groupBy("source", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = hist.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    srcs = hist.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
    )
    zero = F.lit(0).cast("bigint")
    e1 = pairs.join(F.broadcast(hist), F.col("source") == F.col("s1")).select(
        "s1", "s2", "v", F.col("cnt").alias("a1"), zero.alias("a2")
    )
    e2 = pairs.join(F.broadcast(hist), F.col("source") == F.col("s2")).select(
        "s1", "s2", "v", zero.alias("a1"), F.col("cnt").alias("a2")
    )
    g = (
        e1.unionAll(e2)
        .groupBy("s1", "s2", "v")
        .agg(
            F.sum("a1").cast("bigint").alias("a1"),
            F.sum("a2").cast("bigint").alias("a2"),
        )
    )
    w_cum = (
        Window.partitionBy("s1", "s2")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_ord = Window.partitionBy("s1", "s2").orderBy("v")
    c = g.select(
        "s1",
        "s2",
        "v",
        F.sum("a1").over(w_cum).cast("bigint").alias("c1"),
        F.sum("a2").over(w_cum).cast("bigint").alias("c2"),
        F.lead("v").over(w_ord).alias("nv"),
    )
    t1 = tot.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    t2 = tot.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    seg = (
        c.join(F.broadcast(t1), "s1")
        .join(F.broadcast(t2), "s2")
        .groupBy("s1", "s2", "n1", "n2")
        .agg(
            F.sum(
                F.when(F.col("nv").isNull(), F.lit(0)).otherwise(
                    F.abs(
                        F.col("c1") * F.col("n2")
                        - F.col("c2") * F.col("n1")
                    )
                    * (F.col("nv") - F.col("v"))
                )
            )
            .cast("bigint")
            .alias("mass")
        )
    )
    return seg.select(
        "s1",
        "s2",
        "n1",
        "n2",
        round_half_up(
            F.col("mass").cast("double")
            / (F.col("n1") * F.col("n2")).cast("double"),
            6,
        ).alias("w1_chars"),
    ).orderBy("s1", "s2")


@query(
    "cdc_chunk_dedup",
    category="llm-dedup",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source, text,
                   CAST(length(text) AS BIGINT) AS n
            FROM documents),
        pos AS (
            SELECT doc_id, n, text,
                   CAST(unnest(range(1, CAST(GREATEST(n - 6, 1)
                       AS BIGINT))) AS BIGINT) AS p
            FROM d),
        cuts AS (
            SELECT doc_id, p + 7 AS cut
            FROM pos
            WHERE CAST('0x' || substring(md5(substring(text,
                      CAST(p AS INTEGER), 8)), 1, 15) AS BIGINT) % 128 = 0
              AND p + 7 < n),
        mids AS (
            SELECT doc_id,
                   COALESCE(lag(cut) OVER (PARTITION BY doc_id
                       ORDER BY cut) + 1, 1) AS s,
                   cut AS e
            FROM cuts),
        lastc AS (SELECT doc_id, MAX(cut) AS mc FROM cuts GROUP BY 1),
        lasts AS (
            SELECT d.doc_id, COALESCE(l.mc + 1, 1) AS s, d.n AS e
            FROM d LEFT JOIN lastc l ON l.doc_id = d.doc_id),
        spans AS (
            SELECT * FROM mids UNION ALL SELECT * FROM lasts),
        chunks AS (
            SELECT d.source,
                   md5(substring(d.text, CAST(sp.s AS INTEGER),
                       CAST(sp.e - sp.s + 1 AS INTEGER))) AS h,
                   CAST(sp.e - sp.s + 1 AS BIGINT) AS clen
            FROM spans sp JOIN d ON d.doc_id = sp.doc_id),
        freq AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM chunks GROUP BY 1)
        SELECT c.source,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_dup_chunks,
               {sql_round_half_up(
                   "CAST(SUM(c.clen) AS DOUBLE)"
                   " / CAST(COUNT(*) AS DOUBLE)", 6)} AS avg_chunk_chars,
               {sql_round_half_up(
                   "CAST(SUM(CASE WHEN f.cnt > 1 THEN c.clen ELSE 0 END)"
                   " AS DOUBLE) / CAST(SUM(c.clen) AS DOUBLE)", 6)}
                   AS dup_char_ratio
        FROM chunks c JOIN freq f ON f.h = c.h
        GROUP BY 1 ORDER BY 1
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup profile per source: split every
    document at positions where the rolling 8-gram's hash lands in a
    1/128 bucket (the FastCDC/LBFS boundary rule — boundaries move WITH
    the content, so an insertion only reshapes its own chunk, unlike
    fixed-size blocks where one shifted byte re-hashes the whole tail),
    then hash chunks corpus-wide and report how much of each source
    sits in non-unique chunks — sub-document dedup that exact and
    MinHash dedup both miss when documents share long boilerplate runs
    (complements duplicated_substring_spans' suffix-style spans with
    the storage-shaped chunk view).

    Determinism: boundaries come from the repo's md5->bigint hash of
    the literal 8-char gram (mod 128), span arithmetic is BIGINT, and
    chunk identity is the md5 of the exact substring — no floats until
    the two final ratio divisions.

    Scale: the position explode is linear in corpus characters and
    never shuffles text (gram hashing happens in the same stage);
    the boundary walk windows over CUT rows (1/128 of positions)
    partitioned by doc_id; chunk extraction is a doc_id-equi join; the
    dup check is a combinable hash-count. Expected chunk ~128 chars
    keeps chunk rows ~corpus_chars/128."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        "text",
        F.length("text").cast("bigint").alias("n"),
    )
    n = F.col("n")
    posd = d.select(
        "doc_id",
        "n",
        "text",
        F.explode(
            F.when(
                n >= 8, F.sequence(F.lit(1).cast("bigint"), n - 7)
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("p"),
    )
    gram = F.col("text").substr(F.col("p").cast("int"), F.lit(8))
    ghash = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")
    cuts = (
        posd.select("doc_id", "n", "p", ghash.alias("gh"))
        .filter((F.col("gh") % 128 == 0) & (F.col("p") + 7 < n))
        .select("doc_id", (F.col("p") + 7).alias("cut"))
    )
    w_ord = Window.partitionBy("doc_id").orderBy("cut")
    mids = cuts.select(
        "doc_id",
        F.coalesce(F.lag("cut").over(w_ord) + 1, F.lit(1).cast("bigint"))
        .alias("s"),
        F.col("cut").alias("e"),
    )
    lastc = cuts.groupBy("doc_id").agg(F.max("cut").alias("mc"))
    lasts = d.join(lastc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("mc") + 1, F.lit(1).cast("bigint")).alias("s"),
        F.col("n").alias("e"),
    )
    spans = mids.unionAll(lasts)
    chunks = spans.join(d, "doc_id").select(
        "source",
        F.md5(
            F.col("text").substr(
                F.col("s").cast("int"),
                (F.col("e") - F.col("s") + 1).cast("int"),
            )
        ).alias("h"),
        (F.col("e") - F.col("s") + 1).cast("bigint").alias("clen"),
    )
    freq = chunks.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    joined = chunks.join(freq, "h")
    dup = F.when(F.col("cnt") > 1, F.col("clen")).otherwise(F.lit(0))
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
            round_half_up(
                F.sum("clen").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_chunk_chars"),
            round_half_up(
                F.sum(dup).cast("double") / F.sum("clen").cast("double"), 6
            ).alias("dup_char_ratio"),
        )
        .orderBy("source")
    )


@query(
    "jackknife_source_loo",
    category="llm-text",
    oracle=f"""
        WITH per_src AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS s_chars
            FROM documents GROUP BY 1),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
                   CAST(SUM(s_chars) AS BIGINT) AS ss,
                   CAST(COUNT(*) AS BIGINT) AS g
            FROM per_src),
        loo AS (
            SELECT p.source, p.n_docs, t.g,
                   CAST(t.ss AS DOUBLE) / CAST(t.nn AS DOUBLE) AS theta,
                   CAST(t.ss - p.s_chars AS DOUBLE)
                       / CAST(t.nn - p.n_docs AS DOUBLE) AS theta_i
            FROM per_src p CROSS JOIN tot t),
        m AS (
            SELECT CAST(SUM(CAST({sql_round_half_up("theta_i", 9)}
                       AS DECIMAL(28,12))) AS DOUBLE)
                       / CAST(MAX(g) AS DOUBLE) AS mean_loo
            FROM loo),
        sq AS (
            SELECT CAST(SUM(CAST({sql_round_half_up(
                       "(l.theta_i - m.mean_loo)"
                       " * (l.theta_i - m.mean_loo)", 9)}
                       AS DECIMAL(28,12))) AS DOUBLE) AS ssq,
                   CAST(MAX(l.g) AS DOUBLE) AS gd
            FROM loo l CROSS JOIN m)
        SELECT l.source, l.n_docs,
               {sql_round_half_up("l.theta_i", 6)} AS loo_mean,
               {sql_round_half_up("l.theta - l.theta_i", 6)} AS influence,
               {sql_round_half_up(
                   "sqrt((s.gd - 1.0) / s.gd * s.ssq)", 6)} AS jack_se
        FROM loo l CROSS JOIN sq s
        ORDER BY l.source
    """,
)
def jackknife_source_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife over sources for the corpus mean
    document length: each source's leave-one-out estimate
    theta_(i) = (S - s_i)/(N - n_i), its influence theta - theta_(i)
    (how much this source pulls the corpus statistic — the curation
    question "which source is distorting my length profile?"), and the
    grouped-jackknife standard error sqrt((G-1)/G * sum (theta_(i) -
    mean)^2) — resampling-free uncertainty for any ratio statistic,
    the natural companion to the Poisson bootstrap (which resamples
    ROWS; the jackknife here deletes whole CORRELATED groups).

    Determinism: per-source and grand totals are BIGINT; each
    theta_(i) is one exact division; the across-source mean and the
    squared-deviation sum accumulate 9-dp-rounded DECIMAL terms
    (order-independent, G terms), and the SE is one final expression.

    Scale: one combinable corpus pass; everything after runs on
    |sources| rows with 1-row broadcast totals."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias("s_chars"),
    )
    tot = per_src.agg(
        F.sum("n_docs").cast("bigint").alias("nn"),
        F.sum("s_chars").cast("bigint").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("g"),
    )
    loo = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "g",
        (F.col("ss").cast("double") / F.col("nn").cast("double")).alias(
            "theta"
        ),
        (
            (F.col("ss") - F.col("s_chars")).cast("double")
            / (F.col("nn") - F.col("n_docs")).cast("double")
        ).alias("theta_i"),
    )
    m = loo.agg(
        (
            F.sum(round_half_up(F.col("theta_i"), 9).cast("decimal(28,12)"))
            .cast("double")
            / F.max("g").cast("double")
        ).alias("mean_loo")
    )
    dev = F.col("theta_i") - F.col("mean_loo")
    sq = loo.crossJoin(F.broadcast(m)).agg(
        F.sum(round_half_up(dev * dev, 9).cast("decimal(28,12)"))
        .cast("double")
        .alias("ssq"),
        F.max("g").cast("double").alias("gd"),
    )
    se = F.sqrt(
        (F.col("gd") - F.lit(1.0)) / F.col("gd") * F.col("ssq")
    )
    return (
        loo.crossJoin(F.broadcast(sq))
        .select(
            "source",
            "n_docs",
            round_half_up(F.col("theta_i"), 6).alias("loo_mean"),
            round_half_up(F.col("theta") - F.col("theta_i"), 6).alias(
                "influence"
            ),
            round_half_up(se, 6).alias("jack_se"),
        )
        .orderBy("source")
    )


@query(
    "negative_sampling_unigram",
    category="llm-text",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        cnt AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok WHERE tok <> '' GROUP BY 1),
        vocab AS (
            SELECT tok, c,
                   CAST(row_number() OVER (ORDER BY c DESC, tok)
                       AS BIGINT) AS rn,
                   CAST({sql_round_half_up("pow(CAST(c AS DOUBLE),"
                       " CAST(0.75 AS DOUBLE))", 9)}
                       AS DECIMAL(28,12)) AS w
            FROM cnt QUALIFY rn <= 500),
        cdf AS (
            SELECT tok, c, rn, w,
                   SUM(w) OVER (ORDER BY rn
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS hi
            FROM vocab),
        tot AS (
            SELECT CAST(SUM(w) AS DOUBLE) AS t_d,
                   CAST(MAX(rn) AS BIGINT) AS max_rn
            FROM vocab),
        bounds AS (
            SELECT d.tok, d.c, d.rn, d.w,
                   CAST(d.hi - d.w AS DOUBLE) AS lo_d,
                   CASE WHEN d.rn = t.max_rn
                        THEN t.t_d * CAST(2.0 AS DOUBLE)
                        ELSE CAST(d.hi AS DOUBLE) END AS hi_d,
                   t.t_d
            FROM cdf d CROSS JOIN tot t),
        samples AS (
            SELECT CAST(unnest(range(1000)) AS BIGINT) AS s),
        draws AS (
            SELECT b.tok
            FROM samples s JOIN bounds b
              ON (CAST(CAST('0x' || substring(md5('neg:' ||
                      CAST(s.s AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
                  / 1152921504606846976.0) * b.t_d >= b.lo_d
             AND (CAST(CAST('0x' || substring(md5('neg:' ||
                      CAST(s.s AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
                  / 1152921504606846976.0) * b.t_d < b.hi_d),
        drawn AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_drawn
            FROM draws GROUP BY 1)
        SELECT b.tok AS token, b.c AS cnt,
               {sql_round_half_up(
                   "CAST(b.w AS DOUBLE) / b.t_d", 6)} AS share,
               COALESCE(d.n_drawn, CAST(0 AS BIGINT)) AS n_drawn
        FROM bounds b LEFT JOIN drawn d ON d.tok = b.tok
        ORDER BY token
    """,
)
def negative_sampling_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative sampling table: the top-500 vocabulary
    weighted by count^0.75 (Mikolov et al. 2013 — the exponent that
    up-weights rare words versus raw unigram draws), materialized as an
    exact cumulative-mass CDF, plus 1000 deterministic inverse-CDF
    draws placed by interval containment — the sampling primitive
    contrastive/embedding training consumes at corpus scale.

    Determinism: weights are 9-dp-rounded DECIMAL, the CDF is an exact
    decimal cumulative sum over the (count desc, token) total order,
    draw targets are the shared md5->[0,1) hash times the total mass
    (identical IEEE product), and containment compares the identical
    doubles both engines derive from the same decimals; the top
    bucket's upper bound is stretched to 2T so a draw rounding up to
    exactly T still lands.

    Scale: the corpus feeds one combinable token count; the CDF is 500
    rows and BROADCASTS onto the sample ids, so the draw join is a
    bounded nested-loop over 500 x samples — at 100 TB the vocab table
    is unchanged and samples explode linearly with requested draws,
    never with corpus size."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # 500-row vocab: global rank + cumulative mass run on the
    # aggregate, never on corpus rows
    w_rank = Window.orderBy(F.col("c").desc(), "tok")
    vocab = (
        cnt.select(
            "tok",
            "c",
            F.row_number().over(w_rank).cast("bigint").alias("rn"),
            round_half_up(
                F.pow(F.col("c").cast("double"), F.lit(0.75)), 9
            )
            .cast("decimal(28,12)")
            .alias("w"),
        )
        .filter(F.col("rn") <= 500)
    )
    w_cum = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    cdf = vocab.select(
        "tok", "c", "rn", "w", F.sum("w").over(w_cum).alias("hi")
    )
    tot = vocab.agg(
        F.sum("w").cast("double").alias("t_d"),
        F.max("rn").cast("bigint").alias("max_rn"),
    )
    bounds = cdf.crossJoin(F.broadcast(tot)).select(
        "tok",
        "c",
        "rn",
        "w",
        (F.col("hi") - F.col("w")).cast("double").alias("lo_d"),
        F.when(
            F.col("rn") == F.col("max_rn"),
            F.col("t_d") * F.lit(2.0),
        )
        .otherwise(F.col("hi").cast("double"))
        .alias("hi_d"),
        "t_d",
    )
    samples = spark.range(0, 1000).select(F.col("id").alias("s"))
    target = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("neg:"), F.col("s").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(1152921504606846976.0)
    ) * F.col("t_d")
    draws = samples.join(
        F.broadcast(bounds),
        (target >= F.col("lo_d")) & (target < F.col("hi_d")),
    ).select("tok")
    drawn = draws.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_drawn")
    )
    return (
        bounds.join(F.broadcast(drawn), "tok", "left")
        .select(
            F.col("tok").alias("token"),
            F.col("c").alias("cnt"),
            round_half_up(
                F.col("w").cast("double") / F.col("t_d"), 6
            ).alias("share"),
            F.coalesce(F.col("n_drawn"), F.lit(0).cast("bigint")).alias(
                "n_drawn"
            ),
        )
        .orderBy("token")
    )


@query(
    "naive_bayes_source_classify",
    category="llm-text",
    oracle=f"""
        WITH dt AS (
            SELECT doc_id, source, tok,
                   CAST(COUNT(*) AS BIGINT) AS cnt_dt
            FROM (SELECT doc_id, source,
                         unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            WHERE tok <> '' GROUP BY 1, 2, 3),
        cst AS (
            SELECT source AS s, tok, CAST(SUM(cnt_dt) AS BIGINT) AS c
            FROM dt GROUP BY 1, 2),
        ns AS (
            SELECT s, CAST(SUM(c) AS BIGINT) AS n_s
            FROM cst GROUP BY 1),
        vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM cst),
        prior AS (
            SELECT source AS s, CAST(COUNT(*) AS BIGINT) AS d_s
            FROM documents GROUP BY 1),
        dtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents),
        scores AS (
            SELECT dt.doc_id, dt.source AS true_src, ns.s AS cand,
                   SUM(dt.cnt_dt * CAST({sql_round_half_up(
                       "ln(CAST(COALESCE(cst.c, 0) + 1 AS DOUBLE)"
                       " / CAST(ns.n_s + vv.v AS DOUBLE))", 9)}
                       AS DECIMAL(28,12))) AS lsum
            FROM dt
            CROSS JOIN ns CROSS JOIN vv
            LEFT JOIN cst ON cst.s = ns.s AND cst.tok = dt.tok
            GROUP BY 1, 2, 3),
        posts AS (
            SELECT sc.doc_id, sc.true_src, sc.cand,
                   sc.lsum + CAST({sql_round_half_up(
                       "ln(CAST(p.d_s AS DOUBLE)"
                       " / CAST(dtot.d AS DOUBLE))", 9)}
                       AS DECIMAL(28,12)) AS post
            FROM scores sc
            JOIN prior p ON p.s = sc.cand CROSS JOIN dtot),
        pred AS (
            SELECT doc_id, true_src, cand AS pred_src,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY post DESC, cand) AS rn
            FROM posts)
        SELECT true_src, pred_src, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def naive_bayes_source_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained and evaluated in-engine: learn
    add-1-smoothed per-source token likelihoods P(t|s) =
    (c_st+1)/(n_s+V) and document priors, score every document against
    every source, and report the source-level confusion matrix of the
    argmax predictions — supervised text classification as a pure
    DataFrame program (train = two combinable count tables; predict =
    equi-joins + a per-doc rank), the companion to the unsupervised
    lang-ID and k-NN queries.

    Determinism: all counts are BIGINT; each log-likelihood and the
    log-prior are identical IEEE expressions 9-dp-rounded into
    DECIMAL(28,12); per-(doc, candidate) sums weight the decimal by the
    BIGINT term count (exact); the argmax orders exact decimals with a
    candidate-name tie-break.

    Scale: the corpus feeds (doc, token) and (source, token) counts —
    both combinable, shuffling tokens, never text. Scoring joins the
    doc-token table against the |sources|-row broadcast and the
    model equi-keyed on (source, token): rows = doc-token pairs x
    |sources|, linear in corpus tokens with a constant class factor;
    the model table is vocab-sized (broadcastable at any corpus
    size)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt_dt"))
    )
    cst = dt.groupBy(F.col("source").alias("s"), "tok").agg(
        F.sum("cnt_dt").cast("bigint").alias("c")
    )
    ns = cst.groupBy("s").agg(F.sum("c").cast("bigint").alias("n_s"))
    vv = cst.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    prior = docs.groupBy(F.col("source").alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d_s")
    )
    dtot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    loglik = round_half_up(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
            / (F.col("n_s") + F.col("v")).cast("double")
        ),
        9,
    ).cast("decimal(28,12)")
    scores = (
        dt.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(vv))
        .join(
            cst.withColumnRenamed("s", "cs"),
            (F.col("cs") == F.col("s")) & (cst["tok"] == dt["tok"]),
            "left",
        )
        .groupBy(
            "doc_id", F.col("source").alias("true_src"), F.col("s").alias("cand")
        )
        .agg(F.sum(F.col("cnt_dt") * loglik).alias("lsum"))
    )
    logprior = round_half_up(
        F.log(F.col("d_s").cast("double") / F.col("d").cast("double")), 9
    ).cast("decimal(28,12)")
    posts = (
        scores.join(
            F.broadcast(prior.withColumnRenamed("s", "ps")),
            F.col("ps") == F.col("cand"),
        )
        .crossJoin(F.broadcast(dtot))
        .select(
            "doc_id",
            "true_src",
            "cand",
            (F.col("lsum") + logprior).alias("post"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("post").desc(), "cand")
    pred = posts.select(
        "true_src",
        F.col("cand").alias("pred_src"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") == 1)
    return (
        pred.groupBy("true_src", "pred_src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_src", "pred_src")
    )


@query(
    "gram_matrix_embeddings",
    category="llm-similarity",
    oracle=f"""
        WITH cells AS (
            SELECT i.i AS i, j.j AS j,
                   CAST({sql_round_half_up(
                       "CAST(embedding[CAST(i.i + 1 AS INTEGER)] AS DOUBLE)"
                       " * CAST(embedding[CAST(j.j + 1 AS INTEGER)]"
                       " AS DOUBLE)", 9)} AS DECIMAL(28,12)) AS p
            FROM embeddings,
                 LATERAL (SELECT CAST(unnest(range(64)) AS BIGINT) AS i) i,
                 LATERAL (SELECT CAST(unnest(range(i.i, 64)) AS BIGINT)
                          AS j) j)
        SELECT i, j,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_round_half_up("CAST(SUM(p) AS DOUBLE)", 6)} AS gram
        FROM cells GROUP BY 1, 2 ORDER BY i, j
    """,
)
def gram_matrix_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d x d Gram matrix X^T X of the embedding corpus (upper
    triangle, d=64): THE one-pass moment sketch behind full
    d-dimensional PCA / whitening / ridge regression — each executor
    accumulates per-partition outer-product sums and the merge is
    addition, so a 100 TB corpus reduces to d(d+1)/2 numbers in one
    combinable aggregation (the same shape pca_2d_parts_by_brand uses
    closed-form for d=2; here the full matrix ships to any eigen
    solver).

    Determinism: every product casts the float32 elements to double
    first (matching both engines' promotion), is 9-dp-rounded into
    DECIMAL(28,12), and summed exactly — order-independent across
    partitions.

    Scale: the explode emits d(d+1)/2 = 2080 cells per vector inside
    the scan stage (no shuffle carries vectors); the aggregate shuffles
    2080 running sums per partition. For d where d^2 explode dominates,
    the same plan swaps to a mapInPandas numpy syrk per partition —
    documented alternative, not needed at d=64."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        F.explode(
            F.expr(
                """
                flatten(transform(sequence(0, 63), i ->
                  transform(sequence(i, 63), j ->
                    struct(CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
                           CAST(embedding[i] AS DOUBLE)
                           * CAST(embedding[j] AS DOUBLE) AS p))))
                """
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    return (
        cells.select(
            "i", "j", round_half_up(F.col("p"), 9).cast("decimal(28,12)").alias("p")
        )
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            round_half_up(F.sum("p").cast("double"), 6).alias("gram"),
        )
        .orderBy("i", "j")
    )


@query(
    "time_decayed_engagement",
    category="aggregation",
    oracle=f"""
        WITH h AS (
            SELECT date_trunc('day', max(ts)) AS hday FROM events),
        ev AS (
            SELECT e.user_id,
                   date_diff('day', date_trunc('day', e.ts), h.hday)
                       AS age,
                   CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events e CROSS JOIN h
            WHERE isfinite(e.value)),
        terms AS (
            SELECT user_id,
                   CAST({sql_round_half_up(
                       "exp(CAST(-0.1 AS DOUBLE) * CAST(age AS DOUBLE))"
                       " * (CAST(cents AS DOUBLE) / 100.0)", 9)}
                       AS DECIMAL(28,12)) AS t
            FROM ev)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {sql_round_half_up("CAST(SUM(t) AS DOUBLE)", 6)}
                   AS decayed_value
        FROM terms GROUP BY 1 ORDER BY user_id
    """,
)
def time_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user:
    sum of value * exp(-0.1 * age_days) against the dataset horizon —
    the recency-weighted aggregate behind churn scores, decayed LTV,
    and freshness-weighted training-example selection, where a plain
    SUM over-credits ancient activity.

    Determinism: ages are integer day differences against the 1-row
    horizon broadcast; each decayed term is one identical IEEE
    exp/multiply 9-dp-rounded into DECIMAL(28,12); sums are exact.

    Scale: one combinable aggregate over the corpus; the horizon is a
    1-row broadcast (same shape as kaplan_meier_retention)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.agg(F.date_trunc("day", F.max("ts")).alias("hday"))
    v = F.col("value").cast("double")
    finite = ~(
        F.isnan(v) | (v == F.lit(float("inf"))) | (v == F.lit(float("-inf")))
    )
    terms = (
        ev.filter(finite)
        .crossJoin(F.broadcast(h))
        .select(
            "user_id",
            round_half_up(
                F.exp(
                    F.lit(-0.1)
                    * F.datediff(
                        F.col("hday"), F.date_trunc("day", F.col("ts"))
                    ).cast("double")
                )
                * (
                    F.floor(v * F.lit(100.0) + F.lit(0.5))
                    .cast("bigint")
                    .cast("double")
                    / F.lit(100.0)
                ),
                9,
            )
            .cast("decimal(28,12)")
            .alias("t"),
        )
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            round_half_up(F.sum("t").cast("double"), 6).alias(
                "decayed_value"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "containment_dedup_pairs",
    category="llm-dedup",
    oracle=f"""
        WITH sh AS (
            {_shingle_units_sql(n=3, source="documents", alias="s")}
            WHERE doc_id < 500
        ),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                  FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT i.id_a, i.id_b, sa.n AS n_a, sb.n AS n_b,
               {sql_round_half_up(
                   "CAST(i.n_common AS DOUBLE) / CAST(sa.n AS DOUBLE)",
                   6)} AS containment_ab,
               {sql_round_half_up(
                   "CAST(i.n_common AS DOUBLE) / CAST(sb.n AS DOUBLE)",
                   6)} AS containment_ba,
               {sql_round_half_up(
                   "CAST(i.n_common AS DOUBLE)"
                   " / CAST(sa.n + sb.n - i.n_common AS DOUBLE)",
                   6)} AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE CAST(i.n_common AS DOUBLE) / CAST(sa.n AS DOUBLE) >= 0.5
           OR CAST(i.n_common AS DOUBLE) / CAST(sb.n AS DOUBLE) >= 0.5
        ORDER BY id_a, id_b
    """,
)
def containment_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-CONTAINMENT pairs (C(A->B) = |A n B|/|A| >=
    0.5 in either direction) over a bounded slice — the subset-
    duplicate detector Jaccard structurally misses: a paragraph quoted
    inside a much longer document has high containment but low Jaccard
    because the union is dominated by the long side (Broder 1997's
    resemblance-vs-containment distinction). Completes the dedup
    family's fourth route: exact (hash), near (LSH banding), exact-
    threshold (prefix filter), and now SUBSET containment.

    Determinism: shingle sets, intersections, and sizes are integer;
    the three ratios are single divisions rounded identically.

    Scale: the inverted-shingle self-join is quadratic in per-shingle
    document frequency — the slice exists for the oracle's O(n^2); at
    corpus scale the candidate source is near_dup_pairs' LSH banding
    with this containment verify applied per candidate (operators.
    dedup.containment_pairs docstring)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    raw = dedup.containment_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return raw.select(
        "id_a",
        "id_b",
        "n_a",
        "n_b",
        round_half_up(F.col("containment_ab"), 6).alias("containment_ab"),
        round_half_up(F.col("containment_ba"), 6).alias("containment_ba"),
        round_half_up(F.col("jaccard"), 6).alias("jaccard"),
    ).orderBy("id_a", "id_b")


@query(
    "quantile_normalize_lengths",
    category="llm-text",
    oracle=f"""
        WITH ranked AS (
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v,
                   CAST(row_number() OVER (PARTITION BY source
                       ORDER BY n_chars, doc_id) AS BIGINT) AS r,
                   CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
                       AS n_s
            FROM documents),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
        hist AS (
            SELECT v, CAST(SUM(cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum,
                   CAST(COALESCE(SUM(cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum_prev
            FROM (SELECT CAST(n_chars AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM documents GROUP BY 1)),
        mapped AS (
            SELECT rk.source, rk.v AS orig, h.v AS norm
            FROM ranked rk
            CROSS JOIN tot t
            JOIN hist h
              ON (rk.r * t.nn + rk.n_s - 1) // rk.n_s > h.cum_prev
             AND (rk.r * t.nn + rk.n_s - 1) // rk.n_s <= h.cum)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               {sql_round_half_up(
                   "CAST(SUM(orig) AS DOUBLE)"
                   " / CAST(COUNT(*) AS DOUBLE)", 6)} AS mean_orig,
               {sql_round_half_up(
                   "CAST(SUM(norm) AS DOUBLE)"
                   " / CAST(COUNT(*) AS DOUBLE)", 6)} AS mean_norm,
               {sql_round_half_up(
                   "CAST(SUM(abs(norm - orig)) AS DOUBLE)"
                   " / CAST(COUNT(*) AS DOUBLE)", 6)} AS mean_abs_shift
        FROM mapped GROUP BY 1 ORDER BY source
    """,
)
def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document lengths: each
    document's length maps to the GLOBAL length at its within-source
    quantile (nearest-rank k = ceil(r/n_s * N), all-integer), the
    genomics-standard transform (quantile normalization, Bolstad 2003)
    that forces every source onto the same length distribution before
    mixing — reported as per-source mean original/normalized lengths
    and the mean absolute shift (how much each source's profile had to
    move, i.e. the actionable curation signal).

    Determinism: ranks, nearest-rank targets, and the global
    cumulative histogram are BIGINT (the (r*N + n_s - 1) // n_s form —
    never ceil of an IEEE product); the mapping join is integer
    interval containment; only the three final means divide.

    Scale: per-source ranking windows run over doc rows partitioned by
    source; the global walk runs on the DISTINCT-length histogram
    (hundreds of rows), which broadcasts onto the interval-containment
    join — corpus rows never enter a non-equi join with anything
    bigger than the histogram."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w_rank = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    w_n = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("v"),
        F.row_number().over(w_rank).cast("bigint").alias("r"),
        F.count(F.lit(1)).over(w_n).cast("bigint").alias("n_s"),
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    hist_base = docs.groupBy(F.col("n_chars").cast("bigint").alias("hv")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = Window.orderBy("hv").rowsBetween(Window.unboundedPreceding, 0)
    w_prev = Window.orderBy("hv").rowsBetween(Window.unboundedPreceding, -1)
    hist = hist_base.select(
        "hv",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
        F.coalesce(F.sum("cnt").over(w_prev), F.lit(0))
        .cast("bigint")
        .alias("cum_prev"),
    )
    k = F.floor(
        (F.col("r") * F.col("nn") + F.col("n_s") - 1) / F.col("n_s")
    ).cast("bigint")
    mapped = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("k", k)
        .join(
            F.broadcast(hist),
            (F.col("k") > F.col("cum_prev")) & (F.col("k") <= F.col("cum")),
        )
        .select(
            "source",
            F.col("v").alias("orig"),
            F.col("hv").alias("norm"),
        )
    )
    cnt = F.count(F.lit(1))
    return (
        mapped.groupBy("source")
        .agg(
            cnt.cast("bigint").alias("n_docs"),
            round_half_up(
                F.sum("orig").cast("double") / cnt.cast("double"), 6
            ).alias("mean_orig"),
            round_half_up(
                F.sum("norm").cast("double") / cnt.cast("double"), 6
            ).alias("mean_norm"),
            round_half_up(
                F.sum(F.abs(F.col("norm") - F.col("orig"))).cast("double")
                / cnt.cast("double"),
                6,
            ).alias("mean_abs_shift"),
        )
        .orderBy("source")
    )


@query(
    "vocab_coverage_p90",
    category="llm-text",
    oracle="""
        WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                   FROM documents),
        c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM t GROUP BY 1, 2),
        r AS (SELECT source, tok, cnt,
                     CAST(row_number() OVER win AS BIGINT) AS rn,
                     CAST(SUM(cnt) OVER (win ROWS UNBOUNDED PRECEDING)
                         AS BIGINT) AS cum
              FROM c
              WINDOW win AS (PARTITION BY source ORDER BY cnt DESC, tok)),
        tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS total_tokens,
                       CAST(COUNT(*) AS BIGINT) AS vocab_size
                FROM c GROUP BY 1)
        SELECT r.source, tot.total_tokens, tot.vocab_size,
               CAST(MIN(r.rn) AS BIGINT) AS n_types_p90
        FROM r JOIN tot ON r.source = tot.source
        WHERE r.cum * 10 >= 9 * tot.total_tokens
        GROUP BY 1, 2, 3 ORDER BY r.source
    """,
)
def vocab_coverage_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus vocabulary coverage per source: the smallest number of
    word types that covers >= 90% of token OCCURRENCES — the
    tokenizer-budget statistic behind vocabulary sizing and the
    head-heaviness complement of zipf_rank_frequency_fit. Ranking is
    the total order (count DESC, token ASC) both engines replay, and
    the 90% cut is the all-integer predicate cum·10 >= 9·total, so no
    percentage float ever materializes.

    Scale: tokens reduce to a (source, type) count table (combinable),
    and the rank/cumsum window is PARTITIONED BY source over vocab-sized
    (not corpus-sized) input — the same two-phase shape as the BPE and
    vocab-induction queries."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    win = Window.partitionBy("source").orderBy(F.col("cnt").desc(), "tok")
    ranked = counts.select(
        "source",
        "cnt",
        F.row_number().over(win).cast("bigint").alias("rn"),
        F.sum("cnt")
        .over(win.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
    )
    tot = counts.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    return (
        ranked.join(tot, "source")
        .filter(F.col("cum") * 10 >= 9 * F.col("total_tokens"))
        .groupBy("source", "total_tokens", "vocab_size")
        .agg(F.min("rn").cast("bigint").alias("n_types_p90"))
        .orderBy("source")
    )


#: Greedy decode length (tokens generated after the seed).
_DECODE_STEPS = 8


def _decode_oracle() -> str:
    levels = []
    for s in range(1, _DECODE_STEPS + 1):
        levels.append(
            f"s{s} AS MATERIALIZED (SELECT b.w2 AS token FROM bi b, s{s - 1} p "
            f"WHERE b.w1 = p.token ORDER BY b.cnt DESC, b.w2 LIMIT 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS step, token FROM s{s}"
        for s in range(_DECODE_STEPS + 1)
    )
    return f"""
        WITH w AS (SELECT string_split(text, ' ') AS words FROM documents),
        pairs AS (
            SELECT words[i] AS w1, words[i + 1] AS w2
            FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 1))
                             AS i) r
            WHERE len(words) >= 2),
        bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM pairs GROUP BY 1, 2),
        uni AS (SELECT w1 AS token, CAST(SUM(cnt) AS BIGINT) AS c
                FROM bi GROUP BY 1),
        s0 AS MATERIALIZED (SELECT token FROM uni ORDER BY c DESC, token
                            LIMIT 1),
        {", ".join(levels)}
        {union}
        ORDER BY step
    """


@query("bigram_greedy_decode", category="llm-text", oracle=_decode_oracle())
def bigram_greedy_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy autoregressive DECODING from the corpus bigram model: seed
    with the most frequent bigram-head token, then 8 steps of
    argmax-successor generation — the in-engine counterpart of running
    inference on the n-gram LM the pipeline's perplexity rows score
    (deterministic decoding; sampling variants swap the argmax for the
    md5-CDF draw negative_sampling_unigram already pins). Each step is
    the established iterative-argmax pattern: a total order
    (count DESC, token ASC) ranked by orderBy+limit(1) =
    TakeOrderedAndProject, whose 1-row result broadcast-joins into the
    next step — no driver collect, no partition-less window; the
    oracle replays the chain through MATERIALIZED CTE levels.

    Seed note: the seed maximizes bigram-HEAD frequency (Σ successor
    counts) so the seed is guaranteed a successor; a document-final
    token can never strand the decode.

    Scale: the corpus reduces to the bigram count table once
    (combinable, localCheckpointed); each of the 9 steps touches only
    that table."""
    from pipeline_query_engine_demo_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select(F.explode(shingles(F.col("text"), 2)).alias("bg"))
    bigrams = (
        bg.select(
            F.split(F.col("bg"), " ").getItem(0).alias("w1"),
            F.split(F.col("bg"), " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    uni = bigrams.groupBy(F.col("w1").alias("token")).agg(
        F.sum("cnt").cast("bigint").alias("c")
    )
    cur = (
        uni.orderBy(F.col("c").desc(), "token")
        .limit(1)
        .select(F.lit(0).cast("bigint").alias("step"), "token")
    )
    outs = [cur]
    for s in range(1, _DECODE_STEPS + 1):
        cur = (
            bigrams.join(
                F.broadcast(cur.select(F.col("token").alias("w1"))), "w1"
            )
            .orderBy(F.col("cnt").desc(), "w2")
            .limit(1)
            .select(F.lit(s).cast("bigint").alias("step"), F.col("w2").alias("token"))
            .localCheckpoint(eager=False)
        )
        outs.append(cur)
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out.orderBy("step")


#: Band configurations for the LSH banding sweep: with k = 8 hashes,
#: bands b ∈ {2, 4, 8} give rows-per-band r = 4, 2, 1 — the classic
#: precision/recall dial (collision prob = 1 − (1 − J^r)^b).
_SWEEP_BANDS = (2, 4, 8)


def _band_chain_sql(b: int) -> str:
    """CTE chain (buckets→candidates→prefilter→verified ids) for one
    band count, names suffixed _b{b}; composes with the shared
    units/sigs/sizes CTEs."""
    r = _NUM_HASHES // b
    buckets = " UNION ALL ".join(
        "SELECT doc_id, {g} AS band_id, md5(concat_ws('|', {cols})) AS band_hash FROM sigs".format(
            g=g, cols=", ".join(f"mh{g * r + j}" for j in range(r))
        )
        for g in range(b)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(_NUM_HASHES)
    )
    return f"""
        buckets_b{b} AS ({buckets}),
        cand_b{b} AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM buckets_b{b} a JOIN buckets_b{b} b
            ON a.band_id = b.band_id AND a.band_hash = b.band_hash
               AND a.doc_id < b.doc_id),
        estf_b{b} AS (SELECT c.id_a, c.id_b FROM cand_b{b} c
            JOIN sigs sa ON sa.doc_id = c.id_a
            JOIN sigs sb ON sb.doc_id = c.id_b
            WHERE ({agree}) / {float(_NUM_HASHES)!r} >= {_EST_PREFILTER!r}),
        inter_b{b} AS (
            SELECT c.id_a, c.id_b, COUNT(*) AS n_common
            FROM estf_b{b} c
            JOIN units ta ON ta.doc_id = c.id_a
            JOIN units tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
            GROUP BY c.id_a, c.id_b),
        ver_b{b} AS (
            SELECT i.id_a, i.id_b
            FROM inter_b{b} i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE i.n_common / (sa.n + sb.n - i.n_common) >= 0.6)
    """


@query(
    "lsh_bands_recall_sweep",
    category="llm-dedup",
    oracle=f"""
        WITH {_UNITS_CTE}, {_SIGS_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM units GROUP BY doc_id),
        {", ".join(_band_chain_sql(b).strip() for b in _SWEEP_BANDS)},
        allv AS ({" UNION ".join(f"SELECT id_a, id_b FROM ver_b{b}" for b in _SWEEP_BANDS)}),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union FROM allv),
        rows_out AS (
            {" UNION ALL ".join(
                f"SELECT CAST({b} AS BIGINT) AS bands, "
                f"(SELECT CAST(COUNT(*) AS BIGINT) FROM cand_b{b}) AS n_candidates, "
                f"(SELECT CAST(COUNT(*) AS BIGINT) FROM ver_b{b}) AS n_verified"
                for b in _SWEEP_BANDS)})
        SELECT r.bands, r.n_candidates, r.n_verified, t.n_union,
               {sql_round_half_up(
                   "CAST(r.n_verified AS DOUBLE) / CAST(t.n_union AS DOUBLE)",
                   6)} AS recall
        FROM rows_out r CROSS JOIN tot t
        ORDER BY bands
    """,
)
def lsh_bands_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding DIAL, measured in-engine (the dedup counterpart
    of ann_recall_vs_probes): for b ∈ {{2,4,8}} bands over the same 8
    MinHashes, candidate volume vs verified-pair recall against the
    union of all three configs' verified sets. Fewer bands (more rows
    per band) = fewer, higher-precision candidates; b=8 singleton
    bands = near-total recall at 100-300× the candidate volume — the
    sweep row quantifies what DEFAULT_BANDS buys. The hot-bucket cap
    is OFF here so the subset relation between configs is exact
    (bounded fixture; production keeps the cap and this sweep is how
    it would be tuned).

    Scale: signatures compute once (localCheckpoint) and all three
    chains reuse them; each chain is the standard banded self-join +
    prefilter + candidate-restricted verify."""
    from pipeline_query_engine_demo_spark.operators import dedup as _d

    docs = load_table(spark, sf_dir, "documents")
    sigs = _d.minhash_signatures(docs, "doc_id", "text").localCheckpoint(
        eager=False
    )
    rows = []
    vers = []
    for b in _SWEEP_BANDS:
        cand = _d.lsh_candidate_pairs(
            docs,
            "doc_id",
            "text",
            bands=b,
            max_bucket_size=None,
            signatures=sigs,
        ).localCheckpoint(eager=False)
        estf = _d.signature_agreement_prefilter(
            sigs, cand, "doc_id", _d.DEFAULT_NUM_HASHES, _d.DEFAULT_EST_PREFILTER
        )
        ver = (
            _d.jaccard_pairs(docs, estf, "doc_id", "text")
            .filter(F.col("jaccard") >= 0.6)
            .select("id_a", "id_b")
            .localCheckpoint(eager=False)
        )
        vers.append(ver)
        rows.append(
            cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
            .crossJoin(
                ver.agg(F.count(F.lit(1)).cast("bigint").alias("n_verified"))
            )
            .select(
                F.lit(b).cast("bigint").alias("bands"),
                "n_candidates",
                "n_verified",
            )
        )
    allv = vers[0].unionByName(vers[1]).unionByName(vers[2]).distinct()
    tot = allv.agg(F.count(F.lit(1)).cast("bigint").alias("n_union"))
    out = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return (
        out.crossJoin(F.broadcast(tot))
        .select(
            "bands",
            "n_candidates",
            "n_verified",
            "n_union",
            round_half_up(
                F.col("n_verified").cast("double")
                / F.col("n_union").cast("double"),
                6,
            ).alias("recall"),
        )
        .orderBy("bands")
    )
