"""Training-data-shaping operators: global shuffle permutation
properties, cluster-representative selection on a planted cluster,
batch assignment invariants, mixture sampling rates."""

from __future__ import annotations

import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.plans import llm, training


def test_global_shuffle_is_dense_permutation(spark, sf_dir):
    """Two-phase bucketed rank must produce exactly 1..N with no
    duplicates or gaps — i.e. the same thing a single global
    row_number would."""
    out = training.global_shuffle_positions(spark, sf_dir)
    rows = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("shuffle_pos").alias("d"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
    ).collect()[0]
    assert rows.lo == 1 and rows.hi == rows.n == rows.d


def test_representative_is_longest_in_cluster(spark):
    """Planted 3-doc near-dup cluster: the representative must be the
    longest member, not the min-id one."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra tail words here"),  # longest near-dup
            (3, base),
            (9, "completely different content with no overlap at all xx yy zz qq"),
        ],
        "doc_id long, text string",
    )
    from pipeline_query_engine_demo_spark.operators import dedup

    clusters = dedup.dedup_clusters(docs, "doc_id", "text", threshold=0.6)
    sized = clusters.join(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens")),
        clusters["id"] == docs["doc_id"],
    ).select("cluster_id", "doc_id", "n_tokens")
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    rep = (
        sized.withColumn(
            "rn",
            F.row_number().over(
                w.orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("cluster_id", "doc_id")
        .collect()
    )
    by_cluster = {r.cluster_id: r.doc_id for r in rep}
    assert by_cluster[1] == 2  # longest member wins, not min-id
    assert by_cluster[9] == 9  # singleton is its own representative


def test_length_buckets_batch_invariants(spark, sf_dir):
    out = training.length_bucketed_batches(spark, sf_dir)
    # every batch holds <= 8 docs, and bucket matches token count
    sizes = out.groupBy("length_bucket", "batch_in_bucket").count()
    assert sizes.filter(F.col("count") > 8).count() == 0
    bad = out.filter(
        (F.col("n_tokens") / 16).cast("bigint") != F.col("length_bucket")
    )
    assert bad.count() == 0


def test_mixture_sampling_tracks_thresholds(spark, sf_dir):
    """Per-source keep rates should track the configured hex
    thresholds: src0 keeps everything; unlisted sources keep ~12.5%
    and strictly less than src0."""
    docs_n = (
        llm.load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .collect()
    )
    total = {r.source: r["count"] for r in docs_n}
    kept = {
        r.source: r["count"]
        for r in training.mixture_sample_by_weights(spark, sf_dir)
        .groupBy("source")
        .count()
        .collect()
    }
    assert kept.get("src0", 0) == total["src0"]  # threshold 'g' keeps all
    tail = [s for s in total if s not in llm.MIXTURE_THRESHOLDS]
    tail_rate = sum(kept.get(s, 0) for s in tail) / sum(total[s] for s in tail)
    assert 0.02 < tail_rate < 0.30  # ~1/8 nominal


def test_pack_offsets_within_capacity(spark, sf_dir):
    out = training.pack_sequences_for_training(spark, sf_dir)
    assert out.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 512)
    ).count() == 0
    # chunk token counts are bounded by the chunk size
    assert out.filter(
        (F.col("n_tokens") < 1) | (F.col("n_tokens") > 64)
    ).count() == 0


def test_kmeans_recovers_planted_clusters(spark):
    """Three tight planted clusters around axis directions: two Lloyd's
    iterations from one-hot init must assign each group to one cell and
    pull the centroid to the group mean."""
    import itertools

    from pipeline_query_engine_demo_spark.operators import clustering

    def vec(hot, bump):
        v = [0.05] * 8
        v[hot] = 1.0 + bump
        return v

    rows = [
        (i * 10 + j, vec(i, 0.01 * j))
        for i, j in itertools.product(range(3), range(4))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    init = spark.createDataFrame(
        [
            (cell, dim, 1.0 if dim == cell + 1 else 0.0)
            for cell in range(3)
            for dim in range(1, 9)
        ],
        "cell long, dim long, c double",
    )
    cent, assign = clustering.kmeans_train(df, "vec_id", "embedding", init, 2)
    got = {r.vec_id: r.cell for r in assign.collect()}
    for i, j in itertools.product(range(3), range(4)):
        assert got[i * 10 + j] == i
    hot = {
        (r.cell, r.dim): r.c for r in cent.collect()
    }
    for cell in range(3):
        # hot dimension mean ≈ 1.015, background dims stay at 0.05
        assert abs(hot[(cell, cell + 1)] - 1.015) < 0.01
        assert abs(hot[(cell, (cell + 1) % 8 + 1)] - 0.05) < 1e-6


def test_kmeans_ml_path_agrees_with_expression_path(spark):
    """The production pyspark.ml path and the long-format oracle path
    must recover the SAME partition of planted clusters. ml's labels
    are arbitrary (k-means|| init), so agreement is asserted on the
    partition (groups-of-ids), label-permutation invariant."""
    import itertools

    from pipeline_query_engine_demo_spark.operators import clustering

    def vec(hot, bump):
        v = [0.05] * 8
        v[hot] = 1.0 + bump
        return v

    rows = [
        (i * 10 + j, vec(i, 0.01 * j))
        for i, j in itertools.product(range(3), range(4))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    init = spark.createDataFrame(
        [
            (cell, dim, 1.0 if dim == cell + 1 else 0.0)
            for cell in range(3)
            for dim in range(1, 9)
        ],
        "cell long, dim long, c double",
    )
    _, expr_assign = clustering.kmeans_train(df, "vec_id", "embedding", init, 2)
    ml_cent, ml_assign = clustering.kmeans_train_ml(
        df, "vec_id", "embedding", k=3, iterations=5
    )

    def partition(assign):
        groups: dict[int, set[int]] = {}
        for r in assign.collect():
            groups.setdefault(r.cell, set()).add(r.vec_id)
        return sorted(map(frozenset, groups.values()), key=min)

    assert partition(expr_assign) == partition(ml_assign)
    # centroid table has the contract shape: k x dim long-format rows
    assert ml_cent.count() == 3 * 8
    # each ml centroid's hot dimension is the planted group mean
    hot = {}
    for r in ml_cent.collect():
        if r.c > 0.5:
            hot[r.cell] = (r.dim, r.c)
    assert len(hot) == 3
    for _, (dim, c) in hot.items():
        assert abs(c - 1.015) < 0.01


def test_media_fingerprint_finds_only_planted_mutations(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.dedup import media_fingerprint_near_dup
    from pipeline_query_engine_demo_spark.plans.llm import _FP_PLANT_IDS

    rows = media_fingerprint_near_dup(spark, sf_dir).collect()
    # fixture corpus has no cross-doc near-dups at this threshold; the
    # planted single-byte mutations pair with their originals at 15/16
    got = {(r.id_a, r.id_b): r.n_match for r in rows}
    expected_pairs = {(i, i + 1000000) for i in _FP_PLANT_IDS}
    assert set(got) == expected_pairs
    assert all(v == 15 for v in got.values())


def test_epoch_repeat_counts_match_factors(spark, sf_dir):
    import pyspark.sql.functions as F

    from pipeline_query_engine_demo_spark.plans.curation import (
        EPOCH_FACTORS,
        epoch_repeat_oversample,
    )
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    out = epoch_repeat_oversample(spark, sf_dir)
    per_doc = out.groupBy("doc_id", "source").agg(F.count(F.lit(1)).alias("n"))
    # every doc gets floor(f) or ceil(f) copies of its source's factor
    bad = 0
    for r in per_doc.collect():
        f = EPOCH_FACTORS.get(r.source, 1.0)
        if not (int(f) <= r.n <= int(f) + (1 if f != int(f) else 0)):
            bad += 1
    assert bad == 0
    # copies are distinct (doc_id, epoch) pairs
    assert out.count() == out.select("doc_id", "epoch").distinct().count()
    # integer-factor sources replicate exactly
    n_src1 = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == "src1"
    ).count()
    assert out.filter(F.col("source") == "src1").count() == n_src1


def test_contrastive_negatives_cross_source_and_exactly_k(spark, sf_dir):
    import pyspark.sql.functions as F

    from pipeline_query_engine_demo_spark.plans.curation import (
        _NEG_K,
        contrastive_negative_pairs,
    )
    from pipeline_query_engine_demo_spark.sources.catalog import load_table

    out = contrastive_negative_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    anchors = docs.withColumnRenamed("doc_id", "anchor_id").withColumnRenamed(
        "source", "anchor_source"
    )
    negs = docs.withColumnRenamed("doc_id", "negative_id").withColumnRenamed(
        "source", "negative_source"
    )
    joined = out.join(anchors, "anchor_id").join(negs, "negative_id")
    assert joined.filter(
        F.col("anchor_source") == F.col("negative_source")
    ).count() == 0
    sizes = out.groupBy("anchor_id").count().select("count").distinct().collect()
    assert [r["count"] for r in sizes] == [_NEG_K]


def test_bpe_pieces_reassemble_to_words(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.curation import bpe_apply_merges

    rows = bpe_apply_merges(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # removing the piece separators must reproduce the word exactly
        assert r.pieces.replace(" ", "") == r.word
        assert 1 <= r.n_pieces <= len(r.word)
    # the merges actually fired somewhere (some word has fewer pieces
    # than characters)
    assert any(r.n_pieces < len(r.word) for r in rows)


def test_fim_split_is_lossless_with_nonempty_middle(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.curation import fim_split_docs

    rows = fim_split_docs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lossless
        assert len(r.prefix) > 0 and len(r.middle) > 0 and len(r.suffix) > 0
        assert len(r.prefix) + len(r.middle) + len(r.suffix) == r.n_chars


def test_url_canonical_dedup_collapses_all_variants(spark, sf_dir):
    from pipeline_query_engine_demo_spark.plans.curation import url_canonical_dedup

    rows = url_canonical_dedup(spark, sf_dir).collect()
    assert rows
    # every logical page collapses its 4 surface variants; the kept
    # representative is the min doc_id of the group (4k..4k+3 -> 4k)
    for r in rows:
        assert r.n_variants == 4
        assert r.keep_doc_id % 4 == 0
        assert "utm_" not in r.canonical_url
        assert "#" not in r.canonical_url
        assert not r.canonical_url.endswith("/")
        assert r.canonical_url.startswith("https://www.example.com/")
