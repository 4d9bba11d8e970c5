"""Benchmark harness: runs the headline query set at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink
(``df.write.format("noop")``) so timings measure the whole plan —
scan, shuffles, joins, Python workers — without driver-collect or
disk-write overhead polluting the number.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline set: one per major engine area (reference replica, agg,
#: star join, window, as-of, time window, dedup pipeline, ANN, text,
#: UDF). Deliberately excludes the bounded-slice and streaming entries
#: (those are correctness surfaces, not throughput ones).
HEADLINE = [
    "flagship_filter_join_limit",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "window_topk_per_group",
    "asof_join_last_purchase",
    "tumbling_window_counts",
    "exact_dedup_docs",
    "near_dup_pairs_docs",
    "cosine_topk_embeddings",
    "ann_lsh_topk_embeddings",
    "ann_hyperplane_topk_embeddings",
    "ivf_topk_embeddings",
    "tfidf_top_terms",
    "text_stats_docs",
    "pandas_udf_grouped_agg_qty",
]

#: Extended section (round 4+): the heavy extension operators the r3
#: verdict flagged for plan quality, the curation capstone, and one
#: real streaming execution — reported separately so the original
#: 17-query headline total stays comparable round-over-round.
EXTENDED = [
    "kmeans_train_embeddings",
    "triangle_count_copurchase",
    "training_manifest_pipeline",
    "streaming_tumbling_window_counts",
    # round-4 session-5: retrieval + sequential-state representatives
    "bm25_topk_docs",
    "mmr_diversified_topk",
    "cusum_change_detection",
    "bfs_reachability_copurchase",
    # round-6 additions: star-contraction clustering, the sketch family,
    # and the spatial grid join — bench_compare treats first-appearance
    # queries as NEW (not checked), so extending the set here doesn't
    # break round-over-round comparability of the prior entries.
    "dedup_clusters_starcontract",
    "kmv_distinct_shingles_by_source",
    "theta_sketch_shingle_overlap",
    "spatial_radius_join_pairs",
    "spatial_od_flows",
    "sequential_pattern_support",
    "duplicated_substring_spans",
    "rrf_hybrid_retrieval",
    "ann_multiprobe_topk_embeddings",
    # round-7 additions: the new graph/spatial/set-similarity operators,
    # the HLL + A-not-B sketch completions, and representatives of the
    # analytics/curation batch (ACF, Gini, t-closeness, STL, Theil-Sen,
    # Zipf, DSIR, PMI, Jaro-Winkler).
    "setsim_prefix_join_docs",
    "shortest_path_weighted_copurchase",
    "skyline_parts_price_size",
    "dbscan_customers_grid",
    "hll_distinct_shingles_by_source",
    "theta_sketch_anotb_difference",
    "acf_daily_event_values",
    "gini_revenue_concentration",
    "t_closeness_audit",
    "stl_decompose_daily_values",
    "theil_sen_daily_trend",
    "zipf_rank_frequency_fit",
    "dsir_importance_selection",
    "pmi_token_cooccurrence",
    "jaro_winkler_linkage_pairs",
    "hilbert_curve_events",
    # round-7 session-2 additions: graph k-core, the sketch-cube /
    # quantile-sketch completions, BPE tokenizer training, and the
    # cogroup API representative.
    "kcore_peel_profile_copurchase",
    "hll_rollup_trailing_parts",
    "quantile_sketch_totalprice",
    "bpe_learn_merges",
    "cogroup_apply_customer_orders",
    "ams_f2_skew_events",
    "label_propagation_communities",
    # round-7 session-3/4 additions: the HITS/statistics batch, the
    # survival/resampling/forecasting family, CDC chunk dedup, and the
    # exact-parity distributed-GD trainer.
    "hits_hubs_authorities",
    "mann_kendall_trend",
    "isotonic_regression_minimax",
    "js_divergence_sources",
    "kaplan_meier_retention",
    "ks_two_sample_acctbal",
    "poisson_bootstrap_ci_acctbal",
    "page_hinkley_drift",
    "pca_2d_parts_by_brand",
    "wasserstein_doc_lengths",
    "cdc_chunk_dedup",
    "permutation_test_mean_diff",
    "markov_entropy_rate",
    "holt_linear_forecast",
    "conformal_interval_daily",
    "negative_sampling_unigram",
    "jackknife_source_loo",
    "logistic_regression_gd",
    "kneser_ney_perplexity",
    "streaming_page_hinkley_alarms",
    "sprt_ab_conversion",
    "naive_bayes_source_classify",
    "gram_matrix_embeddings",
    "time_decayed_engagement",
    "target_encoding_kfold",
    "user_feature_matrix",
    "containment_dedup_pairs",
    "quantile_normalize_lengths",
    "bh_fdr_segment_tests",
    "sax_symbolic_daily",
    # round-8: transformWithStateInPandas gate-real (vendored protobuf)
    "streaming_tws_user_value_totals",
    "join_aqe_skew_split",
    "ps_groupby_agg_events",
    "ps_rolling_weekly_cents",
    "ps_merge_groupby_segments",
    "ridge_regression_normal_eq",
    "gopher_repetition_filter",
    "vocab_coverage_p90",
    "ar1_forecast_daily",
    "python_stream_datasource_rollup",
    "int8_quantized_topk",
    "link_prediction_adamic_adar",
    "calibration_brier_priority",
    "streaming_bloom_membership",
    "nelson_aalen_hazard",
    "bigram_greedy_decode",
    "two_step_transition_probs",
    "sql_pipe_syntax",
    "ps_pivot_table_orders",
    "lsh_bands_recall_sweep",
    "streaming_tws_recent_values",
    # round-9: event-time timers + MapState complete the
    # transformWithState family; the partition-parallel Python
    # streaming source is the 100 TB ingest shape.
    "streaming_tws_session_timer",
    "streaming_tws_map_counts",
    "python_parallel_stream_shards",
    "audio_decode_stats",
    "binary_sign_hamming_topk",
    "matryoshka_truncated_recall",
    "local_clustering_coefficient",
    "keyword_tag_docs",
    "dp_noisy_counts",
    "hash_mod_sample_docs",
    "sql_udf_scalar_and_table",
    "streaming_tws_bootstrap_totals",
    "statestore_offline_read",
    "exists_subquery_customers",
    "sql_identifier_clause",
    "decision_stump_totalprice",
    "ridge_cv_one_pass",
    "udtf_polymorphic_ngrams",
    "not_in_null_semantics",
    "statestore_change_feed",
    "session_window_dynamic_gap",
    "bitmap_distinct_users",
    "rollup_grouping_id",
    # round-11 session-2: Spark 4.0 DF-API subquery builders + Arrow UDF
    "lateral_join_df_api",
    "scalar_subquery_df_api",
    "exists_subquery_df_api",
    "udf_arrow_optimized",
    "insert_with_column_defaults",
    "write_rebalanced_parquet",
    # round-12: the numpy production ANN tiers next to their
    # HOF-expression twins (cosine_topk_embeddings / ivf_topk_embeddings
    # in HEADLINE), so the per-round record carries both sides of the
    # expression-vs-BLAS crossover.
    "numpy_cosine_topk_embeddings",
    "ivf_numpy_topk_embeddings",
    # round-12 session 2: the amortized-index paths (pre-bucketed
    # cogroup corpus; persisted cell-partitioned IVF probed via DPP).
    "numpy_cosine_topk_prebucketed",
    "ivf_index_dpp_topk",
    # round-12: the partitioned-layout family (static + dynamic
    # partition pruning over the Hive-partitioned fact replicas).
    "static_partition_prune_lineitem",
    "dpp_urgent_months_revenue",
    "dpp_events_top_day_mix",
    # round-12 session 3: runtime bloom-filter join pruning — the
    # shuffle-join counterpart of DPP (rows map-side, not directories)
    # — and min/max row-group skipping over a range-clustered layout.
    "bloom_filter_pruned_join",
    "clustered_layout_rowgroup_skip",
    "hilbert_layout_box_skip",
    "dpp_bloom_composed_star",
]

#: HOT tier (r8 verdict item 6 — the extended sweep grows ~linearly with
#: the corpus, ~190 s at 91 rows, and the full 4-execution protocol
#: costs ~4x that): while ITERATING locally, ``SPARK_GRAFT_BENCH_TIER=hot``
#: times the headline set plus this fixed representative slice of the
#: extended set — the most expensive rows (where regressions cost the
#: most wall-clock) plus one delegate per plan family (iterative graph,
#: curation chain, streaming drain, pandas-on-Spark, ps-API join,
#: sketch, ANN, stateful-API). The FULL tier remains the default and is
#: what the per-round record (BENCH_r{N}.json / BENCH_DETAIL.json) must
#: come from — the tripwire (tools/bench_compare.py) needs every row's
#: spread once per round; hot-tier records are tagged "tier": "hot" so
#: they can never be mistaken for a round record.
HOT_EXTENDED = [
    "python_stream_datasource_rollup",
    "logistic_regression_gd",
    "triangle_count_copurchase",
    "training_manifest_pipeline",
    "lsh_bands_recall_sweep",
    "dedup_clusters_starcontract",
    "kmeans_train_embeddings",
    "bpe_learn_merges",
    "streaming_tws_user_value_totals",
    "ps_merge_groupby_segments",
    "kmv_distinct_shingles_by_source",
    "ann_multiprobe_topk_embeddings",
]


def compact_line(payload: dict, detail_path: str, cap: int = 1900) -> str:
    """Serialize the stdout payload under the driver's ~2000-char tail.

    Degrade, never die: all timing work is done and the sidecar holds
    the full detail, so if the compact payload outgrows the cap we shed
    the bulkiest per-query maps (their totals stay) instead of aborting
    a successful run (ADVICE r6: the old assert killed the bench)."""
    line = json.dumps(payload)
    for victim in ("extended", "queries"):
        if len(line) < cap:
            break
        payload.pop(victim, None)
        payload["truncated"] = f"see {os.path.basename(detail_path)}"
        line = json.dumps(payload)
        print(
            f"bench: stdout payload over driver cap; dropped {victim!r} "
            f"(full detail in {detail_path})",
            file=sys.stderr,
        )
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pipeline_query_engine_demo_spark import plans
    from pipeline_query_engine_demo_spark.session import get_spark

    # Concurrent tier (round-10 verdict item 2 made repeatable): when
    # SPARK_GRAFT_BENCH_CONCURRENT=N (N>0), the session launches under
    # the FAIR scheduler and, after the serialized timed pass, the 17
    # headline queries are re-run from N driver threads (one scheduler
    # pool per query) and the aggregate wall is reported as
    # "headline_concurrent_total" — the multiplexing number a shared
    # cluster actually sees. Off by default: the driver's per-round
    # record stays the serialized protocol, byte-compatible with every
    # prior round. tools/concurrency_experiment.py remains the full
    # assertion harness (result + plan fingerprints under concurrency);
    # this flag is the affordable repeat-me dial.
    conc = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_CONCURRENT", "0")))
    spark = get_spark(
        "bench",
        # Bound the AppStatusStore stage retention so the between-runs
        # parallelism snapshots iterate a few hundred summaries, not the
        # whole session's history. UI metadata only — no effect on
        # execution or timings.
        **{
            "spark.ui.retainedStages": "512",
            **({"spark.scheduler.mode": "FAIR"} if conc else {}),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.queries()

    # Untimed warmup pass over the whole set: the first execution of
    # each path pays JVM JIT, codegen compilation, Python-worker
    # spin-up, and shuffle-service init — measured 2-3x inflation on
    # the heavy queries (e.g. the MinHash pipeline 8.7s cold vs 4.5s
    # steady on this box). The timed pass therefore reports
    # steady-state throughput, which is the number that scales to a
    # long-running cluster job and is stable round-over-round.
    def drop_run_blocks() -> None:
        # Unpersist the RDD blocks a run leaves in the block manager
        # (lazy localCheckpoints in the dedup/graph/sweep pipelines).
        # Runs BETWEEN timed runs, never inside one: every rep rebuilds
        # its DataFrames from the parquet inputs, so no later run can
        # reference an earlier run's checkpoint blocks — leaving them
        # pinned only AGES the session (r12 session 5 measured late-
        # session warm reps inflating 1.5-2x vs a fresh session on
        # identical plans: thousands of dead persisted RDDs by the 4th
        # corpus pass). This is cleanup, the opposite of caching —
        # nothing is precomputed or reused across runs, and the timed
        # window is unchanged.
        # unpersist(True) — blocking (r12 ADVICE): non-blocking removal
        # proceeds asynchronously and can overlap the NEXT timed run,
        # reintroducing a sliver of the cross-run interference this
        # cleanup exists to remove.
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            try:
                it.next().getValue().unpersist(True)
            except Exception:
                pass  # already cleaned by the ContextCleaner

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        drop_run_blocks()
        return dt

    # Tiering (see HOT_EXTENDED): "full" (default, the per-round record)
    # times every extended row; "hot" times the representative slice —
    # the affordable inner loop while iterating locally.
    tier = os.environ.get("SPARK_GRAFT_BENCH_TIER", "full")
    ext_names = EXTENDED if tier == "full" else [
        q for q in EXTENDED if q in HOT_EXTENDED
    ]

    # Per-query parallelism evidence (r12 verdict item 2: the flat
    # 8-vs-32-core wall ratios at sf0.1 were flagged as "cpus ignored";
    # they are actually driver-latency-bound plans, and this proves it
    # the direct way): around each query's COLD pass — never inside a
    # timed window — snapshot the AppStatusStore stage list and record
    # the max task count any single stage ran with, the stage count, and
    # the summed executor run time. At CPUS=32 a fanned query shows
    # 32-wide stages and the same executor-ms as at CPUS=8 with 8-wide
    # stages; wall stays flat because scheduling, not compute, is the
    # local floor. The timed methodology is unchanged — these reads
    # happen between runs, on an already-finished query.
    _jsc = spark.sparkContext._jsc
    _jvm = spark._jvm
    _gw = spark.sparkContext._gateway

    def stage_snapshot() -> dict:
        store = _jsc.sc().statusStore()
        stages = store.stageList(
            _jvm.java.util.ArrayList(),
            False,
            False,
            _gw.new_array(_jvm.double, 0),
            _jvm.java.util.ArrayList(),
        )
        out, it = {}, stages.iterator()
        while it.hasNext():
            s = it.next()
            out[(s.stageId(), s.attemptId())] = (
                s.numCompleteTasks(),
                s.executorRunTime(),
            )
        return out

    # The warmup pass IS a cold pass — time it too, so the JSON carries
    # both cold (first-execution, comparable to r2's single-warmup runs)
    # and warm (steady-state, the number that scales to a long-running
    # job) without any extra wall-clock.
    par: dict[str, dict] = {}
    cold = {}
    _prev_snap = stage_snapshot()
    for name in HEADLINE + ext_names:
        cold[name] = run(name)
        _snap = stage_snapshot()
        _new = [v for k, v in _snap.items() if k not in _prev_snap]
        _prev_snap = _snap
        if _new:
            par[name] = {
                "max_stage_tasks": max(v[0] for v in _new),
                "stages": len(_new),
                "exec_ms": int(sum(v[1] for v in _new)),
            }

    # Since r5 (r4 verdict item 1): n warm reps per query, reporting the
    # per-query MEDIAN under the same "queries"/"extended" keys (so the
    # headline stays comparable round-over-round) plus the [min, max]
    # spread — a single hot neighbor process can no longer masquerade as
    # a regression, and a real one shows up in the spread.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    def median_run(name: str) -> tuple[float, float, float, int]:
        # Round-10 (verdict item 4): sub-second rows carry the largest
        # RELATIVE noise (scheduler jitter is a fixed cost), and they
        # produced r9's false noise-band "regressions" — so once the
        # first `reps` land under 1 s, take two extra reps and report
        # the median of all of them. Multi-second rows keep the plain
        # `reps`-median so the series stays comparable across rounds.
        ts = sorted(run(name) for _ in range(reps))
        if ts[len(ts) // 2] < 1.0:
            ts = sorted(ts + [run(name) for _ in range(2)])
        n = len(ts)
        if n % 2:
            m = ts[n // 2]
        else:
            m = round((ts[n // 2 - 1] + ts[n // 2]) / 2, 3)
        # n is reported per-row (detail sidecar "rep_counts"): a row
        # whose median straddles 1 s can get 5 reps one round and 3 the
        # next, so cross-round comparisons need the count to be visible.
        return m, ts[0], ts[-1], n

    med = {name: median_run(name) for name in HEADLINE}
    med_ext = {name: median_run(name) for name in ext_names}
    timings = {n: v[0] for n, v in med.items()}
    extended = {n: v[0] for n, v in med_ext.items()}

    payload = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Methodology (since r3): a full first pass precedes the
        # timed pass, so headline numbers are warm steady-state —
        # NOT comparable to r2's cold-start run. The first pass's
        # own timings are reported under "cold" (detail file). Since
        # r5 the warm numbers are medians of `reps` runs.
        "warm": True,
        "reps": reps,
        "extended_total": round(sum(extended.values()), 3),
        "tier": tier,
        "extended": extended,
        "cold_headline_total": round(sum(cold[n] for n in HEADLINE), 3),
        # r11 advisor: with SPARK_GRAFT_BENCH_CONCURRENT>0 the WHOLE
        # session runs under FAIR (the flag sets spark.scheduler.mode at
        # session build), so even the "serialized timed pass" in that run
        # executed under FAIR, not the default FIFO — such a record mixes
        # protocols and must never be used as the tripwire baseline
        # (tools/exit_chain.sh's guard rejects scheduler != FIFO, same as
        # the hot-tier rule).
        "scheduler": "FAIR" if conc else "FIFO",
        # Parallelism evidence (additive, r12 verdict item 2): cpus is
        # the session's actual defaultParallelism (proves the env var
        # took effect); the aggregate shows how many queries ran at
        # least one stage at >= half the cluster width. Per-query
        # breakdown in the detail sidecar under "parallelism".
        "cpus": spark.sparkContext.defaultParallelism,
    }
    _widths = sorted(p["max_stage_tasks"] for p in par.values())
    if _widths:
        payload["parallelism"] = {
            "max_stage_tasks_p50": _widths[len(_widths) // 2],
            "max_stage_tasks_max": _widths[-1],
            "queries_ge_half_cpus": sum(
                1 for w in _widths if w * 2 >= payload["cpus"]
            ),
            "n_measured": len(_widths),
        }
    if conc:
        from concurrent.futures import ThreadPoolExecutor

        def run_pooled(name: str) -> float:
            # Thread-local property: each query gets its own FAIR pool,
            # so the fair share is per-query, matching
            # tools/concurrency_experiment.py.
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            return run(name)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=conc) as ex:
            list(ex.map(run_pooled, HEADLINE))
        payload["headline_concurrent_total"] = round(time.perf_counter() - t0, 3)
        payload["concurrent_threads"] = conc
    # Full detail (per-rep spreads + per-query cold timings) goes to a
    # sidecar file, NOT stdout: the driver keeps only the last ~2000
    # chars of stdout, and round 5's spread-laden single line blew past
    # that and was recorded unparsed (BENCH_r05.json parsed: null). The
    # stdout line stays compact and driver-parseable; bench_compare.py
    # reads the sidecar.
    detail = dict(payload)
    # Cold-vs-warm attribution (r10 verdict item 7): the gap is session
    # fixed costs + per-query first-execution codegen, measured by
    # tools/coldstart_profile.py (r11 numbers: JVM launch 5.5 s, first
    # action 3.3 s, first Parquet scan 1.3 s, Python worker pool 1.0 s,
    # then ~1.9 s/query cold-vs-warm codegen delta — q1 3.1 s -> 1.2 s).
    detail["coldstart_attribution"] = "tools/coldstart_profile.py"
    detail["spread"] = {n: [v[1], v[2]] for n, v in med.items()}
    detail["extended_spread"] = {n: [v[1], v[2]] for n, v in med_ext.items()}
    detail["rep_counts"] = {
        **{n: v[3] for n, v in med.items()},
        **{n: v[3] for n, v in med_ext.items()},
    }
    detail["cold"] = cold
    detail["parallelism"] = par
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)

    print(compact_line(payload, detail_path))


if __name__ == "__main__":
    main()
