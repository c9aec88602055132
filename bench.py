"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count() materializes the full plan);
a warmup pass on sf0.001 triggers JVM/codegen warmup so timings reflect
steady-state execution, not JIT noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vptstools_spark.analytics import all_queries
from vptstools_spark.session import get_spark

#: headline queries: one per operator family, heaviest variants
HEADLINE = [
    "pricing_summary",
    "top_unshipped",
    "region_revenue",
    "brand_revenue",
    "window_top_orders",
    "rollup_orders",
    "cube_orders",
    "quantiles_price",
    "events_sessionize",
    "events_asof_join",
    "inv_coverage",
    "exists_late_shipment",
    "small_qty_revenue",
    "order_count_dist",
    "large_orders",
    "disjunctive_revenue",
    "nation_trade",
    "cheapest_supplier",
    "lone_late_supplier",
    "moving_avg_range",
    "dedup_ngram_jaccard",
    "dedup_lsh_verified",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_embedding",
    "knn_bruteforce",
    "ann_buckets",
    "ann_ivf",
    "embedding_quantize",
    "embedding_pq",
    "text_quality",
    "text_langid",
    "text_repetition",
    "vocab_topk",
    "tfidf_top",
    "bigram_counts",
    "fuzzy_part_match",
    "pipeline_filter",
    "latest_order",
    "pack_sequences",
    "decontam_ngrams",
    "dedup_semantic",
    "text_perplexity",
    "pii_scrub",
    # round 3 additions
    "doc_chunks",
    "retention_cohorts",
    "profile_documents",
    "pagerank_trade",
    "ts_subseq_match",
    "quality_classifier",
    "sketch_hll_distinct",
    "sketch_bloom_join",
    "dq_orders",
    "bpe_merges",
    "bm25_search",
    "triangle_parts",
    "inverted_index",
    "winsorize_price",
    "curation_report",
    "entity_resolution",
    "label_prop_communities",
    "scd2_event_types",
    "sample_weighted",
    # round 3, second batch. simjoin_prefix stays out of the median-of-5
    # headline tier because its sf0.1 answer is inherently ~5.1M pairs on
    # the 31-word-vocabulary corpus (r5's replica collapse + array verify
    # cut it 94 s → ~25 s, but 5× runs of an output-bound join would
    # dominate the tier); it is timed on realistic text in the Zipf tier
    # and on this corpus once per round in the sf0.1 sweep (see PLANS.md).
    "hybrid_rrf",
    "dsir_select",
    "bpe_encode",
    "ann_filtered",
    # round 4 additions
    "snapshot_diff",
    "sync_segments",
    "tt_version_diff",
    "bloom_point_lookup",
    "drift_ks",
    "ts_cusum",
    "events_resample_interp",
    "link_prediction",
    "events_markov",
    "mi_lang_source",
    "rfm_segments",
    "robust_stats",
    "mm_bmp_patches",
    "mv_rollup_orders",
    "hll_rollup",
    "returned_item_report",
    "events_funnel_windowed",
    "mm_wav_features",
    "kcore_parts",
    "sample_temperature",
    # round 5
    "mv_filtered_route",
    "forecast_revenue",
    "skew_report",
    "drift_js",
    "events_dwell_time",
    "dedup_cluster_sizes",
    "ship_latency",
    "attribution_last_touch",
    "revenue_mom",
    "dv_delete_read",
    "secure_customer_view",
    "cdf_order_changes",
    "wap_audit_publish",
    "sketch_moments_rollup",
    "events_asof_nearest",
    "jv_orders_refresh",
    "table_stats_orders",
    # round 5, second batch (lakehouse wave 2 + CBO). The versioned-table
    # builders memoize per (query, sf) in _TT_CACHE, so medians measure
    # steady-state reads, not the one-time table build.
    "join_order_sales",
    "pe_evolved_scan",
    "tt_rename_scan",
    "stats_incremental_orders",
    "hp_pruned_scan",
    # round 6 (OCC rebase, equality deletes, file skipping, auto-ANALYZE,
    # hours transform, zero-scan CDC merge) — table builders memoized in
    # _TT_CACHE as before, so medians measure steady-state reads
    "occ_rebase_commits",
    "dv_equality_read",
    "cdc_eq_merge",
    "fs_skipped_scan",
    "hp_hours_scan",
    "auto_analyze_join",
    # round 6, second batch (mergeable quantile sketch, incremental BM25
    # index, feature-store PIT join, histogram CBO, skyline, mixture
    # materialization)
    "sketch_qhist_rollup",
    "text_index_search",
    "feature_pit_join",
    "hist_selectivity_orders",
    "skyline_parts",
    "mixture_materialize",
    "mv_percentile_route",
    "metadata_rowcount",
    "dedup_keep_best",
    # round 6, third batch (clone, z-order cluster commit, type widening,
    # GDPR lifecycle, exact bitmaps, weighted SSSP, privacy gate,
    # containment dedup, hopping windows). Versioned fixtures memoize per
    # (query, sf) as before: medians measure steady-state reads.
    "clone_divergence",
    "cluster_pruned_scan",
    "tt_widen_scan",
    "gdpr_erasure",
    "bitmap_distinct_rollup",
    "sssp_trade",
    "k_anonymity_customer",
    "dedup_containment",
    "events_hop_window",
    "intersect_loyal_customers",
    "chi2_nation_segment",
    "text_readability",
    "seasonal_revenue",
    # round 6, statistical-inference / ML-analytics batch: one fact scan
    # each (Welch/Benford/KM/Gini), pair mining over collapsed baskets,
    # fixed-iteration HITS/PCA, mapInPandas Gramian, windowed attribution
    "ab_test_welch",
    "benford_prices",
    "kaplan_meier",
    "basket_lift",
    "gini_by_nation",
    "emb_covariance",
    "pca_loadings",
    "hits_nation",
    "ewma_revenue",
    "attribution_linear",
    "attribution_time_decay",
    "events_trigrams",
    # round 6, ML-prep batch: hash-Poisson bootstrap (32x explode,
    # map-side collapse), LOO target encoding, per-group OLS + outliers,
    # inter-source KL, Zipf fit
    "bootstrap_ci_revenue",
    "target_encoding",
    "regr_residual_outliers",
    "kl_sources",
    "zipf_fit",
    # round 6, spatial: grid-binned proximity join (3x3 neighbor
    # replication + haversine verify — never the cross product)
    "geo_proximity_join",
    # round 6: in-engine Naive Bayes train+score (two training aggregates,
    # broadcast likelihood table, per-doc argmax)
    "nb_langid",
    # round 6: ALS alternation — one aggregate + closed-form 2x2 solve per
    # entity per half-step, two shuffles per iteration at any matrix size
    "als_factors",
    "conversion_ztest",
    "markov_next_event_eval",
    # round 6: exact rolling distinct from mergeable day-bitmaps
    "rolling_distinct_users",
    # round 6: per-key ordered EWMA fold (explicit fold order, engine-exact)
    "user_value_ewma",
    # round 6: DiD causal readout + Hill heavy-tail index
    "did_estimate",
    "hill_tail_index",
    "mahalanobis_outliers",
    # round 6: PMI collocations + min-plus APSP squaring
    "pmi_bigrams",
    "apsp_nations",
    "qq_event_values",
    "info_gain_features",
    "negative_samples",
    "theil_sen_trend",
    "cohort_ltv",
    "als_recommend",
    "mann_kendall",
    "segment_migration",
    "jackknife_ratio",
    "lexical_diversity",
    "event_burstiness",
    "geo_nearest_supplier",
    "funnel_time_percentiles",
    "odds_ratio",
    "repeat_purchase_interval",
]

#: sf0.1-scale tier on the Zipf-vocabulary fixture (tools/gen_zipf.py):
#: the df-sensitive text operators measured on realistically-shaped text
#: (~50k Zipf vocab) instead of the harness's degenerate ~31-word one.
#: simjoin_prefix lives here — with PPJoin's positional filter it runs in
#: ~2 s at this scale on Zipfian data (vs 60 s on the 31-word corpus, where
#: candidates approach all-pairs by construction; see PLANS.md).
ZIPF_QUERIES = [
    "simjoin_prefix",
    "tfidf_top",
    "bm25_search",
    "dedup_minhash_lsh",
    # round 4: the rest of the df-sensitive text stack on realistic text
    "vocab_topk",
    "inverted_index",
    "bpe_merges",
    "text_repetition",
    # round 5: the production near-dup path on realistic text — candidate
    # counts here are governed by real shingle df, not the harness's
    # degenerate vocab or the sf1 fixture's exact-replica pairs
    "dedup_lsh_verified",
    # round 6: the asymmetric near-subset score on realistic df
    "dedup_containment",
]
ZIPF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "zipf0.1")

#: sf1.0 scale probe (tools/gen_sf1.py: deterministic 10× key-shifted
#: replication of sf0.1 — TPC-H sf1 row counts): the 10 most expensive
#: headline queries, single-run. The point is the RATIO vs the sf0.1
#: headline column: linear-or-better scaling validates the plan audit's
#: 100× story; a superlinear ratio is a found cliff (VERDICT r3 #2).
SF1_QUERIES = [
    "curation_report",
    "pagerank_trade",
    "dedup_lsh_verified",
    "dedup_ngram_jaccard",  # rejoined the linear-contract tier in r5: the
    # exact baseline's replica collapse (operators/dedup.py:jaccard_pairs)
    # runs the quadratic core over UNIQUE shingle sets, so the replica-built
    # sf1 fixture scales ~1.8× per 10× (was the measured 24× of r4)
    "label_prop_communities",
    "entity_resolution",
    "dedup_clusters",
    "sketch_bloom_join",
    "lone_late_supplier",
    "top_unshipped",
    "ann_filtered",
    # round 6: weighted SSSP and the asymmetric exact-dedup form join the
    # linear-contract tier (frontier rounds / replica collapse argue the
    # asymptotics; this measures them)
    "sssp_trade",
    "dedup_containment",
    # round 6, analytics wave: the 32x-explode bootstrap (map-side
    # collapse), basket pair mining (basket-width-bounded), one ALS
    # alternation (2 shuffles at any matrix size), vocabulary-bounded KL
    "bootstrap_ci_revenue",
    "basket_lift",
    "als_factors",
    "kl_sources",
    # round 7 (VERDICT r6 #8): the heaviest remaining analytics with
    # nontrivial shuffle profiles — iteration-heavy HITS, the moments+
    # stats-back-join OLS outlier scan, vocabulary-likelihood NB, and the
    # train/test transition-matrix eval
    "hits_nation",
    "regr_residual_outliers",
    "nb_langid",
    "markov_next_event_eval",
    # round 8 (VERDICT r7 #7): the r7 analytics wave's heaviest shuffle
    # profiles — KM's conditional self-joins, the isotonic minimax
    # interval table, and the day-table ACF self-joins
    "kaplan_meier",
    "isotonic_calibration",
    "acf_daily_revenue",
    # round 9 (VERDICT r8 #8): the r8 analytics wave's two nontrivial
    # shuffle profiles — the group×group contrast join and triangle
    # enumeration's wedge join
    "pairwise_mean_contrasts",
    "local_clustering",
]
# (round-8 analytics wave joins HEADLINE below)
#: quadratic-by-construction exact baselines, explicitly EXEMPT from the
#: linear-scaling contract of the sf1 probe (VERDICT r4 #1/#3): still run
#: and recorded — honesty means measuring them — but under their own key so
#: the probe tier's "everything here scales ≲ linearly" claim stays true.
#: (Emptied in r5: replica collapse made the one former member probe-honest
#: on the replicated fixture; a corpus of 10× UNIQUE near-dup sets would
#: still be quadratic for it — that shape is what dedup_lsh_verified is for.)
SF1_EXEMPT_BASELINES: list[str] = []
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "sf1")

#: sf1 probes re-timed at LOW core count for the core-scaling evidence
#: (VERDICT r9 #7): at sf0.1 ~175/181 headline queries are sub-second and
#: scheduler-bound, so their 8-vs-32-core ratio says nothing about plan
#: parallelism; these six are the sf1 tier's data-bound, shuffle-heavy
#: probes, where a serial plan would show ratio ≈ 1 and a parallel one
#: ratio >> 1. Kept to six (median-of-3 at 8 cores is minutes, not
#: seconds) — the selection is the evidence, not a silent cap: the other
#: probes' 32-core sf1 medians are still in sf1_probe.
SF1_SCALE_QUERIES = [
    "curation_report",
    "pagerank_trade",
    "dedup_lsh_verified",
    "sssp_trade",
    "als_factors",
    "nb_langid",
]
SF1_SCALE_LOW_CPUS = 8


def _calibration(spark) -> dict:
    """Fixed CPU-bound calibration kernels run with EVERY bench (VERDICT
    r5 #4): this host's same-code timings drift ±25% between runs (see
    PLANS.md variance note), so per-query comparisons across rounds
    should be read as ratios NORMALIZED by the calibration — a query
    that moved 1.5× while the kernel moved 1.5× is host noise, not a
    regression. Two kernels bracket the two cost regimes: a whole-stage
    -codegen aggregation (JVM ALU throughput — what most queries
    bottleneck on) and a pure-Python loop (driver/PySpark overhead
    paths). Both are IO-free and deterministic in size."""
    import hashlib

    def jvm_kernel():
        spark.range(0, 100_000_000, 1, 32).selectExpr(
            "sum(hash(id, id * 2654435761)) AS h"
        ).collect()

    def py_kernel():
        h = hashlib.md5()
        for i in range(400_000):
            h.update(str(i).encode())
        return h.hexdigest()

    return {
        "jvm_hash_agg_sec": round(_median_runs(jvm_kernel, 3), 3),
        "python_md5_loop_sec": round(_median_runs(py_kernel, 3), 3),
    }


def _sf1_lakehouse(spark) -> dict:
    """sf1 lakehouse mini-tier (VERDICT r5 #8): churn a fraction of a
    VERSIONED sf1 fact table and measure the maintenance surfaces that
    claim O(changed data) — MOR upsert, change-feed read, incremental
    ANALYZE — against the O(table) contrasts (full re-analyze, initial
    build). Churn is PARTITION-CLUSTERED (all rows of 1 vs 4 of the 16
    partitions): the O(changed data) claim is really O(files the change
    touches) — a MOR upsert's vectors hit every file holding a churned
    key, so uniformly SCATTERED churn degrades the feed and the
    incremental ANALYZE toward a full-table read (hit files = all
    files); that shape is measured too (upsert_mor_scattered) rather
    than hidden — clustered CDC is the layout contract, as in
    Delta/Iceberg. The recorded claim: 4-partition churn ≈ 4× the
    variable cost of 1-partition, and the feed / incremental ANALYZE
    after clustered churn sit below their full-table counterparts.
    Rebuilt fresh each run under a temp dir (the build itself is the
    O(table) yardstick)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from vptstools_spark.plans.stats import (
        analyze_table_sketched,
        incremental_analyze,
    )
    from vptstools_spark.plans.maintenance import compact_versioned_table
    from vptstools_spark.plans.timetravel import (
        commit_initial,
        commit_upsert_mor,
        read_version,
        table_changes,
    )

    out: dict[str, float] = {}
    root = tempfile.mkdtemp(prefix="bench_sf1_lake_")
    path = os.path.join(root, "orders")
    try:
        o = spark.read.parquet(os.path.join(SF1_DIR, "orders.parquet")).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            (F.col("o_orderkey") % 16).cast("int").alias("part"),
        )

        def timed(key, fn):
            t0 = time.perf_counter()
            fn()
            out[key] = round(time.perf_counter() - t0, 3)

        # cluster rows by partition before the write: one file per
        # partition per commit, the layout the churn arithmetic assumes
        timed(
            "build_initial",
            lambda: commit_initial(o.repartition("part"), path, ["part"]),
        )

        def delta(parts):  # every row of the given partitions, perturbed
            return o.filter(F.col("part").isin(parts)).withColumn(
                "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
            ).repartition("part")

        timed(
            "upsert_mor_1part",
            lambda: commit_upsert_mor(spark, path, delta([3]), ["o_orderkey"]),
        )
        timed(
            "upsert_mor_4part",
            lambda: commit_upsert_mor(
                spark, path, delta([1, 5, 9, 13]), ["o_orderkey"]
            ),
        )
        timed(
            "upsert_mor_scattered",  # the documented degraded shape
            lambda: commit_upsert_mor(
                spark,
                path,
                o.filter(F.col("o_orderkey") % 16 == 0).repartition("part"),
                ["o_orderkey"],
            ),
        )
        timed(
            "cdf_feed_1part_commit",
            lambda: table_changes(spark, path, 0, 1).count(),
        )
        incremental_analyze(spark, path)  # seed sketches (full pass, untimed)
        # one untimed churn+refresh cycle warms the incremental plan
        # shape (codegen + vdir schema memo) — the timed number below is
        # the STEADY state, which is what a repeatedly-run maintenance
        # pass actually costs (same reasoning as the probe tier's
        # median-of-3; the full-contrast side is already warm from the
        # seed pass)
        commit_upsert_mor(spark, path, delta([11]), ["o_orderkey"])
        incremental_analyze(spark, path)
        commit_upsert_mor(
            spark, path, delta([7]), ["o_orderkey"]
        )  # 1-partition churn
        timed(
            "incremental_analyze_after_churn",
            lambda: incremental_analyze(spark, path),  # the O(delta) claim
        )
        timed(
            "full_reanalyze_contrast",
            lambda: analyze_table_sketched(read_version(spark, path)),
        )
        timed(
            "compact_pass",
            lambda: compact_versioned_table(spark, path, min_files=2),
        )
        timed("snapshot_read", lambda: read_version(spark, path).count())
        # reading guide, recorded with the numbers: at sf1 (1.5M rows,
        # ~0.1 GB) fixed per-job constants (~0.5 s/job on this host, and
        # the incremental path runs several jobs: feed assembly, sketch
        # union, sidecar write) dominate every entry — the asymptotic
        # content is the DIFFERENCES (4-part vs 1-part churn) and the
        # feed reading only the churned partitions' files, not totals
        # beating a 0.1 GB full scan.
        out["table_rows"] = read_version(spark, path).count()
    except Exception as e:  # visible failure, never silent
        out["error"] = str(e)[:200]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


ODIM_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "odim_ingest"
)


def _odim_ingest(spark) -> dict:
    """ODIM-ingest tier (VERDICT r7 #1): the reference's actual headline
    pipeline — many small HDF5 VP files → decode → daily VPTS CSV →
    monthly gzip CSV — measured end-to-end on a synthesized fleet
    (tools/gen_odim.py: byte-patched real ODIM files, 4 radars × 3 days
    × 96 timestamps ≈ 1150 × ~25 KB). Records the task-PACKING evidence
    for the S1 100 TB design claim (binaryFile + files.maxPartitionBytes
    packs many small files per task, SURVEY §7.4.4): `n_files`,
    `scan_tasks`, and `files_per_task` come straight from the scan plan,
    and tests/test_pipeline.py asserts files_per_task > 1 mechanically."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tools.gen_odim import main as gen_odim
    from vptstools_spark.operators.pipeline import (
        daily_vpts_job,
        monthly_vpts_job,
    )
    from vptstools_spark.sources.odim import read_vp_files

    out: dict = {}
    tmp = tempfile.mkdtemp(prefix="bench_odim_")
    try:
        n_files = gen_odim(ODIM_DIR)
        out["n_files"] = n_files
        # reference layout nests {radar}/{yyyy}/{mm}/{dd}/ — glob to files
        glob = os.path.join(ODIM_DIR, "*", "*", "*", "*")
        profiles = read_vp_files(spark, glob)
        # task packing: partitions of the binaryFile scan == Spark tasks;
        # >1 file/task is the small-file packing the design claims
        scan_tasks = profiles.rdd.getNumPartitions()
        out["scan_tasks"] = scan_tasks
        out["files_per_task"] = round(n_files / max(scan_tasks, 1), 1)

        t0 = time.perf_counter()
        n_rows = profiles.count()
        decode_sec = time.perf_counter() - t0
        out["profile_rows"] = n_rows
        out["read_decode_sec"] = round(decode_sec, 3)
        out["decode_rows_per_sec"] = round(n_rows / decode_sec)
        out["decode_files_per_sec"] = round(n_files / decode_sec)

        # daily job over ALL radar-days (full backfill shape)
        days = (
            read_vp_files(spark, glob)
            .select(
                F.col("radar").alias("radar_code"),
                F.date_format("ts", "yyyyMMdd").alias("date"),
            )
            .distinct()
        )
        daily_dir = os.path.join(tmp, "daily")
        t0 = time.perf_counter()
        daily_vpts_job(
            spark, read_vp_files(spark, glob), days, daily_dir
        )
        out["daily_job_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        monthly_vpts_job(spark, daily_dir, os.path.join(tmp, "monthly"))
        out["monthly_job_sec"] = round(time.perf_counter() - t0, 3)
        out["e2e_files_per_sec"] = round(
            n_files
            / (decode_sec + out["daily_job_sec"] + out["monthly_job_sec"])
        )

        # streaming face of S1: the same fleet through the Spark-4
        # Python DataSource (readStream.format('odim'), availableNow) —
        # measures the incremental-ingest path the cron pipeline uses,
        # checkpointed file-watermark offsets included
        from vptstools_spark.sources.odim_datasource import OdimDataSource

        try:
            spark.dataSource.register(OdimDataSource)
        except Exception:
            pass  # already registered in this session
        s_out = os.path.join(tmp, "s_out")
        t0 = time.perf_counter()
        qs = (
            spark.readStream.format("odim")
            .load(ODIM_DIR)
            .writeStream.format("parquet")
            .option("path", s_out)
            .option("checkpointLocation", os.path.join(tmp, "s_ck"))
            .trigger(availableNow=True)
            .start()
        )
        qs.awaitTermination()
        s_sec = time.perf_counter() - t0
        out["stream_ingest_sec"] = round(s_sec, 3)
        out["stream_files_per_sec"] = round(n_files / s_sec)
        out["stream_rows"] = spark.read.parquet(s_out).count()
    except Exception as e:  # visible failure, never silent
        out["error"] = str(e)[:200]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _cold_builds(spark, sf_dir: str) -> dict:
    """Cold one-time-build tier (VERDICT r8 #5, no-silent-caps): the
    memoized fixtures (_BPE_CACHE, _TIX_CACHE, _ILSH_CACHE, _TT_CACHE)
    deliberately keep the per-query medians measuring steady-state READS
    — but that hid the build costs from every timed tier. This tier
    times each build once per round, from scratch, into throwaway dirs
    (the query caches are untouched, so timed-tier semantics do not
    change)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    out: dict = {}
    tmp = tempfile.mkdtemp(prefix="bench_cold_")
    try:
        # BPE merge training (the _BPE_CACHE build)
        from vptstools_spark.analytics.corpus_q import _BPE_ITERS, _doc_vocab
        from vptstools_spark.operators.bpe import bpe_train

        t0 = time.perf_counter()
        bpe_train(_doc_vocab(spark, sf_dir), iters=_BPE_ITERS)
        out["bpe_train_sec"] = round(time.perf_counter() - t0, 3)

        # full-text index: initial build, then the incremental refresh
        # after the standard churn (the _TIX_CACHE build, split into its
        # two one-time phases)
        from vptstools_spark.operators import text_index as tix
        from vptstools_spark.plans.timetravel import (
            commit_append,
            commit_initial,
            delete_where,
            update_where,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = os.path.join(tmp, "tix_corpus")
        idx = os.path.join(tmp, "tix_idx")
        commit_initial(d, corpus, [])
        t0 = time.perf_counter()
        tix.build_text_index(spark, corpus, idx)
        out["text_index_build_sec"] = round(time.perf_counter() - t0, 3)
        delete_where(spark, corpus, "doc_id % 10 = 3")
        update_where(
            spark, corpus, "doc_id % 10 = 4",
            {"text": "concat(text, ' spark spark spark')"},
        )
        commit_append(
            spark, corpus,
            d.filter(F.col("doc_id") % 10 == 7).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(F.lit("spark window hash "), F.col("text")).alias("text"),
            ),
        )
        t0 = time.perf_counter()
        tix.refresh_text_index(spark, corpus, idx)
        out["text_index_refresh_sec"] = round(time.perf_counter() - t0, 3)

        # incremental-LSH registry build, both shards (the _ILSH_CACHE build)
        from vptstools_spark.operators.dedup import incremental_lsh_dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        reg = os.path.join(tmp, "ilsh_reg")
        t0 = time.perf_counter()
        a0, _ = incremental_lsh_dedup(
            spark, reg, docs.filter(F.col("doc_id") < 300)
        )
        a0.count()
        a1, _ = incremental_lsh_dedup(
            spark, reg, docs.filter(F.col("doc_id") >= 300)
        )
        a1.count()
        out["lsh_registry_build_sec"] = round(time.perf_counter() - t0, 3)

        # heaviest versioned-table build at this sf (the _TT_CACHE
        # orders build: initial commit + keyed upsert with tombstones)
        from vptstools_spark.plans.timetravel import commit_upsert

        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice", "o_orderstatus",
            (F.col("o_orderkey") % 8).cast("int").alias("part"),
        )
        path = os.path.join(tmp, "tt_orders")
        t0 = time.perf_counter()
        commit_initial(o, path, ["part"])
        delta = (
            o.filter(
                (F.col("o_orderkey") % 89 == 0) | (F.col("o_orderkey") % 97 == 0)
            )
            .withColumn(
                "o_totalprice",
                F.when(
                    F.col("o_orderkey") % 89 == 0,
                    F.col("o_totalprice") + F.lit(1.0),
                ).otherwise(F.col("o_totalprice")),
            )
            .withColumn("is_delete", F.col("o_orderkey") % 97 == 0)
        )
        commit_upsert(
            spark, path, delta, keys=["o_orderkey"], delete_col="is_delete"
        )
        out["versioned_orders_build_sec"] = round(
            time.perf_counter() - t0, 3
        )
    except Exception as e:  # visible failure, never silent
        out["error"] = str(e)[:200]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _release_query_caches() -> None:
    """Between-tier cache hygiene (r9, guide §5: caching competes with
    execution memory). The dedup pair family persists its shingle /
    stats / mask tables per (query, sf) plan shape and deliberately
    keeps them across the repeated runs a tier times (the r8 VERDICT #1
    design) — but entries from a FINISHED tier are dead weight for the
    next one: after the 181-query sf0.1 headline tier, MEMORY_ONLY
    storage is full enough that the sf1 tier's own persists evict and
    recompute mid-median, which is exactly the r8 driver's
    dedup_containment flag (4.82 s there vs 2.51 s idle) and this
    round's 8.9 s dedup_ngram_jaccard reading (isolated sf1 min-of-3:
    2.7 s). Releasing between tiers only drops caches no later tier can
    reuse — every timed query still computes from the parquet inputs
    and rebuilds its own tier's persists on its warmup/first run."""
    from vptstools_spark.operators.dedup import release_cached_intermediates

    release_cached_intermediates()


def _median_runs(fn, n: int) -> float:
    """Median of n executions (n >= 3, odd). The FIRST run at a given sf
    includes JVM JIT/codegen compilation; the median of an odd sample is
    robust to both that cold run and a single GC-pause outlier, and unlike
    min-of-N it cannot understate a real regression (VERDICT r4 #3: the
    round-over-round comparison needs an estimator whose error is symmetric).
    """
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # local-iteration knob: comma-separated tier subset (default: all).
    # The driver runs `python bench.py` with no env → every tier runs.
    tiers = set(
        os.environ.get(
            "SPARK_GRAFT_BENCH_TIERS",
            "headline,zipf,sf1,sf1lake,sf1scale,sweep,sweep01,calibration,odim,cold,correctness",
        ).split(",")
    )
    spark = get_spark("vptstools_spark_bench")
    queries = all_queries()

    if tiers == {"sf1c8"}:
        # low-core child mode (spawned by the sf1scale tier): time ONLY
        # the scale probes at this process's core count and print one
        # JSON line for the parent to parse. Never archives.
        low: dict[str, float] = {}
        for name in SF1_SCALE_QUERIES:
            try:
                low[name] = round(
                    _median_runs(
                        lambda: queries[name](spark, SF1_DIR).count(), 3
                    ),
                    3,
                )
            except Exception:
                low[name] = -1.0
        print(
            json.dumps(
                {
                    "metric": "sf1_probe_lowcore",
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                    "queries": low,
                }
            )
        )
        return

    # tier 0: calibration kernels — run FIRST (before any query warms
    # caches) so the recorded host speed brackets the whole run
    calibration = _calibration(spark) if "calibration" in tiers else {}

    # warmup: run every headline query once at the smallest sf
    warm_dir = "/root/testdata/sf0.001"
    if "headline" in tiers and os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                queries[name](spark, warm_dir).count()
            except Exception:
                pass

    # median-of-5 per query (see _median_runs): the headline number is the
    # steady-state median, robust to JIT warmup and GC-pause outliers in
    # both directions.
    timings: dict[str, float] = {}
    if "headline" in tiers:
        for name in HEADLINE:
            timings[name] = round(
                _median_runs(lambda: queries[name](spark, sf_dir).count(), 5), 3
            )

    # tier 1b: Zipf-vocabulary text tier (sf0.1-scale documents, realistic
    # token distribution) — regenerated deterministically if absent
    zipf: dict[str, float] = {}
    if "zipf" in tiers:
        _release_query_caches()
        if not os.path.isdir(ZIPF_DIR):
            from tools.gen_zipf import main as gen_zipf  # noqa: PLC0415

            gen_zipf(n_docs=5000, out_dir=ZIPF_DIR)
        for name in ZIPF_QUERIES:
            zipf[name] = round(
                _median_runs(lambda: queries[name](spark, ZIPF_DIR).count(), 3), 3
            )

    # tier 1c: sf1.0 scale probe — MEDIAN-OF-3 per query (VERDICT r6 #2:
    # four probe queries moved 1.5-2.6x on unchanged code under the old
    # single-run protocol; the first run at sf1 carries JIT/codegen
    # compilation and Python-worker spin-up that the median discards),
    # generated on demand
    sf1: dict[str, float] = {}
    sf1_baselines: dict[str, float] = {}
    if "sf1" in tiers:
        _release_query_caches()
        if not os.path.isdir(SF1_DIR):
            from tools.gen_sf1 import main as gen_sf1  # noqa: PLC0415

            gen_sf1(out_dir=SF1_DIR)
        for name, sink in [(n, sf1) for n in SF1_QUERIES] + [
            (n, sf1_baselines) for n in SF1_EXEMPT_BASELINES
        ]:
            try:
                sink[name] = round(
                    _median_runs(
                        lambda: queries[name](spark, SF1_DIR).count(), 3
                    ),
                    3,
                )
            except Exception:
                sink[name] = -1.0  # visible failure marker, never silent

    # tier 1d: sf1 lakehouse churn tier (needs the sf1 fixture from 1c)
    sf1_lake: dict[str, float] = {}
    if "sf1lake" in tiers:
        if not os.path.isdir(SF1_DIR):
            from tools.gen_sf1 import main as gen_sf1  # noqa: PLC0415

            gen_sf1(out_dir=SF1_DIR)
        sf1_lake = _sf1_lakehouse(spark)

    # tier 1d2: core-scaling evidence at sf1 (VERDICT r9 #7) — the six
    # data-bound probes re-timed in a CHILD bench process pinned to
    # local[8] (a session's master is fixed at startup, so the low-core
    # run needs its own process; the parent sits idle while it runs, so
    # the two never compete). Skipped when this run is itself low-core
    # (the driver's own 8-cpu pass would measure a 1.0 ratio) and when
    # the sf1 fixture is absent. ratio = t_low / t_main per query: ≈ 1
    # means scheduler-bound or serial, >> 1 means the plan actually used
    # the extra cores.
    sf1_scale: dict[str, float] = {}
    sf1_scale_ratio: dict[str, float] = {}
    if "sf1scale" in tiers:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
        cpus_n = int(cpus_env) if cpus_env.isdigit() else 32
        if cpus_n >= 2 * SF1_SCALE_LOW_CPUS and os.path.isdir(SF1_DIR):
            import subprocess  # noqa: PLC0415

            env = {
                **os.environ,
                "SPARK_GRAFT_CPUS": str(SF1_SCALE_LOW_CPUS),
                "SPARK_GRAFT_BENCH_TIERS": "sf1c8",
            }
            try:
                res = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    capture_output=True,
                    text=True,
                    timeout=1800,
                )
                lines = [
                    ln
                    for ln in res.stdout.splitlines()
                    if ln.startswith('{"metric": "sf1_probe_lowcore"')
                ]
                if lines:
                    sf1_scale = json.loads(lines[-1]).get("queries", {})
            except Exception:
                sf1_scale = {}  # scaling evidence must never fail the bench
            for name, t in sf1_scale.items():
                base = sf1.get(name)
                if base and base > 0 and t > 0:
                    sf1_scale_ratio[name] = round(t / base, 2)

    # tier 1e: ODIM-ingest — the reference's actual headline pipeline
    # (many small HDF5 files → daily/monthly VPTS CSV), VERDICT r7 #1
    odim_ingest: dict = {}
    if "odim" in tiers:
        odim_ingest = _odim_ingest(spark)

    # tier 1f: cold one-time builds (VERDICT r8 #5 — measure what the
    # memo caches hide; throwaway dirs, caches untouched)
    cold_builds: dict = {}
    if "cold" in tiers and os.path.isdir(sf_dir):
        cold_builds = _cold_builds(spark, sf_dir)

    # tier 2: single-pass FULL sweep at sf0.01 — regression tracking for the
    # ~50 queries outside the headline set (round-over-round comparability,
    # not absolute throughput; one run each keeps the sweep under a minute)
    sweep_dir = os.environ.get("SPARK_GRAFT_SWEEP_DIR", "/root/testdata/sf0.01")
    sweep: dict[str, float] = {}
    if "sweep" in tiers and os.path.isdir(sweep_dir):
        _release_query_caches()
        for name, fn in queries.items():
            t0 = time.perf_counter()
            try:
                fn(spark, sweep_dir).count()
                sweep[name] = round(time.perf_counter() - t0, 3)
            except Exception:
                sweep[name] = -1.0  # visible failure marker, never silent

    # tier 2b: the NON-headline queries once at sf0.1 (VERDICT r4 #7 — the
    # headline tier already times its 87 queries at sf0.1; this closes the
    # blind spot where the other ~80 were only ever timed at sf0.01, so a
    # 10× regression in any of them was invisible)
    sweep01: dict[str, float] = {}
    if "sweep01" in tiers and os.path.isdir(sf_dir):
        for name, fn in queries.items():
            if name in HEADLINE:
                continue  # already measured (median-of-5) in the headline tier
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
                sweep01[name] = round(time.perf_counter() - t0, 3)
            except Exception:
                sweep01[name] = -1.0  # visible failure marker, never silent

    # tier 2c: full-registry value-oracle gate (VERDICT r8 #2) — every
    # registered query value-compared against its DuckDB oracle at
    # sf0.01, machine-written to CORRECTNESS_FULL.json next to
    # bench_full.json. The driver's own correctness gate samples ~50
    # queries per round; this artifact is the committed evidence for the
    # other ~250 (61 had never been driver-sampled before the r8 judge's
    # closure run). tests/test_correctness_full.py drift-guards it
    # against the registry.
    correctness_full: dict = {}
    if "correctness" in tiers and os.path.isdir(sweep_dir):
        from tools.check_correctness import run_checks  # noqa: PLC0415

        cres = run_checks(sweep_dir, spark=spark, verbose=False)
        correctness_full = {
            "sf_dir": sweep_dir,
            "n_queries": len(cres),
            "n_pass": sum(1 for r in cres.values() if r["status"] == "PASS"),
            "n_rows_only": sum(
                1 for r in cres.values() if r["status"] == "rows_only"
            ),
            "failures": sorted(
                n for n, r in cres.items() if r["status"] == "FAIL"
            ),
        }
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "CORRECTNESS_FULL.json",
            ),
            "w",
        ) as fh:
            json.dump({**correctness_full, "queries": cres}, fh, indent=1)

    # calibration-normalized probe ratios vs the PREVIOUS committed
    # bench_full.json (read before this run overwrites it): ratio =
    # (cur/prev) / (jvm_kernel_cur/jvm_kernel_prev). A probe query whose
    # raw ratio tracks the kernel ratio moved with the HOST, not the code
    # — only normalized ratios > ~1.4 deserve a plan diff (VERDICT r6 #2).
    # The kernels are pure-CPU while multi-second probes are partly
    # shuffle/scheduler-bound, so when the kernel swings hard (turbo /
    # cache state) normalization over-corrects — a query is REGRESSION-
    # flagged only when BOTH its raw and its normalized ratio exceed the
    # threshold (raw alone = maybe host, normalized alone = maybe the
    # kernel moved, both = the query itself moved).
    sf1_ratios: dict[str, float] = {}
    sf1_ratios_raw: dict[str, float] = {}
    sf1_flagged: list[str] = []
    cal_ratio = None
    prev_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    if sf1 and calibration and os.path.exists(prev_path):
        try:
            with open(prev_path) as fh:
                prev = json.load(fh)
            prev_cal = (prev.get("calibration") or {}).get("jvm_hash_agg_sec")
            cur_cal = calibration.get("jvm_hash_agg_sec")
            if prev_cal and cur_cal:
                cal_ratio = round(cur_cal / prev_cal, 3)
            prev_sf1 = prev.get("sf1_probe") or {}
            for name, t in sf1.items():
                p = prev_sf1.get(name)
                if p and p > 0 and t > 0:
                    raw = t / p
                    sf1_ratios_raw[name] = round(raw, 3)
                    sf1_ratios[name] = round(
                        raw / cal_ratio if cal_ratio else raw, 3
                    )
                    if min(sf1_ratios_raw[name], sf1_ratios[name]) > 1.4:
                        sf1_flagged.append(name)
        except Exception:
            pass  # a malformed prior artifact must not fail the bench

    # Key ORDER is deliberate (VERDICT r9 #3, tail-proofing): the driver
    # records only the last ~2 KB of stdout, and BENCH_r08's metric/value
    # lived at the FRONT of the line, so the truncated tail lost the
    # round-over-round headline entirely. Every key the contract requires
    # is still here and nothing was removed — but the big per-query maps
    # come FIRST and the compact summary scalars (metric, value, tier
    # totals, regression flags) come LAST, so they always land inside the
    # tail capture even when the full line cannot be parsed.
    headline = {
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "zipf_text": zipf,
        "sf1_probe": sf1,
        "sf1_probe_ratio_vs_prev_calnorm": sf1_ratios,
        "sf1_probe_ratio_vs_prev_raw": sf1_ratios_raw,
        "sf1_exempt_baselines": sf1_baselines,
        "sf1_lakehouse": sf1_lake,
        "sf1_scale_lowcore": sf1_scale,
        "sf1_scale_low_cpus": SF1_SCALE_LOW_CPUS,
        "odim_ingest": odim_ingest,
        "cold_builds": cold_builds,
        "calibration": calibration,
        "correctness_full": correctness_full,
        # ---- compact summary scalars from here down (tail window) ----
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "zipf_text_total": round(sum(zipf.values()), 3),
        "sf1_probe_total": round(sum(t for t in sf1.values() if t > 0), 3),
        "sf1_probe_failures": sorted(n for n, t in sf1.items() if t < 0),
        "sf1_probe_regression_flags": sorted(sf1_flagged),
        "sf1_calibration_ratio_vs_prev": cal_ratio,
        "sf1_scale_ratio_low_over_main": sf1_scale_ratio,
        "full_sweep_sf": 0.01,
        "full_sweep_total": round(sum(t for t in sweep.values() if t > 0), 3),
        "full_sweep_failures": sorted(n for n, t in sweep.items() if t < 0),
        "sweep_sf01_total": round(sum(t for t in sweep01.values() if t > 0), 3),
        "sweep_sf01_failures": sorted(n for n, t in sweep01.items() if t < 0),
        "timing_protocol": "headline=median-of-5, zipf+sf1_probe=median-of-3, sweeps=single-run",
    }
    # The driver records only the TAIL of stdout, so the big per-query sweep
    # dict goes on its own line FIRST and the compact headline line is printed
    # LAST (round-over-round comparison must never lose the headline tier to
    # output truncation). The full record is also archived to bench_full.json.
    sweep_line = {"metric": "full_sweep", "sf": 0.01, "queries": sweep}
    print(json.dumps(sweep_line))
    sweep01_line = {"metric": "sweep_sf01_nonheadline", "sf": 0.1, "queries": sweep01}
    print(json.dumps(sweep01_line))
    if tiers >= {"headline", "zipf", "sf1", "sf1lake", "sf1scale", "sweep", "sweep01", "calibration", "odim", "cold", "correctness"}:
        # archive only COMPLETE runs — a tier-filtered local iteration must
        # not clobber the round's committed record
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json"), "w") as fh:
            json.dump({**headline, "full_sweep": sweep, "sweep_sf01_nonheadline": sweep01}, fh, indent=1)
        _sync_plans_note(headline)
    print(json.dumps(headline))


#: PLANS.md carries a machine-written one-line summary of the committed
#: bench artifact between these markers; bench.py rewrites it whenever it
#: archives bench_full.json, and tools/bench_compare.py --plans-check
#: fails loudly if the two ever drift (VERDICT r6 #3: a hand-written
#: variance note described a bench that was not the committed artifact).
PLANS_NOTE_BEGIN = "<!-- BENCH-NOTE:BEGIN (machine-written by bench.py; do not edit by hand) -->"
PLANS_NOTE_END = "<!-- BENCH-NOTE:END -->"


def plans_note_line(headline: dict) -> str:
    return (
        f"Committed artifact: {len(headline['queries'])} headline queries "
        f"totaling {headline['value']} s; zipf tier "
        f"{headline['zipf_text_total']} s; sf1 probe "
        f"{headline['sf1_probe_total']} s (median-of-3, "
        f"{len(headline['sf1_probe_failures'])} failures); full sweep "
        f"{headline['full_sweep_total']} s."
    )


def _sync_plans_note(headline: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    if not os.path.exists(path):
        return
    text = open(path).read()
    block = f"{PLANS_NOTE_BEGIN}\n{plans_note_line(headline)}\n{PLANS_NOTE_END}"
    if PLANS_NOTE_BEGIN in text and PLANS_NOTE_END in text:
        head, rest = text.split(PLANS_NOTE_BEGIN, 1)
        _, tail = rest.split(PLANS_NOTE_END, 1)
        text = head + block + tail
    else:
        text = text.rstrip() + "\n\n## Committed bench summary\n\n" + block + "\n"
    with open(path, "w") as fh:
        fh.write(text)


if __name__ == "__main__":
    main()
