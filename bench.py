"""Benchmark harness: headline extraction pipeline + representative queries.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling [lo hi]`` runs the headline in fresh processes at two
parallelism levels (default 8 vs 32 CPUs), best-of-3 per level, and reports
throughput at both plus raw scaling efficiency ((t_lo/t_hi)/(hi/lo)) and
the efficiency normalized by a like-for-like hardware-ceiling control (a
Ray-free multiprocessing pool running the same extract kernel on the same
shards).  ``--control`` prints the single-thread rate on the same corpus.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32), GRAFT_BENCH_MB (default 800).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


# 800 MB default: the round-2 corpus parses ~3x faster per byte (realistic
# image-heavy docs), so a bigger input keeps fixed costs (actor startup,
# first-block latency) under ~20% of the measured window
TARGET_MB = float(os.environ.get("GRAFT_BENCH_MB", "800"))


def _corpus_plan(target_mb: float):
    """(files, n_docs, corpus_bytes, repeats) sizing a repeated-corpus input
    to ~target_mb of document bytes — shared by the headline and the
    shuffle-scaling measurement so both run at measurement scale rather
    than the sf-dir's fixed-cost floor."""
    import pyarrow.parquet as pq

    from pdfray.sources.fixtures import corpus_files, ensure_corpus_parquet

    path = ensure_corpus_parquet(SF_DIR)
    files = corpus_files(path)
    n_docs = 0
    total_bytes = 0
    for f in files:
        meta = pq.read_metadata(f)
        n_docs += meta.num_rows
        for i in range(meta.num_row_groups):
            rg = meta.row_group(i)
            for c in range(rg.num_columns):
                col = rg.column(c)
                if col.path_in_schema == "html":
                    total_bytes += col.total_uncompressed_size
    repeats = max(1, int(target_mb * 1e6 / max(1, total_bytes)))
    # warm the page cache so we measure compute, not first-touch disk reads
    pq.read_table(path, columns=["url"])
    return files, n_docs, total_bytes, repeats


def run_headline() -> dict:
    """Extraction over the synthesized PDF corpus for this sf dir.

    The corpus file is repeated (a list of identical input paths) until the
    input reaches ~GRAFT_BENCH_MB of document bytes, so the measurement is
    dominated by extraction work rather than fixed Ray startup overhead —
    the per-document work is identical to a corpus of that size on disk.
    """
    from pdfray.pipelines.extraction import extract_dataset, read_corpus

    files, n_docs, total_bytes, repeats = _corpus_plan(TARGET_MB)
    # pilot: one full corpus pass OUTSIDE the timed window — spawns/imports
    # the Ray worker pool (the 32-CPU level would otherwise pay 4x the worker
    # cold-start of the 8-CPU level inside its measurement) and brings the
    # pipeline to steady state, which is what a 100 TB run spends its life in
    extract_dataset(read_corpus(files)).count()

    # best-of-2 timed windows: the shared sandbox shows 2-5x neighbor noise
    # and the minimum is the machine's capability (the quantity a capacity
    # plan uses)
    wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ds = read_corpus(files * repeats)
        extracted = extract_dataset(ds)
        n_out = extracted.count()
        wall = min(wall, time.perf_counter() - t0)
        assert n_out == n_docs * repeats, (n_out, n_docs, repeats)
    mb = total_bytes * repeats / 1e6
    return {
        "sec": round(wall, 3),
        "n_docs": n_docs * repeats,
        "repeats": repeats,
        "mb": round(mb, 1),
        "docs_per_sec": round(n_docs * repeats / wall, 1),
        "mb_per_sec": round(mb / wall, 2),
    }


QUERY_NAMES = [
    "q1_pricing_summary",
    "q_hash_join_brand",
    "q_broadcast_join_segment",
    "q_semi_join_big_customers",
    "q_anti_join_quiet_customers",
    "q_top_order_per_customer",
    "q_events_rollup",
    "q_events_window",
    "q_orders_by_month",
    "q_asof_attribution",
    "q_range_join_view_purchase",
    "q_pivot_event_matrix",
    "q_hll_user_days",
    "q_group_quantiles",
    "q_bloom_semi_join_parts",
    "q_interevent_gap_stats",
    "t_weighted_sample",
    "t_cms_wordcounts",
    "t_group_uniform_sample",
    "q_rollup_pricing",
    "q_full_outer_user_activity",
    "q_skew_join_purchase_clicks",
    "q_running_user_spend",
    "q_user_days_exact",
    "q_topk_per_group",
    "q_group_moments",
    "q_cube_pricing",
    "q_moving_avg_user_spend",
    "q_ohlc_daily",
    "q_left_join_order_counts",
    "q5_local_supplier_volume",
    "q3_shipping_priority",
    "q_percent_rank_acctbal",
    "q_ntile_acctbal",
    "q_corr_qty_discount",
    "q_mode_event_type",
    "s_mips_topk",
    "s_knn_graph",
    "s_semdedup",
    "q_sessionize",
    "q_retention_cohorts",
    "q_funnel",
    "q_rolling_revenue",
    "t_token_stats",
    "t_stratified_sample",
    "t_temperature_sample",
    "t_domain_cap",
    "t_bigram_logprob",
    "t_ccnet_buckets",
    "t_dsir_sample",
    "t_shuffle_shards",
    "t_delta_dedup",
    "t_delta_dedup_bloom",
    "t_dup_components",
    "t_dedup_keep_best",
    "t_dup_spans",
    "t_decontaminate",
    "t_pack_sequences",
    "t_chunk_windows",
    "t_length_quantiles",
    "t_quality",
    "t_gopher_rules",
    "t_c4_filter",
    "t_pii_scrub",
    "t_repetition",
    "t_doc_frequency",
    "t_heavy_hitters",
    "t_tfidf",
    "t_inverted_lookup",
    "t_fingerprint",
    "t_langid",
    "t_winnow_fp",
    "t_exact_dedup",
    "t_minhash_pairs",
    "t_ngram_jaccard_dupes",
    "t_simhash",
    "t_bpe_tokens",
    "t_bpe_train",
    "t_bpe_apply",
    "s_knn_bruteforce",
    "s_label_centroids",
    "s_kmeans",
    "s_scalar_quantize",
    "s_pq",
    "s_pq_adc",
    "s_ann_ivfpq",
    "s_ann_lsh",
    "s_ann_ivf",
    "s_embedding_dupes",
    "m_media_features",
    "m_image_hash",
    "m_phash",
    "m_resize",
    "m_audio_features",
    "m_video_frames",
    "pipeline_training_mix",
    "pipeline_line_dedup",
    "q4_order_priority",
    "q17_small_qty_revenue",
    "q16_supplier_variety",
    "q_user_set_ops",
    "s_hamming_topk",
    "q_pagerank_bipartite",
    "q_incremental_rollup",
    "m_dominant_freq",
    "q10_returned_revenue",
    "q18_large_volume_customers",
    "m_silence_segments",
    "m_scene_cuts",
    "s_range_search",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q13_customer_distribution",
    "q19_discounted_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q22_sales_opportunity",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_late_lines_by_class",
    "q20_majority_suppliers",
    "q21_waiting_suppliers",
    "q_global_rank_orders",
    "q_fk_audit",
    "s_pca",
    "m_image_neardup",
    "q_decay_user_engagement",
    "q_sliding_window_counts",
    "q_kmv_distinct_users",
    "q_butterfly_count",
    "s_ann_rerank",
    "m_audio_neardup",
    "t_containment_dupes",
    "m_video_neardup",
    "s_ood_mahalanobis",
    "q_frequent_pairs",
    "q_markov_transitions",
    "q_skyline_parts",
    "t_quality_classifier",
    "q_user_entropy",
    "t_keyword_extraction",
    "q_late_events_audit",
    "t_cdc_dedup",
    "t_editdist_dupes",
    "s_dbscan",
    "q_cusum_changepoint",
    "q_date_spine_fill",
    "q_mad_outliers",
    "q_max_drawdown",
    "t_pmi_collocations",
    "q_benford_audit",
    "s_mmr_diverse_topk",
    "m_patchify",
    "t_fuzzy_decontaminate",
    "q_gini_revenue",
    "t_webdataset_shards",
    "t_wds_roundtrip",
    "t_rouge_report",
    "q_csv_roundtrip",
    "q_bfs_reach",
    "t_langid_eval",
    "q_kmv_set_ops",
    "s_mrl_overlap",
    "q_ams_f2",
    "q_column_profile",
    "t_filter_attrition",
    "q_user_event_paths",
    "q_zorder_zonemap",
    "q_cdc_upsert",
    "q_schema_evolution",
    "q_ipc_roundtrip",
    "t_dataset_card",
    "q_auc_purchase_value",
    "q_scd2_order_status",
    "q_linreg_price_qty",
    "q_orc_roundtrip",
    "t_unicode_dedup",
    "t_group_holdout_split",
    "q_k_anonymity",
    "q_time_travel",
    "q_l_diversity",
    "q_temporal_dim_join",
    "q_skew_report",
    "q_json_profile",
    "q_table_checksum",
    "q_equidepth_histogram",
    "t_dup_size_profile",
    "q_median_impute",
    "s_label_silhouette",
    "q_ddsketch_quantiles",
    "q_ks_test",
    "q_welch_ab",
    "q_triangle_count",
    "s_rrf_fusion",
    "q_chi2_independence",
    "q_mor_deletes",
    "q_bitmap_index",
    "q_interval_overlap_join",
    "q_mor_compaction",
    "q_avro_roundtrip",
    "q_stream_tumbling_agg",
    "q_t_closeness",
    "q_link_prediction",
    "q_psi_drift",
    "q_pareto_coverage",
    "q_weighted_sssp",
    "t_ingest_quarantine",
    "q_group_quantile_sketch",
    "m_sharpness",
    "q_time_to_convert",
    "t_vocab_coverage",
    "q_wallet_balance",
    "q_rfm_segments",
    "t_bm25_search",
    "q_assoc_rules",
    "q_kcore",
    "s_perceptron",
    "q_seq_trigrams",
    "q_snapshot_diff",
    "m_image_dup_clusters",
    "m_audio_dup_clusters",
    "m_video_dup_clusters",
    "q_multitouch_attribution",
    "s_calibration_report",
    "q_peak_concurrency",
    "q_fwf_roundtrip",
    "t_feature_hashing",
    "t_mlm_masking",
    "q_graph_random_walks",
    "s_triplet_mining",
    "q_did_uplift",
    "t_blocklist_filter",
    "q_cuped_adjusted",
    "s_filtered_knn",
    "q_rolling_active_users",
    "q_new_vs_returning",
    "t_code_detect",
]


def run_queries() -> dict:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings = {}
    for name in QUERY_NAMES:
        t0 = time.perf_counter()
        result = qs[name](SF_DIR)
        # force execution for lazy results
        if hasattr(result, "count") and not hasattr(result, "columns"):
            result.count()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def pure_control(sample_mb: float = 30.0) -> dict:
    """Like-for-like single-thread control on the SAME corpus: a bare Python
    loop over extract_document, no Ray.  pipeline_docs_per_sec_per_cpu /
    control_docs_per_sec is THE pipeline-overhead factor (BASELINE.md §3)."""
    import pyarrow.parquet as pq

    from pdfray.core.extract import extract_document
    from pdfray.sources.fixtures import corpus_files, ensure_corpus_parquet

    path = ensure_corpus_parquet(SF_DIR)
    rows = []
    total = 0
    files = corpus_files(path)
    per_file = sample_mb * 1e6 / len(files)
    for f in files:  # draw evenly across shards: every class incl. the skew tail
        file_total = 0
        for batch in pq.ParquetFile(f).iter_batches(columns=["html"], batch_size=256):
            for v in batch.column("html"):
                b = v.as_py()
                rows.append(b)
                total += len(b)
                file_total += len(b)
            if file_total >= per_file:
                break
    for b in rows[:50]:  # warm caches like the pipeline's steady state
        extract_document(b)
    t0 = time.perf_counter()
    for b in rows:
        extract_document(b)
    wall = time.perf_counter() - t0
    return {
        "control_n_docs": len(rows),
        "control_mb": round(total / 1e6, 1),
        "control_sec": round(wall, 3),
        "control_docs_per_sec": round(len(rows) / wall, 1),
        "control_mb_per_sec": round(total / 1e6 / wall, 2),
    }


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    headline = run_headline()
    queries = {} if os.environ.get("GRAFT_SKIP_QUERIES") else run_queries()
    sf = float(os.path.basename(os.path.normpath(SF_DIR)).replace("sf", ""))
    print(
        json.dumps(
            {
                "metric": "pdf extraction wall-clock (synthesized corpus)",
                "value": headline["sec"],
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "num_cpus": NUM_CPUS,
                "n_docs": headline["n_docs"],
                "corpus_mb": headline["mb"],
                "docs_per_sec": headline["docs_per_sec"],
                "mb_per_sec": headline["mb_per_sec"],
            }
        )
    )
    ray.shutdown()


def _mp_extract_file(f: str) -> int:
    """One control work unit: read a corpus shard, extract every document."""
    import pyarrow.parquet as pq

    from pdfray.core.extract import extract_document

    t = pq.read_table(f, columns=["html"])
    n = 0
    for v in t["html"].to_pylist():
        extract_document(v)
        n += len(v)
    return n


def _machine_control(lo: int, hi: int) -> dict:
    """LIKE-FOR-LIKE hardware ceiling: a plain multiprocessing pool running
    the SAME extract kernel over the SAME corpus shards (read included), no
    Ray.  The 32 logical CPUs here are SMT siblings of ~16 physical cores
    and extraction is byte-scan/memory-heavy, so even perfect orchestration
    cannot show 4x from 8 -> 32 workers — this control measures what the
    hardware itself delivers for THIS workload at both levels; pipeline
    efficiency is reported raw AND normalized by that ceiling.  (A
    pure-python int-burn control overstates the ceiling: SMT helps ALU-bound
    loops far more than parser byte-scans.)"""
    import multiprocessing as mp

    from pdfray.sources.fixtures import corpus_files, ensure_corpus_parquet

    files = corpus_files(ensure_corpus_parquet(SF_DIR))
    work = files * 4  # same fixed work list for both levels

    def rate_once(workers: int) -> float:
        with mp.Pool(workers) as pool:
            pool.map(_mp_extract_file, files[: min(len(files), workers)])  # warm
            t0 = time.perf_counter()
            total = sum(pool.map(_mp_extract_file, work))
            dt = time.perf_counter() - t0
        return total / 1e6 / dt

    def rate(workers: int) -> float:
        # best-of-2: neighbor-tenant noise can halve a single control run
        return max(rate_once(workers) for _ in range(2))

    r_lo, r_hi = rate(lo), rate(hi)
    return {
        "control_mb_per_sec_lo": round(r_lo, 1),
        "control_mb_per_sec_hi": round(r_hi, 1),
        "machine_ceiling": round((r_hi / r_lo) / (hi / lo), 3),
    }


def _mp_line_dedup_file(f: str) -> int:
    """One shuffle-control work unit: the MAP-side kernel of
    pipeline_line_dedup — extract every document in a shard, split/strip
    lines, hash, local multiplicity count.  The Ray pipeline runs exactly
    this per batch plus the groupby/join exchanges; the control is the
    hardware ceiling WITHOUT an exchange."""
    import hashlib

    import pyarrow.parquet as pq

    from pdfray.core.extract import extract_document

    t = pq.read_table(f, columns=["html"])
    counts: dict = {}
    n = 0
    for v in t["html"].to_pylist():
        text = extract_document(v).text
        for raw in text.split("\n"):
            line = raw.strip(" \t\r")
            if line:
                h = hashlib.md5(line.encode("utf-8")).digest()[:8]
                counts[h] = counts.get(h, 0) + 1
        n += len(v)
    return n


def _line_control(lo: int, hi: int) -> dict:
    """Like-for-like hardware ceiling for the shuffle benchmark (same
    rationale as `_machine_control`, with the line-dedup map kernel)."""
    import multiprocessing as mp

    files, _n_docs, _bytes, repeats = _corpus_plan(TARGET_MB)
    work = files * repeats  # same repeated volume as the measured pipeline

    def rate_once(workers: int) -> float:
        with mp.Pool(workers) as pool:
            pool.map(_mp_line_dedup_file, files[: min(len(files), workers)])
            t0 = time.perf_counter()
            total = sum(pool.map(_mp_line_dedup_file, work))
            dt = time.perf_counter() - t0
        return total / 1e6 / dt

    def rate(workers: int) -> float:
        return max(rate_once(workers) for _ in range(2))

    r_lo, r_hi = rate(lo), rate(hi)
    return {
        "control_mb_per_sec_lo": round(r_lo, 1),
        "control_mb_per_sec_hi": round(r_hi, 1),
        "machine_ceiling": round((r_hi / r_lo) / (hi / lo), 3),
    }


def shuffle_query_once() -> None:
    """Subprocess body for --scaling-shuffle: one pipeline_line_dedup run
    (extraction -> line explode -> parquet stage checkpoint -> groupby
    winners -> hash join -> combiner groupby) on RAY_GRAFT_CPUS.

    The input is the SAME repeated corpus the headline uses (~GRAFT_BENCH_MB
    of document bytes): at raw sf0.1 the per-query fixed costs (stage setup,
    sort-shuffle machinery) dominate and a 2-vs-8-CPU comparison measures
    overhead, not the exchanges.  With measurement-scale bytes every
    exchange — line-table checkpoint write/read, groupby(lh) shuffle, hash
    join — carries repeats x the data."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from pdfray.pipelines.extraction import extract_dataset, read_corpus
    from pdfray.pipelines.training_data import pipeline_line_dedup

    files, n_docs, total_bytes, repeats = _corpus_plan(TARGET_MB)
    # pilot at 1x corpus: spawns the worker pool + fixture cache outside
    # the timed window (same rationale as run_headline's pilot)
    pipeline_line_dedup(SF_DIR)
    t0 = time.perf_counter()
    out = pipeline_line_dedup(
        SF_DIR, extracted=extract_dataset(read_corpus(files * repeats))
    )
    sec = time.perf_counter() - t0
    mb = total_bytes * repeats / 1e6
    print(
        json.dumps(
            {
                "value": round(sec, 3),
                "n_rows": int(len(out)),
                "mb": round(mb, 1),
                "mb_per_sec": round(mb / sec, 2),
            }
        )
    )
    ray.shutdown()


def scaling_shuffle(lo: int = 2, hi: int = 8, attempts: int = 3) -> None:
    """Two-parallelism scaling for a SHUFFLE-DOMINATED pipeline
    (pipeline_line_dedup), same protocol as `scaling`: fresh Ray sessions
    per level, best-of-N, like-for-like mp control ceiling."""

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--shuffle-once"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        return min((run_once(ncpu) for _ in range(attempts)), key=lambda r: r["value"])

    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    control = _line_control(lo, hi)
    print(
        json.dumps(
            {
                "pipeline": "pipeline_line_dedup",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "mb": r_lo.get("mb"),
                "mb_per_sec_lo": r_lo.get("mb_per_sec"),
                "mb_per_sec_hi": r_hi.get("mb_per_sec"),
                "scaling_efficiency": round(eff, 3),
                **control,
                "normalized_efficiency": round(eff / control["machine_ceiling"], 3),
            }
        )
    )


def scaling(lo: int = 8, hi: int = 32, attempts: int = 3) -> None:
    """Best-of-N per level: the shared sandbox has 2-5x run-to-run noise from
    neighboring tenants; the minimum wall-clock is the machine's capability
    at that parallelism, which is what the scaling criterion is about."""

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SKIP_QUERIES="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        return min((run_once(ncpu) for _ in range(attempts)), key=lambda r: r["value"])

    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    control = _machine_control(lo, hi)
    print(
        json.dumps(
            {
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "docs_per_sec_lo": r_lo["docs_per_sec"],
                "docs_per_sec_hi": r_hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                **control,
                "normalized_efficiency": round(eff / control["machine_ceiling"], 3),
            }
        )
    )


if __name__ == "__main__":
    if "--shuffle-once" in sys.argv:
        shuffle_query_once()
    elif "--scaling-shuffle" in sys.argv:
        i = sys.argv.index("--scaling-shuffle")
        extra = [a for a in sys.argv[i + 1 :] if a.isdigit()]
        if len(extra) >= 2:
            scaling_shuffle(int(extra[0]), int(extra[1]))
        else:
            scaling_shuffle()
    elif "--scaling" in sys.argv:
        i = sys.argv.index("--scaling")
        extra = [a for a in sys.argv[i + 1 :] if a.isdigit()]
        if len(extra) >= 2:
            scaling(int(extra[0]), int(extra[1]))
        else:
            scaling()
    elif "--control" in sys.argv:
        print(json.dumps(pure_control()))
    else:
        main()
