"""Driver contract for the pdfray engine (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init``/``ray.shutdown``.  ``entry`` runs the flagship
extraction pipeline at sf0.001; ``queries`` exposes one callable per
implemented operator/pipeline (SURVEY.md §2 + engine-added text/dedup/
similarity ops); ``oracle_sql`` gives the DuckDB equivalent where
SQL-expressible (extraction oracles read the deterministic fixture parquet by
absolute path — the golden ``text`` column is the per-url byte-identity gate).
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _fixture_sql_path() -> str:
    """DuckDB-side glob over the sharded fixture corpus."""
    from pdfray.sources.fixtures import fixture_parquet_path

    return fixture_parquet_path("sf0.01") + "/*.parquet"


def _media_sql_path() -> str:
    """DuckDB-side glob over the sharded media (PNG) fixture table."""
    from pdfray.sources.fixtures import media_parquet_path

    return media_parquet_path("sf0.01") + "/*.parquet"


def _av_sql_path() -> str:
    """DuckDB-side glob over the sharded audio/video fixture table
    (materialized here so the oracle can run even before the Ray query)."""
    from pdfray.sources.fixtures import ensure_av_parquet

    return ensure_av_parquet("/root/testdata/sf0.01") + "/*.parquet"


# ----------------------------------------------------------------------
def entry() -> Any:
    """Flagship pipeline: corpus parquet -> PdfExtractor actor pool -> table."""
    from pdfray.sources.fixtures import ensure_corpus_parquet
    from pdfray.pipelines.extraction import extract_dataset, read_corpus

    path = ensure_corpus_parquet("/root/testdata/sf0.001")
    # engine defaults: task-pool extraction with warm per-worker state and
    # the size-aware skew policy ('auto' single-pools small allocations)
    ds = extract_dataset(read_corpus(path))
    return ds


# ----------------------------------------------------------------------
def _extract_text(sf_dir: str):
    from pdfray.sources.fixtures import ensure_corpus_parquet
    from pdfray.pipelines.extraction import extract_dataset, read_corpus

    path = ensure_corpus_parquet(sf_dir)
    ds = extract_dataset(read_corpus(path))
    return ds.select_columns(["url", "text"])


def _extract_warc(sf_dir: str):
    """Extraction through the Common-Crawl-native WARC ingest: the SAME
    golden corpus re-serialized as .warc.gz segment files (one read task
    per segment), so the oracle is plain byte-identity against the parquet
    goldens — ingest-format equivalence is driver-checked end to end."""
    from pdfray.pipelines.extraction import extract_dataset
    from pdfray.sources.fixtures import ensure_warc_segments
    from pdfray.sources.warc import read_warc

    seg_dir = ensure_warc_segments(sf_dir)
    ds = extract_dataset(read_warc(seg_dir))
    return ds.select_columns(["url", "text"])


_EXTRACTED_CACHE: dict = {}


def _extracted_meta(sf_dir: str):
    """Memoized NARROW metadata Dataset for the rollup queries.

    Runs extraction once (the driver issues several extraction-derived
    queries in one process) and materializes only per-document metadata
    blocks in the object store — (url, lang, n_bytes, pdf_version, n_pages,
    partition_id, n_empty).  ``n_empty`` is computed vectorized on the
    workers so the ``text`` column never leaves them; at full scale this
    materialization is the post-extraction metadata checkpoint (~bytes/doc),
    and the rollups below shuffle only combiner partials.
    """
    if sf_dir not in _EXTRACTED_CACHE:
        from pdfray.sources.fixtures import ensure_corpus_parquet
        from pdfray.pipelines.extraction import (
            extract_dataset,
            meta_projection,
            read_corpus,
        )

        path = ensure_corpus_parquet(sf_dir)
        ds = extract_dataset(
            read_corpus(path, columns=("url", "html", "lang")),
            extractor_kwargs={"passthrough": ("lang",), "include_page_texts": False},
        )
        _EXTRACTED_CACHE[sf_dir] = ds.map_batches(
            meta_projection, batch_format="pyarrow"
        ).materialize()
    return _EXTRACTED_CACHE[sf_dir]


def _extract_stats_by_lang(sf_dir: str):
    """Distributed combiner rollup by input language (metadata rides the
    extraction pass via the passthrough column — no post-hoc corpus join)."""
    from pdfray.pipelines.extraction import rollup_meta

    out = rollup_meta(_extracted_meta(sf_dir), "lang")
    return out[["lang", "n_docs", "sum_bytes", "n_empty"]]


def _extract_version_counts(sf_dir: str):
    """Engine-extracted pdf_version rollup; the oracle reads the fixture's
    analytic golden pdf_version column — an independent structural check."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdfray.pipelines.extraction import rollup_meta

    def fill(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("pdf_version"),
            "pdf_version",
            pc.coalesce(t.column("pdf_version"), pa.scalar("none")),
        )

    meta = _extracted_meta(sf_dir).map_batches(fill, batch_format="pyarrow")
    return rollup_meta(meta, "pdf_version")[["pdf_version", "n_docs"]]


def _extract_partition_metrics(sf_dir: str):
    """Deterministic per-partition lineage rollup over ENGINE outputs
    (partition_id, page counts, byte counts, empty-text counts); the oracle
    recomputes it from the fixture's golden columns.  The wall-clock metrics
    (parse_ms mean/max) live in `pipelines.extraction.partition_metrics`,
    which `run_extraction` writes — they are inherently non-deterministic
    and stay out of the driver hash."""
    from pdfray.pipelines.extraction import rollup_meta

    out = rollup_meta(_extracted_meta(sf_dir), "partition_id")
    return out[["partition_id", "n_docs", "sum_bytes", "n_pages", "n_empty"]]


def _extract_repaired(sf_dir: str):
    """XRefUpdater parity in-pipeline: deterministically corrupt the
    startxref offset of every (uncompressed) simple-class document, repair
    with the reference tool's FSM, extract — the oracle is the untouched
    golden text, so the repair must round-trip byte-identically."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    from pdfray.sources.fixtures import ensure_corpus_parquet
    from pdfray.sources.xref_repair import RepairXref
    from pdfray.pipelines.extraction import extract_dataset, read_corpus

    path = ensure_corpus_parquet(sf_dir)
    ds = read_corpus(path)

    def corrupt_simple(t: pa.Table) -> pa.Table:
        mask = pc.match_substring(t.column("url"), "/simple/")
        t = t.filter(mask)
        out = []
        for v in t.column("html"):
            data = v.as_py()
            # point startxref 13 bytes past the real table
            out.append(
                re.sub(
                    rb"startxref\n(\d+)",
                    lambda m: b"startxref\n" + str(int(m.group(1)) + 13).encode(),
                    data,
                )
            )
        return pa.table({"url": t.column("url"), "html": pa.array(out, pa.binary())})

    repaired = ds.map_batches(corrupt_simple, batch_format="pyarrow").map_batches(
        RepairXref(), batch_format="pyarrow"
    )
    out = extract_dataset(repaired, concurrency=(1, 4))
    return out.select_columns(["url", "text"])


def _pipeline_clean_corpus(sf_dir: str):
    """Deterministic prefix of the cleaning chain: extract -> quality gate ->
    exact dedup (keep min url); oracle-checkable because extracted text is
    byte-identical to the golden fixture text."""
    from pdfray.pipelines.training_data import clean_corpus

    df = clean_corpus(sf_dir, near_dedup=False)
    return df[["url", "text"]]


def _pipeline_clean_corpus_neardup(sf_dir: str):
    from pdfray.pipelines.training_data import clean_corpus

    df = clean_corpus(sf_dir, near_dedup=True)
    return df[["url"]]


def queries() -> dict[str, Callable[[str], Any]]:
    from pdfray.pipelines import relational as R
    from pdfray.pipelines import simsearch as S
    from pdfray.pipelines import textops as T
    from pdfray.pipelines import multimodal as M
    from pdfray.pipelines import training_data as P

    return {
        # DICT ORDER IS LOAD-BEARING: the driver evaluates queries in
        # order under a bounded budget (r03/r04 recorded exactly the first
        # 50).  Round-5 front: the 35 queries whose last driver row is
        # CORRECTNESS_r03 (r04 evaluated the first 50 of 85, these were
        # the tail), then every query CHANGED this round (checkpointed
        # materializes, derived partition counts, new exact oracles,
        # real-container frame sampling, WARC hardening); tail: r04
        # driver-green and unchanged since.
        # ---- r04-unchecked (last evidence = r03): need fresh rows ----
        "q_top_order_per_customer": R.q_top_order_per_customer,
        "q_events_rollup": R.q_events_rollup,
        "q_events_window": R.q_events_window,
        "q_asof_attribution": R.q_asof_attribution,
        "q_retention_cohorts": R.q_retention_cohorts,
        "q_funnel": R.q_funnel,
        "q_rolling_revenue": R.q_rolling_revenue,
        "q_nation_region": R.q_nation_region,
        "q_supplier_nation": R.q_supplier_nation,
        "q_events_json": R.q_events_json,
        "q_distinct_flags": R.q_distinct_flags,
        "q_orders_by_month": R.q_orders_by_month,
        "t_exact_dedup": T.t_exact_dedup,
        "t_token_stats": T.t_token_stats,
        "t_tfidf": T.t_tfidf,
        "t_heavy_hitters": T.t_heavy_hitters,
        "t_temperature_sample": T.t_temperature_sample,
        "t_stratified_sample": T.t_stratified_sample,
        "t_decontaminate": T.t_decontaminate,
        "t_dup_spans": T.t_dup_spans,
        "t_domain_cap": T.t_domain_cap,
        "t_shuffle_shards": T.t_shuffle_shards,
        "t_delta_dedup": T.t_delta_dedup,
        "t_pack_sequences": T.t_pack_sequences,
        "t_chunk_windows": T.t_chunk_windows,
        "t_length_quantiles": T.t_length_quantiles,
        "t_fingerprint": T.t_fingerprint,
        "t_quality": T.t_quality,
        "t_repetition": T.t_repetition,
        "t_doc_frequency": T.t_doc_frequency,
        "t_inverted_lookup": T.t_inverted_lookup,
        "t_bpe_tokens": T.t_bpe_tokens,
        "t_winnow_fp": T.t_winnow_fp,
        "t_langid": T.t_langid,
        "t_simhash": T.t_simhash,
        # ---- changed in round 5 (need fresh driver evidence) ----
        "extract_text": _extract_text,
        "extract_warc": _extract_warc,
        "q_sessionize": R.q_sessionize,
        "pipeline_line_dedup": P.pipeline_line_dedup,
        "pipeline_training_mix": P.pipeline_training_mix,
        "q_hash_join_brand": R.q_hash_join_brand,
        "t_bpe_train": T.t_bpe_train,
        "s_ann_lsh": S.s_ann_lsh,
        "s_ann_ivf": S.s_ann_ivf,
        "s_ann_partitioned": S.s_ann_partitioned,
        "m_frame_sample": M.m_frame_sample,
        "t_delta_dedup_bloom": T.t_delta_dedup_bloom,
        "t_minhash_pairs": T.t_minhash_pairs,
        "t_dup_components": T.t_dup_components,
        "t_dedup_keep_best": T.t_dedup_keep_best,
        # ---- tail: driver-green in r04 and unchanged since ----
        "extract_stats_by_lang": _extract_stats_by_lang,
        "extract_version_counts": _extract_version_counts,
        "extract_repaired": _extract_repaired,
        "extract_partition_metrics": _extract_partition_metrics,
        "s_knn_bruteforce": S.s_knn_bruteforce,
        "s_label_centroids": S.s_label_centroids,
        "s_kmeans": S.s_kmeans,
        "s_kmeans_init_assign": S.s_kmeans_init_assign,
        "s_scalar_quantize": S.s_scalar_quantize,
        "s_pq": S.s_pq,
        "s_ann_lsh_candidates": S.s_ann_lsh_candidates,
        "s_ann_ivf_candidates": S.s_ann_ivf_candidates,
        "s_ann_partitioned_candidates": S.s_ann_partitioned_candidates,
        "s_lsh_buckets": S.s_lsh_buckets,
        "s_embedding_dupes": S.s_embedding_dupes,
        "m_media_features": M.m_media_features,
        "m_image_hash": M.m_image_hash,
        "m_phash": M.m_phash,
        "m_resize": M.m_resize,
        "m_audio_features": M.m_audio_features,
        "m_video_frames": M.m_video_frames,
        "pipeline_clean_corpus": _pipeline_clean_corpus,
        "pipeline_clean_corpus_neardup": _pipeline_clean_corpus_neardup,
        "t_ngram_jaccard_dupes": T.t_ngram_jaccard_dupes,
        "t_gopher_rules": T.t_gopher_rules,
        "t_c4_filter": T.t_c4_filter,
        "t_pii_scrub": T.t_pii_scrub,
        "t_bpe_apply": T.t_bpe_apply,
        "q_filter_topk": R.q_filter_topk,
        "q_orders_topk": R.q_orders_topk,
        "t_bigram_logprob": T.t_bigram_logprob,
        "q1_pricing_summary": R.q1_pricing_summary,
        "q_broadcast_join_segment": R.q_broadcast_join_segment,
        "q_semi_join_big_customers": R.q_semi_join_big_customers,
        "q_anti_join_quiet_customers": R.q_anti_join_quiet_customers,
        # round-5 additions stay at the END: the driver evaluates a bounded
        # prefix and the rotation's coverage argument (CLAUDE.md) relies on
        # earlier entries keeping their r03/r04 positions
        "q_range_join_view_purchase": R.q_range_join_view_purchase,
        "q_pivot_event_matrix": R.q_pivot_event_matrix,
        "s_pq_adc": S.s_pq_adc,
        "s_ann_ivfpq": S.s_ann_ivfpq,
        "q_hll_user_days": R.q_hll_user_days,
        "q_group_quantiles": R.q_group_quantiles,
        "q_bloom_semi_join_parts": R.q_bloom_semi_join_parts,
        "q_interevent_gap_stats": R.q_interevent_gap_stats,
        "t_weighted_sample": T.t_weighted_sample,
        "t_cms_wordcounts": T.t_cms_wordcounts,
        "t_group_uniform_sample": T.t_group_uniform_sample,
        "q_rollup_pricing": R.q_rollup_pricing,
        "q_ohlc_daily": R.q_ohlc_daily,
        "q_left_join_order_counts": R.q_left_join_order_counts,
        "q_full_outer_user_activity": R.q_full_outer_user_activity,
        "q_skew_join_purchase_clicks": R.q_skew_join_purchase_clicks,
        "q_running_user_spend": R.q_running_user_spend,
        "q_user_days_exact": R.q_user_days_exact,
        "q_topk_per_group": R.q_topk_per_group,
        "q_group_moments": R.q_group_moments,
        "q_cube_pricing": R.q_cube_pricing,
        "q_moving_avg_user_spend": R.q_moving_avg_user_spend,
        "q5_local_supplier_volume": R.q5_local_supplier_volume,
        "q_percent_rank_acctbal": R.q_percent_rank_acctbal,
        "q_corr_qty_discount": R.q_corr_qty_discount,
        "q_mode_event_type": R.q_mode_event_type,
        "s_mips_topk": S.s_mips_topk,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q_ntile_acctbal": R.q_ntile_acctbal,
        "s_knn_graph": S.s_knn_graph,
        "s_semdedup": S.s_semdedup,
        "t_ccnet_buckets": T.t_ccnet_buckets,
        "t_dsir_sample": T.t_dsir_sample,
        "q4_order_priority": R.q4_order_priority,
        "q17_small_qty_revenue": R.q17_small_qty_revenue,
        "q16_supplier_variety": R.q16_supplier_variety,
        "q_user_set_ops": R.q_user_set_ops,
        "s_hamming_topk": S.s_hamming_topk,
        "q_pagerank_bipartite": R.q_pagerank_bipartite,
        "q_incremental_rollup": R.q_incremental_rollup,
        "m_dominant_freq": M.m_dominant_freq,
        "q10_returned_revenue": R.q10_returned_revenue,
        "q18_large_volume_customers": R.q18_large_volume_customers,
        "m_silence_segments": M.m_silence_segments,
        "m_scene_cuts": M.m_scene_cuts,
        "s_range_search": S.s_range_search,
        "q6_forecast_revenue": R.q6_forecast_revenue,
        "q14_promo_revenue": R.q14_promo_revenue,
        "q15_top_supplier": R.q15_top_supplier,
        "q13_customer_distribution": R.q13_customer_distribution,
        "q19_discounted_revenue": R.q19_discounted_revenue,
        "q7_volume_shipping": R.q7_volume_shipping,
        "q8_market_share": R.q8_market_share,
        "q9_product_profit": R.q9_product_profit,
        "q22_sales_opportunity": R.q22_sales_opportunity,
        "q2_min_cost_supplier": R.q2_min_cost_supplier,
        "q11_important_parts": R.q11_important_parts,
        "q12_late_lines_by_class": R.q12_late_lines_by_class,
        "q20_majority_suppliers": R.q20_majority_suppliers,
        "q21_waiting_suppliers": R.q21_waiting_suppliers,
        "q_global_rank_orders": R.q_global_rank_orders,
        "q_fk_audit": R.q_fk_audit,
        "s_pca": S.s_pca,
        "m_image_neardup": M.m_image_neardup,
        "q_decay_user_engagement": R.q_decay_user_engagement,
        "q_sliding_window_counts": R.q_sliding_window_counts,
        "q_kmv_distinct_users": R.q_kmv_distinct_users,
        "q_butterfly_count": R.q_butterfly_count,
        "s_ann_rerank": S.s_ann_rerank,
        "m_audio_neardup": M.m_audio_neardup,
        "t_containment_dupes": T.t_containment_dupes,
        "m_video_neardup": M.m_video_neardup,
        "s_ood_mahalanobis": S.s_ood_mahalanobis,
        "q_frequent_pairs": R.q_frequent_pairs,
        "q_markov_transitions": R.q_markov_transitions,
        "q_skyline_parts": R.q_skyline_parts,
        "t_quality_classifier": T.t_quality_classifier,
        "q_user_entropy": R.q_user_entropy,
        "t_keyword_extraction": T.t_keyword_extraction,
        "q_late_events_audit": R.q_late_events_audit,
        "t_cdc_dedup": T.t_cdc_dedup,
        "t_editdist_dupes": T.t_editdist_dupes,
        "s_dbscan": S.s_dbscan,
        "q_cusum_changepoint": R.q_cusum_changepoint,
        "q_date_spine_fill": R.q_date_spine_fill,
        "q_mad_outliers": R.q_mad_outliers,
        "q_max_drawdown": R.q_max_drawdown,
        "t_pmi_collocations": T.t_pmi_collocations,
        "q_benford_audit": R.q_benford_audit,
        "s_mmr_diverse_topk": S.s_mmr_diverse_topk,
        "m_patchify": M.m_patchify,
        "t_fuzzy_decontaminate": T.t_fuzzy_decontaminate,
        "q_gini_revenue": R.q_gini_revenue,
        "t_webdataset_shards": T.t_webdataset_shards,
        "t_wds_roundtrip": T.t_wds_roundtrip,
        "t_rouge_report": T.t_rouge_report,
        "q_csv_roundtrip": R.q_csv_roundtrip,
        "q_bfs_reach": R.q_bfs_reach,
        "t_langid_eval": T.t_langid_eval,
        "q_kmv_set_ops": R.q_kmv_set_ops,
        "s_mrl_overlap": S.s_mrl_overlap,
        "q_ams_f2": R.q_ams_f2,
        "q_column_profile": R.q_column_profile,
        "t_filter_attrition": T.t_filter_attrition,
        "q_user_event_paths": R.q_user_event_paths,
        "q_zorder_zonemap": R.q_zorder_zonemap,
        "q_cdc_upsert": R.q_cdc_upsert,
        "q_schema_evolution": R.q_schema_evolution,
        "q_ipc_roundtrip": R.q_ipc_roundtrip,
        "t_dataset_card": T.t_dataset_card,
        "q_auc_purchase_value": R.q_auc_purchase_value,
        "q_scd2_order_status": R.q_scd2_order_status,
        "q_linreg_price_qty": R.q_linreg_price_qty,
        "q_orc_roundtrip": R.q_orc_roundtrip,
        "t_unicode_dedup": T.t_unicode_dedup,
        "t_group_holdout_split": T.t_group_holdout_split,
        "q_k_anonymity": R.q_k_anonymity,
        "q_time_travel": R.q_time_travel,
        "q_l_diversity": R.q_l_diversity,
        "q_temporal_dim_join": R.q_temporal_dim_join,
        "q_skew_report": R.q_skew_report,
        "q_json_profile": R.q_json_profile,
        "q_table_checksum": R.q_table_checksum,
        "q_equidepth_histogram": R.q_equidepth_histogram,
        "t_dup_size_profile": T.t_dup_size_profile,
        "q_median_impute": R.q_median_impute,
        "s_label_silhouette": S.s_label_silhouette,
        "q_ddsketch_quantiles": R.q_ddsketch_quantiles,
        "q_ks_test": R.q_ks_test,
        "q_welch_ab": R.q_welch_ab,
        "q_triangle_count": R.q_triangle_count,
        "s_rrf_fusion": S.s_rrf_fusion,
        "q_chi2_independence": R.q_chi2_independence,
        "q_mor_deletes": R.q_mor_deletes,
        "q_bitmap_index": R.q_bitmap_index,
        "q_interval_overlap_join": R.q_interval_overlap_join,
        "q_mor_compaction": R.q_mor_compaction,
        "q_avro_roundtrip": R.q_avro_roundtrip,
        "q_stream_tumbling_agg": R.q_stream_tumbling_agg,
        "q_t_closeness": R.q_t_closeness,
        "q_link_prediction": R.q_link_prediction,
        "q_psi_drift": R.q_psi_drift,
        "q_pareto_coverage": R.q_pareto_coverage,
        "q_weighted_sssp": R.q_weighted_sssp,
        "t_ingest_quarantine": R.t_ingest_quarantine,
        "q_group_quantile_sketch": R.q_group_quantile_sketch,
        "m_sharpness": M.m_sharpness,
        "q_time_to_convert": R.q_time_to_convert,
        "t_vocab_coverage": T.t_vocab_coverage,
        "q_wallet_balance": R.q_wallet_balance,
        "q_rfm_segments": R.q_rfm_segments,
        "t_bm25_search": T.t_bm25_search,
        "q_assoc_rules": R.q_assoc_rules,
        "q_kcore": R.q_kcore,
        "s_perceptron": S.s_perceptron,
        "q_seq_trigrams": R.q_seq_trigrams,
        "q_snapshot_diff": R.q_snapshot_diff,
        "m_image_dup_clusters": M.m_image_dup_clusters,
        "m_audio_dup_clusters": M.m_audio_dup_clusters,
        "m_video_dup_clusters": M.m_video_dup_clusters,
        "q_multitouch_attribution": R.q_multitouch_attribution,
        "s_calibration_report": S.s_calibration_report,
        "q_peak_concurrency": R.q_peak_concurrency,
        "q_fwf_roundtrip": R.q_fwf_roundtrip,
        "t_feature_hashing": T.t_feature_hashing,
        "t_mlm_masking": T.t_mlm_masking,
        "q_graph_random_walks": R.q_graph_random_walks,
        "s_triplet_mining": S.s_triplet_mining,
        "q_did_uplift": R.q_did_uplift,
        "t_blocklist_filter": T.t_blocklist_filter,
        "q_cuped_adjusted": R.q_cuped_adjusted,
        "s_filtered_knn": S.s_filtered_knn,
        "q_rolling_active_users": R.q_rolling_active_users,
        "q_new_vs_returning": R.q_new_vs_returning,
        "t_code_detect": T.t_code_detect,
    }


def _column_profile_oracle() -> str:
    """One UNION ALL branch per lineitem column, generated from the SAME
    PROFILE_COLS spec the engine iterates (names/kinds can never drift).
    Numeric min/max CAST to DOUBLE on both sides; timestamps ride as
    epoch-microseconds; COUNT(DISTINCT) is over raw values (the engine's
    canonical-string encoding only needs injectivity, see
    relational._profile_canon)."""
    from pdfray.pipelines.relational import PROFILE_COLS

    branches = []
    for c, kind in PROFILE_COLS:
        if kind == "string":
            mn = f"CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, MIN({c}) AS min_str, MAX({c}) AS max_str"
        elif kind == "timestamp":
            mn = (
                f"CAST(epoch_us(MIN({c})) AS DOUBLE) AS min_num, "
                f"CAST(epoch_us(MAX({c})) AS DOUBLE) AS max_num, "
                "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            )
        else:
            mn = (
                f"CAST(MIN({c}) AS DOUBLE) AS min_num, CAST(MAX({c}) AS DOUBLE) AS max_num, "
                "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            )
        branches.append(
            f"SELECT '{c}' AS col, '{kind}' AS kind, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, {mn} FROM lineitem"
        )
    return "SELECT * FROM (" + " UNION ALL ".join(branches) + ") ORDER BY col"


def _image_hash_oracle() -> str:
    """Golden aHash VALUES for the sf0.01 media fixture, computed from the
    PRE-encode pixel arrays (fixtures._media_pixels) — the decoder is never
    touched here, so an engine match certifies the PNG round-trip end to
    end (same independent-path scheme as the WAV/Y4M golden columns;
    literal-embedding precedent: s_lsh_buckets' seeded planes)."""
    from pdfray.pipelines.multimodal import ahash64
    from pdfray.sources import fixtures as FX

    rows = []
    n = FX.sf_doc_count(0.01)
    for k in range(n):
        w, h, form, _filt, broken = FX.media_geometry(k)
        px, pal = FX._media_pixels(k, w, h, form)
        if broken:  # the planted broken rows
            rows.append((f"https://img.example.org/broken/{k:08d}.png", False, ""))
            continue
        if pal is not None:  # palette: expand like the decoder's PLTE path
            px = pal[px]
        rows.append(
            (f"https://img.example.org/{form}/{k:08d}.png", True, ahash64(px))
        )
    values = ", ".join(
        f"('{u}', {'true' if ok else 'false'}, '{h}')" for u, ok, h in rows
    )
    return (
        f"SELECT url, ok, ahash FROM (VALUES {values}) AS g(url, ok, ahash) "
        "ORDER BY url"
    )


def _rfm_oracle() -> str:
    """Quintile boundaries as exact order statistics at ranks
    (k*n+4)//5 per metric (window ROW_NUMBER picks), scores as the pure
    value rule 1 + #(boundaries strictly below v) — identical to the
    engine's broadcast compare, so boundary ties cannot diverge."""
    metric_sql = {"r": "r", "f": "f", "m": "m"}
    parts = [
        "WITH p AS (SELECT user_id, epoch_us(ts) AS tus, "
        "CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT) AS c "
        "FROM events WHERE event_type = 'purchase'), "
        "rfm AS (SELECT user_id, CAST(MAX(tus) AS BIGINT) AS r, "
        "CAST(COUNT(*) AS BIGINT) AS f, CAST(SUM(c) AS BIGINT) AS m "
        "FROM p GROUP BY 1), "
        "n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rfm), "
    ]
    for col in metric_sql:
        parts.append(
            f"rk_{col} AS (SELECT {col} AS v, ROW_NUMBER() OVER "
            f"(ORDER BY {col}) AS k FROM rfm), "
        )
    score_exprs = []
    for col in metric_sql:
        terms = " + ".join(
            f"(CASE WHEN rfm.{col} > (SELECT v FROM rk_{col} "
            f"WHERE k = ({kk} * n_.n + 4) // 5) THEN 1 ELSE 0 END)"
            for kk in (1, 2, 3, 4)
        )
        score_exprs.append(f"1 + {terms} AS {col}_score")
    parts.append(
        "sc AS (SELECT " + ", ".join(score_exprs) + ", rfm.m AS m "
        "FROM rfm CROSS JOIN n_) "
        "SELECT CAST(r_score AS BIGINT) AS r_score, "
        "CAST(f_score AS BIGINT) AS f_score, "
        "CAST(m_score AS BIGINT) AS m_score, "
        "CAST(COUNT(*) AS BIGINT) AS n_users, "
        "CAST(SUM(m) AS BIGINT) AS sum_cents "
        "FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    )
    return "".join(parts)


def _sharpness_oracle() -> str:
    """Golden variance-of-Laplacian VALUES for the sf0.01 media fixture,
    computed from the PRE-encode pixel arrays via the same integer
    `laplacian_stats` — the decoder is never touched here, so an engine
    match certifies decode + Laplacian arithmetic end to end (the
    m_image_hash scheme).  repr(float) literals parse back to the
    identical double."""
    from pdfray.pipelines.multimodal import laplacian_stats
    from pdfray.sources import fixtures as FX

    rows = []
    n_docs = FX.sf_doc_count(0.01)
    for k in range(n_docs):
        w, h, form, _filt, broken = FX.media_geometry(k)
        px, pal = FX._media_pixels(k, w, h, form)
        if broken:
            rows.append(
                (f"https://img.example.org/broken/{k:08d}.png", False, 0, 0, 0)
            )
            continue
        if pal is not None:
            px = pal[px]
        n, s, ss = laplacian_stats(px)
        rows.append((f"https://img.example.org/{form}/{k:08d}.png", True, n, s, ss))
    vals = []
    for u, ok, n, s, ss in rows:
        sharp = (
            repr((float(ss) - float(s) * float(s) / float(n)) / float(n))
            if n > 0
            else "CAST('nan' AS DOUBLE)"
        )
        vals.append(
            f"('{u}', {'true' if ok else 'false'}, {n}, {s}, {ss}, {sharp})"
        )
    return (
        "SELECT url, ok, CAST(lap_n AS BIGINT) AS lap_n, "
        "CAST(lap_sum AS BIGINT) AS lap_sum, "
        "CAST(lap_sumsq AS BIGINT) AS lap_sumsq, "
        "CAST(sharpness AS DOUBLE) AS sharpness FROM (VALUES "
        + ", ".join(vals)
        + ") AS g(url, ok, lap_n, lap_sum, lap_sumsq, sharpness) ORDER BY url"
    )


def _patchify_oracle() -> str:
    """Golden ViT patch-layout summaries for the sf0.01 media fixture,
    computed from the PRE-encode pixel arrays via the same pure-integer
    `patch_summary` — the decoder is never touched here, so an engine
    match certifies decode + patch arithmetic end to end (the
    _image_hash_oracle scheme)."""
    from pdfray.pipelines.multimodal import patch_summary
    from pdfray.sources import fixtures as FX

    rows = []
    n = FX.sf_doc_count(0.01)
    for k in range(n):
        w, h, form, _filt, broken = FX.media_geometry(k)
        if broken:
            rows.append(
                (f"https://img.example.org/broken/{k:08d}.png", False, 0, 0, 0, 0, "")
            )
            continue
        px, pal = FX._media_pixels(k, w, h, form)
        if pal is not None:
            px = pal[px]
        ny, nx, np_, s, hx = patch_summary(px)
        rows.append(
            (f"https://img.example.org/{form}/{k:08d}.png", True, ny, nx, np_, s, hx)
        )
    values = ", ".join(
        f"('{u}', {'true' if ok else 'false'}, {ny}, {nx}, {np_}, {s}, '{hx}')"
        for u, ok, ny, nx, np_, s, hx in rows
    )
    return (
        "SELECT url, ok, CAST(np_y AS BIGINT) AS np_y, "
        "CAST(np_x AS BIGINT) AS np_x, CAST(n_patches AS BIGINT) AS n_patches, "
        "CAST(mean_sum AS BIGINT) AS mean_sum, means_md5 "
        f"FROM (VALUES {values}) AS g(url, ok, np_y, np_x, n_patches, "
        "mean_sum, means_md5) ORDER BY url"
    )


def _image_neardup_rows() -> list:
    """ALL-PAIRS near-dup ground truth from the PRE-encode pixel arrays
    (decoder never touched): sorted (url_a, url_b, hamming) tuples at
    hamming <= NEARDUP_T.  Shared by the pair oracle and the cluster
    oracle so both replay the SAME truth graph."""
    import numpy as np

    from pdfray.pipelines.multimodal import NEARDUP_T, ahash64
    from pdfray.pipelines.simsearch import _popcount64
    from pdfray.sources import fixtures as FX

    urls, hs = [], []
    n = FX.sf_doc_count(0.01)
    for k in range(n):
        w, h, form, _filt, broken = FX.media_geometry(k)
        if broken:
            continue
        px, pal = FX._media_pixels(k, w, h, form)
        if pal is not None:
            px = pal[px]
        urls.append(f"https://img.example.org/{form}/{k:08d}.png")
        hs.append(int(ahash64(px), 16))
    a = np.array(hs, np.uint64)
    rows = []
    if len(a):
        d = _popcount64(a[:, None] ^ a[None, :])
        ia, ib = np.nonzero(np.triu(d <= NEARDUP_T, k=1))
        for i, j in zip(ia, ib):
            ua, ub = sorted((urls[i], urls[j]))
            rows.append((ua, ub, int(d[i, j])))
    return sorted(rows)


def _image_neardup_oracle() -> str:
    """The all-pairs truth as literal VALUES — the engine's banded-LSH
    recall is checked against exhaustive truth (the t_minhash_pairs
    scheme)."""
    rows = _image_neardup_rows()
    if not rows:
        return (
            "SELECT CAST(NULL AS VARCHAR) AS url_a, "
            "CAST(NULL AS VARCHAR) AS url_b, CAST(NULL AS BIGINT) AS hamming "
            "WHERE FALSE"
        )
    values = ", ".join(f"('{a_}', '{b_}', {h_})" for a_, b_, h_ in rows)
    return (
        f"SELECT url_a, url_b, CAST(hamming AS BIGINT) AS hamming "
        f"FROM (VALUES {values}) AS g(url_a, url_b, hamming) "
        "ORDER BY url_a, url_b"
    )


def _image_dup_clusters_oracle() -> str:
    """Connected components over the SAME all-pairs truth graph via a
    recursive min-label reachability walk (the t_dup_components scheme on
    VARCHAR nodes — MIN over urls is the lexicographic representative on
    both sides)."""
    return _cluster_walk_oracle(_image_neardup_rows())


def _cluster_walk_oracle(rows) -> str:
    """Shared recursive-walk cluster oracle over literal truth pairs —
    used by all three media dup-cluster operators."""
    if not rows:
        return (
            "SELECT CAST(NULL AS VARCHAR) AS url, "
            "CAST(NULL AS VARCHAR) AS cluster, "
            "CAST(NULL AS BIGINT) AS cluster_size WHERE FALSE"
        )
    values = ", ".join(f"('{a_}', '{b_}')" for a_, b_, _h in rows)
    return (
        f"WITH RECURSIVE g(a, b) AS (VALUES {values}), "
        "e AS (SELECT a AS u, b AS v FROM g UNION ALL SELECT b, a FROM g), "
        "walk(node, lab) AS (SELECT u, u FROM e UNION "
        "SELECT e.v, w.lab FROM walk w JOIN e ON e.u = w.node), "
        "c AS (SELECT node AS url, MIN(lab) AS cluster FROM walk "
        "GROUP BY node), "
        "s AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size "
        "FROM c GROUP BY cluster) "
        "SELECT c.url, c.cluster, s.cluster_size FROM c JOIN s USING(cluster) "
        "ORDER BY c.cluster, c.url"
    )


def _audio_neardup_rows() -> list:
    """ALL-PAIRS audio near-dup ground truth rows: fingerprints recomputed
    from the fixture generator's round-tripped samples via the SAME shared
    `envelope_hash64` (the audio_stats golden discipline).  Shared by the
    pair and cluster oracles."""
    import numpy as np

    from pdfray.core.wav import decode_wav, envelope_hash64
    from pdfray.pipelines.multimodal import NEARDUP_T
    from pdfray.pipelines.simsearch import _popcount64
    from pdfray.sources import fixtures as FX

    n = max(20, FX.sf_doc_count(0.01) // 2)
    urls, hs = [], []
    for k in range(0, n, 2):  # audio rows; skip the planted broken ones
        if k % 13 in (5, 11):
            continue
        payload, _stats = FX._audio_payload(k)
        urls.append(f"https://av.example.org/audio/{k:08d}.wav")
        hs.append(envelope_hash64(decode_wav(payload)))
    a = np.array(hs, np.uint64)
    rows = []
    if len(a):
        d = _popcount64(a[:, None] ^ a[None, :])
        ia, ib = np.nonzero(np.triu(d <= NEARDUP_T, k=1))
        for i, j in zip(ia, ib):
            ua, ub = sorted((urls[i], urls[j]))
            rows.append((ua, ub, int(d[i, j])))
    return sorted(rows)


def _audio_neardup_oracle() -> str:
    return _pairs_values_oracle(_audio_neardup_rows())


def _pairs_values_oracle(rows) -> str:
    """Literal-VALUES pair oracle shared by the audio/video legs."""
    if not rows:
        return (
            "SELECT CAST(NULL AS VARCHAR) AS url_a, "
            "CAST(NULL AS VARCHAR) AS url_b, CAST(NULL AS BIGINT) AS hamming "
            "WHERE FALSE"
        )
    values = ", ".join(f"('{a_}', '{b_}', {h_})" for a_, b_, h_ in rows)
    return (
        f"SELECT url_a, url_b, CAST(hamming AS BIGINT) AS hamming "
        f"FROM (VALUES {values}) AS g(url_a, url_b, hamming) "
        "ORDER BY url_a, url_b"
    )


def _video_neardup_rows() -> list:
    """ALL-PAIRS video near-dup ground truth rows from the PRE-encode
    frame arrays (decoder never touched), via the SAME shared
    `video_hash64` over every FRAME_STRIDE-th frame.  Shared by the pair
    and cluster oracles."""
    import numpy as np

    from pdfray.pipelines.multimodal import (
        FRAME_STRIDE,
        NEARDUP_T,
        video_hash64,
    )
    from pdfray.pipelines.simsearch import _popcount64
    from pdfray.sources import fixtures as FX

    n = max(20, FX.sf_doc_count(0.01) // 2)
    urls, hs = [], []
    for k in range(1, n, 2):  # video rows; skip the planted broken ones
        if k % 13 in (5, 11):
            continue
        frames, _cs = FX._video_frames_arrays(k)
        urls.append(f"https://av.example.org/video/{k:08d}.y4m")
        hs.append(
            int(
                video_hash64(
                    frames[i] for i in range(0, len(frames), FRAME_STRIDE)
                ),
                16,
            )
        )
    a = np.array(hs, np.uint64)
    rows = []
    if len(a):
        d = _popcount64(a[:, None] ^ a[None, :])
        ia, ib = np.nonzero(np.triu(d <= NEARDUP_T, k=1))
        for i, j in zip(ia, ib):
            ua, ub = sorted((urls[i], urls[j]))
            rows.append((ua, ub, int(d[i, j])))
    return sorted(rows)


def _video_neardup_oracle() -> str:
    return _pairs_values_oracle(_video_neardup_rows())


def _phash_oracle() -> str:
    """Golden perceptual-DCT-hash VALUES from the pre-encode pixel arrays
    (same independent-path scheme as `_image_hash_oracle`)."""
    from pdfray.pipelines.multimodal import phash64
    from pdfray.sources import fixtures as FX

    rows = []
    n = FX.sf_doc_count(0.01)
    for k in range(n):
        w, h, form, _filt, broken = FX.media_geometry(k)
        px, pal = FX._media_pixels(k, w, h, form)
        if broken:
            rows.append((f"https://img.example.org/broken/{k:08d}.png", False, ""))
            continue
        if pal is not None:
            px = pal[px]
        rows.append(
            (f"https://img.example.org/{form}/{k:08d}.png", True, phash64(px))
        )
    values = ", ".join(
        f"('{u}', {'true' if ok else 'false'}, '{h}')" for u, ok, h in rows
    )
    return (
        f"SELECT url, ok, phash FROM (VALUES {values}) AS g(url, ok, phash) "
        "ORDER BY url"
    )


def _simhash_oracle() -> str:
    """Verbatim SimHash recomputation in DuckDB: md5-64 token hashes
    (identical to the engine's), ±1 accumulation per bit, sign -> bit,
    16-hex-digit render.  The 64 per-bit aggregates are generated here."""
    bits = ", ".join(
        f"SUM(CASE WHEN (hv >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS b{k}"
        for k in range(64)
    )
    # literal powers of two: DuckDB's << overflows at bit 63 even on UBIGINT
    val = " + ".join(
        f"(CASE WHEN b{k} > 0 THEN {1 << k}::UBIGINT ELSE 0::UBIGINT END)"
        for k in range(64)
    )
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(list_filter(string_split_regex(lower(text), '\\s+'), "
        "x -> x <> '')) AS tok FROM documents), "
        "h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv "
        "FROM toks), "
        f"bits AS (SELECT doc_id, {bits} FROM h GROUP BY doc_id), "
        f"sig AS (SELECT doc_id, ({val}) AS v FROM bits) "
        "SELECT d.doc_id, "
        "COALESCE(lower(lpad(to_hex(s.v), 16, '0')), '0000000000000000') AS simhash "
        "FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id ORDER BY d.doc_id"
    )


def _lsh_buckets_oracle() -> str:
    """LSH bucket histogram recomputed in DuckDB: the hyperplanes come from
    the same fixed seed (RandomState(17)) and are embedded as float literals
    (repr round-trips float64 exactly); the sign of each dot product is
    scale-invariant, so the Python side's normalization needs no mirror.
    Plane count is auto-sized from the sf0.01 row count, mirroring the
    engine's `_auto_planes` (oracles are compared at sf0.01 only — same
    convention as the fixture-path oracles)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfray.pipelines.simsearch import _auto_planes

    path = "/root/testdata/sf0.01/embeddings.parquet"
    pf = pq.ParquetFile(path)
    n_rows = pf.metadata.num_rows
    dim = len(next(pf.iter_batches(batch_size=1)).column("embedding")[0])
    n_planes = _auto_planes(n_rows)
    planes = np.random.RandomState(17).randn(dim, n_planes)
    terms = " + ".join(
        "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), "
        f"[{','.join(repr(float(x)) for x in planes[:, j])}]) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )
    return (
        f"SELECT CAST(({terms}) AS BIGINT) AS sig, COUNT(*) AS n_vecs "
        "FROM embeddings GROUP BY sig ORDER BY sig"
    )


def _lsh_index_ctes() -> str:
    """Shared CTE text of the seeded LSH index, recomputed in DuckDB: the
    hyperplanes (RandomState(17)) are embedded as float literals like
    `_lsh_buckets_oracle`, the query vectors/probe sets are derived
    independently from the raw parquet (no engine code path touched).
    Yields ``sig``, ``probes(query_id, ps)`` and ``cand`` (every vector
    whose signature is in a query's probe list)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfray.pipelines.simsearch import N_QUERIES, _auto_planes, _probe_set

    path = "/root/testdata/sf0.01/embeddings.parquet"
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    n_rows = t.num_rows
    n_planes = _auto_planes(n_rows)
    dim = len(t.column("embedding")[0])
    planes = np.random.RandomState(17).randn(dim, n_planes)
    df = t.to_pandas().sort_values("vec_id").head(N_QUERIES)
    qmat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qsigs = (((qmat @ planes) > 0) * (1 << np.arange(n_planes))).sum(axis=1)
    probes = [
        (int(qid), _probe_set(int(s), n_planes))
        for qid, s in zip(df["vec_id"], qsigs)
    ]
    terms = " + ".join(
        "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), "
        f"[{','.join(repr(float(x)) for x in planes[:, j])}]) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )
    values = ", ".join(
        f"({qid}, [{','.join(str(int(v)) for v in p)}])" for qid, p in probes
    )
    return (
        f"sig AS (SELECT vec_id, ({terms}) AS sig FROM embeddings), "
        f"probes(query_id, ps) AS (VALUES {values}), "
        "cand AS (SELECT CAST(query_id AS BIGINT) AS query_id, vec_id, sig "
        "FROM probes JOIN sig ON list_contains(ps, sig))"
    )


def _lsh_candidates_oracle() -> str:
    """Candidate sets of the seeded LSH index (`_lsh_index_ctes`).  This is
    the exact-oracle companion to s_ann_lsh — and, verbatim, the oracle
    for the store-backed s_ann_partitioned_candidates (same index, same
    probe sets)."""
    return (
        f"WITH {_lsh_index_ctes()} "
        "SELECT query_id, vec_id FROM cand ORDER BY query_id, vec_id"
    )


def _ivf_index_ctes():
    """Shared CTE text of the IVF index, recomputed in DuckDB: the coarse
    quantizer is retrained INDEPENDENTLY on the driver (same seeded
    `_kmeans` numpy routine, sample = the 50*k lowest vec_ids read straight
    from the raw parquet — never the Ray pipeline), centroids embedded as
    SQL literals, and per-vector cell assignment recomputed as argmax of
    the centroid dot products (list_indexof/list_max picks the FIRST
    maximum like numpy argmax; the dot is scale-invariant so the
    engine-side normalization needs no mirror).  Returns
    (cte_text yielding ``cand``, k, nprobe)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfray.pipelines.simsearch import N_QUERIES, _kmeans, _normalize

    path = "/root/testdata/sf0.01/embeddings.parquet"
    df = (
        pq.read_table(path, columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    n_rows = len(df)
    k = max(2, int(np.sqrt(n_rows)))
    nprobe = max(1, -(-k // 4))
    sample = _normalize(
        np.stack(df.head(min(n_rows, 50 * k))["embedding"].to_numpy()).astype(
            np.float64
        )
    )
    centroids = _kmeans(sample, k)
    qdf = df.head(N_QUERIES)
    qmat = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    probes = [
        (
            int(qid),
            np.argsort(-(qmat[qi] @ centroids.T), kind="stable")[:nprobe],
        )
        for qi, qid in enumerate(qdf["vec_id"])
    ]
    dots = ", ".join(
        "list_inner_product(CAST(embedding AS DOUBLE[]), "
        f"[{','.join(repr(float(x)) for x in centroids[j])}])"
        for j in range(k)
    )
    values = ", ".join(
        f"({qid}, [{','.join(str(int(c)) for c in p)}])" for qid, p in probes
    )
    ctes = (
        f"d AS (SELECT vec_id, [{dots}] AS dl FROM embeddings), "
        "a AS (SELECT vec_id, list_indexof(dl, list_max(dl)) - 1 AS cell FROM d), "
        f"probes(query_id, ps) AS (VALUES {values}), "
        "cand AS (SELECT CAST(query_id AS BIGINT) AS query_id, vec_id "
        "FROM probes JOIN a ON list_contains(ps, cell))"
    )
    return ctes, k, nprobe


def _ivf_candidates_oracle() -> str:
    """IVF candidate sets (`_ivf_index_ctes`): the exact-oracle companion
    to s_ann_ivf."""
    ctes, _k, _np_ = _ivf_index_ctes()
    return (
        f"WITH {ctes} "
        "SELECT query_id, vec_id FROM cand ORDER BY query_id, vec_id"
    )


def _truth_ctes() -> str:
    """Exact cosine top-k CTE (``truth``) — the s_knn_bruteforce oracle SQL
    reshaped as CTEs so the ANN recall oracles can join against it."""
    from pdfray.pipelines.simsearch import N_QUERIES, TOP_K

    return (
        "q AS (SELECT vec_id AS tq_id, embedding AS qe FROM embeddings "
        f"ORDER BY vec_id LIMIT {N_QUERIES}), "
        "scored AS (SELECT q.tq_id, e.vec_id, "
        "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
        "CAST(q.qe AS DOUBLE[])), 4) AS sim FROM embeddings e CROSS JOIN q), "
        "ranked AS (SELECT tq_id, vec_id, ROW_NUMBER() OVER "
        "(PARTITION BY tq_id ORDER BY sim DESC, vec_id) AS rnk FROM scored), "
        f"truth AS (SELECT tq_id AS query_id, vec_id FROM ranked WHERE rnk <= {TOP_K})"
    )


_RECALL_CORE = (
    # recall@k = |candidates ∩ exact top-k| / |top-k|: the approximate
    # top-k is the candidates ranked under the SAME total order as the
    # exact ranking (rounded sim desc, vec_id asc), so a truth member
    # that is a candidate can never fall out of the candidate top-k —
    # set intersection with the raw candidate sets is exact, no
    # re-scoring needed in SQL
    # queries come from probes, not cand: a zero-candidate query still
    # gets its (0, 0.0) row like the engine emits
    "qs AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id FROM probes), "
    "nc AS (SELECT query_id, COUNT(*) AS n FROM cand GROUP BY query_id), "
    "hits AS (SELECT c.query_id, COUNT(*) AS h FROM cand c JOIN truth t "
    "ON c.query_id = t.query_id AND c.vec_id = t.vec_id GROUP BY c.query_id), "
    "tn AS (SELECT query_id, COUNT(*) AS n FROM truth GROUP BY query_id)"
)


def _ann_lsh_recall_oracle(partitioned: bool) -> str:
    """Per-query recall of the seeded LSH index, fully in SQL: candidate
    sets from `_lsh_index_ctes`, exact top-k from `_truth_ctes`, recall =
    |cand ∩ truth| / |truth| (see _RECALL_CORE for why no re-scoring is
    needed).  With ``partitioned``, adds the store layout's partition
    counts: total = distinct signatures present in the corpus (one hive
    directory each), read = distinct present signatures in the union of
    the probe sets — exactly the directories `query_vector_store` lists."""
    extra_ctes = extra_cols = ""
    if partitioned:
        extra_ctes = (
            ", wanted AS (SELECT DISTINCT UNNEST(ps) AS s FROM probes), "
            "total_p AS (SELECT COUNT(DISTINCT sig) AS n FROM sig), "
            "read_p AS (SELECT COUNT(DISTINCT sig.sig) AS n FROM sig "
            "JOIN wanted ON sig.sig = wanted.s)"
        )
        extra_cols = (
            ", CAST((SELECT n FROM read_p) AS BIGINT) AS n_parts_read"
            ", CAST((SELECT n FROM total_p) AS BIGINT) AS n_parts_total"
        )
    return (
        f"WITH {_lsh_index_ctes()}, {_truth_ctes()}, {_RECALL_CORE}{extra_ctes} "
        "SELECT qs.query_id, CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_candidates, "
        "ROUND(CAST(COALESCE(hits.h, 0) AS DOUBLE) / tn.n, 4) AS recall_at_k"
        f"{extra_cols} "
        "FROM qs LEFT JOIN nc USING (query_id) LEFT JOIN hits USING (query_id) "
        "JOIN tn USING (query_id) ORDER BY qs.query_id"
    )


def _ann_ivf_recall_oracle() -> str:
    """Per-query recall of the retrained IVF index, fully in SQL
    (`_ivf_index_ctes` + `_truth_ctes` + _RECALL_CORE); n_probed and
    n_centroids are the index constants, embedded as literals."""
    ctes, k, nprobe = _ivf_index_ctes()
    return (
        f"WITH {ctes}, {_truth_ctes()}, {_RECALL_CORE} "
        "SELECT qs.query_id, CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_candidates, "
        "ROUND(CAST(COALESCE(hits.h, 0) AS DOUBLE) / tn.n, 4) AS recall_at_k, "
        f"CAST({nprobe} AS BIGINT) AS n_probed, "
        f"CAST({k} AS BIGINT) AS n_centroids "
        "FROM qs LEFT JOIN nc USING (query_id) LEFT JOIN hits USING (query_id) "
        "JOIN tn USING (query_id) ORDER BY qs.query_id"
    )


def _pq_oracle() -> str:
    """Product-quantization codes recomputed in DuckDB: codebooks retrained
    INDEPENDENTLY on the driver (shared pure-numpy `pq_codebooks` fed an
    independently-read raw-parquet sample — the `_ivf_candidates_oracle`
    scheme), embedded as literals; per-row assignment replays the
    argmin(-2 x·c + |c|^2) form via list_indexof/list_min (first-minimum,
    like numpy argmin)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfray.pipelines.simsearch import (
        PQ_CODEBOOK,
        PQ_SUBSPACES,
        _pq_bounds,
        pq_codebooks,
    )

    path = "/root/testdata/sf0.01/embeddings.parquet"
    df = (
        pq.read_table(path, columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    n_rows = len(df)
    sample = np.stack(
        df.head(min(n_rows, 50 * PQ_CODEBOOK))["embedding"].to_numpy()
    ).astype(np.float64)
    books = pq_codebooks(sample)
    dim = sample.shape[1]
    bounds = _pq_bounds(dim)
    selects = []
    for m, C in enumerate(books):
        a, b = bounds[m] + 1, bounds[m + 1]  # list_slice is 1-based inclusive
        dots = ", ".join(
            "(-2 * list_inner_product(list_slice(CAST(embedding AS DOUBLE[]), "
            f"{a}, {b}), [{','.join(repr(float(x)) for x in C[j])}]) "
            f"+ {repr(float(C[j] @ C[j]))})"
            for j in range(PQ_CODEBOOK)
        )
        selects.append(
            f"SELECT vec_id, CAST({m} AS BIGINT) AS subspace, "
            "CAST(list_indexof(dl, list_min(dl)) - 1 AS BIGINT) AS code "
            f"FROM (SELECT vec_id, [{dots}] AS dl FROM embeddings)"
        )
    return " UNION ALL ".join(selects) + " ORDER BY vec_id, subspace"


def _pca_oracle() -> str:
    """PCA projections recomputed in DuckDB: (mean, components) retrained
    INDEPENDENTLY from the raw parquet — one single-pass moment
    computation through the same shared canonicalization
    (`pca_components`: eigenvalues descending, largest-|entry| sign fix)
    — embedded as literals; the projection replays as
    list_inner_product(embedding, w) − (mean·w) per component, ROUND(,4)
    both sides (half-away on each — the sim-family convention absorbing
    the ulp gap between numpy pairwise and SQL sequential summation)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfray.pipelines.simsearch import PCA_K, pca_components, pca_moments

    path = "/root/testdata/sf0.01/embeddings.parquet"
    df = (
        pq.read_table(path, columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    n, s, g = pca_moments(X)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    W = pca_components(mean, cov, min(PCA_K, X.shape[1]))
    mu = mean @ W
    selects = []
    for j in range(W.shape[1]):
        w = ", ".join(repr(float(x)) for x in W[:, j])
        selects.append(
            f"SELECT vec_id, CAST({j} AS BIGINT) AS component, "
            "ROUND(list_inner_product(CAST(embedding AS DOUBLE[]), "
            f"[{w}]) - {repr(float(mu[j]))}, 4) AS value FROM embeddings"
        )
    return " UNION ALL ".join(selects) + " ORDER BY vec_id, component"


def _bpe_apply_oracle() -> str:
    """Golden per-document BPE token counts computed by an INDEPENDENT
    pure-Python pass over the raw sf0.01 parquet (direct .split() word
    counting — never the Ray pipeline — feeding the shared pure merge/
    apply functions), embedded as literal VALUES (the _image_hash_oracle
    scheme)."""
    import pyarrow.parquet as pq

    from pdfray.pipelines.textops import (
        bpe_apply_to_word,
        bpe_train_merges,
    )

    path = "/root/testdata/sf0.01/documents.parquet"
    t = pq.read_table(path, columns=["doc_id", "text"])
    counts: dict = {}
    docs = []
    for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = [w for w in s.split(" ") if w]
        docs.append((i, ws))
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    merges = bpe_train_merges(counts, 12)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    wlen = {w: bpe_apply_to_word(w, ranks) for w in counts}
    values = ", ".join(
        f"({i}, {len(ws)}, {sum(wlen[w] for w in ws)})" for i, ws in docs
    )
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(n_words AS BIGINT) AS n_words, "
        "CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens "
        f"FROM (VALUES {values}) AS g(doc_id, n_words, n_bpe_tokens) "
        "ORDER BY doc_id"
    )


def _bpe_train_oracle() -> str:
    """Golden BPE merge table (rank, left, right, count) from an
    INDEPENDENT pure-Python word-count pass over the raw sf0.01 parquet
    feeding the shared pure merge loop, embedded as literal VALUES (the
    _bpe_apply_oracle scheme).  What the exact compare certifies is the
    engine's DISTRIBUTED combiner word-count pass: a single miscounted
    word flips a merge's count (or its argmax rank) and fails the hash."""
    import pyarrow.parquet as pq

    from pdfray.pipelines.textops import bpe_train_merges

    path = "/root/testdata/sf0.01/documents.parquet"
    t = pq.read_table(path, columns=["text"])
    counts: dict = {}
    for s in t["text"].to_pylist():
        for w in s.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    merges = bpe_train_merges(counts, 12)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    values = ", ".join(
        f"({rank}, {q(l)}, {q(r)}, {c})"
        for rank, (l, r, c) in enumerate(merges, start=1)
    )
    return (
        'SELECT CAST(rank AS BIGINT) AS rank, "left", "right", '
        'CAST("count" AS BIGINT) AS "count" '
        f'FROM (VALUES {values}) AS g(rank, "left", "right", "count") '
        "ORDER BY rank"
    )


def _frame_sample_oracle() -> str:
    """Golden frame-sample rows for the sf0.01 AV fixture's video half,
    computed from the PRE-encode luma arrays (fixtures._video_frames_arrays
    — the Y4M decoder is never touched), embedded as literal VALUES: a
    match certifies the container frame-offset index and the sampled-plane
    slicing end to end.  Planted broken rows (truncated / unsupported
    colorspace) must land as 0-count null-hash rows."""
    import hashlib

    from pdfray.pipelines.multimodal import FRAME_STRIDE
    from pdfray.sources import fixtures as FX

    n_av = max(20, FX.sf_doc_count(0.01) // 2)
    rows = []
    for k in range(n_av):
        if k % 2 == 0:  # audio rows: pruned by the engine's read predicate
            continue
        if k % 13 in (5, 11):  # planted broken (av_rows)
            rows.append((f"https://av.example.org/broken/{k:08d}.y4m", 0, 0, None))
            continue
        frames, _cs = FX._video_frames_arrays(k)
        sampled = frames[::FRAME_STRIDE]
        h = hashlib.sha1(b"".join(f.tobytes() for f in sampled)).hexdigest()[:16]
        rows.append(
            (f"https://av.example.org/video/{k:08d}.y4m", len(frames),
             len(sampled), h)
        )
    values = ", ".join(
        f"('{u}', {nf}, {ns}, "
        + (f"'{h}'" if h else "CAST(NULL AS VARCHAR)")
        + ")"
        for u, nf, ns, h in rows
    )
    return (
        "SELECT url, CAST(n_frames AS BIGINT) AS n_frames, "
        "CAST(n_sampled AS BIGINT) AS n_sampled, frames_hash "
        f"FROM (VALUES {values}) AS g(url, n_frames, n_sampled, frames_hash) "
        "ORDER BY url"
    )


def _pq_adc_ctes() -> str:
    """Shared CTE text for ADC scoring in DuckDB — codebooks retrained
    independently (the `_pq_oracle` scheme), per-row code assignment
    replayed via list_indexof/list_min, the per-(query, subspace, code)
    squared-distance LUT embedded as literal VALUES (n_queries x 4 x 16
    doubles).  Yields CTEs ``codes`` and ``lut`` — shared by the plain ADC
    oracle and the IVF-PQ composition."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfray.pipelines.simsearch import (
        N_QUERIES,
        PQ_CODEBOOK,
        _pq_bounds,
        pq_codebooks,
    )

    path = "/root/testdata/sf0.01/embeddings.parquet"
    df = (
        pq.read_table(path, columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sample = np.stack(
        df.head(min(len(df), 50 * PQ_CODEBOOK))["embedding"].to_numpy()
    ).astype(np.float64)
    books = pq_codebooks(sample)
    dim = sample.shape[1]
    bounds = _pq_bounds(dim)
    qdf = df.head(N_QUERIES)
    qids = qdf["vec_id"].to_numpy()
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    lut_rows = []
    for m, C in enumerate(books):
        qs = qmat[:, bounds[m] : bounds[m + 1]]
        d = ((qs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        for qi, qid in enumerate(qids):
            for j in range(PQ_CODEBOOK):
                lut_rows.append(f"({int(qid)}, {m}, {j}, {repr(float(d[qi, j]))})")
    code_selects = []
    for m, C in enumerate(books):
        a, b = bounds[m] + 1, bounds[m + 1]  # list_slice is 1-based inclusive
        dots = ", ".join(
            "(-2 * list_inner_product(list_slice(CAST(embedding AS DOUBLE[]), "
            f"{a}, {b}), [{','.join(repr(float(x)) for x in C[j])}]) "
            f"+ {repr(float(C[j] @ C[j]))})"
            for j in range(PQ_CODEBOOK)
        )
        code_selects.append(
            f"SELECT vec_id, CAST({m} AS BIGINT) AS subspace, "
            "CAST(list_indexof(dl, list_min(dl)) - 1 AS BIGINT) AS code "
            f"FROM (SELECT vec_id, [{dots}] AS dl FROM embeddings)"
        )
    return (
        "codes AS (" + " UNION ALL ".join(code_selects) + "), "
        "lut(query_id, subspace, code, d) AS (VALUES "
        + ", ".join(lut_rows)
        + ")"
    )


def _pq_adc_oracle() -> str:
    """ADC top-k recomputed in DuckDB over the `_pq_adc_ctes` machinery:
    dist = ROUND(SUM over subspaces, 4), ranked dist ASC / vec_id ASC —
    the whole train/assign/lookup/rank pipeline value-checked end to
    end."""
    from pdfray.pipelines.simsearch import TOP_K

    return (
        "WITH " + _pq_adc_ctes() + ", "
        "scored AS (SELECT l.query_id, c.vec_id, ROUND(SUM(l.d), 4) AS dist "
        "FROM codes c JOIN lut l ON l.subspace = c.subspace AND l.code = c.code "
        "GROUP BY l.query_id, c.vec_id), "
        "ranked AS (SELECT query_id, vec_id, dist, "
        "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank "
        "FROM scored) "
        f"SELECT query_id, rank, vec_id, dist FROM ranked WHERE rank <= {TOP_K} "
        "ORDER BY query_id, rank"
    )


def _ivfpq_oracle() -> str:
    """IVF-PQ composed in DuckDB: the retrained-coarse-quantizer candidate
    CTEs (`_ivf_index_ctes` — cell argmax + probe membership) restrict the
    ADC scoring CTEs (`_pq_adc_ctes`) so only probed-cell vectors are
    scored, then the same ROUND(SUM)/rank replay as plain ADC.  Both index
    halves are independently retrained from the raw parquet — the
    composition inherits their exactness."""
    from pdfray.pipelines.simsearch import TOP_K

    ivf_ctes, _k, _nprobe = _ivf_index_ctes()
    return (
        "WITH " + ivf_ctes + ", " + _pq_adc_ctes() + ", "
        "scored AS (SELECT cand.query_id, cand.vec_id, ROUND(SUM(l.d), 4) AS dist "
        "FROM cand JOIN codes c ON c.vec_id = cand.vec_id "
        "JOIN lut l ON l.query_id = cand.query_id "
        "AND l.subspace = c.subspace AND l.code = c.code "
        "GROUP BY cand.query_id, cand.vec_id), "
        "ranked AS (SELECT query_id, vec_id, dist, "
        "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank "
        "FROM scored) "
        f"SELECT query_id, rank, vec_id, dist FROM ranked WHERE rank <= {TOP_K} "
        "ORDER BY query_id, rank"
    )


def _ann_rerank_oracle() -> str:
    """Two-stage retrieval composed in DuckDB: the retrained-literal ADC
    CTEs (`_pq_adc_ctes`) produce the per-query shortlist under the exact
    engine order (rounded dist ASC, vec_id ASC), then
    list_cosine_similarity re-scores ONLY the shortlist join — the
    shortlist recall and the refine ranking are both value-checked."""
    from pdfray.pipelines.simsearch import N_QUERIES, RERANK_SHORTLIST, TOP_K

    return (
        "WITH " + _pq_adc_ctes() + ", "
        "scored AS (SELECT l.query_id, c.vec_id, ROUND(SUM(l.d), 4) AS dist "
        "FROM codes c JOIN lut l ON l.subspace = c.subspace AND l.code = c.code "
        "GROUP BY l.query_id, c.vec_id), "
        "short AS (SELECT query_id, vec_id FROM "
        "(SELECT query_id, vec_id, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY dist, vec_id) AS r FROM scored) "
        f"WHERE r <= {RERANK_SHORTLIST}), "
        "qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe "
        f"FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}), "
        "sims AS (SELECT s.query_id, s.vec_id, "
        "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qe), 4) "
        "AS sim FROM short s JOIN embeddings e ON e.vec_id = s.vec_id "
        "JOIN qv ON qv.query_id = s.query_id), "
        "ranked AS (SELECT query_id, vec_id, sim, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM sims) "
        f"SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= {TOP_K} "
        "ORDER BY query_id, rank"
    )


def _ood_oracle() -> str:
    """Truncated-Mahalanobis OOD scores recomputed in DuckDB:
    (mean, W, lambda) retrained INDEPENDENTLY from the raw parquet via the
    shared `ood_params` (same canonicalization as s_pca), embedded as
    literals; the score replays as a LEFT-ASSOCIATED + chain of
    power(list_inner_product(x, w_j) - mu_j, 2) / lam_j terms — the same
    accumulation order as the engine — ROUND(,4) both sides (the
    sim-family ulp convention)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfray.pipelines.simsearch import OOD_K, ood_params, pca_moments

    path = "/root/testdata/sf0.01/embeddings.parquet"
    df = (
        pq.read_table(path, columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    n, s, g = pca_moments(X)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    W, mu, lam = ood_params(mean, cov, min(OOD_K, X.shape[1]))
    terms = []
    for j in range(W.shape[1]):
        w = ",".join(repr(float(x)) for x in W[:, j])
        terms.append(
            "(power(list_inner_product(CAST(embedding AS DOUBLE[]), "
            f"[{w}]) - {float(mu[j])!r}, 2) / {float(lam[j])!r})"
        )
    expr = " + ".join(terms)
    return (
        f"SELECT vec_id, ROUND({expr}, 4) AS score "
        "FROM embeddings ORDER BY vec_id"
    )


def _kmeans_init_assign_oracle() -> str:
    """One k-means E-step with the deterministic init centroids (the k
    lowest-vec_id vectors, read independently from the raw parquet and
    embedded as literals); argmin replayed via list_indexof/list_min."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdfray.pipelines.simsearch import KMEANS_K

    path = "/root/testdata/sf0.01/embeddings.parquet"
    df = (
        pq.read_table(path, columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .head(KMEANS_K)
    )
    C = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    dots = ", ".join(
        "(-2 * list_inner_product(CAST(embedding AS DOUBLE[]), "
        f"[{','.join(repr(float(x)) for x in C[j])}]) "
        f"+ {repr(float(C[j] @ C[j]))})"
        for j in range(len(C))
    )
    return (
        "SELECT vec_id, "
        "CAST(list_indexof(dl, list_min(dl)) - 1 AS BIGINT) AS cluster "
        f"FROM (SELECT vec_id, [{dots}] AS dl FROM embeddings) "
        "ORDER BY vec_id"
    )


def _gopher_oracle() -> str:
    """Per-doc Gopher rule flags (shared by the t_gopher_rules oracle and
    _attrition_oracle — one SQL kernel, no rule drift)."""
    return (
        # every rule recomputed verbatim; thresholds as integer
        # cross-multiplications, so no float ever enters the compare
        "WITH m AS (SELECT doc_id, "
        "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) "
        "AS n_words, "
        "len(regexp_replace(text, '\\s', '', 'g')) AS sum_word_chars, "
        "(len(text) - len(replace(text, '#', ''))) "
        "+ (len(text) - len(replace(text, '…', ''))) "
        "+ (len(text) - len(replace(text, '...', ''))) // 3 AS n_symbols, "
        "list_filter(string_split(text, chr(10)), l -> l <> '') AS ls, "
        "len(regexp_extract_all(text, '[^\\s]*[A-Za-z][^\\s]*')) "
        "AS n_alpha_words, "
        + " + ".join(
            "(CASE WHEN regexp_matches(lower(text), "
            f"'(^|\\s){w}(\\s|$)') THEN 1 ELSE 0 END)"
            for w in (
                "the",
                "be",
                "to",
                "of",
                "and",
                "that",
                "have",
                "with",
            )
        )
        + " AS n_stop_distinct FROM documents), "
        "x AS (SELECT doc_id, n_words, sum_word_chars, n_symbols, "
        "CAST(len(ls) AS BIGINT) AS n_lines, "
        "CAST(len(list_filter(ls, l -> starts_with(l, '- ') "
        "OR starts_with(l, '* ') OR starts_with(l, '• '))) AS BIGINT) "
        "AS n_bullet, "
        "CAST(len(list_filter(ls, l -> ends_with(l, '...') "
        "OR ends_with(l, '…'))) AS BIGINT) AS n_ellipsis_lines, "
        "n_alpha_words, CAST(n_stop_distinct AS BIGINT) AS n_stop_distinct "
        "FROM m) "
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
        "CAST(sum_word_chars AS BIGINT) AS sum_word_chars, "
        "CAST(n_symbols AS BIGINT) AS n_symbols, n_lines, n_bullet, "
        "n_ellipsis_lines, CAST(n_alpha_words AS BIGINT) AS n_alpha_words, "
        "n_stop_distinct, "
        "(n_words BETWEEN 50 AND 100000 "
        "AND 3 * n_words <= sum_word_chars "
        "AND sum_word_chars <= 10 * n_words "
        "AND 10 * n_symbols <= n_words "
        "AND 10 * n_bullet <= 9 * n_lines "
        "AND 10 * n_ellipsis_lines <= 3 * n_lines "
        "AND 5 * n_alpha_words >= 4 * n_words "
        "AND n_stop_distinct >= 2) AS keep "
        "FROM x ORDER BY doc_id"
    )


def _c4_oracle() -> str:
    """Per-doc C4 rule flags (shared by the t_c4_filter oracle and
    _attrition_oracle)."""
    return (
        "WITH l AS (SELECT doc_id, text, "
        "list_filter(list_transform(string_split(text, chr(10)), "
        "r -> trim(r, ' ' || chr(9) || chr(13))), x -> x <> '') AS ls "
        "FROM documents), "
        "m AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines, "
        "CAST(len(list_filter(ls, l -> (ends_with(l, '.') "
        "OR ends_with(l, '!') OR ends_with(l, '?') "
        "OR ends_with(l, '\"')) "
        "AND len(list_filter(string_split_regex(l, '\\s+'), "
        "w -> w <> '')) >= 3 "
        "AND NOT contains(lower(l), 'javascript'))) AS BIGINT) "
        "AS n_kept_lines, "
        "contains(lower(text), 'lorem ipsum') AS has_lorem, "
        "contains(text, '{') AS has_brace FROM l) "
        "SELECT doc_id, n_lines, n_kept_lines, has_lorem, has_brace, "
        "(n_kept_lines >= 3 AND NOT has_lorem AND NOT has_brace) AS keep "
        "FROM m ORDER BY doc_id"
    )


def _attrition_oracle() -> str:
    """The gate cascade replayed from the SAME per-doc rule oracle the
    individual queries register (the Gopher rule CTE reused verbatim),
    then five funnel rows from ONE aggregate over the cumulative flags;
    exact_dedup survivors = COUNT(DISTINCT md5(text)) among full-cascade
    survivors (first-per-hash keeps exactly one per group)."""
    return (
        f"WITH g AS ({_gopher_oracle()}), "
        "f AS (SELECT d.doc_id, (d.n_chars >= 200) AS p1, "
        "(d.n_chars >= 200 AND g.n_words BETWEEN 50 AND 100000) AS p12, "
        "(d.n_chars >= 200 AND g.n_words BETWEEN 50 AND 100000 "
        "AND g.n_stop_distinct >= 1) AS p123, "
        "md5(d.text) AS h FROM documents d "
        "JOIN g ON g.doc_id = d.doc_id), "
        "c AS (SELECT COUNT(*) AS n, COUNT(*) FILTER (p1) AS n1, "
        "COUNT(*) FILTER (p12) AS n12, COUNT(*) FILTER (p123) AS n123, "
        "COUNT(DISTINCT h) FILTER (p123) AS n4 FROM f) "
        "SELECT * FROM ("
        "SELECT CAST(0 AS BIGINT) AS stage_idx, 'input' AS stage, "
        "CAST(n AS BIGINT) AS n_in, CAST(0 AS BIGINT) AS n_dropped, "
        "CAST(n AS BIGINT) AS n_out FROM c "
        "UNION ALL SELECT 1, 'min_length', n, n - n1, n1 FROM c "
        "UNION ALL SELECT 2, 'word_count', n1, n1 - n12, n12 FROM c "
        "UNION ALL SELECT 3, 'stopword', n12, n12 - n123, n123 FROM c "
        "UNION ALL SELECT 4, 'exact_dedup', n123, n123 - n4, n4 FROM c"
        ") ORDER BY stage_idx"
    )


def _zorder_oracle() -> str:
    """The Z-curve key replayed as the same 32-term shift/mask expression
    the engine's `_zorder_key` evaluates (two's-complement & and
    arithmetic >> agree between numpy int64 and DuckDB BIGINT, negative
    days/cents included); day = datediff from epoch over CAST(ts AS DATE)
    — floor-of-epoch-days, matching numpy floor_divide pre-epoch too."""
    from pdfray.pipelines.relational import (
        ZORDER_BITS,
        ZORDER_BOX,
        ZORDER_SHIFT,
    )

    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(((d1 >> {i}) & 1) << {2 * i})")
        terms.append(f"(((d2 >> {i}) & 1) << {2 * i + 1})")
    zexpr = " | ".join(terms)
    lo_d, hi_d, lo_c, hi_c = ZORDER_BOX
    return (
        "WITH q AS (SELECT CAST(datediff('day', DATE '1970-01-01', "
        "CAST(ts AS DATE)) AS BIGINT) AS day, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events), "
        "k AS (SELECT day, cents, (day & 65535) AS d1, "
        "(cents & 65535) AS d2 FROM q), "
        f"z AS (SELECT day, cents, ({zexpr}) >> {ZORDER_SHIFT} AS zbucket "
        "FROM k), "
        "m AS (SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "MIN(day) AS min_day, MAX(day) AS max_day, "
        "MIN(cents) AS min_cents, MAX(cents) AS max_cents "
        "FROM z GROUP BY zbucket) "
        "SELECT zbucket, n_rows, min_day, max_day, min_cents, max_cents, "
        f"CAST(CASE WHEN max_day < {lo_d} OR min_day > {hi_d} "
        f"OR max_cents < {lo_c} OR min_cents > {hi_c} "
        "THEN 0 ELSE 1 END AS BIGINT) AS touched "
        "FROM m ORDER BY zbucket"
    )


def _langid_oracle() -> str:
    """The language-ID heuristic recomputed verbatim in DuckDB: distinct
    word-marker intersections (x2.0) + characteristic-character counts
    (x0.5) per language, argmax with the engine's exact tie-break — max by
    (score, lang name), so ties resolve fr > es > en > de, and a zero best
    score falls back to 'en'.  Marker tables come from the same module
    constants the stage uses."""
    from pdfray.pipelines.textops import _LANG_CHARS, _LANG_MARKERS

    word = "[a-zäöüßéèêàçùñáíóú¿¡]+"

    def score(lang: str) -> str:
        marks = ",".join(f"'{m}'" for m in sorted(_LANG_MARKERS[lang]))
        s = (
            f"2.0 * len(list_intersect(list_distinct("
            f"regexp_extract_all(lower(text), '{word}')), [{marks}]))"
        )
        for c in _LANG_CHARS.get(lang, ""):
            s += (
                f" + 0.5 * (length(lower(text)) - "
                f"length(replace(lower(text), '{c}', '')))"
            )
        return s

    cols = ", ".join(f"({score(l)}) AS s_{l}" for l in ("en", "de", "fr", "es"))
    return (
        f"WITH s AS (SELECT doc_id, lang, {cols} FROM documents), "
        "b AS (SELECT doc_id, lang, s_en, s_de, s_fr, s_es, "
        "GREATEST(s_en, s_de, s_fr, s_es) AS best FROM s) "
        "SELECT doc_id, CASE WHEN best <= 0 THEN 'en' "
        "WHEN s_fr = best THEN 'fr' WHEN s_es = best THEN 'es' "
        "WHEN s_en = best THEN 'en' ELSE 'de' END AS lang_pred, lang "
        "FROM b ORDER BY doc_id"
    )


def _langid_eval_oracle() -> str:
    """Per-class precision/recall/F1 of the langid heuristic vs the
    labeled lang column: the prediction CTE is `_langid_oracle()` reused
    verbatim, so the eval can never drift from the classifier it
    audits; metrics are floored integer-scaled rationals with the
    zero-denominator-reports-0 CASE convention (mirrored in the
    engine)."""
    return (
        f"WITH pred AS ({_langid_oracle()}), "
        "cls AS (SELECT lang AS c FROM pred "
        "UNION SELECT lang_pred FROM pred), "
        "conf AS (SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM pred GROUP BY lang, lang_pred), "
        "m AS (SELECT cls.c AS lang, "
        "CAST(COALESCE((SELECT SUM(n) FROM conf WHERE conf.lang = cls.c), 0) "
        "AS BIGINT) AS support, "
        "CAST(COALESCE((SELECT SUM(n) FROM conf "
        "WHERE conf.lang_pred = cls.c), 0) AS BIGINT) AS predicted, "
        "CAST(COALESCE((SELECT SUM(n) FROM conf WHERE conf.lang = cls.c "
        "AND conf.lang_pred = cls.c), 0) AS BIGINT) AS tp FROM cls) "
        "SELECT lang, support, predicted, tp, "
        "CAST(CASE WHEN predicted > 0 THEN (1000000 * tp) // predicted "
        "ELSE 0 END AS BIGINT) AS p_x1e6, "
        "CAST(CASE WHEN support > 0 THEN (1000000 * tp) // support "
        "ELSE 0 END AS BIGINT) AS r_x1e6, "
        "CAST(CASE WHEN predicted + support > 0 THEN "
        "(2000000 * tp) // (predicted + support) ELSE 0 END AS BIGINT) "
        "AS f_x1e6 "
        "FROM m ORDER BY lang"
    )


def _quality_oracle() -> str:
    """Quality counts incl. the union-stopword count (the engine's marker
    list is embedded as SQL literals so both sides share one source)."""
    from pdfray.pipelines.textops import _ALL_STOPWORDS

    stops = ",".join(f"'{w}'" for w in _ALL_STOPWORDS)
    return (
        "SELECT doc_id, "
        "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens, "
        "length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha, "
        "length(text) - length(replace(text, ' ', '')) AS n_spaces, "
        "length(text) AS n_chars, "
        f"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), "
        f"x -> list_contains([{stops}], x))) AS BIGINT) AS n_stopwords "
        "FROM documents ORDER BY doc_id"
    )


# MLE bigram model recomputed verbatim: c2 over bigram strings (words are
# space-free so 'w1 w2' keys are unambiguous), c1 over bigram-left contexts,
# score = sum ln(c2/c1) per doc in half-up-rounded milli-units (ln is
# transcendental — no true score sits on a boundary); <2-token docs COALESCE
# to zero.  Shared by t_bigram_logprob and t_ccnet_buckets (the engine
# shares the model the same way via textops._bigram_scored).
_BIGRAM_SCORED_CTE = (
    "toks AS (SELECT doc_id, "
    "list_filter(string_split(text, ' '), x -> x <> '') AS w "
    "FROM documents), "
    "bg AS (SELECT doc_id, "
    "unnest(list_transform(generate_series(1, len(w) - 1), "
    "i -> w[i] || ' ' || w[i+1])) AS bigram, "
    "unnest(list_transform(generate_series(1, len(w) - 1), "
    "i -> w[i])) AS w1 FROM toks WHERE len(w) >= 2), "
    "c2 AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram), "
    "c1 AS (SELECT w1, COUNT(*) AS c FROM bg GROUP BY w1), "
    "sagg AS (SELECT b.doc_id, COUNT(*) AS n_bigrams, "
    "SUM(ln(CAST(c2.c AS DOUBLE) / c1.c)) AS lp FROM bg b "
    "JOIN c2 USING (bigram) JOIN c1 USING (w1) GROUP BY b.doc_id), "
    "scored AS (SELECT d.doc_id, CAST(COALESCE(sagg.n_bigrams, 0) AS BIGINT) "
    "AS n_bigrams, CAST(FLOOR(COALESCE(sagg.lp, 0) * 1000 + 0.5) "
    "AS BIGINT) AS logprob_x1e3 "
    "FROM documents d LEFT JOIN sagg USING (doc_id))"
)


def _mmr_oracle() -> str:
    """The engine's integer MMR greedy unrolled: the shortlist is the knn
    CTE on the 1e-4 sim grid (rel = ROUND(sim·1e4) as BIGINT), pairwise
    sims between shortlist members land on the same grid, and each of the
    MMR_K steps picks argmax(7·rel − 3·max_pair, ties by vec_id) over the
    not-yet-selected candidates — all-integer comparisons, so the greedy
    path replays bit-exactly (the PageRank-unroll pattern; a float MMR
    could tie-break differently on grid-valued data)."""
    from pdfray.pipelines import simsearch as S

    lam = S.MMR_LAMBDA_NUM
    div = S.MMR_LAMBDA_DEN - S.MMR_LAMBDA_NUM
    head = (
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
        "FROM embeddings ORDER BY vec_id LIMIT 5), "
        "scored AS (SELECT q.query_id, e.vec_id, "
        "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
        "CAST(q.qe AS DOUBLE[])), 4) AS sim FROM embeddings e CROSS JOIN q), "
        "sl AS (SELECT query_id, vec_id, "
        "CAST(ROUND(sim * 10000, 0) AS BIGINT) AS rel FROM ("
        "SELECT query_id, vec_id, sim, ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk "
        "FROM scored) WHERE rnk <= 10), "
        "pw AS (SELECT s.query_id, s.vec_id AS da, t.vec_id AS db, "
        "CAST(ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), "
        "CAST(eb.embedding AS DOUBLE[])) * 10000, 0) AS BIGINT) AS ps "
        "FROM sl s JOIN sl t ON s.query_id = t.query_id "
        "AND s.vec_id <> t.vec_id "
        "JOIN embeddings ea ON ea.vec_id = s.vec_id "
        "JOIN embeddings eb ON eb.vec_id = t.vec_id), "
        f"s1 AS (SELECT query_id, vec_id, {lam} * rel AS mmr FROM sl "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY rel DESC, vec_id) = 1), "
        "sel1 AS (SELECT query_id, vec_id FROM s1)"
    )
    steps = []
    for i in range(2, S.MMR_K + 1):
        steps.append(
            f", c{i} AS (SELECT c.query_id, c.vec_id, "
            f"{lam} * c.rel - {div} * MAX(p.ps) AS mmr "
            f"FROM sl c JOIN pw p ON p.query_id = c.query_id "
            f"AND p.da = c.vec_id "
            f"JOIN sel{i - 1} s ON s.query_id = p.query_id "
            f"AND s.vec_id = p.db "
            f"WHERE NOT EXISTS (SELECT 1 FROM sel{i - 1} x "
            f"WHERE x.query_id = c.query_id AND x.vec_id = c.vec_id) "
            f"GROUP BY c.query_id, c.vec_id, c.rel), "
            f"s{i} AS (SELECT query_id, vec_id, mmr FROM c{i} "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id "
            f"ORDER BY mmr DESC, vec_id) = 1), "
            f"sel{i} AS (SELECT * FROM sel{i - 1} "
            f"UNION ALL SELECT query_id, vec_id FROM s{i})"
        )
    union = " UNION ALL ".join(
        f"SELECT query_id, vec_id, mmr, {i} AS r FROM s{i}"
        for i in range(1, S.MMR_K + 1)
    )
    return (
        head
        + "".join(steps)
        + " SELECT query_id, CAST(r AS BIGINT) AS rank, vec_id, "
        "CAST(mmr AS BIGINT) AS mmr_x1e5 FROM (" + union + ") "
        "ORDER BY query_id, rank"
    )


def _pagerank_oracle() -> str:
    """The engine's integer PageRank recurrence unrolled: r0 = SCALE for
    every node, r_{k+1}(v) = base + (85 * SUM(r_k(u) // deg(u))) // 100
    over in-edges — every term an int64, so three chained CTEs replay the
    distributed iteration verbatim (a float PageRank could never
    hash-match: its per-node sums depend on reduction order)."""
    from pdfray.pipelines import relational as R

    scale = R.PR_SCALE
    base = 15 * scale // 100
    it = (
        "{nxt} AS (SELECT e.v AS u, CAST({base} + (85 * SUM({prev}.r // deg.d))"
        " // 100 AS BIGINT) AS r FROM edges e "
        "JOIN {prev} ON e.u = {prev}.u JOIN deg ON e.u = deg.u GROUP BY e.v)"
    )
    iters = ", ".join(
        it.format(nxt=f"r{k + 1}", prev=f"r{k}", base=base)
        for k in range(R.PR_ITERS)
    )
    return (
        "WITH pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s "
        "FROM lineitem), "
        "edges AS (SELECT p * 2 AS u, s * 2 + 1 AS v FROM pairs "
        "UNION ALL SELECT s * 2 + 1, p * 2 FROM pairs), "
        "deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u), "
        f"r0 AS (SELECT u, CAST({scale} AS BIGINT) AS r FROM deg), "
        f"{iters} "
        "SELECT CASE WHEN u % 2 = 0 THEN 'part' ELSE 'supplier' END "
        'AS node_type, CAST(u // 2 AS BIGINT) AS "key", r AS pr_x1e9 '
        f'FROM r{R.PR_ITERS} ORDER BY node_type, "key"'
    )


def _kcore_oracle() -> str:
    """The bounded-round peel unrolled: a_r = nodes of d_{r-1} with
    deg >= k, e_r = edges with both endpoints in a_r, d_r = degrees of
    e_r — all integer counts, so the chained CTEs replay the engine's
    broadcast-bitmap rounds verbatim.  k and the round count come from
    the SAME constants the engine uses (no drift possible)."""
    from pdfray.pipelines.relational import KCORE_K, KCORE_ROUNDS

    ctes = [
        "pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s "
        "FROM lineitem)",
        "e0 AS (SELECT p * 2 AS u, s * 2 + 1 AS v FROM pairs "
        "UNION ALL SELECT s * 2 + 1, p * 2 FROM pairs)",
        "d0 AS (SELECT u, COUNT(*) AS deg FROM e0 GROUP BY u)",
    ]
    rows = [
        "SELECT CAST(0 AS BIGINT) AS round, "
        "(SELECT COUNT(*) FROM d0) AS n_alive, "
        "(SELECT COUNT(*) FROM e0) // 2 AS n_core_edges"
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"a{r} AS (SELECT u FROM d{p} WHERE deg >= {KCORE_K})"
        )
        ctes.append(
            f"e{r} AS (SELECT e0.u, e0.v FROM e0 "
            f"JOIN a{r} x ON e0.u = x.u JOIN a{r} y ON e0.v = y.u)"
        )
        ctes.append(
            f"d{r} AS (SELECT u, COUNT(*) AS deg FROM e{r} GROUP BY u)"
        )
        rows.append(
            f"SELECT CAST({r} AS BIGINT), (SELECT COUNT(*) FROM a{r}), "
            f"(SELECT COUNT(*) FROM e{r}) // 2"
        )
    return (
        "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(rows)
        + " ORDER BY round"
    )


def _perceptron_oracle() -> str:
    """The engine's batch-perceptron recurrence unrolled (the
    q_pagerank_bipartite scheme applied to model training): features
    quantized on the 1/64 grid with the SAME floor(x*64 + 0.5)
    expression (64 is a power of two, so x*64 is exact in double and
    both sides floor the identical value), every epoch update an
    integer SUM (order-free), each epoch one chained CTE triple
    (margins -> misclassified -> new weights).  Epoch count and grid
    come from the engine's constants."""
    from pdfray.pipelines.simsearch import PERC_EPOCHS, PERC_GRID

    ctes = [
        "x AS (SELECT vec_id AS i, generate_subscripts(embedding, 1) - 1 "
        "AS j, CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * "
        f"{PERC_GRID} + 0.5) AS BIGINT) AS x FROM embeddings)",
        "y AS (SELECT vec_id AS i, CASE WHEN label % 2 = 0 THEN 1 "
        "ELSE -1 END AS y FROM embeddings)",
        # epoch 1: w0 = 0 -> margin 0 -> everything misclassified
        "w1 AS (SELECT x.j, CAST(SUM(y.y * x.x) AS BIGINT) AS w "
        "FROM x JOIN y USING(i) GROUP BY x.j)",
        "b1 AS (SELECT CAST(COALESCE(SUM(y), 0) AS BIGINT) AS b FROM y)",
        "m1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM y)",
    ]
    for e in range(2, PERC_EPOCHS + 1):
        p = e - 1
        ctes.append(
            f"marg{e} AS (SELECT y.i, y.y, y.y * (SUM(w{p}.w * x.x) + "
            f"(SELECT b FROM b{p})) AS marg FROM x "
            f"JOIN w{p} ON x.j = w{p}.j JOIN y ON x.i = y.i "
            "GROUP BY y.i, y.y)"
        )
        ctes.append(f"mis{e} AS (SELECT i, y FROM marg{e} WHERE marg <= 0)")
        ctes.append(
            f"w{e} AS (SELECT w{p}.j, CAST(w{p}.w + COALESCE(u.s, 0) "
            f"AS BIGINT) AS w FROM w{p} LEFT JOIN "
            f"(SELECT x.j, SUM(m.y * x.x) AS s FROM x "
            f"JOIN mis{e} m ON x.i = m.i GROUP BY x.j) u "
            f"ON w{p}.j = u.j)"
        )
        ctes.append(
            f"b{e} AS (SELECT CAST((SELECT b FROM b{p}) + "
            f"COALESCE((SELECT SUM(y) FROM mis{e}), 0) AS BIGINT) AS b)"
        )
        ctes.append(
            f"m{e} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM mis{e})"
        )
    rows = []
    for e in range(1, PERC_EPOCHS + 1):
        rows.append(
            f"SELECT CAST({e} AS BIGINT) AS epoch, CAST(-2 AS BIGINT) AS j, "
            f"(SELECT n FROM m{e}) AS w"
        )
        rows.append(f"SELECT {e}, -1, (SELECT b FROM b{e})")
        rows.append(f"SELECT {e}, j, w FROM w{e}")
    return (
        "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(rows)
        + " ORDER BY epoch, j"
    )


def oracle_sql() -> dict[str, str]:
    from pdfray.pipelines import relational as R
    from pdfray.pipelines import simsearch as S

    fixture = _fixture_sql_path()
    media = _media_sql_path()
    av = _av_sql_path()
    sql = {
        "extract_text": (
            f"SELECT url, text FROM read_parquet('{fixture}')"
        ),
        "extract_warc": (
            f"SELECT url, text FROM read_parquet('{fixture}')"
        ),
        "extract_stats_by_lang": (
            # CAST the SUMs: DuckDB SUM(BIGINT) yields HUGEINT->float64 in
            # pandas while the engine emits int64 — same values, flipped hash
            f"SELECT lang, COUNT(*) AS n_docs, "
            f"CAST(SUM(OCTET_LENGTH(html)) AS BIGINT) AS sum_bytes, "
            f"CAST(SUM(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty "
            f"FROM read_parquet('{fixture}') GROUP BY lang ORDER BY lang"
        ),
        "extract_repaired": (
            f"SELECT url, text FROM read_parquet('{fixture}') "
            f"WHERE url LIKE '%/simple/%'"
        ),
        "extract_version_counts": (
            f"SELECT COALESCE(pdf_version, 'none') AS pdf_version, "
            f"COUNT(*) AS n_docs FROM read_parquet('{fixture}') "
            f"GROUP BY 1 ORDER BY 1"
        ),
        "extract_partition_metrics": (
            f"SELECT CAST(partition_id AS BIGINT) AS partition_id, "
            f"COUNT(*) AS n_docs, "
            f"CAST(SUM(OCTET_LENGTH(html)) AS BIGINT) AS sum_bytes, "
            f"CAST(SUM(n_pages) AS BIGINT) AS n_pages, "
            f"CAST(SUM(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty "
            f"FROM read_parquet('{fixture}') GROUP BY 1 ORDER BY 1"
        ),
        "q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
            "ROUND(AVG(l_quantity), 4) AS avg_qty, "
            "ROUND(AVG(l_discount), 4) AS avg_disc, "
            "COUNT(*) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "q_filter_topk": (
            "SELECT l_orderkey, l_linenumber, "
            "ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue "
            "FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-07-01' "
            "ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 100"
        ),
        "q_broadcast_join_segment": (
            "SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue, "
            "COUNT(*) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "q_hash_join_brand": (
            "SELECT p_brand, ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_rows "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "GROUP BY p_brand ORDER BY p_brand"
        ),
        "q_nation_region": (
            "SELECT r_name, COUNT(*) AS n_nations "
            "FROM nation JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name ORDER BY r_name"
        ),
        "q_events_rollup": (
            "SELECT event_type, COUNT(*) AS n_events, "
            "ROUND(AVG(value), 4) AS avg_value, "
            "COUNT(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "q_supplier_nation": (
            "SELECT n_name, COUNT(*) AS n_suppliers, "
            "ROUND(SUM(s_acctbal), 2) AS total_acctbal "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "GROUP BY n_name ORDER BY n_name"
        ),
        "q_events_json": (
            # floor division, NOT DuckDB's // (which truncates toward zero:
            # -12 // 10 = -1) — the engine buckets with numpy floor_divide
            # so negative k lands in contiguous width-10 buckets
            "SELECT event_type, "
            "CAST(floor(CAST(json_extract(props, '$.k') AS BIGINT) / 10.0) "
            "AS BIGINT) AS k_bucket, "
            "COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
            "FROM events GROUP BY event_type, k_bucket "
            "ORDER BY event_type, k_bucket"
        ),
        "q_semi_join_big_customers": (
            "SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal "
            "FROM customer WHERE c_custkey IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000) "
            "ORDER BY c_custkey"
        ),
        "q_anti_join_quiet_customers": (
            "SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal "
            "FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1997-01-01' "
            "AND o_orderdate < DATE '1998-01-01') "
            "ORDER BY c_custkey"
        ),
        "q_events_window": (
            "SELECT event_type, epoch_us(ts) // 3600000000 AS window_hour, "
            "COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
            "FROM events GROUP BY event_type, window_hour "
            "ORDER BY event_type, window_hour"
        ),
        "q_top_order_per_customer": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) "
            "WHERE rn = 1 ORDER BY o_custkey"
        ),
        "q_distinct_flags": (
            "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "q_orders_topk": (
            "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "q_orders_by_month": (
            "SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders, "
            "ROUND(SUM(o_totalprice), 2) AS revenue "
            "FROM orders GROUP BY month ORDER BY month"
        ),
        "q_asof_attribution": (
            # not DuckDB's ASOF JOIN: that picks an ARBITRARY row among
            # clicks with equal (user_id, ts), while the engine pins the
            # tie-break to the greatest (ts, event_id) — the window form
            # makes the oracle deterministic under ties too
            "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), "
            "c AS (SELECT * FROM events WHERE event_type = 'click'), "
            "ranked AS (SELECT p.event_id AS purchase_id, p.user_id, "
            "c.event_id AS click_id, "
            "CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us, "
            "ROW_NUMBER() OVER (PARTITION BY p.event_id "
            "ORDER BY c.ts DESC, c.event_id DESC) AS rn "
            "FROM p JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts) "
            "SELECT purchase_id, user_id, click_id, gap_us FROM ranked "
            "WHERE rn = 1 ORDER BY purchase_id"
        ),
        "q_sessionize": (
            # gap rule as a window: break iff the previous event of the
            # same user is > 4h older; session = running sum of breaks.
            # (ts, event_id) ordering pins ties on both sides.
            "WITH o AS (SELECT event_id, user_id, ts, CASE WHEN "
            "ts - LAG(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) > INTERVAL 4 HOUR THEN 1 ELSE 0 END "
            "AS brk FROM events) "
            "SELECT event_id, user_id, CAST(SUM(brk) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id "
            "FROM o ORDER BY event_id"
        ),
        "q_rolling_revenue": (
            # RANGE frame over calendar days (current + 6 preceding);
            # rounded to 2 decimals on both sides
            "WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
            "SUM(value) AS revenue, CAST(COUNT(*) AS BIGINT) AS n_purchases "
            "FROM events WHERE event_type = 'purchase' GROUP BY 1) "
            "SELECT strftime(day, '%Y-%m-%d') AS day, "
            "ROUND(revenue, 2) AS revenue, n_purchases, "
            "ROUND(SUM(revenue) OVER (ORDER BY day RANGE BETWEEN "
            "INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2) AS rolling_7d "
            "FROM d ORDER BY day"
        ),
        "q_funnel": (
            # greedy earliest-path funnel: each step's frontier is the
            # user's first qualifying event STRICTLY after the previous
            # step's frontier timestamp
            "WITH v AS (SELECT user_id, MIN(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "JOIN v ON e.user_id = v.user_id AND e.ts > v.t "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "p AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "JOIN c ON e.user_id = c.user_id AND e.ts > c.t "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
            "SELECT * FROM ("
            "SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, "
            "CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users "
            "UNION ALL SELECT CAST(2 AS BIGINT), 'click', "
            "CAST((SELECT COUNT(*) FROM c) AS BIGINT) "
            "UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', "
            "CAST((SELECT COUNT(*) FROM p) AS BIGINT)) ORDER BY step_idx"
        ),
        "s_label_centroids": (
            # per-dimension average recomputed by unnest; both sides sum
            # in float64 and round to 4 decimals
            "WITH e AS (SELECT label, unnest(embedding) AS x, "
            "generate_subscripts(embedding, 1) AS dim FROM embeddings) "
            "SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) "
            "AS dim, CAST(COUNT(*) AS BIGINT) AS n, "
            "ROUND(SUM(CAST(x AS DOUBLE)) / COUNT(*), 4) AS centroid "
            "FROM e GROUP BY label, dim ORDER BY label, dim"
        ),
        "q_retention_cohorts": (
            # cohort = Monday-truncated week of the user's first event;
            # one row per (cohort, active week) with distinct users
            "WITH fu AS (SELECT user_id, strftime(date_trunc('week', "
            "MIN(ts)), '%Y-%m-%d') AS cohort_week FROM events "
            "GROUP BY user_id), "
            "act AS (SELECT DISTINCT user_id, strftime(date_trunc('week', "
            "ts), '%Y-%m-%d') AS activity_week FROM events) "
            "SELECT f.cohort_week, a.activity_week, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM act a JOIN fu f USING (user_id) "
            "GROUP BY f.cohort_week, a.activity_week "
            "ORDER BY f.cohort_week, a.activity_week"
        ),
        "t_bpe_tokens": (
            "SELECT doc_id, CAST(len(list_filter(regexp_extract_all(text, "
            "' ?[A-Za-zÀ-ÖØ-öø-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÖØ-öø-ÿ0-9\\s]+|\\s+'"
            "), x -> trim(x, ' ' || chr(9) || chr(10) || chr(11) || "
            "chr(12) || chr(13)) <> '')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        "t_token_stats": (
            "SELECT doc_id, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens, "
            "length(text) AS n_chars "
            "FROM documents ORDER BY doc_id"
        ),
        "t_stratified_sample": (
            # fixed-width lowercase hex compares like the number it encodes,
            # so both sides reproduce the md5-prefix keep decision exactly
            "SELECT doc_id, lang, source FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < "
            "CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000' "
            "WHEN 'fr' THEN '1999' WHEN 'es' THEN 'c000' ELSE '0000' END "
            "ORDER BY doc_id"
        ),
        "t_decontaminate": (
            # gram-join recomputation on STRINGS (the engine matches md5-64
            # hashes, so a hash collision would fail this compare, not hide)
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w "
            "FROM documents), "
            "g AS (SELECT doc_id, "
            "unnest(list_transform(generate_series(1, len(w) - 7), "
            "i -> array_to_string(w[i:i+7], ' '))) AS gram "
            "FROM toks WHERE len(w) >= 8), "
            "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0), "
            "hits AS (SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_hits "
            "FROM g JOIN bench USING (gram) GROUP BY g.doc_id) "
            "SELECT d.doc_id, d.doc_id % 97 = 0 AS is_benchmark, "
            "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated_grams, "
            "COALESCE(h.n_hits, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY doc_id"
        ),
        "t_dup_spans": (
            # corpus-wide dup-gram recomputation on gram STRINGS (the
            # engine joins 62-bit hashes — a collision fails this compare
            # instead of hiding); docs under 8 tokens have no grams
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w "
            "FROM documents), "
            "g AS (SELECT DISTINCT doc_id, "
            "unnest(list_transform(generate_series(1, len(w) - 7), "
            "i -> array_to_string(w[i:i+7], ' '))) AS gram "
            "FROM toks WHERE len(w) >= 8), "
            "dupg AS (SELECT gram FROM g GROUP BY gram "
            "HAVING COUNT(*) >= 2), "
            "c AS (SELECT g.doc_id, COUNT(*) AS n FROM g "
            "JOIN dupg USING (gram) GROUP BY g.doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS BIGINT) "
            "AS n_dup_grams, COALESCE(c.n, 0) > 0 AS has_dup_span "
            "FROM documents d LEFT JOIN c USING (doc_id) ORDER BY doc_id"
        ),
        "t_domain_cap": (
            # bounded per-key top-N == a window rank cut; (n_chars DESC,
            # doc_id ASC) is a total order so the cap boundary is pinned
            "WITH r AS (SELECT doc_id, source, n_chars, "
            "ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id) AS rank FROM documents) "
            "SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 20 ORDER BY doc_id"
        ),
        "t_temperature_sample": (
            # same two-pass arithmetic: keep-rate sqrt(n_min/n) per lang
            # (sqrt is IEEE-correctly-rounded, so both sides floor the
            # bit-identical double), threshold as fixed-width hex, 'zzzz'
            # keep-all sentinel for the smallest language(s)
            "WITH c AS (SELECT lang, COUNT(*) AS n FROM documents "
            "GROUP BY lang), m AS (SELECT MIN(n) AS nmin FROM c), "
            "thr AS (SELECT lang, CASE WHEN n <= (SELECT nmin FROM m) "
            "THEN 'zzzz' ELSE printf('%04x', CAST(FLOOR(65536 * "
            "sqrt(CAST((SELECT nmin FROM m) AS DOUBLE) / n)) AS BIGINT)) "
            "END AS t FROM c) "
            "SELECT d.doc_id, d.lang, d.source FROM documents d "
            "JOIN thr ON d.lang = thr.lang "
            "WHERE substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 4) "
            "< thr.t ORDER BY d.doc_id"
        ),
        "t_bigram_logprob": (
            f"WITH {_BIGRAM_SCORED_CTE} "
            "SELECT doc_id, n_bigrams, logprob_x1e3 FROM scored "
            "ORDER BY doc_id"
        ),
        "t_ccnet_buckets": (
            # CCNet head/middle/tail replayed verbatim: score = the SAME
            # int64 division, the md5-grid sample rule integer-exact, the
            # tercile interpolation the SAME IEEE (m-1)p expression the
            # engine computes (COALESCE covers the lo = m-1, frac = 0
            # boundary, where the engine returns s[lo])
            f"WITH {_BIGRAM_SCORED_CTE}, "
            "sc AS (SELECT doc_id, n_bigrams, logprob_x1e3, "
            "CASE WHEN n_bigrams = 0 THEN 0.0 "
            "ELSE CAST(logprob_x1e3 AS DOUBLE) / n_bigrams END AS score "
            "FROM scored), "
            "samp AS (SELECT score FROM sc WHERE "
            "md5_number_lower('cc42:' || CAST(doc_id AS VARCHAR)) % 4 = 0), "
            "pool AS (SELECT score FROM samp UNION ALL SELECT score FROM sc "
            "WHERE (SELECT COUNT(*) FROM samp) = 0), "
            "ord AS (SELECT score, ROW_NUMBER() OVER (ORDER BY score) - 1 "
            "AS i FROM pool), "
            "mm AS (SELECT COUNT(*) AS m FROM ord), "
            "th AS (SELECT "
            "(SELECT score FROM ord WHERE i = CAST(FLOOR((m - 1) * (1.0/3.0)) AS BIGINT)) AS lo1, "
            "(SELECT score FROM ord WHERE i = CAST(FLOOR((m - 1) * (1.0/3.0)) AS BIGINT) + 1) AS hi1, "
            "(m - 1) * (1.0/3.0) - FLOOR((m - 1) * (1.0/3.0)) AS f1, "
            "(SELECT score FROM ord WHERE i = CAST(FLOOR((m - 1) * (2.0/3.0)) AS BIGINT)) AS lo2, "
            "(SELECT score FROM ord WHERE i = CAST(FLOOR((m - 1) * (2.0/3.0)) AS BIGINT) + 1) AS hi2, "
            "(m - 1) * (2.0/3.0) - FLOOR((m - 1) * (2.0/3.0)) AS f2 "
            "FROM mm), "
            "thr AS (SELECT lo1 + f1 * (COALESCE(hi1, lo1) - lo1) AS thr_mid, "
            "lo2 + f2 * (COALESCE(hi2, lo2) - lo2) AS thr_head FROM th) "
            "SELECT sc.doc_id, sc.n_bigrams, sc.logprob_x1e3, sc.score, "
            "CASE WHEN sc.score >= thr.thr_head THEN 'head' "
            "WHEN sc.score >= thr.thr_mid THEN 'middle' ELSE 'tail' END "
            "AS bucket FROM sc CROSS JOIN thr ORDER BY sc.doc_id"
        ),
        "t_shuffle_shards": (
            # shard = md5('shuf42:'||id)[:8] mod 8; mod 8 of a hex number
            # only needs its LAST hex digit, so the oracle derives it via
            # strpos without hex->int casts; pos = rank by (key, doc_id)
            "WITH k AS (SELECT doc_id, "
            "substr(md5('shuf42:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hk "
            "FROM documents), "
            "s AS (SELECT doc_id, hk, CAST((strpos('0123456789abcdef', "
            "substr(hk, 8, 1)) - 1) % 8 AS BIGINT) AS shard FROM k) "
            "SELECT doc_id, shard, CAST(ROW_NUMBER() OVER (PARTITION BY "
            "shard ORDER BY hk, doc_id) - 1 AS BIGINT) AS pos "
            "FROM s ORDER BY doc_id"
        ),
        "t_delta_dedup": (
            # word-SET fingerprint (sorted distinct words, md5): new docs
            # (doc_id % 5 = 0) semi-joined against the existing side's
            # distinct fingerprints; list_sort matches Python sorted() on
            # these ASCII tokens
            "WITH f AS (SELECT doc_id, md5(COALESCE(array_to_string(list_sort("
            "list_distinct(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> ''))), ' '), '')) AS fingerprint FROM documents), "
            "ex AS (SELECT DISTINCT fingerprint FROM f "
            "WHERE doc_id % 5 != 0) "
            "SELECT f.doc_id, f.fingerprint, f.fingerprint IN "
            "(SELECT fingerprint FROM ex) AS is_dup "
            "FROM f WHERE doc_id % 5 = 0 ORDER BY doc_id"
        ),
        "t_chunk_windows": (
            # window placement from token counts alone: chunks start at
            # every stride boundary strictly below n_tokens, final chunk
            # truncated; empty docs emit nothing
            "WITH t AS (SELECT doc_id, len(list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '')) AS n "
            "FROM documents), "
            "c AS (SELECT doc_id, n, unnest(generate_series(0, "
            "CAST((n - 1) // 32 AS BIGINT))) AS chunk_id "
            "FROM t WHERE n > 0) "
            "SELECT doc_id, chunk_id, chunk_id * 32 AS start_tok, "
            "LEAST(64, n - chunk_id * 32) AS n_toks "
            "FROM c ORDER BY doc_id, chunk_id"
        ),
        "s_scalar_quantize": (
            # per-dim global min/max are float-order-independent (exact);
            # the code arithmetic mirrors the engine's association, so the
            # doubles are bit-identical on both sides
            "WITH e AS (SELECT vec_id, unnest(embedding) AS x, "
            "generate_subscripts(embedding, 1) AS dim FROM embeddings), "
            "mm AS (SELECT dim, MIN(CAST(x AS DOUBLE)) AS mn, "
            "MAX(CAST(x AS DOUBLE)) AS mx FROM e GROUP BY dim) "
            "SELECT e.vec_id, CAST(e.dim AS BIGINT) AS dim, "
            "CAST(FLOOR((CAST(e.x AS DOUBLE) - mm.mn) * 255.0 / "
            "(CASE WHEN mm.mx = mm.mn THEN 1.0 ELSE mm.mx - mm.mn END) "
            "+ 0.5) AS BIGINT) AS code "
            "FROM e JOIN mm USING (dim) ORDER BY e.vec_id, e.dim"
        ),
        "t_pack_sequences": (
            # concatenate-then-chop packing == windowed running token offset
            "WITH t AS (SELECT doc_id, doc_id // 256 AS bucket, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) "
            "AS n_tokens FROM documents), "
            "w AS (SELECT doc_id, bucket, n_tokens, "
            "CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket "
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
            "PRECEDING), 0) AS BIGINT) AS off FROM t) "
            "SELECT doc_id, bucket, n_tokens, off // 2048 AS pack_id, "
            "off % 2048 AS pack_off FROM w ORDER BY doc_id"
        ),
        "t_length_quantiles": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "quantile_disc(n_chars, 0.25) AS p25, "
            "quantile_disc(n_chars, 0.5) AS p50, "
            "quantile_disc(n_chars, 0.75) AS p75, "
            "quantile_disc(n_chars, 0.9) AS p90 "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        "t_fingerprint": (
            "SELECT doc_id, md5(lower(regexp_replace(regexp_replace(text, "
            "'^\\s+|\\s+$', '', 'g'), '\\s+', ' ', 'g'))) AS fingerprint "
            "FROM documents ORDER BY doc_id"
        ),
        "t_exact_dedup": (
            "SELECT md5(text) AS text_hash, MIN(doc_id) AS rep_doc, "
            "COUNT(*) AS n_copies FROM documents GROUP BY md5(text) "
            "ORDER BY text_hash"
        ),
        "t_quality": _quality_oracle(),
        "t_doc_frequency": (
            # df = docs containing the word, tf = total occurrences; the
            # (df DESC, word ASC) total order pins the top-k cut on both
            # sides even under df ties at the boundary
            "WITH w AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS word FROM documents) "
            "SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df, "
            "CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY word "
            "ORDER BY df DESC, word LIMIT 100"
        ),
        "t_inverted_lookup": (
            # postings for the probe words, recomputed by explode+group; the
            # engine answers through the bucket-partitioned store reading
            # only the probed buckets (pruning is pinned by unit test)
            "WITH w AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS word FROM documents) "
            "SELECT word, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM w "
            "WHERE word IN ('hash', 'query', 'row', 'table', 'zzz_absent') "
            "GROUP BY word, doc_id ORDER BY word, doc_id"
        ),
        "t_heavy_hitters": (
            # the engine finds these via a bounded sketch + exact recount;
            # the recount removes all sketch error, so the oracle is the
            # plain exact top-k ((tf DESC, word ASC) pins the cut)
            "WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS word FROM documents) "
            "SELECT word, CAST(COUNT(*) AS BIGINT) AS tf FROM w "
            "GROUP BY word ORDER BY tf DESC, word LIMIT 25"
        ),
        "t_tfidf": (
            # two-pass TF-IDF mass recomputed verbatim: df over distinct
            # (doc, word), score = sum(tf * ln(N/df)) per doc.  Both sides
            # emit half-up-rounded milli-units; ln() is transcendental so no
            # true score sits on a boundary, making the integer exact.
            # Empty docs COALESCE to zero like t_repetition.
            "WITH w AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS word FROM documents), "
            "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents), "
            "df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w "
            "GROUP BY word), "
            "tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w "
            "GROUP BY doc_id, word), "
            "s AS (SELECT t.doc_id, CAST(SUM(t.tf) AS BIGINT) AS n_words, "
            "CAST(FLOOR(SUM(t.tf * ln((SELECT n_docs FROM n) / d.df)) "
            "* 1000 + 0.5) AS BIGINT) AS tfidf_x1e3 "
            "FROM tf t JOIN df d USING(word) GROUP BY t.doc_id) "
            "SELECT d.doc_id, COALESCE(s.n_words, 0) AS n_words, "
            "COALESCE(s.tfidf_x1e3, 0) AS tfidf_x1e3 "
            "FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id "
            "ORDER BY d.doc_id"
        ),
        "q_assoc_rules": (
            # rules recomputed from first principles: baskets = distinct
            # (order, part); pair supports via the a<b self-join; singles
            # from the same basket table.  All-integer derived columns —
            # // truncation == floor on positives; the lift product rides
            # HUGEINT so no scale overflows the SQL side either.
            "WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), "
            "nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM b), "
            "s AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY p), "
            "pr AS (SELECT b1.p AS a, b2.p AS b2p, CAST(COUNT(*) AS BIGINT) "
            "AS c FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p "
            "GROUP BY b1.p, b2.p), "
            "f AS (SELECT * FROM pr WHERE c >= 2), "
            "rules AS (SELECT a AS antecedent, b2p AS consequent, c AS n_ab "
            "FROM f UNION ALL SELECT b2p, a, c FROM f) "
            "SELECT r.antecedent, r.consequent, r.n_ab, sa.c AS n_a, "
            "sb.c AS n_b, (SELECT n FROM nb) AS n_baskets, "
            "(100 * r.n_ab) // sa.c AS conf_pct, "
            "CAST((10000::HUGEINT * r.n_ab * (SELECT n FROM nb)) // "
            "(CAST(sa.c AS HUGEINT) * sb.c) AS BIGINT) AS lift_x1e4 "
            "FROM rules r JOIN s sa ON r.antecedent = sa.p "
            "JOIN s sb ON r.consequent = sb.p "
            "ORDER BY antecedent, consequent"
        ),
        "t_code_detect": (
            # codepoint-identical counts: length/translate are char-wise,
            # starts_with on the newline split; integer cross-mult rules
            "WITH d AS (SELECT doc_id, "
            "CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines, "
            "CAST(len(list_filter(string_split(text, chr(10)), "
            "l -> starts_with(l, '    ') OR starts_with(l, chr(9)))) "
            "AS BIGINT) AS indent_lines, "
            "CAST(length(text) - length(translate(text, '{});=<>[]', '')) "
            "AS BIGINT) AS n_symbols, "
            "CAST(length(text) AS BIGINT) AS n_chars FROM documents) "
            "SELECT doc_id, n_lines, indent_lines, n_symbols, "
            "CASE WHEN 10 * indent_lines >= 3 * n_lines OR "
            "(n_chars > 0 AND 20 * n_symbols >= n_chars) THEN 'code' "
            "ELSE 'prose' END AS verdict FROM d ORDER BY doc_id"
        ),
        "t_blocklist_filter": (
            # whole-word case-insensitive blocklist hits over the shared
            # tokenization; any hit drops
            "WITH w AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS word "
            "FROM documents), "
            "h AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocked "
            "FROM w WHERE lower(word) IN ('casino', 'viagra', 'xxx', "
            "'lottery', 'warez') GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(h.n_blocked, 0) AS n_blocked, "
            "CASE WHEN COALESCE(h.n_blocked, 0) > 0 THEN 'drop' "
            "ELSE 'keep' END AS verdict "
            "FROM documents d LEFT JOIN h USING(doc_id) ORDER BY d.doc_id"
        ),
        "t_mlm_masking": (
            # the salted per-token md5 mask rule replayed verbatim
            # (0-based positions over the FILTERED token list), masked
            # text rebuilt with an ordered string_agg and fingerprinted;
            # empty docs fingerprint md5('')
            "WITH docs AS (SELECT doc_id, list_filter("
            "string_split(text, ' '), x -> x <> '') AS tk FROM documents), "
            "w AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos, "
            "unnest(tk) AS word FROM docs), "
            "m AS (SELECT doc_id, pos, word, "
            "substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':' || "
            "CAST(pos AS VARCHAR) || ':' || word), 1, 2) < '26' AS msk "
            "FROM w), "
            "v AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "CAST(SUM(CASE WHEN msk THEN 1 ELSE 0 END) AS BIGINT) AS "
            "n_masked, md5(string_agg(CASE WHEN msk THEN '<mask>' "
            "ELSE word END, ' ' ORDER BY pos)) AS masked_md5 "
            "FROM m GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(v.n_tokens, 0) AS n_tokens, "
            "COALESCE(v.n_masked, 0) AS n_masked, "
            "COALESCE(v.masked_md5, md5('')) AS masked_md5 "
            "FROM documents d LEFT JOIN v USING(doc_id) ORDER BY d.doc_id"
        ),
        "t_feature_hashing": (
            # bucket = md5('fh:'||word)[:8] mod 16 = last hex digit of
            # the prefix (the t_shuffle_shards strpos trick); vector
            # fingerprint = md5 over the ordered 'bucket:count' canonical
            # string; empty docs fingerprint md5('')
            "WITH w AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS word "
            "FROM documents), "
            "b AS (SELECT doc_id, CAST((strpos('0123456789abcdef', "
            "substr(md5('fh:' || word), 8, 1)) - 1) % 16 AS BIGINT) "
            "AS bucket FROM w), "
            "c AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM b GROUP BY doc_id, bucket), "
            "v AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, "
            "CAST(COUNT(*) AS BIGINT) AS nnz, "
            "md5(string_agg(CAST(bucket AS VARCHAR) || ':' || "
            "CAST(c AS VARCHAR), ',' ORDER BY bucket)) AS vec_md5 "
            "FROM c GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(v.n_tokens, 0) AS n_tokens, "
            "COALESCE(v.nnz, 0) AS nnz, "
            "COALESCE(v.vec_md5, md5('')) AS vec_md5 "
            "FROM documents d LEFT JOIN v USING(doc_id) ORDER BY d.doc_id"
        ),
        "t_bm25_search": (
            # single-term Okapi BM25 replayed token-for-token: idf =
            # ln((N - df + 0.5)/(df + 0.5)), tf factor with k1=1.2 b=0.75
            # written as the literal constants 2.2 / 1.2 / 0.25 / 0.75 the
            # engine uses; avgdl is the ONE double division
            # n_tokens/n_docs.  Each score is a single IEEE chain (no
            # sum), so the milli-grid FLOOR(x*1000+0.5) matches exactly
            # (the t_tfidf transcendence argument); the top-10 cut orders
            # by the ROUNDED integer then doc_id on both sides.
            "WITH w AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS word FROM documents), "
            "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents), "
            "tk AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_tokens FROM w), "
            "dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM w "
            "GROUP BY doc_id), "
            "df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df "
            "FROM w WHERE word IN ('hash', 'query', 'row', 'table', "
            "'zzz_absent') GROUP BY word), "
            "tf AS (SELECT word, doc_id, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM w WHERE word IN ('hash', 'query', 'row', 'table', "
            "'zzz_absent') GROUP BY word, doc_id), "
            "scored AS (SELECT t.word, t.doc_id, t.tf, d.dl, "
            "CAST(FLOOR(ln(((SELECT n_docs FROM n) - f.df + 0.5) / "
            "(f.df + 0.5)) * ((CAST(t.tf AS DOUBLE) * 2.2) / "
            "(CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * "
            "(CAST(d.dl AS DOUBLE) / ((SELECT n_tokens FROM tk) / "
            "(SELECT n_docs FROM n)))))) * 1000 + 0.5) AS BIGINT) "
            "AS bm25_x1e3 FROM tf t JOIN df f USING(word) "
            "JOIN dl d USING(doc_id)) "
            "SELECT word, doc_id, tf, dl, bm25_x1e3 FROM scored "
            "QUALIFY row_number() OVER (PARTITION BY word "
            "ORDER BY bm25_x1e3 DESC, doc_id) <= 10 "
            "ORDER BY word, doc_id"
        ),
        "t_repetition": (
            # Gopher-style repetition numerators recomputed verbatim:
            # split -> per-doc word counts, and 1-indexed adjacent bigrams
            # via list_transform(range) (range is end-exclusive, so i runs
            # 1..len-1); docs too short for bigrams COALESCE to zero.
            "WITH docs AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), w -> w <> '') AS words "
            "FROM documents), "
            "w AS (SELECT doc_id, unnest(words) AS word FROM docs), "
            "wc AS (SELECT doc_id, word, COUNT(*) AS c FROM w "
            "GROUP BY doc_id, word), "
            "ws AS (SELECT doc_id, SUM(c) AS n_words, "
            "COUNT(*) AS n_unique_words, MAX(c) AS top_word_count "
            "FROM wc GROUP BY doc_id), "
            "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(words)), "
            "i -> words[i] || ' ' || words[i + 1])) AS bigram FROM docs), "
            "bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg "
            "GROUP BY doc_id, bigram), "
            "bs AS (SELECT doc_id, SUM(c) AS n_bigrams, "
            "SUM(c) - COUNT(*) AS dup_bigram_occurrences, "
            "MAX(c) AS top_bigram_count FROM bc GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(ws.n_words, 0) AS BIGINT) AS n_words, "
            "CAST(COALESCE(ws.n_unique_words, 0) AS BIGINT) AS n_unique_words, "
            "CAST(COALESCE(ws.top_word_count, 0) AS BIGINT) AS top_word_count, "
            "CAST(COALESCE(bs.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
            "CAST(COALESCE(bs.dup_bigram_occurrences, 0) AS BIGINT) "
            "AS dup_bigram_occurrences, "
            "CAST(COALESCE(bs.top_bigram_count, 0) AS BIGINT) "
            "AS top_bigram_count "
            "FROM docs d LEFT JOIN ws ON d.doc_id = ws.doc_id "
            "LEFT JOIN bs ON d.doc_id = bs.doc_id ORDER BY d.doc_id"
        ),
        "t_simhash": _simhash_oracle(),
        "s_lsh_buckets": _lsh_buckets_oracle(),
        "s_pq": _pq_oracle(),
        "s_kmeans_init_assign": _kmeans_init_assign_oracle(),
        "t_bpe_apply": _bpe_apply_oracle(),
        "t_bpe_train": _bpe_train_oracle(),
        "s_ann_lsh": _ann_lsh_recall_oracle(partitioned=False),
        "s_ann_partitioned": _ann_lsh_recall_oracle(partitioned=True),
        "s_ann_ivf": _ann_ivf_recall_oracle(),
        "s_ann_lsh_candidates": _lsh_candidates_oracle(),
        # same index, same probes — the store-backed path must produce the
        # byte-identical candidate sets
        "s_ann_partitioned_candidates": _lsh_candidates_oracle(),
        "s_ann_ivf_candidates": _ivf_candidates_oracle(),
        "t_langid": _langid_oracle(),
        "t_winnow_fp": (
            # verbatim winnowing recomputation: k=5 token grams, md5-64 gram
            # hashes (identical to the engine's _hash64), w=4 window minima,
            # distinct count.  range() is end-exclusive; list_slice inclusive.
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t "
            "FROM documents), "
            "grams AS (SELECT doc_id, "
            "CASE WHEN len(t) = 0 THEN []::VARCHAR[] "
            "WHEN len(t) < 5 THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t) - 3), "
            "i -> array_to_string(list_slice(t, i, i + 4), ' ')) END AS g "
            "FROM toks), "
            "hashes AS (SELECT doc_id, "
            "list_transform(g, x -> ('0x' || substr(md5(x), 1, 16))::UBIGINT) AS h "
            "FROM grams) "
            "SELECT doc_id, CAST(CASE WHEN len(h) = 0 THEN 0 "
            "WHEN len(h) <= 4 THEN 1 "
            "ELSE len(list_distinct(list_transform(range(1, len(h) - 2), "
            "i -> list_min(list_slice(h, i, i + 3))))) END AS BIGINT) AS n_fps "
            "FROM hashes ORDER BY doc_id"
        ),
        "t_minhash_pairs": (
            # ALL-PAIRS ground truth: exact 3-token-shingle Jaccard over
            # every doc pair (feasible at sf0.01), threshold 0.8.  Docs
            # without tokens are excluded on both sides (they cannot be
            # near-dups; the engine's MinHasher emits nothing for them).
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t "
            "FROM documents), "
            "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t) - 1), "
            "i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s "
            "FROM toks WHERE len(t) > 0), "
            "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "len(list_intersect(a.s, b.s)) AS inter, len(a.s) + len(b.s) AS tot "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) "
            "SELECT doc_a, doc_b, "
            "ROUND(inter::DOUBLE / (tot - inter), 4) AS jaccard "
            "FROM pairs WHERE tot > inter "
            "AND inter::DOUBLE / (tot - inter) >= 0.8 "
            "ORDER BY doc_a, doc_b"
        ),
        "t_dup_components": (
            # connected components over the SAME all-pairs >=0.8 Jaccard
            # truth graph as t_minhash_pairs, via a recursive reachability
            # walk: lab propagates along (undirected) edges, so
            # MIN(lab) per node = the component's minimum doc_id — exactly
            # the engine's min-label-propagation fixpoint
            "WITH RECURSIVE toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t "
            "FROM documents), "
            "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t) - 1), "
            "i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s "
            "FROM toks WHERE len(t) > 0), "
            "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "len(list_intersect(a.s, b.s)) AS inter, len(a.s) + len(b.s) AS tot "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id), "
            "e0 AS (SELECT doc_a, doc_b FROM p WHERE tot > inter "
            "AND inter::DOUBLE / (tot - inter) >= 0.8), "
            "e AS (SELECT doc_a AS u, doc_b AS v FROM e0 "
            "UNION ALL SELECT doc_b, doc_a FROM e0), "
            "walk(node, lab) AS (SELECT u, u FROM e UNION "
            "SELECT e.v, w.lab FROM walk w JOIN e ON e.u = w.node) "
            "SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS component "
            "FROM walk GROUP BY node ORDER BY doc_id"
        ),
        "t_gopher_rules": _gopher_oracle(),
        "t_c4_filter": _c4_oracle(),
        "t_pii_scrub": (
            # identical RE2 pattern strings on both sides; the scrubbed-text
            # md5 certifies the replacement byte-for-byte without shipping
            # text through the compare
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
            "AS n_emails, "
            "CAST(len(regexp_extract_all(text, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) "
            "AS n_ips, "
            "CAST(len(regexp_extract_all(text, "
            "'\\+?\\d[\\d -]{7,}\\d')) AS BIGINT) AS n_phones, "
            "md5(regexp_replace(regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'), "
            "'\\+?\\d[\\d -]{7,}\\d', '<PHONE>', 'g')) AS scrubbed_fp "
            "FROM documents ORDER BY doc_id"
        ),
        "t_ngram_jaccard_dupes": (
            # ALL-PAIRS ground truth for char-4-gram Jaccard at 0.5 — this
            # oracle EXPOSED two short-doc pairs the old pure-simhash
            # generator missed; the two-regime generator matches it exactly.
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t "
            "FROM documents), "
            "norm AS (SELECT doc_id, array_to_string(t, ' ') AS s "
            "FROM toks WHERE len(t) > 0), "
            "gr AS (SELECT doc_id, list_distinct(CASE WHEN length(s) < 4 THEN [s] "
            "ELSE list_transform(range(1, length(s) - 2), "
            "i -> substr(s, i, 4)) END) AS g FROM norm), "
            "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "len(list_intersect(a.g, b.g)) AS inter, len(a.g) + len(b.g) AS tot "
            "FROM gr a JOIN gr b ON a.doc_id < b.doc_id) "
            "SELECT doc_a, doc_b, "
            "ROUND(inter::DOUBLE / (tot - inter), 4) AS jaccard "
            "FROM pairs WHERE tot > inter "
            "AND inter::DOUBLE / (tot - inter) >= 0.5 "
            "ORDER BY doc_a, doc_b"
        ),
        "s_knn_bruteforce": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 5), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qe AS DOUBLE[])), 4) AS sim "
            "FROM embeddings e CROSS JOIN q), "
            "ranked AS (SELECT query_id, vec_id, sim, "
            "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank "
            "FROM scored) "
            "SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= 10 "
            "ORDER BY query_id, rank"
        ),
        "s_embedding_dupes": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 4) AS sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.42 "
            "ORDER BY vec_a, vec_b"
        ),
        "m_media_features": (
            f"SELECT url, media_type, OCTET_LENGTH(payload) AS n_bytes, "
            f"width, height "
            f"FROM read_parquet('{media}') ORDER BY url"
        ),
        "m_frame_sample": _frame_sample_oracle(),
        "m_resize": (
            f"SELECT url, width, height, "
            f"CASE WHEN width = 0 THEN 0 ELSE GREATEST(1, CAST(FLOOR(width * "
            f"LEAST(1.0, 64.0 / GREATEST(width, height))) AS INT)) END AS out_w, "
            f"CASE WHEN height = 0 THEN 0 ELSE GREATEST(1, CAST(FLOOR(height * "
            f"LEAST(1.0, 64.0 / GREATEST(width, height))) AS INT)) END AS out_h "
            f"FROM read_parquet('{media}') ORDER BY url"
        ),
        "m_image_hash": _image_hash_oracle(),
        "m_sharpness": _sharpness_oracle(),
        "q_rfm_segments": _rfm_oracle(),
        "m_phash": _phash_oracle(),
        "m_audio_features": (
            # golden columns were computed from the PRE-encode samples at
            # fixture-gen time; the engine recomputes them from the WAV
            # container bytes -> exact codec round-trip check
            f"SELECT url, OCTET_LENGTH(payload) AS n_bytes, sample_rate, "
            f"n_channels, n_samples, duration_ms, rms_x1e3, peak "
            f"FROM read_parquet('{av}') WHERE media_type = 'audio' "
            f"ORDER BY url"
        ),
        "m_video_frames": (
            f"SELECT url, OCTET_LENGTH(payload) AS n_bytes, width, height, "
            f"n_frames, n_sampled, luma_sum "
            f"FROM read_parquet('{av}') WHERE media_type = 'video' "
            f"ORDER BY url"
        ),
        "pipeline_clean_corpus": (
            f"WITH ok AS (SELECT url, text FROM read_parquet('{fixture}') "
            "WHERE text <> '' AND "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) >= 5) "
            "SELECT MIN(url) AS url, MIN_BY(text, url) AS text FROM ok "
            "GROUP BY md5(text) ORDER BY url"
        ),
        "pipeline_clean_corpus_neardup": (
            # full chain incl. the near-dup pass: survivors as in
            # pipeline_clean_corpus, ALL-PAIRS 3-token-shingle Jaccard >= 0.8
            # between survivor texts (t_minhash_pairs machinery — a banding
            # recall miss in the engine FAILS this compare), then the
            # engine's greedy keep-first resolution replayed exactly by a
            # linear recursive CTE over the (doc_a, doc_b)-ordered pairs:
            # drop doc_b iff neither side is already dropped.
            # the heavy CTEs are MATERIALIZED: a recursive CTE re-evaluates
            # every non-materialized CTE it references ON EACH ITERATION,
            # which turns the all-pairs shingle join quadratic-in-pairs
            f"WITH RECURSIVE ok AS MATERIALIZED (SELECT url, text FROM read_parquet('{fixture}') "
            "WHERE text <> '' AND "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) >= 5), "
            "ded AS MATERIALIZED (SELECT MIN(url) AS url, MIN_BY(text, url) AS text FROM ok "
            "GROUP BY md5(text)), "
            "toks AS MATERIALIZED (SELECT url, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t "
            "FROM ded), "
            "sh AS MATERIALIZED (SELECT url, list_distinct(CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t) - 1), "
            "i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s "
            "FROM toks WHERE len(t) > 0), "
            "p AS MATERIALIZED (SELECT a.url AS doc_a, b.url AS doc_b, "
            "len(list_intersect(a.s, b.s)) AS inter, len(a.s) + len(b.s) AS tot "
            "FROM sh a JOIN sh b ON a.url < b.url), "
            "pn AS MATERIALIZED (SELECT doc_a, doc_b, "
            "ROW_NUMBER() OVER (ORDER BY doc_a, doc_b) AS i FROM p "
            "WHERE tot > inter AND inter::DOUBLE / (tot - inter) >= 0.8), "
            "greedy(i, dropped) AS ("
            "SELECT CAST(0 AS BIGINT), CAST([] AS VARCHAR[]) "
            "UNION ALL "
            "SELECT pn.i, CASE WHEN list_contains(g.dropped, pn.doc_a) "
            "OR list_contains(g.dropped, pn.doc_b) THEN g.dropped "
            "ELSE list_append(g.dropped, pn.doc_b) END "
            "FROM greedy g JOIN pn ON pn.i = g.i + 1), "
            "fin AS (SELECT dropped FROM greedy ORDER BY i DESC LIMIT 1) "
            "SELECT url FROM ded "
            "WHERE NOT list_contains((SELECT dropped FROM fin), url) "
            "ORDER BY url"
        ),
        "pipeline_line_dedup": (
            # golden-text recomputation on line STRINGS (engine joins md5-62
            # hashes; a collision fails this compare); trim set pinned to
            # space/tab/CR on both sides
            f"WITH l AS (SELECT url, unnest(string_split(text, chr(10))) "
            f"AS raw FROM read_parquet('{fixture}')), "
            "nl AS (SELECT url, trim(raw, ' ' || chr(9) || chr(13)) AS line "
            "FROM l WHERE trim(raw, ' ' || chr(9) || chr(13)) <> ''), "
            "d AS (SELECT url, line, COUNT(*) AS mult FROM nl "
            "GROUP BY url, line), "
            "w AS (SELECT line, MIN(url) AS owner FROM d GROUP BY line) "
            "SELECT d.url, CAST(SUM(d.mult) AS BIGINT) AS n_lines, "
            "CAST(COUNT(*) AS BIGINT) AS n_distinct, "
            "CAST(SUM(CASE WHEN d.url = w.owner THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_kept "
            "FROM d JOIN w USING (line) GROUP BY d.url ORDER BY d.url"
        ),
        "pipeline_training_mix": (
            # the whole composition re-derived as chained CTEs, stage for
            # stage: temperature thresholds -> md5 keep filter -> window
            # rank cap -> benchmark-gram decontamination (gram STRINGS
            # here; hash collisions in the engine would fail this compare)
            # -> word-set fingerprint dedup -> seeded shard/pos assignment
            "WITH c AS (SELECT lang, COUNT(*) AS n FROM documents "
            "GROUP BY lang), mm AS (SELECT MIN(n) AS nmin FROM c), "
            "thr AS (SELECT lang, CASE WHEN n <= (SELECT nmin FROM mm) "
            "THEN 'zzzz' ELSE printf('%04x', CAST(FLOOR(65536 * "
            "sqrt(CAST((SELECT nmin FROM mm) AS DOUBLE) / n)) AS BIGINT)) "
            "END AS t FROM c), "
            "k1 AS (SELECT d.* FROM documents d JOIN thr "
            "ON d.lang = thr.lang WHERE substr(md5('temp:' || "
            "CAST(d.doc_id AS VARCHAR)), 1, 4) < thr.t), "
            "k2 AS (SELECT * FROM (SELECT k1.*, ROW_NUMBER() OVER ("
            "PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM k1) WHERE rn <= 20), "
            "tk AS (SELECT doc_id, list_filter(string_split_regex(text, "
            "'\\s+'), x -> x <> '') AS w FROM documents), "
            "g_bench AS (SELECT DISTINCT unnest(list_transform("
            "generate_series(1, len(w) - 7), "
            "i -> array_to_string(w[i:i+7], ' '))) AS gram FROM tk "
            "WHERE len(w) >= 8 AND doc_id % 97 = 0), "
            "g_k2 AS (SELECT t2.doc_id, unnest(list_transform("
            "generate_series(1, len(w) - 7), "
            "i -> array_to_string(w[i:i+7], ' '))) AS gram FROM "
            "(SELECT tk.* FROM tk JOIN k2 USING (doc_id)) t2 "
            "WHERE len(w) >= 8), "
            "contaminated AS (SELECT DISTINCT g_k2.doc_id FROM g_k2 "
            "JOIN g_bench USING (gram)), "
            "k3 AS (SELECT * FROM k2 WHERE doc_id % 97 != 0 AND doc_id "
            "NOT IN (SELECT doc_id FROM contaminated)), "
            "fp AS (SELECT doc_id, md5(COALESCE(array_to_string(list_sort("
            "list_distinct(list_filter(string_split_regex(text, '\\s+'), "
            "x -> x <> ''))), ' '), '')) AS f FROM k3), "
            "win AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f), "
            "k4 AS (SELECT k3.* FROM k3 JOIN win USING (doc_id)), "
            "sh AS (SELECT doc_id, lang, source, substr(md5('shuf42:' || "
            "CAST(doc_id AS VARCHAR)), 1, 8) AS hk FROM k4), "
            "s2 AS (SELECT doc_id, lang, source, hk, "
            "CAST((strpos('0123456789abcdef', substr(hk, 8, 1)) - 1) % 8 "
            "AS BIGINT) AS shard FROM sh) "
            "SELECT doc_id, lang, source, shard, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY shard "
            "ORDER BY hk, doc_id) - 1 AS BIGINT) AS pos "
            "FROM s2 ORDER BY doc_id"
        ),
        "q_range_join_view_purchase": (
            # equi-prefix + band predicate; strict lower bound, inclusive
            # upper — the engine compares integer microseconds, INTERVAL
            # arithmetic on timestamp[us] is exact at this granularity
            "SELECT v.event_id AS view_id, p.event_id AS purchase_id "
            "FROM events v JOIN events p ON p.user_id = v.user_id "
            "AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 60 MINUTE "
            "WHERE v.event_type = 'view' AND p.event_type = 'purchase' "
            "ORDER BY view_id, purchase_id"
        ),
        "q_pivot_event_matrix": (
            "SELECT user_id, "
            + ", ".join(
                f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
                f" AS n_{t}"
                for t in ("click", "error", "purchase", "signup", "view")
            )
            + " FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "s_pq_adc": _pq_adc_oracle(),
        "s_ann_ivfpq": _ivfpq_oracle(),
        "q_hll_user_days": (
            # the engine's HLL registers replayed verbatim: DuckDB's
            # md5_number_lower == little-endian low 8 digest bytes (the
            # engine hash), bin() gives the exact bit length, and the
            # register sum rides as the INTEGER t_scaled = S * 2^33 so the
            # only float ops are the one division / ln in the CASE —
            # parenthesized identically to relational._hll_finalize
            "WITH h AS (SELECT event_type, md5_number_lower("
            "CAST(user_id AS VARCHAR) || '@' || strftime(ts, '%Y-%m-%d')"
            ") AS hv FROM events), "
            "b AS (SELECT event_type, hv % 4096 AS bucket, "
            "(hv >> 12) % 4294967296 AS w FROM h), "
            "r AS (SELECT event_type, bucket, "
            "MAX(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) "
            "AS rho FROM b GROUP BY event_type, bucket), "
            "agg AS (SELECT event_type, "
            "CAST(4096 - COUNT(*) AS BIGINT) AS v_zero, "
            "CAST(SUM(1::BIGINT << (33 - rho)) AS BIGINT) "
            "+ CAST(4096 - COUNT(*) AS BIGINT) * (1::BIGINT << 33) "
            "AS t_scaled FROM r GROUP BY event_type) "
            "SELECT event_type, v_zero, t_scaled, "
            "ROUND(CASE WHEN ((0.7213 / (1.0 + 1.079 / 4096.0)) "
            "* 16777216.0) * 8589934592.0 / t_scaled <= 10240.0 "
            "AND v_zero > 0 THEN 4096.0 * ln(4096.0 / v_zero) "
            "ELSE ((0.7213 / (1.0 + 1.079 / 4096.0)) * 16777216.0) "
            "* 8589934592.0 / t_scaled END, 4) AS est "
            "FROM agg ORDER BY event_type"
        ),
        "q_group_quantiles": (
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "ROUND(median(l_quantity), 6) AS med_qty, "
            "ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "q_bloom_semi_join_parts": (
            # the bloom bits are engine-internal (no false negatives by
            # construction, false positives removed by the exact join) —
            # the oracle is the plain join semantics
            "SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "ROUND(SUM(l.l_quantity), 2) AS sum_qty "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE p.p_size >= 48 GROUP BY p.p_brand ORDER BY p.p_brand"
        ),
        "q_interevent_gap_stats": (
            # gap sums are exact integers, so the mean's single division is
            # bit-identical to the engine's (see the pipeline docstring)
            "WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap "
            "FROM events) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps, "
            "CAST(MIN(gap) AS BIGINT) AS min_gap_us, "
            "CAST(MAX(gap) AS BIGINT) AS max_gap_us, "
            "CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap_us "
            "FROM g WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id"
        ),
        "t_weighted_sample": (
            # u replayed on the exact 2^53 float grid; ranking by ln(u)/w
            # with doc_id tiebreak — same key arithmetic as the engine
            "WITH w AS (SELECT doc_id, n_chars, "
            "ln(((md5_number_lower(CAST(doc_id AS VARCHAR) || ':ws42') "
            "% 9007199254740992) + 1) / 9007199254740992.0) / n_chars "
            "AS skey FROM documents WHERE n_chars > 0) "
            "SELECT doc_id, n_chars FROM "
            "(SELECT * FROM w ORDER BY skey DESC, doc_id LIMIT 64) "
            "ORDER BY doc_id"
        ),
        "t_cms_wordcounts": (
            # the full d x w counter table rebuilt in SQL with the same
            # md5_number_lower positions, then the min-over-rows probe —
            # integer-exact end to end
            "WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '), "
            "w -> w <> '')) AS w FROM documents), "
            "rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r), "
            "cells AS (SELECT r, md5_number_lower(CAST(r AS VARCHAR) "
            "|| ':' || w) % 1024 AS pos, COUNT(*) AS c "
            "FROM tok CROSS JOIN rows_ GROUP BY r, pos), "
            "probes AS (SELECT unnest(['join', 'batch', 'filter', 'order', "
            "'zzz-absent']) AS word), "
            "pe AS (SELECT p.word, rr.r, COALESCE(c.c, 0) AS c "
            "FROM probes p CROSS JOIN rows_ rr "
            "LEFT JOIN cells c ON c.r = rr.r AND c.pos = "
            "md5_number_lower(CAST(rr.r AS VARCHAR) || ':' || p.word) % 1024) "
            "SELECT word, CAST(MIN(c) AS BIGINT) AS est "
            "FROM pe GROUP BY word ORDER BY word"
        ),
        "t_group_uniform_sample": (
            "SELECT lang, doc_id FROM (SELECT lang, doc_id, "
            "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY "
            "substr(md5(CAST(doc_id AS VARCHAR) || ':gs7'), 1, 16), doc_id"
            ") AS rn FROM documents) WHERE rn <= 16 ORDER BY lang, doc_id"
        ),
        "q_rollup_pricing": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "q_ohlc_daily": (
            # open/close = first/last value under the (ts, event_id) total
            # order; raw value passthrough, so no rounding either side
            "WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "value, ts, event_id FROM events), "
            "w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, day "
            "ORDER BY ts, event_id) AS rn_a, "
            "ROW_NUMBER() OVER (PARTITION BY event_type, day "
            "ORDER BY ts DESC, event_id DESC) AS rn_d FROM e) "
            "SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "MIN(value) AS low, MAX(value) AS high, "
            "MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v, "
            "MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v "
            "FROM w GROUP BY event_type, day ORDER BY event_type, day"
        ),
        "q_left_join_order_counts": (
            "SELECT c.c_custkey, c.c_name, "
            "CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders, "
            "ROUND(COALESCE(o.s, 0), 2) AS total_price "
            "FROM customer c LEFT JOIN (SELECT o_custkey, COUNT(*) AS n, "
            "SUM(o_totalprice) AS s FROM orders GROUP BY o_custkey) o "
            "ON c.c_custkey = o.o_custkey ORDER BY c.c_custkey"
        ),
        "q_full_outer_user_activity": (
            # both fringes kept: view-only and purchase-only users
            "WITH v AS (SELECT user_id, COUNT(*) AS n_views FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "p AS (SELECT user_id, COUNT(*) AS n_purchases FROM events "
            "WHERE event_type = 'purchase' GROUP BY user_id) "
            "SELECT CAST(COALESCE(v.user_id, p.user_id) AS BIGINT) AS user_id, "
            "CAST(COALESCE(v.n_views, 0) AS BIGINT) AS n_views, "
            "CAST(COALESCE(p.n_purchases, 0) AS BIGINT) AS n_purchases "
            "FROM v FULL OUTER JOIN p ON v.user_id = p.user_id ORDER BY user_id"
        ),
        "q_skew_join_purchase_clicks": (
            # salting only changes row PLACEMENT, never values — the plain
            # join is the exact oracle
            "WITH c AS (SELECT user_id, COUNT(*) AS n_clicks FROM events "
            "WHERE event_type = 'click' GROUP BY user_id) "
            "SELECT CAST(e.event_id AS BIGINT) AS event_id, "
            "CAST(e.user_id AS BIGINT) AS user_id, "
            "CAST(c.n_clicks AS BIGINT) AS n_clicks "
            "FROM events e JOIN c ON e.user_id = c.user_id "
            "WHERE e.event_type = 'purchase' ORDER BY event_id"
        ),
        "q_running_user_spend": (
            # integer cents on both sides (ROUND == round_half_away), so
            # the prefix sums are association-free exact int64
            "SELECT CAST(event_id AS BIGINT) AS event_id, "
            "CAST(user_id AS BIGINT) AS user_id, "
            "CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT)) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS running_cents "
            "FROM events WHERE event_type = 'purchase' ORDER BY event_id"
        ),
        "q_user_days_exact": (
            # CAST(ts AS DATE) is floor-of-epoch-days (pre-epoch included),
            # matching the engine's floor_divide day key
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "q_topk_per_group": (
            # (price DESC, orderkey ASC) is a total order -> deterministic
            # ranks under ties; price is a raw passthrough, no rounding
            "SELECT CAST(o_custkey AS BIGINT) AS o_custkey, "
            "CAST(rnk AS BIGINT) AS rnk, "
            "CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice FROM "
            "(SELECT o_custkey, o_orderkey, o_totalprice, "
            "ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders) "
            "WHERE rnk <= 3 ORDER BY o_custkey, rnk"
        ),
        "q_group_moments": (
            # identical IEEE expressions on identical integer digests ->
            # bit-identical doubles; no ROUND on either side
            "WITH d AS (SELECT l_returnflag, l_linestatus, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(CAST(l_quantity * 64 AS BIGINT)) AS BIGINT) AS sum_q64, "
            "CAST(SUM(CAST(l_quantity * 64 AS BIGINT) * "
            "CAST(l_quantity * 64 AS BIGINT)) AS BIGINT) AS sumsq_q4096 "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus) "
            "SELECT l_returnflag, l_linestatus, n_lines, sum_q64, "
            "sumsq_q4096, "
            "CAST(sum_q64 AS DOUBLE) / CAST(n_lines AS DOUBLE) / 64.0 "
            "AS mean_qty, "
            "(CAST(sumsq_q4096 AS DOUBLE) - CAST(sum_q64 AS DOUBLE) * "
            "CAST(sum_q64 AS DOUBLE) / CAST(n_lines AS DOUBLE)) "
            "/ CAST(n_lines AS DOUBLE) / 4096.0 AS var_qty "
            "FROM d ORDER BY l_returnflag, l_linestatus"
        ),
        "q_cube_pricing": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "q_moving_avg_user_spend": (
            # bounded ROWS frame; integer cents both sides, and moving_avg
            # is the same IEEE division on the same integers — no rounding
            "WITH p AS (SELECT event_id, user_id, ts, "
            "CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT) AS cents "
            "FROM events WHERE event_type = 'purchase'), "
            "w AS (SELECT event_id, user_id, "
            "CAST(COUNT(*) OVER win AS BIGINT) AS n_window, "
            "CAST(SUM(cents) OVER win AS BIGINT) AS moving_sum_cents "
            "FROM p WINDOW win AS (PARTITION BY user_id ORDER BY ts, "
            "event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) "
            "SELECT event_id, user_id, n_window, moving_sum_cents, "
            "CAST(moving_sum_cents AS DOUBLE) / CAST(n_window AS DOUBLE) "
            "AS moving_avg FROM w ORDER BY event_id"
        ),
        "q5_local_supplier_volume": (
            # revenue on the exact integer grid both sides (cents x
            # (100 - d100)); the float revenue is the same IEEE division
            "WITH rn AS (SELECT n_nationkey, n_name FROM nation "
            "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'), "
            "li AS (SELECT l_orderkey, l_suppkey, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem), "
            "j AS (SELECT rn.n_name, li.rev FROM orders o "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN li ON li.l_orderkey = o.o_orderkey "
            "JOIN supplier s ON s.s_suppkey = li.l_suppkey "
            "JOIN rn ON rn.n_nationkey = s.s_nationkey "
            "WHERE c.c_nationkey = s.s_nationkey "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1997-01-01') "
            "SELECT n_name, CAST(SUM(rev) AS BIGINT) AS revenue_x10000, "
            "CAST(SUM(rev) AS DOUBLE) / 10000.0 AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_lineitems "
            "FROM j GROUP BY n_name ORDER BY n_name"
        ),
        "q_percent_rank_acctbal": (
            # tie rows project identically -> DISTINCT over the windowed
            # table is lossless; PERCENT_RANK is (rnk-1)/(n-1), the same
            # IEEE division the engine applies to the same small ints
            "SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS s_nationkey, "
            "s_acctbal, "
            "CAST(COUNT(*) OVER (PARTITION BY s_nationkey, s_acctbal) "
            "AS BIGINT) AS n_rows, "
            "CAST(RANK() OVER w AS BIGINT) AS rnk, "
            "CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rnk, "
            "PERCENT_RANK() OVER w AS pct_rank "
            "FROM supplier "
            "WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal) "
            "ORDER BY s_nationkey, s_acctbal"
        ),
        "q_corr_qty_discount": (
            # corr recomputed from the SAME integer digests with the SAME
            # IEEE expression the engine uses (NOT the CORR() aggregate,
            # whose streaming update order is implementation-defined) —
            # bit-identical doubles, no rounding either side
            "WITH d AS (SELECT l_returnflag, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(CAST(l_quantity * 64 AS BIGINT)) AS BIGINT) AS sx, "
            "CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy, "
            "CAST(SUM(CAST(l_quantity * 64 AS BIGINT) * "
            "CAST(l_quantity * 64 AS BIGINT)) AS BIGINT) AS sxx, "
            "CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT) * "
            "CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy, "
            "CAST(SUM(CAST(l_quantity * 64 AS BIGINT) * "
            "CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy "
            "FROM lineitem GROUP BY l_returnflag) "
            "SELECT l_returnflag, n_lines, "
            "(CAST(n_lines AS DOUBLE) * CAST(sxy AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
            "SQRT(NULLIF(CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)) / "
            "SQRT(NULLIF(CAST(n_lines AS DOUBLE) * CAST(syy AS DOUBLE) - "
            "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)) "
            "AS corr_qty_disc "
            "FROM d ORDER BY l_returnflag"
        ),
        "q_mode_event_type": (
            "SELECT user_id, mode_type, n_mode FROM ("
            "SELECT user_id, event_type AS mode_type, "
            "CAST(COUNT(*) AS BIGINT) AS n_mode, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY COUNT(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) "
            "WHERE rn = 1 ORDER BY user_id"
        ),
        "s_mips_topk": (
            # same rounded-score total order as the engine's local top-k
            # and driver merge (dot desc, vec_id asc)
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "FROM embeddings ORDER BY vec_id LIMIT 5), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "ROUND(list_inner_product(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qe AS DOUBLE[])), 4) AS dot "
            "FROM embeddings e CROSS JOIN q), "
            "ranked AS (SELECT query_id, vec_id, dot, "
            "ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY dot DESC, vec_id) AS rank FROM scored) "
            "SELECT query_id, rank, vec_id, dot FROM ranked WHERE rank <= 10 "
            "ORDER BY query_id, rank"
        ),
        "q3_shipping_priority": (
            # TPC-H Q3 shape; revenue on the exact integer grid both sides
            # (cents x (100 - d100)); ranking on the INTEGER revenue so no
            # float tie can reach the top-k cut; same IEEE division for
            # the float revenue
            f"WITH li AS (SELECT l_orderkey, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev "
            f"FROM lineitem WHERE l_shipdate > TIMESTAMP '{R.Q3_DATE}'), "
            "j AS (SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority, "
            "li.rev FROM orders o "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            f"AND c.c_mktsegment = '{R.Q3_SEGMENT}' "
            "JOIN li ON li.l_orderkey = o.o_orderkey "
            f"WHERE o.o_orderdate < TIMESTAMP '{R.Q3_DATE}') "
            "SELECT o_orderkey AS l_orderkey, o_orderdate, o_orderpriority, "
            "CAST(SUM(rev) AS BIGINT) AS revenue_x10000, "
            "CAST(SUM(rev) AS DOUBLE) / 10000.0 AS revenue "
            "FROM j GROUP BY o_orderkey, o_orderdate, o_orderpriority "
            f"ORDER BY revenue_x10000 DESC, l_orderkey LIMIT {R.Q3_TOP_N}"
        ),
        "q_ntile_acctbal": (
            # global row_number + NTILE under the deterministic
            # (s_acctbal, s_suppkey) total order — pure integer math
            "SELECT s_suppkey, s_acctbal, "
            "CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn, "
            f"CAST(NTILE({R.NTILE_BUCKETS}) OVER w AS BIGINT) AS tile "
            "FROM supplier WINDOW w AS (ORDER BY s_acctbal, s_suppkey) "
            "ORDER BY s_suppkey"
        ),
        "s_knn_graph": (
            # exact all-pairs kNN graph; rank under the engine's total
            # order (rounded sim desc, neighbor id asc)
            "WITH scored AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, "
            "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 4) AS sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
            "r AS (SELECT vec_id, nbr_id, sim, "
            "ROW_NUMBER() OVER (PARTITION BY vec_id "
            "ORDER BY sim DESC, nbr_id) AS rnk FROM scored) "
            'SELECT vec_id, CAST(rnk AS BIGINT) AS "rank", nbr_id, sim '
            f"FROM r WHERE rnk <= {S.KNN_GRAPH_K} ORDER BY vec_id, rnk"
        ),
        "s_semdedup": (
            # SemDeDup replayed in SQL, scale-generic (no literals): the
            # init CTE IS the deterministic centroid rule (k lowest
            # vec_ids), assignment is the same -2x.c + c.c argmin with
            # first-index ties as s_kmeans_init_assign's oracle, and the
            # keep rule is the greedy lower-id EXISTS on rounded cosine
            "WITH init AS (SELECT CAST(embedding AS DOUBLE[]) AS ce, "
            "ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx "
            f"FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {S.KMEANS_K})), "
            "d AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, "
            "i.cidx, -2 * list_inner_product(CAST(e.embedding AS DOUBLE[]), "
            "i.ce) + list_inner_product(i.ce, i.ce) AS dist "
            "FROM embeddings e CROSS JOIN init i), "
            "asg AS (SELECT vec_id, emb, cidx AS cluster FROM ("
            "SELECT vec_id, emb, cidx, ROW_NUMBER() OVER ("
            "PARTITION BY vec_id ORDER BY dist, cidx) AS rn FROM d) "
            "WHERE rn = 1), "
            "dup AS (SELECT DISTINCT a.vec_id "
            "FROM asg a JOIN asg b ON a.cluster = b.cluster "
            "AND b.vec_id < a.vec_id "
            f"WHERE ROUND(list_cosine_similarity(a.emb, b.emb), 4) "
            f">= {S.SEMDEDUP_TAU}) "
            "SELECT asg.vec_id, CAST(cluster AS BIGINT) AS cluster, "
            "CAST(CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS keep FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id "
            "ORDER BY asg.vec_id"
        ),
        "t_dsir_sample": (
            # DSIR replayed verbatim: hashed-unigram buckets via the same
            # integer md5 arithmetic, add-one-smoothed log-ratio per
            # bucket (same ln of the same doubles), per-doc score as
            # SUM(c * diff) over (doc, bucket) groups (the engine's
            # bincount computes exactly c_b * diff_b), Gumbel keys on the
            # exact 2^53 md5 grid, top-k under (gkey desc, doc_id)
            "WITH toks AS (SELECT doc_id, lang, "
            "unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w "
            "FROM documents), "
            "tb AS (SELECT doc_id, lang, "
            "md5_number_lower('dsir:' || w) % 1024 AS b FROM toks), "
            "ca AS (SELECT b, COUNT(*) AS c FROM tb GROUP BY b), "
            "ct AS (SELECT b, COUNT(*) AS c FROM tb "
            "WHERE lang = 'en' GROUP BY b), "
            "tot AS (SELECT (SELECT COUNT(*) FROM tb) AS na, "
            "(SELECT COUNT(*) FROM tb WHERE lang = 'en') AS nt), "
            "diff AS (SELECT ca.b, "
            "ln((COALESCE(ct.c, 0) + 1.0) / (tot.nt + 1024)) - "
            "ln((ca.c + 1.0) / (tot.na + 1024)) AS d "
            "FROM ca CROSS JOIN tot LEFT JOIN ct USING (b)), "
            "db AS (SELECT doc_id, b, COUNT(*) AS c FROM tb "
            "GROUP BY doc_id, b), "
            "sums AS (SELECT db.doc_id, SUM(db.c * diff.d) AS lw, "
            "CAST(SUM(db.c) AS BIGINT) AS nw "
            "FROM db JOIN diff USING (b) GROUP BY db.doc_id), "
            "sc AS (SELECT d.doc_id, d.lang, COALESCE(s.lw, 0) AS lw, "
            "COALESCE(s.nw, 0) AS nw FROM documents d "
            "LEFT JOIN sums s USING (doc_id)), "
            "g AS (SELECT doc_id, lang, nw, lw, lw + -ln(-ln("
            "((md5_number_lower('dsirg:' || CAST(doc_id AS VARCHAR)) "
            "% 9007199254740992) + 1) / 9007199254740992.0)) AS gkey "
            "FROM sc) "
            "SELECT doc_id, lang, CAST(nw AS BIGINT) AS n_words, "
            "CAST(FLOOR(lw * 1000 + 0.5) AS BIGINT) AS logw_x1e3 "
            "FROM (SELECT * FROM g ORDER BY gkey DESC, doc_id LIMIT 64) "
            "ORDER BY doc_id"
        ),
        "q4_order_priority": (
            # EXISTS == per-order max-shipdate compare; pure-integer counts
            "WITH w AS (SELECT o_orderkey, o_orderdate, o_orderpriority "
            f"FROM orders WHERE o_orderdate >= TIMESTAMP '{R.Q4_DATE_LO}' "
            f"AND o_orderdate < TIMESTAMP '{R.Q4_DATE_HI}') "
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count "
            "FROM w WHERE EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = w.o_orderkey "
            f"AND l_shipdate > w.o_orderdate + INTERVAL {R.Q4_LATE_DAYS} DAY) "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "q17_small_qty_revenue": (
            # threshold on the exact integer grid: qty < 0.2*avg
            # cross-multiplied to 5*q100*cnt < sum(q100) with q100 the
            # half-away-rounded qty*100 (same ROUND both sides) — no float
            # division decides membership; the emitted avg_yearly is the
            # same IEEE division chain
            "WITH li AS (SELECT l_partkey, "
            "CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS qty, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents "
            "FROM lineitem WHERE l_partkey IN "
            f"(SELECT p_partkey FROM part WHERE p_brand = '{R.Q17_BRAND}')), "
            "g AS (SELECT l_partkey, SUM(qty) AS sq, COUNT(*) AS cnt "
            "FROM li GROUP BY l_partkey), "
            "qual AS (SELECT cents FROM li JOIN g USING (l_partkey) "
            "WHERE qty * 5 * cnt < sq) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_small, "
            "CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS cents_total, "
            "ROUND(COALESCE(SUM(cents), 0) / 100.0 / 7.0, 2) AS avg_yearly "
            "FROM qual"
        ),
        "q16_supplier_variety": (
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            f"WHERE p_brand <> '{R.Q16_EXCL_BRAND}' "
            f"AND p_type <> '{R.Q16_EXCL_TYPE}' "
            f"AND p_size IN {R.Q16_SIZES!r} "
            "AND l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_type, p_size "
            "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
        ),
        "q_user_set_ops": (
            "WITH f AS (SELECT user_id, "
            "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p, "
            "MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c "
            "FROM events WHERE event_type IN ('purchase', 'click') "
            "GROUP BY user_id) "
            "SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_purchase_users, "
            "CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_click_users, "
            "CAST(COALESCE(SUM(p * c), 0) AS BIGINT) AS n_both, "
            "CAST(COALESCE(SUM(p * (1 - c)), 0) AS BIGINT) AS n_purchase_only, "
            "CAST(COALESCE(SUM(c * (1 - p)), 0) AS BIGINT) AS n_click_only "
            "FROM f"
        ),
        "s_hamming_topk": (
            # sign binarization + Hamming replayed per dimension: distance
            # = #dims whose (component > 0) predicates disagree — integer
            # end to end, dim-agnostic via len(qe)
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            f"FROM embeddings ORDER BY vec_id LIMIT {S.N_QUERIES}), "
            "d AS (SELECT q.query_id, e.vec_id, "
            "CAST(len(list_filter(range(1, len(qe) + 1), "
            "i -> (qe[i] > 0) <> (e.embedding[i] > 0))) AS BIGINT) AS dist "
            "FROM q CROSS JOIN embeddings e), "
            "r AS (SELECT query_id, vec_id, dist, "
            "ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY dist, vec_id) AS rn FROM d) "
            'SELECT query_id, CAST(rn AS BIGINT) AS "rank", vec_id, dist '
            f"FROM r WHERE rn <= {S.TOP_K} ORDER BY query_id, rn"
        ),
        "m_dominant_freq": (
            # golden spectral columns were computed at fixture-gen time
            # (pre-table encode/decode pass); the engine recomputes them
            # from the WAV container bytes via its own decode + rfft
            f"SELECT url, n_samples, dom_bin, dom_hz_x1e3, n_bins "
            f"FROM read_parquet('{av}') WHERE media_type = 'audio' "
            f"ORDER BY url"
        ),
        "q_pagerank_bipartite": _pagerank_oracle(),
        "q_kcore": _kcore_oracle(),
        "q_graph_random_walks": (
            # the walk recurrence unrolled: neighbor ranks by (u, v)
            # window order, each hop = md5_number_lower('walk:node:step')
            # mod degree — UBIGINT mod matches the engine's uint64 mod
            "WITH pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s "
            "FROM lineitem), "
            "e AS (SELECT p * 2 AS u, s * 2 + 1 AS v FROM pairs "
            "UNION ALL SELECT s * 2 + 1, p * 2 FROM pairs), "
            "adj AS (SELECT u, v, row_number() OVER (PARTITION BY u "
            "ORDER BY v) - 1 AS r FROM e), "
            "deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM e "
            "GROUP BY u), "
            "w0 AS (SELECT DISTINCT p * 2 AS n0 FROM pairs), "
            "w1 AS (SELECT w0.n0, a.v AS n1 FROM w0 "
            "JOIN deg ON deg.u = w0.n0 JOIN adj a ON a.u = w0.n0 "
            "AND a.r = CAST(md5_number_lower('walk:' || "
            "CAST(w0.n0 AS VARCHAR) || ':0') % deg.d AS BIGINT)), "
            "w2 AS (SELECT w1.n0, w1.n1, a.v AS n2 FROM w1 "
            "JOIN deg ON deg.u = w1.n1 JOIN adj a ON a.u = w1.n1 "
            "AND a.r = CAST(md5_number_lower('walk:' || "
            "CAST(w1.n1 AS VARCHAR) || ':1') % deg.d AS BIGINT)), "
            "w3 AS (SELECT w2.n0, w2.n1, w2.n2, a.v AS n3 FROM w2 "
            "JOIN deg ON deg.u = w2.n2 JOIN adj a ON a.u = w2.n2 "
            "AND a.r = CAST(md5_number_lower('walk:' || "
            "CAST(w2.n2 AS VARCHAR) || ':2') % deg.d AS BIGINT)) "
            "SELECT n0 // 2 AS part0, n1 // 2 AS supp1, n2 // 2 AS part2, "
            "n3 // 2 AS supp3 FROM w3 ORDER BY part0"
        ),
        "s_perceptron": _perceptron_oracle(),
        "s_filtered_knn": (
            # the knn oracle with the label predicate applied BEFORE
            # ranking (post-filtering a global top-k would under-fill)
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "FROM embeddings ORDER BY vec_id LIMIT 5), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qe AS DOUBLE[])), 4) AS sim "
            "FROM embeddings e CROSS JOIN q WHERE e.label = 3), "
            "ranked AS (SELECT query_id, vec_id, sim, "
            "ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY sim DESC, vec_id) AS rank FROM scored) "
            "SELECT query_id, rank, vec_id, sim FROM ranked "
            "WHERE rank <= 10 ORDER BY query_id, rank"
        ),
        "s_triplet_mining": (
            # batch-hard mining replayed: per anchor the min-sim same-
            # label and max-sim different-label rows under the family's
            # (ROUND(sim,4), vec_id) total order; inner joins drop
            # anchors lacking a positive or negative partner
            "WITH a AS (SELECT vec_id AS aid, embedding AS ae, "
            "label AS alab FROM embeddings ORDER BY vec_id LIMIT 8), "
            "scored AS (SELECT a.aid, a.alab, e.vec_id, e.label, "
            "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(a.ae AS DOUBLE[])), 4) AS sim "
            "FROM embeddings e CROSS JOIN a), "
            "pos AS (SELECT aid, vec_id, sim, row_number() OVER "
            "(PARTITION BY aid ORDER BY sim ASC, vec_id) AS rn "
            "FROM scored WHERE label = alab AND vec_id <> aid), "
            "neg AS (SELECT aid, vec_id, sim, row_number() OVER "
            "(PARTITION BY aid ORDER BY sim DESC, vec_id) AS rn "
            "FROM scored WHERE label <> alab) "
            "SELECT p.aid AS anchor_id, p.vec_id AS pos_id, "
            "p.sim AS pos_sim, n.vec_id AS neg_id, n.sim AS neg_sim "
            "FROM pos p JOIN neg n ON p.aid = n.aid "
            "WHERE p.rn = 1 AND n.rn = 1 ORDER BY anchor_id"
        ),
        "s_calibration_report": (
            # floor of the IDENTICAL double expression both sides, then
            # pure integer sums; embedding[1] is DuckDB's 1-based first
            # component; the bin = -1 total row folds the per-bin gaps
            # (HAVING drops it on an empty table, matching the engine's
            # typed-empty output)
            "WITH b AS (SELECT CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END "
            "AS y, CAST(FLOOR(LEAST(GREATEST("
            "(CAST(embedding[1] AS DOUBLE) + 1) / 2, 0), 1) * 1000000) "
            "AS BIGINT) AS pm FROM embeddings), "
            "g AS (SELECT LEAST(pm // 100000, 9) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS "
            "n_pos, CAST(SUM(pm) AS BIGINT) AS sum_p_micro FROM b "
            "GROUP BY 1), "
            "r AS (SELECT bin, n, n_pos, sum_p_micro, "
            "ABS(n_pos * 1000000 - sum_p_micro) AS gap_micro FROM g) "
            "SELECT * FROM r UNION ALL "
            "SELECT CAST(-1 AS BIGINT), CAST(SUM(n) AS BIGINT), "
            "CAST(SUM(n_pos) AS BIGINT), CAST(SUM(sum_p_micro) AS BIGINT), "
            "CAST(SUM(gap_micro) AS BIGINT) FROM r HAVING COUNT(*) > 0 "
            "ORDER BY bin"
        ),
        "q_fwf_roundtrip": (
            # the FWF contract: strings lose trailing spaces (padding is
            # indistinguishable) — rtrim on the oracle side makes the
            # compare exact under the format's real semantics
            "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, "
            "rtrim(n_name, ' ') AS n_name, "
            "CAST(n_regionkey AS BIGINT) AS n_regionkey "
            "FROM nation ORDER BY n_nationkey"
        ),
        "q_cuped_adjusted": (
            # per-user (pre, post) cents, HUGEINT digests per group,
            # pooled theta and adjusted means as the token-identical
            # double chain under FLOOR micro; theta/adjustment exist only
            # when pooled covariate variance is nonzero and both groups
            # are populated
            "WITH p AS (SELECT user_id, CASE WHEN ts < "
            "TIMESTAMP '2024-01-20' THEN CAST(ROUND(value * 100, 0) "
            "AS BIGINT) ELSE 0 END AS pre, CASE WHEN ts < "
            "TIMESTAMP '2024-01-20' THEN 0 ELSE "
            "CAST(ROUND(value * 100, 0) AS BIGINT) END AS post "
            "FROM events WHERE event_type = 'purchase'), "
            "u AS (SELECT user_id, CAST(SUM(pre) AS BIGINT) AS x, "
            "CAST(SUM(post) AS BIGINT) AS y FROM p GROUP BY user_id), "
            "g AS (SELECT CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN 't' "
            "ELSE 'c' END AS grp, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
            "SUM(CAST(x AS HUGEINT) * x) AS sxx, "
            "SUM(CAST(x AS HUGEINT) * y) AS sxy FROM u GROUP BY 1), "
            "spine AS (SELECT unnest(['c', 't']) AS grp), "
            "f AS (SELECT spine.grp, COALESCE(n, 0) AS n, "
            "COALESCE(sx, 0) AS sx, COALESCE(sy, 0) AS sy, "
            "COALESCE(sxx, 0) AS sxx, COALESCE(sxy, 0) AS sxy "
            "FROM spine LEFT JOIN g USING(grp)), "
            "tot AS (SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy, "
            "SUM(sxx) AS sxx, SUM(sxy) AS sxy FROM f), "
            "th AS (SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
            "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta, "
            "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu, "
            "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS var_num "
            "FROM tot), "
            "ok AS (SELECT COALESCE((SELECT var_num FROM th) <> 0, FALSE) "
            "AND (SELECT MIN(n) FROM f) > 0 AS valid), "
            "cells AS (SELECT f.grp, f.n AS n_users, "
            "f.sx AS sum_pre_cents, f.sy AS sum_post_cents, "
            "CASE WHEN f.n > 0 THEN CAST(FLOOR(1000000 * "
            "(CAST(f.sy AS DOUBLE) / f.n)) AS BIGINT) ELSE 0 END "
            "AS mean_post_micro, "
            "CASE WHEN (SELECT valid FROM ok) THEN CAST(FLOOR(1000000 * "
            "((CAST(f.sy AS DOUBLE) / f.n) - (SELECT theta FROM th) * "
            "((CAST(f.sx AS DOUBLE) / f.n) - (SELECT mu FROM th)))) "
            "AS BIGINT) ELSE 0 END AS adj_micro FROM f) "
            "SELECT * FROM cells UNION ALL "
            "SELECT 'theta', 0, 0, 0, 0, CAST(FLOOR(1000000 * "
            "(SELECT theta FROM th)) AS BIGINT) "
            "WHERE (SELECT valid FROM ok) ORDER BY grp"
        ),
        "q_new_vs_returning": (
            # first-ever day per user via a window MIN; the pinned
            # float-floor day rule
            "WITH pairs AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day "
            "FROM events), "
            "f AS (SELECT user_id, day, MIN(day) OVER "
            "(PARTITION BY user_id) AS first_day FROM pairs) "
            "SELECT day, CAST(SUM(CASE WHEN day = first_day THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_new, "
            "CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_returning FROM f GROUP BY day ORDER BY day"
        ),
        "q_rolling_active_users": (
            # exact trailing-window distinct via the day-spine
            # COUNT(DISTINCT) join; the repo's pinned float-floor day
            # rule; windows with zero actives are absent on both sides
            "WITH pairs AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day "
            "FROM events), "
            "spine AS (SELECT unnest(generate_series("
            "(SELECT MIN(day) FROM pairs), "
            "(SELECT MAX(day) FROM pairs) + 6)) AS d), "
            "w AS (SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS "
            "wau FROM spine JOIN pairs ON pairs.day BETWEEN d - 6 AND d "
            "GROUP BY d) "
            "SELECT d AS day, wau FROM w WHERE wau > 0 ORDER BY day"
        ),
        "q_did_uplift": (
            # cells = order-free integer digests; mean and DiD = FLOOR of
            # the token-identical double chain; the did row exists only
            # when all four cells are populated
            "WITH p AS (SELECT CASE WHEN ((user_id % 2) + 2) % 2 = 0 "
            "THEN 't' ELSE 'c' END || '_' || CASE WHEN ts < "
            "TIMESTAMP '2024-01-20' THEN 'pre' ELSE 'post' END AS cell, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events "
            "WHERE event_type = 'purchase'), "
            "cells AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(cents) AS BIGINT) AS s FROM p GROUP BY cell), "
            "spine AS (SELECT unnest(['c_post', 'c_pre', 't_post', "
            "'t_pre']) AS cell), "
            "f AS (SELECT spine.cell, COALESCE(n, 0) AS n, "
            "COALESCE(s, 0) AS sum_cents FROM spine "
            "LEFT JOIN cells USING(cell)), "
            "base AS (SELECT cell, n, sum_cents, CASE WHEN n > 0 THEN "
            "CAST(FLOOR(1000000 * (CAST(sum_cents AS DOUBLE) / n)) "
            "AS BIGINT) ELSE 0 END AS stat_micro FROM f), "
            "d AS (SELECT 'did' AS cell, CAST(0 AS BIGINT) AS n, "
            "CAST(0 AS BIGINT) AS sum_cents, "
            "CAST(FLOOR(1000000 * (((SELECT CAST(sum_cents AS DOUBLE) / n "
            "FROM f WHERE cell = 't_post') - (SELECT "
            "CAST(sum_cents AS DOUBLE) / n FROM f WHERE cell = 't_pre')) "
            "- ((SELECT CAST(sum_cents AS DOUBLE) / n FROM f "
            "WHERE cell = 'c_post') - (SELECT "
            "CAST(sum_cents AS DOUBLE) / n FROM f WHERE cell = 'c_pre'))"
            ")) AS BIGINT) AS stat_micro "
            "WHERE (SELECT MIN(n) FROM f) > 0) "
            "SELECT * FROM base UNION ALL SELECT * FROM d ORDER BY cell"
        ),
        "q_peak_concurrency": (
            # the sweep recomputed in window form: deltas netted per
            # distinct time, running sum per type, argmax under the
            # (conc DESC, t ASC) total order — half-open [s, e) semantics
            # pinned by processing both deltas AT their own times
            "WITH iv AS (SELECT event_type, epoch_us(ts) AS s, "
            "epoch_us(ts) + 1800000000 AS e FROM events), "
            "d AS (SELECT event_type, s AS t, 1 AS dlt FROM iv "
            "UNION ALL SELECT event_type, e, -1 FROM iv), "
            "byt AS (SELECT event_type, t, CAST(SUM(dlt) AS BIGINT) AS net "
            "FROM d GROUP BY event_type, t), "
            "run AS (SELECT event_type, t, SUM(net) OVER "
            "(PARTITION BY event_type ORDER BY t) AS conc FROM byt), "
            "sel AS (SELECT event_type, conc, t, row_number() OVER "
            "(PARTITION BY event_type ORDER BY conc DESC, t) AS rn "
            "FROM run) "
            "SELECT event_type, CAST(conc AS BIGINT) AS peak, "
            "t AS peak_ts_us FROM sel WHERE rn = 1 ORDER BY event_type"
        ),
        "q_multitouch_attribution": (
            # linear attribution recomputed from first principles: per
            # (purchase, channel) touch counts over the [pts-W, pts)
            # window, credit = (1e6 // n_total) * n_ch — pure integer
            # floor division, order-free; touchless purchases fold into
            # the __direct__ row (HAVING drops it when none exist)
            "WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) "
            "AS pts FROM events WHERE event_type = 'purchase'), "
            "t AS (SELECT user_id, event_type AS ch, epoch_us(ts) AS tts "
            "FROM events WHERE event_type <> 'purchase'), "
            "j AS (SELECT p.pid, t.ch, CAST(COUNT(*) AS BIGINT) AS n_ch "
            "FROM p JOIN t ON p.user_id = t.user_id "
            "AND t.tts >= p.pts - 21600000000 AND t.tts < p.pts "
            "GROUP BY p.pid, t.ch), "
            "tot AS (SELECT pid, CAST(SUM(n_ch) AS BIGINT) AS n_total "
            "FROM j GROUP BY pid), "
            "cr AS (SELECT j.ch, j.n_ch, (1000000 // tot.n_total) * j.n_ch "
            "AS credit FROM j JOIN tot USING(pid)), "
            "agg AS (SELECT ch AS channel, CAST(COUNT(*) AS BIGINT) AS "
            "n_conversions, CAST(SUM(n_ch) AS BIGINT) AS n_touches, "
            "CAST(SUM(credit) AS BIGINT) AS credit_micro FROM cr "
            "GROUP BY ch), "
            "d AS (SELECT '__direct__' AS channel, CAST(COUNT(*) AS BIGINT) "
            "AS n_conversions, CAST(0 AS BIGINT) AS n_touches, "
            "CAST(1000000 * COUNT(*) AS BIGINT) AS credit_micro FROM p "
            "WHERE pid NOT IN (SELECT pid FROM tot) HAVING COUNT(*) > 0) "
            "SELECT * FROM agg UNION ALL SELECT * FROM d ORDER BY channel"
        ),
        "q_seq_trigrams": (
            # contiguous trigrams via two window leads under the pinned
            # (ts, event_id) order; DISTINCT per user, then the support
            # count; the minsup literal mirrors SEQ3_MINSUP
            "WITH s AS (SELECT user_id, event_type AS t1, "
            "lead(event_type, 1) OVER w AS t2, "
            "lead(event_type, 2) OVER w AS t3 FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "tri AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s "
            "WHERE t3 IS NOT NULL) "
            "SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS support "
            "FROM tri GROUP BY t1, t2, t3 HAVING COUNT(*) >= 2 "
            "ORDER BY support DESC, t1, t2, t3"
        ),
        "q_incremental_rollup": (
            # the incremental (base checkpoint + delta merge) result must
            # equal the full from-scratch recompute — that equality IS the
            # materialized-view-maintenance contract.  Cents are per-row
            # half-away-rounded then integer-summed on both sides.
            "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
            "AS sum_cents, "
            "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
            "/ 100.0 AS sum_value "
            "FROM events GROUP BY event_type, day ORDER BY event_type, day"
        ),
        "s_range_search": (
            # the radius compare runs on the half-away-rounded 1e-4 grid
            # on BOTH sides; zero vectors ride DuckDB's -1 pin convention
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            f"FROM embeddings ORDER BY vec_id LIMIT {S.N_QUERIES}), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qe AS DOUBLE[])), 4) AS sim "
            "FROM embeddings e CROSS JOIN q) "
            "SELECT query_id, vec_id, sim FROM scored "
            f"WHERE sim >= {S.SIM_RADIUS} ORDER BY query_id, vec_id"
        ),
        "m_silence_segments": (
            # golden run-length columns were computed at fixture-gen time
            # from the same integer windowed-energy pass; the engine
            # recomputes them from the WAV container bytes
            f"SELECT url, n_windows, n_active_windows, n_segments, "
            f"longest_run FROM read_parquet('{av}') "
            f"WHERE media_type = 'audio' ORDER BY url"
        ),
        "m_scene_cuts": (
            # golden cut counts were computed at fixture-gen time from the
            # same integer luma-diff pass; the engine recomputes them from
            # the Y4M container bytes
            f"SELECT url, n_frames, n_pairs, n_cuts, diff_total "
            f"FROM read_parquet('{av}') WHERE media_type = 'video' "
            f"ORDER BY url"
        ),
        "q10_returned_revenue": (
            # revenue on the exact integer grid (cents x (100 - d100),
            # ROUND is ties-away on both sides); the customer join runs
            # BEFORE the LIMIT so dangling custkeys never occupy a slot;
            # the cut key (revenue_x10000, c_custkey) is a total order
            "WITH li AS (SELECT l_orderkey, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem WHERE l_returnflag = 'R'), "
            "g AS (SELECT c_custkey, c_name, c_acctbal, n_name, "
            "CAST(SUM(li.rev) AS BIGINT) AS revenue_x10000 "
            "FROM orders o "
            "JOIN li ON li.l_orderkey = o.o_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            f"WHERE o.o_orderdate >= TIMESTAMP '{R.Q10_DATE_LO}' "
            f"AND o.o_orderdate < TIMESTAMP '{R.Q10_DATE_HI}' "
            "GROUP BY c_custkey, c_name, c_acctbal, n_name) "
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, "
            "revenue_x10000, "
            "CAST(revenue_x10000 AS DOUBLE) / 10000.0 AS revenue, "
            "c_acctbal, n_name FROM g "
            f"ORDER BY revenue_x10000 DESC, c_custkey LIMIT {R.Q10_TOP_N}"
        ),
        "q18_large_volume_customers": (
            # quantity sums on the exact x64 grid (on-grid: CAST rounding
            # and np.rint agree); strict > threshold; the LIMIT cut rides
            # the integer cents grid + orderkey — a total order
            "WITH w AS (SELECT l_orderkey, "
            "CAST(SUM(CAST(l_quantity * 64 AS BIGINT)) AS BIGINT) "
            "AS sum_qty_x64 FROM lineitem GROUP BY l_orderkey "
            "HAVING SUM(CAST(l_quantity * 64 AS BIGINT)) > "
            f"{R.Q18_QTY_THRESHOLD * 64}) "
            "SELECT c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey, "
            "o.o_orderkey AS o_orderkey, o.o_orderdate, o.o_totalprice, "
            "w.sum_qty_x64, CAST(w.sum_qty_x64 AS DOUBLE) / 64.0 AS sum_qty "
            "FROM w JOIN orders o ON o.o_orderkey = w.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "ORDER BY CAST(ROUND(o.o_totalprice * 100) AS BIGINT) DESC, "
            f"o.o_orderkey LIMIT {R.Q18_TOP_N}"
        ),
        "q6_forecast_revenue": (
            # revenue = cents x d100 on the exact integer grid; the
            # COALESCE pins SUM-over-nothing = 0 on both sides
            "WITH f AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
            " * CAST(ROUND(l_discount * 100) AS BIGINT) AS rev "
            "FROM lineitem "
            f"WHERE l_shipdate >= TIMESTAMP '{R.Q6_DATE_LO}' "
            f"AND l_shipdate < TIMESTAMP '{R.Q6_DATE_HI}' "
            "AND CAST(ROUND(l_discount * 100) AS BIGINT) "
            f"BETWEEN {R.Q6_D100_LO} AND {R.Q6_D100_HI} "
            f"AND l_quantity < {R.Q6_QTY_BOUND}) "
            "SELECT CAST(COALESCE(SUM(rev), 0) AS BIGINT) AS revenue_x10000, "
            "CAST(COALESCE(SUM(rev), 0) AS DOUBLE) / 10000.0 AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines FROM f"
        ),
        "q14_promo_revenue": (
            # the pct is the same IEEE expression on the same exact int64
            # sums; CASE total=0 -> 0.0 pinned on both sides
            "WITH j AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev, "
            f"(p_type = '{R.Q14_PROMO_TYPE}') AS promo "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            f"WHERE l_shipdate >= TIMESTAMP '{R.Q14_DATE_LO}' "
            f"AND l_shipdate < TIMESTAMP '{R.Q14_DATE_HI}'), "
            "s AS (SELECT CAST(COALESCE(SUM(CASE WHEN promo THEN rev "
            "ELSE 0 END), 0) AS BIGINT) AS promo_x10000, "
            "CAST(COALESCE(SUM(rev), 0) AS BIGINT) AS total_x10000 FROM j) "
            "SELECT promo_x10000, total_x10000, "
            "CASE WHEN total_x10000 = 0 THEN 0.0 ELSE "
            "100.0 * CAST(promo_x10000 AS DOUBLE) / "
            "CAST(total_x10000 AS DOUBLE) END AS promo_pct FROM s"
        ),
        "q15_top_supplier": (
            # the MAX subquery scans ALL per-supplier totals (dangling
            # suppkeys included) and the supplier join then drops dangling
            # winners — the engine replays exactly that order
            "WITH rev AS (SELECT l_suppkey, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS total FROM lineitem "
            f"WHERE l_shipdate >= TIMESTAMP '{R.Q15_DATE_LO}' "
            f"AND l_shipdate < TIMESTAMP '{R.Q15_DATE_HI}' "
            "GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total AS total_revenue_x10000, "
            "CAST(total AS DOUBLE) / 10000.0 AS total_revenue "
            "FROM supplier JOIN rev ON s_suppkey = l_suppkey "
            "WHERE total = (SELECT MAX(total) FROM rev) ORDER BY s_suppkey"
        ),
        "q13_customer_distribution": (
            # LEFT join keeps zero-order customers (c_count = 0 bucket);
            # the priority exclusion rides the JOIN condition so excluded
            # orders count as absent, not as dropped customers
            "WITH co AS (SELECT c_custkey, "
            "CAST(COUNT(o_orderkey) AS BIGINT) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            f"AND o_orderpriority <> '{R.Q13_EXCLUDED_PRIORITY}' "
            "GROUP BY c_custkey) "
            "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist "
            "FROM co GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
        ),
        "q19_discounted_revenue": (
            # three OR'd (brand, size, qty) branches — p_size stands in
            # for the reference's container list; grid + COALESCE as q6
            "WITH j AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem JOIN part ON p_partkey = l_partkey WHERE "
            + " OR ".join(
                f"(p_brand = '{b}' AND p_size BETWEEN {s_lo} AND {s_hi} "
                f"AND l_quantity BETWEEN {q_lo} AND {q_hi})"
                for b, s_lo, s_hi, q_lo, q_hi in R.Q19_BRANCHES
            )
            + ") "
            "SELECT CAST(COALESCE(SUM(rev), 0) AS BIGINT) AS revenue_x10000, "
            "CAST(COALESCE(SUM(rev), 0) AS DOUBLE) / 10000.0 AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines FROM j"
        ),
        "q7_volume_shipping": (
            # the cross-nation predicate compares nationKEYS (exactly what
            # the engine filters); revenue on the exact integer grid
            "WITH pair AS (SELECT n_nationkey, n_name FROM nation "
            f"WHERE n_name IN ('{R.Q7_NATION_A}', '{R.Q7_NATION_B}')), "
            "li AS (SELECT l_orderkey, l_suppkey, "
            "CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem "
            f"WHERE l_shipdate >= TIMESTAMP '{R.Q7_DATE_LO}' "
            f"AND l_shipdate < TIMESTAMP '{R.Q7_DATE_HI}'), "
            "j AS (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "li.l_year, li.rev FROM li "
            "JOIN supplier s ON s.s_suppkey = li.l_suppkey "
            "JOIN pair sn ON sn.n_nationkey = s.s_nationkey "
            "JOIN orders o ON o.o_orderkey = li.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN pair cn ON cn.n_nationkey = c.c_nationkey "
            "WHERE sn.n_nationkey <> cn.n_nationkey) "
            "SELECT supp_nation, cust_nation, l_year, "
            "CAST(SUM(rev) AS BIGINT) AS revenue_x10000, "
            "CAST(SUM(rev) AS DOUBLE) / 10000.0 AS revenue "
            "FROM j GROUP BY supp_nation, cust_nation, l_year "
            "ORDER BY supp_nation, cust_nation, l_year"
        ),
        "q8_market_share": (
            # share = the same IEEE division of the same exact int64 sums;
            # CASE total=0 -> 0.0 pinned on both sides
            "WITH li AS (SELECT l_orderkey, s_nationkey, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem "
            f"JOIN part ON p_partkey = l_partkey AND p_type = '{R.Q8_PART_TYPE}' "
            "JOIN supplier ON s_suppkey = l_suppkey), "
            "j AS (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) "
            "AS o_year, li.rev, "
            "CASE WHEN li.s_nationkey IN (SELECT n_nationkey FROM nation "
            f"WHERE n_name = '{R.Q8_TARGET_NATION}') THEN li.rev ELSE 0 END "
            "AS target_rev "
            "FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "WHERE c.c_nationkey IN (SELECT n_nationkey FROM nation "
            "JOIN region ON n_regionkey = r_regionkey "
            f"WHERE r_name = '{R.Q8_REGION}') "
            f"AND o.o_orderdate >= TIMESTAMP '{R.Q8_DATE_LO}' "
            f"AND o.o_orderdate < TIMESTAMP '{R.Q8_DATE_HI}') "
            "SELECT o_year, CAST(SUM(target_rev) AS BIGINT) AS target_x10000, "
            "CAST(SUM(rev) AS BIGINT) AS total_x10000, "
            "CASE WHEN SUM(rev) = 0 THEN 0.0 ELSE "
            "CAST(SUM(target_rev) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE) END "
            "AS mkt_share FROM j GROUP BY o_year ORDER BY o_year"
        ),
        "q9_product_profit": (
            # no partsupp in this schema: profit = revenue on the exact
            # grid; the dataflow (2 broadcast probes + 1 exchange) is the
            # parity target
            "WITH li AS (SELECT l_orderkey, s_nationkey, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS profit "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            f"AND p_name LIKE '%{R.Q9_NAME_SUBSTR}%' "
            "JOIN supplier ON s_suppkey = l_suppkey), "
            "j AS (SELECT n_name AS nation, "
            "CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year, profit "
            "FROM li JOIN orders ON o_orderkey = l_orderkey "
            "JOIN nation ON n_nationkey = s_nationkey) "
            "SELECT nation, o_year, CAST(SUM(profit) AS BIGINT) "
            "AS profit_x10000, CAST(SUM(profit) AS DOUBLE) / 10000.0 "
            "AS profit FROM j GROUP BY nation, o_year "
            "ORDER BY nation, o_year DESC"
        ),
        "q22_sales_opportunity": (
            # the avg threshold is never divided: integer
            # cross-multiplication (cents x n > sum) on both sides, so the
            # boundary customer cannot flip (and AVG()'s
            # implementation-defined accumulation is never evaluated)
            "WITH mem AS (SELECT c_custkey, n_name, "
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents "
            "FROM customer JOIN nation ON n_nationkey = c_nationkey "
            "WHERE n_name IN ("
            + ", ".join(f"'{n}'" for n in R.Q22_NATIONS)
            + ")), "
            "a AS (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM mem WHERE cents > 0), "
            "cand AS (SELECT mem.* FROM mem, a "
            "WHERE a.n > 0 AND mem.cents * a.n > a.s), "
            "quiet AS (SELECT cand.* FROM cand LEFT JOIN "
            "(SELECT DISTINCT o_custkey FROM orders) o "
            "ON o.o_custkey = cand.c_custkey WHERE o.o_custkey IS NULL) "
            "SELECT n_name AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust, "
            "CAST(SUM(cents) AS BIGINT) AS totacctbal_x100, "
            "CAST(SUM(cents) AS DOUBLE) / 100.0 AS totacctbal "
            "FROM quiet GROUP BY n_name ORDER BY n_name"
        ),
        "q2_min_cost_supplier": (
            # supply cost = MIN extended price on the exact cents grid
            # (no partsupp in this schema); the correlated per-part MIN
            # returns ALL ties, exactly as the reference Q2 does
            "WITH rs AS (SELECT s_suppkey, s_name, n_name FROM supplier "
            "JOIN nation ON n_nationkey = s_nationkey "
            "JOIN region ON r_regionkey = n_regionkey "
            f"WHERE r_name = '{R.Q2_REGION}'), "
            "pp AS (SELECT p_partkey FROM part "
            f"WHERE p_type = '{R.Q2_P_TYPE}' AND p_size >= {R.Q2_P_SIZE_MIN}), "
            "cost AS (SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, "
            "CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
            "AS cost_x100 FROM lineitem "
            "JOIN pp ON pp.p_partkey = l_partkey "
            "JOIN rs ON rs.s_suppkey = l_suppkey GROUP BY 1, 2) "
            "SELECT c.p_partkey, c.s_suppkey, rs.s_name, rs.n_name AS nation, "
            "c.cost_x100, CAST(c.cost_x100 AS DOUBLE) / 100.0 AS cost "
            "FROM cost c JOIN rs ON rs.s_suppkey = c.s_suppkey "
            "WHERE c.cost_x100 = (SELECT MIN(c2.cost_x100) FROM cost c2 "
            "WHERE c2.p_partkey = c.p_partkey) "
            "ORDER BY c.p_partkey, c.s_suppkey"
        ),
        "q11_important_parts": (
            # the fraction threshold is integer cross-multiplication
            # (value x DEN > total x NUM) — no float share ever computed,
            # so the boundary part cannot flip (the q22 trick)
            "WITH v AS (SELECT l_partkey AS p_partkey, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
            "AS value_x100 FROM lineitem "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            f"WHERE n_name = '{R.Q11_NATION}' GROUP BY 1), "
            "t AS (SELECT CAST(COALESCE(SUM(value_x100), 0) AS BIGINT) "
            "AS total FROM v) "
            "SELECT p_partkey, value_x100, "
            "CAST(value_x100 AS DOUBLE) / 100.0 AS value FROM v, t "
            f"WHERE value_x100 * {R.Q11_FRAC_DEN} > total * {R.Q11_FRAC_NUM} "
            "ORDER BY value_x100 DESC, p_partkey"
        ),
        "q12_late_lines_by_class": (
            # late = shipped > N days after the order date (no
            # commit/receipt dates in this schema); returnflag stands in
            # for shipmode; integer counts are exact by construction
            "SELECT l_returnflag, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ("
            + ", ".join(f"'{p}'" for p in R.Q12_HIGH_PRIORITIES)
            + ") THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ("
            + ", ".join(f"'{p}'" for p in R.Q12_HIGH_PRIORITIES)
            + ") THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            f"WHERE l_shipdate >= TIMESTAMP '{R.Q12_DATE_LO}' "
            f"AND l_shipdate < TIMESTAMP '{R.Q12_DATE_HI}' "
            f"AND l_shipdate > o_orderdate + INTERVAL {R.Q12_LATE_DAYS} DAY "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "q20_majority_suppliers": (
            # strict majority as integer cross-multiplication on the x100
            # quantity grid (2 x supplier qty > part total)
            "WITH q AS (SELECT l_partkey, l_suppkey, "
            "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) "
            "AS q100 FROM lineitem JOIN part ON p_partkey = l_partkey "
            f"WHERE p_name LIKE '%{R.Q20_NAME_SUBSTR}%' "
            f"AND l_shipdate >= TIMESTAMP '{R.Q20_DATE_LO}' "
            f"AND l_shipdate < TIMESTAMP '{R.Q20_DATE_HI}' GROUP BY 1, 2), "
            "tot AS (SELECT l_partkey, CAST(SUM(q100) AS BIGINT) AS tq "
            "FROM q GROUP BY 1), "
            "win AS (SELECT q.l_suppkey, CAST(COUNT(*) AS BIGINT) "
            "AS n_parts_major FROM q JOIN tot ON tot.l_partkey = q.l_partkey "
            "WHERE 2 * q.q100 > tot.tq GROUP BY 1) "
            "SELECT s_suppkey, s_name, n_name AS nation, n_parts_major "
            "FROM win JOIN supplier ON s_suppkey = win.l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey ORDER BY s_suppkey"
        ),
        "q21_waiting_suppliers": (
            # the EXISTS / NOT-EXISTS pair as integer algebra over the
            # DISTINCT (order, supplier, any-late) pair table:
            # sum(late x suppkey) IS the lone late suppkey when n_late = 1
            "WITH pair AS (SELECT l_orderkey, l_suppkey, "
            "MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL "
            f"{R.Q21_LATE_DAYS} DAY THEN 1 ELSE 0 END) AS late "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE o_orderstatus = 'F' GROUP BY 1, 2), "
            "o AS (SELECT l_orderkey, COUNT(*) AS n_supps, "
            "SUM(late) AS n_late, SUM(late * l_suppkey) AS lsupp "
            "FROM pair GROUP BY 1), "
            "w AS (SELECT lsupp AS s_suppkey, CAST(COUNT(*) AS BIGINT) "
            "AS numwait FROM o WHERE n_late = 1 AND n_supps >= 2 GROUP BY 1) "
            "SELECT s.s_suppkey, s_name, n_name AS nation, numwait "
            "FROM w JOIN supplier s ON s.s_suppkey = w.s_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "ORDER BY numwait DESC, s.s_suppkey"
        ),
        "q_global_rank_orders": (
            # the terasort shape: every order's global ROW_NUMBER under a
            # total order (double compare + integer tiebreak — the engine
            # sorts the RAW double, never the rounded grid)
            "SELECT o_orderkey, CAST(ROW_NUMBER() OVER "
            "(ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) "
            "AS global_rank FROM orders"
        ),
        "q_fk_audit": (
            # per-ROW violation counts (a key missing its dimension row
            # counts once per lineitem line); the DISTINCT subqueries pin
            # that multiplicity even if a dimension ever carried dup keys
            "SELECT check_name, n_violations FROM ("
            "SELECT 'discount_out_of_range' AS check_name, "
            "CAST(COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations FROM lineitem "
            "UNION ALL SELECT 'fk_order', CAST(COUNT(*) AS BIGINT) "
            "FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey "
            "FROM orders) o ON o.o_orderkey = l.l_orderkey "
            "WHERE o.o_orderkey IS NULL "
            "UNION ALL SELECT 'fk_part', CAST(COUNT(*) AS BIGINT) "
            "FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey "
            "FROM part) p ON p.p_partkey = l.l_partkey "
            "WHERE p.p_partkey IS NULL "
            "UNION ALL SELECT 'fk_supp', CAST(COUNT(*) AS BIGINT) "
            "FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey "
            "FROM supplier) s ON s.s_suppkey = l.l_suppkey "
            "WHERE s.s_suppkey IS NULL "
            "UNION ALL SELECT 'qty_nonpositive', "
            "CAST(COALESCE(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 "
            "END), 0) AS BIGINT) FROM lineitem "
            "UNION ALL SELECT 'tax_negative', "
            "CAST(COALESCE(SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END), 0) "
            "AS BIGINT) FROM lineitem"
            ") ORDER BY check_name"
        ),
        "s_pca": _pca_oracle(),
        "m_image_neardup": _image_neardup_oracle(),
        "m_image_dup_clusters": _image_dup_clusters_oracle(),
        "m_audio_dup_clusters": _cluster_walk_oracle(_audio_neardup_rows()),
        "m_video_dup_clusters": _cluster_walk_oracle(_video_neardup_rows()),
        "q_decay_user_engagement": (
            # every weight 2^-k (k in [0,30]) is a dyadic rational on the
            # 2^-30 grid and per-user sums stay < 2^23 terms, so each
            # float64 addition is EXACT and order-independent — no ROUND
            # needed on either side (see the pipeline docstring); floor,
            # not //, so pre-epoch timestamps land in the correct day
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "SUM(power(2.0, -GREATEST(0, LEAST(30, 19754 - "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT))))) "
            "AS score FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "q_sliding_window_counts": (
            # each event replicated into its 6 covering hop buckets; the
            # window id is the exact int64 start-of-window epoch-us (floor
            # semantics, so pre-epoch events take negative window starts)
            "WITH e AS (SELECT CAST(floor(epoch_us(ts) / 3600000000.0) "
            "AS BIGINT) AS b, value FROM events), "
            "w AS (SELECT (e.b - g.i) * 3600000000 AS win_start_us, value "
            "FROM e CROSS JOIN (SELECT unnest(range(6)) AS i) g) "
            "SELECT win_start_us, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "ROUND(SUM(value), 2) AS sum_value "
            "FROM w GROUP BY win_start_us ORDER BY win_start_us"
        ),
        "q_kmv_distinct_users": (
            # the bottom-k state replayed verbatim: same md5_number_lower
            # hash on the same 2^53 grid, k-th order statistic via one
            # window, estimate (k-1)/u_k only when >= k distinct hashes
            # exist (below that the sketch is the exact count); integer
            # digests (n_kept, kth_hash) ride the compare
            "WITH d AS (SELECT DISTINCT event_type, "
            "md5_number_lower(CAST(user_id AS VARCHAR) || ':kmv9') "
            "% 9007199254740992 AS hv FROM events), "
            "r AS (SELECT event_type, hv, ROW_NUMBER() OVER "
            "(PARTITION BY event_type ORDER BY hv) AS rn FROM d), "
            "g AS (SELECT event_type, COUNT(*) AS n FROM d "
            "GROUP BY event_type), "
            "kth AS (SELECT r.event_type AS et, r.hv AS kth_hash FROM r "
            "JOIN g ON r.event_type = g.event_type "
            "WHERE r.rn = LEAST(g.n, 64)) "
            "SELECT g.event_type, CAST(LEAST(g.n, 64) AS BIGINT) AS n_kept, "
            "CAST(kth.kth_hash AS BIGINT) AS kth_hash, "
            "CASE WHEN g.n >= 64 THEN "
            "ROUND(CAST(63 AS DOUBLE) * CAST(9007199254740992 AS DOUBLE) "
            "/ (kth.kth_hash + 1.0), 4) "
            "ELSE CAST(LEAST(g.n, 64) AS DOUBLE) END AS est "
            "FROM g JOIN kth ON g.event_type = kth.et "
            "ORDER BY g.event_type"
        ),
        "q_butterfly_count": (
            # the oracle always enumerates wedges from the part side; the
            # engine picks the cheaper side — the butterfly count is
            # side-invariant, so the outputs agree by construction
            "WITH e AS (SELECT DISTINCT o_custkey AS u, l_partkey AS p "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), "
            "du AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u), "
            "dp AS (SELECT p, COUNT(*) AS d FROM e GROUP BY p), "
            "pc AS (SELECT a.u AS u1, b.u AS u2, COUNT(*) AS c "
            "FROM e a JOIN e b ON a.p = b.p AND a.u < b.u GROUP BY 1, 2) "
            "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges, "
            "(SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) "
            "FROM du) AS n_wedges_user, "
            "(SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) "
            "FROM dp) AS n_wedges_part, "
            "(SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) "
            "FROM pc) AS n_butterflies"
        ),
        "s_ann_rerank": _ann_rerank_oracle(),
        "m_audio_neardup": _audio_neardup_oracle(),
        "m_video_neardup": _video_neardup_oracle(),
        "s_ood_mahalanobis": _ood_oracle(),
        "t_containment_dupes": (
            # ALL-PAIRS asymmetric-containment ground truth over the SAME
            # 3-token-shingle space as t_minhash_pairs; ORDERED pairs
            # (mutual near-identity legitimately yields both directions);
            # the threshold is the integer cross-multiplication 10*inter
            # >= 9*size_a — never a float compare at the boundary
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t "
            "FROM documents), "
            "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t) - 1), "
            "i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s "
            "FROM toks WHERE len(t) > 0), "
            # sparse all-pairs: explode distinct shingles and count the
            # gram join — |intersection| directly, never the dense
            # docs x docs list_intersect grid (2.7 s vs >9 min at sf0.1)
            "g AS (SELECT doc_id, unnest(s) AS gram FROM sh), "
            "inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, "
            "COUNT(*) AS n_inter FROM g x JOIN g y ON x.gram = y.gram "
            "AND x.doc_id <> y.doc_id GROUP BY 1, 2), "
            "sz AS (SELECT doc_id, len(s) AS size_a FROM sh) "
            "SELECT i.doc_a, i.doc_b, CAST(i.n_inter AS BIGINT) AS n_inter, "
            "CAST(sz.size_a AS BIGINT) AS size_a, "
            "ROUND(i.n_inter::DOUBLE / sz.size_a, 4) AS containment "
            "FROM inter i JOIN sz ON sz.doc_id = i.doc_a "
            "WHERE 10 * i.n_inter >= 9 * sz.size_a "
            "ORDER BY doc_a, doc_b"
        ),
        "q_frequent_pairs": (
            # baskets = distinct parts per order; pair support counted
            # over unordered (a < b) pairs, integer end to end
            "WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "pr AS (SELECT x.l_partkey AS a, y.l_partkey AS b FROM b x "
            "JOIN b y ON x.l_orderkey = y.l_orderkey "
            "AND x.l_partkey < y.l_partkey) "
            "SELECT a AS part_a, b AS part_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM pr GROUP BY a, b HAVING COUNT(*) >= 2 "
            "ORDER BY part_a, part_b"
        ),
        "q_markov_transitions": (
            # per-user LEAD over the deterministic (ts, event_id) order;
            # the engine's chunk stitch is invisible by construction
            "WITH s AS (SELECT user_id, event_type, LEAD(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
            "SELECT event_type AS prev_type, nxt AS next_type, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2 "
            "ORDER BY prev_type, next_type"
        ),
        "q_skyline_parts": (
            # standard skyline dominance: <= / >= with at least one
            # strict; ties on both axes survive together
            "SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, "
            "p_retailprice FROM part p WHERE NOT EXISTS ("
            "SELECT 1 FROM part q "
            "WHERE q.p_retailprice <= p.p_retailprice "
            "AND q.p_size >= p.p_size "
            "AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)) "
            "ORDER BY p_partkey"
        ),
        "t_quality_classifier": (
            # the hashed-weight model replayed verbatim: same md5-lower-64
            # bucket hash, same integer weight table (md5('qw:b') % 21 -
            # 10), same \\s+ lower tokenization; zero-token docs score 0
            # and keep
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w "
            "FROM documents), "
            "wt AS (SELECT i, CAST(md5_number_lower('qw:' || "
            "CAST(i AS VARCHAR)) % 21 AS BIGINT) - 10 AS wt "
            "FROM (SELECT unnest(range(1024)) AS i)), "
            "sc AS (SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(wt.wt) AS s "
            "FROM toks t JOIN wt ON wt.i = md5_number_lower(t.w) % 1024 "
            "GROUP BY t.doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) "
            "AS n_tokens, CAST(COALESCE(sc.s, 0) AS BIGINT) AS score, "
            "CAST(CASE WHEN COALESCE(sc.s, 0) >= 0 THEN 1 ELSE 0 END "
            "AS BIGINT) AS keep "
            "FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id "
            "ORDER BY d.doc_id"
        ),
        "q_user_entropy": (
            # same expression SHAPE as the engine (log2(tot) - s/tot) so
            # exact dyadic cases are bit-equal and irrational ones agree
            # to an ulp — and no true value sits on a half-milli boundary
            # (dyadic rationals never equal (2k+1)/2000)
            "WITH c AS (SELECT user_id, event_type, COUNT(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "u AS (SELECT user_id, SUM(n) AS tot, "
            "SUM(n * log2(CAST(n AS DOUBLE))) AS s FROM c GROUP BY 1) "
            "SELECT user_id, CAST(tot AS BIGINT) AS n_events, "
            "CAST(FLOOR((log2(CAST(tot AS DOUBLE)) - s / tot) * 1000 "
            "+ 0.5) AS BIGINT) AS entropy_x1e3 "
            "FROM u ORDER BY user_id"
        ),
        "t_keyword_extraction": (
            # integer ranking replayed verbatim: idf quantized ONCE to
            # micro-units (ln transcendental -> never on the boundary),
            # score = tf * idf6 exact int64, tie-break (score DESC, word
            # ASC) on binary collation == the engine's codepoint order
            "WITH w AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS word FROM documents), "
            "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents), "
            "df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w "
            "GROUP BY word), "
            "idf AS (SELECT word, CAST(FLOOR(ln((SELECT n_docs FROM n) "
            "/ df) * 1000000 + 0.5) AS BIGINT) AS idf6 FROM df), "
            "tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w "
            "GROUP BY doc_id, word), "
            "sc AS (SELECT t.doc_id, t.word, t.tf, t.tf * i.idf6 AS score "
            "FROM tf t JOIN idf i USING(word) WHERE t.tf * i.idf6 > 0), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, word ASC) AS rn FROM sc) "
            "SELECT doc_id, CAST(rn AS BIGINT) AS kw_rank, word, "
            "CAST(tf AS BIGINT) AS tf, score AS score_x1e6 "
            "FROM r WHERE rn <= 3 ORDER BY doc_id, kw_rank"
        ),
        "q_late_events_audit": (
            # arrival order = event_id; the exclusive running max over
            # arrival order IS the watermark; tu < NULL is NULL so the
            # user's first arrival never counts late
            "WITH s AS (SELECT user_id, epoch_us(ts) AS tu, "
            "MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM events) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(COALESCE(SUM(CASE WHEN tu < wm THEN 1 END), 0) AS BIGINT) "
            "AS n_late, "
            "CAST(COALESCE(MAX(CASE WHEN tu < wm THEN wm - tu END), 0) "
            "AS BIGINT) AS max_delay_us "
            "FROM s GROUP BY user_id ORDER BY user_id"
        ),
        "t_cdc_dedup": (
            # chunk boundary AFTER every token with md5 % 16 == 0 (pure
            # content condition); chunk identity = md5 of the joined
            # chunk text — each side hashes its own chunks, identical
            # text gives identical occurrence counts by construction
            "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS ws FROM documents), "
            "toks AS (SELECT doc_id, t.w AS word, t.i AS pos FROM d, "
            "LATERAL (SELECT unnest(ws) AS w, generate_subscripts(ws, 1) "
            "AS i) t), "
            "c AS (SELECT doc_id, pos, word, COALESCE(SUM(CASE WHEN "
            "md5_number_lower(word) % 16 = 0 THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING), 0) AS cid FROM toks), "
            "ch AS (SELECT doc_id, cid, md5(string_agg(word, ' ' "
            "ORDER BY pos)) AS h, COUNT(*) AS n_tok FROM c "
            "GROUP BY doc_id, cid), "
            "g AS (SELECT h, COUNT(*) AS c FROM ch GROUP BY h), "
            "per AS (SELECT ch.doc_id, COUNT(*) AS n_chunks, "
            "SUM(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS n_dup_chunks, "
            "SUM(CASE WHEN g.c >= 2 THEN ch.n_tok ELSE 0 END) AS "
            "n_dup_tokens FROM ch JOIN g USING (h) GROUP BY ch.doc_id) "
            "SELECT doc.doc_id, CAST(COALESCE(per.n_chunks, 0) AS BIGINT) "
            "AS n_chunks, CAST(COALESCE(per.n_dup_chunks, 0) AS BIGINT) "
            "AS n_dup_chunks, CAST(COALESCE(per.n_dup_tokens, 0) AS BIGINT) "
            "AS n_dup_tokens FROM documents doc LEFT JOIN per "
            "ON doc.doc_id = per.doc_id ORDER BY doc.doc_id"
        ),
        # rows-only (genuinely non-SQL-expressible): s_kmeans ONLY — the
        # iterative Lloyd loop; an independent numpy reference
        # implementation in the tests asserts bit-equal assignments, and
        # its E-step has the exact-oracle s_kmeans_init_assign companion.
        # Round 5 upgraded the last four others: t_bpe_train (golden merge
        # VALUES from an independent word-count pass) and the three ANN
        # recall reports (candidate CTEs joined against the exact-top-k
        # CTE — see _RECALL_CORE).
        "t_editdist_dupes": (
            # DuckDB levenshtein edits BYTES (an 'é'→'a' swap costs 2);
            # the engine's banded DP and deletion neighborhoods run on
            # UTF-8 bytes for exactly this parity.  The quadratic join is
            # over DISTINCT names — the same universe the SymSpell
            # neighborhoods index — so the oracle stays tiny even when
            # the part table is not.
            "WITH d AS (SELECT p_name AS name, COUNT(*) AS n FROM part "
            "GROUP BY p_name), "
            "pr AS (SELECT a.name AS name_a, b.name AS name_b, "
            "levenshtein(a.name, b.name) AS dist, a.n AS n_a, b.n AS n_b "
            "FROM d a JOIN d b ON a.name < b.name) "
            "SELECT name_a, name_b, CAST(dist AS BIGINT) AS dist, "
            "CAST(n_a AS BIGINT) AS n_parts_a, CAST(n_b AS BIGINT) AS n_parts_b "
            "FROM pr WHERE dist <= 2 ORDER BY name_a, name_b"
        ),
        "s_dbscan": (
            # epsilon graph on the raw-cosine threshold (s_embedding_dupes
            # convention), core = degree >= MIN_PTS-1, components via the
            # same recursive min-label walk as t_dup_components (seeded
            # from CORE nodes so an isolated core roots its own cluster),
            # border = MIN core-neighbor component — the deterministic
            # tie rule the engine implements
            "WITH RECURSIVE p0 AS (SELECT a.vec_id AS va, b.vec_id AS vb "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.35), "
            "nb AS (SELECT va AS node, vb AS nbr FROM p0 "
            "UNION ALL SELECT vb, va FROM p0), "
            "deg AS (SELECT node, COUNT(*) AS d FROM nb GROUP BY node), "
            "core AS (SELECT node FROM deg WHERE d >= 3), "
            "e0 AS (SELECT p0.va, p0.vb FROM p0 "
            "JOIN core ca ON ca.node = p0.va JOIN core cb ON cb.node = p0.vb), "
            "e AS (SELECT va AS u, vb AS v FROM e0 "
            "UNION ALL SELECT vb, va FROM e0), "
            "walk(node, lab) AS (SELECT node, node FROM core "
            "UNION SELECT e.v, w.lab FROM walk w JOIN e ON e.u = w.node), "
            "comp AS (SELECT node, MIN(lab) AS comp FROM walk GROUP BY node), "
            "border AS (SELECT nb.node, MIN(comp.comp) AS comp "
            "FROM nb JOIN core c ON c.node = nb.nbr "
            "JOIN comp ON comp.node = nb.nbr "
            "WHERE nb.node NOT IN (SELECT node FROM core) GROUP BY nb.node) "
            "SELECT v.vec_id, "
            "CAST(COALESCE(comp.comp, border.comp, -1) AS BIGINT) AS cluster, "
            "CASE WHEN comp.node IS NOT NULL THEN 'core' "
            "WHEN border.node IS NOT NULL THEN 'border' ELSE 'noise' END AS role "
            "FROM embeddings v LEFT JOIN comp ON comp.node = v.vec_id "
            "LEFT JOIN border ON border.node = v.vec_id ORDER BY v.vec_id"
        ),
        "q_cusum_changepoint": (
            # the scan statistic cleared of division: |n*prefix_k - k*T|
            # on the cents grid is an exact integer; HUGEINT here, int64
            # + overflow guard in the engine.  Ordering (ts, event_id) is
            # the composite unique key; QUALIFY replays the engine's
            # (stat DESC, k ASC) merge rule
            "WITH o AS (SELECT event_type, event_id, "
            "ROW_NUMBER() OVER w AS k, "
            "SUM(CAST(ROUND(value*100, 0) AS BIGINT)) OVER w AS prefix, "
            "COUNT(*) OVER (PARTITION BY event_type) AS n, "
            "SUM(CAST(ROUND(value*100, 0) AS BIGINT)) "
            "OVER (PARTITION BY event_type) AS total "
            "FROM events WINDOW w AS (PARTITION BY event_type "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW)), "
            "s AS (SELECT event_type, event_id, k, n, "
            "abs(CAST(n AS HUGEINT) * prefix - CAST(k AS HUGEINT) * total) "
            "AS stat FROM o) "
            "SELECT event_type, CAST(n AS BIGINT) AS n_events, "
            "CAST(k AS BIGINT) AS cp_k, CAST(event_id AS BIGINT) AS cp_event_id, "
            "CAST(stat AS BIGINT) AS cusum_stat FROM s "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type "
            "ORDER BY stat DESC, k ASC) = 1 ORDER BY event_type"
        ),        "q_date_spine_fill": (
            # the row-GENERATION direction: the spine is unnest(
            # generate_series) per user (lateral table-function args are
            # unsupported; the scalar list form isn't), left-joined back
            # to the exact per-day counts
            "WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) "
            "AS day FROM events), "
            "b AS (SELECT user_id, MIN(day) mn, MAX(day) mx FROM e "
            "GROUP BY user_id), "
            "spine AS (SELECT user_id, CAST(unnest(generate_series("
            "CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) "
            "AS DATE) AS day FROM b), "
            "c AS (SELECT user_id, day, COUNT(*) n FROM e "
            "GROUP BY user_id, day) "
            "SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day, "
            "CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events "
            "FROM spine s LEFT JOIN c ON c.user_id = s.user_id "
            "AND c.day = s.day ORDER BY s.user_id, day"
        ),
        "q_mad_outliers": (
            # median()/mad() are interpolated quantile_cont in DuckDB —
            # the engine replays the same formula over its distinct-value
            # histogram of the RAW doubles, so the unrounded fence compare
            # abs(x-med) > 3*mad is bit-identical on both sides; only the
            # two report columns round (half-away, both sides)
            "WITH s AS (SELECT event_type, COUNT(*) n, median(value) AS med, "
            "mad(value) AS mad FROM events GROUP BY event_type), "
            "o AS (SELECT e.event_type, "
            "COUNT(*) FILTER (abs(e.value - s.med) > 3*s.mad) AS n_out "
            "FROM events e JOIN s ON s.event_type = e.event_type "
            "GROUP BY e.event_type) "
            "SELECT s.event_type, CAST(s.n AS BIGINT) AS n_events, "
            "ROUND(s.med, 6) AS med_value, ROUND(s.mad, 6) AS mad_value, "
            "CAST(o.n_out AS BIGINT) AS n_outliers "
            "FROM s JOIN o ON o.event_type = s.event_type "
            "ORDER BY s.event_type"
        ),
        "q_max_drawdown": (
            # running-max prefix scan on the cents grid: dd = runmax -
            # cents is an exact integer; QUALIFY replays the engine's
            # (dd DESC, k ASC) merge rule
            "WITH o AS (SELECT event_type, event_id, "
            "CAST(ROUND(value*100, 0) AS BIGINT) cents, "
            "ROW_NUMBER() OVER w AS k, "
            "MAX(CAST(ROUND(value*100, 0) AS BIGINT)) OVER w AS runmax, "
            "COUNT(*) OVER (PARTITION BY event_type) AS n "
            "FROM events WINDOW w AS (PARTITION BY event_type "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW)) "
            "SELECT event_type, CAST(n AS BIGINT) n_events, "
            "CAST(runmax - cents AS BIGINT) dd_cents, CAST(k AS BIGINT) dd_k, "
            "CAST(event_id AS BIGINT) dd_event_id "
            "FROM o QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type "
            "ORDER BY (runmax - cents) DESC, k ASC) = 1 ORDER BY event_type"
        ),
        "t_pmi_collocations": (
            # PMI order == order of the rational ratio N*c/(cL*cR): the
            # rank key is the exact HUGEINT floor(1e6*c*N/(cL*cR)) so no
            # float decides the cut; pmi_x1e3 rounds ln() of the SAME
            # IEEE double expression the engine evaluates
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "bg AS (SELECT "
            "unnest(list_transform(generate_series(1, len(w) - 1), "
            "i -> w[i])) AS w1, "
            "unnest(list_transform(generate_series(1, len(w) - 1), "
            "i -> w[i+1])) AS w2 FROM toks WHERE len(w) >= 2), "
            "c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2), "
            "cl AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS clc "
            "FROM c2 GROUP BY w1), "
            "cr AS (SELECT w2, CAST(SUM(c) AS BIGINT) AS crc "
            "FROM c2 GROUP BY w2), "
            "nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c2) "
            "SELECT c2.w1, c2.w2, CAST(c2.c AS BIGINT) AS c_pair, "
            "cl.clc AS c_left, cr.crc AS c_right, "
            "CAST((1000000::HUGEINT * c2.c * nt.n) // "
            "(CAST(cl.clc AS HUGEINT) * cr.crc) AS BIGINT) AS ratio_x1e6, "
            "CAST(FLOOR(ln(CAST(c2.c * nt.n AS DOUBLE) / "
            "CAST(cl.clc * cr.crc AS DOUBLE)) * 1000 + 0.5) AS BIGINT) "
            "AS pmi_x1e3 "
            "FROM c2 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN nt "
            "WHERE c2.c >= 3 "
            "ORDER BY ratio_x1e6 DESC, c2.w1, c2.w2 LIMIT 50"
        ),
        "q_benford_audit": (
            # first digit via substr on the exact cents integer (no float
            # log10); expected/delta are BIGINT products against the
            # literal micro-probability grid (same nine constants the
            # engine embeds — they sum to exactly 1e6)
            "WITH v AS (SELECT CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) "
            "AS cents FROM lineitem), "
            "dg AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) "
            "AS BIGINT) AS digit FROM v WHERE cents > 0), "
            "obs AS (SELECT digit, COUNT(*) AS observed FROM dg "
            "GROUP BY digit), "
            "nt AS (SELECT COUNT(*) AS n FROM dg), "
            "p (digit, p_x1e6) AS (VALUES (1, 301030), (2, 176091), "
            "(3, 124939), (4, 96910), (5, 79181), (6, 66947), (7, 57992), "
            "(8, 51153), (9, 45757)) "
            "SELECT CAST(p.digit AS BIGINT) AS digit, "
            "CAST(COALESCE(obs.observed, 0) AS BIGINT) AS observed, "
            "CAST(nt.n * p.p_x1e6 AS BIGINT) AS expected_x1e6, "
            "CAST(COALESCE(obs.observed, 0) * 1000000 - nt.n * p.p_x1e6 "
            "AS BIGINT) AS delta_x1e6 "
            "FROM p LEFT JOIN obs ON obs.digit = p.digit CROSS JOIN nt "
            "ORDER BY p.digit"
        ),
        "s_mmr_diverse_topk": _mmr_oracle(),
        "m_patchify": _patchify_oracle(),
        "t_fuzzy_decontaminate": (
            # ALL-PAIRS bipartite ground truth: exact 3-token-shingle
            # Jaccard over every (train, bench) pair — same shingle CTE
            # as t_minhash_pairs, split on the t_decontaminate mod rule;
            # the engine's broadcast banding must reach full recall here
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t "
            "FROM documents), "
            "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t) - 1), "
            "i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s "
            "FROM toks WHERE len(t) > 0), "
            "pairs AS (SELECT a.doc_id AS doc_id, b.doc_id AS bench_doc, "
            "len(list_intersect(a.s, b.s)) AS inter, len(a.s) + len(b.s) AS tot "
            "FROM sh a JOIN sh b ON a.doc_id % 97 != 0 AND b.doc_id % 97 = 0) "
            "SELECT doc_id, bench_doc, "
            "ROUND(inter::DOUBLE / (tot - inter), 4) AS jaccard "
            "FROM pairs WHERE tot > inter "
            "AND inter::DOUBLE / (tot - inter) >= 0.8 "
            "ORDER BY doc_id, bench_doc"
        ),
        "q_gini_revenue": (
            # Gini over per-customer revenue, integer-exact: cents-grid
            # revenues, HUGEINT rank-weighted sum (ties are S-invariant,
            # so ROW_NUMBER's arbitrary tie order matches the engine's
            # in-partition sort), one integer cross-multiplied floor
            "WITH rev AS (SELECT o_custkey, "
            "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS v "
            "FROM orders GROUP BY o_custkey), "
            "ranked AS (SELECT CAST(v AS HUGEINT) AS v, "
            "CAST(ROW_NUMBER() OVER (ORDER BY v) AS HUGEINT) AS rn "
            "FROM rev), "
            "agg AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(v) AS HUGEINT) AS t, CAST(SUM(rn * v) AS HUGEINT) AS s "
            "FROM ranked) "
            "SELECT CAST(n AS BIGINT) AS n_customers, "
            "CAST(t AS BIGINT) AS total_cents, "
            "CAST((1000000000 * (2 * s - (n + 1) * t)) // (n * t) AS BIGINT) "
            "AS gini_x1e9 "
            "FROM agg WHERE n > 0 AND t > 0"
        ),
        "t_webdataset_shards": (
            # the tar-sink manifest replayed in SQL: same salted-hash
            # shard rule (md5_number_lower convention), utf-8 byte
            # lengths, and exact membership via the ordered name digest
            "WITH n AS (SELECT COUNT(*) AS c FROM documents), "
            "a AS (SELECT doc_id, text, CAST(md5_number_lower("
            f"'{'wds:'}' || CAST(doc_id AS VARCHAR)) % GREATEST("
            "(SELECT (c + 999) // 1000 FROM n), 1) AS BIGINT) AS shard_id "
            "FROM documents) "
            "SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COALESCE(SUM(octet_length(encode(text))), 0) AS BIGINT) "
            "AS text_bytes, "
            "md5(string_agg(printf('%012d.txt', doc_id), ',' "
            "ORDER BY doc_id)) AS members_md5 "
            "FROM a GROUP BY shard_id ORDER BY shard_id"
        ),
        "t_wds_roundtrip": (
            # sink→source identity: the engine digests what came BACK
            # through the tar loader; the oracle digests the ORIGINAL
            # table — equality certifies the whole archive path
            "SELECT doc_id, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "md5(text) AS text_md5 FROM documents ORDER BY doc_id"
        ),
        "t_rouge_report": (
            # the fuzzy-flagged pairs (same all-pairs Jaccard CTE as
            # t_fuzzy_decontaminate) scored by MULTISET bigram overlap:
            # I = SUM(LEAST(c_a, c_b)); p/r/f are floored scaled
            # rationals; the inner join on tot drops bigram-less sides
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t "
            "FROM documents), "
            "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t) - 1), "
            "i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS s "
            "FROM toks WHERE len(t) > 0), "
            "pairs AS (SELECT a.doc_id AS doc_id, b.doc_id AS bench_doc "
            "FROM sh a JOIN sh b ON a.doc_id % 97 != 0 AND b.doc_id % 97 = 0 "
            "WHERE len(a.s) + len(b.s) > len(list_intersect(a.s, b.s)) "
            "AND len(list_intersect(a.s, b.s))::DOUBLE / "
            "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8), "
            "big AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM "
            "(SELECT doc_id, unnest(list_transform(range(1, len(t)), "
            "i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g "
            "FROM toks WHERE len(t) >= 2) GROUP BY doc_id, g), "
            "tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n "
            "FROM big GROUP BY doc_id), "
            # NB: DuckDB LEAST IGNORES NULLs (LEAST(a.c, NULL) = a.c),
            # so unmatched train grams would leak in without the CASE
            "inter AS (SELECT p.doc_id, p.bench_doc, "
            "CAST(COALESCE(SUM(CASE WHEN b.c IS NULL THEN 0 "
            "ELSE LEAST(a.c, b.c) END), 0) AS BIGINT) AS i "
            "FROM pairs p "
            "LEFT JOIN big a ON a.doc_id = p.doc_id "
            "LEFT JOIN big b ON b.doc_id = p.bench_doc AND b.g = a.g "
            "GROUP BY p.doc_id, p.bench_doc) "
            "SELECT i.doc_id, i.bench_doc, i.i AS inter_c, "
            "CAST((1000000 * i.i) // ta.n AS BIGINT) AS p_x1e6, "
            "CAST((1000000 * i.i) // tb.n AS BIGINT) AS r_x1e6, "
            "CAST((2000000 * i.i) // (ta.n + tb.n) AS BIGINT) AS f_x1e6 "
            "FROM inter i "
            "JOIN tot ta ON ta.doc_id = i.doc_id "
            "JOIN tot tb ON tb.doc_id = i.bench_doc "
            "ORDER BY i.doc_id, i.bench_doc"
        ),
        "q_csv_roundtrip": (
            # the original table's projection — equality with the
            # CSV-written-and-read-back engine side certifies quoting,
            # null-vs-empty, unicode, and exact double round-trip
            "SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "user_id, event_type, value, props "
            "FROM events ORDER BY event_id"
        ),
        "q_ipc_roundtrip": (
            # same identity projection as q_csv_roundtrip — IPC carries
            # doubles/timestamps natively, so the match certifies the
            # sink/source framing with no conversion pinning at all
            "SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "user_id, event_type, value, props "
            "FROM events ORDER BY event_id"
        ),
        "t_dataset_card": (
            # every published number is an integer (mean is the floored
            # cross-product); dup-rate denominator = exact distinct md5
            "WITH m AS ("
            "SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value "
            "FROM documents "
            "UNION ALL SELECT 'n_distinct_texts', "
            "CAST(COUNT(DISTINCT md5(text)) AS BIGINT) FROM documents "
            "UNION ALL SELECT 'total_chars', "
            "CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM documents "
            "UNION ALL SELECT 'mean_chars_x100', "
            "CAST(CASE WHEN COUNT(*) = 0 THEN 0 ELSE "
            "(COALESCE(SUM(n_chars), 0) * 100) // COUNT(*) END AS BIGINT) "
            "FROM documents "
            "UNION ALL SELECT 'lang:' || lang, CAST(COUNT(*) AS BIGINT) "
            "FROM documents WHERE lang IS NOT NULL GROUP BY lang "
            "UNION ALL SELECT 'source:' || source, CAST(COUNT(*) AS BIGINT) "
            "FROM documents WHERE source IS NOT NULL GROUP BY source) "
            "SELECT metric, value FROM m ORDER BY metric"
        ),
        "q_auc_purchase_value": (
            # exact Mann-Whitney with tie correction: 2U stays integer
            # (ties contribute the un-divided n_neg(s) term); NULL/NaN
            # scores excluded, -0.0 folded to +0.0 on both sides
            "WITH e AS (SELECT value + 0.0 AS value, "
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p "
            "FROM events WHERE value IS NOT NULL AND NOT isnan(value)), "
            "d AS (SELECT value, CAST(SUM(p) AS BIGINT) AS np, "
            "CAST(SUM(1 - p) AS BIGINT) AS nn FROM e GROUP BY value), "
            "s AS (SELECT np, nn, CAST(COALESCE(SUM(nn) OVER ("
            "ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS BIGINT) AS cum FROM d), "
            "tot AS (SELECT CAST(COALESCE(SUM(np), 0) AS BIGINT) AS n_pos, "
            "CAST(COALESCE(SUM(nn), 0) AS BIGINT) AS n_neg, "
            "CAST(COALESCE(SUM(np * (2 * cum + nn)), 0) AS BIGINT) AS u2 "
            "FROM s) "
            "SELECT n_pos, n_neg, u2, CASE WHEN n_pos > 0 AND n_neg > 0 "
            "THEN ROUND(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) "
            "END AS auc FROM tot WHERE n_pos + n_neg > 0"
        ),
        "q_scd2_order_status": (
            # gaps-and-islands: LAG change flag -> running island id ->
            # per-island MIN/COUNT -> LEAD(valid_from) open intervals;
            # IS DISTINCT FROM gives missing==missing (no new island)
            "WITH x AS (SELECT o_custkey AS c, o_orderkey AS k, "
            "o_orderstatus AS s, o_orderdate AS d, "
            "CASE WHEN LAG(o_orderstatus) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) IS DISTINCT FROM "
            "o_orderstatus THEN 1 ELSE 0 END AS chg FROM orders), "
            "g AS (SELECT c, s, d, k, SUM(chg) OVER (PARTITION BY c "
            "ORDER BY d, k ROWS UNBOUNDED PRECEDING) AS grp FROM x), "
            "isl AS (SELECT c, grp, MIN(s) AS s, MIN(d) AS vf, "
            "COUNT(*) AS cnt FROM g GROUP BY c, grp) "
            "SELECT c AS o_custkey, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY c ORDER BY grp) AS BIGINT) AS island_seq, "
            "s AS o_orderstatus, STRFTIME(vf, '%Y-%m-%d') AS valid_from, "
            "STRFTIME(LEAD(vf) OVER (PARTITION BY c ORDER BY grp), "
            "'%Y-%m-%d') AS valid_to, CAST(cnt AS BIGINT) AS n_orders "
            "FROM isl ORDER BY o_custkey, island_seq"
        ),
        "q_bfs_reach": (
            # BFS levels are deterministic sets, so the recurrence
            # unrolls as chained CTEs (the PageRank-unroll pattern);
            # seeds report hop 0 even when isolated from the graph
            "WITH e AS (SELECT DISTINCT 2 * l_partkey AS u, "
            "2 * l_suppkey + 1 AS v FROM lineitem "
            "UNION SELECT DISTINCT 2 * l_suppkey + 1, 2 * l_partkey "
            "FROM lineitem), "
            "f0 AS (SELECT DISTINCT 2 * s_suppkey + 1 AS node "
            "FROM supplier WHERE s_suppkey % 10 = 0), "
            "f1 AS (SELECT DISTINCT e.v AS node FROM e "
            "JOIN f0 ON e.u = f0.node "
            "WHERE e.v NOT IN (SELECT node FROM f0)), "
            "f2 AS (SELECT DISTINCT e.v AS node FROM e "
            "JOIN f1 ON e.u = f1.node "
            "WHERE e.v NOT IN (SELECT node FROM f0 "
            "UNION ALL SELECT node FROM f1)), "
            "f3 AS (SELECT DISTINCT e.v AS node FROM e "
            "JOIN f2 ON e.u = f2.node "
            "WHERE e.v NOT IN (SELECT node FROM f0 "
            "UNION ALL SELECT node FROM f1 "
            "UNION ALL SELECT node FROM f2)), "
            "lv AS (SELECT node, 0 AS hop FROM f0 "
            "UNION ALL SELECT node, 1 FROM f1 "
            "UNION ALL SELECT node, 2 FROM f2 "
            "UNION ALL SELECT node, 3 FROM f3) "
            "SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END "
            "AS node_type, CAST(node // 2 AS BIGINT) AS key, "
            "CAST(hop AS BIGINT) AS hop "
            "FROM lv ORDER BY hop, node_type, key"
        ),
        "t_langid_eval": _langid_eval_oracle(),
        "q_kmv_set_ops": (
            # two bottom-k sketches replayed verbatim (the
            # q_kmv_distinct_users hash/grid), merged union bottom-k,
            # matched = union bottom-k hashes present in BOTH sketches;
            # below k union hashes both sketches are complete and the
            # estimates ARE exact counts; doubles are the same
            # left-associated IEEE expressions as the engine
            "WITH d AS (SELECT DISTINCT event_type AS s, "
            "md5_number_lower(CAST(user_id AS VARCHAR) || ':kmv9') "
            "% 9007199254740992 AS hv FROM events "
            "WHERE event_type IN ('view', 'purchase')), "
            "ra AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn "
            "FROM d WHERE s = 'view'), "
            "rb AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn "
            "FROM d WHERE s = 'purchase'), "
            "a AS (SELECT hv FROM ra WHERE rn <= 64), "
            "b AS (SELECT hv FROM rb WHERE rn <= 64), "
            "u AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM "
            "(SELECT hv FROM a UNION SELECT hv FROM b)), "
            "nu AS (SELECT LEAST(COUNT(*), 64) AS n, COUNT(*) AS n_all "
            "FROM u), "
            "uk AS (SELECT u.hv AS kth FROM u JOIN nu ON u.rn = nu.n), "
            "m AS (SELECT COUNT(*) AS matched FROM u JOIN nu ON u.rn <= nu.n "
            "WHERE u.hv IN (SELECT hv FROM a) "
            "AND u.hv IN (SELECT hv FROM b)) "
            "SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a_kept, "
            "CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b_kept, "
            "CAST(nu.n AS BIGINT) AS n_union_kept, "
            "CAST(m.matched AS BIGINT) AS matched, "
            "CAST(uk.kth AS BIGINT) AS union_kth, "
            "CASE WHEN nu.n_all >= 64 THEN "
            "ROUND(CAST(63 AS DOUBLE) * CAST(9007199254740992 AS DOUBLE) "
            "/ (uk.kth + 1.0), 4) ELSE CAST(nu.n AS DOUBLE) END AS est_union, "
            "CASE WHEN nu.n_all >= 64 THEN "
            "ROUND(m.matched * (CAST(63 AS DOUBLE) * "
            "CAST(9007199254740992 AS DOUBLE) / (uk.kth + 1.0)) / 64, 4) "
            "ELSE CAST(m.matched AS DOUBLE) END AS est_inter "
            "FROM nu, uk, m"
        ),
        "s_mrl_overlap": (
            # both retrieval arms replayed with the shared rank order
            # (rounded sim DESC, vec_id ASC); the half arm slices the
            # list prefix exactly like the engine's column slice
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "FROM embeddings ORDER BY vec_id LIMIT 5), "
            "sfull AS (SELECT q.query_id, e.vec_id, "
            "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qe AS DOUBLE[])), 4) AS sim "
            "FROM embeddings e CROSS JOIN q), "
            "tf AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, "
            "ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY sim DESC, vec_id) AS r FROM sfull) WHERE r <= 10), "
            "shalf AS (SELECT q.query_id, e.vec_id, "
            "ROUND(list_cosine_similarity("
            "CAST(list_slice(e.embedding, 1, len(e.embedding) // 2) "
            "AS DOUBLE[]), "
            "CAST(list_slice(q.qe, 1, len(q.qe) // 2) AS DOUBLE[])), 4) "
            "AS sim FROM embeddings e CROSS JOIN q), "
            "th AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, "
            "ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY sim DESC, vec_id) AS r FROM shalf) WHERE r <= 10), "
            "kk AS (SELECT query_id, COUNT(*) AS k FROM tf GROUP BY query_id), "
            "ov AS (SELECT tf.query_id, COUNT(*) AS novl FROM tf "
            "JOIN th ON th.query_id = tf.query_id AND th.vec_id = tf.vec_id "
            "GROUP BY tf.query_id) "
            "SELECT kk.query_id, CAST(kk.k AS BIGINT) AS k, "
            "CAST(COALESCE(ov.novl, 0) AS BIGINT) AS n_overlap, "
            "CAST((1000000 * COALESCE(ov.novl, 0)) // kk.k AS BIGINT) "
            "AS overlap_x1e6 "
            "FROM kk LEFT JOIN ov ON ov.query_id = kk.query_id "
            "ORDER BY kk.query_id"
        ),
        "q_ams_f2": (
            # the AMS tug-of-war sketch replayed verbatim: sign_j(u) = ±1
            # from bit j of md5_number_lower(user_id) (the engine hash),
            # S_j exact integers, est_f2_x16 = middle-two group sums of
            # S_j² (median of 8 means cleared of the /16) — no float
            # anywhere; the NULL guard keeps the empty corpus at s = 0
            # (CASE on a NULL hv would take the ELSE -1 branch)
            "WITH jj AS (SELECT unnest(generate_series(0, 63)) AS j), "
            "h AS (SELECT md5_number_lower(CAST(user_id AS VARCHAR)) AS hv "
            "FROM events), "
            "x AS (SELECT j, COALESCE(SUM(CASE WHEN hv IS NULL THEN 0 "
            "WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END), 0) AS s "
            "FROM jj LEFT JOIN h ON TRUE GROUP BY j), "
            "g AS (SELECT j // 8 AS grp, "
            "SUM(CAST(s AS HUGEINT) * s) AS gs FROM x GROUP BY j // 8), "
            "est AS (SELECT COALESCE(SUM(gs), 0) AS e16 FROM "
            "(SELECT gs FROM g ORDER BY gs OFFSET 3 LIMIT 2)), "
            "pu AS (SELECT COUNT(*) AS c FROM events GROUP BY user_id), "
            "ex AS (SELECT COALESCE(SUM(CAST(c AS HUGEINT) * c), 0) AS f2, "
            "COALESCE(SUM(c), 0) AS n FROM pu) "
            "SELECT CAST(ex.n AS BIGINT) AS n_events, "
            "CAST(ex.f2 AS BIGINT) AS exact_f2, "
            "CAST(est.e16 AS BIGINT) AS est_f2_x16, "
            "CAST(CASE WHEN ex.f2 = 0 THEN 0 ELSE "
            "(abs(est.e16 - 16 * ex.f2) * 1000000) // (16 * ex.f2) END "
            "AS BIGINT) AS err_ppm FROM ex, est"
        ),
        "q_column_profile": _column_profile_oracle(),
        "t_filter_attrition": _attrition_oracle(),
        "q_user_event_paths": (
            # string_agg ORDER BY replayed on the composite unique key
            # (ts, event_id) — rank the events per user, keep rn <= K,
            # aggregate in rank order; COUNT(*) is the untruncated total
            "WITH r AS (SELECT user_id, event_type, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "string_agg(event_type, '>' ORDER BY rn) FILTER (rn <= 16) "
            "AS path FROM r GROUP BY user_id ORDER BY user_id"
        ),
        "q_zorder_zonemap": _zorder_oracle(),
        "q_cdc_upsert": (
            # MERGE INTO replayed as FULL OUTER + CASE: matched-and-
            # errored rows (and errored would-be inserts) are deleted by
            # the n_err filter; arithmetic entirely on the cents grid
            "WITH d AS (SELECT user_id AS custkey, "
            "SUM(CASE WHEN event_type = 'purchase' THEN "
            "CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END) AS p_cents, "
            "SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err "
            "FROM events GROUP BY user_id), "
            "c AS (SELECT c_custkey AS custkey, "
            "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents "
            "FROM customer) "
            "SELECT CAST(COALESCE(c.custkey, d.custkey) AS BIGINT) AS custkey, "
            "CAST(COALESCE(c.cents, 0) + COALESCE(d.p_cents, 0) AS BIGINT) "
            "AS acctbal_cents, "
            "CASE WHEN c.custkey IS NULL THEN 'inserted' "
            "WHEN COALESCE(d.p_cents, 0) > 0 THEN 'updated' "
            "ELSE 'kept' END AS status "
            "FROM c FULL OUTER JOIN d ON d.custkey = c.custkey "
            "WHERE COALESCE(d.n_err, 0) = 0 ORDER BY custkey"
        ),
        "q_schema_evolution": (
            # tier recomputed from the ORIGINAL table under the same
            # generation rule: NULL for even event_id (gen-0 lacked the
            # column), the cents bucket for odd — a row-by-row match
            # certifies the union-by-name read did not drop, misalign,
            # or wrongly fill anything
            "SELECT event_id, user_id, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents, "
            "CASE WHEN event_id % 2 = 0 THEN NULL "
            "WHEN CAST(ROUND(value * 100, 0) AS BIGINT) >= 1000 THEN 'hi' "
            "ELSE 'lo' END AS tier "
            "FROM events ORDER BY event_id"
        ),
        "q_linreg_price_qty": (
            # OLS recomputed from the SAME integer digests with the SAME
            # IEEE expression the engine uses (the q_corr scheme; never
            # REGR_SLOPE(), whose streaming update order is
            # implementation-defined) — bit-identical doubles, no
            # rounding either side.  x on the 1/64 grid, y on the 1/6400
            # grid (lcm of cents and 1/64 money); HUGEINT carries Σy²
            # exactly, mirroring the engine's (hi, lo) int64 split
            "WITH d AS (SELECT l_returnflag, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(CAST(ROUND(l_quantity * 64) AS HUGEINT)) AS sx, "
            "SUM(CAST(ROUND(l_extendedprice * 6400) AS HUGEINT)) AS sy, "
            "SUM(CAST(ROUND(l_quantity * 64) AS HUGEINT) * "
            "CAST(ROUND(l_quantity * 64) AS BIGINT)) AS sxx, "
            "SUM(CAST(ROUND(l_quantity * 64) AS HUGEINT) * "
            "CAST(ROUND(l_extendedprice * 6400) AS BIGINT)) AS sxy, "
            "SUM(CAST(ROUND(l_extendedprice * 6400) AS HUGEINT) * "
            "CAST(ROUND(l_extendedprice * 6400) AS BIGINT)) AS syy "
            "FROM lineitem GROUP BY l_returnflag), "
            "s AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS dn, "
            "CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy, "
            "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov, "
            "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx, "
            "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - "
            "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy FROM d) "
            "SELECT l_returnflag, n AS n_lines, "
            "cov / NULLIF(vx, 0.0) * 0.01 AS slope, "
            "(dsy / 6400.0 - cov / NULLIF(vx, 0.0) * 0.01 * (dsx / 64.0)) "
            "/ dn AS intercept, "
            "cov * cov / NULLIF(vx * vy, 0.0) AS r2 "
            "FROM s ORDER BY l_returnflag"
        ),
        "q_orc_roundtrip": (
            # identity projection WITHOUT props — the engine prunes that
            # column at the ORC decode, so its absence here certifies the
            # pruning path; ts rides back through the declared-schema
            # cast (ORC widens to ns on disk)
            "SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "user_id, event_type, value "
            "FROM events ORDER BY event_id"
        ),
        "t_unicode_dedup": (
            # DuckDB nfc_normalize == Python unicodedata NFC (same
            # Unicode canonicalization; parity probed in tests over
            # combining / Hangul / astral / ligature classes)
            "SELECT md5(nfc_normalize(text)) AS norm_hash, "
            "CAST(MIN(doc_id) AS BIGINT) AS rep_doc, "
            "CAST(COUNT(*) AS BIGINT) AS n_copies, "
            "CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_raw_variants "
            "FROM documents GROUP BY 1 HAVING COUNT(*) >= 2 "
            "ORDER BY norm_hash"
        ),
        "t_group_holdout_split": (
            # the salted md5-hex4 split rule verbatim (fixed-width
            # lowercase hex compares like the number it encodes); NULL
            # sources excluded on both sides
            "WITH s AS (SELECT source, "
            "CASE WHEN substr(md5('split:' || source), 1, 4) < 'c000' "
            "THEN 'train' "
            "WHEN substr(md5('split:' || source), 1, 4) < 'e000' "
            "THEN 'val' ELSE 'test' END AS split, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS chars "
            "FROM documents WHERE source IS NOT NULL GROUP BY source) "
            "SELECT split, CAST(COUNT(*) AS BIGINT) AS n_sources, "
            "CAST(SUM(n_docs) AS BIGINT) AS n_docs, "
            "CAST(SUM(chars) AS BIGINT) AS total_chars "
            "FROM s GROUP BY split ORDER BY split"
        ),
        "q_k_anonymity": (
            # FLOOR on the raw double (identical IEEE divide-then-floor;
            # integer // would truncate toward zero on negative balances
            # and diverge).  Empty input degenerates to the all-zero row
            # on both sides (COALESCE min -> 0)
            "WITH g AS (SELECT c_nationkey, c_mktsegment, "
            "FLOOR(c_acctbal / 100.0) AS b, "
            "CAST(COUNT(*) AS BIGINT) AS sz "
            "FROM customer GROUP BY 1, 2, 3) "
            "SELECT CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS n_rows, "
            "CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END), 0) "
            "AS BIGINT) AS n_violating_groups, "
            "CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END), 0) "
            "AS BIGINT) AS n_rows_at_risk, "
            "CAST(COALESCE(MIN(sz), 0) AS BIGINT) AS min_group_size "
            "FROM g"
        ),
        "q_snapshot_diff": (
            # the perturbation rules replayed verbatim (drop %97, bump
            # %13, insert %101 at k+1e9), then a FULL OUTER classify;
            # absent values COALESCE to 0 with diff_class disambiguating
            "WITH a AS (SELECT c_custkey AS k, "
            "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents "
            "FROM customer), "
            "b AS (SELECT k, CASE WHEN k % 13 = 0 THEN cents + 1 "
            "ELSE cents END AS cents FROM a WHERE k % 97 <> 0 "
            "UNION ALL SELECT k + 1000000000, k FROM a WHERE k % 101 = 0), "
            "f AS (SELECT COALESCE(a.k, b.k) AS custkey, a.cents AS oc, "
            "b.cents AS nc, a.k IS NOT NULL AS in_a, b.k IS NOT NULL AS in_b "
            "FROM a FULL OUTER JOIN b ON a.k = b.k) "
            "SELECT CASE WHEN NOT in_b THEN 'removed' "
            "WHEN NOT in_a THEN 'added' ELSE 'changed' END AS diff_class, "
            "custkey, COALESCE(oc, 0) AS old_cents, "
            "COALESCE(nc, 0) AS new_cents FROM f "
            "WHERE (NOT in_a) OR (NOT in_b) OR oc <> nc "
            "ORDER BY diff_class, custkey"
        ),
        "q_time_travel": (
            # AS OF snapshot 1 = base + the EVEN-event_id delta only; the
            # odd delta is committed in the same store and must stay
            # invisible.  Floor-mod parity (((x % 2) + 2) % 2) matches
            # numpy's floor mod on any sign; zero-sum delta users are
            # dropped on both sides (HAVING <> 0); cents via the
            # q_cdc_upsert ROUND pair
            "WITH c AS (SELECT c_custkey AS custkey, "
            "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents "
            "FROM customer), "
            "d1 AS (SELECT user_id AS custkey, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN "
            "CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) "
            "AS cents FROM events "
            "WHERE ((event_id % 2) + 2) % 2 = 0 GROUP BY user_id "
            "HAVING SUM(CASE WHEN event_type = 'purchase' THEN "
            "CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END) <> 0), "
            "u AS (SELECT * FROM c UNION ALL SELECT * FROM d1) "
            "SELECT custkey, CAST(SUM(cents) AS BIGINT) AS acctbal_cents "
            "FROM u GROUP BY custkey ORDER BY custkey"
        ),
        "q_l_diversity": (
            # distinct-per-group as two grouped levels (the engine's
            # decomposition verbatim); -0.0 folds to +0.0 before the
            # distinct; empty input degenerates to the all-zero row
            "WITH p AS (SELECT c_nationkey, c_mktsegment, "
            "c_acctbal + 0.0 AS sv, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1, 2, 3), "
            "g AS (SELECT c_nationkey, c_mktsegment, "
            "CAST(COUNT(*) AS BIGINT) AS l, "
            "CAST(SUM(n) AS BIGINT) AS rows_ FROM p GROUP BY 1, 2) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(COALESCE(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END), 0) "
            "AS BIGINT) AS n_low_diversity_groups, "
            "CAST(COALESCE(SUM(CASE WHEN l < 3 THEN rows_ ELSE 0 END), 0) "
            "AS BIGINT) AS n_rows_at_risk, "
            "CAST(COALESCE(MIN(l), 0) AS BIGINT) AS min_l "
            "FROM g"
        ),
        "q_temporal_dim_join": (
            # SCD2 islands (the q_scd2_order_status CTE on raw
            # timestamps) -> interval-membership LEFT JOIN; intervals
            # are non-overlapping with vt = next vf, so exactly one row
            # matches and boundary events (ts == vt) fall to the NEXT
            # interval on both sides; COALESCE folds no-match and
            # NULL-status islands into 'unmatched' (engine rule)
            "WITH x AS (SELECT o_custkey AS c, o_orderkey AS k, "
            "o_orderstatus AS s, o_orderdate AS d, "
            "CASE WHEN LAG(o_orderstatus) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) IS DISTINCT FROM "
            "o_orderstatus THEN 1 ELSE 0 END AS chg FROM orders), "
            "g AS (SELECT c, s, d, k, SUM(chg) OVER (PARTITION BY c "
            "ORDER BY d, k ROWS UNBOUNDED PRECEDING) AS grp FROM x), "
            "isl AS (SELECT c, grp, MIN(s) AS s, MIN(d) AS vf "
            "FROM g GROUP BY c, grp), "
            "iv AS (SELECT c, s, vf, LEAD(vf) OVER (PARTITION BY c "
            "ORDER BY grp) AS vt FROM isl), "
            "p AS (SELECT user_id AS u, ts, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents "
            "FROM events WHERE event_type = 'purchase'), "
            "m AS (SELECT COALESCE(iv.s, 'unmatched') AS status, p.cents "
            "FROM p LEFT JOIN iv ON iv.c = p.u AND iv.vf <= p.ts "
            "AND (iv.vt IS NULL OR p.ts < iv.vt)) "
            "SELECT status, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents "
            "FROM m GROUP BY status ORDER BY status"
        ),
        "q_skew_report": (
            # order statistics over the count-of-counts histogram in
            # PURE integer arithmetic (position (99n+99)//100, never
            # CEIL(0.99*n) — the double product misrounds); one branch
            # per key column, empty tables drop their row via the
            # IS NOT NULL guard
            "WITH k1 AS (SELECT l_partkey AS key, "
            "CAST(COUNT(*) AS BIGINT) AS f FROM lineitem GROUP BY 1), "
            "h1 AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS nk "
            "FROM k1 GROUP BY f), "
            "t1 AS (SELECT CAST(SUM(f * nk) AS BIGINT) AS n_rows, "
            "CAST(SUM(nk) AS BIGINT) AS n_keys, "
            "CAST(MAX(f) AS BIGINT) AS max_freq FROM h1), "
            "c1 AS (SELECT f, SUM(nk) OVER (ORDER BY f) AS cum FROM h1), "
            "k2 AS (SELECT o_custkey AS key, "
            "CAST(COUNT(*) AS BIGINT) AS f FROM orders GROUP BY 1), "
            "h2 AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS nk "
            "FROM k2 GROUP BY f), "
            "t2 AS (SELECT CAST(SUM(f * nk) AS BIGINT) AS n_rows, "
            "CAST(SUM(nk) AS BIGINT) AS n_keys, "
            "CAST(MAX(f) AS BIGINT) AS max_freq FROM h2), "
            "c2 AS (SELECT f, SUM(nk) OVER (ORDER BY f) AS cum FROM h2) "
            "SELECT * FROM ("
            "SELECT 'l_partkey' AS key_col, n_rows, n_keys, max_freq, "
            "(SELECT CAST(MIN(f) AS BIGINT) FROM c1 "
            "WHERE cum >= (t1.n_keys + 1) // 2) AS p50_freq, "
            "(SELECT CAST(MIN(f) AS BIGINT) FROM c1 "
            "WHERE cum >= (99 * t1.n_keys + 99) // 100) AS p99_freq, "
            "CAST(max_freq * 1000000 // n_rows AS BIGINT) "
            "AS top1_share_ppm FROM t1 WHERE n_keys IS NOT NULL "
            "UNION ALL "
            "SELECT 'o_custkey', n_rows, n_keys, max_freq, "
            "(SELECT CAST(MIN(f) AS BIGINT) FROM c2 "
            "WHERE cum >= (t2.n_keys + 1) // 2), "
            "(SELECT CAST(MIN(f) AS BIGINT) FROM c2 "
            "WHERE cum >= (99 * t2.n_keys + 99) // 100), "
            "CAST(max_freq * 1000000 // n_rows AS BIGINT) "
            "FROM t2 WHERE n_keys IS NOT NULL"
            ") ORDER BY key_col"
        ),
        "q_json_profile": (
            # json_type()'s syntax-derived tags verbatim (UBIGINT /
            # BIGINT / DOUBLE / BOOLEAN / VARCHAR / ARRAY / OBJECT /
            # NULL — the engine's _json_type_tag mirrors the split,
            # probe-pinned in tests); quoted path survives dotted keys
            "WITH e AS (SELECT props FROM events "
            "WHERE props IS NOT NULL AND json_valid(props)), "
            "kx AS (SELECT unnest(json_keys(props)) AS key, props FROM e), "
            "t AS (SELECT key, COALESCE(json_type(json(props), "
            "'$.\"' || key || '\"'), 'NULL') AS jtype FROM kx) "
            "SELECT key, jtype, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM t GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "q_table_checksum": (
            # identical canonical row serialization, md5-lower-64 masked
            # to 63 bits (little-endian low digest bytes ==
            # md5_number_lower), order-free bit_xor fold
            "WITH r AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, "
            "CAST(md5_number_lower("
            "CAST(o_orderkey AS VARCHAR) || '|' || "
            "CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' || "
            "o_orderpriority || '|' || "
            "CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR) "
            "|| '|' || CAST(epoch_us(o_orderdate) AS VARCHAR)"
            ") & 9223372036854775807 AS BIGINT) AS h FROM orders) "
            "SELECT month, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(bit_xor(h) AS BIGINT) AS xor_digest "
            "FROM r GROUP BY month ORDER BY month"
        ),
        "q_equidepth_histogram": (
            # quantile_cont interpolation == the engine's (n-1)p formula
            # (pinned in q_group_quantiles), ROUND(,6) both sides; the
            # bucket CASEs compare against the SAME rounded boundaries,
            # so boundary ties resolve identically; empty input
            # degenerates to (0, NULL×3, 0×4) on both sides
            "WITH q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "ROUND(quantile_cont(o_totalprice, 0.25), 6) AS q25, "
            "ROUND(quantile_cont(o_totalprice, 0.5), 6) AS q50, "
            "ROUND(quantile_cont(o_totalprice, 0.75), 6) AS q75 "
            "FROM orders) "
            "SELECT q.n_rows, q.q25, q.q50, q.q75, "
            "CAST(COALESCE(SUM(CASE WHEN o.o_totalprice < q.q25 "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_b1, "
            "CAST(COALESCE(SUM(CASE WHEN o.o_totalprice >= q.q25 "
            "AND o.o_totalprice < q.q50 THEN 1 ELSE 0 END), 0) AS BIGINT) "
            "AS n_b2, "
            "CAST(COALESCE(SUM(CASE WHEN o.o_totalprice >= q.q50 "
            "AND o.o_totalprice < q.q75 THEN 1 ELSE 0 END), 0) AS BIGINT) "
            "AS n_b3, "
            "CAST(COALESCE(SUM(CASE WHEN o.o_totalprice >= q.q75 "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_b4 "
            "FROM q LEFT JOIN orders o ON TRUE "
            "GROUP BY 1, 2, 3, 4"
        ),
        "t_dup_size_profile": (
            # count-of-counts over full md5 classes
            "WITH k AS (SELECT md5(text) AS h, "
            "CAST(COUNT(*) AS BIGINT) AS f FROM documents GROUP BY 1) "
            "SELECT f AS class_size, CAST(COUNT(*) AS BIGINT) AS n_classes "
            "FROM k GROUP BY f ORDER BY f"
        ),
        "q_median_impute": (
            # quantile_cont interpolation == the engine's replay formula
            # (pinned in q_group_quantiles); half-cents via ROUND (ties
            # away from zero == round_half_away) so binary-grid .5 ties
            # cannot diverge; med/total as DOUBLE so the no-ok-rows case
            # degenerates to NULL without flipping the dtype class
            "WITH ok AS (SELECT user_id, value FROM events "
            "WHERE event_type <> 'error'), "
            "g AS (SELECT ROUND(quantile_cont(value, 0.5) * 200, 0) "
            "AS gmed FROM ok), "
            "pm AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ok, "
            "ROUND(quantile_cont(value, 0.5) * 200, 0) AS umed, "
            "SUM(CAST(ROUND(value * 200, 0) AS BIGINT)) AS ok_sum "
            "FROM ok GROUP BY user_id), "
            "e AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_err "
            "FROM events WHERE event_type = 'error' GROUP BY user_id), "
            "u AS (SELECT DISTINCT user_id FROM events) "
            "SELECT u.user_id, CAST(COALESCE(pm.n_ok, 0) AS BIGINT) AS n_ok, "
            "CAST(COALESCE(e.n_err, 0) AS BIGINT) AS n_err, "
            "CAST(COALESCE(pm.umed, g.gmed) AS DOUBLE) AS med_halfcents, "
            "CAST(CAST(COALESCE(pm.ok_sum, 0) AS DOUBLE) "
            "+ COALESCE(e.n_err, 0) * COALESCE(pm.umed, g.gmed) AS DOUBLE) "
            "AS total_halfcents "
            "FROM u LEFT JOIN pm USING (user_id) "
            "LEFT JOIN e USING (user_id) CROSS JOIN g "
            "ORDER BY u.user_id"
        ),
        "s_label_silhouette": (
            # centroid = SUM/COUNT per (label, dim); list_distance
            # accumulates left-to-right in float64 == the engine's
            # per-dim chain (measured bit-equal); min-over-labels then
            # compares identical doubles, so ties cannot diverge;
            # ROUND ties-away == round_half_away
            "WITH e AS (SELECT vec_id, label, "
            "CAST(unnest(embedding) AS DOUBLE) AS x, "
            "generate_subscripts(embedding, 1) AS dim FROM embeddings), "
            "cd AS (SELECT label, dim, SUM(x) / COUNT(*) AS c "
            "FROM e GROUP BY label, dim), "
            "cent AS (SELECT label, list(c ORDER BY dim) AS cl "
            "FROM cd GROUP BY label), "
            "d AS (SELECT v.vec_id, v.label AS own, c.label AS other, "
            "list_distance(CAST(v.embedding AS DOUBLE[]), c.cl) AS dist "
            "FROM embeddings v CROSS JOIN cent c), "
            "agg AS (SELECT vec_id, own, "
            "MIN(CASE WHEN other = own THEN dist END) AS a, "
            "MIN(CASE WHEN other <> own THEN dist END) AS b "
            "FROM d GROUP BY vec_id, own) "
            "SELECT vec_id, CAST(own AS BIGINT) AS label, "
            "ROUND(CASE WHEN b IS NULL THEN 0.0 "
            "WHEN greatest(a, b) = 0 THEN 0.0 "
            "ELSE (b - a) / greatest(a, b) END, 4) AS sil "
            "FROM agg ORDER BY vec_id"
        ),
        "q_ddsketch_quantiles": (
            # replays the base-2 DDSketch verbatim: bucket key from
            # length(bin(|cents|)) + the two post-msb mantissa bits (pure
            # integer — a float log2 would misbucket exact powers of 2),
            # rank = (qm*n+999)//1000 integer ceil, bucket bounds
            # reconstructed in HUGEINT then cast back (the engine guards
            # |cents| <= 2^56 so the BIGINT casts cannot overflow);
            # est/rel_err are the same single IEEE expressions on the
            # same exact ints as the engine — no rounding either side
            "WITH c AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
            " AS cents FROM orders), "
            "b AS (SELECT cents, abs(cents) AS a, "
            "CASE WHEN cents = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(length(bin(abs(cents))) AS BIGINT) END AS L FROM c), "
            "k AS (SELECT CASE WHEN cents = 0 THEN 0 ELSE "
            "CAST(sign(cents) AS BIGINT) * (4 * L + "
            "(CASE WHEN L >= 3 THEN (a >> (L - 3)) & 3 "
            "ELSE (a << (3 - L)) & 3 END)) END AS bkey FROM b), "
            "h AS (SELECT bkey, CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM k GROUP BY bkey), "
            "cum AS (SELECT bkey, SUM(cnt) OVER (ORDER BY bkey) AS cum "
            "FROM h), "
            "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h), "
            "qs AS (SELECT * FROM (VALUES (500), (900), (950), (990)) "
            "AS t(qm)), "
            "r AS (SELECT CAST(qm AS BIGINT) AS qm, n, "
            "(qm * n + 999) // 1000 AS rk FROM qs CROSS JOIN tot "
            "WHERE n > 0), "
            "pick AS (SELECT r.qm, r.n, r.rk, MIN(cum.bkey) AS bkey "
            "FROM r JOIN cum ON cum.cum >= r.rk GROUP BY r.qm, r.n, r.rk), "
            "dec AS (SELECT qm, n, rk, bkey, "
            "CASE WHEN bkey > 0 THEN 1 WHEN bkey < 0 THEN -1 ELSE 0 END "
            "AS s, abs(bkey) // 4 AS L, abs(bkey) % 4 AS j FROM pick), "
            "bounds AS (SELECT qm, n, rk, bkey, s, "
            "CASE WHEN s = 0 THEN CAST(0 AS HUGEINT) ELSE "
            "((CAST(1 AS HUGEINT) << CAST(L - 1 AS INTEGER)) * (4 + j) + 3)"
            " // 4 END AS plo, "
            "CASE WHEN s = 0 THEN CAST(0 AS HUGEINT) ELSE "
            "((CAST(1 AS HUGEINT) << CAST(L - 1 AS INTEGER)) * (5 + j) + 3)"
            " // 4 - 1 END AS phi FROM dec) "
            "SELECT qm AS q_permille, n, CAST(rk AS BIGINT) AS rank, "
            "CAST(bkey AS BIGINT) AS bucket_key, "
            "CAST(CASE WHEN s >= 0 THEN plo ELSE -phi END AS BIGINT) "
            "AS lo_cents, "
            "CAST(CASE WHEN s >= 0 THEN phi ELSE -plo END AS BIGINT) "
            "AS hi_cents, "
            "CAST((CASE WHEN s >= 0 THEN plo ELSE -phi END) "
            "+ (CASE WHEN s >= 0 THEN phi ELSE -plo END) AS DOUBLE) / 200.0 "
            "AS est_price, "
            "CASE WHEN phi = plo THEN 0.0 ELSE "
            "CAST(phi - plo AS DOUBLE) / CAST(phi + plo AS DOUBLE) END "
            "AS rel_err_bound "
            "FROM bounds ORDER BY q_permille"
        ),
        "q_ks_test": (
            # sup_v |n_b*cumA - n_a*cumB| over distinct pooled values —
            # EXACT integers (no division until the final reported D);
            # NULL/NaN excluded and -0.0 folded via v + 0.0 exactly like
            # the engine's prep; ties in |D| resolve to the smallest
            # value (ORDER BY dn DESC, v ASC == the argmax-first rule);
            # ks_d = double(d_num)/double(n_a*n_b), the engine's exact
            # float-float division
            "WITH p AS (SELECT value + 0.0 AS v, "
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a, "
            "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b "
            "FROM events WHERE event_type IN ('purchase', 'click') "
            "AND value IS NOT NULL AND NOT isnan(value)), "
            "tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, "
            "CAST(SUM(b) AS BIGINT) AS nb FROM p), "
            "d AS (SELECT v, CAST(SUM(a) AS BIGINT) AS da, "
            "CAST(SUM(b) AS BIGINT) AS db FROM p GROUP BY v), "
            "cum AS (SELECT v, SUM(da) OVER (ORDER BY v) AS ca, "
            "SUM(db) OVER (ORDER BY v) AS cb FROM d), "
            "sc AS (SELECT v, abs(nb * ca - na * cb) AS dn, na, nb "
            "FROM cum CROSS JOIN tot WHERE na > 0 AND nb > 0) "
            "SELECT na AS n_a, nb AS n_b, CAST(dn AS BIGINT) AS d_num, "
            "CAST(dn AS DOUBLE) / CAST(na * nb AS DOUBLE) AS ks_d, "
            "v AS at_value "
            "FROM sc ORDER BY dn DESC, v ASC LIMIT 1"
        ),
        "q_welch_ab": (
            # replays the digest fold then the IDENTICAL IEEE expression
            # chain (squares as x*x, one sqrt) on the same exact ints —
            # never compare against a SQL engine's own t-test, its
            # accumulation order is implementation-defined; Σc² rides
            # HUGEINT then casts back (engine guards |c| <= 3e9);
            # zero pooled variance => NULL t/df both sides
            "WITH p AS (SELECT CASE WHEN event_type = 'purchase' THEN 'a' "
            "ELSE 'b' END AS grp, CAST(ROUND(value * 100, 0) AS BIGINT) AS c "
            "FROM events WHERE event_type IN ('purchase', 'click') "
            "AND value IS NOT NULL AND NOT isnan(value)), "
            "g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(c) AS BIGINT) AS s, "
            "CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS ss "
            "FROM p GROUP BY grp), "
            "w AS (SELECT "
            "MAX(CASE WHEN grp = 'a' THEN n END) AS na, "
            "MAX(CASE WHEN grp = 'a' THEN s END) AS sa, "
            "MAX(CASE WHEN grp = 'a' THEN ss END) AS ssa, "
            "MAX(CASE WHEN grp = 'b' THEN n END) AS nb, "
            "MAX(CASE WHEN grp = 'b' THEN s END) AS sb, "
            "MAX(CASE WHEN grp = 'b' THEN ss END) AS ssb FROM g), "
            "v AS (SELECT *, "
            "(CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)"
            " / CAST(na AS DOUBLE)) / CAST(na - 1 AS DOUBLE) AS va, "
            "(CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)"
            " / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE) AS vb "
            "FROM w WHERE COALESCE(na, 0) >= 2 AND COALESCE(nb, 0) >= 2), "
            "u AS (SELECT *, va / CAST(na AS DOUBLE) AS ua, "
            "vb / CAST(nb AS DOUBLE) AS ub FROM v) "
            "SELECT na AS n_a, nb AS n_b, sa AS sum_a_cents, "
            "sb AS sum_b_cents, ssa AS ss_a_cents2, ssb AS ss_b_cents2, "
            "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0 AS mean_a, "
            "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0 AS mean_b, "
            "CASE WHEN ua + ub = 0 THEN NULL ELSE "
            "(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) "
            "- CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / sqrt(ua + ub) "
            "END AS t_stat, "
            "CASE WHEN ua + ub = 0 THEN NULL ELSE "
            "((ua + ub) * (ua + ub)) / (ua * ua / CAST(na - 1 AS DOUBLE) "
            "+ ub * ub / CAST(nb - 1 AS DOUBLE)) END AS df_welch "
            "FROM u"
        ),
        "q_triangle_count": (
            # the a<b<c three-way self-join counts each triangle exactly
            # once; wedges = Σ C(d,2) through HUGEINT; clustering is the
            # engine's single double division (NULL when wedge-free,
            # including the empty corpus — both sides emit one row)
            "WITH bl AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), "
            "e AS (SELECT DISTINCT x.p AS a, y.p AS b FROM bl x "
            "JOIN bl y ON x.o = y.o AND x.p < y.p), "
            "deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM "
            "(SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) "
            "GROUP BY v), "
            "agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv, "
            "CAST(COALESCE(SUM(d), 0) // 2 AS BIGINT) AS ne, "
            "CAST(COALESCE(SUM(CAST(d AS HUGEINT) * (d - 1) // 2), 0) "
            "AS BIGINT) AS nw FROM deg), "
            "tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM e e1 "
            "JOIN e e2 ON e2.a = e1.b "
            "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) "
            "SELECT nv AS n_vertices, ne AS n_edges, nw AS n_wedges, "
            "nt AS n_triangles, "
            "CASE WHEN nw > 0 THEN CAST(3 * nt AS DOUBLE) / "
            "CAST(nw AS DOUBLE) ELSE NULL END AS clustering "
            "FROM agg CROSS JOIN tri"
        ),
        "s_rrf_fusion": (
            # composes the two exact channel oracles (s_knn_bruteforce's
            # rounded-cosine rank, s_hamming_topk's sign/popcount rank),
            # full-outer-joins their top-RRF_POOL lists and replays the
            # fused score as the SAME two exactly-ordered IEEE terms;
            # absent-channel rank reports 0
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "FROM embeddings ORDER BY vec_id LIMIT 5), "
            "sc AS (SELECT q.query_id, e.vec_id, "
            "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qe AS DOUBLE[])), 4) AS sim "
            "FROM embeddings e CROSS JOIN q), "
            "rc AS (SELECT query_id, vec_id, ROW_NUMBER() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, vec_id) AS r "
            "FROM sc), "
            "hd AS (SELECT q.query_id, e.vec_id, "
            "len(list_filter(range(1, len(qe) + 1), "
            "i -> (qe[i] > 0) <> (e.embedding[i] > 0))) AS dist "
            "FROM q CROSS JOIN embeddings e), "
            "rh AS (SELECT query_id, vec_id, ROW_NUMBER() OVER "
            "(PARTITION BY query_id ORDER BY dist, vec_id) AS r "
            "FROM hd), "
            "u AS (SELECT COALESCE(c.query_id, h.query_id) AS qid, "
            "COALESCE(c.vec_id, h.vec_id) AS vid, c.r AS rcos, h.r AS rham "
            "FROM (SELECT * FROM rc WHERE r <= 20) c "
            "FULL OUTER JOIN (SELECT * FROM rh WHERE r <= 20) h "
            "ON c.query_id = h.query_id AND c.vec_id = h.vec_id), "
            "f AS (SELECT qid, vid, "
            "COALESCE(1.0 / (60.0 + rcos), 0.0) "
            "+ COALESCE(1.0 / (60.0 + rham), 0.0) AS rrf, "
            "CAST(COALESCE(rcos, 0) AS BIGINT) AS rank_cos, "
            "CAST(COALESCE(rham, 0) AS BIGINT) AS rank_ham FROM u), "
            "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
            "ORDER BY rrf DESC, vid) AS rnk FROM f) "
            "SELECT qid AS query_id, CAST(rnk AS BIGINT) AS \"rank\", "
            "vid AS vec_id, rrf, rank_cos, rank_ham "
            "FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk"
        ),
        "q_chi2_independence": (
            # per-cell terms on the ×1e6 integer micro-grid (ROUND
            # ties-away == round_half_away of the SAME IEEE expression),
            # so the total is an order-free INTEGER sum — never a float
            # SUM, whose accumulation order is implementation-defined;
            # grid = full cross product of observed margins (obs 0
            # allowed, expected > 0 by construction); sign buckets so no
            # float boundary can blur membership; NULL/NaN excluded
            "WITH p AS (SELECT event_type AS t, CASE WHEN value < 0 THEN "
            "'neg' WHEN value > 0 THEN 'pos' ELSE 'zero' END AS b "
            "FROM events WHERE value IS NOT NULL AND NOT isnan(value)), "
            "o AS (SELECT t, b, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM p GROUP BY t, b), "
            "rows_ AS (SELECT t, CAST(SUM(c) AS BIGINT) AS r "
            "FROM o GROUP BY t), "
            "cols_ AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cc "
            "FROM o GROUP BY b), "
            "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM o), "
            "grid AS (SELECT rows_.t, cols_.b, rows_.r, cols_.cc, tot.n, "
            "CAST(COALESCE(o.c, 0) AS BIGINT) AS obs "
            "FROM rows_ CROSS JOIN cols_ CROSS JOIN tot "
            "LEFT JOIN o ON o.t = rows_.t AND o.b = cols_.b), "
            "calc AS (SELECT t, b, obs, r, cc, n, "
            "CAST(r AS DOUBLE) * CAST(cc AS DOUBLE) / CAST(n AS DOUBLE) "
            "AS e FROM grid), "
            "term AS (SELECT t, b, obs, r, cc, n, "
            "CAST(ROUND(e * 1000000, 0) AS BIGINT) AS expected_x1e6, "
            "CAST(ROUND((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) "
            "- e) / e * 1000000, 0) AS BIGINT) AS term_x1e6 FROM calc) "
            "SELECT t AS event_type, b AS bucket, obs AS observed, "
            "r AS row_total, cc AS col_total, n, expected_x1e6, "
            "term_x1e6, CAST(SUM(term_x1e6) OVER () AS BIGINT) "
            "AS chi2_total_x1e6 "
            "FROM term ORDER BY event_type, bucket"
        ),
        "q_mor_deletes": (
            # the erasure predicate re-evaluated directly (the engine
            # resolves it ONCE to positional delete files, then reads by
            # position only — the resume test pins that difference);
            # remainder-zero is sign-convention-independent, so numpy
            # floor-mod and SQL trunc-mod select identical rows
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
            "AS BIGINT) AS sum_cents "
            "FROM orders WHERE o_custkey % 97 <> 0 "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "q_bitmap_index": (
            # logical counts per chunk — the engine computes the same
            # numbers from REAL packed-uint64 bitmaps (AND/OR+popcount),
            # so any packing/order/padding bug shows as count drift;
            # chunk uses the explicit-floor form (DuckDB // truncates
            # toward zero on negatives — the q_events_json lesson);
            # bitmap_bytes pins the (n+63)//64*8 word padding
            "WITH c AS (SELECT (l_orderkey - ((l_orderkey % 4096) + 4096) "
            "% 4096) // 4096 AS chunk, "
            "(l_returnflag = 'R') AS r, (l_linestatus = 'F') AS f "
            "FROM lineitem) "
            "SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(((COUNT(*) + 63) // 64) * 8 AS BIGINT) AS bitmap_bytes, "
            "CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_flag_r, "
            "CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_status_f, "
            "CAST(SUM(CASE WHEN r AND f THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_and, "
            "CAST(SUM(CASE WHEN r OR f THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_or "
            "FROM c GROUP BY chunk ORDER BY chunk"
        ),
        "q_interval_overlap_join": (
            # genuine interval-overlap inequality join (DuckDB IEJoin);
            # closed endpoints both sides; day via the float-floor form
            # the repo's day queries share (exact for any epoch_us the
            # corpus can hold); LEFT JOIN keeps zero-incident user-days
            "WITH sp AS (SELECT user_id, "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "CAST(MIN(epoch_us(ts)) AS BIGINT) AS span_start_us, "
            "CAST(MAX(epoch_us(ts)) AS BIGINT) AS span_end_us "
            "FROM events GROUP BY user_id, day), "
            "w AS (SELECT epoch_us(ts) - 3600000000 AS s2, "
            "epoch_us(ts) + 3600000000 AS e2 FROM events "
            "WHERE event_type = 'error') "
            "SELECT sp.user_id, sp.day, sp.span_start_us, sp.span_end_us, "
            "CAST(COUNT(w.s2) AS BIGINT) AS n_incidents "
            "FROM sp LEFT JOIN w ON sp.span_start_us <= w.e2 "
            "AND w.s2 <= sp.span_end_us "
            "GROUP BY sp.user_id, sp.day, sp.span_start_us, sp.span_end_us "
            "ORDER BY sp.user_id, sp.day"
        ),
        "q_avro_roundtrip": (
            # identity round trip: the engine's Avro encode+decode must
            # reproduce the parquet values bit-for-bit
            "SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "user_id, event_type, value FROM events ORDER BY event_id"
        ),
        "q_stream_tumbling_agg": (
            # streaming semantics replayed in SQL: exclusive running MAX
            # over arrival (id) order is the watermark source; a window
            # is finalized once wm >= its end; first arrival has no
            # watermark (NULL -> accepted); day/window via the float-
            # floor convention; all comparisons integer microseconds
            "WITH a AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) "
            "AS tus FROM events), "
            "w AS (SELECT tus, MAX(tus) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
            "FROM a), "
            "f AS (SELECT CAST(floor(tus / 3600000000.0) AS BIGINT) "
            "AS win, (pm IS NOT NULL AND pm - 7200000000 >= "
            "(CAST(floor(tus / 3600000000.0) AS BIGINT) + 1) "
            "* 3600000000) AS drp FROM w) "
            "SELECT win * 3600000000 AS window_start_us, "
            "CAST(SUM(CASE WHEN drp THEN 0 ELSE 1 END) AS BIGINT) "
            "AS n_accepted, "
            "CAST(SUM(CASE WHEN drp THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_dropped "
            "FROM f GROUP BY win ORDER BY window_start_us"
        ),
        "q_t_closeness": (
            # ordered-domain EMD cleared of division: cumdiff_i =
            # cg_i·n − cG_i·ng exact integers over the GLOBAL support
            # (group-absent values contribute), HUGEINT products, breach
            # by 5·emd > denom cross-multiplication; m == 1 degenerates
            # to t = 0 both sides
            "WITH p AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, "
            "c_mktsegment AS seg, "
            "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS sv, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM customer "
            "GROUP BY 1, 2, 3), "
            "gsup AS (SELECT sv, CAST(SUM(n) AS BIGINT) AS gn "
            "FROM p GROUP BY sv), "
            "tot AS (SELECT CAST(SUM(gn) AS BIGINT) AS nt, "
            "CAST(COUNT(*) AS BIGINT) AS m FROM gsup), "
            "grp AS (SELECT nat, seg, CAST(SUM(n) AS BIGINT) AS ng "
            "FROM p GROUP BY 1, 2), "
            "grid AS (SELECT grp.nat, grp.seg, grp.ng, gsup.sv, gsup.gn, "
            "CAST(COALESCE(p.n, 0) AS BIGINT) AS g_n "
            "FROM grp CROSS JOIN gsup LEFT JOIN p ON p.nat = grp.nat "
            "AND p.seg = grp.seg AND p.sv = gsup.sv), "
            "cum AS (SELECT nat, seg, ng, sv, "
            "SUM(g_n) OVER (PARTITION BY nat, seg ORDER BY sv) AS cg, "
            "SUM(gn) OVER (PARTITION BY nat, seg ORDER BY sv) AS cgl "
            "FROM grid), "
            "sc AS (SELECT nat, seg, ng, nt, m, "
            "CAST(SUM(ABS(CAST(cg AS HUGEINT) * nt "
            "- CAST(cgl AS HUGEINT) * ng)) AS BIGINT) AS emd "
            "FROM cum CROSS JOIN tot GROUP BY nat, seg, ng, nt, m) "
            "SELECT nat AS c_nationkey, seg AS c_mktsegment, "
            "ng AS n_rows, "
            "CASE WHEN m > 1 THEN emd ELSE 0 END AS emd_scaled, "
            "CAST(ng * nt * (m - 1) AS BIGINT) AS denom, "
            "CASE WHEN m > 1 THEN CAST(emd AS DOUBLE) / "
            "CAST(ng * nt * (m - 1) AS DOUBLE) ELSE 0.0 END AS t_value, "
            "CAST(CASE WHEN m > 1 AND 5 * emd > ng * nt * (m - 1) "
            "THEN 1 ELSE 0 END AS BIGINT) AS breach "
            "FROM sc ORDER BY c_nationkey, c_mktsegment"
        ),
        "q_link_prediction": (
            # full-adjacency wedge counts are the common-neighbor counts;
            # existing edges anti-joined away; jaccard is the single
            # double division on exact ints, ties pinned by (a, b)
            "WITH bl AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), "
            "pc_ AS (SELECT x.p AS a, y.p AS b, CAST(COUNT(*) AS BIGINT) "
            "AS c FROM bl x JOIN bl y ON x.o = y.o AND x.p < y.p "
            "GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM pc_ WHERE c >= 2), "
            "deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM "
            "(SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) "
            "GROUP BY v), "
            "adj AS (SELECT a AS ctr, b AS leaf FROM e "
            "UNION ALL SELECT b, a FROM e), "
            "wed AS (SELECT x.leaf AS u, y.leaf AS w, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM adj x "
            "JOIN adj y ON x.ctr = y.ctr AND x.leaf < y.leaf "
            "GROUP BY 1, 2), "
            "cand AS (SELECT wed.u, wed.w, wed.c FROM wed LEFT JOIN e "
            "ON e.a = wed.u AND e.b = wed.w WHERE e.a IS NULL), "
            "sc AS (SELECT u, w, c, da.d AS deg_a, db.d AS deg_b, "
            "CAST(c AS DOUBLE) / CAST(da.d + db.d - c AS DOUBLE) AS jd "
            "FROM cand JOIN deg da ON da.v = u JOIN deg db ON db.v = w) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY jd DESC, u, w) "
            "AS BIGINT) AS \"rank\", u AS part_a, w AS part_b, "
            "c AS common, deg_a, deg_b, jd AS jaccard "
            "FROM sc ORDER BY jd DESC, u, w LIMIT 20"
        ),
        "q_psi_drift": (
            # per-bucket PSI terms on the ×1e9 half-away grid (the
            # q_user_entropy irrationality safety argument: p != q makes
            # the term irrational, p == q is exactly 0 both sides), so
            # the total is an order-free INTEGER sum; add-1 smoothing
            # over the union vocabulary; week parity via floor-mod
            "WITH e AS (SELECT event_type AS t, "
            "((CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT) % 2) "
            "+ 2) % 2 AS p FROM events), "
            "c AS (SELECT t, p, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM e GROUP BY t, p), "
            "ab AS (SELECT t, "
            "CAST(COALESCE(SUM(CASE WHEN p = 0 THEN n END), 0) AS BIGINT) "
            "AS a, "
            "CAST(COALESCE(SUM(CASE WHEN p = 1 THEN n END), 0) AS BIGINT) "
            "AS b FROM c GROUP BY t), "
            "tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, "
            "CAST(SUM(b) AS BIGINT) AS nb, CAST(COUNT(*) AS BIGINT) AS m "
            "FROM ab), "
            "sc AS (SELECT t, a, b, "
            "CAST(a + 1 AS DOUBLE) / CAST(na + m AS DOUBLE) AS pa_, "
            "CAST(b + 1 AS DOUBLE) / CAST(nb + m AS DOUBLE) AS pb_ "
            "FROM ab CROSS JOIN tot), "
            "term AS (SELECT t, a, b, CAST(ROUND((CASE WHEN pa_ = pb_ "
            "THEN 0.0 ELSE (pa_ - pb_) * ln(pa_ / pb_) END) "
            "* 1000000000, 0) AS BIGINT) AS psi FROM sc) "
            "SELECT t AS event_type, a AS n_even, b AS n_odd, "
            "psi AS psi_x1e9, CAST(SUM(psi) OVER () AS BIGINT) "
            "AS psi_total_x1e9 FROM term ORDER BY event_type"
        ),
        "q_pareto_coverage": (
            # minimal head via integer cross-multiplication 100·cum >=
            # q·total; the cumulative window runs over POSITIVE revenues
            # only (non-positive customers can never be needed), total
            # and customer count over ALL; answers are tie-order-
            # independent so the (r DESC, custkey) order is pure pinning
            "WITH cr AS (SELECT o_custkey, CAST(SUM(CAST(ROUND("
            "o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS r "
            "FROM orders GROUP BY 1), "
            "tot AS (SELECT CAST(SUM(r) AS BIGINT) AS t, "
            "CAST(COUNT(*) AS BIGINT) AS nc FROM cr), "
            "cum AS (SELECT SUM(r) OVER (ORDER BY r DESC, o_custkey) AS c, "
            "ROW_NUMBER() OVER (ORDER BY r DESC, o_custkey) AS k "
            "FROM cr WHERE r > 0), "
            "qs AS (SELECT * FROM (VALUES (50), (80), (90)) AS v(q)), "
            "pick AS (SELECT q, MIN(k) AS nk FROM qs CROSS JOIN tot "
            "JOIN cum ON 100 * cum.c >= q * tot.t WHERE tot.t > 0 "
            "GROUP BY q) "
            "SELECT CAST(q AS BIGINT) AS pct, CAST(nk AS BIGINT) "
            "AS n_customers, "
            "CAST((SELECT c FROM cum WHERE k = pick.nk) AS BIGINT) "
            "AS covered_cents, "
            "(SELECT t FROM tot) AS total_cents, "
            "(SELECT nc FROM tot) AS n_customers_total "
            "FROM pick ORDER BY pct"
        ),
        "q_weighted_sssp": (
            # Bellman-Ford unrolled as chained min CTEs (the q_bfs_reach
            # / q_pagerank_bipartite oracle scheme); min-weight edges
            # and all distances in exact int64 cents
            "WITH ew AS (SELECT u, v, CAST(MIN(wc) AS BIGINT) AS w FROM ("
            "SELECT 2 * l_partkey AS u, 2 * l_suppkey + 1 AS v, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS wc "
            "FROM lineitem "
            "UNION ALL SELECT 2 * l_suppkey + 1, 2 * l_partkey, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) "
            "FROM lineitem) GROUP BY u, v), "
            "d0 AS (SELECT DISTINCT 2 * s_suppkey + 1 AS node, "
            "CAST(0 AS BIGINT) AS d FROM supplier "
            "WHERE s_suppkey % 10 = 0), "
            "d1 AS (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM ("
            "SELECT node, d FROM d0 UNION ALL SELECT ew.v, d0.d + ew.w "
            "FROM ew JOIN d0 ON ew.u = d0.node) GROUP BY node), "
            "d2 AS (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM ("
            "SELECT node, d FROM d1 UNION ALL SELECT ew.v, d1.d + ew.w "
            "FROM ew JOIN d1 ON ew.u = d1.node) GROUP BY node), "
            "d3 AS (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM ("
            "SELECT node, d FROM d2 UNION ALL SELECT ew.v, d2.d + ew.w "
            "FROM ew JOIN d2 ON ew.u = d2.node) GROUP BY node) "
            "SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' "
            "END AS node_type, CAST(node // 2 AS BIGINT) AS key, "
            "d AS dist_cents FROM d3 ORDER BY node_type, key"
        ),
        "t_ingest_quarantine": (
            # the same fixed priority chain; json_valid == the engine's
            # yyjson-aligned strict parse (NaN constants rejected)
            "WITH c AS (SELECT event_id, CASE "
            "WHEN user_id IS NULL THEN 'null_user' "
            "WHEN ts IS NULL THEN 'null_ts' "
            "WHEN value IS NULL OR isnan(value) THEN 'bad_value' "
            "WHEN props IS NULL OR NOT json_valid(props) "
            "THEN 'bad_props' ELSE 'ok' END AS violation FROM events) "
            "SELECT violation, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(MIN(event_id) AS BIGINT) AS min_event_id, "
            "CAST(MAX(event_id) AS BIGINT) AS max_event_id "
            "FROM c GROUP BY violation ORDER BY violation"
        ),
        "q_group_quantile_sketch": (
            # the q_ddsketch_quantiles replay PARTITIONed by event_type;
            # NULL/NaN excluded like q_ks_test
            "WITH c AS (SELECT event_type AS t, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events "
            "WHERE value IS NOT NULL AND NOT isnan(value)), "
            "b AS (SELECT t, cents, abs(cents) AS a, "
            "CASE WHEN cents = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(length(bin(abs(cents))) AS BIGINT) END AS L FROM c), "
            "k AS (SELECT t, CASE WHEN cents = 0 THEN 0 ELSE "
            "CAST(sign(cents) AS BIGINT) * (4 * L + "
            "(CASE WHEN L >= 3 THEN (a >> (L - 3)) & 3 "
            "ELSE (a << (3 - L)) & 3 END)) END AS bkey FROM b), "
            "h AS (SELECT t, bkey, CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM k GROUP BY t, bkey), "
            "cum AS (SELECT t, bkey, SUM(cnt) OVER (PARTITION BY t "
            "ORDER BY bkey) AS cum FROM h), "
            "tot AS (SELECT t, CAST(SUM(cnt) AS BIGINT) AS n "
            "FROM h GROUP BY t), "
            "qs AS (SELECT * FROM (VALUES (500), (900)) AS v(qm)), "
            "r AS (SELECT tot.t, CAST(qm AS BIGINT) AS qm, n, "
            "(qm * n + 999) // 1000 AS rk FROM qs CROSS JOIN tot), "
            "pick AS (SELECT r.t, r.qm, r.n, r.rk, MIN(cum.bkey) AS bkey "
            "FROM r JOIN cum ON cum.t = r.t AND cum.cum >= r.rk "
            "GROUP BY r.t, r.qm, r.n, r.rk), "
            "dec AS (SELECT t, qm, n, rk, bkey, "
            "CASE WHEN bkey > 0 THEN 1 WHEN bkey < 0 THEN -1 ELSE 0 END "
            "AS s, abs(bkey) // 4 AS L, abs(bkey) % 4 AS j FROM pick), "
            "bounds AS (SELECT t, qm, n, rk, bkey, s, "
            "CASE WHEN s = 0 THEN CAST(0 AS HUGEINT) ELSE "
            "((CAST(1 AS HUGEINT) << CAST(L - 1 AS INTEGER)) * (4 + j) + 3)"
            " // 4 END AS plo, "
            "CASE WHEN s = 0 THEN CAST(0 AS HUGEINT) ELSE "
            "((CAST(1 AS HUGEINT) << CAST(L - 1 AS INTEGER)) * (5 + j) + 3)"
            " // 4 - 1 END AS phi FROM dec) "
            "SELECT t AS event_type, qm AS q_permille, n, "
            "CAST(rk AS BIGINT) AS rank, CAST(bkey AS BIGINT) "
            "AS bucket_key, "
            "CAST(CASE WHEN s >= 0 THEN plo ELSE -phi END AS BIGINT) "
            "AS lo_cents, "
            "CAST(CASE WHEN s >= 0 THEN phi ELSE -plo END AS BIGINT) "
            "AS hi_cents, "
            "CAST((CASE WHEN s >= 0 THEN plo ELSE -phi END) "
            "+ (CASE WHEN s >= 0 THEN phi ELSE -plo END) AS DOUBLE) / 200.0 "
            "AS est_value, "
            "CASE WHEN phi = plo THEN 0.0 ELSE "
            "CAST(phi - plo AS DOUBLE) / CAST(phi + plo AS DOUBLE) END "
            "AS rel_err_bound "
            "FROM bounds ORDER BY event_type, q_permille"
        ),
        "q_time_to_convert": (
            # exact integer order statistics (no interpolation): median
            # as the (n+1)//2 and n//2+1 rank pair, p90 at (9n+9)//10;
            # conversion ppm by integer floor division; first purchase
            # AT-OR-AFTER the first view (>=, ties count)
            "WITH v AS (SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) "
            "AS fv FROM events WHERE event_type = 'view' GROUP BY 1), "
            "p AS (SELECT e.user_id, CAST(MIN(epoch_us(e.ts)) AS BIGINT) "
            "AS fp FROM events e JOIN v ON v.user_id = e.user_id "
            "AND epoch_us(e.ts) >= v.fv WHERE e.event_type = 'purchase' "
            "GROUP BY 1), "
            "d AS (SELECT p.user_id, p.fp - v.fv AS delta FROM p "
            "JOIN v ON v.user_id = p.user_id), "
            "tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) "
            "AS nv, CAST(COUNT(*) AS BIGINT) AS nc FROM d), "
            "r AS (SELECT delta, ROW_NUMBER() OVER (ORDER BY delta) AS k "
            "FROM d) "
            "SELECT nv AS n_viewing, nc AS n_converting, "
            "CAST((1000000 * nc) // nv AS BIGINT) AS conv_ppm, "
            "CAST((SELECT delta FROM r WHERE k = (nc + 1) // 2) AS BIGINT) "
            "AS delta_med_lo_us, "
            "CAST((SELECT delta FROM r WHERE k = nc // 2 + 1) AS BIGINT) "
            "AS delta_med_hi_us, "
            "CAST((SELECT delta FROM r WHERE k = (9 * nc + 9) // 10) "
            "AS BIGINT) AS delta_p90_us "
            "FROM tot WHERE nc > 0"
        ),
        "t_vocab_coverage": (
            # the t_doc_frequency tokenization (single-space split, drop
            # empties); head cut by 100·cum >= pct·total integer
            # cross-mult, tie-order independent
            "WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS word FROM documents), "
            "c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM w GROUP BY word), "
            "tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS t, "
            "CAST(COUNT(*) AS BIGINT) AS v FROM c), "
            "cum AS (SELECT SUM(tf) OVER (ORDER BY tf DESC, word) AS ct, "
            "ROW_NUMBER() OVER (ORDER BY tf DESC, word) AS k FROM c), "
            "qs AS (SELECT * FROM (VALUES (90), (99)) AS x(pct)), "
            "pick AS (SELECT pct, MIN(k) AS nk FROM qs CROSS JOIN tot "
            "JOIN cum ON 100 * cum.ct >= pct * tot.t WHERE tot.t > 0 "
            "GROUP BY pct) "
            "SELECT CAST(pct AS BIGINT) AS pct, CAST(nk AS BIGINT) "
            "AS vocab_size, "
            "CAST((SELECT ct FROM cum WHERE k = pick.nk) AS BIGINT) "
            "AS covered_tokens, "
            "(SELECT t FROM tot) AS total_tokens, "
            "(SELECT v FROM tot) AS total_vocab "
            "FROM pick ORDER BY pct"
        ),
        "q_wallet_balance": (
            # the clamp identity in window form: b = q − LEAST(0,
            # runmin(q)) over the per-user running sum q; clamp events
            # are strictly-new minima below the prior floor; all int64
            "WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tus, "
            "CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT) AS d "
            "FROM events WHERE event_type = 'purchase'), "
            "q AS (SELECT user_id, event_id, tus, SUM(d) OVER "
            "(PARTITION BY user_id ORDER BY tus, event_id) AS qv FROM p), "
            "r AS (SELECT user_id, event_id, tus, qv, "
            "MIN(qv) OVER (PARTITION BY user_id ORDER BY tus, event_id "
            "ROWS UNBOUNDED PRECEDING) AS runmin, "
            "MIN(qv) OVER (PARTITION BY user_id ORDER BY tus, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prevmin FROM q), "
            "b AS (SELECT user_id, event_id, tus, "
            "qv - LEAST(0, runmin) AS bal, "
            "CASE WHEN qv < LEAST(0, COALESCE(prevmin, 0)) THEN 1 "
            "ELSE 0 END AS clamp FROM r), "
            "fin AS (SELECT user_id, bal AS fb, ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY tus DESC, event_id DESC) "
            "AS rn FROM b) "
            "SELECT b.user_id, "
            "CAST((SELECT fb FROM fin WHERE fin.user_id = b.user_id "
            "AND rn = 1) AS BIGINT) AS final_cents, "
            "CAST(MAX(bal) AS BIGINT) AS max_cents, "
            "CAST(SUM(clamp) AS BIGINT) AS n_clamps "
            "FROM b GROUP BY b.user_id ORDER BY b.user_id"
        ),
    }
    # the Bloom+bucketed-store form is output-identical by construction
    # (no false negatives; every positive exactly verified) — one oracle
    sql["t_delta_dedup_bloom"] = sql["t_delta_dedup"]
    # compaction is read-equivalence by definition: the compacted store's
    # rollup must equal the merge-on-read answer — one oracle for both
    sql["q_mor_compaction"] = sql["q_mor_deletes"]
    # keep-best shares t_dup_components' recursive component walk; only the
    # final select changes (per-family argmax by token count, ties to the
    # lower doc_id)
    _cc_tail = (
        "SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS component "
        "FROM walk GROUP BY node ORDER BY doc_id"
    )
    assert _cc_tail in sql["t_dup_components"]
    sql["t_dedup_keep_best"] = sql["t_dup_components"].replace(
        _cc_tail,
        "SELECT CAST(component AS BIGINT) AS component, "
        "CAST(doc_id AS BIGINT) AS keep_doc, "
        "CAST(n_members AS BIGINT) AS n_members, "
        "CAST(n_tokens AS BIGINT) AS keep_tokens FROM ("
        "SELECT m.*, ROW_NUMBER() OVER (PARTITION BY component "
        "ORDER BY n_tokens DESC, doc_id ASC) AS rn, "
        "COUNT(*) OVER (PARTITION BY component) AS n_members FROM ("
        "SELECT c.component, c.doc_id, "
        "len(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '')) "
        "AS n_tokens "
        "FROM (SELECT node AS doc_id, MIN(lab) AS component FROM walk "
        "GROUP BY node) c JOIN documents d ON d.doc_id = c.doc_id) m) "
        "WHERE rn = 1 ORDER BY component",
    )
    return sql
