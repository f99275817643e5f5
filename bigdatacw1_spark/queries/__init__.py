"""Query modules. Importing this package populates the registry."""

from bigdatacw1_spark.queries.registry import REGISTRY, QuerySpec

# Each import registers its queries via the @q decorator.
from bigdatacw1_spark.queries import inventory  # noqa: F401  (reference ports)
from bigdatacw1_spark.queries import ops_suite  # noqa: F401  (per-operator micro-queries)
from bigdatacw1_spark.queries import extensions  # noqa: F401  (dedup/similarity/text/multimodal)
from bigdatacw1_spark.queries import streaming_suite  # noqa: F401  (event-time windows)
from bigdatacw1_spark.queries import tpch  # noqa: F401  (TPC-H-shaped headliners)
from bigdatacw1_spark.queries import sampling_suite  # noqa: F401  (deterministic sampling)
from bigdatacw1_spark.queries import warehouse  # noqa: F401  (lifecycle + behavioral)
from bigdatacw1_spark.queries import finance_suite  # noqa: F401  (FX + trader limits)
from bigdatacw1_spark.queries import pipeline_suite  # noqa: F401  (Mongo-dialect stages)

# ---------------------------------------------------------------------------
# Driver correctness-window rotation.
#
# The round driver oracle-checks the FIRST 50 registry entries, in order.
# Rounds 1-2 covered the ref_* ports + the p/j/a/w/set/f operator micros;
# round 3 covered TPC-H + the ev_* event-time suite + wh_* lifecycle + the
# finance entries (50/50 green each round, CORRECTNESS_r01-r03). Round 4
# rotates onto the ext_* LLM-pipeline namespace — dedup, similarity, text
# quality, sampling, multimodal, graph, pandas-UDF entries — plus the
# pipeline-front-end reference ports and the remaining lifecycle entries,
# none of which has ever had a driver verdict. The 5 reference ports stay
# pinned first as the permanent parity anchor. Everything else keeps its
# registration order after the priority block (locally oracle-checked every
# run by tests/test_parity.py, which iterates the FULL registry).
#
# ROUND-5 ROTATION PLAN (do this first next round): swap the 45 non-anchor
# slots onto the remaining never-driver-checked entries — the f5-f23/f10-f17
# scalar suites, a13-a17, j6-j13, w5-w9, set ops, p9/p10, diag_*, pl_* (incl.
# round-4's pl_expr_suite / pl_densify_fill), the round-4 promotions
# (ext_sketch_* ×5, ext_minhash_lsh_pairs, ext_simhash, ext_mm_features) and
# round-4 additions (ext_c4_clean, ext_shortest_path, ext_bloom_dedup,
# ext_char_entropy, ext_freq_items, ext_knn_graph, wh_dq_checks,
# wh_snapshot_diff, ev_* leftovers) plus the late-round-4 batch
# (ext_mm_audio, ext_mm_spectral, ext_incremental_admission,
# ext_lm_surprisal, ext_line_dedup, ext_pii_luhn, ext_dataset_card,
# ext_contrastive_pairs, ext_gopher_filter, ext_url_canonicalize,
# ext_embed_norm_outliers, ext_simhash_pairs, ext_kmeans_verified,
# wh_drift_ks, wh_drift_psi, ext_mm_gif, ext_mm_bmp, ext_k_anonymity,
# ext_simhash_clusters, ext_source_overlap, ext_embed_decontaminate).
# That covers nearly everything still unchecked; round 6 mops up the tail,
# including this session's post-staging additions (ext_bm25_topk,
# ext_hybrid_rrf, ext_bpe_tokenize, ext_bpe_train, ev_ewma,
# wh_ivm_join_delta, ext_l_diversity, ext_mm_jpeg, ext_mm_jpeg_color,
# ext_mm_video_frames, ext_robots_filter, ext_domain_cap,
# ext_token_budget_mix, ext_repeat_epochs, ext_ann_ivf_verified,
# ext_semantic_dedup_verified, ext_cluster_quality, ext_dedup_keep_best,
# f24_sql_udf, the promoted ext_ann_lsh_topk / ext_ann_multiprobe full
# oracles, and the analytics wave: wh_cuped_adjusted, wh_survival_km,
# wh_association_rules, wh_abc_analysis, wh_rfm_segments,
# wh_journey_ngrams, wh_attribution_touch, wh_bitemporal_lookup,
# ev_seasonal_dow, ev_anomaly_seasonal, ext_readability,
# ext_tokenizer_fertility, ext_bpe_train_apply, ext_ann_pq_verified,
# ext_kcore, ext_lpa_communities, ext_dedup_clusters_jump,
# ext_dedup_keep_best, ext_feature_hash, ext_label_encode,
# ext_cluster_quality, f25_historical_var, f26_max_drawdown, and the
# round-4 additions: ext_variant_extract, ext_fuzzy_match,
# ext_skyline_parts, ext_warc_datasource, and the round-4 closing wave:
# ev_window_funnel, ext_dsir_select, wh_cdc_apply, wh_zorder_layout,
# wh_hilbert_layout, wh_compaction_plan, wh_time_to_convert,
# wh_fifo_allocation, ext_mojibake_fix, ext_compression_ratio,
# f27_beta_covariance, f28_recursive_bom, ev_pattern_match,
# ev_holt_forecast, ext_embed_pca, wh_file_stats, ev_lateness_audit,
# f29_from_csv, ext_dp_count_release, wh_bt_preference,
# ext_embed_mahalanobis, ext_active_learning, ext_mix_temperature,
# ev_rate_limit).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # reference parity anchor (driver-green r1+r2+r3; keep pinned)
    "ref_nosql1_top_group",
    "ref_sql1_conditional_pivot",
    "ref_sql2_portfolio",
    "ref_nosql2_screening",
    "ref_nosql2_hof",
    # reference pipelines through the Mongo-dialect front end (first time)
    "ref_nosql1_pipeline",
    "ref_nosql2_pipeline",
    # dedup family (first time)
    "ext_dedup_exact",
    "ext_dedup_normalized",
    "ext_dedup_keep_latest",
    "ext_dedup_clusters",
    "ext_span_dedup",
    "ext_jaccard_pairs",
    "ext_neardup_lsh_verified",
    # similarity / embeddings (first time)
    "ext_cosine_topk",
    "ext_embed_neardup",
    "ext_embed_centroids",
    # text-analysis suite (first time)
    "ext_text_stats",
    "ext_lang_id",
    "ext_quality_score",
    "ext_quality_filter",
    "ext_fingerprint",
    "ext_tfidf_top_terms",
    "ext_chunk_documents",
    "ext_repetition_signals",
    "ext_crossdoc_ngram_overlap",
    "ext_pii_redact",
    "ext_decontaminate",
    "ext_oov_rate",
    "ext_token_rank_score",
    "ext_pack_sequences",
    "ext_balance_labels",
    # deterministic samplers (first time)
    "ext_hash_sample",
    "ext_stratified_sample",
    "ext_train_test_split",
    "ext_hash_sample_n",
    "ext_weighted_sample",
    "ext_mixture_sample",
    # multimodal (first time)
    "ext_mm_sniff",
    "ext_mm_binary_meta",
    "ext_mm_decode",
    # graph (first time)
    "ext_pagerank",
    "ext_bfs_reach",
    "ext_triangle_count",
    # pandas-UDF surface (first time)
    "ext_udf_scalar_pandas",
    "ext_udaf_grouped_pandas",
    "ext_udtf_bigrams",
    # streaming + lifecycle stragglers (first time)
    "ev_asof_enrich",
    "wh_incremental_refresh",
    "wh_scd2_lookup",
]


# Staged for round 5 (swap into _DRIVER_WINDOW first thing next round,
# keeping the 5 ref_* anchors pinned first): the 45 highest-value
# never-driver-checked oracle-bearing entries — crawl ingestion, media
# codecs, sketches, drift, governance, and this round's promotions.
# Validated against REGISTRY by tests/test_parity.py so a rename here
# fails CI, not the driver. Round 6 mops up the remaining micro-operator
# and pl_* tail (all locally green since their round of introduction).
ROUND5_WINDOW = [
    "ext_incremental_admission", "ext_contrastive_pairs",
    "ext_minhash_lsh_pairs", "ext_simhash", "ext_embed_neardup_lsh",
    "ext_sketch_ndv", "ext_sketch_quantiles", "ext_sketch_ndv_mergeable",
    "ext_sketch_audience_overlap", "ext_sketch_kll_mergeable",
    "ext_mm_features", "ext_mm_audio", "ext_mm_spectral", "ext_mm_gif",
    "ext_mm_bmp", "ext_warc_parse", "ext_warc_gz", "ext_zip_parse",
    "ext_http_parse", "ext_html_extract", "ext_pii_luhn", "ext_c4_clean",
    "ext_char_entropy", "ext_freq_items", "ext_count_min",
    "ext_bloom_dedup", "ext_substr_decontaminate", "ext_embed_decontaminate",
    "ext_shortest_path", "ext_knn_graph", "ext_simhash_pairs",
    "ext_simhash_clusters", "ext_kmeans_verified", "ext_embed_norm_outliers",
    "ext_url_canonicalize", "ext_gopher_filter", "ext_dataset_card",
    "ext_line_dedup", "ext_lm_surprisal", "ext_k_anonymity",
    "ext_source_overlap", "wh_drift_ks", "wh_drift_psi", "wh_dq_checks",
    "wh_snapshot_diff",
]


def _rotate_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly at import: a typo here silently shrinks coverage
        raise RuntimeError(f"driver-window entries not in REGISTRY: {missing}")
    rest = {k: v for k, v in REGISTRY.items() if k not in set(_DRIVER_WINDOW)}
    ordered = {k: REGISTRY[k] for k in _DRIVER_WINDOW}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_registry()

__all__ = ["REGISTRY", "QuerySpec"]
