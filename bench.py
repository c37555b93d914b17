#!/usr/bin/env python3
"""Benchmark harness for the Ray-Data-native engine.

Default mode: run the headline pipelines from ``__ray_entry__.queries()``
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
print ONE JSON line::

    {"metric": "bench_total", "value": <sec>, "unit": "sec",
     "queries": {...}, "sf": "...", "num_cpus": N}

``--scaling``: run the flagship record-linkage pipeline twice, each in a
FRESH subprocess + fresh Ray session (num_cpus=8 then num_cpus=32), on
the same input, and report pages/s at both levels plus scaling
efficiency  thr_32 / (4 * thr_8)  — the sandbox stand-in for the north
rule's N-node vs 4N-node cluster criterion (BASELINE.json: "scaling
efficiency >= 0.8 from N to 4N Ray nodes").

``--one NAME``: internal child mode used by --scaling; times one query
in this process and prints a small JSON dict.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")

# Headline pipelines (subset of __ray_entry__.queries() covering every
# operator family: relational joins/aggregates, windowed events, text
# analysis, dedup/sketching, ANN, extraction, linking, clustering).
BENCH_QUERIES = [
    "balance_range_rule_check",
    "benford_digit_drift",
    "lang_vowel_ratio",
    "events_value_above_mean_share",
    "nation_customer_supplier_ratio",
    "yearly_status_mix",
    "source_doc_length_minmax_ratio",
    "returnflag_qty_skewness",
    "dow_price_median",
    "embedding_label_entropy",
    "quarterly_weekend_revenue_share",
    "lang_chars_per_token",
    "daily_value_range_mean",
    "nation_priority_entropy",
    "supplier_negative_balance_share",
    "nation_balance_mad_robust_cv",
    "customer_order_count_vmr",
    "brand_price_interdecile_ratio",
    "hour_of_day_peak_share",
    "tax_discount_modal_cell",
    "balance_bimodality_coefficient",
    "embedding_mean_cosine_anisotropy",
    "daily_revenue_spearman_acf1",
    "user_value_trend_share_positive",
    "props_k_type_chi2",
    "hourly_change_skellam_fit",
    "taylor_power_law_exponent",
    "monthly_turning_points_test",
    "embedding_norm_cv_by_label",
    "user_activity_pielou_evenness",
    "supplier_balance_dixon_q",
    "part_size_price_fechner",
    "customer_spend_s80_s20",
    "monthly_revenue_pettitt",
    "part_name_positional_mi",
    "nation_balance_morans_i",
    "orders_price_fd_entropy",
    "copurchase_rich_club",
    "user_type_mutual_information",
    "daily_revenue_variance_ratio",
    "transition_independence_gtest",
    "returnflag_woe_iv",
    "monthly_seasonal_strength",
    "priority_mobility_shorrocks",
    "nation_share_tv_distance",
    "monthly_revenue_mase",
    "part_token_ngd_pairs",
    "embedding_participation_ratio",
    "part_type_loo_encoding",
    "events_value_jensen_gap",
    "daily_revenue_ar2_yule_walker",
    "source_char_entropy_rate",
    "hourly_click_purchase_ccf",
    "nation_balance_trimean",
    "source_jsd_to_corpus",
    "customer_period_wilcoxon_signed_rank",
    "nation_rank_footrule",
    "brand_price_icc",
    "doc_heaps_beta_fit",
    "daily_revenue_max_subarray",
    "ship_delay_huber_location",
    "trade_gravity_fit",
    "priority_price_oaxaca",
    "weekly_growth_accounting",
    "segment_hill_numbers",
    "daily_revenue_variogram",
    "order_gap_hazard_curve",
    "qty_price_quadrant_dependence",
    "tenure_value_curve",
    "token_zipf_alpha_fit",
    "customer_adoption_bass_fit",
    "nation_priority_location_quotient",
    "daily_revenue_hurst_rs",
    "segment_price_iqr_overlap",
    "unit_price_variance_decomposition",
    "region_priority_chi2_residuals",
    "orders_micro_macro_avg",
    "balance_spend_mcc",
    "nation_supply_cr4",
    "order_gap_inspection_paradox",
    "source_burrows_delta",
    "events_value_expected_shortfall",
    "transition_gap_median",
    "weekly_profile_cosine_stability",
    "customer_spend_hoover",
    "alias_candidates",
    "balance_orders_hist2d",
    "benchmark_stats",
    "brand_names_concat",
    "click_purchase_value_cvm",
    "copurchase_degree_assortativity",
    "coref_clusters",
    "reader_conll",
    "reader_simple_jsonl",
    "reader_tsv",
    "reader_pubtator",
    "reader_xml",
    "reader_oke_nif",
    "reader_predictions_ambiverse",
    "reader_tagme",
    "reader_predictions_epgel",
    "reader_predictions_wikifier",
    "reader_predictions_wexea",
    "reader_newscrawl",
    "reader_refined",
    "predictions_text_align",
    "abstracts_mapping",
    "model_ner_linking",
    "entity_dims_load",
    "coref_types_mapping",
    "dedup_embedding_clusters",
    "customer_except",
    "customer_first_order",
    "customer_running_max",
    "customer_spend_atkinson",
    "customer_zero_inflation_score",
    "customers_all_priorities",
    "daily_revenue_adf_stat",
    "daily_revenue_chow_test",
    "daily_revenue_pacf3",
    "daily_revenue_periodogram",
    "dedup_lsh_quality",
    "discount_did_estimate",
    "discount_qty_arc_elasticity",
    "doc_fingerprint",
    "doc_hash16_collisions",
    "doc_loglength_jarque_bera",
    "doc_oov_rate_per_source",
    "doc_token_counts",
    "doc_yule_k",
    "docs_cramers_v",
    "docs_longest",
    "dow_purchase_trend_cochran_armitage",
    "embedding_intrinsic_dim_2nn",
    "embedding_label_silhouette",
    "embedding_whitening_check",
    "entity_popularity",
    "error_purchase_logrank",
    "event_type_fano_factor",
    "events_cohort_ltv",
    "events_cumulative_users",
    "events_distinct_users_approx",
    "events_type_trend",
    "events_value_ecdf_grid",
    "events_value_gpd_tail_fit",
    "events_value_hill_tail_index",
    "hourly_click_purchase_tail_dependence",
    "hourly_count_poisson_gof",
    "hourly_counts_spectral_flatness",
    "hourly_time_reversibility",
    "lineitem_partial_correlation",
    "linkage_ari",
    "linking_eval_counts",
    "monthly_max_gumbel_fit",
    "monthly_price_quantile_bands",
    "most_popular_candidates",
    "nation_acctbal_geomean",
    "nation_balance_bowley_skew",
    "nation_balance_stddev",
    "nation_segment_cube",
    "nation_spend_theil_decomposition",
    "nation_year_kendall_w",
    "order_gap_weibull_fit",
    "order_priority_counts",
    "orders_changepoint",
    "orders_classical_decomposition",
    "orders_grouping_sets",
    "orders_holt_linear",
    "orders_month_seasonality",
    "orders_nearby_counts",
    "orders_price_kde_grid",
    "orders_priority_dense_rank",
    "orders_quarter_index",
    "orders_yearly_growth",
    "paragraph_dedup_audit",
    "part_brand_sets",
    "part_name_monge_elkan",
    "part_type_stats",
    "part_xyz_classes",
    "party_nations_union",
    "popular_linking",
    "prior_linking",
    "priority_jonckheere_trend",
    "priority_price_eta_squared",
    "props_k_kl_uniform",
    "q22_sales_opportunity",
    "qty_cliffs_delta",
    "returnflag_linestatus_gtest",
    "returnflag_weighted_avg",
    "segment_balance_anderson_darling",
    "segment_balance_ansari_bradley",
    "segment_top_decile_lift",
    "ship_delay_gamma_fit",
    "source_flesch_kincaid",
    "source_jsd_matrix",
    "supplier_balance_cume_dist",
    "supplier_nation_balance",
    "title_synonyms",
    "token_burstiness_top",
    "top_customer_order",
    "url_canonicalize",
    "user_activity_lorenz_asymmetry",
    "user_capture_recapture",
    "user_type_cochran_q",
    "weekend_purchase_odds_ratio",
    "yearly_laspeyres_price_index",
    "q1_pricing_summary",
    "q3_top_orders",
    "region_revenue",
    "events_hourly",
    "events_sessions",
    "events_attribution",
    "events_window_counts",
    "events_distinct_users",
    "events_funnel",
    "nation_region_rollup",
    "orders_priority_pivot",
    "customer_running_spend",
    "customer_top3_orders",
    "local_supplier_volume",
    "events_user_gaps",
    "orders_rank_in_customer",
    "customers_inactive",
    "orders_price_histogram",
    "small_quantity_revenue",
    "events_prop_buckets",
    "customer_order_counts",
    "repeat_customers",
    "type_closure",
    "split_assign",
    "unigram_counts",
    "doc_token_quantiles",
    "doc_token_quantiles_approx",
    "doc_tfidf_top3",
    "doc_quality",
    "lang_id",
    "doc_chunks",
    "docs_stratified_sample",
    "events_heavy_hitters",
    "user_top_event",
    "events_moving_avg",
    "bigram_counts",
    "lineitem_price_corr",
    "user_event_entropy",
    "doc_token_quartiles_cont",
    "customer_ntile",
    "part_min_cost_supplier",
    "orders_weekly_gapfill",
    "q7_trade_volume",
    "q10_returned_revenue",
    "q14_promo_revenue",
    "q18_large_volume",
    "q19_disjunctive_revenue",
    "q4_order_priority",
    "q12_late_lines",
    "q13_order_count_distribution",
    "q16_supplier_variety",
    "q21_sole_late_shipper",
    "priority_intersect_all",
    "docs_pack_shards",
    "doc_bpe_token_counts",
    "docs_decontaminate",
    "events_value_kurtosis",
    "purchase_id_gaps",
    "events_trimmed_mean",
    "embedding_kmeans",
    "nation_revenue_share",
    "region_priority_grid",
    "events_dedup_consecutive",
    "nation_balance_band_join",
    "embedding_component_stats",
    "orders_top_price_rank",
    "discount_nullaware_stats",
    "docs_length_pctile",
    "orders_above_customer_avg",
    "orders_price_date_skyline",
    "doc_unigram_logprob",
    "docs_redact_numbers",
    "curation_pipeline",
    "events_anomaly_mad",
    "parts_cosupply_top_pairs",
    "events_retention",
    "event_type_transitions",
    "user_first_last_event",
    "supplier_pctile",
    "lineitem_regr",
    "events_value_skewness",
    "token_zipf",
    "part_name_similarity",
    "nation_balance_full_join",
    "doc_token_mad",
    "events_value_zscore",
    "docs_hash_sample",
    "events_purchaser_events",
    "part_pagerank",
    "supplier_ship_except_all",
    "returnflag_harmonic_qty",
    "unigram_counts_incremental",
    "embedding_stats",
    "embedding_centroids",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "docs_canopy_blocks",
    "knn_cosine",
    "knn_ivf",
    "neardup_embedding",
    "multimodal_features",
    "q6_forecast_revenue",
    "q8_market_share",
    "q15_top_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q20_promotion_suppliers",
    "doc_repetition_stats",
    "nation_metrics_unpivot",
    "cosupply_triangles",
    "supplier_bfs_hops",
    "events_rolling_dau_7d",
    "events_cohort_matrix",
    "events_snapshot_diff",
    "data_quality_audit",
    "docs_lang_source_chi2",
    "token_postings",
    "events_value_winsorized",
    "embedding_pca_top",
    "lang_top_tokens",
    "activity_feed_daily",
    "user_type_breadth_histogram",
    "supplier_degree_histogram",
    "events_time_rollup",
    "user_time_weighted_value",
    "orders_peer_avg_diff",
    "priority_ship_delay",
    "events_value_pct_change",
    "region_acctbal_boxplot",
    "docs_source_dedup_rate",
    "user_value_locf",
    "lineitem_corr_matrix",
    "user_event_type_bitmask",
    "returnflag_weighted_median",
    "nation_balance_gini",
    "user_activity_streaks",
    "order_basket_rules",
    "events_value_benford",
    "user_value_autocorr",
    "customer_rfm_segments",
    "events_purchase_context",
    "events_since_purchase_rank",
    "part_name_split_counts",
    "orders_systematic_sample",
    "nation_share_of_parent",
    "signup_purchase_conversion",
    "events_rolling_median5",
    "nation_segment_welch_t",
    "user_value_ewma",
    "customer_decile_concentration",
    "purchase_followup_counts",
    "users_new_cumulative",
    "events_value_ks",
    "events_mannwhitney_u",
    "user_modal_hour",
    "user_value_cusum",
    "docs_weighted_sample",
    "events_type_anova",
    "orders_ship_busdays",
    "lang_token_js_divergence",
    "user_runs_test",
    "nation_supply_hhi",
    "user_value_interp_hourly",
    "lineitem_qty_chisq_uniform",
    "orders_iso_week",
    "customer_mahalanobis",
    "doc_sentence_stats",
    "events_value_rolling_std5",
    "lang_confusion_matrix",
    "vocab_coverage_90",
    "part_supplier_kcore",
    "blocking_quality",
    "nation_kendall_tau",
    "daily_user_overlap",
    "gap_kaplan_meier",
    "doc_char_entropy",
    "user_phase_value_means",
    "signup_to_purchase_latency",
    "supplier_neighborhood_jaccard",
    "nation_balance_qq",
    "event_type_cosine",
    "part_name_token_pairs",
    "docs_incremental_new",
    "daily_revenue_wow",
    "nation_segment_sets",
    "events_hourly_control_chart",
    "embedding_quantize_check",
    "user_trailing_type_diversity",
    "customer_year_rank_shift",
    "user_idle_share",
    "customers_churned_1998",
    "doc_keyword_context",
    "event_type_target_encoding",
    "doc_trigram_novelty",
    "docs_length_kruskal",
    "supplier_late_wilson",
    "doc_zlib_ratio",
    "session_bounce_rate",
    "events_value_minmax_scaled",
    "customer_abc_class",
    "user_burstiness",
    "events_median_ci",
    "nation_balance_levene",
    "event_type_entropy_rate",
    "dup_cluster_size_histogram",
    "multimodal_audio_energy",
    "multimodal_frame_sample",
    "curated_shard_write",
    "doc_bigram_logprob",
    "events_daily_cycle_strength",
    "nation_spearman",
    "hourly_click_purchase_corr24",
    "value_decile_type_matrix",
    "customer_recency_weighted_spend",
    "customer_third_order",
    "events_type_lift_matrix",
    "customer_order_gap_median",
    "events_weekend_lift",
    "nation_part_coverage",
    "orders_1998_filter_pushdown",
    "embedding_dispersion",
    "session_path_top10",
    "customer_tercile_migration",
    "daily_revenue_trailing30",
    "part_brand_size_median_price",
    "user_active_coverage",
    "user_stickiness",
    "error_burst_peak",
    "orders_empirical_rule",
    "events_value_iqr_outliers",
    "extract_pages",
    "link_frequencies",
    "entity_linking",
    "linkage_clusters",
    "linkage_incremental",
    "part_name_damerau",
    "user_seq_pattern",
    "error_next_purchase_asof",
    "customer_order_overlap_pairs",
    "embedding_dim_argmax",
    "customer_spend_index_first",
    "events_weekend_type_mi",
    "embedding_neighbor_dot",
    "orders_price_page2",
    "docs_source_checksum",
    "sessions_peak_concurrency",
    "supplier_clustering_coeff",
    "customer_max_drawdown",
    "embedding_top_pairs",
    "docs_jsonl_roundtrip",
    "docs_cdc_diff",
    "char_pair_top",
    "name_match_pr_curve",
    "docs_pattern_matrix",
    "embedding_label_cohesion",
    "docs_csv_roundtrip",
    "part_name_prefix_overlap",
    "vocab_growth_curve",
    "user_type_rle_top",
    "docs_k_anonymity",
    "daily_revenue_forecast_mape",
    "events_welch_ttest",
    "purchase_rate_ztest",
    "daily_revenue_autocorr7",
    "orders_benford",
    "customer_spend_gini",
    "docs_orc_roundtrip",
    "daily_revenue_ewma14",
    "user_active_streaks",
    "daily_revenue_rolling_median7",
    "customer_spend_theil",
    "part_token_assortativity",
    "brand_weighted_median_price",
    "nation_type_simpson",
    "events_hour_of_week",
    "user_event_cms_top",
    "events_value_psi",
    "user_purchase_mcnemar",
    "user_activity_powerlaw_alpha",
    "daily_revenue_acf",
    "events_join_size_stat",
    "daily_revenue_volatility",
    "customer_top1pct_share",
    "orders_seasonal_index",
    "nation_top_supplier_share",
    "events_key_skew_report",
    "nation_seat_allocation",
    "part_token_pmi",
    "docs_extract_numbers",
    "daily_revenue_theilsen",
    "daily_revenue_mann_kendall",
    "orders_new_vs_repeat_revenue",
    "lineitem_multiregr",
    "linkage_fs_weights",
    "event_type_walk3",
    "crawl_dedup_survivors",
    "part_rrf_rank",
    "linkage_em_step",
    "user_burst_bots",
    "dedup_containment",
    "part_token_llr",
    "orders_backlog_monthly",
    "nation_pairwise_tstats",
    "event_type_trigrams",
    "part_fuzzy_dictionary_match",
    "order_basket_triples",
    "customer_value_trend",
    "doc_hapax_ratio",
    "url_host_stats",
    "multimodal_phash_dedup",
    "events_sax_symbols",
    "source_pair_containment",
    "events_daily_type_drift",
    "customer_top_order_share",
    "link_density_by_lang",
    "alias_ambiguity_histogram",
    "alias_tie_rate",
    "lineitem_price_residual_top",
    "dedup_hot_shingles",
    "purchase_next_error_1h",
    "nation_acctbal_hodges_lehmann",
    "docs_schema_evolution_union",
    "part_price_isotonic",
    "denormalized_write_roundtrip",
    "containment_pair_alignment",
    "nation_balance_james_stein",
    "orders_benford_second",
    "click_conversion_30m_by_day",
    "user_type_runs_intervals",
    "nation_balance_welch_anova",
    "events_hourly_acf24_by_type",
    "token_top10_other_share",
    "orders_price_round_number_bias",
    "linkage_waterfall_counts",
    "golden_record_conflicts",
    "part_name_phonetic_blocks",
    "containment_transitivity",
    "linkage_fs_score_distribution",
    "session_length_histogram",
    "lang_id_cohens_kappa",
    "event_type_information_gain",
    "basket_size_by_priority",
    "discount_level_revenue",
    "bcubed_lang_source",
    "cramers_v_pairs",
    "ljung_box_daily",
    "block_purging_stats",
    "gk_gamma_discount_qty",
    "snm_window_stats",
    "emd_purchase_view",
    "weighted_jaccard_sources",
    "docs_prefix_dup_clusters",
    "mutual_best_match_parts",
    "session_duration_quantiles",
    "nation_order_gini",
    "haar_energy_daily",
    "events_interarrival_fit",
    "orders_lorenz_deciles",
    "daily_changepoint_binary",
    "tfidf_cosine_name_pairs",
    "customer_same_day_orders",
    "user_type_signature_histogram",
    "fd_violation_audit",
    "zone_map_pruned_scan",
    "nation_top3_orders",
    "pair_feature_table",
    "supplier_grubbs_outlier",
    "entity_cooccurrence_pairs",
    "lineitem_qty_tie_pairs",
    "source_length_ks_drift",
    "multipass_blocking_overlap",
    "daily_window_sum_3p1f",
    "quantile_normalize_purchase_to_view",
    "anchor_length_histogram",
    "sections_per_page_histogram",
    "customer_priority_transitions",
    "doc_ngram_novelty",
    "nation_kruskal_wallis",
    "daily_online_3sigma_flags",
    "source_rle_compressibility",
    "docs_feather_roundtrip",
    "purchase_gini_mean_difference",
    "customer_order_nb_fit",
    "events_hour_circular_stats",
    "urgent_priority_price_auc",
    "source_js_divergence_matrix",
    "qty_stochastic_dominance",
    "user_growth_curve",
    "revenue_pareto_cross",
    "page_paragraph_histogram",
    "daily_runs_up_down",
    "brand_price_median_test",
    "order_to_ship_lead_time",
    "nation_share_of_region",
    "tax_discount_grid_revenue",
    "friedman_dow_revenue",
    "simpson_paradox_check",
]

FLAGSHIP = "linkage_clusters"

# Queries whose sf0.1 wall time showed > 25% run-to-run spread (and
# >= 0.3 s absolute — relative spread on a 50 ms query is noise, not
# timing) in the round-5 back-to-back double-bench window.  Default
# bench runs re-time exactly these, report the MIN, and attach the
# observed spread under "spread" in the output JSON, so
# round-over-round per-query deltas are self-evidencing instead of
# shared-host luck.  Measured 2026-08-21: two full sf0.1 runs landed
# 205.2 s vs 207.2 s (1% total spread, 617 rows); exactly these two
# rows crossed the gate (1.76x and 1.52x — both multi-join TPC-H
# pipelines whose shuffle actors collide with whatever the host runs).
# Re-derive with two full runs when the registry or the host changes.
REPEAT_MIN: set = {"q15_top_supplier", "q8_market_share"}


def _consume(res) -> int:
    """Stream the result to completion; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    return len(res)


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)
    from ray.data import DataContext

    # progress-bar bookkeeping is pure per-op overhead at bench's
    # hundreds of small sequential pipelines
    DataContext.get_current().enable_progress_bars = False


def _num_pages(sf_dir: str) -> int:
    """Input page count of the flagship pipeline (deterministic function
    of the documents table — see elevant_ray/sources/pages.py)."""
    import duckdb

    return duckdb.sql(
        f"""SELECT (count(*)
                    + sum(CASE WHEN doc_id % 25 = 11 THEN 1 ELSE 0 END)
                    + sum(CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END))::BIGINT
            FROM read_parquet('{sf_dir}/documents.parquet')"""
    ).fetchone()[0]


def run_bench(sf_dir: str, num_cpus: int, names,
              warm_memos: bool = True) -> dict:
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm each shared memo as its OWN row first: per-query numbers then
    # measure the query's marginal work, not whichever shared build it
    # happened to trigger first (round-3 deltas were attribution noise).
    # Only for full-registry runs — a --queries subset shouldn't pay
    # (or report) builds it never touches.
    builders = (getattr(entrymod, "memo_builders", dict)()
                if warm_memos else {})
    for mname, builder in builders.items():
        t0 = time.perf_counter()
        try:
            builder(sf_dir)
        except Exception as exc:  # a broken memo shows as its own row
            print(f"# _memo:{mname} FAILED: {exc}", file=sys.stderr)
        timings[f"_memo:{mname}"] = round(time.perf_counter() - t0, 3)
        print(f"# _memo:{mname}: {timings[f'_memo:{mname}']:.3f}s",
              file=sys.stderr)
    spread: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        n = _consume(qs[name](sf_dir))
        t = time.perf_counter() - t0
        if name in REPEAT_MIN:
            # high-spread query (see REPEAT_MIN): report min of two
            # back-to-back runs + the observed spread
            t0 = time.perf_counter()
            n2 = _consume(qs[name](sf_dir))
            t2 = time.perf_counter() - t0
            if n2 != n:   # a row-count divergence is a real bug signal
                print(f"# {name}: NONDETERMINISTIC rows {n} vs {n2}",
                      file=sys.stderr)
                spread[f"{name}:rows_mismatch"] = float(abs(n2 - n))
            spread[name] = round(abs(t - t2) / max(min(t, t2), 1e-9), 3)
            t = min(t, t2)
        timings[name] = round(t, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    return {"metric": "bench_total", "value": total, "unit": "sec",
            "queries": timings, "sf": sf_dir, "num_cpus": num_cpus,
            "spread": spread, "repeat_min": sorted(REPEAT_MIN)}


def run_one(sf_dir: str, num_cpus: int, name: str,
            attach: str = None, expect_nodes: int = 0) -> dict:
    if attach:
        import ray

        # attach to an already-running (multi-node) cluster instead of
        # owning a local session; wait until every expected node
        # registered so the measurement sees the full cluster
        ray.init(address=attach, ignore_reinit_error=True)
        if expect_nodes:
            deadline = time.time() + 30
            while time.time() < deadline:
                alive = [n for n in ray.nodes() if n["Alive"]]
                if len(alive) >= expect_nodes:
                    break
                time.sleep(0.5)
            else:
                raise RuntimeError(
                    f"cluster has {len(alive)} nodes, expected "
                    f"{expect_nodes}")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        num_cpus = int(ray.cluster_resources().get("CPU", 0))
    else:
        _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    t0 = time.perf_counter()
    rows = _consume(entrymod.queries()[name](sf_dir))
    elapsed = time.perf_counter() - t0
    out = {"query": name, "elapsed": round(elapsed, 3), "rows": rows,
           "num_cpus": num_cpus}
    if attach:
        import ray

        out["n_nodes"] = len([n for n in ray.nodes() if n["Alive"]])
    return out


def _scaled_input(sf_dir: str, replicate: int, concat: int = 5) -> str:
    """Deterministically scale documents.parquet into /tmp so the scaling
    run is compute-bound, not overhead-bound.

    Two axes:
    - `concat`: each synthetic doc is the concatenation of `concat`
      consecutive base texts (~1.5 KB at concat=5) — Common-Crawl pages
      are KBs of extracted text, and per-page extract/minhash cost must
      dominate Ray's fixed per-op overhead for the scaling measurement
      to mean anything;
    - `replicate`: replica r gets doc_id + r*10^7 (url-distinct; all
      planted mod-patterns preserved since 10^7 % {5,10,25,50} == 0) and
      every token suffixed with the replica index, so shingle sets never
      collide across replicas — workload per replica is identical,
      cross-replica similarity ~0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = (f"/tmp/graft_scaled_{os.path.basename(sf_dir.rstrip('/'))}"
               f"_x{replicate}_c{concat}")
    out_path = f"{out_dir}/documents.parquet"
    if os.path.exists(out_path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "lang"])
    ids = src.column("doc_id").to_pylist()
    base = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    n = len(base)
    # slot-tag every token so the 5 copies of a base segment are all
    # DISTINCT token streams: without this, docs i and i+1 share 4/5
    # segments and the whole corpus becomes one near-dup chain (measured:
    # ~40× more candidate pairs and a giant merged cluster)
    texts = [" ".join(" ".join(f"{t}s{j}" for t in base[(i + j) % n].split())
                      for j in range(concat))
             for i in range(n)] if concat > 1 else base

    writer = pq.ParquetWriter(out_path, pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]))
    for r in range(replicate):
        if r == 0:
            rep_ids, rep_texts = ids, texts
        else:
            suffix = str(r)
            rep_ids = [i + r * 10_000_000 for i in ids]
            rep_texts = [" ".join(t + suffix for t in txt.split())
                         for txt in texts]
        writer.write_table(pa.table({
            "doc_id": pa.array(rep_ids, pa.int64()),
            "text": pa.array(rep_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }), row_group_size=4096)
    writer.close()
    return out_dir


def run_scaling(sf_dir: str, levels=(8, 32), replicate: int = 0,
                repeats: int = 2) -> dict:
    """Fresh-process runs of the flagship pipeline at each parallelism
    level; pages/s throughput + scaling efficiency.

    `replicate`: 0 = auto (replicate the documents table to ~100k docs
    so per-page compute dominates Ray's fixed per-op overhead); 1 = use
    `sf_dir` as-is."""
    import duckdb

    if replicate == 0:
        n_docs = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
        replicate = max(1, round(500_000 / max(n_docs, 1)))
    if replicate > 1:
        sf_dir = _scaled_input(sf_dir, replicate)
        print(f"# scaling input: {sf_dir} ({replicate}x replicated, 5x concat)",
              file=sys.stderr)
    pages = _num_pages(sf_dir)
    results = {}
    ambient = {}
    for cpus in levels:
        best = None
        loads = []
        for rep in range(repeats):
            pre_load = os.getloadavg()[0]
            cmd = [sys.executable, os.path.abspath(__file__), "--one",
                   FLAGSHIP, "--num-cpus", str(cpus), "--sf-dir", sf_dir]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True)
            child = json.loads(out.stdout.strip().splitlines()[-1])
            post_load = os.getloadavg()[0]
            loads.append(round(max(pre_load, post_load), 1))
            print(f"# scaling num_cpus={cpus} rep{rep}: "
                  f"{child['elapsed']:.3f}s "
                  f"-> {pages / child['elapsed']:.1f} pages/s "
                  f"(loadavg {pre_load:.1f}->{post_load:.1f})",
                  file=sys.stderr)
            # min over repeats: the host box is shared, so the fastest
            # run is the least-interfered estimate of true cost
            if best is None or child["elapsed"] < best["elapsed"]:
                best = child
        results[cpus] = best
        ambient[cpus] = loads
    lo, hi = levels
    thr = {c: pages / results[c]["elapsed"] for c in levels}
    eff = thr[hi] / (thr[lo] * (hi / lo))
    return {
        "metric": "scaling_efficiency", "value": round(eff, 3), "unit": "ratio",
        "queries": {
            f"{FLAGSHIP}_cpus{lo}_sec": results[lo]["elapsed"],
            f"{FLAGSHIP}_cpus{hi}_sec": results[hi]["elapsed"],
            f"pages_per_sec_cpus{lo}": round(thr[lo], 2),
            f"pages_per_sec_cpus{hi}": round(thr[hi], 2),
        },
        "sf": sf_dir, "num_cpus": hi, "pages": pages,
        "levels": list(levels),
        # ambient 1-min load average around each repeat: on this shared
        # single-CPU host the ratio is only meaningful when these are
        # comparable across levels (see BASELINE.md)
        "ambient_loadavg": {str(c): ambient[c] for c in levels},
    }


def _ray_cli(*cli_args, check=True):
    import subprocess as sp

    return sp.run([sys.executable, "-m", "ray.scripts.scripts", *cli_args],
                  capture_output=True, text=True, check=check)


def run_scaling_nodes(sf_dir: str, node_levels=(1, 4),
                      cpus_per_node: int = 8, replicate: int = 0,
                      repeats: int = 2) -> dict:
    """North-rule scaling evidence in NODE counts: the flagship runs on
    an N-node and a 4N-node Ray cluster (`ray start --head` + worker
    raylets) on the same input; pages/s at both plus efficiency
    thr_4N / (4 * thr_N).

    The sandbox is one host, so a "node" is a raylet process with its
    own object store: inter-node object transfer is real (plasma →
    loopback TCP push/pull between stores, the same data path as a
    wire), while CPU stays un-oversubscribed (node_levels[-1] ×
    cpus_per_node ≤ the host's 32).  The measuring child ATTACHES to
    the running cluster (``ray.init(address=…)``) exactly as a
    ``ray job submit`` entrypoint would — the cluster, not the child,
    owns scheduling and placement across nodes."""
    import duckdb

    if replicate == 0:
        n_docs = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
        replicate = max(1, round(500_000 / max(n_docs, 1)))
    if replicate > 1:
        sf_dir = _scaled_input(sf_dir, replicate)
        print(f"# scaling input: {sf_dir} ({replicate}x replicated)",
              file=sys.stderr)
    pages = _num_pages(sf_dir)
    addr = "127.0.0.1:6379"
    results, ambient = {}, {}
    try:
        for n_nodes in node_levels:
            _ray_cli("stop", "--force", check=False)
            time.sleep(2)
            # bounded per-node object stores: 4 nodes must coexist in
            # the host's 128 GiB without the 30%-of-RAM default x4
            _ray_cli("start", "--head", "--port", "6379",
                     "--num-cpus", str(cpus_per_node),
                     "--object-store-memory", str(6 << 30),
                     "--include-dashboard", "false")
            for _ in range(n_nodes - 1):
                _ray_cli("start", "--address", addr,
                         "--num-cpus", str(cpus_per_node),
                         "--object-store-memory", str(6 << 30))
            best, loads = None, []
            for rep in range(repeats):
                pre_load = os.getloadavg()[0]
                env = dict(os.environ, RAY_ADDRESS=addr)
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--one", FLAGSHIP, "--sf-dir", sf_dir,
                       "--attach", addr,
                       "--expect-nodes", str(n_nodes)]
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     check=True, env=env)
                child = json.loads(out.stdout.strip().splitlines()[-1])
                assert child.get("n_nodes", 0) >= n_nodes, child
                post_load = os.getloadavg()[0]
                loads.append(round(max(pre_load, post_load), 1))
                print(f"# scaling nodes={n_nodes} rep{rep}: "
                      f"{child['elapsed']:.3f}s -> "
                      f"{pages / child['elapsed']:.1f} pages/s "
                      f"(cluster cpus {child['num_cpus']}, "
                      f"loadavg {pre_load:.1f}->{post_load:.1f})",
                      file=sys.stderr)
                if best is None or child["elapsed"] < best["elapsed"]:
                    best = child
            results[n_nodes] = best
            ambient[n_nodes] = loads
    finally:
        _ray_cli("stop", "--force", check=False)
    lo, hi = node_levels
    thr = {c: pages / results[c]["elapsed"] for c in node_levels}
    eff = thr[hi] / (thr[lo] * (hi / lo))
    return {
        "metric": "scaling_efficiency_nodes", "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"{FLAGSHIP}_nodes{lo}_sec": results[lo]["elapsed"],
            f"{FLAGSHIP}_nodes{hi}_sec": results[hi]["elapsed"],
            f"pages_per_sec_nodes{lo}": round(thr[lo], 2),
            f"pages_per_sec_nodes{hi}": round(thr[hi], 2),
        },
        "sf": sf_dir, "pages": pages,
        "levels": list(node_levels), "level_unit": "nodes",
        "cpus_per_node": cpus_per_node,
        "num_cpus": cpus_per_node * hi,
        "ambient_loadavg": {str(c): ambient[c] for c in node_levels},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF)
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--replicate", type=int, default=0,
                    help="scaling-input replication factor (0 = auto)")
    ap.add_argument("--repeats", type=int, default=2,
                    help="scaling runs per level (min taken; shared host)")
    ap.add_argument("--levels", default="8,32",
                    help="comma-separated num_cpus levels for --scaling (N,4N)")
    ap.add_argument("--scaling-nodes", action="store_true",
                    help="scaling with NODE counts: multi-raylet local "
                         "cluster, levels from --node-levels")
    ap.add_argument("--node-levels", default="1,4",
                    help="comma-separated node counts for --scaling-nodes")
    ap.add_argument("--cpus-per-node", type=int, default=8)
    ap.add_argument("--attach", default=None,
                    help="(child mode) attach to a running cluster at "
                         "this address instead of a local session")
    ap.add_argument("--expect-nodes", type=int, default=0,
                    help="(child mode) wait until this many nodes are "
                         "alive before timing")
    ap.add_argument("--one", metavar="QUERY", default=None)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of BENCH_QUERIES")
    args = ap.parse_args()

    if args.one:
        payload = run_one(args.sf_dir, args.num_cpus, args.one,
                          attach=args.attach,
                          expect_nodes=args.expect_nodes)
    elif args.scaling_nodes:
        node_levels = tuple(int(x) for x in args.node_levels.split(","))
        payload = run_scaling_nodes(args.sf_dir, node_levels=node_levels,
                                    cpus_per_node=args.cpus_per_node,
                                    replicate=args.replicate,
                                    repeats=args.repeats)
    elif args.scaling:
        levels = tuple(int(x) for x in args.levels.split(","))
        payload = run_scaling(args.sf_dir, levels=levels,
                              replicate=args.replicate, repeats=args.repeats)
    else:
        names = args.queries.split(",") if args.queries else BENCH_QUERIES
        payload = run_bench(args.sf_dir, args.num_cpus, names,
                            warm_memos=args.queries is None)

    print(json.dumps(payload))

    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
