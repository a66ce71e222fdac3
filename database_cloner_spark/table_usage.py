"""Declared table usage per registered query key.

The adversarial parity suites (tests/test_adversarial_*.py) select the
keys they can run against a nasty-twin fixture dir by the TABLES a key
touches. That selection used to regex-scrape the oracle SQL for table
names — fragile both ways: an oracle that merely *mentions* another
table name (a comment, an identifier with real word boundaries) was
silently excluded, and a constant-output oracle (`SELECT TRUE …`, the
approx-tolerance checks) hid the builder's real input (ADVICE r4).

This map is the explicit source of truth: for each key, every fixture
table its BUILDER loads or its ORACLE references. It is hand-audited;
tests/test_table_usage.py cross-checks it against both a builder-source
scan and an oracle-SQL scan, so it cannot silently rot — a new key
without an entry, or an entry drifting from the code, fails CI.
"""

from __future__ import annotations

# All ten fixture tables — for keys that scan the whole namespace.
ALL_TABLES = (
    "customer",
    "documents",
    "embeddings",
    "events",
    "lineitem",
    "nation",
    "orders",
    "part",
    "region",
    "supplier",
)

TABLES_BY_KEY: dict[str, tuple[str, ...]] = {
    "q18_large_orders": ("customer", "lineitem", "orders"),
    "q1_pricing_summary": ("lineitem",),
    "q3_shipping_priority": ("customer", "lineitem", "orders"),
    "q_anomaly_mad": ("events",),
    "q_agg_approx_distinct": ("lineitem",),
    "q_agg_approx_percentile": ("lineitem",),
    "q_agg_collect": ("customer", "nation"),
    "q_agg_count_by_group": ("events",),
    "q_agg_count_filtered": ("events",),
    "q_agg_count_schema": ("customer",),
    "q_agg_cube": ("lineitem",),
    "q_agg_distinct": ("lineitem",),
    "q_agg_exists": ("orders",),
    "q_agg_grouping_sets": ("lineitem",),
    "q_agg_histogram": ("lineitem",),
    "q_agg_minmax_checksum": ("orders",),
    "q_agg_argminmax": ("events",),
    "q_agg_mode": ("orders",),
    "q_agg_percentile": ("documents",),
    "q_agg_rollup": ("customer", "nation", "region"),
    "q_agg_salted": ("events",),
    "q_agg_sum_scalar": ("events",),
    "q_agg_winsorize": ("documents",),
    "q_array_ops": ("embeddings",),
    "q_bloom_probe": ("customer", "orders"),
    "q_contamination": ("documents",),
    "q_corr_subquery": ("lineitem",),
    "q_curate_corpus": ("documents",),
    "q_date_format": ("orders",),
    "q_dedup_apply": ("documents",),
    "q_dedup_cluster": ("documents",),
    "q_dedup_cluster_star": ("documents",),
    "q_dedup_embedding": ("embeddings",),
    "q_dedup_embedding_bucketed": ("embeddings",),
    "q_dedup_exact": ("documents",),
    "q_dedup_fuzzy": ("documents",),
    "q_dedup_minhash": ("documents",),
    "q_dedup_names_ed1": ("customer",),
    "q_dedup_ngram": ("documents",),
    "q_dedup_simhash": ("documents",),
    "q_except_diff": ("lineitem", "orders"),
    "q_filter_conj": ("events",),
    "q_filter_eq": ("nation",),
    "q_filter_in": ("orders",),
    "q_filter_neq": ("events",),
    "q_filter_notpid": ("events",),
    "q_filter_prefix": ("customer",),
    "q_filter_rlike": ("documents",),
    "q_freq_sketch_topk": ("orders",),
    "q_funnel": ("events",),
    "q_intersect": ("lineitem", "orders"),
    "q_join_anti": ("customer", "orders"),
    "q_join_asof": ("events",),
    "q_join_broadcast": ("customer", "nation", "region"),
    "q_join_bloom_semi": ("customer", "orders"),
    "q_join_bucketed": ("lineitem", "orders"),
    "q_join_inner": ("customer", "orders"),
    "q_join_multiway": ("customer", "lineitem", "nation", "orders", "region"),
    "q_join_outer_diff": ("lineitem", "orders"),
    "q_join_range": ("orders", "region"),
    "q_join_range_grid": ("nation", "orders"),
    "q_join_interval_overlap": ("customer", "supplier"),
    "q_join_salted": ("events",),
    "q_join_semi": ("customer", "orders"),
    "q_json_extract": ("events",),
    "q_limit_probe": ("region",),
    "q_map_config": ("nation",),
    "q_math_arith": ("lineitem",),
    "q_events_markov": ("events",),
    "q_merge_upsert": ("orders",),
    "q_multimodal_frames": ("documents",),
    "q_multimodal_meta": ("documents",),
    "q_pack_bins": ("documents",),
    "q_pack_sequences": ("documents",),
    "q_pandas_udf_norm": ("events",),
    "q_pivot_events": ("events",),
    "q_project": ("events",),
    "q_rand_string": ("nation",),
    "q_sample_mixture": ("documents",),
    "q_sample_pergroup": ("documents",),
    "q_sample_split": ("documents",),
    "q_sample_weighted": ("documents",),
    "q_sample_stratified": ("documents",),
    "q_sample_token_budget": ("documents",),
    "q_scan_binary": ALL_TABLES,  # binaryFile scan of the whole sf_dir
    "q_scan_catalog": ALL_TABLES,
    "q_scan_delim": ("customer",),
    "q_scan_document": ("events",),
    "q_scan_full": ("region",),
    "q_scan_json": ("events",),
    "q_scan_kv_config": ("nation",),
    "q_scan_orc": ("part",),
    "q_shuffle_deterministic": ("documents",),
    "q_sim_ivf_kmeans_topk": ("embeddings",),
    "q_sim_ivf_topk": ("embeddings",),
    "q_sim_ivfpq_topk": ("embeddings",),
    "q_sim_pq_topk": ("embeddings",),
    "q_sim_topk": ("embeddings",),
    "q_sim_topk_pandas": ("embeddings",),
    "q_sort": ("orders",),
    "q_sort_zorder": ("orders",),
    "q_sql_surface": ("lineitem",),
    "q_agg_median_exact": ("lineitem",),
    "q_agg_quartiles": ("lineitem",),
    "q_agg_weighted_median": ("lineitem",),
    "q_stats_chi2": ("documents",),
    "q_stats_corr_matrix": ("events",),
    "q_stats_moments": ("events",),
    "q_win_rolling_slope": ("events",),
    "q_stats_regression": ("orders",),
    "q_stats_ttest": ("events",),
    "q_str_concat": ("nation",),
    "q_str_mask": ("supplier",),
    "q_str_quote_ident": ("part",),
    "q_str_replace": ("supplier",),
    "q_str_split_explode": ("documents",),
    "q_str_strip_prefix": ("customer",),
    "q_str_trim": ("customer",),
    "q_text_bm25": ("documents",),
    "q_stream_dedup": ("events",),
    "q_stream_heavy_hitters": ("events",),
    "q_stream_interval_join": ("events",),
    "q_stream_session": ("events",),
    "q_stream_sliding": ("events",),
    "q_stream_stateful_totals": ("events",),
    "q_stream_tumbling": ("events",),
    "q_stream_watermark_late": ("events",),
    "q_struct_access": ("events",),
    "q_text_chunk": ("documents",),
    "q_text_fingerprint": ("documents",),
    "q_text_lang_stats": ("documents",),
    "q_text_langid": ("documents",),
    "q_text_line_dedup": ("documents",),
    "q_text_pii_scrub": ("documents",),
    "q_text_quality": ("documents",),
    "q_text_rarity": ("documents",),
    "q_text_repetition": ("documents",),
    "q_text_tfidf": ("documents",),
    "q_text_tokens": ("documents",),
    "q_text_tokens_re": ("documents",),
    "q_text_vocab": ("documents",),
    "q_topk": ("orders",),
    "q_ts_gapfill": ("events",),
    "q_ts_interpolate": ("events",),
    "q_ts_downsample_ohlc": ("events",),
    "q_ts_autocorr": ("events",),
    "q_ts_seasonality": ("events",),
    "q_ts_ewma": ("events",),
    "q_ts_rate_of_change": ("events",),
    "q_text_diversity": ("documents",),
    "q_join_asof_nearest": ("events",),
    "q_graph_triangles": ("documents",),
    "q_dq_benford": ("orders",),
    "q_dq_constraints": ("customer", "lineitem", "orders"),
    "q_dq_freshness": ("events",),
    "q_dq_profile": ("orders",),
    "q_dq_skew": ("lineitem",),
    "q_graph_degree": ("documents",),
    "q_graph_pagerank": ("lineitem", "orders"),
    "q_text_pmi": ("documents",),
    "q_ts_changepoint": ("events",),
    "q_ts_crosscorr": ("events",),
    "q_retention_cohort": ("events",),
    "q_udf_password": ("nation",),
    "q_udf_template": ("nation",),
    "q_udtf_explode_config": ("region",),
    "q_udtf_python": ("documents",),
    "q_union_append": ("customer", "supplier"),
    "q_unpivot_melt": ("lineitem",),
    "q_win_dist": ("documents",),
    "q_win_frame_values": ("events",),
    "q_win_lag_gap": ("events",),
    "q_win_moving_avg": ("events",),
    "q_win_ntile": ("customer",),
    "q_win_rank": ("customer", "nation"),
    "q_win_rownum_dedup": ("events",),
    "q_win_streaks": ("events",),
    "q_win_running_sum": ("events",),
    "q_win_sessionize": ("events",),
}


def keys_reading_only(tables: set[str], oracled_only: bool = True) -> list[str]:
    """Registered keys whose declared table set is a non-empty subset of
    `tables` — i.e. a fixture dir providing exactly `tables` satisfies
    every input the key (builder AND oracle) needs."""
    from database_cloner_spark.registry import specs

    out = []
    for name, spec in specs().items():
        if oracled_only and spec.oracle is None:
            continue
        # A key missing from the map is ONE red test in test_table_usage
        # (test_map_is_complete_and_not_stale), not an import-time KeyError
        # that kills collection of every parity suite (r5: one missing
        # entry made 6 files uncollectable).
        used = set(TABLES_BY_KEY.get(name, ()))
        if used and used <= tables:
            out.append(name)
    return sorted(out)
