"""Query inventory: each module exposes ``QUERIES`` (name ->
callable(spark, sf_dir) -> DataFrame) and ``ORACLES`` (name ->
DuckDB-runnable ANSI SQL). Keys match SURVEY.md §2.

Key order matters operationally: the driver's correctness run checks
a bounded 50-key prefix of the dict, so ordering is an evidence-
freshness policy. Round-7 policy (VERDICT r06 "Next round" #3),
generalized from the per-round tier lists of earlier rounds:

  1. keys NEVER driver-checked (new this round) lead;
  2. then keys whose query plan changed this round (_PLAN_CHANGED,
     VERDICT r09 #2): a fresh plan deserves fresh independent
     attestation even if its old plan was recently green;
  3. then every key ascending by the round of its most recent
     driver evidence (_LAST_CHECKED, regenerated each round from
     the CORRECTNESS_r0N.json files) — oldest evidence first, ties
     alphabetical;
  4. rows-only-by-design keys (s02, d12 — scale-path keys whose
     exact twin would pollute their own plan; evidence lives in
     recall/property tests) last: a driver row for them adds little.

The r10 prefix is therefore the never-checked round-10 keys in
alphabetical order (d26_url_domains, p20_domain_caps,
s18_index_query), then the force-included plan-changed keys ordered
by (evidence round, name) — p03_pack_sequences (r6 evidence, r10
BPE-currency change), then d25_line_dedup / p19_pipeline_manifest /
t29_gopher_repetition (r8 evidence, r9 plan changes) — then the
r05-evidence cohort.
"""

from __future__ import annotations

from llamadb_spark.queries import (
    advanced,
    core,
    events,
    olap,
    pipeline,
    surface,
    surface2,
    tpch,
)

_MODULES = (core, pipeline, events, olap, surface, advanced, surface2, tpch)

#: Banded-oracle keys (rows-only keys converted in round 6 to
#: within-band boolean contracts): their plans deliberately compute
#: an exact attestation twin alongside the sketch. Referenced by
#: bench.py to split the headline into scale-path vs evidence cost.
_BANDED_R06 = (
    "a02_approx_stats", "a06_sketch_rollup", "t13_heavy_hitters",
    "s03_ivf_ann", "d18_minhash_calibration", "d03_minhash_lsh",
    "d04_simhash", "p03_pack_sequences", "s09_pca_project",
    "s10_mmr_rerank", "s12_cluster_balance", "t26_compression_ratio",
    "m07_crossmodal_knn",
    # round-7/8 banded additions (same exact-twin attestation shape)
    "s16_pq_ann", "s17_ivfpq_ann",
    # round-10: persisted-index query (s17's banded shape; the exact
    # twin is the attestation cost, the probe->ADC->rerank is the
    # scale path)
    "s18_index_query",
)

#: Round of each key's most recent driver-side correctness evidence
#: (union over CORRECTNESS_r01-r07; regenerate when rotating). Keys
#: absent here have never been driver-checked and lead the queue.
_LAST_CHECKED = {
    "a01_asof_join": 7,
    "a02_approx_stats": 6,
    "a03_asof_forward": 8,
    "a04_asof_tolerance": 9,
    "a05_asof_nearest": 9,
    "a06_sketch_rollup": 6,
    "a07_twap": 8,
    "d01_exact_dedup": 6,
    "d02_jaccard_ngram": 6,
    "d03_minhash_lsh": 6,
    "d04_simhash": 6,
    "d05_embed_neardup": 6,
    "d06_dedup_clusters": 6,
    "d07_dedup_apply": 6,
    "d08_semantic_dedup_apply": 7,
    "d09_shared_longrun": 7,
    "d10_dedup_clusters_star": 7,
    "d11_editdist_pairs": 7,
    "d13_incremental_dedup": 8,
    "d14_containment_pairs": 8,
    "d15_cluster_sizes": 9,
    "d16_threshold_sweep": 9,
    "d17_pair_provenance": 9,
    "d18_minhash_calibration": 6,
    "d19_substring_spans": 7,
    "d20_substring_apply": 7,
    "d21_duplication_profile": 7,
    "d22_intra_doc_repeats": 7,
    "d23_intra_doc_apply": 8,
    "d24_quality_dedup_reps": 8,
    "d25_line_dedup": 8,
    "e01_events_window": 7,
    "e02_sessionize": 7,
    "e03_event_topk": 7,
    "e04_sliding_window": 7,
    "e05_running_totals": 7,
    "e06_resample_ffill": 7,
    "e07_stream_enrich": 7,
    "e08_rate_anomaly": 7,
    "e09_funnel": 7,
    "e10_retention": 7,
    "e11_session_window": 7,
    "e12_cdc_snapshot": 7,
    "e13_gap_detection": 7,
    "e14_conversion_latency": 7,
    "e15_rolling_wau": 7,
    "e16_interarrival_stats": 7,
    "e17_cep_match": 8,
    "e18_bot_users": 8,
    "e19_seasonality": 9,
    "e20_user_concentration": 9,
    "e21_transition_matrix": 9,
    "e22_session_durations": 9,
    "e23_weekly_churn": 9,
    "e24_transition_stream": 9,
    "g01_pagerank": 8,
    "g02_degree_histogram": 8,
    "g03_triangle_count": 9,
    "h03_shipping_priority": 8,
    "h04_priority_checking": 8,
    "h05_local_supplier_volume": 8,
    "h06_revenue_forecast": 8,
    "h07_volume_shipping": 8,
    "h09_product_type_profit": 8,
    "h10_returned_items": 8,
    "h11_important_stock": 8,
    "h12_ship_priority_class": 8,
    "h14_promo_effect": 8,
    "h16_supplier_counts": 8,
    "h18_large_orders": 8,
    "h19_discounted_revenue": 8,
    "h20_potential_promotion": 8,
    "h21_waiting_suppliers": 8,
    "m01_multimodal_meta": 7,
    "m02_decode_resize": 7,
    "m03_frame_sample": 7,
    "m04_payload_chunks": 7,
    "m05_media_dedup": 8,
    "m06_media_filter": 9,
    "m07_crossmodal_knn": 6,
    "p01_stratified_sample": 7,
    "p02_contamination": 7,
    "p03_pack_sequences": 6,
    "p04_profile": 7,
    "p05_tombstone_delete": 7,
    "p06_dataset_split": 7,
    "p07_mixture_sample": 7,
    "p08_dq_report": 7,
    "p09_exact_k_sample": 7,
    "p10_leakproof_split": 7,
    "p11_weighted_sample": 8,
    "p12_dup_weights": 9,
    "p13_winsorize": 9,
    "p14_shard_balance": 9,
    "p15_token_budget_select": 9,
    "p16_epoch_upsample": 9,
    "p17_alpha_mixture": 9,
    "p18_span_decontaminate": 7,
    "p19_pipeline_manifest": 8,
    "q01_pricing_summary": 6,
    "q02_filter_scan": 6,
    "q03_cross_join_where": 6,
    "q04_inner_join": 6,
    "q05_left_join": 6,
    "q06_correlated_subquery": 6,
    "q07_scalar_subquery": 6,
    "q08_group_having": 6,
    "q09_order_limit": 6,
    "q10_distinct": 6,
    "q11_expressions": 6,
    "q12_in_subquery": 6,
    "q13_exists": 6,
    "q14_case_expr": 6,
    "q15_agg_minmax": 6,
    "q16_revenue_by_nation": 6,
    "q17_union_all": 6,
    "q18_window_rank": 6,
    "q19_rollup": 7,
    "q20_pivot": 8,
    "q21_order_count_dist": 6,
    "q22_anti_join": 6,
    "q23_cube": 6,
    "q24_corr_agg_subquery": 6,
    "q25_set_ops": 6,
    "q26_window_suite": 6,
    "q27_date_parts": 6,
    "q28_string_funcs": 6,
    "q29_grouping_sets": 6,
    "q30_null_handling": 6,
    "q31_percentiles": 8,
    "q32_stats_agg": 8,
    "q33_full_outer_join": 8,
    "q34_explode_tokens": 8,
    "q35_json_extract": 8,
    "q36_regexp_extract": 8,
    "q37_decimal_exact": 9,
    "q38_range_frame": 9,
    "q39_semi_join": 9,
    "q40_conditional_agg": 9,
    "q41_array_hof": 9,
    "q42_cte_top_supplier": 9,
    "q43_min_cost_supplier": 9,
    "q44_market_share": 9,
    "q45_unpivot": 9,
    "q46_scd2_intervals": 9,
    "q47_window_dist": 9,
    "q48_grouping_id": 9,
    "q49_pagination": 9,
    "q50_nulls_order": 9,
    "q51_string_agg": 9,
    "q52_histogram": 9,
    "q53_mode_disc": 9,
    "q54_lateral_topk": 9,
    "q55_right_join": 9,
    "q56_qualify_latest": 9,
    "q57_values_inline": 9,
    "q58_date_arith": 9,
    "q59_multi_pivot": 9,
    "q60_rows_frame": 9,
    "q61_recursive_cte": 5,
    "q62_set_ops_all": 5,
    "q63_group_by_all": 5,
    "q64_exists_projection": 5,
    "q65_insert_select": 5,
    "q66_sort_key": 5,
    "q67_merge_upsert": 5,
    "q68_ignore_nulls_window": 7,
    "r01_range_join": 8,
    "s01_knn_bruteforce": 6,
    "s03_ivf_ann": 6,
    "s04_embed_quantize": 8,
    "s05_label_centroids": 8,
    "s06_centroid_sim": 8,
    "s07_centroid_classify": 8,
    "s08_embed_dim_stats": 8,
    "s09_pca_project": 6,
    "s10_mmr_rerank": 6,
    "s11_rerank_ann": 9,
    "s12_cluster_balance": 6,
    "s13_filtered_knn": 5,
    "s14_silhouette": 5,
    "s15_hybrid_rrf": 6,
    "s16_pq_ann": 7,
    "s17_ivfpq_ann": 8,
    "t01_langid": 6,
    "t02_quality_score": 7,
    "t03_token_count": 7,
    "t04_fingerprint": 7,
    "t05_vocab_topk": 7,
    "t06_repetition": 7,
    "t07_pii_scrub": 7,
    "t08_chunk_documents": 7,
    "t09_tfidf_rank": 8,
    "t10_token_entropy": 8,
    "t11_langid_confusion": 8,
    "t12_pmi_collocations": 8,
    "t13_heavy_hitters": 6,
    "t14_unigram_logprob": 8,
    "t15_doc_keywords": 8,
    "t16_bigram_logprob": 9,
    "t17_zipf_slope": 9,
    "t19_token_yield": 9,
    "t20_quality_deciles": 9,
    "t21_source_overlap": 5,
    "t22_source_divergence": 5,
    "t23_token_fertility": 5,
    "t24_quality_bands": 5,
    "t25_vocab_growth": 5,
    "t26_compression_ratio": 6,
    "t27_bm25_rank": 6,
    "t28_linear_quality": 7,
    "t29_gopher_repetition": 8,
    "t30_bpe_tokens": 9,
    "t31_bpe_fertility": 9,
}

#: Keys whose query PLAN materially changed during the CURRENT round
#: (or, for round 10, whose r9 plan change has only local-parity
#: evidence — VERDICT r09 #2): they outrank the oldest-evidence
#: cohort so the driver independently attests the NEW plan this
#: round instead of waiting for the rotation to come back around.
#: Reset/regenerate each round alongside _LAST_CHECKED.
_PLAN_CHANGED = frozenset({
    "d25_line_dedup",        # r9: window -> agg+join-back keep-first
    "t29_gopher_repetition", # r9: descending-sequence guard
    "p19_pipeline_manifest", # r9: staged detection + BPE budgets
    "p03_pack_sequences",    # r10: BPE token-counter threading
})

#: Rows-only BY DESIGN (not convertible without polluting the scale
#: path's own plan with its exact O(N^2) twin): evidence is
#: recall/property tests, so a driver prefix slot is better spent on
#: a hash-attestable key.
_ROWS_ONLY_BY_DESIGN = frozenset({"s02_lsh_ann", "d12_semantic_dedup_lsh"})

#: Keys whose query PLAN deliberately contains driver-attestation
#: work beyond the scale path (the banded-oracle keys compute an
#: exact twin alongside the sketch so DuckDB can hash-check the
#: band). bench.py flags these per key so the headline can be read
#: with and without evidence cost (VERDICT r06 #9).
ATTESTATION_KEYS = frozenset(_BANDED_R06)


def _rank(k: str) -> tuple:
    if k in _ROWS_ONLY_BY_DESIGN:
        return (3, 0, k)
    if k not in _LAST_CHECKED:
        return (0, 0, k)  # never driver-checked: lead
    if k in _PLAN_CHANGED:
        return (1, _LAST_CHECKED[k], k)  # plan changed: re-attest now
    return (2, _LAST_CHECKED[k], k)


def _rotated(merged):
    return {k: merged[k] for k in sorted(merged, key=_rank)}


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _rotated(out)


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _rotated(out)
