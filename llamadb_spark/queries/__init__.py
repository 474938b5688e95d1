"""Query inventory: each module exposes ``QUERIES`` (name ->
callable(spark, sf_dir) -> DataFrame) and ``ORACLES`` (name ->
DuckDB-runnable ANSI SQL). Keys match SURVEY.md §2.

Key order matters operationally: the driver's correctness run checks
a bounded 50-key prefix of the dict, so ordering is an evidence-
freshness policy. Round-6 policy (VERDICT r05 "Next round" #1+#2):

  1. keys whose oracle is NEW this round (the 13 rows-only keys
     converted to banded-boolean/exact oracles — they have never had
     a hash-green driver row and the judge ranked attesting them
     highest-leverage);
  2. then keys by OLDEST driver evidence first (r01/r02-attested
     core-SQL and early pipeline keys, whose rows predate three
     rounds of code movement), then r03, r04, r05;
  3. rows-only-by-design keys (s02, d12 — scale-path keys whose
     exact twin would pollute their own plan; evidence lives in
     recall/property tests) last: a driver row for them adds little.

The resulting 50-key r06 prefix = the 13 newly-oracled keys + the 2
brand-new round-6 keys (BM25 / hybrid RRF) + the 35 oldest r01/r02
keys; its only overlap with r05's prefix is the newly-oracled keys
themselves (which r05 could record only as ``no_oracle``).
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

#: Keys NEW in round 6 (never driver-checked at all) — right behind
#: the banded conversions in the prefix.
_NEW_R06 = ("t27_bm25_rank", "s15_hybrid_rrf")

#: Rows-only keys converted to banded-boolean/exact oracles in round
#: 6 — front of the queue for their first hash-attestable driver row.
_BANDED_R06 = (
    "a02_approx_stats", "a06_sketch_rollup", "t13_heavy_hitters",
    "s03_ivf_ann", "d18_minhash_calibration", "d03_minhash_lsh",
    "d04_simhash", "p03_pack_sequences", "s09_pca_project",
    "s10_mmr_rerank", "s12_cluster_balance", "t26_compression_ratio",
    "m07_crossmodal_knn",
)

#: Driver-attested in CORRECTNESS_r01/r02 (oldest evidence).
_EVIDENCE_R12 = frozenset(
    {
        "d01_exact_dedup", "d02_jaccard_ngram", "d03_minhash_lsh",
        "d04_simhash", "d05_embed_neardup", "d06_dedup_clusters",
        "d07_dedup_apply", "m01_multimodal_meta", "m02_decode_resize",
        "p01_stratified_sample", "p02_contamination", "q01_pricing_summary",
        "q02_filter_scan", "q03_cross_join_where", "q04_inner_join",
        "q05_left_join", "q06_correlated_subquery", "q07_scalar_subquery",
        "q08_group_having", "q09_order_limit", "q10_distinct",
        "q11_expressions", "q12_in_subquery", "q13_exists",
        "q14_case_expr", "q15_agg_minmax", "q16_revenue_by_nation",
        "q17_union_all", "q18_window_rank", "q21_order_count_dist",
        "q22_anti_join", "q23_cube", "q24_corr_agg_subquery",
        "q25_set_ops", "q26_window_suite", "q27_date_parts",
        "q28_string_funcs", "q29_grouping_sets", "q30_null_handling",
        "s01_knn_bruteforce", "s02_lsh_ann", "s03_ivf_ann",
        "t01_langid", "t02_quality_score", "t03_token_count",
        "t04_fingerprint", "t05_vocab_topk", "t06_repetition",
        "t07_pii_scrub", "t08_chunk_documents",
    }
)

#: Driver-attested in CORRECTNESS_r03.
_EVIDENCE_R3 = frozenset(
    {
        "a01_asof_join", "d08_semantic_dedup_apply", "d09_shared_longrun",
        "d10_dedup_clusters_star", "d11_editdist_pairs", "e01_events_window",
        "e02_sessionize", "e03_event_topk", "e04_sliding_window",
        "e05_running_totals", "e06_resample_ffill", "e07_stream_enrich",
        "e08_rate_anomaly", "e09_funnel", "e10_retention",
        "e11_session_window", "e12_cdc_snapshot", "e13_gap_detection",
        "e14_conversion_latency", "e15_rolling_wau", "e16_interarrival_stats",
        "m03_frame_sample", "m04_payload_chunks", "p04_profile",
        "p05_tombstone_delete", "p06_dataset_split", "p07_mixture_sample",
        "p08_dq_report", "p09_exact_k_sample", "p10_leakproof_split",
        "q19_rollup", "q20_pivot", "q31_percentiles", "q32_stats_agg",
        "q33_full_outer_join", "q34_explode_tokens", "q35_json_extract",
        "q36_regexp_extract", "r01_range_join", "s04_embed_quantize",
        "s05_label_centroids", "s06_centroid_sim", "s07_centroid_classify",
        "s08_embed_dim_stats", "t09_tfidf_rank", "t10_token_entropy",
        "t11_langid_confusion", "t12_pmi_collocations", "t14_unigram_logprob",
        "t15_doc_keywords",
    }
)

#: Driver-attested in CORRECTNESS_r04.
_EVIDENCE_R4 = frozenset(
    {
        "a03_asof_forward", "d13_incremental_dedup",
        "d14_containment_pairs", "e17_cep_match", "e18_bot_users",
        "g01_pagerank", "g02_degree_histogram", "h03_shipping_priority",
        "h04_priority_checking", "h05_local_supplier_volume",
        "h06_revenue_forecast", "h07_volume_shipping",
        "h09_product_type_profit", "h10_returned_items",
        "h11_important_stock", "h12_ship_priority_class",
        "h14_promo_effect", "h16_supplier_counts", "h18_large_orders",
        "h19_discounted_revenue", "h20_potential_promotion",
        "h21_waiting_suppliers", "m05_media_dedup", "p03_pack_sequences",
        "p11_weighted_sample", "q37_decimal_exact", "q38_range_frame",
        "q39_semi_join", "q40_conditional_agg", "q41_array_hof",
        "q42_cte_top_supplier", "q43_min_cost_supplier",
        "q44_market_share", "q45_unpivot", "q46_scd2_intervals",
        "q47_window_dist", "q48_grouping_id", "q49_pagination",
        "q50_nulls_order", "q51_string_agg", "q52_histogram",
        "q53_mode_disc", "q54_lateral_topk", "s11_rerank_ann",
        "t13_heavy_hitters", "t16_bigram_logprob", "t17_zipf_slope",
        "t19_token_yield", "t20_quality_deciles",
    }
)

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
        tier = 9
    elif k in _BANDED_R06:
        tier = 0
    elif k in _NEW_R06:
        tier = 0.5
    elif k in _EVIDENCE_R12:
        tier = 1
    elif k in _EVIDENCE_R3:
        tier = 2
    elif k in _EVIDENCE_R4:
        tier = 3
    else:
        tier = 4  # r05-attested (everything else has a row by now)
    # within tier 0 keep the explicit _BANDED_R06 order
    sub = _BANDED_R06.index(k) if tier == 0 else 0
    return (tier, sub)


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
