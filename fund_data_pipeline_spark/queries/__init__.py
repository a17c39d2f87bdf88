"""Harness query catalog: every SURVEY §2 operator as a (Spark, oracle-SQL) pair.

Each entry is a :class:`QuerySpec`: a Spark callable ``(spark, sf_dir) ->
DataFrame`` built on the engine's library operators, plus (where
SQL-expressible) an equivalent ANSI-SQL string for the DuckDB oracle.
Column names are aliased identically on both sides; aggregates over doubles
go through explicit DECIMAL casts so both engines produce bit-identical
values (float summation order is otherwise engine-dependent).
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, register, table  # noqa: F401
from . import relational  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import etl  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import stream_queries  # noqa: E402,F401
from . import mlops  # noqa: E402,F401

#: The harness checks the FIRST 50 registered queries against the DuckDB
#: oracle (CORRECTNESS_r01.json had exactly the first 50 entries). This list
#: pins the window to one representative per distinct capability — every
#: operator family from SURVEY §2 plus every LLM-pipeline/streaming/vector
#: component gets a driver-checked row.
#:
#: Window policy (round-2 VERDICT rule): any query that has EVER failed a
#: driver check stays in the window until it has a green driver row.
#: Round-10 rotation (per the round-9 VERDICT item 3): round 9's driver
#: gate never ran (import crash), so CORRECTNESS_r09 is empty and the r9
#: window produced no evidence. In: the 14 never-driver-checked queries —
#: the 3 late-r8 additions (row_hash_surfaces, string_compose_format,
#: union_mixed_schemas, two rounds waiting) and all 11 r9 additions —
#: plus the 26 queries whose latest driver row is r6 (they sat in the r9
#: window that never ran) and the 2 single-green-r7 queries whose kernels
#: changed in r8 (price_quantity_stats, incremental_rollup_revenue). The
#: 8 headline (benched) queries stay, per standing policy. After this
#: round, every query registered BEFORE r10 has a driver row no older
#: than r7 and none is driver-unchecked; the one r10 addition
#: (bpe_train_merges, registered after this rotation) takes the first
#: slot next rotation per the late-addition contract. Every excluded query is listed in
#: _OUT_OF_WINDOW_WHY below with the CORRECTNESS round(s) that checked it
#: green, still registered, and still gated by scripts/verify_local.py +
#: tests/test_catalog_oracle.py.
DRIVER_WINDOW = 50
_CHECKED_FIRST = [
    # headline queries (benched) — stay in-window every round
    "pricing_summary",
    "top_unshipped_orders",
    "regional_supplier_volume",
    "asof_last_click_before_purchase",
    "embedding_topk_cosine",
    "tumbling_window_stats",
    "text_statistics",
    "exact_dedup",
    # ---- late round-8 additions: never driver-checked, all enter ----
    "row_hash_surfaces",
    "string_compose_format",
    "union_mixed_schemas",
    # ---- round-9 additions: never driver-checked, all 11 enter ----
    "bm25_doc_search",
    "unigram_likelihood_quality",
    "ngram_novelty",
    "corpus_mix_drift",
    "temperature_rebalance_mixture",
    "source_frequency_cap",
    "duplicated_span_dedup",
    "embedding_int8_quantization",
    "hybrid_bm25_cosine_rerank",
    "content_defined_chunking",
    "bpe_pair_stats",
    # ---- latest driver row is r6 (all 26 enter) ----
    "active_customers_semi",
    "conform_master_list",
    "customers_without_orders",
    "date_parsing_and_arithmetic",
    "dedup_keep_last",
    "doc_fingerprint",
    "embedding_ivf_topk",
    "embedding_lsh_buckets",
    "embedding_topk_pandas",
    "fee_rescale_and_repair",
    "group_count_breakdown",
    "hash_guarded_merge",
    "latest_order_per_customer",
    "lifecycle_status_transitions",
    "locf_last_valid_value",
    "master_validation_issues",
    "nav_validation_errors",
    "ntile_quartiles",
    "numeric_string_parsing",
    "retention_cutoff_prune",
    "row_hash_change_detection",
    "running_revenue_by_supplier",
    "stratified_hash_sample",
    "streaming_dedup_users",
    "streaming_session_counts",
    "top_orders_per_customer",
    # ---- single-green r7, kernels changed in r8, never re-checked ----
    "price_quantity_stats",
    "incremental_rollup_revenue",
]


#: Every query excluded from the driver window, with its justification —
#: structurally enforced by :func:`_pin_driver_window` (an undocumented
#: exclusion is a hard error at import, so a failing query cannot be quietly
#: parked past position 50). "driver-green rN" cites the CORRECTNESS round
#: that checked the query itself; "family in-window via X" names its
#: representative in the CURRENT (r10) window.
_OUT_OF_WINDOW_WHY = {
    # ---- new in round 10: never driver-checked; verified by
    # scripts/verify_local.py at sf0.001/0.01/0.1 and gated every round by
    # tests/test_catalog_oracle.py; first window slot next rotation ----
    "bpe_train_merges": "new r10, local-oracle verified; tokenizer-training family — the iterative merge loop over the SAME pair-count kernel as bpe_pair_stats (in-window) + token_vocabulary-style explode/agg",
    "bpe_encode_token_stats": "new r10, local-oracle verified; tokenizer-apply family — k chained map-side folds over the bpe_train_merges table, aggregated like bpe_pair_stats (in-window, same explode+grouped-count kernel)",
    # ---- rotated out in round 10: single-green r7 (their r9 window
    # slots produced no evidence — the r9 gate never ran); family
    # representatives named are in the CURRENT (r10) window ----
    "streaming_click_purchase_join": "driver-green r7; stream-stream join family in-window via streaming_session_counts + asof_last_click_before_purchase (headline)",
    "streaming_enriched_purchases": "driver-green r7; stream-static join family in-window via streaming_dedup_users + streaming_session_counts + tumbling_window_stats (headline)",
    "token_vocabulary": "driver-green r7; tokenize+vocab family in-window via bpe_pair_stats (same pinned-class whitespace tokenize kernel, queries/text._ws_tokens) + bm25_doc_search (same doc-frequency kernel)",
    "boilerplate_scrub": "driver-green r7; segment-scrub family in-window via content_defined_chunking (same scan+explode segment kernel) + exact_dedup (headline)",
    "semantic_dedup_cells": "driver-green r7; cell-blocked vector near-dup family in-window via embedding_ivf_topk (same cell-assign kernel) + embedding_lsh_buckets",
    "incremental_near_dup": "driver-green r7; minhash-band family in-window via ngram_novelty (shingle-index kernel) + duplicated_span_dedup (span-hash join kernel)",
    "record_linkage_fuzzy": "driver-green r7; blocked fuzzy-match family in-window via ngram_novelty (shingle kernel) + duplicated_span_dedup (blocked-join kernel)",
    "hierarchy_flatten": "driver-green r7; iterative-graph family — no in-window rep this rotation (the 14 never-checked queries take priority); gated by local oracle + tests/test_graph.py",
    "scd2_priority_history": "driver-green r7; SCD2 family in-window via row_hash_change_detection + latest_order_per_customer",
    "rolling_30d_revenue": "driver-green r7; range-frame window family in-window via running_revenue_by_supplier + locf_last_valid_value (keyed windows)",
    "daily_order_anomaly": "driver-green r7; robust-stats family in-window via price_quantity_stats + ntile_quartiles",
    # ---- rotated out in round 9: latest driver row is r8 (fresh) ----
    "winsorized_price_stats": "driver-green r8; robust-stats family in-window via price_quantity_stats + ntile_quartiles",
    "changelog_compact": "driver-green r8; SCD2/CDC family in-window via row_hash_change_detection + latest_order_per_customer",
    "calendar_gap_fill": "driver-green r8; LOCF/densify family in-window via locf_last_valid_value + running_revenue_by_supplier",
    "fk_integrity_audit": "driver-green r8; semi/anti audit family in-window via customers_without_orders + active_customers_semi",
    "embedding_random_projection": "driver-green r8; projection family in-window via embedding_lsh_buckets (same plane kernel)",
    "dedup_keep_best_quality": "driver-green r8; keyed-dedup family in-window via dedup_keep_last + exact_dedup (headline)",
    "pii_redaction": "driver-green r8; regexp-chain family in-window via string_compose_format + conform_master_list",
    "corpus_dedup_pipeline": "driver-green r8; dedup-pipeline stages in-window via exact_dedup (headline) + duplicated_span_dedup + embedding_ivf_topk (cell-pruned stage kernel)",
    "event_type_summary": "driver-green r2+r4+r8; grouped-agg family in-window via group_count_breakdown + pricing_summary (headline)",
    "json_props_extraction": "driver-green r1+r2+r3+r4+r8; expression family in-window via string_compose_format + date_parsing_and_arithmetic",
    "language_id_heuristic": "driver-green r1+r2+r3+r4+r8; text family in-window via text_statistics (headline) + doc_fingerprint",
    "doc_quality_profile": "driver-green r2+r3+r4+r8; text-quality family in-window via text_statistics (headline) + doc_fingerprint",
    "minhash_lsh_candidates": "driver-green r2+r3+r4+r8; minhash-band family in-window via ngram_novelty (shingle-index kernel) + exact_dedup (headline)",
    "simhash_near_dup": "driver-green r2+r3+r4+r8; hamming near-dup family in-window via doc_fingerprint (hash-signature kernel) + ngram_novelty (shingle-index kernel)",
    "streaming_tumbling_counts": "driver-green r2+r4+r8; streaming family in-window via tumbling_window_stats (headline) + streaming_session_counts",
    "train_val_test_split": "driver-green r2+r3+r4+r8; md5-bucket split family in-window via stratified_hash_sample (same kernel)",
    "embedding_ann_bucketed_topk": "driver-green r2+r3+r4+r8; ANN family in-window via embedding_lsh_buckets + embedding_ivf_topk",
    "embedding_cosine_near_dup": "driver-green r2+r3+r4+r8; vector near-dup family in-window via embedding_lsh_buckets + embedding_ivf_topk",
    "cube_order_stats": "driver-green r2+r3+r4+r5+r8; multi-level agg family in-window via group_count_breakdown + pricing_summary (headline)",
    "pivot_status_by_segment": "driver-green r1+r2+r3+r4+r5+r8; pivot family in-window via group_count_breakdown (same grouped-agg kernel)",
    "unpivot_part_metrics": "driver-green r1+r2+r3+r4+r5+r8; reshape/stack family in-window via union_mixed_schemas (column-union kernel)",
    "buyer_set_ops": "driver-green r2+r3+r4+r5+r8; set-ops family in-window via active_customers_semi + customers_without_orders (semi/anti forms)",
    "clicks_before_purchase_range_join": "driver-green r1+r2+r4+r5+r8; range-join family in-window via asof_last_click_before_purchase (headline)",
    "multimodal_binary_meta": "driver-green r6+r8; multimodal family in-window via embedding_topk_pandas (Arrow mapInPandas kernel)",
    "streaming_stateful_user_stats": "driver-green r6+r8; stateful-streaming family in-window via streaming_dedup_users + streaming_session_counts",
    "pii_scrub_stats": "driver-green r6+r8; regexp-chain family in-window via string_compose_format + conform_master_list",
    "image_decode_features": "driver-green r6+r8; multimodal family in-window via embedding_topk_pandas (Arrow mapInPandas kernel)",
    "doc_chunking": "driver-green r6+r8; chunking family in-window via content_defined_chunking (same scan+explode chunk kernel)",
    "sequence_packing": "driver-green r6+r8; packing family in-window via content_defined_chunking + text_statistics (headline)",
    "length_percentile_gate": "driver-green r6+r8; percentile-gate family in-window via ntile_quartiles + text_statistics (headline)",
    "leakage_safe_split": "driver-green r6+r8; content-hash split family in-window via stratified_hash_sample (same md5-bucket kernel)",
    "language_rebalance_mixture": "driver-green r6+r8; mixture/split family in-window via stratified_hash_sample",
    "dedup_clusters": "driver-green r2+r3+r4+r5+r6+r8; connected-components family — no in-window iterative-graph rep this rotation (14 never-checked queries take priority); gated by local oracle + tests/test_graph.py",
    "repair_feed_merge": "driver-green r5+r6+r8; keyed-merge family in-window via hash_guarded_merge + incremental_rollup_revenue",
    "order_price_percentiles": "driver-green r5+r6+r8; percentile family in-window via ntile_quartiles + price_quantity_stats",
    "conversion_funnel": "driver-green r5+r6+r8; funnel/session family in-window via streaming_session_counts + streaming_dedup_users",
    "table_profile": "driver-green r5+r6+r8; profiling family in-window via group_count_breakdown (distinct/null counting)",
    "dedup_keep_list": "driver-green r5+r6+r8; dedup-attribution family in-window via exact_dedup (headline) + dedup_keep_last",
    "repetition_filter_stats": "driver-green r5+r6+r8; text-gate family in-window via text_statistics (headline) + ngram_novelty",
    "benchmark_contamination": "driver-green r5+r6+r8; shingle-join family in-window via ngram_novelty (same shingle-join kernel) + duplicated_span_dedup",
    "quality_score": "driver-green r5+r6+r8; text-quality family in-window via text_statistics (headline) + doc_fingerprint",
    "token_count_regex": "driver-green r5+r6+r8; tokenize family in-window via bpe_pair_stats (same trim+\\s+ tokenize kernel)",
    # ---- latest driver row is r7, multi-round green ----
    "distinct_counts": "driver-green r1+r7; distinct-agg family in-window via group_count_breakdown",
    "rollup_revenue": "driver-green r1+r7; ROLLUP family in-window via incremental_rollup_revenue + group_count_breakdown",
    "grouping_sets_revenue": "driver-green r1+r7; grouping-sets family in-window via group_count_breakdown + pricing_summary (headline)",
    "repeat_buyers_intersect": "driver-green r1+r7; INTERSECT family in-window via active_customers_semi (semi-join semantics)",
    "churned_buyers_except": "driver-green r1+r7; EXCEPT family in-window via customers_without_orders (anti-join semantics)",
    "priority_orders_exists": "driver-green r1+r7; semi-join family in-window via active_customers_semi",
    "price_quartiles_by_segment": "driver-green r1+r7; ranking-window family in-window via ntile_quartiles + top_orders_per_customer",
    "salted_join_revenue": "driver-green r1+r7; skew family — plan pinned by tests/test_plans.py; blocked/salted kernels in-window via duplicated_span_dedup (AQE-skew-safe join) + group_count_breakdown",
    "nation_pair_revenue": "driver-green r2+r7; multi-join agg family in-window via regional_supplier_volume (headline)",
    "promo_revenue_share": "driver-green r1+r2+r7; conditional-agg family in-window via pricing_summary (headline)",
    "top_supplier_revenue": "driver-green r1+r2+r7; top-k agg family in-window via top_unshipped_orders (headline)",
    "small_quantity_revenue": "driver-green r1+r2+r7; filtered-agg family in-window via pricing_summary (headline)",
    "order_fulfillment_outer": "driver-green r1+r2+r3+r4+r7; outer-join counting family in-window via customers_without_orders + group_count_breakdown",
    "ngram_jaccard_pairs": "driver-green r2+r3+r4+r7; blocked shingle-join family in-window via ngram_novelty (same shingle kernel) + duplicated_span_dedup",
    "order_price_lead_lag": "driver-green r3+r4+r7; lead-lag window family in-window via locf_last_valid_value + running_revenue_by_supplier (keyed windows)",
    "sliding_window_stats": "driver-green r3+r4+r7; sliding-window family in-window via tumbling_window_stats (headline)",
    "null_sentinel_cleanup": "driver-green r1+r2+r3+r4+r7; conform family in-window via conform_master_list + string_compose_format",
    "duplicate_key_stats": "driver-green r1+r2+r3+r4+r7; keyed-dedup family in-window via exact_dedup (headline) + dedup_keep_last",
    "sessionization": "driver-green r3+r4+r7; session-window family in-window via streaming_session_counts + asof_last_click_before_purchase (headline)",
    # ---- single-green r7, staying out this rotation (family reps in) ----
    "audio_quality_gate": "driver-green r7; multimodal family in-window via embedding_topk_pandas (Arrow mapInPandas kernel)",
    "characteristic_terms": "driver-green r7; tf-idf family in-window via bm25_doc_search (same tokenize+df/idf kernel)",
    "cohort_retention": "driver-green r7; cohort family in-window via latest_order_per_customer + group_count_breakdown",
    "deterministic_shuffle_order": "driver-green r7; md5-bucket family in-window via stratified_hash_sample (same kernel)",
    "embedding_centroid_stats": "driver-green r7; centroid family in-window via embedding_ivf_topk (same cell-assign kernel)",
    "key_skew_profile": "driver-green r7; profiling family in-window via group_count_breakdown; skew-handling kernels via duplicated_span_dedup (AQE-skew-safe join)",
    "price_histogram": "driver-green r7; binning family in-window via ntile_quartiles + group_count_breakdown",
    "running_distinct_users": "driver-green r7; per-user accumulation family in-window via streaming_dedup_users + streaming_session_counts",
    "snapshot_diff": "driver-green r7; CDC/hash-compare family in-window via row_hash_change_detection + hash_guarded_merge",
    "video_frame_sample_stats": "driver-green r7; multimodal family in-window via embedding_topk_pandas (Arrow mapInPandas kernel)",
}


def _pin_driver_window() -> None:
    missing = [n for n in _CHECKED_FIRST if n not in QUERIES]
    if missing:
        raise RuntimeError(f"driver-window queries not registered: {missing}")
    if len(_CHECKED_FIRST) != DRIVER_WINDOW:
        raise RuntimeError(
            f"driver window holds {DRIVER_WINDOW} queries, got {len(_CHECKED_FIRST)}"
        )
    undocumented = [
        n for n in QUERIES if n not in _CHECKED_FIRST and n not in _OUT_OF_WINDOW_WHY
    ]
    if undocumented:
        raise RuntimeError(
            f"queries excluded from the driver window without justification: {undocumented}"
        )
    stale = [n for n in _OUT_OF_WINDOW_WHY if n not in QUERIES]
    if stale:
        raise RuntimeError(
            f"_OUT_OF_WINDOW_WHY entries for queries no longer registered: {stale}"
        )
    both = [n for n in _OUT_OF_WINDOW_WHY if n in _CHECKED_FIRST]
    if both:
        raise RuntimeError(
            f"queries both in-window and excluded: {both}"
        )
    head = {n: QUERIES[n] for n in _CHECKED_FIRST}
    tail = {n: s for n, s in QUERIES.items() if n not in head}
    QUERIES.clear()
    QUERIES.update(head)
    QUERIES.update(tail)


_pin_driver_window()


def queries():
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql():
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def headline_queries():
    return {name: spec.spark for name, spec in QUERIES.items() if spec.headline}
