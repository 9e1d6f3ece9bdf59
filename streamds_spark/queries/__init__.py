"""Importing this package registers every query into streamds_spark.registry.QUERIES.

Registration order matters to the external driver: its CORRECTNESS gate checks
the first 50 registered queries in order. Round 1 covered the first 50 (parity,
tpch, advanced, analytics, ...); the llmdata layer and tpch2 shipped past the
window with no driver oracle evidence. Round 2 rotates: every name that already
earned a green CORRECTNESS_r01 row is pushed to the back of the registry, so
the driver's window covers all previously-unchecked queries plus
sessionize_events (whose oracle was fixed and needs re-verification).
Local tools/selfcheck.py remains the full-coverage backstop across all queries.
"""

from streamds_spark import registry as _registry
from streamds_spark.queries import advanced  # noqa: F401
from streamds_spark.queries import analytics  # noqa: F401
from streamds_spark.queries import collections  # noqa: F401
from streamds_spark.queries import integrity  # noqa: F401
from streamds_spark.queries import parity  # noqa: F401
from streamds_spark.queries import tpch  # noqa: F401
from streamds_spark.queries import tpch2  # noqa: F401
from streamds_spark.queries import tpch3  # noqa: F401
from streamds_spark.queries.llmdata import contamination  # noqa: F401
from streamds_spark.queries.llmdata import corpus  # noqa: F401
from streamds_spark.queries.llmdata import dedup  # noqa: F401
from streamds_spark.queries.llmdata import multimodal  # noqa: F401
from streamds_spark.queries.llmdata import quality  # noqa: F401
from streamds_spark.queries.llmdata import sampling  # noqa: F401
from streamds_spark.queries.llmdata import sharding  # noqa: F401
from streamds_spark.queries.llmdata import similarity  # noqa: F401
from streamds_spark.queries.llmdata import textstats  # noqa: F401

# Names with NO green driver row yet, pinned to the very front of the registry
# (in round-1 registration order) so the 50-query window covers them all.
# sessionize_events leads: its oracle changed (HUGEINT cast) and must re-verify.
_NEEDS_DRIVER_CHECK = [
    "sessionize_events", "approx_distinct_parts", "window_running_sum",
    "rollup_orders", "cube_events", "topk_parts", "agg_stats_lineitem",
    "time_bucket_events", "brand_revenue", "events_json_extract",
    "q10_returned_items", "q12_shipmode_priority", "q14_promo_share",
    "q19_disjunctive", "q13_customer_distribution", "q17_small_quantity_revenue",
    "q18_large_orders", "q22_global_sales_opportunity", "full_outer_nation_counts",
    "contamination_check", "text_token_count_bpe", "tfidf_top_terms",
    "funnel_click_to_purchase", "grouping_sets_orders", "llm_pipeline_end_to_end",
    "dedup_exact", "dedup_minhash_signature", "dedup_minhash_lsh_pairs",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "dedup_levenshtein", "multimodal_binary_stats", "multimodal_decode_meta",
    "text_repetition_score", "quality_filter_pass", "text_char_entropy",
    "vocab_growth", "sample_systematic", "mixture_sample",
    "ann_bruteforce_topk", "ann_lsh_topk", "kmeans_assign_step",
    "text_token_count", "text_quality_score", "text_lang_id",
    "text_fingerprint", "text_corpus_stats",
]

# Queries with a green (rows+schema+hash) row in CORRECTNESS_r01.json,
# rotated to the back. Queries in neither list (new this round) land in the
# middle: after the backlog, before the already-verified.
_ROUND1_VERIFIED = [
    "asof_last_click", "range_join_price_bands", "percentiles_lineitem",
    "bigram_counts", "session_window_native", "pivot_events", "dedup_keep_best",
    "corr_value_hour", "lag_lead_deltas", "conditional_agg_orders",
    "regex_extract_parts", "scalar_subquery_above_avg", "group_zscore",
    "collect_event_types", "value_histogram", "orders_by_dow",
    "ntile_customers", "moving_average", "rank_variants", "first_last_value",
    "tumbling_window_counts", "hopping_window_counts", "table_checksum",
    "text_scrub_numbers", "unpivot_order_stats", "flagship_filter_group_count",
    "grep_count", "grep_per_source", "grep_lines", "grep_invert_case",
    "filter_project", "filter_numeric_project", "conjunctive_filter",
    "wordcount", "word_index_pairs", "distinct_values", "group_count_users",
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "broadcast_join_agg", "semi_join_customers",
    "anti_join_customers", "union_sides", "intersect_nations",
    "except_custkeys", "window_rank_orders",
]

_front = [n for n in _NEEDS_DRIVER_CHECK if n in _registry.QUERIES]
_verified = [n for n in _ROUND1_VERIFIED if n in _registry.QUERIES]
_middle = [n for n in _registry.QUERIES if n not in set(_front) | set(_verified)]
_ordered = {n: _registry.QUERIES[n] for n in _front + _middle + _verified}
_registry.QUERIES.clear()
_registry.QUERIES.update(_ordered)
del _front, _verified, _middle, _ordered
