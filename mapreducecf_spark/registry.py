"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus the DuckDB
oracle SQL twin for each (driver correctness gate, see __spark_entry__).

Conventions:

- Every computed column is aliased IDENTICALLY in the Spark query and
  the oracle SQL (the driver hash-compares by sorted column name).
- Double aggregates are rounded in BOTH engines so floating-point
  summation order cannot flip the value hash.
- Results are unordered unless the query's semantics include ordering
  (top-k), in which case ties are broken by a unique key.
- FINAL SCHEMAS CARRY ONLY SCALAR TYPES: string / bigint / int /
  double / boolean / date / timestamp. Never DECIMAL (Spark and DuckDB
  render them differently under the driver's normalizer), never ARRAY /
  MAP / STRUCT (the driver's pandas canonicalizer crashes on unhashable
  cells), and never an uncast DuckDB integer ``sum()`` (returns HUGEINT,
  which renders differently from Spark's BIGINT — wrap in
  ``CAST(... AS BIGINT)``). ``tools/check_parity.py`` enforces all
  three.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
#: oracle SQL, or a zero-arg callable returning it (lazy — for oracles
#: built from ANOTHER query module's fragments, where building at
#: decoration time would hit a partially-initialized module when an
#: entry point imports that module directly)
ORACLES: dict[str, str | Callable[[], str]] = {}
#: query -> other query whose oracle it shares (resolved lazily by
#: ``oracles()`` — alias targets may register AFTER the aliasing module
#: when an entry point imports a query module directly)
ORACLE_ALIASES: dict[str, str] = {}


def oracles() -> dict[str, str]:
    """ORACLES with lazy entries built and aliases resolved — the
    driver-facing view."""
    out = {n: (o() if callable(o) else o) for n, o in ORACLES.items()}
    for name, target in ORACLE_ALIASES.items():
        out[name] = out[target]
    return out


def register(
    name: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator: add a query (and optionally its oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from mapreducecf_spark.queries import wordcount  # noqa: E402,F401
from mapreducecf_spark.queries import text  # noqa: E402,F401
from mapreducecf_spark.queries import pipeline  # noqa: E402,F401
from mapreducecf_spark.queries import timeseries  # noqa: E402,F401
from mapreducecf_spark.queries import relational  # noqa: E402,F401
from mapreducecf_spark.streaming import graded  # noqa: E402,F401
from mapreducecf_spark import multimodal  # noqa: E402,F401
from mapreducecf_spark.queries import dedup  # noqa: E402,F401
from mapreducecf_spark.queries import similarity  # noqa: E402,F401
from mapreducecf_spark.queries import storage  # noqa: E402,F401
from mapreducecf_spark.queries import cf  # noqa: E402,F401

# REGISTRATION ORDER MATTERS: the driver grades queries in registration
# order under a hard ~50-query window per round (r07/r08 graded exactly
# 50). Ordering is a pure FRESHNESS rotation (VERDICT r07 item 1):
# queries whose CODE OR ORACLE changed this round first (their prior
# rows witnessed the old definition), then brand-new queries, then the
# stalest cohort cheapest-first so a cutoff refreshes the most rows.
# r09 window arithmetic (VERDICT r08 item 1 — this is the round the
# freshness window CLEARS): 7 changed-code re-witnesses + 4 new queries
# + the full 39-row pre-r05 cohort (12 r03 + 27 r04) = exactly 50.
# The three CF consumers whose own code did NOT change
# (cf_recommend_topk / cf_association_rules / cf_rec_coverage, latest
# rows r05+) sit just past the window: their shared upstream
# (interactions) is witnessed via the three CF rows inside it, and all
# six CF queries passed local parity at both SFs after the layout
# change (commit 59124bc).
_GRADE_FIRST = [
    # --- r09: changed-code re-witnesses ---
    "dedup_clusters",  # r09: skew-safe salted star rounds (VERDICT item 2)
    "cf_item_similarity",  # r09: one-Exchange interactions layout (item 3)
    "cf_user_similarity",  # r09: same layout change, transposed model
    "cf_als_factors",  # r09: same layout + persist-leak fix (ADVICE)
    "ts_attribution_join",  # r09: coalesced user_id in attribution_join
    "stream_attribution_join",  # r09: pre-watermark filters (ADVICE)
    "stream_attribution_outer",  # r09: pre-watermark filters + coalesce
    # --- r09: new queries ---
    "pipe_pack_sequences_bpe",  # r09: tokenizer-aware packing (item 4)
    "pipe_contamination_attribution",  # r09: per-source decon report (item 5)
    "sim_binary_quant_recall",  # r09: 1-bit Hamming recall audit (item 6)
    "stream_attribution_full_outer",  # r09: both-side eviction (item 7)
    # --- the pre-r05 stale cohort: 12 r03 + 27 r04 rows, cheapest-first
    # (VERDICT r08 item 1 — with the 11 entries above this makes the
    # window exactly 50 and CLEARS freshness: after r09's sweep no row
    # predates r05) ---
    "join_left_outer",
    "ts_session_window",
    "join_broadcast_part",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "ts_multi_rollup",
    "text_unigram_logprob",
    "q1_pricing_summary",
    "pipe_repetition_filter",
    "text_top_bigrams",
    "text_tfidf_top_terms",
    "pipe_decontaminate",
    "pipe_incremental_dedup",
    "pipe_context_chunks",
    "pipe_snapshot_diff",
    "mm_payload_dedup",
    "pipe_dataset_card",
    "pipe_pack_sequences",
    "dedup_minhash_calibration",
    "ts_scd2_intervals",
    "pipe_mix_weights",
    "stream_wordcount",
    "dedup_rate_report",
    "stream_tumbling_hourly",
    "pipe_oov_rate",
    "text_bpe_merge_step",
    "pipe_curriculum_bins",
    "ts_peak_concurrency",
    "pipe_quality_filter_chain",
    "stream_dedup_within_watermark",
    "q2_min_balance_supplier",
    "text_vocab_approx",
    "stream_quality_filter",
    "stream_session_window",
    "join_salted_hot_key",
    "text_bigram_ppl",
    "sim_label_propagation",
    "ts_dau_wau_mau",
    "stream_running_user_totals",
    # --- latest driver row is r05 (42 listed here, cheapest-first;
    # cf_item_similarity / ts_attribution_join / stream_attribution_join
    # were hoisted into the r09 changed-code head above) ---
    "dedup_embedding_cosine",
    "agg_array_collect",
    "join_null_safe",
    "sim_label_centroids",
    "window_first_last_nth",
    "agg_salted_global",
    "q22_inactive_customers",
    "sim_kmeans_codebook",
    "q13_customer_distribution",
    "q19_disjunctive_revenue",
    "q17_small_quantity_revenue",
    "dedup_levenshtein",
    "q16_part_supplier_counts",
    "q15_top_supplier",
    "sink_jsonl_roundtrip",
    "window_ratio_to_report",
    "cf_recommend_topk",
    "q11_important_parts",
    "pipe_dedup_keep_best",
    "stream_incremental_dedup",
    "q12_late_shipments",
    "stream_sliding_1h_30m",
    "q7_nation_trade",
    "sink_partitioned_roundtrip",
    "pipe_card_diff",
    "q8_market_share",
    "q20_excess_shipments",
    "sim_silhouette",
    "agg_unpivot_metrics",
    "cf_association_rules",
    "ts_daily_activity_approx",
    "q9_product_profit",
    "sim_triangle_count",
    "sim_pagerank",
    "join_bucketed_colocated",
    "agg_percentiles_approx",
    "stream_lake_roundtrip",
    "q21_sole_late_supplier",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_simhash_pairs",
    "lsh_bucket_skew",
    # --- latest driver row is r06 (48 listed here, cheapest-first;
    # cf_user_similarity was hoisted into the r09 head above) ---
    "sim_knn_graph",
    "sim_lsh_pairs",
    "dedup_minhash_lsh",
    "scalar_string_math",
    "scalar_dates",
    "mm_catalog",
    "pipe_sample_per_group",
    "sort_topk_global",
    "set_union",
    "join_semi",
    "join_anti",
    "set_intersect",
    "window_ntile_quartiles",
    "join_full_outer",
    "mm_frame_sample",
    "pivot_status_by_priority",
    "pipe_sample_priority",
    "agg_statistics",
    "dedup_exact",
    "window_percent_rank",
    "dedup_exact_keep",
    "q14_promo_revenue",
    "set_except",
    "set_except_all",
    "window_topk_per_group",
    "dedup_pipeline_keep",
    "agg_grouping_sets",
    "above_avg_orders",
    "agg_rollup",
    "agg_distinct",
    "sim_pairs_threshold",
    "ts_asof_join_nearest",
    "agg_cube",
    "q10_returned_revenue",
    "q4_order_priority",
    "window_running_total",
    "ts_ewma_smoothing",
    "q18_large_orders",
    "ts_props_variant",
    "text_cms_heavyhitters",
    "agg_percentiles",
    "stream_state_inspection",
    "sink_orc_roundtrip",
    "sim_bfs_hops",
    "dedup_simhash",
    "dedup_semantic_ivf",
    "text_crosslingual_overlap",
    "stream_semantic_dedup",
    # --- latest driver row is r07 (freshest; r08-changed members were
    # hoisted to the front instead) ---
    "ts_anomaly_mad",
    "stream_anomaly_alerts",
    "text_langid_confusion",
    "pipe_drift_psi",
    "pipe_dp_counts",
    "mm_phash_neardup",
    "sink_zorder_roundtrip",
    "sim_sq8_encode",
    "ts_audience_overlap",
    "ts_ohlc_hourly",
    "pipe_incremental_agg",
    "mm_audio_segments",
    "sim_mutual_knn",
    "text_char_entropy",
    "ts_asof_join_tolerance",
    "ts_user_streaks",
    "sink_compaction_roundtrip",
    "pipe_mix_interleave",
    "join_dynamic_partition_pruning",
    "pipe_length_batching",
    "text_source_divergence",
    "text_pmi_collocations",
    "ts_value_histogram",
    "sink_schema_evolution",
    "ts_autocorr",
    "stream_value_histogram",
    "text_readability",
    "ts_interarrival",
    "cf_rec_coverage",
    "mm_image_features",
    "mm_audio_features",
    "ts_asof_join_forward",
    "pipe_quality_logreg",
    "pipe_ngram_novelty",
    "ts_trending_events",
    "stream_trending_events",
    "sink_csv_roundtrip",
    "ts_actives_hll_union",
    "pipe_apply_changes",
    "pipe_shuffle_shards",
    "text_train_val_split",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _GRADE_FIRST if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
