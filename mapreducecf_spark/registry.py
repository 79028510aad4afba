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
# order under a global time budget (~50/round; r02 and r03 both cut off
# mid-suite). Queries with no green CORRECTNESS row yet grade FIRST,
# cheapest first so a cutoff costs the fewest rows; everything already
# driver-green refreshes afterwards. r05 rotation: the 14 queries whose
# only missing artifact is a current driver row (12 never graded +
# stale-row dedup_clusters + DF-cap re-grade dedup_ngram_jaccard) lead;
# all 14 already pass the local driver-replica gate
# (tools/check_parity.py). New r05 queries follow, then refreshes.
_GRADE_FIRST = [
    # --- the 14 row-less queries (VERDICT r04 item 1) ---
    "sim_kmeans_codebook",  # trains the shared memoized codebook ...
    "sim_ivf_knn",  # ... which these three probe without retraining
    "sim_ann_recall",
    "sim_silhouette",
    "q21_sole_late_supplier",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "pipe_dedup_keep_best",
    "sim_pagerank",
    "dedup_levenshtein",
    "dedup_ngram_jaccard",  # re-grade: DF-cap changed its semantics in r04
    "lsh_bucket_skew",
    "dedup_containment",
    "dedup_clusters",
    # --- new in r05 ---
    "agg_salted_global",  # skew.salted_global_agg end-to-end
    "join_bucketed_colocated",  # write_bucketed_table + zero-Exchange join
    "sink_partitioned_roundtrip",  # write_table day-partitioned + pruned read
    "pipe_card_diff",  # card-vs-card release diff over the CDC snapshots
    "stream_incremental_dedup",  # stream-static join at the ingestion edge
    "cf_item_similarity",  # the repo-namesake: item-item CF model build
    "cf_recommend_topk",  # ... served for the deterministic user batch
    "cf_association_rules",  # support/confidence/lift over the same model
    "ts_attribution_join",  # view->purchase interval self-join (batch twin)
    "stream_attribution_join",  # ... as a two-sided watermarked stream-stream join
    "sim_triangle_count",  # triangles/wedges/clustering over the memoized kNN graph
    "stream_lake_roundtrip",  # checkpointed foreachBatch lake egress, read back
    "sink_jsonl_roundtrip",  # JSONL interchange fidelity, hash-checked
    # --- refreshes: everything below already has a green row; order is
    # the r04 list (ascending sf0.1 cost within cohorts) ---
    "join_null_safe",
    "window_first_last_nth",
    "agg_array_collect",
    "sim_label_centroids",
    "q13_customer_distribution",
    "q22_inactive_customers",
    "mm_image_features",
    "mm_audio_features",
    "q19_disjunctive_revenue",
    "q17_small_quantity_revenue",
    "q16_part_supplier_counts",
    "agg_percentiles_approx",
    "q15_top_supplier",
    "window_ratio_to_report",
    "q12_late_shipments",
    "q20_excess_shipments",
    "q9_product_profit",
    "q11_important_parts",
    "ts_daily_activity_approx",
    "agg_unpivot_metrics",
    "q8_market_share",
    "q7_nation_trade",
    "stream_sliding_1h_30m",
    "text_vocab_approx",
    "stream_session_window",
    "stream_dedup_within_watermark",
    "q2_min_balance_supplier",
    "pipe_quality_filter_chain",
    "pipe_context_chunks",
    "pipe_pack_sequences",
    "pipe_mix_weights",
    "pipe_snapshot_diff",
    "pipe_oov_rate",
    "pipe_curriculum_bins",
    "pipe_dataset_card",
    "dedup_rate_report",
    "text_bpe_merge_step",
    "text_bigram_ppl",
    "ts_peak_concurrency",
    "ts_scd2_intervals",
    "ts_dau_wau_mau",
    "stream_wordcount",
    "pipe_incremental_dedup",
    "sim_label_propagation",
    "mm_payload_dedup",
    "dedup_minhash_calibration",
    "stream_quality_filter",
    "join_salted_hot_key",
    "stream_running_user_totals",
    "stream_tumbling_hourly",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _GRADE_FIRST if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
