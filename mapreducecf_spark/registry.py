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
# r13 window arithmetic (VERDICT r12 item 1): 4 result-changed PQ rows
# the r12 driver never graded (the trained k-means||+Lloyd codebook
# landed r12 with only sim_ivfpq_topk in the stale head) + 18 new r13
# queries + 1 changed-oracle re-witness (pipe_quality_logreg) + the 8
# twice-spilled r05 rows + the r06 cohort cheapest-first (46 rows,
# tools/freshness.py order) = 77 listed: the hard 50-row window
# grades the first 50, so the remaining r06 rows spill to the
# r14 head (from above_avg_orders down).
_GRADE_FIRST = [
    # --- r13: result-changed by the r12 PQ training rewrite but never
    # driver-graded on the new code (VERDICT r12 What's-wrong #1) ---
    "sim_pq_encode",
    "sim_pq_adc_topk",
    "sim_pq_recall_audit",
    "stream_pq_encode",
    # --- r13: new queries ---
    "dedup_containment_benchmark",  # r13: val/benchmark-split containment decon
    "stream_drift_psi",  # r13: online PSI drift vs broadcast snapshot deciles
    "pipe_card_deltas",  # r13: per-(source, day) dataset-card deltas over CDC
    "sim_beam_knn_layered",  # r13: HNSW two-layer beam (entry hierarchy)
    "stream_card_deltas",  # r13: the CDC delta ledger maintained online
    "sim_ivfpq_residual_topk",  # r13: residual-trained IVF-PQ (Faiss proper)
    "pipe_quality_drift",  # r13: per-source quality-logit PSI between snapshots
    "stream_minhash_neardup",  # r13: banded MinHash near-dup probe at ingestion
    "dedup_segment_exact",  # r13: line-level global keep-first segment dedup
    "dedup_segment_hotlist",  # r13: boilerplate hotlist (top duplicated segments)
    "stream_segment_dedup",  # r13: line-level keep-first probe at ingestion
    "sim_beam_knn_pq",  # r13: PQ-compressed (ADC) beam serving + exact re-rank
    "dedup_lsh_index_cdc",  # r13: banded LSH index maintained over CDC
    "text_bpe_train",  # r13: full BPE tokenizer training loop (merge table)
    "dedup_segment_boundary_audit",  # r13: tiling blind-spot telemetry
    "dedup_jaccard_weighted",  # r13: IDF-weighted exact Jaccard (capped index)
    "sim_knn_index_cdc",  # r13: kNN-graph maintained over CDC (retract/merge)
    "dedup_minhash_weighted",  # r13: replication-CWS weighted MinHash + calib
    "text_bpe_apply",  # r13: rank-ordered merge application to the val split
    "stream_knn_insert",  # r13: ANN-index insertion probe at the edge
    "cf_als_foldin",  # r13: ALS cold-start fold-in serving
    "text_bigram_kn_ppl",  # r13: interpolated Kneser-Ney LM scoring
    "sim_mmr_rerank",  # r13: MMR diversified re-ranking (unrolled greedy)
    "sim_ivf_nprobe_sweep",  # r13: recall/cost tuning curve, one pass
    "text_trigram_kn_ppl",  # r13: order-3 interpolated KN (recursive backoff)
    "dedup_semantic_clusters",  # r13: CC over the embedding near-dup graph
    "pipe_shard_manifest",  # r13: shard integrity manifest (checksums)
    "text_bigram_mkn_ppl",  # r13: modified KN (count-estimated discounts)
    "pipe_split_ks",  # r13: exact-integer two-sample KS split-skew test
    "ts_trend_mann_kendall",  # r13: integer Mann-Kendall trend test
    "ts_changepoint_binseg",  # r13: depth-2 binary-segmentation cuts
    "ts_weekday_profile",  # r13: weekday means + additive effects
    # oracle-generator refactor (byte-identical SQL, asserted in-session)
    "cf_als_factors",
    # --- r13: changed code/oracle (logit formula factored into the
    # shared fragment the drift gate composes; values identical, but
    # the prior row witnessed the old definition text) ---
    "pipe_quality_logreg",
    # --- latest driver row is r05, twice-spilled (7 rounds stale),
    # cheapest-first ---
    "sink_partitioned_roundtrip",
    "q8_market_share",
    "agg_percentiles_approx",
    "join_bucketed_colocated",
    "sim_pagerank",
    "dedup_ngram_jaccard",
    "q21_sole_late_supplier",
    "dedup_containment",
    # --- latest driver row is r06 (46 rows, cheapest-first per
    # tools/freshness.py) ---
    "sim_lsh_pairs",
    "sim_knn_graph",
    "dedup_minhash_lsh",
    "sort_topk_global",
    "scalar_dates",
    "scalar_string_math",
    "mm_catalog",
    "pipe_sample_per_group",
    "set_union",
    "join_semi",
    "join_anti",
    "window_percent_rank",
    "pipe_sample_priority",
    "set_except",
    "agg_statistics",
    "join_full_outer",
    "pivot_status_by_priority",
    "mm_frame_sample",
    "window_topk_per_group",
    "q14_promo_revenue",
    "set_intersect",
    "dedup_exact",
    "above_avg_orders",
    "set_except_all",
    "dedup_exact_keep",
    "sim_pairs_threshold",
    "dedup_pipeline_keep",
    "agg_rollup",
    "window_running_total",
    "agg_grouping_sets",
    "agg_distinct",
    "ts_asof_join_nearest",
    "ts_ewma_smoothing",
    "agg_cube",
    "q4_order_priority",
    "q10_returned_revenue",
    "text_cms_heavyhitters",
    "ts_props_variant",
    "window_ntile_quartiles",
    "q18_large_orders",
    "agg_percentiles",
    "dedup_simhash",
    "sink_orc_roundtrip",
    "stream_state_inspection",
    "sim_bfs_hops",
    "text_crosslingual_overlap",
    # --- latest driver row is r07 (35 rows, cheapest-first per
    # tools/freshness.py; beyond the r13 window — the r14 head after
    # the spilled r06 tail) ---
    "pipe_dp_counts",
    "text_train_val_split",
    "pipe_apply_changes",
    "ts_trending_events",
    "ts_asof_join_forward",
    "ts_value_histogram",
    "ts_autocorr",
    "ts_asof_join_tolerance",
    "pipe_mix_interleave",
    "text_readability",
    "pipe_incremental_agg",
    "ts_anomaly_mad",
    "ts_user_streaks",
    "ts_actives_hll_union",
    "join_dynamic_partition_pruning",
    "stream_anomaly_alerts",
    "ts_ohlc_hourly",
    "text_char_entropy",
    "sink_schema_evolution",
    "ts_audience_overlap",
    "stream_value_histogram",
    "text_langid_confusion",
    "sim_mutual_knn",
    "text_source_divergence",
    "sink_csv_roundtrip",
    "pipe_drift_psi",
    "text_pmi_collocations",
    "stream_trending_events",
    "pipe_ngram_novelty",
    "sim_sq8_encode",
    "pipe_length_batching",
    "sink_compaction_roundtrip",
    "cf_rec_coverage",
    "sink_zorder_roundtrip",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _GRADE_FIRST if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
