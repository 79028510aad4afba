"""SparkSession factory with scale-oriented defaults.

The session is tuned for correctness-at-scale first: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), explicit
broadcast threshold, UTC session timezone (so timestamp semantics are
engine-independent), Arrow transfer for the few Pandas-UDF code paths.

Tests and bench run on ``local[N]``; the same configs are what we would
ship on a 1000-executor cluster — nothing here is local-mode-specific
except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# 64 MiB: dimension tables (region/nation/customer/supplier/part at any
# realistic SF for the dims) broadcast; fact-fact joins still shuffle.
_BROADCAST_THRESHOLD = 64 * 1024 * 1024


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def get_spark(
    app_name: str = "mapreducecf-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's default tuning.

    ``shuffle_partitions`` defaults to 32 for local runs; on a real
    cluster set it ~2-3x total cores (AQE coalesces the excess).
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or default_master())
        # --- heap sized for the suite (local mode runs driver + all 32
        #     executor threads + every persisted table in ONE JVM; the
        #     1g default OOMs once the session-scoped memo tables — the
        #     build-once/consume-many shape — accumulate at sf0.1).
        #     8g re-measured best for the r06 suite: 4g (the r03-era
        #     winner) started LRU-evicting the grown persisted set —
        #     shared pair tables, kNN edges, capped cluster members —
        #     so late-suite riders silently recomputed their family's
        #     intermediate (sim_ann_recall 8.6 s at 4g vs 2.6 s at 8g;
        #     full suite 216 s vs 189 s). 48g GC-thrashed to 2×
        #     wall-clock in the same sweep; 1g OOMs. Takes effect only
        #     at JVM launch; on a cluster this maps to executor/driver
        #     memory sizing — and the lesson transfers: size storage
        #     memory to the materialized-intermediate working set, or
        #     the build-once/consume-many shape quietly becomes
        #     build-per-consumer.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        # --- runtime re-planning: the single biggest 100 TB safety net
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- join strategy
        .config("spark.sql.autoBroadcastJoinThreshold", str(_BROADCAST_THRESHOLD))
        # --- deterministic timestamp semantics across engines
        .config("spark.sql.session.timeZone", "UTC")
        # --- Arrow for the Pandas-UDF paths (multimodal, vector math)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- tolerate missing inputs like the reference (SURVEY §2 S4)
        .config("spark.sql.files.ignoreMissingFiles", "true")
        # --- events.ts is parquet TIMESTAMP(NANOS); read as long, then
        #     sources.load_table converts (Spark has no nanos timestamp)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- quieter local runs
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
