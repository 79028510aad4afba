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
        #     4g measured best over {2g, 4g, 8g, 48g} on the full suite
        #     (bigger heaps keep every cached table resident and slow
        #     the shuffle-heavy tail; 48g GC-thrashed to 2× wall-clock;
        #     1g OOMs). Takes effect only at JVM launch; on a cluster
        #     this maps to executor/driver memory sizing instead.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
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
