"""Structured Streaming over ``events`` — the streaming halves of the
windowed aggregations in ``queries.timeseries`` (SURVEY.md §7.2 step 4;
the reference is strictly batch, SURVEY §2.1 "streaming: no", so this
surface exists for the north-star pipeline, not reference parity).

Each pipeline is literally the batch builder (``tumbling_agg`` /
``sliding_agg`` / ``session_agg``) applied to a watermarked
``readStream`` DataFrame — one definition, two execution modes, which
is exactly the Spark model: the registered batch queries ARE the
oracle-checked twins the driver hash-verifies, and the streaming path
adds only source + watermark + sink.

Watermarks bound state: with a "1 hour" watermark, windows older than
(max event time - 1 h) are finalized, emitted (append mode), and their
state dropped — late rows beyond it are discarded. At 100 TB/day the
state store holds only open windows per key, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# NOTE: the batch builders (tumbling_agg / sliding_agg / session_agg /
# SESSION_GAP) are imported lazily inside each function. A module-level
# import here closes the cycle queries.timeseries -> registry ->
# streaming -> streaming.windows -> queries.timeseries, which breaks
# any process whose FIRST import is queries.timeseries itself (e.g. a
# single-file pytest run) — the partially-initialized module doesn't
# have the builders yet.

WATERMARK = "1 hour"


def stream_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """File-source stream over one table, correct for BOTH physical
    layouts: a single-file table (the driver's testdata) streams the
    parent directory scoped by a leaf glob, while a directory table
    (anything Spark itself wrote — part files under ``<table>.parquet/``)
    streams that directory directly. The distinction matters:
    FileStreamSource requires its path to be a directory, and
    ``pathGlobFilter`` matches LEAF file names only — pointed at a
    directory layout it would match zero part files and silently
    stream an empty table (caught by the robustness sweeps)."""
    import os

    p = os.path.join(sf_dir, f"{table}.parquet")
    schema = spark.read.parquet(p).schema
    if os.path.isdir(p):
        return spark.readStream.schema(schema).parquet(p)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{table}.parquet")
        .parquet(sf_dir)
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (the local stand-in
    for Kafka/queue ingestion; swapping the source line is the only
    cluster change). Streaming sources require an explicit schema —
    taken from a zero-cost batch read of the same path."""
    from mapreducecf_spark.sources import convert_nanos_ts

    return convert_nanos_ts(stream_table(spark, sf_dir, "events"))


def streaming_tumbling_hourly(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    from mapreducecf_spark.queries.timeseries import tumbling_agg

    return tumbling_agg(events.withWatermark("ts", watermark))


def streaming_sliding(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    from mapreducecf_spark.queries.timeseries import sliding_agg

    return sliding_agg(events.withWatermark("ts", watermark))


def streaming_session_per_user(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """Session windows need a watermark to ever close a session; the
    gap itself (SESSION_GAP) bounds how long a key stays open past its
    last event."""
    from mapreducecf_spark.queries.timeseries import session_agg

    return session_agg(events.withWatermark("ts", watermark))


def write_stream_to_lake(
    df: DataFrame, path: str, checkpoint: str, partition_col: str = "day"
):
    """Streaming → lake egress via foreachBatch: each micro-batch is
    appended as day-partitioned parquet through the SAME batch sink
    (``sinks.write_table``) the rest of the engine uses — one sink
    implementation, both execution modes. foreachBatch (rather than the
    built-in file sink) is the production pattern because it can run
    arbitrary batch logic per micro-batch (merges, compaction, multi-
    table fan-out) with exactly-once via the checkpointed batch id.
    Returns the started StreamingQuery."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.sinks import write_table

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        out = batch_df.withColumn(
            partition_col, F.to_date(F.date_trunc("day", "ts"))
        )
        write_table(out, path, partition_cols=[partition_col], mode="append")

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """Streaming exact dedup on event_id — the ingestion-edge dedup of
    an at-least-once source (Kafka replays, retried producers).
    ``dropDuplicatesWithinWatermark`` keeps one state-store entry per
    key only until the watermark passes it, so state is bounded by the
    duplicate horizon × arrival rate instead of growing forever (the
    plain ``dropDuplicates`` failure mode on unbounded streams)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
