"""Streaming smoke tests: each streaming pipeline, run to completion on
the finite events source (availableNow trigger, append mode), must emit
only finalized windows whose values EXACTLY match the registered batch
twin — same builder, so any divergence is watermark/state semantics."""

from __future__ import annotations

import pytest


def _run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize(
    ("builder", "batch_query"),
    [
        ("streaming_tumbling_hourly", "ts_tumbling_hourly"),
        ("streaming_sliding", "ts_sliding_1h_30m"),
        ("streaming_session_per_user", "ts_session_window"),
    ],
)
def test_streaming_emits_finalized_subset_of_batch(spark, sf_dir, builder, batch_query):
    import mapreducecf_spark.streaming as st
    from mapreducecf_spark.registry import QUERIES

    stream = st.stream_events(spark, sf_dir)
    assert stream.isStreaming
    out = _run_stream(spark, getattr(st, builder)(stream), f"mem_{builder}")

    got = _rows(out)
    expected = _rows(QUERIES[batch_query](spark, sf_dir))

    # append mode emits only windows the watermark has closed: a strict
    # subset is possible (trailing windows stay open), wrong values are not
    assert got, f"{builder} emitted nothing"
    assert got <= expected, f"{builder} emitted rows absent from the batch twin"
    # the bulk of the (finite) input must have been finalized
    assert len(got) >= len(expected) * 0.9


def test_stream_to_lake_writes_partitioned_parquet(spark, sf_dir, tmp_path):
    """foreachBatch egress: the full stream lands as day-partitioned
    parquet, re-readable with partition discovery, row-complete."""
    import glob

    import mapreducecf_spark.streaming as st
    from mapreducecf_spark.sources import load_table

    out = str(tmp_path / "lake")
    q = st.write_stream_to_lake(
        st.stream_events(spark, sf_dir), out, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    n_src = load_table(spark, sf_dir, "events").count()
    assert back.count() == n_src
    days = glob.glob(f"{out}/day=*")
    assert len(days) == back.select("day").distinct().count() > 0


def test_streaming_dedup_drops_replayed_events(spark, sf_dir, tmp_path):
    """An at-least-once source (every file delivered twice) must come
    out exactly-once downstream of streaming_dedup."""
    import mapreducecf_spark.streaming as st
    from mapreducecf_spark.sources import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    src = str(tmp_path / "replayed")
    events.coalesce(1).write.parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)  # the replay

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        st.streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("mem_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    out = spark.table("mem_dedup")
    assert out.count() == events.count()  # duplicates removed
    assert out.select("event_id").distinct().count() == events.count()


def test_stream_wordcount_equals_batch(spark, sf_dir):
    """The reference's flagship query must produce identical counts in
    batch and streaming execution (same shared builder)."""
    from mapreducecf_spark.queries.wordcount import wordcount
    from mapreducecf_spark.streaming.graded import stream_wordcount

    batch = {(r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()}
    stream = {
        (r["word"], r["cnt"]) for r in stream_wordcount(spark, sf_dir).collect()
    }
    assert stream == batch


def test_stream_anomaly_alerts_matches_batch_flags(spark, sf_dir):
    """The drained alert stream must equal the batch scorer's flagged
    set exactly (stateless stream-static join ⇒ replay == batch)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.timeseries import (
        MAD_Z,
        mad_rz,
        mad_stats,
    )
    from mapreducecf_spark.sources import load_table
    from mapreducecf_spark.streaming.graded import stream_anomaly_alerts

    streamed = {
        (r["event_id"], r["rz"])
        for r in stream_anomaly_alerts(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    batch = (
        e.join(F.broadcast(mad_stats(spark, sf_dir)), "event_type")
        .select("event_id", mad_rz().alias("rz"))
        .filter(F.abs(F.col("rz")) > MAD_Z)
    )
    expected = {(r["event_id"], r["rz"]) for r in batch.collect()}
    assert streamed == expected
    assert expected  # non-vacuous: the corpus must contain breaches


def test_stream_histogram_equals_batch(spark, sf_dir):
    from mapreducecf_spark.queries.timeseries import ts_value_histogram
    from mapreducecf_spark.streaming.graded import stream_value_histogram

    batch = {
        (r["event_type"], r["bin"]): (r["n_events"], r["bin_lo"], r["bin_hi"])
        for r in ts_value_histogram(spark, sf_dir).collect()
    }
    streamed = {
        (r["event_type"], r["bin"]): (r["n_events"], r["bin_lo"], r["bin_hi"])
        for r in stream_value_histogram(spark, sf_dir).collect()
    }
    assert batch == streamed
    assert batch
