"""applyInPandasWithState: state must persist ACROSS micro-batches.
The input is split into multiple files consumed one per trigger, so a
user seen in several batches proves the accumulator carries over; the
final emission per user must equal the batch-mode groupBy totals."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_running_totals_accumulate_across_microbatches(spark, sf_dir, tmp_path):
    from mapreducecf_spark.sources import load_table
    from mapreducecf_spark.streaming.stateful import running_user_totals

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "stream_src")
    events.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("mem_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 4  # really ran multiple micro-batches

    out = spark.table("mem_state")
    # several emissions per user across batches => state was re-read
    assert out.groupBy("user_id").count().agg(F.max("count")).collect()[0][0] > 1

    # final emission (max n_events — monotone) must equal batch totals
    final = {
        r["user_id"]: r
        for r in out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    expected = {
        r["user_id"]: r
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, exp in expected.items():
        assert final[uid]["n_events"] == exp["n"]
        assert final[uid]["total_value"] == pytest.approx(exp["tv"], rel=1e-9)
