"""Per-job profile of one registered query: run it warm (family
artifacts built), then re-run with the REST status API sampled before
and after, printing every Spark job the re-run submitted with its wall
duration, stage task counts, and description. This answers "which of
the query's N jobs is the slow one" without the UI (guide §7.1 in a
headless sandbox).

Usage::

    python tools/profile_jobs.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jobs(ui: str, app_id: str) -> list[dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
        return json.load(r)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if not args:
        print(__doc__)
        return 2

    from mapreducecf_spark import get_spark
    from mapreducecf_spark.registry import QUERIES

    spark = get_spark(app_name="mapreducecf-profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    if any(q.startswith("stream_") for q in args):
        from pyspark.sql import functions as F

        wq = (
            spark.readStream.format("rate").option("rowsPerSecond", "1").load()
            .groupBy((F.col("value") % 8).alias("k")).agg(F.count("*").alias("n"))
            .writeStream.format("memory").queryName("profile_warmup_stream")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        wq.awaitTermination()

    for name in args:
        fn = QUERIES[name]
        # warm run: builds family artifacts, compiles codegen
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        seen = {j["jobId"] for j in _jobs(ui, app_id)}
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(0.5)
        new = [j for j in _jobs(ui, app_id) if j["jobId"] not in seen]
        new.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: warm wall {wall:.2f}s, {len(new)} jobs ===")
        from datetime import datetime

        def ts(s: str) -> float:
            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        prev_end = None
        for j in new:
            dur = ts(j["completionTime"]) - ts(j["submissionTime"])
            gap = ts(j["submissionTime"]) - prev_end if prev_end is not None else 0.0
            prev_end = ts(j["completionTime"])
            desc = (j.get("description") or j.get("name") or "")[:110]
            print(
                f"job {j['jobId']:>5} dur={dur:6.2f}s gap={gap:6.2f}s "
                f"tasks={j['numTasks']:>4} stages={len(j['stageIds']):>2}  {desc}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
