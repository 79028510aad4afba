"""Empty-corpus robustness sweep: EVERY registered query must run
against zero-row tables and produce a (usually empty) result, never
crash. A daily pipeline's increment is legitimately empty — holidays,
upstream outages, a filter that matched nothing — and an engine that
throws on empty input turns a quiet day into a page. Classes of bug
this gate has already caught: numpy axis-1 norms on 0-row matrices
(k-means codebook, Arrow scorers), schema inference over sinks whose
empty write produced no files, and a foreachBatch lake whose output
dir never came into existence."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    from mapreducecf_spark.sources import TABLES

    out = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        df.limit(0).write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def test_every_query_survives_an_empty_corpus(spark, empty_sf_dir):
    from mapreducecf_spark.registry import QUERIES

    failures: dict[str, str] = {}
    n_rows: dict[str, int] = {}
    for name, fn in QUERIES.items():
        try:
            n_rows[name] = fn(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            failures[name] = str(ex).splitlines()[0][:200]
    assert not failures, failures
    # a handful of rollups legitimately emit summary rows (counts of
    # zero) on empty input; everything else must be empty — a NON-empty
    # per-row result on an empty corpus means a query invented data
    emitters = {n for n, r in n_rows.items() if r > 0}
    for name in emitters:
        assert n_rows[name] <= 60, (name, n_rows[name])


@pytest.fixture(scope="module")
def nulls_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """sf dir with NULLs injected into every nullable payload column —
    crawl reality (encoder failures, missing props, failed fetches)."""
    from mapreducecf_spark.sources import TABLES
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("sf_nulls"))
    for t in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("text")),
            )
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(
                    F.col("embedding")
                ),
            )
        if t == "events":
            df = df.withColumn(
                "props",
                F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
                    F.col("props")
                ),
            ).withColumn(
                "value",
                F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(
                    F.col("value")
                ),
            )
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def test_every_query_survives_null_cells(spark, nulls_sf_dir):
    """NULL text / embedding / props / value cells must degrade to
    dropped-or-propagated rows (the SQL null discipline and the
    documented vector/decode policies), never crash an Arrow stage."""
    from mapreducecf_spark.registry import QUERIES

    failures: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            fn(spark, nulls_sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            failures[name] = str(ex).splitlines()[0][:200]
    assert not failures, failures
