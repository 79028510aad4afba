"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query registry lives in ``mapreducecf_spark.registry``; this module is a
thin adapter so the engine is importable as a normal package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreducecf_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: reference-parity word count over
    ``documents.text`` at sf0.001 (SURVEY.md §7.2 step 1)."""
    return registry.QUERIES["wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver does a rows-only check)."""
    return registry.oracles()
