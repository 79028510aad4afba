"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus the DuckDB
oracle SQL twin for each (driver correctness gate, see __spark_entry__).

Conventions:

- Every computed column is aliased IDENTICALLY in the Spark query and
  the oracle SQL (the driver hash-compares by sorted column name).
- Double aggregates are rounded in BOTH engines so floating-point
  summation order cannot flip the value hash.
- Results are unordered unless the query's semantics include ordering
  (top-k), in which case ties are broken by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(
    name: str, oracle: str | None = None
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator: add a query (and optionally its oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# importing the query modules populates the registry
from mapreducecf_spark import multimodal  # noqa: E402,F401
from mapreducecf_spark.queries import (  # noqa: E402,F401
    dedup,
    relational,
    similarity,
    text,
    timeseries,
    wordcount,
)
