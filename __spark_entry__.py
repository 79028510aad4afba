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


def _apply_engine_conf(spark: SparkSession) -> None:
    """The engine's documented runtime profile, applied to whatever
    session the harness hands us (it may be a vanilla builder, not
    mapreducecf_spark.get_spark):

    - UTC session timezone: every oracle compares timestamp/date
      truncations against DuckDB's naive timestamps — a non-UTC host
      TZ would shift date_trunc/year on the Spark side only.
    - shuffle partitions 32 (only when still at the 200 default) +
      AQE: the correctness tables are sf<=0.1; 200-task shuffles are
      pure scheduling overhead at that size.

    Runtime-conf only (no session rebuild); static confs like
    nanosAsLong are handled per-read in sources.load_table."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:  # noqa: BLE001 — never fail a query over tuning
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: reference-parity word count over
    ``documents.text`` at sf0.001 (SURVEY.md §7.2 step 1)."""
    _apply_engine_conf(spark)
    return registry.QUERIES["wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_engine_conf(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver does a rows-only check)."""
    return registry.oracles()
