"""Additional source formats beyond the reference's text-dir scan and
the testdata's parquet: CSV and JSON-lines readers with explicit
schemas.

Explicit schemas are non-negotiable at scale: schema inference reads
the data TWICE (once to sample, once to execute) and can silently
change types between runs — a 100 TB pipeline pins its schemas. Pass
``schema=None`` only in exploration (it forwards to inference with one
warning comment here instead of a surprise in production).

Both readers return plain DataFrames, so Catalyst pushdown applies
where the format supports it (CSV/JSON support filter pushdown for
file pruning and column pruning of the parse, not page-level skipping
like parquet — another reason parquet is the canonical lake format and
these are ingestion-edge readers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    r = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None,
    **options: str,
) -> DataFrame:
    r = spark.read
    for k, v in options.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
