"""Sinks — the generalization of the reference's K1/K2 text sink
(``client.py:80-82`` write, ``server.py:137-144`` delete+recreate
lifecycle) to the formats a pipeline engine needs.

- :func:`write_table`: parquet/csv/json with ``partitionBy``,
  overwrite semantics, and an output-file-count knob (``n_files``) —
  the G1 ``n_reduce`` analogue (``server.py:209-210``): the reference
  emits one ``out-m`` file per reduce task; here the final partition
  count decides the file count.
- Dynamic partition overwrite (``overwrite_partitions=True``) replaces
  only the partitions present in ``df`` — K2 generalized from
  "truncate the whole output dir" to "truncate what you rewrote",
  which is the only sane overwrite at 100 TB.

Scale notes: ``n_files`` always plans ``repartition`` (round-robin
without ``partition_cols``; hash on the partition columns with them,
ensuring one writer task per output partition instead of every task
writing every partition — the small-files explosion at scale). A
``coalesce`` shrink would save the exchange but collapses the WHOLE
upstream stage to ``n_files`` tasks (the classic coalesce(1) trap);
the explicit exchange keeps upstream parallelism wide and pays one
shuffle sized by the output data — the right trade whenever the plan
above the sink does real work. It also guarantees exactly ``n_files``
output files regardless of the scan's partition count, and stays
plan-only: no ``df.rdd`` probe (that would force an extra
physical-plan translation per write, and under AQE the pre-execution
partition count is a guess anyway).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    mode: str = "overwrite",
    n_files: int | None = None,
    fmt: str = "parquet",
    overwrite_partitions: bool = False,
    **options: str,
) -> None:
    """Write ``df`` to ``path``; see module docstring for semantics.
    Extra ``options`` forward to the writer (e.g. ``header="true"``
    for csv)."""
    out = df
    if n_files is not None:
        if partition_cols:
            # co-locate each output partition's rows in one writer task
            out = df.repartition(n_files, *partition_cols)
        else:
            out = df.repartition(n_files)
    writer = out.write.mode(mode).format(fmt)
    for k, v in options.items():
        writer = writer.option(k, v)
    if overwrite_partitions:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Round-trip reader; partition columns written via ``partitionBy``
    come back as columns (partition discovery)."""
    return spark.read.format(fmt).load(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (catalog) table: rows are
    hash-clustered into ``n_buckets`` files by ``bucket_cols``.

    THE pre-shuffle for repeated big-big joins at 100 TB: two tables
    bucketed the same way join with NO Exchange on either side (the
    scan's output partitioning already satisfies the join's
    requirement) — pay the shuffle once at write time, amortize it over
    every subsequent join/aggregation on the key. ``sort_cols`` also
    pre-sorts within buckets, removing the Sort under sort-merge joins.
    Bucketed tables must go through the catalog (``saveAsTable``):
    path-based writes don't record bucketing metadata."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
