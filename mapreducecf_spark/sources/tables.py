"""Sources: parquet test tables and text-directory scan.

Reference parity (SURVEY.md §2):

- S1/S3 (directory scan + line reader, ``server.py:168-170`` /
  ``client.py:43-44``): :func:`read_text_dir` — ``spark.read.text`` over
  a ``*.txt`` glob, one row per LF-delimited line, non-``.txt`` files
  silently excluded via ``pathGlobFilter``.
- S2 (input-split planning, ``server.py:113-125``): deleted — Spark's
  ``FileSourceScanExec`` plans size-based splits; tune with
  ``spark.sql.files.maxPartitionBytes``.
- S4 (missing-input tolerance, ``client.py:41-42,73-74``):
  ``spark.sql.files.ignoreMissingFiles=true`` (set in session.py).

Scale note: every reader here is a plain declarative scan, so Catalyst
gets column pruning + predicate pushdown into the parquet reader for
free — at 100 TB that is the difference between scanning 2 columns and
scanning 11.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: every driver-provided test table (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Plain ``spark.read.parquet`` so filters and
    projections placed on the result push down into the scan.

    ``events.ts`` encoding has varied across testdata generations —
    parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects;
    read as a nanosecond long under ``nanosAsLong`` and converted with
    exact integer ``div`` — double division would lose precision at
    1e18) or ``timestamp[us]`` NTZ (cast to session-local TIMESTAMP in
    ``convert_nanos_ts``). Both confs are (re)set here, not only in
    session.py: callers (e.g. the driver's harness) may hand us a
    vanilla SparkSession, and the NTZ→LTZ cast is only value-stable
    with the session zone pinned to UTC."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return convert_nanos_ts(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


def convert_nanos_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to a session-local (UTC) TIMESTAMP
    regardless of how the parquet writer encoded it (used by both the
    batch reader and the streaming source):

    - ``TIMESTAMP(NANOS)`` read as long under ``nanosAsLong`` →
      exact integer ``div 1000`` to micros, then ``timestamp_micros``;
    - ``timestamp[us]`` with isAdjustedToUTC=false (inferred as
      TIMESTAMP_NTZ) → cast to TIMESTAMP. The session zone is pinned to
      UTC, so the wall-clock fields are preserved — identical values to
      DuckDB's naive reading — and streaming watermarks (which reject
      NTZ event-time columns) work on the result."""
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.typeName() == "long":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and f.dataType.typeName() == "timestamp_ntz":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def scan_splits(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Estimated FileSourceScan split count for one test table at its
    CURRENT physical layout — pure filesystem arithmetic (per-file
    bin-packing by ``spark.sql.files.maxPartitionBytes``, the planner's
    own rule), no Spark job. Parquet additionally splits only at
    row-group boundaries, so this size-based estimate UPPER-bounds the
    real scan parallelism (a single-row-group file yields one split
    however large the estimate says it could be)."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(p):
        sizes = [
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        ]
    elif os.path.exists(p):
        sizes = [os.path.getsize(p)]
    else:
        # not a file-backed table (pytest-planted DataFrame behind a
        # sentinel sf_dir): report "already fully split" so the spread
        # below passes it through untouched
        return 1 << 30
    try:
        maxpb = int(
            str(spark.conf.get("spark.sql.files.maxPartitionBytes")).rstrip("b")
        )
    except (TypeError, ValueError):
        maxpb = 128 * 1024 * 1024
    return max(1, sum(1 + (s - 1) // maxpb for s in sizes if s > 0))


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, *keys: str
) -> DataFrame:
    """``load_table`` + ADAPTIVE input spread — the guide §2.5 remedy
    for "input skew: one huge unsplittable file ... repartition
    immediately after the read". The driver's test tables are single
    row-group parquet files, so every scan is ONE task and any heavy
    row-wise map that follows (tokenize+explode, per-token md5 chains,
    shingle zips) runs single-threaded while the rest of the cluster
    idles (measured: the shingle-index persist-fill job is one 3.8 s
    task at sf0.1 on local[32]).

    The spread is LAYOUT-adaptive, not a constant: when the filesystem
    estimate says the scan already splits to at least half the
    cluster's default parallelism (the 100 TB case — thousands of
    splits), the table passes through UNTOUCHED and no shuffle is ever
    added; only a scan too coarse for the cluster pays one hash
    repartition of the raw rows (deterministic under retries, unlike
    round-robin). Keys should be the table's row identity so the
    spread is even."""
    return spread(spark, sf_dir, name, load_table(spark, sf_dir, name), *keys)


def spread(
    spark: SparkSession, sf_dir: str, name: str, df: DataFrame, *keys: str
) -> DataFrame:
    """The conditional-repartition half of :func:`load_spread`, taking
    the already-loaded frame — for callers whose load path is module-
    local (query modules whose ``load_table`` pytest monkeypatches) or
    a streaming source over the same file."""
    par = spark.sparkContext.defaultParallelism
    if scan_splits(spark, sf_dir, name) * 2 >= par:
        return df
    if keys:
        from pyspark.sql import functions as F

        return df.repartition(par, *[F.col(k) for k in keys])
    return df.repartition(par)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so the whole surface is
    reachable from ``spark.sql`` — the same names the DuckDB oracle
    uses, making any oracle string runnable on Spark too."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)


def read_text_dir(spark: SparkSession, folder: str) -> DataFrame:
    """Reference source S1+S3: all ``*.txt`` under ``folder``, one row
    per line, column ``value: string`` (newline already stripped — T1).

    ``pathGlobFilter`` reproduces the reference's filename predicate
    (``server.py:170``) including for files added later at the same path.
    """
    return spark.read.option("pathGlobFilter", "*.txt").text(folder)
