"""Scalable exact global ranking.

``row_number() OVER (ORDER BY ...)`` with no partition moves the whole
input through ONE task (Spark's WindowExec warns about exactly this) —
fine for a provably tiny post-aggregation series (daily rollups), wrong
for anything input-sized (a vocabulary, a customer table). The scalable
exact equivalent is the classic two-phase rank:

1. range-repartition on the sort key (parallel sampling + shuffle, the
   same machinery as a global ``orderBy``), rank WITHIN each partition
   (a partitioned window — parallel);
2. compute each partition's row count (P tiny rows) and turn them into
   per-partition prefix offsets with an O(P²) self-join — P is the
   shuffle-partition count, so this is constant work and avoids both a
   driver collect and another unpartitioned window;
3. global row_number = partition offset + local row_number, via a
   broadcast join on the partition id.

The output is EXACTLY row_number over the total order (offsets don't
depend on where the range sampler put the boundaries), so oracles keep
their plain ``row_number() OVER (ORDER BY ...)`` — only the plan
changes. Cost: one extra tiny shuffle versus the single-task window;
wall-clock wins as soon as the input outgrows one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_row_number(
    df: DataFrame,
    order: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = global ``row_number()`` over ``order``
    (which must be a TOTAL order — include a unique tiebreak column,
    exactly as a deterministic window would) without a single-partition
    window."""
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = df.repartitionByRange(int(parts), *order).withColumn(
        "_gpid", F.spark_partition_id()
    )
    wl = Window.partitionBy("_gpid").orderBy(*order)
    local = ranged.withColumn("_lrn", F.row_number().over(wl))
    counts = local.groupBy("_gpid").agg(F.count("*").alias("_c"))
    offsets = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b._gpid") < F.col("a._gpid"), "left")
        .groupBy(F.col("a._gpid").alias("_gpid"))
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_gpid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("int"))
        .drop("_gpid", "_lrn", "_off")
    )
