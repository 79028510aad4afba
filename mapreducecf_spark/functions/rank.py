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


def with_hash_bucketed_prefix(
    df: DataFrame,
    part_col: str,
    hash_col: str,
    tiebreak: list[str],
    value,
    out_col: str,
    *,
    inclusive: bool = False,
    prefix_chars: int = 2,
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value`` within each
    ``part_col`` group ordered by ``(hash_col, *tiebreak)`` — exclusive
    of the current row unless ``inclusive`` — WITHOUT an unbounded
    per-group window (whose per-task row count tracks the data when
    ``part_col`` has few values; AQE cannot split window partitions).

    Requires ``part_col`` and ``hash_col`` to be NON-NULL: the bucket
    offsets come back through an inner equi-join on
    ``(part_col, prefix)``, so a NULL in either key would silently
    DROP the row (the single-window equivalent would keep it, NULLS
    FIRST). Every current call site derives ``hash_col`` as md5 of a
    non-null id; future callers with nullable keys must coalesce
    first. Requires ``hash_col`` to be a fixed-width lowercase HEX
    string (md5): its first ``prefix_chars`` characters split each group
    into ``16^prefix_chars`` uniform sub-buckets whose STRING order
    equals the hash order (prefix dominates lexicographic comparison),
    so per-bucket prefix sums compose exactly:

    1. running sum WITHIN (part, sub-bucket) — a window whose
       partitions are |parts| × 16^prefix_chars uniform slices;
    2. per-(part, sub-bucket) totals — a tiny partial-agg rollup;
    3. each bucket's starting offset = totals of same-part buckets
       with a smaller prefix (an O(buckets²) self-join on tiny data),
       broadcast-joined back.

    The output is EXACTLY the single-window running sum (offsets are
    integer totals, order-independent), so oracles keep their plain
    ``sum(...) OVER (PARTITION BY part ORDER BY hash, ...)`` — only
    the plan changes. A 100 TB deployment raises ``prefix_chars`` with
    the corpus (each character is another 16× parallelism).

    With ``value=F.lit(1), inclusive=True`` this is ``row_number()``
    over the same per-group order.
    """
    val = F.col(value) if isinstance(value, str) else value
    sub = F.substring(F.col(hash_col), 1, prefix_chars)
    d = df.withColumn("_sub", sub)
    hi = 0 if inclusive else -1
    wl = (
        Window.partitionBy(part_col, "_sub")
        .orderBy(hash_col, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = d.withColumn(
        "_lps", F.coalesce(F.sum(val).over(wl), F.lit(0)).cast("bigint")
    )
    sums = d.groupBy(part_col, "_sub").agg(
        F.sum(val).cast("bigint").alias("_s")
    )
    offsets = (
        sums.alias("a")
        .join(
            sums.alias("b"),
            (F.col(f"b.{part_col}") == F.col(f"a.{part_col}"))
            & (F.col("b._sub") < F.col("a._sub")),
            "left",
        )
        .groupBy(
            F.col(f"a.{part_col}").alias(part_col),
            F.col("a._sub").alias("_sub"),
        )
        .agg(F.coalesce(F.sum("b._s"), F.lit(0)).cast("bigint").alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), [part_col, "_sub"])
        .withColumn(out_col, (F.col("_off") + F.col("_lps")).cast("bigint"))
        .drop("_sub", "_lps", "_off")
    )
