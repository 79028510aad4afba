"""Two-phase global rank (functions.rank): exact equivalence to the
single-partition window it replaces, and the ntile arithmetic twin."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_two_phase_rank_equals_window_row_number(spark, sf_dir):
    from mapreducecf_spark.functions.rank import with_global_row_number
    from mapreducecf_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("len")
    )
    order = [F.desc("len"), F.asc("doc_id")]
    got = {
        r["doc_id"]: r["rn"]
        for r in with_global_row_number(d, order, out_col="rn").collect()
    }
    want = {
        r["doc_id"]: r["rn"]
        for r in d.select(
            "doc_id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    assert got == want


def test_two_phase_rank_empty_and_tiny(spark):
    from mapreducecf_spark.functions.rank import with_global_row_number

    empty = spark.createDataFrame([], "k int")
    assert with_global_row_number(empty, [F.asc("k")]).count() == 0
    tiny = spark.createDataFrame([(3,), (1,), (2,)], "k int")
    rows = {
        r["k"]: r["rn"]
        for r in with_global_row_number(tiny, [F.asc("k")]).collect()
    }
    assert rows == {1: 1, 2: 2, 3: 3}


def test_ntile_arithmetic_matches_builtin(spark, sf_dir):
    """window_ntile_quartiles' two-phase ntile must bucket identically
    to F.ntile over the single-partition window, including the uneven
    total % 4 case (exercised by limiting to a non-multiple-of-4)."""
    from mapreducecf_spark.registry import QUERIES
    from mapreducecf_spark.sources import load_table

    got = {
        r["quartile"]: (r["n"], r["min_bal"], r["max_bal"])
        for r in QUERIES["window_ntile_quartiles"](spark, sf_dir).collect()
    }
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    want = {
        r["quartile"]: (r["n"], r["min_bal"], r["max_bal"])
        for r in c.select("c_acctbal", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .collect()
    }
    assert got == want
    # uneven remainder case: 7 rows -> buckets of 2,2,2,1 (ntile rule)
    from mapreducecf_spark.functions.rank import with_global_row_number

    seven = spark.createDataFrame([(i,) for i in range(7)], "v int")
    ranked = with_global_row_number(seven, [F.asc("v")], out_col="rn")
    tot = ranked.agg(F.count("*").alias("tot"))
    quartile = F.expr(
        "CASE WHEN rn <= (tot % 4) * (tot div 4 + 1) "
        "THEN (rn - 1) div (tot div 4 + 1) + 1 "
        "ELSE (tot % 4) + (rn - (tot % 4) * (tot div 4 + 1) - 1) div (tot div 4) + 1 END"
    )
    sizes = (
        ranked.crossJoin(F.broadcast(tot))
        .select(quartile.cast("int").alias("q"))
        .groupBy("q")
        .count()
    )
    assert {r["q"]: r["count"] for r in sizes.collect()} == {1: 2, 2: 2, 3: 2, 4: 1}

def test_hash_bucketed_prefix_equals_single_window(spark):
    """with_hash_bucketed_prefix (both inclusive flags, prefix_chars 1
    and 2) must be bit-identical to the plain single-window running sum
    it replaces, on an md5-keyed frame with multiple parts, duplicate
    hash prefixes, and values that exercise the exclusive frame's
    leading zero."""
    from mapreducecf_spark.functions.rank import with_hash_bucketed_prefix

    base = (
        spark.range(500)
        .select(
            (F.col("id") % 3).alias("part"),
            F.md5(F.col("id").cast("string")).alias("h"),
            F.col("id").alias("tb"),
            (F.col("id") % 7 + 1).alias("v"),
        )
    )
    for inclusive in (False, True):
        hi = 0 if inclusive else -1
        w = (
            Window.partitionBy("part")
            .orderBy("h", "tb")
            .rowsBetween(Window.unboundedPreceding, hi)
        )
        want = {
            (r["part"], r["tb"]): r["ps"]
            for r in base.withColumn(
                "ps", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint")
            ).collect()
        }
        for pc in (1, 2):
            got = {
                (r["part"], r["tb"]): r["ps"]
                for r in with_hash_bucketed_prefix(
                    base, "part", "h", ["tb"], "v", "ps",
                    inclusive=inclusive, prefix_chars=pc,
                ).collect()
            }
            assert got == want, (inclusive, pc)


def test_hash_bucketed_prefix_row_number_mode(spark):
    """value=lit(1), inclusive=True is row_number over the per-part
    (hash, tiebreak) order — the pipe_shuffle_shards contract."""
    from mapreducecf_spark.functions.rank import with_hash_bucketed_prefix

    base = spark.range(100).select(
        (F.col("id") % 4).alias("part"),
        F.md5(F.concat(F.lit("x"), F.col("id").cast("string"))).alias("h"),
        F.col("id").alias("tb"),
    )
    w = Window.partitionBy("part").orderBy("h", "tb")
    want = {
        r["tb"]: r["rn"]
        for r in base.withColumn(
            "rn", F.row_number().over(w).cast("bigint")
        ).collect()
    }
    got = {
        r["tb"]: r["rn"]
        for r in with_hash_bucketed_prefix(
            base, "part", "h", ["tb"], F.lit(1), "rn", inclusive=True
        ).collect()
    }
    assert got == want
