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
