"""Salting helpers must be pure physical rewrites: identical results
to the unsalted plan, salts spread hot keys, no salt column leaks."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark, sf_dir):
    from mapreducecf_spark.functions.skew import salted_join
    from mapreducecf_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    c = c.withColumnRenamed("c_custkey", "o_custkey")

    plain = o.join(c, ["o_custkey"])
    salted = salted_join(o, c, ["o_custkey"], n_salts=8, salt_source="o_orderkey")
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_left_outer_keeps_unmatched(spark):
    from mapreducecf_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 0)], "k int, v int"
    )
    small = spark.createDataFrame([(1, "hot")], "k int, tag string")
    out = salted_join(big, small, ["k"], n_salts=4, how="left", salt_source="v")
    assert out.count() == 101
    assert out.filter("k = 2").collect()[0]["tag"] is None


def test_salted_join_spreads_hot_key_across_salts(spark):
    from mapreducecf_spark.functions.skew import SALT_COL, salted_join  # noqa: F401
    from pyspark.sql import functions as F

    big = spark.createDataFrame([(1, i) for i in range(1000)], "k int, v int")
    # peek at the salt distribution the helper would produce
    salts = (
        big.withColumn("s", F.pmod(F.hash("k", "v"), F.lit(8)))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(salts) == 8  # hot key occupies every salt bucket
    assert max(r["count"] for r in salts) < 1000  # no single straggler


def test_salted_global_agg_matches_plain(spark, sf_dir):
    from mapreducecf_spark.functions.skew import salted_global_agg
    from mapreducecf_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.max("l_quantity").alias("max_q"),
        F.min("l_shipdate").alias("first_ship"),
    )
    salted = salted_global_agg(
        li,
        ["l_returnflag"],
        {"n": "count:*", "max_q": "max:l_quantity", "first_ship": "min:l_shipdate"},
        n_salts=16,
        salt_source="l_orderkey",
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)
