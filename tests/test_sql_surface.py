"""The SQL entry path: registered views must make oracle-style SQL
runnable directly on Spark."""

from __future__ import annotations


def test_register_views_enables_spark_sql(spark, sf_dir):
    from mapreducecf_spark.sources import TABLES, register_views

    register_views(spark, sf_dir)
    for t in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0]["n"] > 0
    # a join across views, the way an oracle query would be written
    n = spark.sql(
        """
        SELECT count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        """
    ).collect()[0]["n"]
    assert n > 0
