from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mapreducecf_spark import get_spark

    s = get_spark(app_name="mapreducecf-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(autouse=True)
def _restore_session_confs(request):
    """Session confs are shared JVM state: a test that runs the CLI
    (get_spark(shuffle_partitions=n_reduce) conf-sets the LIVE session)
    or flips a planner knob would otherwise leak it into every later
    test — e.g. shuffle.partitions=1 left by the CLI's last run makes
    repartition(col) plan as SinglePartition, breaking downstream
    plan-shape assertions. Snapshot-and-restore the two knobs tests
    actually touch. Only grabs the spark fixture when the test already
    uses it, so non-Spark tests don't pay session startup."""
    if "spark" not in request.fixturenames:
        yield
        return
    spark = request.getfixturevalue("spark")
    keys = [
        "spark.sql.shuffle.partitions",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    yield
    for k, v in old.items():
        if spark.conf.get(k) != v:
            spark.conf.set(k, v)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from mapreducecf_spark.sources import load_tables

    return load_tables(spark, sf_dir)


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the test tables registered as views —
    mirrors the driver's oracle harness."""
    import duckdb

    from mapreducecf_spark.sources import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()
