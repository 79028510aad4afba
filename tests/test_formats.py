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
