from mapreducecf_spark.sources.formats import read_csv, read_jsonl
from mapreducecf_spark.sources.tables import (
    TABLES,
    convert_nanos_ts,
    load_spread,
    load_table,
    load_tables,
    read_text_dir,
    register_views,
    scan_splits,
)

__all__ = [
    "TABLES",
    "convert_nanos_ts",
    "load_spread",
    "load_table",
    "load_tables",
    "scan_splits",
    "read_csv",
    "read_jsonl",
    "read_text_dir",
    "register_views",
]
