from mapreducecf_spark.sources.tables import TABLES, load_table, load_tables, read_text_dir

__all__ = ["TABLES", "load_table", "load_tables", "read_text_dir"]
