from mapreducecf_spark.functions.exact import csum, csum_sql, dec, dsum

__all__ = ["csum", "csum_sql", "dec", "dsum"]
