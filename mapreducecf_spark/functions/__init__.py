from mapreducecf_spark.functions.exact import csum, csum_sql, dec, dsum, dsum_dec

__all__ = ["csum", "csum_sql", "dec", "dsum", "dsum_dec"]
