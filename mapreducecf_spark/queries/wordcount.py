"""Flagship + reference-parity queries over ``documents.text``.

The reference's entire query surface is word count (SURVEY.md §0); here
it runs over the driver's ``documents`` table. Oracle SQL mirrors the
DuckDB pipeline that was verified byte-exact against the reference
(SURVEY.md §6.2). DuckDB needs the 'g' flag for global regexp_replace;
Spark's regexp_replace is global by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecf_spark.operators.wordcount import word_count
from mapreducecf_spark.registry import register
from mapreducecf_spark.sources import load_table

# DuckDB twin of operators.wordcount.tokenize (T1-T3 + F1)
_ORACLE_TOKENS = r"""
SELECT unnest(string_split_regex(
         regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'), ' +')) AS word
FROM documents
"""


@register(
    "wordcount",
    oracle=f"""
SELECT lower(word) AS word, count(*) AS cnt
FROM ({_ORACLE_TOKENS}) t
WHERE regexp_matches(word, '\\S')
GROUP BY 1
""",
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference query, case-insensitive default (server.py:212-213)."""
    docs = load_table(spark, sf_dir, "documents")
    return word_count(docs, col="text", case_sensitive=False)


@register(
    "wordcount_case_sensitive",
    oracle=f"""
SELECT word, count(*) AS cnt
FROM ({_ORACLE_TOKENS}) t
WHERE regexp_matches(word, '\\S')
GROUP BY 1
""",
)
def wordcount_case_sensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--case_sensitive mode (server.py:211, client.py:63-67)."""
    docs = load_table(spark, sf_dir, "documents")
    return word_count(docs, col="text", case_sensitive=True)


@register(
    "wordcount_topk",
    oracle=f"""
SELECT lower(word) AS word, count(*) AS cnt
FROM ({_ORACLE_TOKENS}) t
WHERE regexp_matches(word, '\\S')
GROUP BY 1
ORDER BY cnt DESC, word ASC
LIMIT 20
""",
)
def wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 words; deterministic tie-break on the word itself.

    TakeOrderedAndProject physically: per-partition top-k then a
    single-row-bounded driver merge — no global sort at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = word_count(docs, col="text", case_sensitive=False)
    return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(20)
