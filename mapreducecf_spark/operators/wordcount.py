"""Reference-parity word count — the reference engine's entire query
surface, re-expressed as one declarative DataFrame pipeline.

Semantics pinned to the reference (SURVEY.md §2, verified byte-exact vs
a DuckDB oracle in SURVEY.md §6.2):

- T1 newline strip (``client.py:17``): implicit in ``spark.read.text``.
- T2 punctuation removal (``client.py:18-19``): delete (not replace with
  space) exactly the 32 ASCII ``string.punctuation`` chars — regex class
  ``[!-/:-@\\[-`{-~]``. ``"he's"``→``hes``, ``"well-known"``→``wellknown``;
  Unicode punctuation (``—``) is KEPT and becomes a token.
- T3 tokenizer (``client.py:20-21``): split on one-or-more SPACES only
  (tabs do not split).
- F1 filter (``client.py:21``): drop tokens with no non-whitespace char.
- A1 case fold (``client.py:63-67,77``): ``lower()`` unless
  ``case_sensitive`` — applied at aggregation time, like the reference
  folds on the reduce side only.
- A2 aggregate (``client.py:71-78``): ``count(*) GROUP BY word``. Spark
  adds the map-side partial aggregate the reference lacks — on the
  reference corpus that cuts shuffle rows from 608,306 to ≤23,703 per
  partition, and at 100 TB it is the difference between shuffling every
  token occurrence and shuffling one row per (partition, word).
- K1/K2 sink (``client.py:80-82``, ``server.py:137-144``): space-
  separated ``word count`` lines, overwrite semantics, one file per
  partition (mirrors one ``out-m`` per reduce task).
- P1/X1/X2 (first-char bucketing + file shuffle, ``client.py:36-48``):
  deleted — Spark's Exchange hash-partitions on the full word with
  Murmur3, which satisfies the reference's co-location invariant
  (SURVEY.md §1.4) without the first-char skew (all "t..." words in one
  bucket) the reference suffers.

Output is unordered, like the reference (``client.py:81``); consumers
must not rely on row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: exactly Python's ``string.punctuation`` as a Java regex char class
#: (``!-/``, ``:-@``, ``[-```, ``{-~`` are the four contiguous ASCII runs)
ASCII_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


def tokenize(df: DataFrame, col: str = "value") -> DataFrame:
    """T1-T3 + F1: one output row per token, column ``word: string``.

    Whole pipeline is built-in expressions (regexp_replace / split /
    explode / rlike) — stays inside whole-stage codegen, no Python.
    """
    stripped = F.regexp_replace(F.col(col), ASCII_PUNCT_CLASS, "")
    return (
        df.select(F.explode(F.split(stripped, " +")).alias("word"))
        # \S not trim(): the reference drops tokens that are *any*
        # whitespace (tabs included), not just spaces (client.py:21)
        .filter(F.col("word").rlike(r"\S"))
    )


def tokens_array(col: Column) -> Column:
    """The reference tokenizer as a NARROW array expression (T2+T3+F1
    without the explode): ASCII-punct strip -> split on ' +' -> drop
    blank tokens. One array per row, no shuffle — the building block
    for per-document text analysis and shingling."""
    split = F.split(F.regexp_replace(col, ASCII_PUNCT_CLASS, ""), " +")
    return F.filter(split, lambda x: x.rlike(r"\S"))


def fold_case(col: Column, case_sensitive: bool) -> Column:
    """A1: reduce-side case normalization (client.py:63-67)."""
    return col if case_sensitive else F.lower(col)


def word_count(df: DataFrame, col: str = "value", case_sensitive: bool = False) -> DataFrame:
    """The reference's one query: ``SELECT word, count(*) GROUP BY word``
    over the tokenized input (SURVEY.md §0). Returns columns
    ``word: string, cnt: bigint``, unordered."""
    tokens = tokenize(df, col)
    word = fold_case(F.col("word"), case_sensitive).alias("word")
    return tokens.select(word).groupBy("word").agg(F.count("*").alias("cnt"))


def write_counts(df: DataFrame, path: str) -> None:
    """K1+K2 sink: ``"{word} {count}"`` lines, overwrite, one file per
    partition (reference writes one ``out-m`` per reduce task)."""
    (
        df.select(F.concat_ws(" ", F.col("word"), F.col("cnt")).alias("value"))
        .write.mode("overwrite")
        .text(path)
    )
