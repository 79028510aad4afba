"""Unit tests for queries.text — the properties the parity check can't
see: normalization collisions and heuristic behavior on known inputs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fingerprint_collapses_case_punct_whitespace(spark):
    from mapreducecf_spark.operators.wordcount import tokenize  # noqa: F401
    from mapreducecf_spark.queries.text import tokens_array

    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "HELLO--WORLD"),  # punct deleted, not spaced: "helloworld"
        ],
        "doc_id int, text string",
    )
    canon = F.array_join(F.transform(tokens_array(F.col("text")), F.lower), " ")
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", F.md5(canon).alias("fp")).collect()}
    assert fps[1] == fps[2]
    # reference tokenizer deletes punctuation (T2), so 3 is ONE token
    assert fps[3] != fps[1]


def test_language_id_flags_stopword_heavy_text(spark):
    from mapreducecf_spark.queries.text import STOPWORDS, tokens_array

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and it is warm"), (2, "foo bar baz qux")],
        "doc_id int, text string",
    )
    toks = tokens_array(F.col("text"))
    lowered = F.transform(toks, F.lower)
    ratio = (
        F.size(F.filter(lowered, lambda x: x.isin(*STOPWORDS))).cast("double")
        / F.size(toks)
    )
    rows = {r["doc_id"]: r["r"] for r in df.select("doc_id", ratio.alias("r")).collect()}
    assert rows[1] >= 0.05
    assert rows[2] == 0.0


def test_doc_token_stats_is_narrow(spark, sf_dir):
    """The per-doc stats must not shuffle: no Exchange in the plan."""
    import contextlib
    import io

    from mapreducecf_spark.registry import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["text_doc_token_stats"](spark, sf_dir).explain(mode="simple")
    assert "Exchange" not in buf.getvalue()


def test_registered_udf_matches_native_tokenizer(spark, sf_dir):
    """The SQL-registered Arrow UDF and the JVM-side HOF expression
    must agree token-for-token (same reference tokenizer semantics)."""
    from mapreducecf_spark.registry import QUERIES

    udf_counts = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["scalar_udf_tokens"](spark, sf_dir).collect()
    }
    native = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["text_doc_token_stats"](spark, sf_dir).collect()
    }
    assert udf_counts == native
