"""Reference-parity tests for the word-count pipeline (SURVEY.md §5,
FIXTURES.md §1-2): known-multiset fixtures in both casing modes, the
pinned tokenizer edge cases, and the golden end-to-end totals on the
reference's own corpus. All checks are order-insensitive (reference
output order is dict-insertion order, client.py:81)."""

from __future__ import annotations

import os
import random

import pytest

from mapreducecf_spark.operators.wordcount import tokenize, word_count, write_counts

# ground-truth multiset from the reference's fixture generator
# (create_unitest_files.py:4-10)
GROUND_TRUTH = {
    "Hello": 30,
    "world": 351,
    "World": 210,
    "This": 98,
    "is": 80,
    "hello": 7,
    "nonsense": 142,
}
EXPECTED_CI = {"hello": 37, "world": 561, "this": 98, "is": 80, "nonsense": 142}

REFERENCE_INPUTS = "/root/reference/inputs"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Reference fixture layout: the multiset shuffled and round-robined
    into 10 one-line .txt files (create_unitest_files.py:12-40), plus a
    decoy non-.txt file that must be excluded (server.py:170)."""
    d = tmp_path_factory.mktemp("wc_fixture")
    words = [w for w, n in GROUND_TRUTH.items() for _ in range(n)]
    random.Random(7).shuffle(words)
    n_files = 10
    per = len(words) // n_files
    for i in range(n_files):
        chunk = words[i * per : (i + 1) * per]
        if i == 0:
            chunk += words[n_files * per :]
        (d / f"text_{i}.txt").write_text(" ".join(chunk) + "\n")
    (d / "decoy.csv").write_text("should not be read\n")
    return str(d)


def counts_of(df) -> dict[str, int]:
    return {r["word"]: r["cnt"] for r in df.collect()}


def test_case_insensitive_fixture(spark, fixture_dir):
    from mapreducecf_spark.sources import read_text_dir

    df = word_count(read_text_dir(spark, fixture_dir), case_sensitive=False)
    assert counts_of(df) == EXPECTED_CI


def test_case_sensitive_fixture(spark, fixture_dir):
    from mapreducecf_spark.sources import read_text_dir

    df = word_count(read_text_dir(spark, fixture_dir), case_sensitive=True)
    assert counts_of(df) == GROUND_TRUTH


def test_fewer_files_than_partitions(spark, tmp_path):
    """Edge cases from README.md:32,98: more tasks than files / more
    reduce partitions than distinct words — Spark must return the same
    counts regardless of DOP."""
    (tmp_path / "one.txt").write_text("a b a\n")
    df = spark.read.text(str(tmp_path)).repartition(16)
    assert counts_of(word_count(df)) == {"a": 2, "b": 1}


TOKENIZER_CASES = [
    # (input line, expected tokens) — pinned in SURVEY.md §6.2 / FIXTURES.md
    ("he's here", ["hes", "here"]),
    ("well-known fact", ["wellknown", "fact"]),
    ("em — dash", ["em", "—", "dash"]),
    ("a\tb c", ["a\tb", "c"]),
    ("many   spaces", ["many", "spaces"]),
    ("  lead trail  ", ["lead", "trail"]),
    ("!!! ...", []),
    ("", []),
]


def test_tokenizer_edge_cases(spark):
    for line, expected in TOKENIZER_CASES:
        df = spark.createDataFrame([(line,)], "value string")
        got = [r["word"] for r in tokenize(df).collect()]
        assert sorted(got) == sorted(expected), f"line={line!r}"


def test_tokenizer_matches_reference_implementation(spark):
    """Property check: our tokenizer == the reference's Python loop
    (client.py:16-21 semantics, reimplemented here from the survey's
    pinned behavior) on randomized ASCII lines."""
    import re
    import string

    def reference_tokenize(ln: str) -> list[str]:
        ln = ln.replace("\n", "")
        for c in string.punctuation:
            ln = ln.replace(c, "")
        return [w for w in re.split(r" +", ln) if len(w.strip())]

    rng = random.Random(42)
    alphabet = string.ascii_letters + string.punctuation + " \t" + "éü—"
    lines = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(200)
    ]
    expected = sorted(t for ln in lines for t in reference_tokenize(ln))
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    got = sorted(r["word"] for r in tokenize(df).collect())
    assert got == expected


@pytest.mark.skipif(not os.path.isdir(REFERENCE_INPUTS), reason="reference corpus absent")
def test_golden_corpus_totals(spark):
    """End-to-end golden values measured from the reference
    (BASELINE.md): 608,306 tokens, 23,703 distinct, pinned top-10."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.sources import read_text_dir

    df = word_count(read_text_dir(spark, REFERENCE_INPUTS), case_sensitive=False)
    df = df.cache()
    try:
        total, distinct = df.agg(
            F.sum("cnt").alias("t"), F.count("*").alias("d")
        ).first()
        assert (total, distinct) == (608306, 23703)
        top10 = [(r["word"], r["cnt"]) for r in df.orderBy(F.desc("cnt")).limit(10).collect()]
        assert top10 == [
            ("the", 32418), ("and", 24366), ("to", 16085), ("of", 13744),
            ("a", 13502), ("i", 13380), ("he", 9221), ("it", 9010),
            ("in", 8756), ("was", 8628),
        ]
    finally:
        df.unpersist()


def test_sink_roundtrip(spark, tmp_path):
    """K1/K2: space-separated lines, overwrite mode."""
    df = spark.createDataFrame([("x x y",)], "value string")
    out = str(tmp_path / "out")
    write_counts(word_count(df), out)
    write_counts(word_count(df), out)  # overwrite must not fail or append
    lines = sorted(r["value"] for r in spark.read.text(out).collect())
    assert lines == ["x 2", "y 1"]
