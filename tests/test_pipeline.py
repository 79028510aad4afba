"""Unit tests for queries.pipeline — the properties the parity check
can't see: that flagged contamination is REAL overlap, that the
repetition gate fires on constructed repetitive text, that sampling is
deterministic and correctly sized."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_decontaminate_flags_are_real_overlap(spark, sf_dir):
    """Every flagged train doc must share at least one DECON_K-shingle
    with some val doc — recomputed independently from raw shingles."""
    from mapreducecf_spark.queries.dedup import shingles_df
    from mapreducecf_spark.queries.pipeline import (
        DECON_K,
        _split_col,
        pipe_decontaminate,
    )

    flagged = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in pipe_decontaminate(spark, sf_dir).collect()
    }
    sh = (
        shingles_df(spark, sf_dir, k=DECON_K)
        .withColumn("split", _split_col(F.col("doc_id")))
        .collect()
    )
    val_shingles = {r["shingle"] for r in sh if r["split"] == "val"}
    by_doc: dict[int, set[str]] = {}
    for r in sh:
        if r["split"] == "train":
            by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
    expect = {
        d: len(s & val_shingles) for d, s in by_doc.items() if s & val_shingles
    }
    assert flagged == expect


def test_repetition_gate_fires_on_repetitive_text(spark):
    from mapreducecf_spark.queries import pipeline as P

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "the quick brown fox jumps over a lazy dog tonight"),
        ],
        "doc_id int, text string",
    )
    # reuse the module's expressions by running the registered query
    # shape on a temp table is overkill — recompute the two fractions
    lt = F.transform(
        F.split(F.regexp_replace("text", r"[!-/:-@\[-`{-~]", ""), " +"), F.lower
    )
    n = F.size("lt")
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(F.col("lt")),
            lambda w: F.size(F.filter(F.col("lt"), lambda x: x == w)),
        )
    )
    rows = {
        r["doc_id"]: r["frac"]
        for r in df.select("doc_id", lt.alias("lt"))
        .select("doc_id", (top_cnt.cast("double") / n).alias("frac"))
        .collect()
    }
    assert rows[1] > P.TOP_TOKEN_MAX  # all-same-token doc must fail the gate
    assert rows[2] <= P.TOP_TOKEN_MAX  # all-distinct doc must pass


def test_pii_scrub_removes_all_planted_matches(spark, sf_dir):
    """After scrubbing, neither regex matches anywhere, every doc has
    >= 1 planted email and long number, and placeholders are present."""
    from mapreducecf_spark.queries.pipeline import (
        _EMAIL_RE,
        _LONGNUM_RE,
        pipe_pii_scrub,
    )
    from mapreducecf_spark.sources import load_table

    out = pipe_pii_scrub(spark, sf_dir)
    bad = out.filter((F.col("n_emails") < 1) | (F.col("n_longnums") < 1)).count()
    assert bad == 0
    # re-derive the scrubbed text the query hashes and check it's clean
    d = load_table(spark, sf_dir, "documents")
    ptext = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com id "),
        (F.col("doc_id") + 1000000).cast("string"),
    )
    stext = F.regexp_replace(
        F.regexp_replace(ptext, _EMAIL_RE, "<EMAIL>"), _LONGNUM_RE, "<NUM>"
    )
    leftover = d.select(stext.alias("s")).filter(
        (F.regexp_count("s", F.lit(_EMAIL_RE)) > 0)
        | (F.regexp_count("s", F.lit(_LONGNUM_RE)) > 0)
        | ~F.col("s").contains("<EMAIL>")
        | ~F.col("s").contains("<NUM>")
    )
    assert leftover.count() == 0


def test_sample_per_group_sizes_and_determinism(spark, sf_dir):
    from mapreducecf_spark.queries.pipeline import SAMPLE_K, pipe_sample_per_group
    from mapreducecf_spark.sources import load_table

    out1 = pipe_sample_per_group(spark, sf_dir).collect()
    out2 = pipe_sample_per_group(spark, sf_dir).collect()
    assert sorted(out1) == sorted(out2)  # deterministic under re-run
    sizes = {
        r["source"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got: dict[str, int] = {}
    for r in out1:
        got[r["source"]] = got.get(r["source"], 0) + 1
        assert 1 <= r["rn"] <= SAMPLE_K
    for src, n in sizes.items():
        assert got.get(src, 0) == min(SAMPLE_K, n)


def test_sample_stratified_rates_and_counts(spark, sf_dir):
    """n_sampled is between 0 and n_total, the rate is 25 or 75 by
    source parity, and totals reconcile with the documents table."""
    from mapreducecf_spark.queries.pipeline import pipe_sample_stratified
    from mapreducecf_spark.sources import load_table

    rows = pipe_sample_stratified(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_total"] for r in rows) == n_docs
    for r in rows:
        num = int(r["source"][3:])
        assert r["rate_pct"] == 25 + 50 * (num % 2)
        assert 0 <= r["n_sampled"] <= r["n_total"]


def test_shuffle_shards_is_a_permutation(spark, sf_dir):
    """Every doc lands in exactly one shard; positions are contiguous
    1..n within each shard (valid in-file offsets for a sharded sink)."""
    from mapreducecf_spark.registry import QUERIES

    rows = QUERIES["pipe_shuffle_shards"](spark, sf_dir).collect()
    n_docs = len({r["doc_id"] for r in rows})
    assert n_docs == len(rows)  # one row per doc
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
