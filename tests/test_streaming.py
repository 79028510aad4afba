"""Streaming smoke tests: each streaming pipeline, run to completion on
the finite events source (availableNow trigger, append mode), must emit
only finalized windows whose values EXACTLY match the registered batch
twin — same builder, so any divergence is watermark/state semantics."""

from __future__ import annotations

import pytest


def _run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize(
    ("builder", "batch_query"),
    [
        ("streaming_tumbling_hourly", "ts_tumbling_hourly"),
        ("streaming_sliding", "ts_sliding_1h_30m"),
        ("streaming_session_per_user", "ts_session_window"),
    ],
)
def test_streaming_emits_finalized_subset_of_batch(spark, sf_dir, builder, batch_query):
    import mapreducecf_spark.streaming as st
    from mapreducecf_spark.registry import QUERIES

    stream = st.stream_events(spark, sf_dir)
    assert stream.isStreaming
    out = _run_stream(spark, getattr(st, builder)(stream), f"mem_{builder}")

    got = _rows(out)
    expected = _rows(QUERIES[batch_query](spark, sf_dir))

    # append mode emits only windows the watermark has closed: a strict
    # subset is possible (trailing windows stay open), wrong values are not
    assert got, f"{builder} emitted nothing"
    assert got <= expected, f"{builder} emitted rows absent from the batch twin"
    # the bulk of the (finite) input must have been finalized
    assert len(got) >= len(expected) * 0.9


def test_stream_to_lake_writes_partitioned_parquet(spark, sf_dir, tmp_path):
    """foreachBatch egress: the full stream lands as day-partitioned
    parquet, re-readable with partition discovery, row-complete."""
    import glob

    import mapreducecf_spark.streaming as st
    from mapreducecf_spark.sources import load_table

    out = str(tmp_path / "lake")
    q = st.write_stream_to_lake(
        st.stream_events(spark, sf_dir), out, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    n_src = load_table(spark, sf_dir, "events").count()
    assert back.count() == n_src
    days = glob.glob(f"{out}/day=*")
    assert len(days) == back.select("day").distinct().count() > 0


def test_streaming_dedup_drops_replayed_events(spark, sf_dir, tmp_path):
    """An at-least-once source (every file delivered twice) must come
    out exactly-once downstream of streaming_dedup."""
    import mapreducecf_spark.streaming as st
    from mapreducecf_spark.sources import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    src = str(tmp_path / "replayed")
    events.coalesce(1).write.parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)  # the replay

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        st.streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("mem_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    out = spark.table("mem_dedup")
    assert out.count() == events.count()  # duplicates removed
    assert out.select("event_id").distinct().count() == events.count()


def test_stream_wordcount_equals_batch(spark, sf_dir):
    """The reference's flagship query must produce identical counts in
    batch and streaming execution (same shared builder)."""
    from mapreducecf_spark.queries.wordcount import wordcount
    from mapreducecf_spark.streaming.graded import stream_wordcount

    batch = {(r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()}
    stream = {
        (r["word"], r["cnt"]) for r in stream_wordcount(spark, sf_dir).collect()
    }
    assert stream == batch


def test_stream_anomaly_alerts_matches_batch_flags(spark, sf_dir):
    """The drained alert stream must equal the batch scorer's flagged
    set exactly (stateless stream-static join ⇒ replay == batch)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.timeseries import (
        MAD_Z,
        mad_rz,
        mad_stats,
    )
    from mapreducecf_spark.sources import load_table
    from mapreducecf_spark.streaming.graded import stream_anomaly_alerts

    streamed = {
        (r["event_id"], r["rz"])
        for r in stream_anomaly_alerts(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    batch = (
        e.join(F.broadcast(mad_stats(spark, sf_dir)), "event_type")
        .select("event_id", mad_rz().alias("rz"))
        .filter(F.abs(F.col("rz")) > MAD_Z)
    )
    expected = {(r["event_id"], r["rz"]) for r in batch.collect()}
    assert streamed == expected
    assert expected  # non-vacuous: the corpus must contain breaches


def test_stream_histogram_equals_batch(spark, sf_dir):
    from mapreducecf_spark.queries.timeseries import ts_value_histogram
    from mapreducecf_spark.streaming.graded import stream_value_histogram

    batch = {
        (r["event_type"], r["bin"]): (r["n_events"], r["bin_lo"], r["bin_hi"])
        for r in ts_value_histogram(spark, sf_dir).collect()
    }
    streamed = {
        (r["event_type"], r["bin"]): (r["n_events"], r["bin_lo"], r["bin_hi"])
        for r in stream_value_histogram(spark, sf_dir).collect()
    }
    assert batch == streamed
    assert batch


def test_left_outer_attribution_evicts_on_watermark(spark, tmp_path):
    """The state-eviction semantics of the LEFT OUTER stream-stream
    join, pinned across micro-batches via incremental availableNow
    replays over one checkpoint: (1) a matched pair emits in the data
    batch it completes in; (2) an unmatched view is HELD while the
    watermark could still admit a match; (3) it null-emits exactly
    once, in the run whose advanced watermark proves the match
    impossible; (4) further runs emit nothing again (no duplicate
    outer results)."""
    import glob as _glob
    import shutil
    from datetime import datetime, timedelta

    from mapreducecf_spark.queries.timeseries import attribution_join

    base = str(tmp_path)
    vdir, pdir = base + "/views", base + "/purch"
    ckpt, out = base + "/ckpt", base + "/out"
    t0 = datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + timedelta(minutes=minutes)

    schema_str = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )

    def put(d, name, rows):
        tmp = f"{base}/tmp_{name}"
        spark.createDataFrame(rows, schema_str).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        import os

        os.makedirs(d, exist_ok=True)
        shutil.copy(_glob.glob(tmp + "/part-*.parquet")[0], f"{d}/{name}.parquet")

    put(vdir, "a", [(1, ts(0), 7, "view", 1.0), (2, ts(40), 8, "view", 1.0)])
    put(pdir, "a", [(100, ts(5), 7, "purchase", 9.0)])  # matches view 1
    schema = spark.read.parquet(vdir).schema

    def run():
        v = spark.readStream.schema(schema).parquet(vdir).withWatermark("ts", "1 hour")
        p = spark.readStream.schema(schema).parquet(pdir).withWatermark("ts", "1 hour")
        j = attribution_join(v, p, "left")
        q = (
            j.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.view_id, r.purchase_id)
            for r in spark.read.schema(j.schema).parquet(out).collect()
        )

    # run 1: watermark = min(40, 5) - 60 < 0 — match emits, view 2 held
    assert run() == [(1, 100)]
    # run 2: later data on BOTH sides pushes the min-watermark to
    # 240min > view2_ts + 30min — view 2 must null-emit now
    put(vdir, "b", [(3, ts(300), 9, "view", 1.0)])
    put(pdir, "b", [(101, ts(300), 10, "purchase", 1.0)])
    assert run() == [(1, 100), (2, None)]
    # run 3: nothing new — no duplicate outer emissions, view 3 still
    # inside its horizon stays held
    assert run() == [(1, 100), (2, None)]


def test_full_outer_attribution_evicts_both_sides(spark, tmp_path):
    """BOTH-side state eviction of the FULL OUTER stream-stream join,
    pinned across micro-batches over one checkpoint (VERDICT r08
    item 7): (1) matched pairs emit in their data batch; (2) an
    unmatched view null-emits exactly once when the watermark passes
    view_ts + 30min; (3) an unmatched PURCHASE null-emits exactly once
    when the watermark passes purchase_ts (its view window
    (purchase_ts − 30min, purchase_ts) is then provably empty);
    (4) further runs add nothing."""
    import glob as _glob
    import shutil
    from datetime import datetime, timedelta

    from mapreducecf_spark.queries.timeseries import attribution_join

    base = str(tmp_path)
    vdir, pdir = base + "/views", base + "/purch"
    ckpt, out = base + "/ckpt", base + "/out"
    t0 = datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + timedelta(minutes=minutes)

    schema_str = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )

    def put(d, name, rows):
        tmp = f"{base}/tmp_{name}"
        spark.createDataFrame(rows, schema_str).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        import os

        os.makedirs(d, exist_ok=True)
        shutil.copy(_glob.glob(tmp + "/part-*.parquet")[0], f"{d}/{name}.parquet")

    put(vdir, "a", [(1, ts(0), 7, "view", 1.0), (2, ts(40), 8, "view", 1.0)])
    # purchase 100 matches view 1; purchase 101 (user 9, no view) is
    # the orphan conversion that must eventually right-null-emit
    put(pdir, "a", [(100, ts(5), 7, "purchase", 9.0),
                    (101, ts(50), 9, "purchase", 2.0)])
    schema = spark.read.parquet(vdir).schema

    def run():
        v = spark.readStream.schema(schema).parquet(vdir).withWatermark("ts", "1 hour")
        p = spark.readStream.schema(schema).parquet(pdir).withWatermark("ts", "1 hour")
        j = attribution_join(v, p, "full")
        q = (
            j.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.user_id, r.view_id, r.purchase_id)
            for r in spark.read.schema(j.schema).parquet(out).collect()
        )

    # run 1: w = min(40, 50) - 60 < 0 — only the match emits; view 2
    # and purchase 101 are both held
    assert run() == [(7, 1, 100)]
    # run 2: both sides advance to 300min → w = 240min, past
    # view2_ts+30 = 70 and purchase101_ts = 50 — both residuals emit,
    # each with the OTHER side's columns NULL and user_id coalesced
    put(vdir, "b", [(3, ts(300), 20, "view", 1.0)])
    put(pdir, "b", [(102, ts(300), 21, "purchase", 1.0)])
    assert run() == [(7, 1, 100), (8, 2, None), (9, None, 101)]
    # run 3: no new data — no duplicate outer emissions; the run-2
    # tail rows (view 3 / purchase 102) stay held inside the horizon
    assert run() == [(7, 1, 100), (8, 2, None), (9, None, 101)]


def test_left_outer_attribution_shared_source_watermark(spark, tmp_path):
    """ADVICE r08: both sides read the SAME directory (mixed event
    types) — the graded `stream_attribution_outer` shape. With the
    event_type filter applied BEFORE ``withWatermark``, each side's
    watermark tracks the max ts of its own filtered slice by
    construction, so the drained-replay outer residual cuts at
    w = least(max view ts, max purchase ts) − delay, independent of
    whether the optimizer pushes filters below the watermark node.

    Planted: max view ts = 400min, max purchase ts = 90min → w =
    90 − 60 = 30min. View 2 (ts 40min) has horizon end 70min > w, so
    it must stay HELD even though the global max ts (400) would have
    evicted it under a shared (unfiltered) watermark; view 1 matches
    and emits; the late views (300/400min) are held too."""
    import glob as _glob
    import shutil
    from datetime import datetime, timedelta

    from pyspark.sql import functions as SF

    from mapreducecf_spark.queries.timeseries import attribution_join

    base = str(tmp_path)
    edir, ckpt, out = base + "/events", base + "/ckpt", base + "/out"
    t0 = datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + timedelta(minutes=minutes)

    schema_str = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )
    rows = [
        (1, ts(0), 7, "view", 1.0),
        (100, ts(5), 7, "purchase", 9.0),  # matches view 1
        (2, ts(40), 8, "view", 1.0),  # unmatched; horizon end 70 > w=30
        (101, ts(90), 10, "purchase", 1.0),  # purchase-side max ts
        (3, ts(300), 9, "view", 1.0),
        (4, ts(400), 9, "view", 1.0),  # view-side max ts
    ]
    tmp = base + "/tmp"
    spark.createDataFrame(rows, schema_str).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    import os

    os.makedirs(edir, exist_ok=True)
    shutil.copy(_glob.glob(tmp + "/part-*.parquet")[0], edir + "/a.parquet")
    schema = spark.read.parquet(edir).schema

    ev = spark.readStream.schema(schema).parquet(edir)
    v = ev.filter(SF.col("event_type") == "view").withWatermark("ts", "1 hour")
    p = ev.filter(SF.col("event_type") == "purchase").withWatermark("ts", "1 hour")
    j = attribution_join(v, p, "left")
    q = (
        j.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.view_id, r.purchase_id)
        for r in spark.read.schema(j.schema).parquet(out).collect()
    )
    # ONLY the matched pair: every unmatched view's horizon end
    # (70/330/430) exceeds w = least(400, 90) − 60 = 30min, so all are
    # held — a global-max watermark (400 − 60 = 340) would wrongly
    # null-emit views 2 and 3 here.
    assert got == [(1, 100)]


def test_stream_drift_psi_flags_planted_shift(spark, tmp_path):
    """Planted drift: the feed's late half is shifted far outside the
    early half's decile grid, so the online PSI monitor must put every
    late event in the top bin and the total must clear the classic
    0.2 act threshold (2e5 micro) by a wide margin."""
    import datetime as dt

    from mapreducecf_spark.streaming.graded import stream_drift_psi

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=i), float(i % 50)) for i in range(200)
    ] + [
        (base + dt.timedelta(days=1, minutes=i), 1000.0 + i % 50)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    src = str(tmp_path / "drift")
    df.coalesce(1).write.parquet(f"{src}/events.parquet")
    out = stream_drift_psi(spark, src).collect()
    assert len(out) == 10
    assert sum(r["n_old"] for r in out) == 200
    assert sum(r["n_new"] for r in out) == 200
    by_bin = {r["bin"]: r for r in out}
    assert by_bin[9]["n_new"] == 200  # every late event beyond the old p90
    assert all(r["total_psi_micro"] > 200_000 for r in out)


def test_stream_card_deltas_equals_batch(spark, sf_dir):
    from mapreducecf_spark.queries.pipeline import pipe_card_deltas
    from mapreducecf_spark.streaming.graded import stream_card_deltas

    key = lambda r: (r["source"], r["day"])
    batch = {key(r): tuple(r)[2:] for r in pipe_card_deltas(spark, sf_dir).collect()}
    streamed = {
        key(r): tuple(r)[2:] for r in stream_card_deltas(spark, sf_dir).collect()
    }
    assert batch == streamed
    assert batch


def test_stream_minhash_neardup_flags_planted_twin(spark, tmp_path):
    """Planted near-dup at the ingestion edge: two verbatim twin docs
    must flag each other through the banded MinHash probe (identical
    shingle sets => identical signatures => same band keys, estimate
    12/12), while an unrelated doc must not be called a near-dup."""
    from mapreducecf_spark.streaming.graded import stream_minhash_neardup

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo"
    )
    other = (
        "zulu yankee xray whiskey victor uniform tango sierra "
        "quebec papa oscar november mike lima kilo juliet india hotel"
    )
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "doc_id bigint, text string"
    )
    src = str(tmp_path / "mh")
    df.coalesce(1).write.parquet(f"{src}/documents.parquet")
    out = {r["doc_id"]: r for r in stream_minhash_neardup(spark, src).collect()}
    assert out[1]["is_neardup"] and out[2]["is_neardup"]
    assert out[1]["n_near"] >= 1 and out[2]["n_near"] >= 1
    if 3 in out:  # a band collision may make it a CANDIDATE...
        assert not out[3]["is_neardup"]  # ...but never a verified near-dup


def test_stream_segment_dedup_matches_batch_keep_first(spark, tmp_path):
    """The streamed keep-first verdict over a planted corpus must equal
    the batch report: doc 1 coins the segment (retains everything),
    doc 2's verbatim copy is removed at the edge, and the within-doc
    repeat in doc 3 loses its second occurrence."""
    from mapreducecf_spark.queries.dedup import dedup_segment_exact
    from mapreducecf_spark.streaming.graded import stream_segment_dedup

    seg1 = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [
            (1, seg1 + " zeta eta theta iota kappa", "web"),
            (2, seg1 + " one two three four five", "web"),
            (3, "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5", "books"),
        ],
        "doc_id bigint, text string, source string",
    )
    src = str(tmp_path / "segdedup")
    df.coalesce(1).write.parquet(f"{src}/documents.parquet")

    streamed = {
        r["doc_id"]: (r["n_segs"], r["n_removed"], r["retained_ratio"])
        for r in stream_segment_dedup(spark, src).collect()
    }
    assert streamed == {1: (2, 0, 1.0), 2: (2, 1, 0.5), 3: (2, 1, 0.5)}

    batch = {
        r["doc_id"]: (r["n_segs"], r["n_removed"], r["retained_ratio"])
        for r in dedup_segment_exact(spark, src).collect()
    }
    assert streamed == batch


def test_stream_knn_insert_placement_edges_invariants(spark, sf_dir):
    """The insertion probe's contract: nodes are exactly (a subset of)
    the CDC arrival classes, neighbors come only from the untouched
    kept corpus, and per-arrival edges are contiguously ranked in
    (cos DESC, neighbor) order with at most K of them."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.pipeline import (
        _SNAP_CHANGED,
        _SNAP_NEW_DROP,
        _SNAP_OLD_DROP,
    )
    from mapreducecf_spark.queries.similarity import KNN_GRAPH_K
    from mapreducecf_spark.registry import QUERIES

    rows = QUERIES["stream_knn_insert"](spark, sf_dir).collect()
    assert rows
    by_v = {}
    for r in rows:
        assert r["vec_id"] % 10 != _SNAP_NEW_DROP
        assert r["vec_id"] % 10 == _SNAP_OLD_DROP or r["vec_id"] % 7 == _SNAP_CHANGED
        assert r["neighbor_id"] % 10 not in (_SNAP_OLD_DROP, _SNAP_NEW_DROP)
        assert r["neighbor_id"] % 7 != _SNAP_CHANGED
        by_v.setdefault(r["vec_id"], []).append((r["rnk"], r["cos_sim"], r["neighbor_id"]))
    for v, es in by_v.items():
        es.sort()
        assert [e[0] for e in es] == list(range(1, len(es) + 1))
        assert len(es) <= KNN_GRAPH_K
        ordered = sorted(es, key=lambda e: (-e[1], e[2]))
        assert ordered == es


def test_stream_als_foldin_equals_batch(spark, sf_dir):
    """The online fold-in must be byte-equal to the batch twin (that
    equality is what justifies the aliased oracle): same cohort, same
    capped baskets, same gradient, same top-K."""
    from mapreducecf_spark.queries.cf import cf_als_foldin
    from mapreducecf_spark.streaming.graded import stream_als_foldin

    batch = sorted(tuple(r) for r in cf_als_foldin(spark, sf_dir).collect())
    streamed = sorted(tuple(r) for r in stream_als_foldin(spark, sf_dir).collect())
    assert batch == streamed
    assert batch


def test_stream_winnowing_neardup_guarantee_and_no_false_candidates(spark, tmp_path):
    """Planted run-overlap at the ingestion edge: verbatim twins share
    their whole fingerprint set (is_neardup), a doc sharing exactly one
    WINNOW_GUARANTEE-token run with the corpus MUST surface (the
    winnowing guarantee — deterministic, unlike a banded probe), and a
    fully unrelated doc produces NO candidate row at all (winnowing has
    no hash-collision false candidates to verify away)."""
    from mapreducecf_spark.streaming.graded import stream_winnowing_neardup

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo"
    )
    run = "alpha bravo charlie delta echo foxtrot"  # the first 6 tokens
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # verbatim twin of 1
            (3, "unrelated lead tokens then " + run + " and a different tail here"),
            (4, "zulu yankee xray whiskey victor uniform tango sierra kilo2"),
        ],
        "doc_id bigint, text string",
    )
    src = str(tmp_path / "winnow")
    df.coalesce(1).write.parquet(f"{src}/documents.parquet")
    out = {r["doc_id"]: r for r in stream_winnowing_neardup(spark, src).collect()}
    assert out[1]["is_neardup"] and out[2]["is_neardup"]
    assert out[1]["n_shared"] >= 2 and out[2]["n_cand"] >= 1
    assert 3 in out and out[3]["n_shared"] >= 1, "guarantee: the 6-token run must hit"
    assert 4 not in out, "winnowing emits no false candidates"


def test_stream_hybrid_rrf_fuses_both_channels_at_the_edge(spark, tmp_path):
    """Planted two-channel arrival: the verbatim text twin MUST surface
    through the lexical channel and the identical-vector twin MUST
    surface through the dense channel (identical vectors share every
    band key, cosine 1.0 — the banded candidate generation is
    deterministic there), both fused into the arrival's top list."""
    from mapreducecf_spark.streaming.graded import stream_hybrid_rrf

    run = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = []
    for i in range(8):
        docs.append((i, run if i in (0, 5) else f"distinct words w{i}a w{i}b w{i}c w{i}d"))

    def v(i):  # 64-dim: doc 7 duplicates doc 0's vector
        out = [0.0] * 64
        out[0 if i == 7 else i] = 1.0
        return out

    emb = [(i, v(i), 0) for i in range(8)]
    src = str(tmp_path / "hybrid")
    spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(1).write.parquet(
        f"{src}/documents.parquet"
    )
    spark.createDataFrame(
        emb, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{src}/embeddings.parquet")

    out = {
        (r["q_id"], r["cand_id"]): (r["rrf_micro"], r["rnk"])
        for r in stream_hybrid_rrf(spark, src).collect()
    }
    cands0 = {c for (q, c) in out if q == 0}
    assert 5 in cands0, "verbatim text twin must surface (lexical channel)"
    assert 7 in cands0, "identical-vector twin must surface (dense channel)"
    assert all(v[0] > 0 and v[1] <= 5 for v in out.values())


def test_stream_bloom_dedup_flags_cross_shard_copies_only(spark, tmp_path):
    """Planted cross-shard copy at the ingestion edge: a doc whose text
    verbatim-exists in ANOTHER shard must be flagged (Bloom filters
    have no false negatives — every shared shingle's three bits are set
    in the other shard's filter), its within-shard-only sibling and a
    disjoint-vocabulary doc must emit nothing (no cross-shard content,
    and at this fill level no planted hash collision fires), and the
    pair/shingle counts must agree with the planted overlap."""
    from mapreducecf_spark.streaming.graded import stream_bloom_dedup

    copied = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar"
    )
    docs = [
        (1, copied, "sa"),
        (2, "papa quebec romeo sierra tango uniform victor whiskey", "sa"),
        (3, copied, "sb"),  # the cross-shard copy
        (4, "zulu yankee xray wombat vulture umbrella torch sparrow", "sc"),
    ]
    src = str(tmp_path / "bloom")
    spark.createDataFrame(
        docs, "doc_id bigint, text string, source string"
    ).coalesce(1).write.parquet(f"{src}/documents.parquet")

    out = {r["doc_id"]: r for r in stream_bloom_dedup(spark, src).collect()}
    n_sh = len(copied.split()) - 2  # distinct 3-token shingles of the copy
    assert set(out) == {1, 3}, f"only the cross-shard copies flag: {sorted(out)}"
    for d in (1, 3):
        assert out[d]["n_shards_hit"] == 1
        assert out[d]["n_hit_shingles"] == n_sh, "every shared shingle must hit"
        assert out[d]["n_hit_pairs"] == n_sh  # one foreign shard each


def test_stream_seasonal_decompose_equals_batch_twin(spark, sf_dir):
    """The drained online decomposition must be byte-equal to the
    batch twin (that equality is what justifies the aliased oracle):
    same spine, same trend window, same integer effects."""
    from mapreducecf_spark.queries.timeseries import ts_seasonal_decompose
    from mapreducecf_spark.streaming.graded import stream_seasonal_decompose

    batch = sorted(tuple(r) for r in ts_seasonal_decompose(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_seasonal_decompose(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch


def test_stream_token_apportion_equals_batch_twin(spark, sf_dir):
    """The drained online allocation must be byte-equal to the batch
    twin (that equality is what justifies the aliased oracle), and
    Σ alloc == the budget (the Hamilton identity survives the replay)."""
    from mapreducecf_spark.queries.pipeline import TOKEN_BUDGET, pipe_token_apportion
    from mapreducecf_spark.streaming.graded import stream_token_apportion

    batch = sorted(tuple(r) for r in pipe_token_apportion(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_token_apportion(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch
    assert sum(r[-1] for r in streamed) == TOKEN_BUDGET


def test_stream_audience_kmv_equals_batch_twin(spark, sf_dir):
    """The drained online bottom-k sketches must produce a
    byte-equal pair report to the batch twin (the equality that
    justifies the aliased oracle) — and the state really is bounded:
    every type's drained sketch holds at most KMV_K hashes."""
    from mapreducecf_spark.queries.timeseries import KMV_K, ts_audience_kmv
    from mapreducecf_spark.streaming.graded import stream_audience_kmv

    batch = sorted(tuple(r) for r in ts_audience_kmv(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_audience_kmv(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch
    for r in streamed:
        assert r[2] <= KMV_K  # k_used never exceeds the sketch size


def test_stream_mannwhitney_equals_batch_twin(spark, sf_dir):
    """The drained complete-mode value grid must yield a byte-equal
    rank-sum verdict to the batch test (shared _mwu_of_grid — the
    equality that justifies the aliased oracle)."""
    from mapreducecf_spark.queries.timeseries import ts_mannwhitney_u
    from mapreducecf_spark.streaming.graded import stream_mannwhitney_u

    batch = sorted(tuple(r) for r in ts_mannwhitney_u(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_mannwhitney_u(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch


def test_stream_chi2_equals_batch_twin(spark, sf_dir):
    """The drained complete-mode contingency cells must yield a
    byte-equal chi² verdict to the batch test (shared _chi2_of_cells
    — the equality that justifies the aliased oracle)."""
    from mapreducecf_spark.queries.timeseries import ts_chi2_independence
    from mapreducecf_spark.streaming.graded import stream_chi2_independence

    batch = sorted(tuple(r) for r in ts_chi2_independence(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_chi2_independence(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch


def test_stream_wilcoxon_equals_batch_twin(spark, sf_dir):
    """The drained complete-mode per-user signed differences must
    yield a byte-equal Wilcoxon verdict to the batch test (shared
    _wsr_of_pairs — the equality that justifies the aliased
    oracle)."""
    from mapreducecf_spark.queries.timeseries import ts_wilcoxon_signed_rank
    from mapreducecf_spark.streaming.graded import stream_wilcoxon_signed_rank

    batch = sorted(
        tuple(r) for r in ts_wilcoxon_signed_rank(spark, sf_dir).collect()
    )
    streamed = sorted(
        tuple(r) for r in stream_wilcoxon_signed_rank(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch


def test_stream_kruskal_wallis_equals_batch_twin(spark, sf_dir):
    """The drained complete-mode (type, cent) grid must yield a
    byte-equal Kruskal-Wallis verdict to the batch test (shared
    _kw_of_grid — the equality that justifies the aliased oracle)."""
    from mapreducecf_spark.queries.timeseries import ts_kruskal_wallis
    from mapreducecf_spark.streaming.graded import stream_kruskal_wallis

    batch = sorted(tuple(r) for r in ts_kruskal_wallis(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_kruskal_wallis(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch


def test_stream_brown_forsythe_equals_batch_twin(spark, sf_dir):
    """The drained complete-mode (type, cent) grid must yield a
    byte-equal Brown-Forsythe verdict to the batch test (shared
    _bf_of_grid — the equality that justifies the aliased oracle)."""
    from mapreducecf_spark.queries.timeseries import ts_brown_forsythe
    from mapreducecf_spark.streaming.graded import stream_brown_forsythe

    batch = sorted(tuple(r) for r in ts_brown_forsythe(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_brown_forsythe(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch


def test_stream_hll_actives_equals_batch_twin(spark, sf_dir):
    """The drained complete-mode per-(type, day) HLL sketches must
    yield a byte-equal union report to the batch build (shared
    _hll_union_report; DataSketches HLL builds are deterministic for
    a given input multiset — the equality that justifies the aliased
    oracle)."""
    from mapreducecf_spark.queries.timeseries import ts_actives_hll_union
    from mapreducecf_spark.streaming.graded import stream_hll_actives

    batch = sorted(tuple(r) for r in ts_actives_hll_union(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_hll_actives(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch


def test_stream_kll_quantiles_equals_batch_twin(spark, sf_dir):
    """The drained complete-mode per-(type, day) KLL sketches must
    yield the SAME report as the lake round-trip consumer (shared
    _kll_quantile_report): KLL compaction is randomized, but every
    output column is deterministic whenever approx_ok holds —
    n_values is the sketch's exact counter, p50/p90 are exact twins —
    the equality that justifies the aliased oracle."""
    from mapreducecf_spark.queries.storage import sink_kll_roundtrip
    from mapreducecf_spark.streaming.graded import stream_kll_quantiles

    batch = sorted(tuple(r) for r in sink_kll_roundtrip(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_kll_quantiles(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch
    assert all(r[-1] for r in streamed), "approx_ok must hold"


def test_stream_resampling_monitors_equal_batch_twins(spark, sf_dir):
    """The drained complete-mode daily counters must yield byte-equal
    permutation/bootstrap reports to the batch queries (shared
    _perm_shift_of_daily / _perm_weekday_of_daily /
    _bootstrap_of_daily — the equality that justifies the aliased
    oracles)."""
    from mapreducecf_spark.queries.timeseries import (
        ts_bootstrap_mean_ci,
        ts_bootstrap_median_ci,
        ts_permutation_mean_shift,
        ts_permutation_weekday_effect,
    )
    from mapreducecf_spark.streaming.graded import (
        stream_bootstrap_mean_ci,
        stream_bootstrap_median_ci,
        stream_permutation_mean_shift,
        stream_permutation_weekday_effect,
    )

    for batch_fn, stream_fn in (
        (ts_permutation_mean_shift, stream_permutation_mean_shift),
        (ts_permutation_weekday_effect, stream_permutation_weekday_effect),
        (ts_bootstrap_mean_ci, stream_bootstrap_mean_ci),
        (ts_bootstrap_median_ci, stream_bootstrap_median_ci),
    ):
        batch = sorted(tuple(r) for r in batch_fn(spark, sf_dir).collect())
        streamed = sorted(tuple(r) for r in stream_fn(spark, sf_dir).collect())
        assert batch == streamed, batch_fn.__name__
        assert batch


def test_stream_spearman_corr_equals_batch_twin(spark, sf_dir):
    """The drained complete-mode per-day (count, cents-sum) state must
    yield a byte-equal Spearman report to the batch test (shared
    _spearman_of_daily — the equality that justifies the aliased
    oracle)."""
    from mapreducecf_spark.queries.timeseries import ts_spearman_corr
    from mapreducecf_spark.streaming.graded import stream_spearman_corr

    batch = sorted(tuple(r) for r in ts_spearman_corr(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_spearman_corr(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch


def test_stream_theil_sen_slope_equals_batch_twin(spark, sf_dir):
    """The shared complete-mode daily-counter state must yield a
    byte-equal Theil-Sen report to the batch query (shared
    _theilsen_of_daily — the equality that justifies the aliased
    oracle)."""
    from mapreducecf_spark.queries.timeseries import ts_theil_sen_slope
    from mapreducecf_spark.streaming.graded import stream_theil_sen_slope

    batch = sorted(tuple(r) for r in ts_theil_sen_slope(spark, sf_dir).collect())
    streamed = sorted(
        tuple(r) for r in stream_theil_sen_slope(spark, sf_dir).collect()
    )
    assert batch == streamed
    assert batch
