"""Physical-plan assertions — the scale claims in query docstrings,
verified instead of asserted in prose (VERDICT r1 "What's missing" #4).

These tests read `explain()` output, the same artifact an engineer
would check before shipping a query to a 1000-executor cluster:

- filters/projections reach the parquet scan (PushedFilters/ReadSchema);
- explicit broadcasts survive a disabled auto-threshold (i.e. they are
  hint-driven, only on fixed-size dims), and with the auto threshold
  off — the 100 TB situation, where no fact-scale table fits — every
  remaining join is a shuffle join, proving no unconditional broadcast
  of a table that scales with SF;
- top-k queries plan TakeOrderedAndProject, never a global Sort;
- aggregates are partial (map-side combine) before the exchange;
- no query plans a CartesianProduct.
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = None  # filled by fixtures


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture()
def no_auto_broadcast(spark):
    """Simulate fact scale: disable size-based auto-broadcast so the
    only broadcasts left are explicit hints."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q6_filters_and_projection_reach_the_scan(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["q6_revenue_forecast"](spark, sf_dir))
    # predicate pushdown into the parquet reader
    assert "PushedFilters" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    # column pruning: the scan reads only the referenced columns plus
    # (r18) the adaptive input spread's repartition key — on the
    # single-row-group test layout _t hash-spreads the fact scan by
    # l_orderkey (guide §2.5), so that one key column is legitimately
    # read; on a layout that already splits the spread is a no-op and
    # the scan is back to the 4 query columns. Payload columns must
    # stay pruned either way.
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read
    for col in ("l_comment", "l_partkey", "l_suppkey", "l_tax"):
        assert col not in read, f"unpruned column {col}: {read}"


def test_only_fixed_size_dims_broadcast_at_scale(spark, sf_dir, no_auto_broadcast):
    from mapreducecf_spark.registry import QUERIES

    # q5: hints only on nation (25 rows) + region (5 rows) -> exactly 2
    # broadcast joins survive; every other join degrades to shuffle.
    p5 = plan_str(QUERIES["q5_local_supplier_volume"](spark, sf_dir), mode="simple")
    assert p5.count("BroadcastHashJoin") == 2, p5
    assert "SortMergeJoin" in p5 or "ShuffledHashJoin" in p5

    # q3: no hints at all -> zero broadcasts once the threshold is off
    # (at real SF these sides are fact-scale; an unconditional hint
    # here is the OOM pattern this test guards against).
    p3 = plan_str(QUERIES["q3_shipping_priority"](spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" not in p3, p3

    # join_broadcast_part: part scales with SF -> no hint either
    pp = plan_str(QUERIES["join_broadcast_part"](spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" not in pp, pp

    # rollup: nation/region hints survive
    pr = plan_str(QUERIES["agg_rollup"](spark, sf_dir), mode="simple")
    assert pr.count("BroadcastHashJoin") == 2, pr


def test_dims_do_broadcast_at_test_scale(spark, sf_dir):
    """With the 64 MiB threshold active (session default), the small
    sides broadcast — the fast plan at any SF where they fit."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    for name in ("sort_topk_global", "q3_shipping_priority"):
        p = plan_str(QUERIES[name](spark, sf_dir))
        assert "TakeOrderedAndProject" in p, f"{name}: {p}"


def test_aggregates_have_map_side_partial(spark, sf_dir):
    """The reference shuffles every token occurrence (client.py:47-48,
    no combiner); our plans must show partial->final HashAggregate."""
    from mapreducecf_spark.registry import QUERIES

    for name in ("q1_pricing_summary", "wordcount"):
        p = plan_str(QUERIES[name](spark, sf_dir), mode="simple")
        assert p.count("HashAggregate") >= 2, f"{name}: {p}"
        assert "partial" in p, f"{name}: {p}"


def test_no_cartesian_product_anywhere(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    for name, fn in QUERIES.items():
        p = plan_str(fn(spark, sf_dir), mode="simple")
        assert "CartesianProduct" not in p, f"{name} plans a cartesian product"


def test_interval_ops_avoid_theta_joins(spark, sf_dir):
    """The as-of and range joins must never plan the naïve
    BroadcastNestedLoop/theta shape — bucketing/windowing keeps them
    hash-partitioned (this is their entire reason to exist)."""
    from mapreducecf_spark.registry import QUERIES

    for name in ("ts_asof_join", "ts_asof_join_nearest", "ts_range_join", "ts_attribution_join", "ts_interval_align"):
        p = plan_str(QUERIES[name](spark, sf_dir), mode="simple")
        assert "BroadcastNestedLoopJoin" not in p, f"{name}: {p}"
        assert "CartesianProduct" not in p, f"{name}: {p}"


def test_whole_stage_codegen_covers_the_hot_path(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["q1_pricing_summary"](spark, sf_dir), mode="codegen")
    # codegen explain reports "Found N WholeStageCodegen subtrees" and
    # dumps each span; the scan->filter->partial-agg pipeline must fuse.
    assert "WholeStageCodegen" in p, p[:2000]


def test_new_tpch_shapes_plan_sanely(spark, sf_dir, no_auto_broadcast):
    """The round-3 TPC-H shapes: nation/region lookups must broadcast
    even with the auto-threshold off (they are explicitly hinted,
    fixed-cardinality dims), fact joins must not; q13's join-side
    predicate must not defeat the LEFT join."""
    from mapreducecf_spark.registry import QUERIES

    for name in ("q7_nation_trade", "q8_market_share", "q9_product_profit"):
        p = plan_str(QUERIES[name](spark, sf_dir), mode="simple")
        assert "BroadcastHashJoin" in p, f"{name}: nation/region dims must broadcast"
        assert "CartesianProduct" not in p, name
    p13 = plan_str(QUERIES["q13_customer_distribution"](spark, sf_dir), mode="simple")
    assert "LeftOuter" in p13
    p21 = plan_str(QUERIES["q21_sole_late_supplier"](spark, sf_dir), mode="simple")
    # the decorrelated EXISTS pair = two hash aggregates, no nested probe
    assert "BroadcastNestedLoopJoin" not in p21


def test_cohort_retention_scans_events_once(spark, sf_dir):
    """The window-min cohort form reads the raw table once; the
    agg-then-join-back form it replaced read it twice. Cache cleared
    first: scan-counting is only meaningful against a pristine cache
    (another query's lingering persist() gets substituted into any
    matching subtree and changes the printed sources)."""
    from mapreducecf_spark.registry import QUERIES

    spark.catalog.clearCache()
    p = plan_str(QUERIES["ts_cohort_retention"](spark, sf_dir), mode="simple")
    assert p.count("FileScan parquet") == 1


def test_tfidf_tokenizes_once(spark, sf_dir):
    """Document frequencies and doc lengths both derive from the
    memoized (doc, tok) counts — the corpus is exploded exactly once
    per SESSION (token_counts memo, shared with BM25), not once per
    consumer."""
    from mapreducecf_spark import memo
    from mapreducecf_spark.registry import QUERIES

    spark.catalog.clearCache()
    memo.evict(("token_counts",))
    p = plan_str(QUERIES["text_tfidf_top_terms"](spark, sf_dir), mode="simple")
    # both consumers (doc-length window, document-frequency agg) read
    # the cached (doc, tok) counts; the Generate nodes the plan still
    # prints live INSIDE the InMemoryRelation definitions
    assert p.count("InMemoryTableScan") == 2
    assert "WindowGroupLimit" in p  # per-partition partial top-k


def test_bm25_partitioned_rank_and_broadcast_postings(spark, sf_dir):
    """BM25's per-term top-k must be a partitioned partial rank
    (WindowGroupLimit — never a global sort of the scored postings),
    and the bounded query-term workload must reach the posting join as
    a broadcast so only those terms' postings leave the scan."""
    from mapreducecf_spark.registry import QUERIES

    spark.catalog.clearCache()
    p = plan_str(QUERIES["text_bm25_topk"](spark, sf_dir), mode="simple")
    assert "WindowGroupLimit" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_multi_rollup_scans_events_once(spark, sf_dir):
    """Day and month grains re-aggregate the persisted hourly partials
    instead of rescanning raw events (hierarchical rollup)."""
    from mapreducecf_spark.registry import QUERIES

    spark.catalog.clearCache()
    p = plan_str(QUERIES["ts_multi_rollup"](spark, sf_dir), mode="simple")
    # hour output + day input read the hourly cache; day output + month
    # input read the daily cache — every FileScan the plan still prints
    # lives inside an InMemoryRelation definition
    assert p.count("InMemoryTableScan") >= 3


def test_oov_vocab_probe_is_broadcast_even_at_fact_scale(
    spark, sf_dir, no_auto_broadcast
):
    """The per-occurrence vocabulary probe must be the HINTED broadcast
    (the vocab is VOCAB_SIZE rows by construction) — with the auto
    threshold off, the hint is the only thing keeping the corpus-sized
    side from shuffling for the lookup."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["pipe_oov_rate"](spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in p, p


def test_bpe_merge_topk_never_global_sorts(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["text_bpe_merge_step"](spark, sf_dir), mode="simple")
    assert "TakeOrderedAndProject" in p, p


def test_peak_concurrency_windows_are_day_partitioned(spark, sf_dir):
    """The corpus-sized window must be partitioned by day; the only
    unpartitioned window allowed is the day-offset table (one row per
    calendar day)."""
    from mapreducecf_spark.registry import QUERIES

    import re

    p = plan_str(QUERIES["ts_peak_concurrency"](spark, sf_dir), mode="formatted")
    # the boundary-level running sum is a day-PARTITIONED window spec:
    # windowspecdefinition(day#N, t#M ASC ...) — partition column first
    assert re.search(r"windowspecdefinition\(day#\d+, t#\d+ ASC", p), p
    # exactly one unpartitioned spec (first argument is already a sort
    # spec), and it runs over the per-day offset table, ordered by day
    unpart = re.findall(r"windowspecdefinition\((\w+#\d+ ASC)", p)
    assert len(unpart) == 1 and unpart[0].startswith("day#"), unpart


def test_dau_wau_mau_uses_explode_not_theta_join(spark, sf_dir):
    """The rolling-window membership must come from exploding each
    (user, day) into the windows it feeds — never from a day×events
    interval (theta) join, which at 100 TB nests a scan per day."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["ts_dau_wau_mau"](spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "explode" in p.lower(), p


def test_label_propagation_reuses_memoized_edges(spark, sf_dir):
    """sim_label_propagation must consume the session-memoized kNN
    edge list (InMemoryTableScan), not re-run the Arrow bucket-scoring
    stage (FlatMapGroupsInPandas) — edges are built once per run."""
    from mapreducecf_spark.queries.similarity import (
        sim_knn_graph,
        sim_label_propagation,
    )

    g = sim_knn_graph(spark, sf_dir)  # first of the family pays the build
    p = plan_str(sim_label_propagation(spark, sf_dir), mode="simple")
    # the edge rounds read the persisted memo (explain still PRINTS the
    # cached relation's build plan under InMemoryTableScan, so the
    # Arrow stage's name appears — the scan node is what proves reuse)
    assert "InMemoryTableScan" in p, p
    # and it IS the same memoized object every family member sees
    assert sim_knn_graph(spark, sf_dir) is g


def test_bucketed_join_plans_zero_exchange(spark, sf_dir, no_auto_broadcast):
    """The whole point of write_bucketed_table: both sides arrive
    hash-clustered on the join key, so the sort-merge join needs NO
    Exchange — the only shuffle in the graded query is the final
    segment rollup."""
    from mapreducecf_spark.queries.storage import bucketed_pair
    from mapreducecf_spark.registry import QUERIES

    c, o = bucketed_pair(spark, sf_dir)
    pj = plan_str(c.join(o, "c_custkey"), mode="simple")
    assert "SortMergeJoin" in pj, pj
    assert "Exchange" not in pj, pj

    pq = plan_str(QUERIES["join_bucketed_colocated"](spark, sf_dir), mode="simple")
    assert pq.count("Exchange") == 1, pq  # the groupBy only


def test_partitioned_roundtrip_prunes_to_the_week(spark, sf_dir):
    """The day predicate must prune at the PARTITION level: the scan
    lists only the 7 requested day directories out of 30."""
    import re

    from mapreducecf_spark.queries.storage import partitioned_events
    from mapreducecf_spark.registry import QUERIES
    from pyspark.sql import functions as F

    df = QUERIES["sink_partitioned_roundtrip"](spark, sf_dir)
    p = plan_str(df, mode="formatted")
    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert pf and "day" in pf[0], p

    # EXECUTE the pruned scan and record which files were actually
    # read (inputFiles() lists the whole FileIndex pre-pruning, so the
    # probe must be execution-level: input_file_name per row)
    path = partitioned_events(spark, sf_dir)
    read = spark.read.parquet(path).filter(
        F.col("day").between("2024-01-08", "2024-01-14")
    )
    files = {r[0] for r in read.select(F.input_file_name()).distinct().collect()}
    days = {re.search(r"day=([0-9-]+)", f).group(1) for f in files}
    assert days == {f"2024-01-{d:02d}" for d in range(8, 15)}, sorted(days)


def test_cf_cooccurrence_is_an_equi_join(spark, sf_dir, no_auto_broadcast):
    """The basket self-join must be a hash/sort-merge EQUI-join on the
    user key (the flatMap/reduceByKey shape) — never a nested-loop over
    baskets — and the neighbor-list cut must be a windowed top-k, not a
    global sort."""
    from mapreducecf_spark import memo
    from mapreducecf_spark.registry import QUERIES

    # the CF chain is session-memoized; if another test already built
    # it WITHOUT this fixture, the cached plan could legitimately
    # contain BroadcastHashJoin — evict so the build happens under the
    # no-broadcast config this test is asserting about (order-robust)
    for key in ("cf_inter", "cf_sim", "cf_model"):
        memo.evict((key,))
    p = plan_str(QUERIES["cf_item_similarity"](spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, p
    assert "WindowGroupLimit" in p or "RunningWindowFunction" in p or "Window" in p, p


def test_cf_recommend_serves_from_broadcast_model(spark, sf_dir):
    """The serving probe (batch ⋈ pruned neighbor lists) must read the
    memoized model as a cached relation and join it by BROADCAST once
    the model is materialized — it is n_items × K narrow rows BY
    CONSTRUCTION (the pruning is what makes it a serving artifact), so
    shipping it to the probe side is the plan you want whenever it
    fits, and the probe volume stays driven by the query batch, never
    the corpus. Materializing first matters: the UN-materialized cache
    carries its build plan's (fact-join-sized) size estimate, so the
    static plan conservatively sort-merges and only AQE would flip it;
    after one action the cache reports its true few-MB size and the
    broadcast is chosen statically — exactly the serving deployment,
    where the model table exists before queries arrive."""
    from mapreducecf_spark.queries.cf import neighbor_lists
    from mapreducecf_spark.registry import QUERIES

    neighbor_lists(spark, sf_dir).write.format("noop").mode("overwrite").save()
    p = plan_str(QUERIES["cf_recommend_topk"](spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in p, p
    assert "InMemoryTableScan" in p, p  # model + interactions are memoized
    assert "CartesianProduct" not in p, p


def test_triangle_count_is_oriented_equi_join(spark, sf_dir):
    """Triangle counting must close wedges with an EQUI-join on the
    oriented (lo, hi) edge key — the oriented form counts each triangle
    exactly once and keeps the join a hash shuffle; the naive
    undirected form needs a theta join and 6× the volume. The only
    nested-loop allowed is the final one-row×one-row scalar combine
    (n_triangles with n_wedges)."""
    from mapreducecf_spark.queries.similarity import sim_knn_graph
    from mapreducecf_spark.registry import QUERIES

    sim_knn_graph(spark, sf_dir)  # family builder (memoized edges)
    p = plan_str(QUERIES["sim_triangle_count"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in p, p
    assert p.count("BroadcastNestedLoopJoin") <= 1, p  # scalar combine only
    n_equi = sum(p.count(j) for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_equi >= 2, p  # wedge-close + wedge-build are equi-joins


def test_semantic_dedup_pairs_join_on_cluster_id(spark, sf_dir):
    """SemDeDup's pairwise stage must be a cid-EQUI-join (hash shuffle
    on cluster id) with the participation cap applied BEFORE the join
    — never an all-pairs/nested-loop over vectors, and never an
    uncapped self-join."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["dedup_semantic_ivf"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    n_equi = sum(p.count(j) for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_equi >= 1, p
    # the cap's windowed rank must appear under the join, not above it
    assert "WindowGroupLimit" in p or "Window" in p, p


def test_bfs_rounds_are_equi_joins(spark, sf_dir):
    """Every BFS round must expand the frontier with an EQUI-join on
    the edge key and subtract visited ids with an anti-join — never a
    nested loop; the per-round localCheckpoint keeps the printed plan
    shallow (LogicalRDD scans, not {rounds}-deep join towers)."""
    from mapreducecf_spark.queries.similarity import sim_knn_graph
    from mapreducecf_spark.registry import QUERIES

    sim_knn_graph(spark, sf_dir)  # family builder (memoized edges)
    p = plan_str(QUERIES["sim_bfs_hops"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    # checkpointed result: the returned plan is a scan of materialized
    # rounds, not a re-derivation of the whole traversal
    assert "Scan ExistingRDD" in p or "LogicalRDD" in p, p


def test_priority_sample_is_windowed_topk(spark, sf_dir):
    """The weighted sample's per-group cut must plan WindowGroupLimit
    (partial top-k before the group shuffle) with the hash math fully
    inside the scan projection — no join, no extra shuffle."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["pipe_sample_priority"](spark, sf_dir), mode="simple")
    assert "WindowGroupLimit" in p, p
    assert "Join" not in p, p
    assert p.count("Exchange") == 1, p  # the lang partition only


def test_jsonl_roundtrip_scan_is_pruned(spark, sf_dir):
    """Schema-on-read must still prune: the JSONL scan feeding the
    rollup reads only the 4 referenced columns (lang, source, n_chars,
    text) — doc_id never leaves the file reader. At 100 TB a JSON scan
    that parses every field for a 4-column rollup is the difference
    between I/O-bound and CPU-bound."""
    from mapreducecf_spark.registry import QUERIES

    df = QUERIES["sink_jsonl_roundtrip"](spark, sf_dir)
    p = plan_str(df, mode="formatted")
    reads = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert reads, p
    for col in ("lang", "source", "n_chars", "text"):
        assert col in reads[0], reads[0]
    assert "doc_id" not in reads[0], reads[0]


def test_pq_encode_is_a_narrow_scan_projection(spark, sf_dir):
    """PQ encoding must be scan-fused narrow work: no Exchange at all —
    the codebook is literals, the argmin is row-local expressions."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sim_pq_encode"](spark, sf_dir))
    assert "Exchange" not in p
    assert "CartesianProduct" not in p


def test_pq_adc_lut_join_is_broadcast(spark, sf_dir, no_auto_broadcast):
    """The ADC LUT (queries x M x K rows, bounded by the query batch)
    must broadcast even at fact scale — the database side is scanned
    once and never carries embeddings past the code explode."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sim_pq_adc_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_quality_logreg_has_no_shuffle(spark, sf_dir):
    """The linear quality gate is a scan-side map: zero Exchange."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["pipe_quality_logreg"](spark, sf_dir))
    assert "Exchange" not in p


def test_apply_changes_is_one_key_equi_join(spark, sf_dir):
    """MERGE expansion: exactly one join, on the primary key, never a
    nested loop (the Delta/Iceberg MERGE plan shape)."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["pipe_apply_changes"](spark, sf_dir))
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert p.count("Join") >= 1


def test_global_rank_windows_are_partitioned(spark, sf_dir):
    """The two-phase rank refactor (r06 verdict item 6): zipf and
    ntile must not plan a single-partition window over input-sized
    data — every window in their plans carries a partition spec."""
    import re

    from mapreducecf_spark.registry import QUERIES

    for name in ("text_zipf_fit", "window_ntile_quartiles"):
        p = plan_str(QUERIES[name](spark, sf_dir), mode="simple")
        # WindowExec prints "Window [funcs], [partition spec], [order]";
        # an unpartitioned one prints "Window [funcs], [order]" with no
        # middle partition list — detect by the windowspecdefinition
        # argument count instead: every windowspecdefinition must name a
        # partition column before the sort spec
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", p):
            args = m.group(1)
            assert "ASC NULLS FIRST" in args or "DESC NULLS LAST" in args
            first = args.split(",")[0].strip()
            assert "ASC" not in first and "DESC" not in first, (
                name,
                args,
            )  # first arg is a partition column, not a sort spec


def test_sq8_encode_is_zero_exchange_scan_projection(spark, sf_dir):
    """int8 encode: grid literals ride the plan — no Exchange, no
    Python stage."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sim_sq8_encode"](spark, sf_dir))
    assert "Exchange" not in p
    assert "Python" not in p  # pure column expressions


def test_anomaly_mad_broadcasts_stats_not_events(spark, sf_dir):
    """Both stats joins must be broadcast joins: the raw event scan
    never shuffles for the join (the two-pass broadcast pattern)."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["ts_anomaly_mad"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_drift_psi_has_no_explode(spark, sf_dir):
    """Binning is size(filter(bs, ...)) — array math in the
    projection, never a Generate/explode of the boundary array."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["pipe_drift_psi"](spark, sf_dir))
    assert "Generate" not in p


def test_phash_neardup_no_cartesian_and_one_python_stage(spark, sf_dir):
    """Banded Hamming join: equi-join on (ci, ck), never a cross
    product; decode enters Python exactly once."""
    from mapreducecf_spark.registry import QUERIES

    from mapreducecf_spark.memo import _MEMO  # noqa: F401

    # evict any cached fingerprint table so the plan under test is the
    # cold one (same eviction discipline as the other memo plan tests)
    for k in [k for k in list(_MEMO) if "phash_chunks" in k]:
        _MEMO.pop(k)
    p = plan_str(QUERIES["mm_phash_neardup"](spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    # the memoized fingerprint table feeds BOTH join sides from cache:
    # after the memo build the join reads InMemoryTableScan, so the
    # Arrow decode appears in the cached build, not per side
    assert "InMemoryTableScan" in p


def test_rp_recall_broadcasts_query_batch(spark, sf_dir):
    """The JL search side: query batch is broadcast (bounded by
    construction); ranking is a partitioned window."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sim_rp_recall"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_dpp_prunes_fact_partitions_at_runtime(spark, sf_dir):
    """The partitioned fact scan must carry a dynamicpruning
    expression in its PartitionFilters — the runtime partition
    elimination the query exists to demonstrate."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["join_dynamic_partition_pruning"](spark, sf_dir))
    assert "dynamicpruning" in p.lower()
    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert pf and any("dynamicpruning" in ln for ln in pf)


def test_contamination_attribution_examples_partial_rank(spark, sf_dir):
    """The r09 attribution report's example ids must come from a
    WindowGroupLimit (map-side partial top-3 per (source, benchmark)
    cell) — NOT a collect_list over the cell, which a
    fully-contaminated source × benchmark pair would blow up at
    100 TB; the 20-source train totals must join as a broadcast."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["pipe_contamination_attribution"](spark, sf_dir))
    assert "WindowGroupLimit" in p
    assert "BroadcastHashJoin" in p


def test_binary_quant_recall_single_python_scan(spark, sf_dir):
    """The 1-bit audit's approximate side: encode + Hamming run in ONE
    Arrow python stage over the corpus scan (no join, no shuffle
    before the per-query rank window) — the zero-Exchange scoring
    discipline shared with the SQ8/JL audits."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sim_binary_quant_recall"](spark, sf_dir))
    # exactly one Arrow eval stage feeds the rank window ("formatted"
    # prints each node twice: once in the tree, once in the details)
    assert p.count("MapInPandas (") == 1
    assert "CartesianProduct" not in p


def test_cf_interactions_build_is_one_exchange(spark, sf_dir, monkeypatch):
    """The r09 CF layout claim, pinned: the interactions build plans
    exactly ONE hash-partitioning Exchange (the repartition(u) that
    the dedup agg and the basket-cap window both ride) — the naive
    distinct-then-window layout plans two. The orders-side broadcast
    is the only other exchange. session_memo is bypassed so the raw
    build plan is visible (a persisted root explains as an opaque
    InMemoryRelation). Bypassing the memo is not enough when an
    earlier test already persisted a memoized build of the same table:
    the fresh build's ANALYZED plan is canonically equal to the cached
    one, so the CacheManager substitutes InMemoryRelation anyway and
    the explain shows the cached plan's exchanges (or none at all)
    instead of the fresh build's. So the sources are tagged with a
    no-op ``Filter(lit(True))``: it defeats the analyzed-plan cache
    match but is pruned by the optimizer before physical planning, so
    the asserted physical shape is exactly the production build's."""
    import re

    import pyspark.sql.functions as F

    import mapreducecf_spark.memo as memo
    import mapreducecf_spark.queries.cf as cf

    real_load = cf.load_table
    monkeypatch.setattr(
        cf, "load_table", lambda s, d, n: real_load(s, d, n).where(F.lit(True))
    )
    monkeypatch.setattr(memo, "session_memo", lambda spark, key, build: build())
    p = plan_str(cf.interactions(spark, sf_dir))
    assert "InMemoryRelation" not in p, p  # the cache-dodge worked
    hashex = re.findall(r"hashpartitioning\(u#", p)
    assert len(hashex) == 1, p
    # and both the dedup agg and the window ride it: no second
    # full-table exchange of (u, it)
    assert "WindowGroupLimit" in p


def test_pack_layouts_two_phase_contract_and_identical_shape(spark, sf_dir):
    """Both sequence packers share one physical layout by construction
    (_pack_layout over ``with_hash_bucketed_prefix``). The two-phase
    contract: the CORPUS crosses the wire exactly once — the
    hashpartitioning(shard, _sub) Exchange that the per-bucket
    running-offset window rides (exactly ONE Window node) — and the
    only other shuffles are the two per-(shard, _sub) totals
    aggregations, each guaranteed tiny by a map-side partial_sum
    (|shards| x 256 rows per map partition, not corpus-sized). The
    bucket offsets come back as a BroadcastHashJoin, never another
    corpus shuffle. The BPE variant adds only the length expression:
    no extra Exchange, no Python stage, identical operator skeleton."""
    import re

    from mapreducecf_spark.registry import QUERIES

    shapes = []
    for name in ("pipe_pack_sequences", "pipe_pack_sequences_bpe"):
        p = plan_str(QUERIES[name](spark, sf_dir))
        assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 3, (name, p)
        ex_args = re.findall(r"Arguments: (hashpartitioning\([^)]*\))", p)
        assert len(ex_args) == 3, (name, ex_args)
        # every shuffle is keyed (shard, _sub) — no global sort, no
        # unkeyed repartition, no second pass over the corpus
        assert all(a.startswith("hashpartitioning(shard#") for a in ex_args), (
            name, ex_args
        )
        assert all("_sub#" in a for a in ex_args), (name, ex_args)
        # one corpus-side window; the other two exchanges feed the
        # totals agg and are map-side-partial (tiny payload)
        assert len(re.findall(r"\(\d+\) Window\b", p)) == 1, (name, p)
        assert p.count("partial_sum") >= 2, (name, p)
        assert "BroadcastHashJoin" in p, (name, p)
        assert "mapInPandas" not in p and "BatchEvalPython" not in p, name
        # same operator skeleton: only expressions differ
        shapes.append(re.findall(r"\(\d+\) ([A-Za-z]+)", p))
    assert shapes[0] == shapes[1], shapes


def test_knn_index_cdc_delta_joins_all_broadcast(spark, sf_dir):
    """The maintenance query's 100 TB contract: every delta-side join
    (gone ids, recompute/affected id sets, the arrival band rows) is
    BROADCAST — a sort-merge there would shuffle the corpus-sized
    routing table per delta. The plan must carry broadcast hash joins
    only (the 1-row scalar cross joins are BNLJ) and no sort-merge, no
    cartesian."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sim_knn_index_cdc"](spark, sf_dir), mode="simple")
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("BroadcastHashJoin") >= 8, p


def test_als_foldin_serves_from_broadcast_item_factors(spark, sf_dir):
    """Fold-in's serving matmul must broadcast the item-factor model
    (items x rank, domain-bounded) against the capped user batch —
    never shuffle it."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["cf_als_foldin"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p  # batch x broadcast(vpref)


def test_mmr_pool_tables_stay_workload_sized(spark, sf_dir):
    """MMR's greedy steps run over localCheckpoint-ed pool/pairwise
    tables (query-batch-sized by construction); the corpus appears only
    in the single broadcast pool scan. Pin: no cartesian, and the
    per-step joins are broadcast-sized hash joins."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sim_mmr_rerank"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in p, p


def test_ppl_filter_broadcasts_cutoff_no_global_sort(spark, sf_dir):
    """The perplexity gate's p90 boundary is a one-row aggregate
    broadcast back over the scored table (BroadcastNestedLoopJoin from
    the crossJoin), and the only Sorts are window-local (per-source
    worst pick) — never a global corpus Sort Exchange (rangepartitioning
    would mean a distribution-wide total order)."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["text_ppl_filter"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p  # scored x broadcast(cut)
    assert "rangepartitioning" not in p, p


def test_token_apportion_single_corpus_agg(spark, sf_dir):
    """Apportionment reads the corpus once (one partial-agg groupBy on
    source) and runs its windows over per-source rows — no second
    corpus scan, no range partitioning of the corpus."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["pipe_token_apportion"](spark, sf_dir), mode="simple")
    assert p.count("FileScan parquet") + p.count("BatchScan") == 1, p
    assert "partial_sum" in p or "partial" in p.lower(), p
    assert "rangepartitioning" not in p, p


def test_embedding_drift_rescores_only_the_changed_slice(spark, sf_dir):
    """The drift monitor's O(delta) claim, pinned: both assignment
    tables are materialized ONCE (localCheckpoint — the plan shows
    zero residual Python stages, so no consumer re-runs the corpus or
    changed-slice Arrow scoring), and the per-cluster count joins ride
    broadcasts (nlist-bounded), never a shuffle join."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sim_embedding_drift"](spark, sf_dir), mode="simple")
    assert p.count("MapInPandas") == 0, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_winnowing_fingerprint_stage_is_shuffle_free(spark, sf_dir, no_auto_broadcast):
    """winnow_fingerprints' scale claim: the sliding-window-min
    selection is pure narrow array arithmetic (zip_with-folded shifted
    slices), so the fingerprint table plans with ZERO Exchange — at
    100 TB the selection is a map stage. The pair build adds only the
    broadcast anti-join for the DF-cap hot list and the fp equi-join."""
    from mapreducecf_spark.queries.dedup import (
        _build_winnow_capped,
        dedup_winnowing,
        winnow_fingerprints,
    )

    pf = plan_str(winnow_fingerprints(spark, sf_dir), mode="simple")
    assert "Exchange" not in pf, pf

    # pin the BUILD plan (the graded query reads the memoized artifact)
    pb = plan_str(_build_winnow_capped(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in pb, pb  # hot-list anti-join stays broadcast

    pq = plan_str(dedup_winnowing(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in pq, pq


def test_hybrid_rrf_broadcasts_query_shingles(spark, sf_dir, no_auto_broadcast):
    """sim_hybrid_rrf's scale claim: the lexical channel joins the
    QUERY docs' shingles (a workload, never a table) into the
    DF-capped inverted index via an EXPLICIT broadcast that survives a
    disabled auto-threshold; the dense channel rides the memoized brute
    top-k. No CartesianProduct anywhere."""
    from mapreducecf_spark.queries.similarity import sim_hybrid_rrf

    p = plan_str(sim_hybrid_rrf(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_bloom_filter_build_is_partial_agg_and_pairs_stay_broadcast(spark, sf_dir):
    """dedup_bloom_shards' scale claims: the filter build is a
    map-side-combinable bit_or aggregation (partial->final
    HashAggregate — the shuffle carries (shard, word) partial words,
    never shingles), and the pair stage joins ≤64-word-per-shard
    tables with NO sort-merge join anywhere (tiny sides broadcast)."""
    from mapreducecf_spark import memo
    from mapreducecf_spark.queries.dedup import bloom_shard_words, dedup_bloom_shards

    memo.evict(("bloom_words",))
    pb = plan_str(bloom_shard_words(spark, sf_dir), mode="simple")
    assert pb.count("HashAggregate") >= 2, pb
    assert "partial_bit_or" in pb or "partial" in pb, pb

    pq = plan_str(dedup_bloom_shards(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in pq, pq


def test_seasonal_decompose_windows_run_on_the_hourly_grid(spark, sf_dir):
    """ts_seasonal_decompose's scale claim: the trend window (the only
    Window in the plan) consumes the HOURLY aggregate, never raw
    events — a partial->final HashAggregate sits below the Window, so
    the sorted window input is bounded by the time span."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.timeseries import _decompose_interior
    from mapreducecf_spark.registry import QUERIES
    from mapreducecf_spark.sources import load_table

    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hb"))
        .agg(F.count("*").alias("nv"))
    )
    p = plan_str(_decompose_interior(hourly), mode="simple")
    assert "Window" in p, p
    assert p.count("HashAggregate") >= 2 and "partial" in p, p

    pq = plan_str(QUERIES["ts_seasonal_decompose"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in pq, pq


def test_statistical_toolkit_plans_stay_grid_bounded(spark, sf_dir):
    """The r17 nonparametric family's scale claims, verified in the
    plan: the paired test's per-user reduction is a PARTIAL (map-side)
    aggregate before its exchange, every grid test reduces the corpus
    BEFORE its window/rank arithmetic, and none of the five plans a
    CartesianProduct over event-scale inputs (their only cross joins
    carry 1-row/k-row broadcast aggregates)."""
    from mapreducecf_spark.registry import QUERIES

    for name in (
        "ts_wilcoxon_signed_rank",
        "ts_kruskal_wallis",
        "ts_brown_forsythe",
        "ts_permutation_mean_shift",
        "ts_bootstrap_mean_ci",
    ):
        p = plan_str(QUERIES[name](spark, sf_dir))
        assert "partial" in p.lower(), f"{name}: no map-side combine"
        assert "CartesianProduct" not in p, name


def test_sketch_roundtrip_merges_read_only_the_sketch_tables(spark, sf_dir):
    """The persisted-sketch lifecycle claims: each round-trip's merge
    side scans the kilobyte PARQUET SKETCH TABLE (visible as its own
    scan with only the sketch columns), and the events table appears
    only for the exact-audit aggregate — no join of events against
    events anywhere in the plan."""
    from mapreducecf_spark.registry import QUERIES

    p = plan_str(QUERIES["sink_kmv_roundtrip"](spark, sf_dir))
    assert "kmv_sketch_" in p  # the persisted table's path in the scan
    assert "CartesianProduct" not in p
    p2 = plan_str(QUERIES["sink_hll_roundtrip"](spark, sf_dir))
    assert "hll_sketch_" in p2
    p3 = plan_str(QUERIES["sink_kll_roundtrip"](spark, sf_dir))
    assert "kll_sketch_" in p3
