"""Round-trip tests for the parquet/partitioned sink (K1/K2
generalized): overwrite lifecycle, partitionBy layout, dynamic
partition overwrite, and the n_files (n_reduce analogue) knob."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def _nation(spark, sf_dir):
    from mapreducecf_spark.sources import load_table

    return load_table(spark, sf_dir, "nation")


def test_parquet_roundtrip_with_overwrite(spark, sf_dir, tmp_path):
    from mapreducecf_spark.sinks import read_table, write_table

    df = _nation(spark, sf_dir)
    out = str(tmp_path / "t")
    write_table(df, out)
    write_table(df, out)  # K2: second overwrite must not fail or double
    back = read_table(spark, out)
    assert back.count() == df.count()
    assert sorted(back.columns) == sorted(df.columns)


def test_partitioned_write_layout_and_roundtrip(spark, sf_dir, tmp_path):
    from mapreducecf_spark.sinks import read_table, write_table

    df = _nation(spark, sf_dir)
    out = str(tmp_path / "p")
    write_table(df, out, partition_cols=["n_regionkey"])
    # hive-style layout: one directory per partition value
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/n_regionkey=*")}
    assert len(dirs) == df.select("n_regionkey").distinct().count()
    back = read_table(spark, out)
    assert back.count() == df.count()
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_dynamic_partition_overwrite_keeps_untouched_partitions(spark, sf_dir, tmp_path):
    from mapreducecf_spark.sinks import read_table, write_table

    df = _nation(spark, sf_dir)
    out = str(tmp_path / "d")
    write_table(df, out, partition_cols=["n_regionkey"])
    # rewrite ONLY region 0 with doubled rows
    r0 = df.filter(F.col("n_regionkey") == 0)
    write_table(
        r0.union(r0), out, partition_cols=["n_regionkey"], overwrite_partitions=True
    )
    back = read_table(spark, out)
    n0 = df.filter("n_regionkey = 0").count()
    assert back.filter("n_regionkey = 0").count() == 2 * n0  # rewritten
    assert back.filter("n_regionkey <> 0").count() == df.filter("n_regionkey <> 0").count()


def test_bucketed_join_needs_no_exchange(spark, sf_dir):
    """Two tables bucketed identically on the join key must sort-merge
    join with ZERO Exchange — the pay-the-shuffle-once contract."""
    import contextlib
    import io

    from mapreducecf_spark.sinks import write_bucketed_table
    from mapreducecf_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed_table(o, "b_orders", ["o_custkey"], 8, sort_cols=["o_custkey"])
    write_bucketed_table(c, "b_customer", ["c_custkey"], 8, sort_cols=["c_custkey"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_orders").join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain(mode="simple")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # and it is not just a pretty plan: the join actually works
            assert joined.count() == o.join(
                c, o.o_custkey == c.c_custkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_n_files_controls_output_file_count(spark, sf_dir, tmp_path):
    from mapreducecf_spark.sinks import write_table

    df = _nation(spark, sf_dir)
    for n in (1, 3):
        out = str(tmp_path / f"n{n}")
        write_table(df, out, n_files=n)
        files = glob.glob(f"{out}/part-*.parquet")
        assert len(files) == n


def test_zorder_layout_clusters_both_dims_and_pushes_filters(spark, sf_dir):
    """The Z-clustered lineitem copy must (a) give every file a small
    bounding rectangle in (partkey, suppkey) space — mean per-file span
    well under the full domain on BOTH dims, which a single-column sort
    cannot do — and (b) let both box predicates reach the parquet scan
    as PushedFilters."""
    import glob as _glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.storage import (
        sink_zorder_roundtrip,
        zordered_lineitem,
    )

    path = zordered_lineitem(spark, sf_dir)
    spans = {"l_partkey": [], "l_suppkey": []}
    glob_minmax = {"l_partkey": [None, None], "l_suppkey": [None, None]}
    for f in _glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        for col in spans:
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                spans[col].append(max(his) - min(los))
                g = glob_minmax[col]
                g[0] = min(los) if g[0] is None else min(g[0], min(los))
                g[1] = max(his) if g[1] is None else max(g[1], max(his))
    for col in spans:
        assert spans[col], f"no stats for {col}"
        domain = glob_minmax[col][1] - glob_minmax[col][0]
        mean_span = sum(spans[col]) / len(spans[col])
        # a random layout gives ~100% span per file on both dims; a
        # single-column sort gives ~0% on one and ~100% on the other.
        # z-order must be materially below full span on BOTH.
        assert mean_span < 0.75 * domain, (col, mean_span, domain)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sink_zorder_roundtrip(spark, sf_dir).explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    for col in ("l_partkey", "l_suppkey"):
        assert f"GreaterThanOrEqual({col}" in plan, col
        assert f"LessThanOrEqual({col}" in plan, col


def test_compaction_shrinks_file_count_preserving_rows(spark, sf_dir):
    from mapreducecf_spark.queries.storage import (
        COMPACTED_FILES,
        FRAGMENTED_FILES,
        compacted_events,
    )
    from mapreducecf_spark.sources import load_table

    frag, comp = compacted_events(spark, sf_dir)
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    n_comp = len(glob.glob(os.path.join(comp, "*.parquet")))
    assert n_frag == FRAGMENTED_FILES
    assert n_comp <= COMPACTED_FILES
    sch = load_table(spark, sf_dir, "events").schema
    assert (
        spark.read.schema(sch).parquet(comp).count()
        == load_table(spark, sf_dir, "events").count()
    )


def test_schema_evolution_nulls_only_in_old_generation(spark, sf_dir):
    """mergeSchema read: the evolved column is NULL exactly on
    generation-1 rows (odd event_ids) and populated on generation 2;
    no rows are lost across generations."""
    from mapreducecf_spark.queries.storage import evolved_events
    from mapreducecf_spark.sources import load_table

    path = evolved_events(spark, sf_dir)
    e = spark.read.option("mergeSchema", "true").parquet(path)
    total = load_table(spark, sf_dir, "events").count()
    assert e.count() == total
    assert e.filter("event_id % 2 = 1 AND value IS NOT NULL").count() == 0
    assert e.filter("event_id % 2 = 0 AND value IS NULL").count() == 0


def test_kmv_sketch_table_roundtrip_equals_inquery_merge(spark, sf_dir):
    """The persisted-sketch lifecycle (VERDICT r16 #3): the parquet
    sketch table holds exactly the in-query per-type bottom-k sets
    (t, rnk 1..k_t contiguous, hashes ascending), and the k-way merge
    over the RE-READ table reproduces ts_audience_union_kmv's report
    byte-for-byte — persistence is invisible in the result."""
    from mapreducecf_spark.queries.storage import (
        kmv_sketch_table,
        sink_kmv_roundtrip,
    )
    from mapreducecf_spark.queries.timeseries import (
        KMV_K,
        ts_audience_union_kmv,
    )

    path = kmv_sketch_table(spark, sf_dir)
    sk = spark.read.schema("t string, rnk int, h bigint").parquet(path)
    rows = sk.collect()
    per_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        per_type.setdefault(r["t"], []).append((r["rnk"], r["h"]))
    assert per_type  # at least one type sketched
    for t, pairs in per_type.items():
        pairs.sort()
        assert len(pairs) <= KMV_K
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1))
        hs = [p[1] for p in pairs]
        assert hs == sorted(set(hs))  # ascending, distinct

    got = sink_kmv_roundtrip(spark, sf_dir).collect()
    want = ts_audience_union_kmv(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_hll_sketch_table_roundtrip_equals_inquery_merge(spark, sf_dir):
    """The persisted HLL sketch-table lifecycle: the parquet table
    holds one binary DataSketches sketch per (type, day), and the
    per-type union over the RE-READ bytes reproduces
    ts_actives_hll_union's report byte-for-byte — serialized sketches
    survive the lake round-trip and still merge."""
    from mapreducecf_spark.queries.storage import (
        hll_sketch_table,
        sink_hll_roundtrip,
    )
    from mapreducecf_spark.queries.timeseries import ts_actives_hll_union
    from mapreducecf_spark.sources import load_table

    path = hll_sketch_table(spark, sf_dir)
    daily = spark.read.schema("event_type string, day date, sk binary").parquet(path)
    rows = daily.collect()
    assert rows and all(len(r["sk"]) > 0 for r in rows)
    n_days_src = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_type", "CAST(ts AS DATE) AS day")
        .distinct()
        .count()
    )
    assert len(rows) == n_days_src  # one sketch per (type, day)

    got = sorted(tuple(r) for r in sink_hll_roundtrip(spark, sf_dir).collect())
    want = sorted(tuple(r) for r in ts_actives_hll_union(spark, sf_dir).collect())
    assert got == want


def test_kll_sketch_table_roundtrip_count_exact_and_quantiles_close(spark, sf_dir):
    """The persisted KLL quantile-sketch lifecycle: one binary sketch
    per (type, day); the per-type MERGE over the re-read bytes
    preserves the exact value count (get_n is a lossless counter
    through serialization + merge) and estimates p50/p90 within 10% of
    the exact interpolated percentiles on this corpus under ANY
    compaction seed (KLL is randomized; k=800)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.storage import kll_sketch_table
    from mapreducecf_spark.sources import load_table

    path = kll_sketch_table(spark, sf_dir)
    daily = spark.read.schema("event_type string, day date, sk binary").parquet(path)
    e = load_table(spark, sf_dir, "events")
    n_days = e.selectExpr("event_type", "CAST(ts AS DATE) AS day").distinct().count()
    assert daily.count() == n_days

    merged = daily.groupBy("event_type").agg(
        F.kll_merge_agg_double("sk").alias("sk")
    )
    got = {
        r["event_type"]: (r["n"], r["e50"], r["e90"])
        for r in merged.select(
            "event_type",
            F.kll_sketch_get_n_double("sk").alias("n"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("e50"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("e90"),
        ).collect()
    }
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9)))
    want = {
        r["event_type"]: (r["n"], r["p50"], r["p90"])
        for r in e.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.element_at(pct, 1).alias("p50"),
            F.element_at(pct, 2).alias("p90"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0], "merged sketch count must be EXACT"
        assert abs(got[t][1] / want[t][1] - 1) < 0.10
        assert abs(got[t][2] / want[t][2] - 1) < 0.10
