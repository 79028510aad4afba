"""Funnel-depth semantics on a hand-built events frame: greedy ordered
progression with strict-after step times (north-star event analytics;
the reference has no analogue)."""

import datetime

import pytest
from pyspark.sql import functions as F


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def funnel_dir(spark, tmp_path_factory):
    rows = [
        # user 1: full funnel in order -> 4
        (1, _ts(0), 1, "signup", 0.0, "{}"),
        (2, _ts(1), 1, "view", 0.0, "{}"),
        (3, _ts(2), 1, "click", 0.0, "{}"),
        (4, _ts(3), 1, "purchase", 0.0, "{}"),
        # user 2: purchase arrives before click; the early purchase is
        # skipped, click@3 (after view@1) still advances, but no purchase
        # AFTER the click exists -> stage 3
        (5, _ts(0), 2, "signup", 0.0, "{}"),
        (6, _ts(1), 2, "view", 0.0, "{}"),
        (7, _ts(2), 2, "purchase", 0.0, "{}"),
        (8, _ts(3), 2, "click", 0.0, "{}"),
        # user 3: view with NO prior signup -> 0
        (9, _ts(0), 3, "view", 0.0, "{}"),
        # user 4: simultaneous signup+view (tie) -> strict 'after' rejects
        (10, _ts(0), 4, "signup", 0.0, "{}"),
        (11, _ts(0), 4, "view", 0.0, "{}"),
        # user 5: only non-funnel events -> 0
        (12, _ts(0), 5, "error", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path_factory.mktemp("funnel"))
    df.write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def test_funnel_greedy_strict_order(spark, funnel_dir):
    from mapreducecf_spark.registry import QUERIES

    got = {
        r["user_id"]: r["max_stage"]
        for r in QUERIES["ts_funnel_stages"](spark, funnel_dir).collect()
    }
    assert got == {1: 4, 2: 3, 3: 0, 4: 1, 5: 0}


def test_funnel_single_shuffle(spark, funnel_dir):
    """The fold plan shuffles events once (groupBy user) plus the
    distinct-users join — never once per funnel stage."""
    import contextlib
    import io

    from mapreducecf_spark.registry import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["ts_funnel_stages"](spark, funnel_dir).explain(mode="simple")
    # 4 sequential stage-joins would show >=4 exchanges of the events scan
    assert buf.getvalue().count("Exchange hashpartitioning") <= 3


def test_peak_concurrency_two_phase_equals_global_window(spark, sf_dir):
    """The distributed two-phase prefix sum must equal the naive
    single-ordered-window sweep, day for day."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.timeseries import (
        CONCURRENCY_HOLD_MIN,
        ts_peak_concurrency,
    )
    from mapreducecf_spark.sources import load_table

    got = {
        r["day"]: r["peak_concurrency"]
        for r in ts_peak_concurrency(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    hold = F.col("ts") + F.expr(f"INTERVAL {CONCURRENCY_HOLD_MIN} MINUTE")
    ev = e.select(F.col("ts").alias("t"), F.lit(1).alias("d")).unionAll(
        e.select(hold.alias("t"), F.lit(-1).alias("d"))
    )
    naive = (
        ev.groupBy("t")
        .agg(F.sum("d").alias("net"))
        .withColumn(
            "active",
            F.sum("net").over(
                Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(F.to_date("t").alias("day"))
        .agg(F.max("active").alias("peak"))
        .collect()
    )
    assert got == {r["day"]: r["peak"] for r in naive}
    # the curve must return to zero after the last boundary: equal
    # numbers of +1 and -1 deltas
    assert sum(r["peak"] for r in naive) > 0


def test_scd2_intervals_partition_history(spark, sf_dir):
    """Per user: intervals chain exactly (valid_to == next valid_from),
    exactly one open (is_current) row, run lengths sum to the user's
    event count, and adjacent runs never share a type (else they would
    have merged)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.timeseries import ts_scd2_intervals
    from mapreducecf_spark.sources import load_table

    rows = ts_scd2_intervals(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    counts = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(by_user) == set(counts)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(r["n_events"] for r in ivs) == counts[uid]
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert a["event_type"] != b["event_type"], uid


def test_dau_wau_mau_ordering_and_dau_exactness(spark, sf_dir):
    """dau <= wau <= mau everywhere; dau matches the independent daily
    distinct count."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.timeseries import ts_dau_wau_mau
    from mapreducecf_spark.sources import load_table

    rows = ts_dau_wau_mau(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"] <= r["mau"], r
    exact = {
        r["day"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .select(F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r["day"]: r["dau"] for r in rows} == exact


def test_anomaly_mad_robust_to_planted_outlier(spark):
    """The MAD scorer must flag a planted extreme value while the
    median/MAD stats themselves stay unmoved by it (robustness — the
    property that motivates the query vs the mean/stddev twin)."""
    import datetime

    from pyspark.sql import functions as F

    base = [(i, datetime.datetime(2024, 1, 1 + i % 3, 12, 0, 0), i, "t", 10.0 + (i % 5))
            for i in range(40)]
    planted = [(999, datetime.datetime(2024, 1, 2, 12, 0, 0), 999, "t", 1e6)]
    df = spark.createDataFrame(
        base + planted, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    med = df.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    m = med.collect()[0]["med"]
    assert 10.0 <= m <= 15.0  # median ignores the planted outlier
    mad = (
        df.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"))
    ).collect()[0]["mad"]
    assert 0 < mad < 10
    rz = 0.6745 * (1e6 - m) / mad
    assert rz > 3.5  # the planted point itself is flagged


def test_value_histogram_partitions_events(spark, sf_dir, tables):
    """Bin counts per type must sum to the type's event count, bins
    lie in [0, HIST_BINS), and bin edges tile the global range."""
    from mapreducecf_spark.queries.timeseries import (
        HIST_BINS,
        ts_value_histogram,
    )

    rows = ts_value_histogram(spark, sf_dir).collect()
    assert rows
    per_type: dict[str, int] = {}
    for r in rows:
        assert 0 <= r["bin"] < HIST_BINS
        assert r["bin_lo"] < r["bin_hi"]
        per_type[r["event_type"]] = per_type.get(r["event_type"], 0) + r["n_events"]
    from pyspark.sql import functions as F

    expected = {
        r["event_type"]: r["n"]
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_type == expected


def test_autocorr_bounds_and_self_consistency(spark, sf_dir):
    """ACF values live in [-1, 1]; a type's lag-1 series must have
    enough days (n_days == day count of the type)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.timeseries import ts_autocorr
    from mapreducecf_spark.sources import load_table

    rows = ts_autocorr(spark, sf_dir).collect()
    assert rows
    days = {
        r["event_type"]: r["d"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct(F.to_date(F.date_trunc("day", "ts"))).alias("d"))
        .collect()
    }
    for r in rows:
        assert r["n_days"] == days[r["event_type"]]
        for c in ("acf_lag1", "acf_lag7"):
            if r[c] is not None:
                assert -1.0 <= r[c] <= 1.0


def test_interarrival_gap_consistency(spark, sf_dir, tables):
    """n_gaps per type == events − 1; p90 ≥ median; max ≥ p90."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.timeseries import ts_interarrival

    rows = ts_interarrival(spark, sf_dir).collect()
    counts = {
        r["event_type"]: r["n"]
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r["n_gaps"] == counts[r["event_type"]] - 1
        assert r["median_gap_us"] <= r["p90_gap_us"] <= r["max_gap_us"]


def test_interarrival_seam_merge_equals_single_window(spark):
    """The (event_type, day) sub-partitioned lag must reproduce the
    plain per-type lag EXACTLY — including across multi-day gaps with
    empty days in between, same-timestamp runs at a day boundary, and
    single-event types (no gaps at all)."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries import timeseries as ts

    base = dt.datetime(2024, 1, 1, 23, 59, 0)
    rows = [
        # type a: dense day 1, then a 3-day gap (days 2-3 empty), then
        # two same-timestamp events straddling midnight
        ("a", 1, base),
        ("a", 2, base + dt.timedelta(seconds=30)),
        ("a", 3, base + dt.timedelta(seconds=60)),  # 00:00:00 day 2
        ("a", 4, base + dt.timedelta(days=3)),
        ("a", 5, base + dt.timedelta(days=3)),  # equal ts, id tiebreak
        # type b: single event — no gaps, must not emit
        ("b", 6, base),
        # type c: all in one day
        ("c", 7, base - dt.timedelta(hours=1)),
        ("c", 8, base - dt.timedelta(minutes=30)),
    ]
    e = spark.createDataFrame(rows, "event_type string, event_id long, ts timestamp")

    import mapreducecf_spark.queries.timeseries as tmod

    real_load = tmod.load_table
    try:
        tmod.load_table = lambda s, d, n: e
        got = {
            r["event_type"]: (
                r["n_gaps"], r["median_gap_us"], r["p90_gap_us"], r["max_gap_us"]
            )
            for r in ts.ts_interarrival(spark, "ignored").collect()
        }
    finally:
        tmod.load_table = real_load

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "event_type",
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    want = {
        r["event_type"]: (r["n"], r["p50"], r["p90"], r["mx"])
        for r in gaps.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.percentile("g", 0.5).alias("p50"),
            F.percentile("g", 0.9).alias("p90"),
            F.max("g").cast("bigint").alias("mx"),
        )
        .collect()
    }
    assert got == want
    assert "b" not in got  # single-event type emits nothing
    assert got["a"][0] == 4  # every adjacent pair incl. the 0-gap tie


def test_mann_kendall_signs_on_planted_trends(spark, monkeypatch):
    """S and tau against hand-computable planted series: strictly
    rising days give tau = 1, strictly falling tau = -1, and a
    constant series tau = 0."""
    import datetime

    import mapreducecf_spark.queries.timeseries as ts

    def events_for(xs):
        rows = []
        for d, x in enumerate(xs):
            day = datetime.datetime(2024, 1, 1 + d)
            rows += [(i, day, 1, "e", 0.0) for i in range(x)]
        return spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
        )

    for xs, tau in [([1, 2, 3, 4, 5], 1.0), ([5, 4, 3, 2, 1], -1.0), ([3, 3, 3, 3], 0.0)]:
        df = events_for(xs)
        monkeypatch.setattr(ts, "load_table", lambda spark, sf_dir, name, df=df: df)
        r = ts.ts_trend_mann_kendall(spark, f"-mk{tau}").collect()[0]
        n = len(xs)
        assert r["n_days"] == n and r["n_pairs"] == n * (n - 1) // 2
        assert r["tau"] == tau, (xs, r)


def test_binseg_finds_planted_step(spark, monkeypatch):
    """Binary segmentation must place the level-1 split exactly at a
    planted mean step (counts 2,2,2,2 then 10,10,10,10); constant
    halves tie every interior split and the index tiebreak makes the
    level-2 cuts deterministic (k=1 and k=5)."""
    import datetime

    import mapreducecf_spark.queries.timeseries as ts

    xs = [2, 2, 2, 2, 10, 10, 10, 10]
    rows = []
    for d, x in enumerate(xs):
        day = datetime.datetime(2024, 3, 1 + d)
        rows += [(i, day, 1, "e", 0.0) for i in range(x)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    monkeypatch.setattr(ts, "load_table", lambda spark, sf_dir, name, df=df: df)

    segs = sorted(
        ts.ts_changepoint_binseg(spark, "-binseg").collect(),
        key=lambda r: r["seg_idx"],
    )
    import datetime as dt

    spans = [
        (r["start_day"], r["end_day"], r["n_days"], r["mean_events"]) for r in segs
    ]
    d = lambda i: dt.date(2024, 3, i)
    assert spans == [
        (d(1), d(1), 1, 2.0),
        (d(2), d(4), 3, 2.0),
        (d(5), d(5), 1, 10.0),
        (d(6), d(8), 3, 10.0),
    ]


def test_weekday_profile_effects_sum_weighted_to_zero(spark, monkeypatch):
    """The additive decomposition's defining identity: day-weighted
    effects sum to ~0 (each weekday mean is global mean + effect), and
    a planted Monday spike shows up only in Monday's effect."""
    import datetime

    import mapreducecf_spark.queries.timeseries as ts

    rows = []
    for d in range(14):  # two full weeks starting Monday 2024-01-01
        day = datetime.datetime(2024, 1, 1 + d)
        x = 20 if day.weekday() == 0 else 5
        rows += [(i, day, 1, "e", 0.0) for i in range(x)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    monkeypatch.setattr(ts, "load_table", lambda spark, sf_dir, name, df=df: df)

    out = {r["dow"]: r for r in ts.ts_weekday_profile(spark, "-wdp").collect()}
    assert set(out) == set(range(1, 8))
    assert all(r["n_days"] == 2 for r in out.values())
    # global mean = (20 + 6*5)/7 ≈ 7.142857
    assert out[1]["mean_events"] == 20.0
    assert abs(out[1]["effect"] - (20 - 50 / 7)) < 1e-6
    for d in range(2, 8):
        assert out[d]["mean_events"] == 5.0
        assert abs(out[d]["effect"] - (5 - 50 / 7)) < 1e-6
    weighted = sum(r["effect"] * r["n_days"] for r in out.values())
    assert abs(weighted) < 1e-4
