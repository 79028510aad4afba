"""The sketch queries carry exact-twin columns plus an ``approx_ok``
boolean (each engine bounds its own sketch against its own exact value
— that's what makes them hash-checkable cross-engine). Pin locally that
the exact twins agree with the exact queries and every bound holds."""

from __future__ import annotations


def test_vocab_approx_tracks_exact(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    exact = QUERIES["text_vocab"](spark, sf_dir).collect()[0]
    approx = QUERIES["text_vocab_approx"](spark, sf_dir).collect()[0]
    assert approx["total_tokens"] == exact["total_tokens"]
    assert approx["vocab_size"] == exact["vocab_size"]
    assert approx["approx_ok"] is True  # HLL within VOCAB_APPROX_TOL


def test_daily_actives_approx_tracks_exact(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    exact = {r["day"]: r for r in QUERIES["ts_daily_activity"](spark, sf_dir).collect()}
    approx = {
        r["day"]: r for r in QUERIES["ts_daily_activity_approx"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for day, e in exact.items():
        a = approx[day]
        assert a["n_events"] == e["n_events"]
        assert a["n_users"] == e["n_users"]
        assert a["approx_ok"] is True, f"{day}: HLL outside DAILY_APPROX_TOL"


def test_approx_percentiles_within_1pct_of_exact(spark, sf_dir):
    """Tighter pin than the query's own approx_ok bound: the raw
    approx_percentile sketch (accuracy 10000) must land within 1% of
    each exact interpolated percentile."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.relational import _t
    from mapreducecf_spark.registry import QUERIES

    exact = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_percentiles"](spark, sf_dir).collect()
    }
    graded = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_percentiles_approx"](spark, sf_dir).collect()
    }
    assert exact.keys() == graded.keys()
    for flag, er in exact.items():
        g = graded[flag]
        assert g["approx_ok"] is True, flag
        for c in ("p50", "p90", "p99"):
            assert g[c] == er[c], (flag, c)  # exact twins identical

    qs = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    apx = F.approx_percentile("l_extendedprice", qs, F.lit(10000))
    raw = {
        r["l_returnflag"]: r
        for r in _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.element_at(apx, 1).alias("p50"),
            F.element_at(apx, 2).alias("p90"),
            F.element_at(apx, 3).alias("p99"),
        )
        .collect()
    }
    for flag, er in exact.items():
        for c in ("p50", "p90", "p99"):
            assert abs(raw[flag][c] - er[c]) <= 0.01 * abs(er[c]), (flag, c)


def test_audience_overlap_identities(spark, sf_dir):
    """Set identities must hold exactly: both ≤ min(a, b),
    either = a + b − both, jaccard ∈ [0, 1], and the sketch flag is
    true everywhere on this corpus."""
    from mapreducecf_spark.queries.timeseries import ts_audience_overlap

    rows = ts_audience_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["users_both"] <= min(r["users_a"], r["users_b"])
        assert r["users_either"] == r["users_a"] + r["users_b"] - r["users_both"]
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["approx_ok"]
