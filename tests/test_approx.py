"""The rows-only sketch queries still need local correctness pins:
HLL++ estimates must land within a few rsd of the exact counts."""

from __future__ import annotations


def test_vocab_approx_tracks_exact(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    exact = QUERIES["text_vocab"](spark, sf_dir).collect()[0]
    approx = QUERIES["text_vocab_approx"](spark, sf_dir).collect()[0]
    assert approx["total_tokens"] == exact["total_tokens"]  # count is exact
    rel = abs(approx["vocab_size_approx"] - exact["vocab_size"]) / exact["vocab_size"]
    assert rel < 0.05, f"HLL estimate off by {rel:.1%}"


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
        rel = abs(a["n_users_approx"] - e["n_users"]) / max(e["n_users"], 1)
        assert rel < 0.05, f"{day}: HLL estimate off by {rel:.1%}"


def test_approx_percentiles_within_1pct_of_exact(spark, sf_dir):
    from mapreducecf_spark.registry import QUERIES

    exact = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_percentiles"](spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_percentiles_approx"](spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for flag, er in exact.items():
        for c in ("p50", "p90", "p99"):
            assert abs(approx[flag][c] - er[c]) <= 0.01 * abs(er[c]), (flag, c)
