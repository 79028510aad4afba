"""Unit tests for queries.timeseries — planted-signal guarantees the
parity gate can't see (exact decomposition recovery, reconstruction
identities)."""

from __future__ import annotations
def test_seasonal_decompose_recovers_planted_daily_pattern(spark, monkeypatch):
    """Planted pure daily seasonality (no trend drift): a repeating
    24-hour count pattern decomposes EXACTLY — any centered 24-row
    window covers each hour-of-day once, so trend is the flat daily
    mean, seasonal is the pattern minus that mean (exact micro ints on
    this dyadic pattern), and the residual is identically zero on
    every interior row."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    pattern = [10 + (6 if 8 <= h <= 18 else 0) + (3 if h == 12 else 0) for h in range(24)]
    rows, eid = [], 0
    t0 = dt.datetime(2024, 3, 1)
    for day in range(3):
        for h in range(24):
            for _ in range(pattern[h]):
                rows.append(
                    (eid, t0 + dt.timedelta(days=day, hours=h, minutes=7), 1, "view", 1.0, None)
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)

    out = sorted(
        tsq.ts_seasonal_decompose(spark, "-decomp").collect(), key=lambda r: r["hb"]
    )
    # 72 spine hours, 23 edge rows dropped
    assert len(out) == 72 - 23
    mean = sum(pattern) / 24.0  # dyadic here, so every micro is exact
    for r in out:
        h = r["hb"].hour
        assert r["n"] == pattern[h]
        assert r["trend_micro"] == round(mean * 1_000_000)
        assert r["seasonal_micro"] == round((pattern[h] - mean) * 1_000_000)
        assert r["resid_micro"] == 0


def test_seasonal_decompose_reconstruction_on_corpus(spark, sf_dir):
    """Corpus-level identity: trend + seasonal + resid reconstructs the
    observed count EXACTLY in micro units on every interior row, and
    the emitted domain is exactly the full-window interior of the
    gap-filled spine (contiguous hours, 23 fewer than the span)."""
    from mapreducecf_spark.registry import QUERIES

    rows = sorted(
        QUERIES["ts_seasonal_decompose"](spark, sf_dir).collect(),
        key=lambda r: r["hb"],
    )
    assert rows
    for r in rows:
        assert (
            r["trend_micro"] + r["seasonal_micro"] + r["resid_micro"]
            == r["n"] * 1_000_000
        ), "reconstruction must be EXACT in micro units"
    span = (rows[-1]["hb"] - rows[0]["hb"]).total_seconds() / 3600
    assert len(rows) == int(span) + 1, "interior must be contiguous hourly"
