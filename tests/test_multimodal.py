"""Multimodal plumbing tests: exact feature values vs a local pandas
recomputation (the rows-only query's correctness pin), Arrow batch
shape, payload pruning, and stub contracts."""

from __future__ import annotations

import pytest


def test_image_features_match_local_recompute(spark, sf_dir):
    from mapreducecf_spark.multimodal import fake_decode_rgb, media_table, image_features

    media = media_table(spark, sf_dir).limit(50)
    got = {r["media_id"]: r for r in image_features(media).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(got) == set(src)
    for mid, payload in src.items():
        img = fake_decode_rgb(payload)
        m = img.reshape(-1, 3).mean(axis=0)
        row = got[mid]
        assert row["n_bytes"] == len(payload)
        assert row["mean_r"] == pytest.approx(float(m[0]), abs=1e-12)
        assert row["mean_g"] == pytest.approx(float(m[1]), abs=1e-12)
        assert row["mean_b"] == pytest.approx(float(m[2]), abs=1e-12)


def test_audio_features_match_local_recompute(spark, sf_dir):
    import numpy as np

    from mapreducecf_spark.multimodal import audio_features, fake_decode_pcm, media_table

    media = media_table(spark, sf_dir).limit(60)
    got = {r["media_id"]: r for r in audio_features(media).collect()}
    src = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("kind = 'audio'").collect()
    }
    assert set(got) == set(src) and got
    for mid, payload in src.items():
        pcm = fake_decode_pcm(payload)
        energy_micro = int(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) * 1e6)
        zc = int(np.count_nonzero(np.diff(np.signbit(pcm))))
        assert got[mid]["energy_micro"] == energy_micro
        assert got[mid]["zero_crossings"] == zc
        assert got[mid]["n_samples"] == len(pcm)


def test_catalog_prunes_payload_from_the_scan(spark, sf_dir):
    """mm_catalog touches only metadata; the text/payload source column
    must not be read from parquet."""
    import contextlib
    import io

    from mapreducecf_spark.registry import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["mm_catalog"](spark, sf_dir).explain(mode="formatted")
    read = [ln for ln in buf.getvalue().splitlines() if "ReadSchema" in ln][0]
    assert "text" in read  # payload derives from text: it IS the scan cost here
    # frame sampling, by contrast, needs no payload at all
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["mm_frame_sample"](spark, sf_dir).explain(mode="formatted")
    # only doc_id + text-length metadata feed the explode; no Python stage
    assert "mapInPandas" not in buf.getvalue()


def test_decode_stubs_declare_their_contract(spark):
    from mapreducecf_spark.multimodal import decode_audio, decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_fake_decoder_is_deterministic_and_shaped(spark):
    import numpy as np

    from mapreducecf_spark.multimodal import FAKE_H, FAKE_W, fake_decode_rgb

    a = fake_decode_rgb(b"payload")
    b = fake_decode_rgb(b"payload")
    c = fake_decode_rgb(b"other")
    assert a.shape == (FAKE_H, FAKE_W, 3) and a.dtype == np.uint8
    assert (a == b).all()
    assert (a != c).any()


def test_payload_dedup_counts_and_pruning(spark, sf_dir):
    """Totals recomputed from the catalog; dup = rows minus distinct
    payloads, per kind."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.multimodal import media_table, mm_payload_dedup

    got = {r["kind"]: r for r in mm_payload_dedup(spark, sf_dir).collect()}
    m = media_table(spark, sf_dir).select(
        "kind", F.md5("payload").alias("fp"), F.octet_length("payload").alias("n")
    ).collect()
    from collections import defaultdict

    rows = defaultdict(list)
    for r in m:
        rows[r["kind"]].append(r)
    for kind, rs in rows.items():
        g = got[kind]
        assert g["n_media"] == len(rs)
        assert g["n_unique"] == len({r["fp"] for r in rs})
        assert g["n_dup"] == len(rs) - g["n_unique"]
        assert g["total_bytes"] == sum(r["n"] for r in rs)


def test_phash_catches_every_planted_reencode(spark, sf_dir):
    """Every planted re-encode pair (doc, doc+VOFF) must surface with
    Hamming <= 1 — byte-level payload dedup cannot see these pairs at
    all (the payloads decode differently only after the jitter)."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.multimodal import (
        PHASH_VOFF,
        mm_phash_neardup,
        phash_corpus,
    )

    planted = {
        r[0]
        for r in phash_corpus(spark, sf_dir)
        .filter(F.col("media_id") >= PHASH_VOFF)
        .select(F.col("media_id") - PHASH_VOFF)
        .collect()
    }
    pairs = mm_phash_neardup(spark, sf_dir).collect()
    found = {
        r["ida"]: r["hamming"]
        for r in pairs
        if r["idb"] == r["ida"] + PHASH_VOFF
    }
    assert planted, "corpus must plant at least one re-encode"
    assert planted <= set(found), planted - set(found)
    assert all(h <= 1 for h in found.values())


def test_audio_segments_invariants(spark, sf_dir):
    """Segment algebra: active frames ≤ total frames, longest ≤
    active, and n_segments == 0 iff n_active == 0; both VAD states
    must occur somewhere in the corpus (the threshold sits near the
    median)."""
    from mapreducecf_spark.multimodal import VAD_NFRAMES, mm_audio_segments

    rows = mm_audio_segments(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_frames"] == VAD_NFRAMES
        assert 0 <= r["n_active"] <= VAD_NFRAMES
        assert r["longest_segment"] <= r["n_active"]
        assert (r["n_segments"] == 0) == (r["n_active"] == 0)
        if r["n_segments"]:
            assert r["n_segments"] <= r["n_active"]
    assert any(r["n_active"] > 0 for r in rows)
    assert any(r["n_active"] < VAD_NFRAMES for r in rows)
