"""Multimodal columns — image/audio/video as opaque ``binary`` payloads
with typed metadata, plus the Spark-side plumbing of a decode /
feature-extract / frame-sample pipeline (north-star surface; the
reference is text-only, SURVEY.md §2.1).

The decode step itself is STUBBED: the real image/audio codecs are not
in this container, so :func:`decode_image` / :func:`decode_audio` raise
``NotImplementedError`` with their exact contract, and the pipelines
run on :func:`fake_decode_rgb` — a deterministic md5-keystream decoder
with the same output shape a real codec would produce. Everything
around the stub (schema, Arrow batching, UDF signatures, partitioning)
is real and tested.

100 TB design notes:

- Payloads stay **opaque bytes end-to-end**: the catalog/stat queries
  never decode, so Catalyst prunes the payload column away whenever a
  query doesn't touch it — the usual way a 100 TB media table is 99%
  cold bytes.
- Python is entered ONCE, via ``mapInPandas`` (Arrow batches, zero-copy
  into numpy), only for the decode/feature stage; upstream filters and
  downstream aggregations stay JVM-side. Batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  holds O(batch × decoded_size), independent of partition size.
- Frame sampling multiplies rows, not bytes: it emits (media_id,
  frame_idx, fingerprint), never materialized frames — the explode is
  driven by metadata arithmetic, no decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecf_spark.registry import register
from mapreducecf_spark.sources import load_table

if TYPE_CHECKING:
    import pandas as pd

#: decoded-image geometry of the fake decoder (a real decoder reads it
#: from the payload header; ours fixes it so tests are deterministic)
FAKE_W, FAKE_H = 8, 8
FRAME_EVERY_MS = 40  # 25 fps sampling grid

KINDS = ("image", "audio", "video")
MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


# ---------------------------------------------------------------------
# media synthesis (testdata ships no media table; derive one
# deterministically from documents so every SF has a media corpus)
# ---------------------------------------------------------------------
def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, kind, payload: binary, meta: struct) — payload is the
    document text's bytes (opaque to everything downstream), kind
    cycles by id, duration scales with payload size."""
    d = load_table(spark, sf_dir, "documents")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    n = F.octet_length(F.col("payload"))
    return (
        d.select(
            F.col("doc_id").alias("media_id"),
            kind.alias("kind"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
        .withColumn(
            "meta",
            F.struct(
                F.lit(FAKE_W).alias("width"),
                F.lit(FAKE_H).alias("height"),
                F.lit(16000).alias("sample_rate"),
                (n * 10).cast("int").alias("duration_ms"),
            ),
        )
    )


# ---------------------------------------------------------------------
# decoders: real contracts, stubbed codecs, deterministic fake
# ---------------------------------------------------------------------
def decode_image(payload: bytes) -> "object":
    """Decode an encoded image to an HxWx3 uint8 array.

    STUB: real codecs (PIL/cv2) are not available in this environment.
    A deployment implements this body (and nothing else changes — the
    pipeline plumbing is codec-agnostic)."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_decode_rgb for the deterministic test decoder"
    )


def decode_audio(payload: bytes) -> "object":
    """Decode encoded audio to a float32 PCM array. STUB — see
    decode_image."""
    raise NotImplementedError(
        "audio codec not available in this environment; "
        "pipeline plumbing is exercised via fake_decode_rgb"
    )


def fake_decode_pcm(payload: bytes, n_samples: int = 256):
    """Deterministic stand-in audio decoder: md5 keystream expanded to
    ``n_samples`` int16 PCM — same dtype/shape contract as a real
    codec (see decode_audio)."""
    import numpy as np

    need = n_samples * 2
    out = bytearray()
    counter = 0
    seed = hashlib.md5(b"pcm:" + payload).digest()
    while len(out) < need:
        out += hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype="<i2").astype(np.int64)


def fake_decode_rgb(payload: bytes, w: int = FAKE_W, h: int = FAKE_H):
    """Deterministic stand-in decoder: an md5 keystream over the payload
    expanded to h*w*3 uint8 — same dtype/shape contract as a real
    decode, bit-stable across runs and engines."""
    import numpy as np

    need = h * w * 3
    out = bytearray()
    counter = 0
    seed = hashlib.md5(payload).digest()
    while len(out) < need:
        out += hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------
# pipeline stages
# ---------------------------------------------------------------------
_FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, "
    "mean_r double, mean_g double, mean_b double"
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode (fake) + per-channel mean features via ``mapInPandas`` —
    ONE Python stage, Arrow-batched; the payload never round-trips back
    to the JVM (only the tiny feature row does)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            feats = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    # failed fetch/transcode lands as a NULL payload; the
                    # decode stage DROPS it (a real decoder's error path),
                    # it must never kill the Arrow batch
                    continue
                img = fake_decode_rgb(bytes(payload))
                m = img.reshape(-1, 3).mean(axis=0)
                feats.append(
                    (int(mid), kind, len(payload), float(m[0]), float(m[1]), float(m[2]))
                )
            yield pd.DataFrame(
                feats,
                columns=["media_id", "kind", "n_bytes", "mean_r", "mean_g", "mean_b"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, _FEATURE_SCHEMA
    )


def frame_samples(media: DataFrame, every_ms: int = FRAME_EVERY_MS) -> DataFrame:
    """Sample frame slots from video metadata — pure JVM arithmetic
    (sequence + explode on duration), no decode: row count is
    duration/every_ms, payload bytes are never copied. The fingerprint
    stands in for the decoded frame a real pipeline would hand to the
    next stage."""
    # guard: a clip shorter than the sampling step yields no frames
    # (sequence(0, -1) would count DOWN, not produce an empty array)
    v = media.filter(
        (F.col("kind") == "video") & (F.col("meta.duration_ms") >= every_ms)
    )
    idx = F.explode(
        F.sequence(F.lit(0), F.floor(F.col("meta.duration_ms") / every_ms).cast("int") - 1)
    ).alias("frame_idx")
    return v.select("media_id", idx, F.col("meta.duration_ms").alias("duration_ms")).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ms"),
        F.md5(F.concat_ws(":", "media_id", "frame_idx")).alias("frame_fingerprint"),
    )


# ---------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------
@register(
    "mm_catalog",
    oracle="""
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       octet_length(encode(text)) AS n_bytes,
       CAST(octet_length(encode(text)) * 10 AS INTEGER) AS duration_ms
FROM documents
""",
)
def mm_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media catalog scan: metadata only — the payload column is pruned
    out of the parquet read entirely (the common fast path over a media
    lake)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


@register("mm_image_features")  # rows-only: decode is Python-side by design
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over the synthesized media corpus. No SQL
    oracle (the decode stage is the one deliberately-Python step);
    pytest pins exact values against a local pandas recomputation."""
    return image_features(media_table(spark, sf_dir))


_AUDIO_SCHEMA = (
    "media_id bigint, n_samples int, energy double, zero_crossings int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio twin of image_features: fake-PCM decode + RMS energy +
    zero-crossing count per clip, one Arrow-batched Python stage."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue  # failed fetch: decode drops, never crashes
                pcm = fake_decode_pcm(bytes(payload))
                energy = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
                zc = int(np.count_nonzero(np.diff(np.signbit(pcm))))
                rows.append((int(mid), len(pcm), round(energy, 6), zc))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "energy", "zero_crossings"]
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(batches, _AUDIO_SCHEMA)


@register("mm_audio_features")  # rows-only: decode is Python-side by design
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over the synthesized corpus — the
    audio leg of the decode/feature plumbing (pytest pins exact values
    against a local recomputation, like the image leg)."""
    return audio_features(media_table(spark, sf_dir))


@register(
    "mm_frame_sample",
    oracle=f"""
SELECT media_id, frame_idx,
       frame_idx * {FRAME_EVERY_MS} AS frame_ms,
       md5(media_id || ':' || frame_idx) AS frame_fingerprint
FROM (
  SELECT doc_id AS media_id,
         unnest(range(octet_length(encode(text)) * 10 // {FRAME_EVERY_MS}))
           AS frame_idx
  FROM documents
  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) * 10 >= {FRAME_EVERY_MS}) t
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-slot sampling for the video subset (metadata arithmetic +
    explode; fingerprints are md5 so the oracle replays exactly)."""
    return frame_samples(media_table(spark, sf_dir))


@register(
    "mm_payload_dedup",
    oracle="""
WITH cat AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS kind,
         md5(text) AS payload_fp,  -- payload IS utf8(text): same bytes hashed
         octet_length(encode(text)) AS n_bytes
  FROM documents)
SELECT kind,
       count(*) AS n_media,
       CAST(count(DISTINCT payload_fp) AS BIGINT) AS n_unique,
       CAST(count(*) - count(DISTINCT payload_fp) AS BIGINT) AS n_dup,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes
FROM cat GROUP BY kind
""",
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical media dedup telemetry per modality — the first
    pass every media lake runs (identical bytes under different ids are
    the dominant dup class for scraped assets): md5 over the RAW
    payload bytes, then duplicate counts and reclaimable volume per
    kind. A perceptual-hash pass (the near-dup analogue) would slot in
    exactly where the md5 is; the Spark-side shape is identical.

    100 TB shape: the payload is touched ONCE by the md5 projection
    folded into the scan — the shuffle carries (kind, 16-byte fp) pairs
    only, never media bytes, so dedup cost is scan-bound regardless of
    asset size."""
    m = media_table(spark, sf_dir)
    cat = m.select(
        "kind",
        F.md5("payload").alias("payload_fp"),
        F.octet_length("payload").alias("n_bytes"),
    )
    return cat.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.count_distinct("payload_fp").cast("bigint").alias("n_unique"),
        (F.count("*") - F.count_distinct("payload_fp")).cast("bigint").alias("n_dup"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
    )
