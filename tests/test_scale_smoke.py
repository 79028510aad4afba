"""Invariants of the scale-smoke synthesizer (tools/scale_smoke.py):
the k× replica must be decorrelated BY CONSTRUCTION, or the smoke
reads synthesis artifact as engine super-linearity."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_synthesize_is_decorrelated(spark, sf_dir, tmp_path):
    import scale_smoke

    out = str(tmp_path / "x2")
    scale_smoke.synthesize(spark, sf_dir, out, mult=2)

    # row counts scale exactly k× (dims verbatim)
    for t, k in (("orders", 2), ("documents", 2), ("embeddings", 2), ("nation", 1)):
        n0 = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
        n1 = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        assert n1 == k * n0, (t, n0, n1)

    # replica keys are disjoint and joins stay within-replica: every
    # scaled lineitem still finds its order
    o = spark.read.parquet(os.path.join(out, "orders.parquet"))
    l = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    assert l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").count() == 0

    # replica documents share no tokens with the originals (the salt):
    # shingle/minhash candidate volume must not cross replicas
    d = spark.read.parquet(os.path.join(out, "documents.parquet"))
    from pyspark.sql import functions as F

    toks = d.select(
        (F.col("doc_id") >= scale_smoke.OFF).alias("rep"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    shared = (
        toks.filter("rep").select("tok").distinct()
        .join(toks.filter("NOT rep").select("tok").distinct(), "tok")
        .count()
    )
    assert shared == 0, f"{shared} tokens shared across replicas"

    # rotated embeddings keep their norm (same magnitude distribution)
    e = spark.read.parquet(os.path.join(out, "embeddings.parquet"))
    base_vs_rot = (
        e.filter(F.col("vec_id") < scale_smoke.OFF)
        .select(F.col("vec_id"), F.col("embedding").alias("e0"))
        .join(
            e.filter(F.col("vec_id") >= scale_smoke.OFF).select(
                (F.col("vec_id") - scale_smoke.OFF).alias("vec_id"),
                F.col("embedding").alias("e1"),
            ),
            "vec_id",
        )
        .select(
            F.abs(
                F.aggregate("e0", F.lit(0.0), lambda a, x: a + x * x)
                - F.aggregate("e1", F.lit(0.0), lambda a, x: a + x * x)
            ).alias("d")
        )
        .agg(F.max("d").alias("mx"))
        .collect()[0]["mx"]
    )
    assert base_vs_rot < 1e-6, base_vs_rot
