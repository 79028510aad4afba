"""Shared-intermediate builder for honest bench attribution.

Several query families session-memoize one expensive intermediate
(``memo.session_memo``): the shingle index, the MinHash verified-pair
table, the hyperplane-LSH verified pairs, the kNN edge list, the
k-means codebook, the CF item-item model. The bench loop runs each
registered query once in one session, so WITHOUT this module the first
family member to run absorbs its family's whole build cost and every
later member reads ~0 s — r05's ``sim_pagerank`` read 7.30 s (charged
the kNN-edge build) while standalone it is 1.36 s cold / 0.57 s warm.

``build_shared_intermediates`` materializes every memoized family
artifact up front, individually timed, so the bench payload can report
build costs as a named ``shared_build`` phase and per-query numbers
mean "consume the shared artifact" — the shape a 100 TB deployment
actually has, where these artifacts are materialized tables and every
query is a consumer.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _run(df: DataFrame) -> None:
    # noop write = full execution, zero driver transfer (same sink the
    # bench loop uses); evaluating the persisted plan fills the cache
    df.write.format("noop").mode("overwrite").save()


def build_shared_intermediates(
    spark: SparkSession, sf_dir: str
) -> dict[str, float]:
    """Build + persist every session-memoized family artifact for
    ``sf_dir``, returning per-artifact wall seconds. Idempotent: a
    second call only re-touches the caches."""
    from mapreducecf_spark import multimodal as _mm
    from mapreducecf_spark.queries import cf, dedup, pipeline, similarity, text, timeseries

    builds: dict[str, Callable[[], None]] = {
        # dedup family: shingle index -> capped index / MinHash sigs ->
        # verified near-dup pairs (consumed by dedup_minhash_lsh,
        # dedup_clusters, dedup_pipeline_keep, dedup_minhash_calibration)
        "shingle_index": lambda: _run(dedup.shingles_df(spark, sf_dir)),
        # lowered (doc, tok, c) counts — TF-IDF + BM25 both start here
        "token_counts": lambda: _run(text.token_counts(spark, sf_dir)),
        # decontamination keys its own k — a SEPARATE memo entry
        # (("shingles", sf_dir, DECON_K)); without this row its 2-3 s
        # build lands on pipe_decontaminate's bench slot (r06 verdict
        # item 4 — the per-parameter variant the family-name guard
        # used to miss)
        "decon_shingles": lambda: _run(
            dedup.shingles_df(spark, sf_dir, k=pipeline.DECON_K)
        ),
        "capped_shingles": lambda: _run(dedup.capped_shingles(spark, sf_dir)),
        # raw winnowing selection (r16): the one corpus map pass the
        # capped index AND the per-source telemetry derive from
        "winnow_sel": lambda: _run(dedup.winnow_sel_memo(spark, sf_dir)),
        # winnowing fingerprint index (r15): dedup_winnowing join sides
        # + the stream_winnowing_neardup static probe index
        "winnow_fps": lambda: _run(dedup.winnow_fps_capped(spark, sf_dir)),
        # per-shard Bloom filter words (r15 continuation):
        # dedup_bloom_shards pairwise popcounts + the
        # stream_bloom_dedup edge probe's static broadcast side
        "bloom_items": lambda: _run(dedup.bloom_shard_items(spark, sf_dir)),
        "bloom_words": lambda: _run(dedup.bloom_shard_words(spark, sf_dir)),
        # line-level dedup family (r13): the segment tiling and its
        # keep-first index (dedup_segment_exact / _hotlist /
        # _boundary_audit batch + the stream_segment_dedup probe)
        "segments": lambda: _run(dedup.segments_df(spark, sf_dir)),
        "segment_keepers": lambda: _run(dedup.segment_keeper_index(spark, sf_dir)),
        "minhash_sigs": lambda: _run(dedup._minhash_sigs_memo(spark, sf_dir)),
        "minhash_pairs": lambda: _run(dedup.dedup_minhash_lsh(spark, sf_dir)),
        # SimHash fingerprint+chunk table (dedup_simhash_pairs both
        # join sides + lsh_bucket_skew)
        "simhash_chunks": lambda: _run(dedup.simhash_chunks(spark, sf_dir)),
        # embedding band-bucket table at the adaptive width (both
        # _lsh_pairs thresholds + lsh_bucket_skew) — build BEFORE the
        # pair tables so their rows mean candidate-join + verify only
        "ebands": lambda: _run(similarity.ebands_table(spark, sf_dir)),
        # embedding similarity family: verified pair tables at both
        # thresholds (sim_lsh_pairs / dedup_embedding_cosine /
        # pipe_dedup_keep_best) and the kNN edge list (sim_knn_graph /
        # sim_pagerank / sim_label_propagation / sim_triangle_count)
        "lsh_pairs_sim": lambda: _run(
            similarity._lsh_pairs(spark, sf_dir, similarity.SIM_THRESHOLD)
        ),
        "lsh_pairs_neardup": lambda: _run(
            similarity._lsh_pairs(spark, sf_dir, similarity.NEARDUP_THRESHOLD)
        ),
        "knn_graph": lambda: _run(similarity.sim_knn_graph(spark, sf_dir)),
        # layer-1 member graph (r13 perf item): the banded build is the
        # dominant cost of sim_beam_knn_layered's slot
        "l1_member_graph": lambda: _run(similarity.l1_member_graph(spark, sf_dir)),
        # k-means codebook: trains eagerly (driver-memoized centroid
        # list) — consumed by sim_ivf_knn / sim_ann_recall /
        # sim_silhouette / sim_kmeans_codebook
        "kmeans_codebook": lambda: _run(similarity.sim_kmeans_codebook(spark, sf_dir)),
        # corpus IVF list assignment (r18, VERDICT r17 #5): ONE Arrow
        # scoring scan shared by nine consumers (IVF/IVFPQ search,
        # sweeps, semantic dedup, drift, the residual-PQ build)
        "ivf_assign": lambda: _run(
            similarity._kmeans_codebook(
                spark,
                similarity._with_norm(similarity.load_vectors(spark, sf_dir)),
                sf_dir,
            )[1]
        ),
        # capped cluster membership: the semantic-dedup index
        # (dedup_semantic_ivf pairwise + stream_semantic_dedup probe)
        "semdedup_members": lambda: _run(similarity._capped_members(spark, sf_dir)),
        # CF: the fused full+train co-occurrence pair counts (r18) —
        # the ONE heavy self-join both the shipped and the eval model
        # consume — then neighbor_lists (interactions ->
        # item_similarity -> pruned serving model)
        "cf_pairs": lambda: _run(cf.pair_counts(spark, sf_dir)),
        "cf_model": lambda: _run(cf.neighbor_lists(spark, sf_dir)),
        # fold-in serving model: the cohort-excluded trained item
        # factors both fold-in rows (batch + streaming) broadcast
        "cf_foldin_model": lambda: _run(cf.foldin_item_factors(spark, sf_dir)),
        # train-split eval model (r15 continuation): cf_eval_holdout +
        # cf_eval_baselines both score against it; without this row the
        # ablation re-paid the train co-occurrence pass
        "cf_eval_train": lambda: _run(cf._eval_train(spark, sf_dir)),
        "cf_eval_model": lambda: _run(cf._eval_model(spark, sf_dir)),
        # the eval family's memoized CONSUMPTION artifacts (r18,
        # VERDICT r17 #2): the (u, n_test) base and the top-K scoring
        # pass holdout/baselines/k-sweep all read
        "cf_eval_base": lambda: _run(cf._eval_base(spark, sf_dir)),
        "cf_eval_recs": lambda: _run(cf._eval_recs(spark, sf_dir)),
        # perceptual-hash fingerprint table (both sides of the
        # mm_phash_neardup band join)
        "phash_chunks": lambda: _run(_mm.phash_chunks(spark, sf_dir)),
        # audio envelope fingerprints (r15): mm_audio_fp_neardup's
        # banded join reads both sides from this cache
        "audio_fp_chunks": lambda: _run(_mm.audio_fp_chunks(spark, sf_dir)),
        # residual IVF-PQ coarse residual vectors (r13) — BEFORE the
        # code tables since r18: the fused trainer consumes them
        "pq_res_vectors": lambda: _run(similarity._residual_vectors(spark, sf_dir)),
        # PQ code tables. pq_codes' slot carries the FUSED raw+residual
        # codebook training (one shared job chain since r18 — VERDICT
        # r17 #5); pq_res_codes is encode-only on top of it
        "pq_codes": lambda: _run(similarity.pq_codes(spark, sf_dir)),
        "pq_res_codes": lambda: _run(similarity.pq_res_codes(spark, sf_dir)),
        # exact brute-force truth: ground truth of all four recall
        # audits (IVF, PQ, SQ8, JL) + its own graded query
        "knn_brute": lambda: _run(similarity.sim_knn_brute(spark, sf_dir)),
        # ADC search result (graded query + PQ recall audit)
        "pq_adc": lambda: _run(similarity.sim_pq_adc_topk(spark, sf_dir)),
        # user-user CF model (the transposed-pair build is the heavy
        # half of cf_user_similarity)
        "cf_user_model": lambda: _run(cf.cf_user_similarity(spark, sf_dir)),
        # robust median/MAD baseline (batch sweep + streaming alerts)
        "mad_stats": lambda: _run(timeseries.mad_stats(spark, sf_dir)),
    }
    timings: dict[str, float] = {}
    for name, fn in builds.items():
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 2)
    return timings
