"""Super-linearity smoke: synthesize a k× replica of an sf directory
and time the hottest query families at 1× and k×, printing the ratio
table the README's performance section records.

Purpose (VERDICT r05 item 6): the 100 TB claims otherwise rest on plan
shape alone — an sf0.1-only bench cannot see a candidate-generation
stage whose output grows quadratically with corpus size. One k× run
catches any super-linear surprise: every family should scale ≲ k
(± AQE/slot noise).

Synthesis is decorrelated BY DESIGN — naive row duplication would make
every document/vector a cross-replica near-duplicate, inflating dedup
and ANN candidate volume k²× *in the data*, which would read as
engine super-linearity when it's synthesis artifact:

- all id-like keys shift by ``replica × 10_000_000`` (joins stay
  within-replica: orders⋈lineitem, orders⋈customer, …);
- document tokens get a per-replica suffix (replica corpora share no
  shingles, so near-dup structure replicates instead of cross-linking);
- embedding dimensions rotate circularly per replica (same norm
  distribution, decorrelated directions — replicas spread across LSH
  buckets instead of stacking in them);
- nation/region stay verbatim (fixed-cardinality dims);
- event timestamps stay verbatim (the time range is the schema; user
  population scales).

Usage::

    python tools/scale_smoke.py [--mult K] [--base SF_DIR] [--out DIR]

Prints one line per timed item (``name base_s scaled_s ratio``) and a
JSON tail; exits non-zero if any ratio exceeds 2×K (a generous
super-linearity alarm, not a perf target).

The query workload is a HARD {QUERY_CAP}-row cap by construction
(md5-ordered LIMIT, ``similarity.QUERY_CAP``) since r08, so the
brute/ADC/recall rows are O(corpus) like everything else and sit
under the same 2×K alarm — the former ``WORKLOAD_SCALED`` exemption
list is gone.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = 10_000_000  # per-replica id shift (all base keys < 1M)
#: embedding dimensionality — imported so a DIM change can't silently
#: corrupt the rotation (lazy import would hide the coupling)
from mapreducecf_spark.queries.similarity import DIM  # noqa: E402

#: the hot families (VERDICT r05 item 6): dedup pipeline, kNN graph +
#: consumers, CF, attribution join, peak concurrency, text TF-IDF
HOT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_clusters",
    "sim_knn_graph",
    "sim_pagerank",
    "cf_item_similarity",
    "cf_recommend_topk",
    "ts_attribution_join",
    "ts_peak_concurrency",
    "text_tfidf_top_terms",
    # r07 additions: perceptual-hash band join, SQ8 search pass,
    # robust anomaly sweep, global-rank batching audit, char-profile
    # divergence, streak sessionization
    "mm_phash_neardup",
    "sim_sq8_recall",
    "ts_anomaly_mad",
    "pipe_length_batching",
    "text_source_divergence",
    "ts_user_streaks",
    # r08 additions (VERDICT r07 item 3): the whole ANN serving /
    # audit family rides the capped query workload now — each must
    # scale ~k with the corpus (index build), not k²
    "sim_knn_brute",
    "sim_pq_encode",
    "sim_pq_adc_topk",
    "sim_pq_recall_audit",
    "sim_sq8_encode",
    "sim_ivfpq_topk",
    "sim_rp_recall",
    # r09 additions: the 1-bit Hamming audit rides the same capped
    # workload; contamination attribution joins the full train posting
    # stream against the benchmark-keyed val index; BPE packing is the
    # corpus-scan + per-shard-window shape
    "sim_binary_quant_recall",
    "pipe_contamination_attribution",
    "pipe_pack_sequences_bpe",
    # r11 additions: the second two-phase packer consumer and the
    # seam-merged (type, day) inter-arrival lag — both fixed this
    # round specifically for flatness at scale, so the smoke must
    # witness them
    "pipe_shuffle_shards",
    "ts_interarrival",
    # r13 additions: the kNN-graph CDC maintenance (old-graph build +
    # retract/merge/recompute — O(delta + affected) by design, the one
    # new op with real super-linear risk), and the two weighted-dedup
    # passes (IDF-weighted verify join; copy-replicated signature
    # index, rows × avg q)
    "sim_knn_index_cdc",
    "dedup_jaccard_weighted",
    "dedup_minhash_weighted",
    # r14 additions (VERDICT r13 next-round #4): the r13 hot rows the
    # second r13 smoke did not cover — the BPE train+apply loop
    # (iteration count is constant in data size; the smoke witnesses
    # the per-round corpus scans staying linear), the order-3 KN LM
    # (vocabulary-bounded count tables over one corpus read), the
    # benchmark-split containment decon (DF-capped inverted index),
    # and the banded MinHash ingestion probe (stateless row-wise
    # signatures against the static band index)
    "text_bpe_apply",
    "text_trigram_kn_ppl",
    "dedup_containment_benchmark",
    "stream_minhash_neardup",
    # r14 additions: the new rows with explicit scale claims — the
    # perplexity gate (linear LM-join pass + one-row percentile), the
    # embedding drift monitor (O(delta) re-scoring claim), and the
    # streaming fold-in (per-user bounded state + broadcast factors)
    "text_ppl_filter",
    "sim_embedding_drift",
    "stream_als_foldin",
    # r15 additions: the ef sweep (one widest traversal, filters per
    # point), winnowing (narrow fingerprint selection + DF-capped fp
    # join — the inverted-index quadratic risk class), and the RRF
    # fusion (capped query workload against the capped index)
    "sim_beam_ef_sweep",
    "dedup_winnowing",
    "sim_hybrid_rrf",
    "stream_winnowing_neardup",
    "cf_eval_holdout",
    "text_textrank_keywords",
    "mm_audio_fp_neardup",
    # compositions of already-smoked memoized artifacts — cheap, kept
    # for completeness
    "dedup_threshold_sweep",
    "sim_hard_negatives",
    # the edge RRF probe: stateless two-channel fan-out vs static
    # indexes (bucket-occupancy + DF-cap bounded)
    "stream_hybrid_rrf",
    # r16 additions: the KMV set algebra (pair algebra over kilobyte
    # sketches; the exact audit's user-equi-join is the only
    # corpus-sized term) and the online KMV sketch (bounded per-type
    # state; the smoke witnesses the stateful fold staying linear)
    "ts_kmv_set_algebra",
    "stream_audience_kmv",
    # per-source winnowing telemetry: one fingerprint map pass + a
    # broadcast hot flag + one groupBy — must stay linear
    "dedup_winnow_telemetry",
    # k-way KMV union: kilobyte merge + one distinct-reduce audit
    "ts_audience_union_kmv",
    # eval k-sweep: |ks| filters over the shared rec table (memoized
    # train model) — cost must track the holdout, not multiply it
    "cf_eval_k_sweep",
    # rank-sum test + its online twin: value-grid-bounded aggregation
    "ts_mannwhitney_u",
    "stream_mannwhitney_u",
    # chi-squared: one groupBy then a types×7 grid
    "ts_chi2_independence",
    "stream_chi2_independence",
]



def synthesize(spark, base: str, out: str, mult: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)

    def reps(df, fn):
        parts = [df if r == 0 else fn(df, r) for r in range(mult)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    def shift(df, r, *cols):
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.lit(r * OFF))
        return df

    plans = {
        "region": None,
        "nation": None,
        "customer": lambda d, r: shift(d, r, "c_custkey"),
        "supplier": lambda d, r: shift(d, r, "s_suppkey"),
        "part": lambda d, r: shift(d, r, "p_partkey"),
        "orders": lambda d, r: shift(d, r, "o_orderkey", "o_custkey"),
        "lineitem": lambda d, r: shift(
            d, r, "l_orderkey", "l_partkey", "l_suppkey"
        ),
        "events": lambda d, r: shift(d, r, "event_id", "user_id"),
        "documents": lambda d, r: shift(d, r, "doc_id").withColumn(
            # per-replica token suffix: replica corpora share no
            # shingles, so near-dup structure replicates within
            # replicas instead of cross-linking them
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(x, F.lit(f"q{r}")),
                ),
                " ",
            ),
        ).withColumn("n_chars", F.length("text").cast("long")),
        "embeddings": lambda d, r: shift(d, r, "vec_id").withColumn(
            # circular dimension rotation: same norms, decorrelated
            # directions (the LSH planes are per-dimension constants);
            # rotate by r mod DIM so --mult > DIM stays a valid slice
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), (r % DIM) + 1, DIM - (r % DIM)),
                F.slice(F.col("embedding"), 1, r % DIM),
            ),
        ),
    }
    for table, fn in plans.items():
        src = os.path.join(base, f"{table}.parquet")
        dst = os.path.join(out, f"{table}.parquet")
        df = spark.read.parquet(src)
        (df if fn is None else reps(df, fn)).repartition(8).write.mode(
            "overwrite"
        ).parquet(dst)


def time_suite(spark, sf_dir: str) -> dict[str, float]:
    from mapreducecf_spark.prewarm import build_shared_intermediates
    from mapreducecf_spark.registry import QUERIES

    # engine warm-ups (JVM, codegen, Arrow workers) — same as bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, float] = {}
    t0 = time.time()
    shared = build_shared_intermediates(spark, sf_dir)
    out.update({f"build:{k}": v for k, v in shared.items()})
    only = os.environ.get("SPARK_GRAFT_SMOKE_ONLY")
    queries = only.split(",") if only else HOT_QUERIES
    for name in queries:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    return out


def _timed_subprocess(sf_dir: str) -> dict[str, float]:
    """Time one directory's suite in a FRESH PROCESS. In-process
    back-to-back suites are not comparable: local-mode sessions share
    one JVM, so the second suite rides the first's compiled codegen
    classes, JIT state, and OS page cache (measured: the 5× suite ran
    FASTER than the 1× suite that preceded it in-process). A process
    per suite makes both pay identical warm-up, which time_suite's
    engine warm-ups then amortize identically."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--time-dir", sf_dir],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=5)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep", action="store_true", help="keep the synthesized dir")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated subset of HOT_QUERIES to time (targeted "
        "re-smokes of watch rows; shared builds still run)",
    )
    ap.add_argument(
        "--skip-gen",
        action="store_true",
        help="reuse an existing --out replica instead of re-synthesizing",
    )
    ap.add_argument("--time-dir", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.only:
        os.environ["SPARK_GRAFT_SMOKE_ONLY"] = args.only
    out_dir = args.out or f"/tmp/scale_smoke_x{args.mult}"

    from mapreducecf_spark import get_spark

    if args.time_dir:
        spark = get_spark(app_name="scale-smoke-suite")
        spark.sparkContext.setLogLevel("ERROR")
        t = time_suite(spark, args.time_dir)
        spark.stop()
        print(json.dumps(t, separators=(",", ":")))
        return 0

    if not args.skip_gen:
        spark = get_spark(app_name="scale-smoke-gen")
        spark.sparkContext.setLogLevel("ERROR")
        synthesize(spark, args.base, out_dir, args.mult)
        spark.stop()

    base_t = _timed_subprocess(args.base)
    scaled_t = _timed_subprocess(out_dir)

    ratios = {}
    print(f"{'item':<28}{'1x':>8}{args.mult:>7}x{'ratio':>8}")
    for k in base_t:
        r = round(scaled_t[k] / base_t[k], 2) if base_t[k] > 0 else None
        ratios[k] = r
        print(f"{k:<28}{base_t[k]:>8}{scaled_t[k]:>8}{r if r is not None else '-':>8}")
    print(
        json.dumps(
            {"mult": args.mult, "base": base_t, "scaled": scaled_t, "ratios": ratios},
            separators=(",", ":"),
        )
    )
    if not args.keep:
        shutil.rmtree(out_dir, ignore_errors=True)
    alarm = {
        k: r
        for k, r in ratios.items()
        if r is not None and r > 2 * args.mult
    }
    if alarm:
        print(f"SUPER-LINEAR ALARM (> {2*args.mult}x): {alarm}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
