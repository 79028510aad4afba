"""Regenerate PLANS.md: formatted physical plans for the headline
queries, annotated with what to look for. Run after plan-affecting
changes; tests/test_plans.py asserts the properties, this file makes
them reviewable. Usage: python tools/dump_plans.py [sf_dir]"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINERS = {
    "wordcount": "partial->final HashAggregate (map-side combine the reference lacks); "
    "one Exchange on the word",
    "q1_pricing_summary": "filter pushed into the parquet scan (PushedFilters), "
    "pruned ReadSchema, partial aggregation",
    "q3_shipping_priority": "TakeOrderedAndProject (top-k, no global sort); "
    "no fact-scale broadcast hints",
    "dedup_minhash_lsh": "banded candidate equi-join, array-intersect verify; "
    "no CartesianProduct anywhere",
    "sim_knn_brute": "query batch broadcast (BroadcastNestedLoopJoin is the "
    "correct plan: one streaming pass over the big side)",
    "sim_ivf_knn": "fine search is an equi-join on the list id "
    "(partition pruning at scale)",
    "ts_asof_join": "union + running window: single Exchange on user_id, "
    "no per-row probe join",
    "ts_range_join": "bucketed interval join: hash equi-join on the "
    "5-minute bucket, never a theta join",
    "sim_knn_graph": "LSH-bucketed kNN graph: FlatMapGroupsInPandas per "
    "(band, bucket) — per-bucket matmul, no driver collect, no all-pairs",
    "dedup_simhash_pairs": "chunk equi-join CARRIES both fingerprints; "
    "Hamming verify is a bit_count projection in the join output — no "
    "candidate materialization, distinct only over verified pairs",
    "q8_market_share": "nation/region broadcast; conditional-sum share "
    "computed in ONE aggregation pass over the joined fact",
    "ts_funnel_stages": "ordered funnel as ONE groupBy(user) + JVM-side "
    "array fold — not one shuffle per stage; oracle states the 4-join "
    "semantics, the plan does not pay them",
    "ts_multi_rollup": "hour/day/month from ONE scan: day and month "
    "re-aggregate the cached hourly partials (InMemoryTableScan), "
    "hierarchical-rollup style",
    "text_tfidf_top_terms": "corpus exploded once into cached (doc, tok) "
    "counts; df-agg broadcast back; WindowGroupLimit = per-partition "
    "partial top-k",
    "sim_pagerank": "fixed-point BIGINT power iteration: per-round "
    "equi-join + partial-agg on (id, bigint) pairs only; bitwise-"
    "deterministic across engines and cluster topologies",
    "ts_peak_concurrency": "distributed two-phase prefix sum: the "
    "corpus-sized window is DAY-partitioned; the only unpartitioned "
    "window runs over the one-row-per-day offset table, broadcast back",
    "pipe_oov_rate": "vocab built by TakeOrderedAndProject (partial "
    "top-k, no single-partition window); the probe is a HINTED "
    "broadcast join (VOCAB_SIZE rows by construction) — the corpus "
    "side never shuffles for the lookup",
    "join_bucketed_colocated": "both scans arrive bucketed on the join "
    "key: SortMergeJoin with ZERO Exchange below it — the only shuffle "
    "is the final segment rollup",
    "sink_partitioned_roundtrip": "day predicate lands in "
    "PartitionFilters: the scan lists 7 of 30 day directories; "
    "dataFilters stays empty",
    "agg_salted_global": "two-phase skew-safe aggregate: "
    "(key, salt) partial -> key final; second Exchange moves only "
    "groups × salts rows",
    "pipe_card_diff": "two single-scan card builds, each partial-agg "
    "only; 1-row × 1-row broadcast cross join, stack() unpivot — "
    "constant-size tail regardless of corpus",
    "cf_item_similarity": "basket self-join is an EQUI-join on the "
    "user (capped at BASKET_CAP interactions/user — pair volume "
    "linear in users); co-occurrence partial-aggs map-side; neighbor "
    "lists via per-item window top-k",
    "cf_association_rules": "rule arithmetic over the memoized pair "
    "model (InMemoryTableScan when a family member ran first) + one "
    "broadcast 1-row user count; top-k by lift is "
    "TakeOrderedAndProject, no global sort",
    "ts_attribution_join": "interval self-join with a user_id EQUALITY "
    "— hash join with the time range as residual condition, never a "
    "nested-loop probe; the same builder runs as the stream-stream "
    "join (stream_attribution_join)",
    "sim_triangle_count": "edge-edge-edge equi-join chain over the "
    "memoized kNN edge list; degree/wedge counts are partial aggs; "
    "all-integer output",
    "text_bpe_merge_step": "pair-explode is scan-pipelined narrow work; "
    "one partial-agg Exchange on the bounded pair alphabet; top-k is "
    "TakeOrderedAndProject",
    "pipe_incremental_dedup": "increment probe joins the fingerprint "
    "index on md5 keys (uniform, skew-free); AQE broadcasts the "
    "increment side when it fits",
    "sim_label_propagation": "per-round vote = edges ⋈ (id, int-label) "
    "+ partial-agg + per-node window top-1; embeddings shuffle only "
    "during edge construction",
    "dedup_semantic_ivf": "SemDeDup: cid-equi-join of cap-windowed "
    "cluster members (never all-pairs); codebook assignment is one "
    "Arrow map stage over the vector scan",
    "sim_bfs_hops": "frontier rounds are equi-join + anti-join over "
    "checkpointed (LogicalRDD) rounds — the returned plan scans "
    "materialized hops, not a rounds-deep join tower",
    "pipe_sample_priority": "hash math inside the scan projection, one "
    "Exchange, WindowGroupLimit partial top-k per group",
    "ts_props_variant": "parse_json once per row into VARIANT; typed "
    "variant_get extraction feeds a partial-agg rollup",
    "sim_lsh_pairs": "CORPUS-ADAPTIVE band keyspace (r07): bands/rows "
    "derive from the vector count so candidate volume stays ~linear; "
    "candidate generation is an equi-join on (band, bkey) over the "
    "memoized band table (InMemoryTableScan)",
    "sim_pq_encode": "PQ encode is a ZERO-Exchange scan projection: "
    "codebook literals broadcast in the closure, per-subspace argmin "
    "is row-local expression work",
    "sim_pq_adc_topk": "ADC search: code table exploded once, LUT "
    "(queries x M x K) BroadcastHashJoin on (s, code), partial-agg "
    "sums, per-query WindowGroupLimit — database embeddings never "
    "touched at query time",
    "pipe_quality_logreg": "model serving as a scan-side map: feature "
    "engineering + weight dot product fused into the projection, no "
    "Exchange anywhere",
    "pipe_apply_changes": "MERGE INTO expansion: ONE key equi-join "
    "(full outer) + row-level CASE projection — the Delta/Iceberg "
    "MERGE plan without the table format",
    "text_zipf_fit": "two-phase global rank (r07): range-repartition + "
    "partitioned window + O(P^2) offset join replaces the single-task "
    "unpartitioned WindowExec",
    "ts_trending_events": "hourly partial-agg rollup, then a PER-HOUR "
    "partitioned rank (WindowGroupLimit) — no global sort at any "
    "scale; the stream twin ranks the drained rollup identically",
    "sink_zorder_roundtrip": "two-dim box over the Z-clustered copy: "
    "BOTH key predicates land in PushedFilters (plan-time literal "
    "bounds); the Morton layout shows only in per-file stat "
    "rectangles, never in the answer",
    "ts_anomaly_mad": "two-pass robust sweep: exact-percentile stats "
    "reduce pass 1; pass 2 re-scans with the tiny stats BROADCAST — "
    "raw events never shuffle for the join",
    "pipe_drift_psi": "decile boundaries are a 1-row broadcast into "
    "both snapshot scans; binning is size(filter(...)) — no explode; "
    "PSI total is exact integer math over per-bin micro terms",
    "mm_phash_neardup": "fingerprints exit Python as 4 ints/image; "
    "band equi-join CARRIES the chunks so Hamming verify is a "
    "bit_count projection — same no-candidate-materialization shape "
    "as dedup_simhash_pairs",
    "sim_sq8_encode": "int8 encode is a ZERO-Exchange scan projection "
    "(per-dim grid as plan-time literals) — the SQ sibling of the PQ "
    "encode plan",
    "sim_rp_recall": "JL projection fused into the scan (±1 literal "
    "folds); query batch BROADCAST; per-query WindowGroupLimit rank",
    "cf_user_similarity": "transposed CF: pair generation is an "
    "EQUI-join on the item (md5 pop-cap per item bounds hot items); "
    "norms join tiny aggregates; per-user window top-k",
    "ts_audience_overlap": "pairwise intersections off the DISTINCT-"
    "reduced (type, user) table — the self-join input is users x "
    "types, not events; HLL sketches merge per pair",
    "pipe_incremental_agg": "materialized-view maintenance: "
    "old-aggregate ∪ signed delta rows -> one re-aggregate; the NEW "
    "snapshot is never rescanned in full",
    "mm_audio_segments": "Arrow decode+framing emits 3 ints/frame; "
    "segmentation is JVM gaps-and-islands (window + groupBy) over "
    "the tiny frame table",
    "sim_ivfpq_topk": "IVF-PQ composed: memoized codes + assignment "
    "(InMemoryTableScan), broadcast probes and LUT; the only "
    "data-sized join is the candidate equi-join on the list id",
    "join_dynamic_partition_pruning": "dynamicpruning expression in "
    "the fact scan's PartitionFilters — runtime partition elimination "
    "through the broadcast dim join",
    "pipe_length_batching": "two range-partitioned two-phase ranks, "
    "no single-task window; strategies union into one partial-agg",
    "text_bm25_topk": "BM25 (r08): memoized token counts, bounded "
    "query-term workload broadcast into the posting join, per-term "
    "partitioned rank (WindowGroupLimit, no global sort)",
    "sim_pq_encode": "PQ encode (r08): one Arrow mapInPandas batch "
    "argmin over the broadcast codebook tensor — zero Exchange, no "
    "per-row expression fold",
    "cf_als_factors": "factorization sweep (r08): wide factor tables, "
    "each half-sweep one equi-join chain + one partial-agg groupBy; "
    "all-integer fixed point",
    "sim_beam_knn": "beam-search ANN (r08): beam broadcast every hop, "
    "embeddings probed only by node-id equi-join; per-hop lineage cut",
    "pipe_pack_sequences_bpe": "tokenizer-aware packing (r09; two-phase "
    "r10): BPE-ish lengths via one JVM regexp_count in the same scan "
    "that projects the shard/order keys; ONE corpus Exchange on "
    "(shard, md5-prefix sub-bucket) + two tiny partial-agg bucket "
    "totals broadcast back — no task owns a whole shard",
    "ts_interarrival": "per-type inter-arrival stats (r11): lag "
    "sub-partitioned by (event_type, day), day seams merged via a "
    "calendar-bounded broadcast table — no unbounded per-key window",
    "sim_kmeans_codebook": "IVF codebook (r11): k-means|| seeding — "
    "per-round Arrow d2 scan (vectors never shuffle), integer "
    "Bernoulli picks, O(k) collects — then Lloyd rounds as partial-agg "
    "rollups of (cid, dim) cells",
    "pipe_contamination_semantic": "semantic decon report (r11): "
    "train x val pairs inside SemDeDup clusters (cid equi-join over "
    "the capped memoized index), rounded-cosine verify, partial-rank "
    "top-3 examples, totals broadcast",
    "dedup_containment_search": "containment top-k (r11): md5-capped "
    "query batch broadcast through the DF-capped inverted shingle "
    "index; integer-only rank (shared DESC); signature estimate via "
    "broadcast query sigs + equi-join on doc",
    "pipe_contamination_attribution": "per-source decon report (r09): "
    "(sh_key, benchmark)-distinct val postings bound shingle fan-out; "
    "sources attach to the already-small contaminated set, totals "
    "join broadcasts; examples partial-rank top-3 (WindowGroupLimit)",
    "sim_binary_quant_recall": "1-bit recall audit (r09): integer-micro "
    "sign threshold (floor(x*1e6)*n > sum) — one narrow agg for the "
    "per-dim sums, Arrow Hamming pass under the 32-query cap",
    "dedup_clusters": "star-contraction rounds (r09): skew-safe salted "
    "partial-agg min + salted join-back — no per-key window, a "
    "mega-component hub cannot serialize one task",
    "text_ppl_filter": "perplexity gate (r14): the p90 cutoff is a "
    "one-row percentile aggregate broadcast back over the scored docs "
    "(BroadcastNestedLoopJoin); worst-offender pick is a per-source "
    "window — no rangepartitioning (global sort) anywhere",
    "sim_embedding_drift": "embedding drift (r14): both snapshot "
    "assignments read materialized-once LogicalRDDs (no consumer "
    "re-runs the Arrow scoring); per-cluster count joins broadcast "
    "(nlist-bounded); PSI math over nlist rows",
    "pipe_token_apportion": "Hamilton apportionment (r14): one "
    "partial-agg corpus scan; bigint div/mod windows over "
    "one-row-per-source — never a corpus sort",
    "dedup_winnowing": "winnowing fingerprints (r15): selection is "
    "pure narrow array arithmetic (zip_with-folded shifted slices — "
    "no window function, no per-doc sort); pairing one fp equi-join "
    "on the memoized DF-capped index",
    "sim_hybrid_rrf": "RRF hybrid retrieval (r15): dense channel = "
    "memoized brute top-k; lexical channel broadcasts the 32 query "
    "docs' shingles into the capped inverted index; fusion is a "
    "bigint-literal div sum over a few hundred rows",
    "cf_eval_holdout": "CF holdout eval (r15): train-split model "
    "through the shipped builders; scoring |batch|×basket×K; metric "
    "joins touch K-row-per-user tables with literal rank weights",
    "sim_ivf_code_budget_sweep": "code-budget × nprobe frontier (r15): "
    "one widest-probe candidate pass scored three ways; 12 cells are "
    "filters + re-ranks over one localCheckpointed wide table",
    "dedup_bloom_shards": "Bloom shard overlap (r15): partial->final "
    "bit_or filter build (shards × 64 words shuffle, never shingles); "
    "pair stage all-broadcast, no sort-merge join",
    "ts_seasonal_decompose": "seasonal decomposition (r15): the trend "
    "window consumes the HOURLY aggregate (partial->final agg below "
    "the Window), bounded by the time span, never raw events",
    "ts_kmv_set_algebra": "KMV set algebra (r16): union-with-cut over "
    "kilobyte per-type sketches (Arrow bottom-k partials — the vector "
    "table never self-joins); exact audit ONE user equi-join, union "
    "by inclusion-exclusion — no OR-condition theta join",
    "dedup_winnow_telemetry": "winnowing telemetry (r16): the same "
    "zero-Exchange fingerprint selection; hot flag is a broadcast "
    "left join; one partial-agg per-source groupBy",
    "cf_eval_k_sweep": "recall/NDCG @k sweep (r16): |ks| broadcast "
    "rows cross the shared rec table; every k is a rec_rank filter — "
    "no re-scoring stage anywhere in the plan",
    "ts_mannwhitney_u": "Mann-Whitney U (r16): one partial-agg "
    "groupBy onto the CENT GRID (value-domain-bounded), one "
    "cumulative window over the grid, a 1-row aggregate — the corpus "
    "is touched once",
    "ts_chi2_independence": "chi-squared independence (r16): one "
    "partial-agg groupBy over events; margins and cells live on a "
    "types×7 grid of broadcast crosses",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from mapreducecf_spark import get_spark
    from mapreducecf_spark.registry import QUERIES

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — formatted physical plans of the headline queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}`; the properties",
        "called out below are asserted by `tests/test_plans.py`.",
        "",
    ]
    for name, note in HEADLINERS.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, sf_dir).explain(mode="formatted")
        out += [f"## {name}", "", f"_{note}_", "", "```", buf.getvalue().rstrip(), "```", ""]

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINERS)} plans)")


if __name__ == "__main__":
    main()
