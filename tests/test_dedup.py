"""Unit tests for queries.dedup — planted-duplicate behavior the parity
check can't see: that the pipelines actually find the dups they claim
to, and that LSH candidates are banded (never all-pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F


# Each monkeypatching test passes its OWN fake sf_dir sentinel: the
# session-scoped memos (memo.session_memo) key shared tables on
# (session, sf_dir), so reusing one sentinel across tests would hand a
# later test the earlier test's planted table.
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the late afternoon sun"
)


def test_exact_dedup_collapses_normalized_variants(spark, monkeypatch):
    import mapreducecf_spark.queries.dedup as dd

    df = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE.upper() + "!!!"),  # case+punct variant → same fingerprint
            (3, "completely different text here"),
        ],
    )
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)
    out = {r["keep_id"]: r["n_dups"] for r in dd.dedup_exact(spark, "-exact").collect()}
    assert out == {1: 2, 3: 1}
    keep = {r["doc_id"] for r in dd.dedup_exact_keep(spark, "-exact").collect()}
    assert keep == {1, 3}


def test_near_dup_pipelines_find_planted_pair(spark, monkeypatch):
    import mapreducecf_spark.queries.dedup as dd

    near = BASE.replace("lazy", "sleepy")  # one-token edit → high Jaccard
    df = _docs(
        spark,
        [
            (1, BASE),
            (2, near),
            (3, "an entirely unrelated document about spark shuffles and joins"),
        ],
    )
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)
    exact_pairs = {
        (r["ida"], r["idb"]) for r in dd.dedup_ngram_jaccard(spark, "-neardup").collect()
    }
    assert exact_pairs == {(1, 2)}
    lsh_pairs = {
        (r["ida"], r["idb"]) for r in dd.dedup_minhash_lsh(spark, "-neardup").collect()
    }
    # LSH is a candidate-pruned subset of the exact pairs (post-verify
    # both apply the same Jaccard threshold)
    assert lsh_pairs <= exact_pairs


def test_simhash_near_dups_have_small_hamming_distance(spark, monkeypatch):
    import mapreducecf_spark.queries.dedup as dd

    near = BASE.replace("lazy", "sleepy")
    df = _docs(spark, [(1, BASE), (2, near), (3, "totally distinct words only")])
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)
    sh = {r["doc_id"]: r["simhash"] for r in dd.dedup_simhash(spark, "-simhash").collect()}

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])
    assert ham(sh[1], sh[2]) <= 6  # near-dup: few bits flip


def test_connected_components_match_union_find(spark, sf_dir):
    """The iterative fixpoint must agree with a driver-side union-find
    over the same edge list (exact, not statistical)."""
    from mapreducecf_spark.registry import QUERIES

    pairs = [
        (r["ida"], r["idb"])
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    ]
    got = {
        r["doc_id"]: r["component"]
        for r in QUERIES["dedup_clusters"](spark, sf_dir).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical component = min member id
    members: dict[int, list[int]] = {}
    for v in set(got):
        members.setdefault(find(v) if v in parent else v, []).append(v)
    expected = {v: min(ms) for root, ms in members.items() for v in ms}
    assert got == expected
    assert pairs  # non-vacuous: the graph has edges at test SF

    # rounds telemetry recorded and sane: near-dup clusters are
    # cliques-ish, so the fixpoint lands in a handful of rounds (the
    # +1 is the no-change confirmation round); a number near
    # CC_ROUND_WARN here means the planted-dup generator changed shape
    from mapreducecf_spark.queries import dedup

    assert 1 <= dedup.LAST_CC_ROUNDS <= 6, dedup.LAST_CC_ROUNDS


def test_connected_components_diameter_independent(spark, recwarn):
    """Star contraction must converge in O(log n) alternations
    REGARDLESS of diameter (VERDICT r07 item 7): a 24-vertex path
    (diameter 23) needed 23 min-label rounds in r07 and fired the
    convergence warning; star contraction lands it in a handful of
    alternations with no warning, labels still = component min."""
    from mapreducecf_spark.queries import dedup

    def run(edges, n_comp):
        e = spark.createDataFrame(edges, "ida long, idb long")
        v = e.selectExpr("ida AS doc_id").union(
            e.selectExpr("idb AS doc_id")
        ).distinct()
        out = dedup.connected_components(e, v)
        comps = {r["doc_id"]: r["component"] for r in out.collect()}
        assert len(set(comps.values())) == n_comp
        return comps, dedup.LAST_CC_ROUNDS

    clique, clique_rounds = run(
        [(a, b) for a in range(4) for b in range(4) if a < b], 1
    )
    assert set(clique.values()) == {0}
    # the r07 pathology: long path, reversed ids so min-label would
    # also have to traverse the whole chain
    n = 24
    path, path_rounds = run([(i, i + 1) for i in range(n - 1)], 1)
    assert path == {i: 0 for i in range(n)}
    assert clique_rounds <= 3
    assert path_rounds <= 6  # ~log2(24) + confirmation, not diameter 23
    assert not [w for w in recwarn.list if "contracting" in str(w.message)]


def test_connected_components_hub_skew_safe(spark):
    """Planted mega-hub graph (VERDICT r08 item 2): a star whose hub's
    degree ≈ component size — the shape a viral-boilerplate dup
    cluster takes at 100 TB, and exactly what serialized one task
    under the r08 per-key window-min. Labels must be exact, the round
    count must stay O(log n), and the star rounds' physical plans must
    contain NO window operator (the min is a map-side-partial groupBy
    + salted join-back, :func:`_with_key_min`)."""
    from mapreducecf_spark.queries import dedup

    n = 800
    hub = 10_000  # hub is the max id: small-star orients every spoke edge at it
    e = spark.createDataFrame(
        [(i * 7 + 1, hub) for i in range(n)], "ida long, idb long"
    )
    v = e.selectExpr("ida AS doc_id").union(e.selectExpr("idb AS doc_id")).distinct()
    out = dedup.connected_components(e, v)
    comps = {r["doc_id"]: r["component"] for r in out.collect()}
    assert set(comps.values()) == {1}  # min spoke id labels everyone
    assert len(comps) == n + 1
    assert dedup.LAST_CC_ROUNDS <= 4

    # no Window in either star round's plan — the skew guarantee
    for step in (dedup._large_star(e.selectExpr("ida AS a", "idb AS b")),
                 dedup._small_star(e.selectExpr("ida AS a", "idb AS b"))):
        plan = step._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        assert "partial_min" in plan, plan  # map-side partial agg present


def test_stop_shingle_df_cap_bounds_candidates(spark, monkeypatch):
    """The 100 TB relief valve: a boilerplate shingle shared by m
    documents must NOT emit O(m²) candidate pairs. Plant 70 docs that
    all share one boilerplate sentence (document frequency 72 >
    NGRAM_DF_CAP=64) plus unique tails, and one genuine near-dup pair
    that ALSO carries the boilerplate: the cap must collapse the
    candidate set from ~m²/2 to exactly the real pair, and the real
    pair must still clear the Jaccard threshold over its capped sets."""
    import mapreducecf_spark.queries.dedup as dd

    boiler = "subscribe to our newsletter for updates every single day"
    rows = [(i, f"{boiler} alpha{i} beta{i} gamma{i} delta{i}") for i in range(70)]
    rows += [(200, f"{boiler} {BASE}"), (201, f"{boiler} {BASE.replace('lazy', 'sleepy')}")]
    df = _docs(spark, rows)
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    sh = dd.shingles_df(spark, "-dfcap")
    capped = dd.df_capped(sh)

    # the cap actually holds on the surviving index
    max_df = capped.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    assert max_df <= dd.NGRAM_DF_CAP

    def n_candidates(idx):
        return (
            idx.alias("a")
            .join(idx.alias("b"), "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    # uncapped: every doc pairs with every other through the boilerplate
    # (quadratic); capped: only the planted near-dup pair survives
    assert n_candidates(sh) == 72 * 71 // 2
    assert n_candidates(capped) == 1

    pairs = {(r["ida"], r["idb"]) for r in dd.dedup_ngram_jaccard(spark, "-dfcap").collect()}
    assert pairs == {(200, 201)}


def test_weighted_jaccard_discriminates_boilerplate_from_rare_overlap(spark, monkeypatch):
    """The point of IDF weighting: a pair overlapping only on
    corpus-wide boilerplate must score ~0 weighted (ln(N/df) → 0 as
    df → N) even when its UNWEIGHTED Jaccard clears the threshold,
    while a pair sharing a rare distinctive sentence keeps a high
    weighted score. Plant both shapes in one corpus where every doc
    carries the boilerplate (df = N, weight exactly 0)."""
    import mapreducecf_spark.queries.dedup as dd

    boiler = "click here to accept all cookies and continue to the site"
    rare = "the heliocentric equation quietly rewrote seventeenth century astronomy forever"
    rows = [(i, f"{boiler} filler{i} junk{i} pad{i} extra{i}") for i in range(10)]
    # (100, 101): overlap is ONLY the boilerplate (plus one unique token
    # each so the weighted union is nonzero) — unweighted J is high,
    # weighted J ~ 0
    rows += [(100, f"{boiler} uniqua"), (101, f"{boiler} uniqub")]
    # (200, 201): share the rare sentence (df=2, high weight) + boiler
    rows += [(200, f"{boiler} {rare} tail{0}"), (201, f"{boiler} {rare} tail{1}")]
    df = _docs(spark, rows)
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    unweighted = {
        (r["ida"], r["idb"]) for r in dd.dedup_ngram_jaccard(spark, "-wjac").collect()
    }
    weighted = {
        (r["ida"], r["idb"]): r["wjaccard"]
        for r in dd.dedup_jaccard_weighted(spark, "-wjac").collect()
    }
    # unweighted finds the boilerplate pair; weighted rejects it
    assert (100, 101) in unweighted
    assert (100, 101) not in weighted
    # both find the rare-content pair; its weighted score is high
    assert (200, 201) in unweighted
    assert weighted.get((200, 201), 0.0) >= 0.7


def test_lsh_candidates_come_from_band_join_not_cross_join(spark, sf_dir):
    """The 100 TB guarantee: candidate generation must plan an equi-join
    on (band, bkey) — no CartesianProduct / BroadcastNestedLoopJoin."""
    import contextlib
    import io

    from mapreducecf_spark.registry import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["dedup_minhash_lsh"](spark, sf_dir).explain(mode="formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_with_key_min_matches_window_min_on_random_graphs(spark):
    """Property: the salted partial-agg + join-back m(u)
    (:func:`_with_key_min`) must equal the retired per-key window min
    on arbitrary edge multisets — including duplicate edges, self-ish
    keys, and single-edge keys — so the skew-safe rewrite can never
    drift from the semantics the star rounds assume."""
    import random

    from mapreducecf_spark.queries import dedup

    rng = random.Random(90210)
    edges = [
        (rng.randrange(0, 40), rng.randrange(0, 10_000))
        for _ in range(500)
    ] + [(99, 7)]  # a key with exactly one edge
    E = spark.createDataFrame(edges, "u long, v long")
    got = {
        (r["u"], r["v"], r["m"])
        for r in dedup._with_key_min(E, "u", "v").collect()
    }
    mins = {}
    for u, v in edges:
        mins[u] = min(mins.get(u, v), v)
    expected = {(u, v, mins[u]) for u, v in edges}
    assert got == expected


def test_containment_benchmark_splits_and_finds_planted_leak(spark, monkeypatch):
    """Planted benchmark leak: a VAL-split doc (md5 bucket >= 90)
    whose text sits verbatim inside one TRAIN-split doc must surface
    that doc as its top containment hit with its source attached —
    and train docs must never appear as queries nor val docs as
    hits (the split disjointness the query exists to honor)."""
    import mapreducecf_spark.queries.dedup as dd

    # md5-bucket(8) = 97 (val); 1..5 are train (buckets < 90)
    leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (8, leak, "benchmark"),  # val query doc
        (1, leak + " india juliet kilo lima mike november oscar", "crawl-a"),
        (2, "papa quebec romeo sierra tango uniform victor whiskey", "crawl-b"),
        (14, leak + " xray yankee zulu", "benchmark"),  # val too: not a hit
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)
    out = dd.dedup_containment_benchmark(spark, "-contain-bench").collect()
    assert out, "planted leak not found"
    assert {r["query_id"] for r in out} <= {8, 14}  # queries are val-split only
    assert all(r["doc_id"] in {1, 2} for r in out)  # hits are train-split only
    top = {r["query_id"]: r for r in out if r["rank"] == 1}
    assert top[8]["doc_id"] == 1 and top[8]["source"] == "crawl-a"
    # doc 8's 6 shingles all sit inside doc 1 -> containment 1.0
    assert top[8]["containment"] == 1.0


def test_segment_dedup_keep_first_and_hotlist(spark, monkeypatch):
    import mapreducecf_spark.queries.dedup as dd

    seg1 = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [
            # doc 1 coins seg1; keep-first retains both its segments
            (1, seg1 + " zeta eta theta iota kappa", "web"),
            # doc 2 copies seg1 verbatim
            (2, seg1 + " one two three four five", "web"),
            # doc 3 copies seg1 up to case+punct (normalization collapses)
            (3, "ALPHA, BETA; GAMMA delta EPSILON! u1 u2 u3 u4 u5", "books"),
            # doc 4 is shorter than SEG_LEN tokens -> out of scope
            (4, "tiny doc", "web"),
            # doc 5 repeats its own first segment WITHIN the doc
            (5, "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5", "web"),
        ],
        "doc_id bigint, text string, source string",
    )
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    rep = {
        r["doc_id"]: (r["n_segs"], r["n_removed"], r["retained_ratio"])
        for r in dd.dedup_segment_exact(spark, "-segdedup").collect()
    }
    assert rep == {
        1: (2, 0, 1.0),
        2: (2, 1, 0.5),
        3: (2, 1, 0.5),
        5: (2, 1, 0.5),
    }

    hot = [
        (r["seg"], r["n_occ"], r["n_docs"], r["rank"])
        for r in dd.dedup_segment_hotlist(spark, "-segdedup").collect()
    ]
    assert sorted(hot, key=lambda t: t[3]) == [
        (seg1, 3, 3, 1),
        ("x1 x2 x3 x4 x5", 2, 1, 2),
    ]


def test_lsh_index_cdc_matches_full_rebuild(spark, monkeypatch):
    """The incrementally-maintained band index must equal a full
    rebuild over the new snapshot, across all four CDC classes
    (insert %10==0, delete %10==1, update %7==3, untouched) — and the
    row-wise signature projection must agree with the groupBy-min
    aggregate form on the same docs."""
    import mapreducecf_spark.queries.dedup as dd
    from pyspark.sql import functions as SF

    rows = [
        (10, "alpha beta gamma delta epsilon zeta", "web"),  # insert
        (11, "eta theta iota kappa lambda mu", "web"),  # delete
        (3, "nu xi omicron pi rho sigma", "web"),  # update (3 % 7 == 3)
        (24, "tau upsilon phi chi psi omega", "web"),  # update (24%7==3)
        (12, "one two three four five six", "web"),  # untouched
        (26, "seven eight nine ten eleven twelve", "web"),  # untouched
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    maintained = {
        (r["doc_id"], r["band"], r["bkey"])
        for r in dd.dedup_lsh_index_cdc(spark, "-lshcdc").collect()
    }
    new_snap = df.filter(SF.col("doc_id") % 10 != 1).select(
        "doc_id",
        SF.when(
            SF.col("doc_id") % 7 == 3, SF.concat("text", SF.lit(" v2"))
        ).otherwise(SF.col("text")).alias("text"),
    )
    rebuild = {
        (r["doc_id"], r["band"], r["bkey"])
        for r in dd._rowwise_bands(new_snap).collect()
    }
    assert maintained == rebuild
    assert {d for d, _, _ in maintained} == {10, 3, 24, 12, 26}

    # row-wise signatures == aggregate signatures on identical input
    shingles = new_snap.select(
        "doc_id",
        SF.explode(
            SF.array_distinct(
                SF.zip_with(
                    SF.zip_with(
                        SF.slice(dd.tokens_array(SF.col("text")), 1,
                                 SF.size(dd.tokens_array(SF.col("text"))) - 2),
                        SF.slice(dd.tokens_array(SF.col("text")), 2,
                                 SF.size(dd.tokens_array(SF.col("text"))) - 2),
                        lambda a, b: SF.concat_ws(" ", a, b),
                    ),
                    SF.slice(dd.tokens_array(SF.col("text")), 3,
                             SF.size(dd.tokens_array(SF.col("text"))) - 2),
                    lambda a, b: SF.concat_ws(" ", a, b),
                )
            )
        ).alias("shingle"),
    )
    agg = {
        (r["doc_id"], r["band"], r["bkey"])
        for r in dd._band_keys(dd._minhash_sigs(shingles)).collect()
    }
    assert agg == rebuild


def test_segment_boundary_audit_flags_misaligned_span(spark, monkeypatch):
    """A span duplicated at a DIFFERENT offset mod SEG_LEN survives
    keep-first (different segment hashes) and must surface as missed
    positions; an exactly aligned copy is fully removed and misses
    nothing; the keeper of an aligned pair reports its retained copy
    as shared-but-not-removed (one kept copy is the pass working)."""
    import mapreducecf_spark.queries.dedup as dd

    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 a b c d e", "web"),  # span aligned at seg 1
            (2, "x1 x2 a b c d e y1 y2 y3", "web"),  # same span, offset 2
            (3, "w1 w2 w3 w4 w5 a b c d e", "web"),  # exact copy of doc 1
        ],
        "doc_id bigint, text string, source string",
    )
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)
    rep = {
        r["doc_id"]: (
            r["n_tokens"],
            r["seg_removed_tokens"],
            r["crossdup_tokens"],
            r["missed_tokens"],
        )
        for r in dd.dedup_segment_boundary_audit(spark, "-segaudit").collect()
    }
    assert rep == {
        1: (10, 0, 10, 10),  # keeper: everything shared, nothing removed
        2: (10, 0, 5, 5),  # misaligned twin: the tiling's blind spot
        3: (10, 10, 10, 0),  # aligned copy: fully removed, zero missed
    }


def test_weighted_minhash_sketch_tracks_weighted_jaccard(spark, monkeypatch):
    """The replication sketch's collision probability IS the integer-
    weighted Jaccard: an exact-dup pair must sketch to est == 1.0 with
    exact J_q == 1.0; the rare-overlap pair survives; the boilerplate-
    only pair (its shared shingles carry weight ~0 and leave the
    sketch) must not."""
    import mapreducecf_spark.queries.dedup as dd

    boiler = "click here to accept all cookies and continue to the site"
    rare = "the heliocentric equation quietly rewrote seventeenth century astronomy forever"
    rows = [(i, f"{boiler} filler{i} junk{i} pad{i} extra{i}") for i in range(10)]
    rows += [(100, f"{boiler} uniqua"), (101, f"{boiler} uniqub")]
    # near-identical rare pair: one trailing token added → J_q ~ 0.9,
    # band collision certain enough to be stable under the fixed md5
    # hash family (deterministic forever on this corpus)
    tail = "alpha beta gamma delta epsilon zeta"
    rows += [(200, f"{boiler} {rare} {tail}"), (201, f"{boiler} {rare} {tail} eta")]
    rows += [(300, f"{rare} identical twin"), (301, f"{rare} identical twin")]
    df = _docs(spark, rows)
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    out = {
        (r["ida"], r["idb"]): r
        for r in dd.dedup_minhash_weighted(spark, "-wmh").collect()
    }
    assert (100, 101) not in out
    assert (200, 201) in out
    twin = out[(300, 301)]
    assert twin["wjaccard"] == 1.0 and twin["wjaccard_est"] == 1.0
    assert all(0.0 <= r["wjaccard_est"] <= 1.0 for r in out.values())


def _ref_winnow_fps(text, k=3, w=4):
    """Pure-Python classic winnowing (Schleimer et al. §4: min of each
    window, rightmost on ties) over the repo tokenizer — the
    independent witness for winnow_fingerprints."""
    import hashlib
    import re

    cleaned = re.sub(r"[!-/:-@\[-`{-~]", "", text)
    toks = [x for x in re.split(" +", cleaned) if re.search(r"\S", x)]
    if len(toks) < k + w - 1:
        return set()
    shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    keys = [
        hashlib.md5(s.encode()).hexdigest() + str(10**9 - (i + 1)).zfill(10)
        for i, s in enumerate(shingles)
    ]
    return {min(keys[i : i + w])[:32] for i in range(len(keys) - w + 1)}


def test_winnowing_matches_reference_and_guarantee(spark, monkeypatch):
    import mapreducecf_spark.queries.dedup as dd

    run = "alpha bravo charlie delta echo foxtrot"  # WINNOW_GUARANTEE tokens
    docs = [
        (1, BASE),
        (2, "totally different words precede it " + run + " and then diverge again here"),
        (3, run + " trailing content that shares nothing else with anything"),
        # repetitive doc: identical shingles inside one window exercise
        # the rightmost tie-break (same md5, different position pad)
        (4, "ping pong ping pong ping pong ping pong ping"),
        (5, "short doc"),  # below the guarantee length: no fingerprints
    ]
    df = _docs(spark, docs)
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    got = {}
    for r in dd.winnow_fingerprints(spark, "-winnow").collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {i: _ref_winnow_fps(t) for i, t in docs if _ref_winnow_fps(t)}
    assert got == want, "Spark selection must equal classic winnowing"

    # selection density ~ 2/(w+1): never more fingerprints than windows
    for i, t in docs:
        if i in got:
            assert len(got[i]) <= len(_ref_winnow_fps(t) | got[i])

    # the winnowing GUARANTEE: docs 2 and 3 share exactly one
    # WINNOW_GUARANTEE-token run -> they MUST share a fingerprint
    pairs = {
        (r["ida"], r["idb"]): r["shared_fps"]
        for r in dd.dedup_winnowing(spark, "-winnow").collect()
    }
    assert (2, 3) in pairs and pairs[(2, 3)] >= 1
    # doc 1 shares no 6-token run with anyone -> no pair involves it
    assert not any(1 in p for p in pairs)


def test_threshold_sweep_nests_and_anchors(spark, sf_dir):
    """Sweep points must NEST (higher threshold => <= pairs, <= removed)
    and the floor point must equal the raw verified-pair table's own
    aggregates (the widest pass IS the family query, not a re-pairing)."""
    import mapreducecf_spark.queries.dedup as dd

    rows = {
        r["threshold"]: (r["n_pairs"], r["n_removed"], r["removed_ppm"])
        for r in dd.dedup_threshold_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == set(dd.SWEEP_THRESHOLDS)
    ordered = [rows[t] for t in sorted(rows)]
    for a, b in zip(ordered, ordered[1:]):
        assert a[0] >= b[0] and a[1] >= b[1], "sweep points must nest"
    pairs = dd.dedup_minhash_lsh(spark, sf_dir)
    n_pairs = pairs.count()
    n_removed = pairs.select("idb").distinct().count()
    assert rows[dd.SWEEP_THRESHOLDS[0]][:2] == (n_pairs, n_removed)


def _py_bloom_filter(shingles):
    """Independent witness: the per-shard Bloom filter as a Python set
    of (word, bit) positions, from the same one-md5 double-hash recipe."""
    import hashlib

    import mapreducecf_spark.queries.dedup as dd

    posns = set()
    for s in shingles:
        h = hashlib.md5(s.encode()).hexdigest()
        v1, v2 = int(h[:12], 16), int(h[12:24], 16)
        for i in range(dd.BLOOM_K):
            p = (v1 + i * v2) % dd.BLOOM_M
            posns.add((p // dd.BLOOM_WORD_BITS, p % dd.BLOOM_WORD_BITS))
    return posns


def test_bloom_shards_matches_python_witness_and_never_misses(spark, monkeypatch):
    """The Bloom soundness contract, pinned on a planted corpus: the
    per-shard popcounts and the pairwise AND popcount equal an
    independent pure-Python replay of the filter, and a pair that
    EXACTLY shares shingles can never show an empty AND (Bloom filters
    have no false negatives — that is the entire reason a 100 TB run
    can trust an empty popcount to skip the pair)."""
    import mapreducecf_spark.queries.dedup as dd

    shared = "zeta eta theta iota kappa"
    docs = [
        (1, shared + " alpha bravo charlie unique to the first shard", "sa"),
        (2, "delta echo foxtrot golf hotel india juliet words", "sa"),
        (3, shared + " lima mike november oscar papa second shard", "sb"),
        (4, "quebec romeo sierra tango uniform victor whiskey xray", "sc"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, source string")
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    rows = {
        (r["src_a"], r["src_b"]): r
        for r in dd.dedup_bloom_shards(spark, "-bloom").collect()
    }
    assert set(rows) == {("sa", "sb"), ("sa", "sc"), ("sb", "sc")}

    # independent witness: rebuild each shard's filter in pure Python
    def toks(t):
        return t.split()

    sh = {}
    for _id, text, src in docs:
        ts = toks(text)
        sh.setdefault(src, set()).update(
            " ".join(ts[i : i + dd.SHINGLE_K]) for i in range(len(ts) - dd.SHINGLE_K + 1)
        )
    filt = {s: _py_bloom_filter(v) for s, v in sh.items()}
    for (a, b), r in rows.items():
        assert r["n_a"] == len(sh[a]) and r["n_b"] == len(sh[b])
        assert r["bits_a"] == len(filt[a]) and r["bits_b"] == len(filt[b])
        assert r["bits_and"] == len(filt[a] & filt[b])
        assert r["exact_shared"] == len(sh[a] & sh[b])

    # sa/sb share a planted 5-token run (3 shingles); sc is disjoint
    assert rows[("sa", "sb")]["exact_shared"] == 3
    assert rows[("sa", "sc")]["exact_shared"] == 0
    # the no-false-negative direction
    for r in rows.values():
        if r["exact_shared"] > 0:
            assert r["bits_and"] > 0
        assert r["bits_and"] <= min(r["bits_a"], r["bits_b"])
        assert r["bits_a"] <= dd.BLOOM_K * r["n_a"]
        assert r["bits_b"] <= dd.BLOOM_K * r["n_b"]


def test_bloom_shards_soundness_on_corpus(spark, sf_dir):
    """Registry-level: on the real corpus every exactly-overlapping
    shard pair must light the AND popcount (no false negatives), and
    popcount bounds hold for every pair."""
    from mapreducecf_spark.registry import QUERIES

    import mapreducecf_spark.queries.dedup as dd

    for r in QUERIES["dedup_bloom_shards"](spark, sf_dir).collect():
        if r["exact_shared"] > 0:
            assert r["bits_and"] > 0, r
        assert r["bits_and"] <= min(r["bits_a"], r["bits_b"])
        assert r["bits_a"] <= min(dd.BLOOM_K * r["n_a"], dd.BLOOM_M)
        assert r["bits_b"] <= min(dd.BLOOM_K * r["n_b"], dd.BLOOM_M)


def test_bloom_fpp_audit_no_false_negatives_and_witness(spark, monkeypatch):
    """On the planted corpus the audit's identity must hold exactly:
    every true cross-shard shingle is a bloom hit (no false negatives
    -> n_bloom_hits - n_fp == n_true), the planted overlap count is
    recovered, and all four counts equal a pure-Python replay of the
    filters and probes."""
    import mapreducecf_spark.queries.dedup as dd

    shared = "zeta eta theta iota kappa"
    docs = [
        (1, shared + " alpha bravo charlie unique to the first shard", "sa"),
        (2, "delta echo foxtrot golf hotel india juliet words", "sa"),
        (3, shared + " lima mike november oscar papa second shard", "sb"),
        (4, "quebec romeo sierra tango uniform victor whiskey xray", "sc"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, source string")
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    row = dd.dedup_bloom_fpp_audit(spark, "-bloomfpp").collect()[0]

    # python replay
    sh = {}
    for _id, text, src in docs:
        ts = text.split()
        sh.setdefault(src, set()).update(
            " ".join(ts[i : i + dd.SHINGLE_K]) for i in range(len(ts) - dd.SHINGLE_K + 1)
        )
    filt = {s: _py_bloom_filter(v) for s, v in sh.items()}
    n_probes = n_hits = n_true = n_fp = 0
    for a, items in sh.items():
        for s in items:
            probe = _py_bloom_filter([s])
            for b, fb in filt.items():
                if b == a:
                    continue
                n_probes += 1
                hit = probe <= fb
                true = s in sh[b]
                n_hits += hit
                n_true += true
                n_fp += hit and not true
    assert row["n_probes"] == n_probes
    assert row["n_bloom_hits"] == n_hits
    assert row["n_true"] == n_true == 6  # 3 shared shingles, both directions
    assert row["n_fp"] == n_fp
    assert row["n_bloom_hits"] - row["n_fp"] == row["n_true"], "no false negatives"
    assert row["fpp_ppm"] == n_fp * 1_000_000 // (n_probes - n_true)


def test_bloom_fpp_audit_identity_on_corpus(spark, sf_dir):
    """Corpus-level: the no-false-negative identity and the ppm
    arithmetic must hold on the real shards too."""
    from mapreducecf_spark.registry import QUERIES

    r = QUERIES["dedup_bloom_fpp_audit"](spark, sf_dir).collect()[0]
    assert r["n_bloom_hits"] - r["n_fp"] == r["n_true"]
    assert 0 <= r["fpp_ppm"] <= 1_000_000
    assert r["n_probes"] >= r["n_bloom_hits"]


def test_winnow_telemetry_flags_boilerplate_source(spark, monkeypatch):
    """Planted corpus: source 'templated' repeats one boilerplate run
    across more than NGRAM_DF_CAP docs (every one of its fingerprints
    goes corpus-hot), source 'clean' has all-distinct content. The
    telemetry must attribute ALL hot fingerprint mass to 'templated',
    zero to 'clean', with the exact half-up micro shares and the
    density identity n_fp_rows ≥ n_uniq_fps."""
    import mapreducecf_spark.queries.dedup as dd

    boiler = "all rights reserved contact the webmaster for details"
    rows = []
    # NGRAM_DF_CAP + 2 docs that are EXACTLY the boilerplate run
    for i in range(dd.NGRAM_DF_CAP + 2):
        rows.append((100 + i, boiler, "templated"))
    # clean docs: unique token streams, no shared runs
    for i in range(6):
        words = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((200 + i, words, "clean"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    monkeypatch.setattr(dd, "load_table", lambda spark, sf_dir, name: df)

    out = {r["source"]: r for r in dd.dedup_winnow_telemetry(spark, "-wt").collect()}
    assert set(out) == {"templated", "clean"}
    t, c = out["templated"], out["clean"]
    assert t["n_docs"] == dd.NGRAM_DF_CAP + 2
    # identical docs -> identical fingerprint sets; every fp sits in
    # > CAP docs -> ALL templated fingerprint rows are hot
    assert t["n_hot_rows"] == t["n_fp_rows"] > 0
    assert t["boilerplate_micro"] == 1_000_000
    assert c["n_docs"] == 6 and c["n_hot_rows"] == 0
    assert c["boilerplate_micro"] == 0
    for r in (t, c):
        assert r["n_fp_rows"] >= r["n_uniq_fps"] > 0
        # density = half-up micro mean fps/doc
        num = 2_000_000 * r["n_fp_rows"] + r["n_docs"]
        assert r["density_micro"] == num // (2 * r["n_docs"])
