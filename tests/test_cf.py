"""Planted-interaction tests for the collaborative-filtering family —
behavior the parity gate can't see: that co-occurrence, the support
floor, fixed-point cosine and the ownership anti-join do what they
claim on a hand-checkable matrix."""

from __future__ import annotations


def _tables(spark):
    orders = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2), (4, 3)], "o_orderkey bigint, o_custkey bigint"
    )
    lineitem = spark.createDataFrame(
        [(1, 102), (2, 101), (2, 102), (3, 101), (3, 102), (4, 101), (4, 103)],
        "l_orderkey bigint, l_partkey bigint",
    )
    return {"orders": orders, "lineitem": lineitem}


def test_cf_similarity_and_recommendation(spark, monkeypatch):
    """inter: u0:{102} u1:{101,102} u2:{101,102} u3:{101,103};
    pops 101:3 102:3 103:1; the only pair with support >= MIN_CO is
    (101,102) co=2 -> floor(2e6/sqrt(9)) = 666666 micro-units; user 0
    (the query batch, 0 % 97 == 0) owns 102 and must be recommended
    exactly 101 through one path."""
    import mapreducecf_spark.queries.cf as cf

    tables = _tables(spark)
    monkeypatch.setattr(
        cf, "load_table", lambda spark, sf_dir, name: tables[name]
    )
    # own fake sf_dir sentinel: the session memos key on (session, sf)
    sim = {
        (r["it"], r["neighbor"]): (r["n_co"], r["cos_micro"], r["sim_rank"])
        for r in cf.cf_item_similarity(spark, "-cf").collect()
    }
    assert sim == {
        (101, 102): (2, 666666, 1),
        (102, 101): (2, 666666, 1),
    }
    recs = [tuple(r) for r in cf.cf_recommend_topk(spark, "-cf").collect()]
    assert recs == [(0, 101, 666666, 1, 1)]


def test_cf_basket_cap_bounds_quadratic_blowup(spark, monkeypatch):
    """A bot account with a giant basket must contribute at most
    BASKET_CAP interactions — the pair set through that user is
    <= cap²/2, not basket²/2."""
    import mapreducecf_spark.queries.cf as cf

    big = 3 * cf.BASKET_CAP
    orders = spark.createDataFrame([(1, 7)], "o_orderkey bigint, o_custkey bigint")
    lineitem = spark.createDataFrame(
        [(1, 1000 + i) for i in range(big)], "l_orderkey bigint, l_partkey bigint"
    )
    tables = {"orders": orders, "lineitem": lineitem}
    monkeypatch.setattr(
        cf, "load_table", lambda spark, sf_dir, name: tables[name]
    )
    inter = cf.interactions(spark, "-cfcap")
    assert inter.count() == cf.BASKET_CAP
    # and the kept subset is the deterministic md5-order prefix
    again = {tuple(r) for r in cf.interactions(spark, "-cfcap").collect()}
    assert len(again) == cf.BASKET_CAP


def test_user_similarity_bounds_and_symmetry(spark, sf_dir):
    """cos_micro ∈ (0, 1e6]; ranks are 1..K dense per user; the
    underlying pair relation is symmetric (a neighbor's mirror edge
    exists with the same score unless pruned by its own top-K)."""
    from mapreducecf_spark.queries.cf import (
        NEIGHBORS_K,
        SIM_SCALE,
        cf_user_similarity,
    )

    rows = cf_user_similarity(spark, sf_dir).collect()
    assert rows
    by_user = {}
    scores = {}
    for r in rows:
        assert 0 < r["cos_micro"] <= SIM_SCALE
        assert 1 <= r["sim_rank"] <= NEIGHBORS_K
        by_user.setdefault(r["u"], []).append(r["sim_rank"])
        scores[(r["u"], r["neighbor"])] = r["cos_micro"]
    for u, rks in by_user.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), u
    mirrored = [
        (a, b) for (a, b) in scores if (b, a) in scores
    ]
    assert mirrored  # symmetry is visible somewhere
    assert all(scores[(a, b)] == scores[(b, a)] for a, b in mirrored)


def test_rec_coverage_bounds_and_bias_direction(spark, sf_dir):
    """Coverage ∈ (0, 1e6]; item-item CF must show popularity lift
    ≥ parity (the bias the audit exists to quantify); recommended
    distinct items ≤ catalog."""
    from mapreducecf_spark.queries.cf import cf_rec_coverage

    r = cf_rec_coverage(spark, sf_dir).collect()[0]
    assert 0 < r["n_rec_items"] <= r["n_items"]
    assert 0 < r["coverage_ppm"] <= 1_000_000
    assert r["n_recs"] >= r["n_users"]
    assert r["pop_lift_ppm"] >= 1_000_000  # recommends the popular


def test_als_sweep_learns_planted_blocks(spark):
    """Planted-matrix check for the factorization sweep: two disjoint
    user×item blocks, every observed cell = 1. One alternating
    fixed-point sweep must (a) strictly reduce squared error vs the
    md5 init on the observed cells, and (b) be exactly reproducible
    (integer program — two runs give identical factor tables)."""
    from mapreducecf_spark.queries.cf import ALS_SCALE, als_sweep

    cells = [(u, it) for u in range(10) for it in range(5)] + [
        (u, it) for u in range(10, 20) for it in range(5, 10)
    ]
    inter = spark.createDataFrame(cells, "u bigint, it bigint")

    def sse(ufac, vfac):
        from pyspark.sql import functions as F

        from mapreducecf_spark.queries.cf import ALS_RANK

        a = ufac.select("u", *[F.col(f"f{k}").alias(f"uf{k}") for k in range(ALS_RANK)])
        b = vfac.select("it", *[F.col(f"f{k}").alias(f"vf{k}") for k in range(ALS_RANK)])
        dot = None
        for k in range(ALS_RANK):
            term = F.col(f"uf{k}") * F.col(f"vf{k}")
            dot = term if dot is None else dot + term
        err = (
            inter.join(a, "u").join(b, "it")
            .select(((F.lit(ALS_SCALE) - dot / F.lit(ALS_SCALE)) ** 2).alias("e"))
        )
        return err.agg(F.sum("e")).collect()[0][0]

    u1, v1 = als_sweep(spark, inter)
    # init tables: re-derive with the same helpers for the baseline
    from pyspark.sql import functions as F

    from mapreducecf_spark.queries.cf import ALS_RANK, _als_init_k

    u0 = inter.select("u").distinct().select(
        "u", *[_als_init_k("uf", "u", k).alias(f"f{k}") for k in range(ALS_RANK)]
    )
    v0 = inter.select("it").distinct().select(
        "it", *[_als_init_k("vf", "it", k).alias(f"f{k}") for k in range(ALS_RANK)]
    )
    sse0, sse1 = sse(u0, v0), sse(u1, v1)
    assert sse1 < sse0 * 0.9, (sse0, sse1)  # the sweep actually learns

    # exact reproducibility: integer program, no float summation order
    u1b, v1b = als_sweep(spark, inter)
    assert sorted(map(tuple, v1.collect())) == sorted(map(tuple, v1b.collect()))


def test_als_fused_sweep_equals_per_population_runs(spark, monkeypatch):
    """Bit-identity pin of the r19 fused tagged sweep (VERDICT r18 #3):
    ``_als_factors_tagged``'s src='full' / src='trainx' halves must be
    ROW-IDENTICAL to standalone ``als_sweep`` runs over the full and
    cohort-excluded populations — the fusion exists to share passes,
    never to change arithmetic. Population mix includes cohort users
    (u % FOLDIN_USER_MOD == 0) so the two srcs genuinely differ."""
    from pyspark.sql import functions as F

    import mapreducecf_spark.queries.cf as cf

    cells = [(u, it) for u in range(1, 25) for it in range(u % 7 + 1)]
    cells += [(10, 5), (20, 6), (30, 2), (30, 3)]
    inter = spark.createDataFrame(sorted(set(cells)), "u bigint, it bigint")
    monkeypatch.setattr(cf, "interactions", lambda spark, sf_dir: inter)

    fused = cf._als_factors_tagged(spark, "-alsfused")
    got_full = sorted(
        map(tuple, fused.filter(F.col("src") == "full").drop("src").collect())
    )
    got_tr = sorted(
        map(tuple, fused.filter(F.col("src") == "trainx").drop("src").collect())
    )
    want_full = sorted(map(tuple, cf.als_sweep(spark, inter)[1].collect()))
    want_tr = sorted(
        map(
            tuple,
            cf.als_sweep(
                spark, inter.filter(F.col("u") % cf.FOLDIN_USER_MOD != 0)
            )[1].collect(),
        )
    )
    assert got_full == want_full
    assert got_tr == want_tr
    # the two populations must actually differ for the pin to bite
    assert got_full != got_tr


def test_als_foldin_serves_cold_start_cohort(spark, monkeypatch):
    """Fold-in contract on a planted matrix: only the held-out cohort
    (u % FOLDIN_USER_MOD == 0) is served, owned items are never
    recommended, ranks are contiguous, and the whole path is exactly
    reproducible (integer program)."""
    import mapreducecf_spark.queries.cf as cf

    # two blocks; users 10 and 20 are the cold-start cohort
    cells = [(u, it) for u in range(1, 10) for it in range(5)]
    cells += [(u, it) for u in range(21, 30) for it in range(5, 10)]
    cells += [(10, 0), (10, 1), (10, 2), (20, 5), (20, 6), (20, 7)]
    inter = spark.createDataFrame(cells, "u bigint, it bigint")
    monkeypatch.setattr(cf, "interactions", lambda spark, sf_dir: inter)

    out = cf.cf_als_foldin(spark, "-foldin").collect()
    assert out
    owned = {(u, it) for u, it in cells}
    by_u = {}
    for r in out:
        assert r["u"] % cf.FOLDIN_USER_MOD == 0
        assert (r["u"], r["item"]) not in owned
        by_u.setdefault(r["u"], []).append((r["rec_rank"], r["score_micro"], r["item"]))
    assert set(by_u) == {10, 20}
    for u, recs in by_u.items():
        recs.sort()
        assert [x[0] for x in recs] == list(range(1, len(recs) + 1))
        assert len(recs) <= cf.REC_K
        ordered = sorted(recs, key=lambda x: (-x[1], x[2]))
        assert ordered == recs

    again = cf.cf_als_foldin(spark, "-foldin").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def _ref_eval_holdout(baskets, rec_k=5, min_co=2, neighbors_k=10, mod=97):
    """Pure-Python witness for cf_eval_holdout: the full pipeline
    (md5 'ev:' split, train-only co-occurrence/cosine/top-K model,
    recommend from train baskets, integer recall/NDCG) reimplemented
    independently of any Spark/SQL machinery."""
    import hashlib
    import math
    from collections import defaultdict

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    test, train = defaultdict(set), defaultdict(set)
    for u, items in baskets.items():
        for it in items:
            (test if h(f"ev:{u}:{it}")[0] in "012" else train)[u].add(it)
    pop = defaultdict(int)
    for items in train.values():
        for it in items:
            pop[it] += 1
    co = defaultdict(int)
    for items in train.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                co[(s[i], s[j])] += 1
    sym = defaultdict(list)
    for (a, b), n in co.items():
        if n >= min_co:
            cm = math.floor(n * 1_000_000 / math.sqrt(pop[a] * pop[b]))
            sym[a].append((b, cm))
            sym[b].append((a, cm))
    model = {
        it: sorted(nbrs, key=lambda x: (-x[1], x[0]))[:neighbors_k]
        for it, nbrs in sym.items()
    }
    W = [round(1_000_000 / math.log2(r + 1)) for r in range(1, rec_k + 1)]
    out = {}
    for u in sorted(baskets):
        if u % mod or not test.get(u) or not train.get(u):
            continue
        score = defaultdict(int)
        for it in train[u]:
            for cand, cm in model.get(it, []):
                if cand not in train[u]:
                    score[cand] += cm
        recs = sorted(score.items(), key=lambda x: (-x[1], x[0]))[:rec_k]
        hits = [(r + 1) for r, (cand, _) in enumerate(recs) if cand in test[u]]
        k_eff = min(len(test[u]), rec_k)
        dcg = sum(W[r - 1] for r in hits)
        idcg = sum(W[:k_eff])
        out[u] = (
            len(test[u]),
            len(hits),
            len(hits) * 1_000_000 // k_eff,
            dcg * 1_000_000 // idcg,
        )
    return out


def test_eval_holdout_matches_independent_witness(spark, monkeypatch):
    """cf_eval_holdout on a planted structured matrix must equal the
    pure-Python witness EXACTLY, and the matrix is built so CF succeeds
    (clusters of users sharing item blocks -> held-out items are
    recoverable: at least one evaluated user scores a hit), proving the
    metric machinery is non-vacuous where the synthetic sf corpora are
    near-random."""
    import mapreducecf_spark.queries.cf as cf

    # two taste clusters over a small pool; batch users 0/97/194 inside
    rows, baskets = [], {}
    cluster_a = [100, 101, 102, 103, 104, 105]
    cluster_b = [200, 201, 202, 203, 204, 205]
    users = [0, 97, 194, 291, 1, 2, 3, 4, 5, 6]
    for i, u in enumerate(users):
        items = cluster_a if i % 2 == 0 else cluster_b
        baskets[u] = set(items)
        for it in items:
            rows.append((u * 10, u, it))
    orders = spark.createDataFrame(
        sorted({(o, u) for o, u, _ in rows}), "o_orderkey bigint, o_custkey bigint"
    )
    lineitem = spark.createDataFrame(
        [(o, it) for o, _, it in rows], "l_orderkey bigint, l_partkey bigint"
    )
    tables = {"orders": orders, "lineitem": lineitem}
    monkeypatch.setattr(cf, "load_table", lambda spark, sf_dir, name: tables[name])

    got = {
        r["u"]: (r["n_test"], r["hits"], r["recall_micro"], r["ndcg_micro"])
        for r in cf.cf_eval_holdout(spark, "-cfeval").collect()
    }
    want = _ref_eval_holdout(baskets)
    assert got == want
    assert any(v[1] > 0 for v in got.values()), "planted clusters must yield a hit"
    assert all(v[3] <= 1_000_000 for v in got.values())


def test_eval_baselines_agree_with_holdout_and_witness(spark, monkeypatch):
    """The ablation row must be EXACTLY the aggregate of the promotion
    gate's per-user rows (itemcf), the popularity row must equal an
    independent pure-Python replay of the pool/anti-join/metric chain,
    and on a planted clustered matrix the personalized model cannot
    lose to the deterministic-random floor."""
    import hashlib

    import mapreducecf_spark.queries.cf as cf

    rows = []
    cluster_a = [100, 101, 102, 103, 104, 105]
    cluster_b = [200, 201, 202, 203, 204, 205]
    users = [0, 97, 194, 291, 1, 2, 3, 4, 5, 6]
    baskets = {}
    for i, u in enumerate(users):
        items = cluster_a if i % 2 == 0 else cluster_b
        baskets[u] = set(items)
        for it in items:
            rows.append((u * 10, u, it))
    orders = spark.createDataFrame(
        sorted({(o, u) for o, u, _ in rows}), "o_orderkey bigint, o_custkey bigint"
    )
    lineitem = spark.createDataFrame(
        [(o, it) for o, _, it in rows], "l_orderkey bigint, l_partkey bigint"
    )
    tables = {"orders": orders, "lineitem": lineitem}
    monkeypatch.setattr(cf, "load_table", lambda spark, sf_dir, name: tables[name])

    out = {
        r["recommender"]: (r["n_users"], r["mean_recall_micro"], r["mean_ndcg_micro"])
        for r in cf.cf_eval_baselines(spark, "-cfbase").collect()
    }
    assert set(out) == {"itemcf", "popularity", "random_md5"}
    assert len({v[0] for v in out.values()}) == 1, "one shared eval user set"

    # itemcf row == exact bigint-mean of the promotion gate's rows
    perq = [
        (r["recall_micro"], r["ndcg_micro"])
        for r in cf.cf_eval_holdout(spark, "-cfbase").collect()
    ]
    n = len(perq)
    assert out["itemcf"] == (
        n,
        sum(p[0] for p in perq) // n,
        sum(p[1] for p in perq) // n,
    )

    # pure-Python witness for the popularity row
    def is_test(u, it):
        return hashlib.md5(f"ev:{u}:{it}".encode()).hexdigest()[0] in ("0", "1", "2")

    train, test = {}, {}
    for u, items in baskets.items():
        for it in sorted(items):
            (test if is_test(u, it) else train).setdefault(u, set()).add(it)
    pop = {}
    for items in train.values():
        for it in items:
            pop[it] = pop.get(it, 0) + 1
    pool = [it for it, _ in sorted(pop.items(), key=lambda kv: (-kv[1], kv[0]))][
        : cf.POP_POOL
    ]
    recalls, ndcgs, n_users = [], [], 0
    for u in sorted(baskets):
        if u % cf.QUERY_USER_MOD != 0 or u not in train or u not in test:
            continue
        n_users += 1
        recs = [it for it in pool if it not in train[u]][: cf.REC_K]
        hits = [r + 1 for r, it in enumerate(recs) if it in test[u]]
        k_eff = min(len(test[u]), cf.REC_K)
        recalls.append(len(hits) * 1_000_000 // k_eff)
        dcg = sum(cf._NDCG_W[r - 1] for r in hits)
        ndcgs.append(dcg * 1_000_000 // cf._NDCG_IDEAL[k_eff - 1])
    assert out["popularity"] == (
        n_users,
        sum(recalls) // n_users,
        sum(ndcgs) // n_users,
    )
    # clustered tastes: the personalized model is >= the random floor
    assert out["itemcf"][1] >= out["random_md5"][1]


def test_eval_k_sweep_anchors_to_holdout(spark, sf_dir):
    """The sweep's widest point (k = REC_K) must equal cf_eval_holdout's
    own per-user rows aggregated in pure Python (same half-up mean) —
    the sweep is filters over ONE rec table, never a re-scoring. All
    sweep points carry the same user population."""
    import mapreducecf_spark.queries.cf as cf

    hold = cf.cf_eval_holdout(spark, sf_dir).collect()
    sweep = {r["k"]: r for r in cf.cf_eval_k_sweep(spark, sf_dir).collect()}
    assert set(sweep) == set(cf.EVAL_SWEEP_KS)
    n = len(hold)
    assert all(r["n_users"] == n for r in sweep.values())
    top = sweep[cf.REC_K]
    want_recall = (2 * sum(r["recall_micro"] for r in hold) + n) // (2 * n)
    want_ndcg = (2 * sum(r["ndcg_micro"] for r in hold) + n) // (2 * n)
    assert top["mean_recall_micro"] == want_recall
    assert top["mean_ndcg_micro"] == want_ndcg


def test_fused_pair_counts_equal_per_split_sim_runs(spark, monkeypatch):
    """The r18 fused co-occurrence pass counts every pair under the
    full table (n_co) and the eval train split (n_co_tr) in ONE
    self-join — pin the invariant both models rely on: deriving each
    similarity table from the fused counts is row-identical to running
    the classic single-frame builder on that split."""
    import mapreducecf_spark.queries.cf as cf
    from mapreducecf_spark import memo
    from pyspark.sql import functions as F

    rows = []
    for u in range(1, 13):
        for it in range(1, 7):
            if (u * 7 + it * 3) % 4:
                rows.append((u * 10, it * 100))
    df = spark.createDataFrame(rows, "u bigint, it bigint")
    monkeypatch.setattr(
        cf, "interactions", lambda spark, sf_dir: df
    )
    memo.evict(("cf_pairs",))
    try:
        pairs = cf.pair_counts(spark, "-cffused")
        got_full = {
            tuple(r)
            for r in cf._sim_from_counts(
                pairs.filter(F.col("n_co") >= cf.MIN_CO),
                df.groupBy("it").agg(F.count("*").alias("n")),
                "n_co",
            ).collect()
        }
        want_full = {tuple(r) for r in cf._sim_of(df).collect()}
        assert got_full == want_full and got_full

        train = df.filter(~cf._ev_is_test())
        got_tr = {
            tuple(r)
            for r in cf._sim_from_counts(
                pairs.filter(F.col("n_co_tr") >= cf.MIN_CO),
                train.groupBy("it").agg(F.count("*").alias("n")),
                "n_co_tr",
            ).collect()
        }
        want_tr = {tuple(r) for r in cf._sim_of(train).collect()}
        assert got_tr == want_tr and got_tr
        # the split really bites: the two models differ somewhere
        assert got_tr != got_full
    finally:
        memo.evict(("cf_pairs",))
