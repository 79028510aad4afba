"""Collaborative filtering over the (customer, part) interaction
matrix — the capability the reference repo is NAMED for (MapReduceCF;
the north star pins "MapReduce collaborative filtering … Spark
flatMap/reduceByKey"). The reference itself ships only the word-count
query (SURVEY.md §0), so this family is built north-star-first and
idiomatic-Spark: the classic two-stage item-item CF MapReduce
(co-occurrence → similarity → recommend) expressed as DataFrame
joins/aggregations Catalyst can plan, never RDD loops.

Pipeline (all three registered queries driver-graded against exact SQL
replays — neighbor-list model, top-k recommendations, association
rules):

1. interactions: DISTINCT (customer u, part it) from orders⋈lineitem,
   basket-capped per user (top-{BASKET_CAP} by md5 hash order — the
   DF-cap discipline from dedup: one crawler/bot account with a
   10⁶-item basket would otherwise emit a quadratic pair set no
   runtime skew handling can shrink; the cap is deterministic and
   replayed by the oracle).
2. co-occurrence: per-user basket self-join (equi-join on u, never a
   cross join) → count per (item a < item b) — the flatMap/reduceByKey
   stage of the MapReduce formulation, as one partial-agg shuffle.
3. similarity: binary cosine = co / sqrt(pop_a·pop_b), kept as BIGINT
   micro-units (×1e6, floor — no half-way rounding hazard) — the same fixed-point discipline
   as sim_pagerank, so cross-engine float summation order can never
   flip a hash.
4. recommend: for a deterministic query batch of users, score every
   similar-to-owned item by SUM of integer similarity micro-units over
   the user's basket, drop already-owned, rank top-{REC_K} with id
   tiebreak.

100 TB posture: interactions shuffle (bigint, bigint) pairs; the
co-occurrence volume is Σ_u basket² ≤ n_users × {BASKET_CAP}² (linear
in users by the cap); similarity joins are id-equi-joins of narrow
aggregates; recommendation is driven by the user batch (a workload,
not the corpus) joined against the similarity table — the same
bounded-probe shape as sim_knn_brute's query batch. The similarity
table is session-memoized (build once, recommend many), which at
cluster scale is the materialized item-item model every production CF
serves from.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreducecf_spark.registry import register
from mapreducecf_spark.sources import load_table

BASKET_CAP = 64  # max interactions kept per user (skew relief valve)
SIM_SCALE = 1_000_000  # cosine micro-units (BIGINT fixed point)
MIN_CO = 2  # co-occurrence support floor for the similarity table
REC_K = 5  # recommendations per user
QUERY_USER_MOD = 97  # custkey % this == 0 -> the recommendation batch

# ---------------------------------------------------------------------
# shared SQL fragments (DuckDB replays the identical pipeline)
# ---------------------------------------------------------------------
_INTER_SQL = f"""
raw AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS it
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
inter AS (
  SELECT u, it FROM (
    SELECT u, it,
           row_number() OVER (PARTITION BY u
                              ORDER BY md5(u || ':' || it), it) AS rk
    FROM raw) t
  WHERE rk <= {BASKET_CAP})"""

_SIM_SQL = f"""
pop AS (SELECT it, count(*) AS n FROM inter GROUP BY it),
co AS (
  SELECT a.it AS ia, b.it AS ib, count(*) AS n_co
  FROM inter a JOIN inter b ON a.u = b.u AND a.it < b.it
  GROUP BY 1, 2),
sim AS (
  SELECT ia, ib, n_co,
         CAST(floor(n_co * {SIM_SCALE} / sqrt(pa.n * pb.n)) AS BIGINT)
           AS cos_micro
  FROM co JOIN pop pa ON pa.it = co.ia
          JOIN pop pb ON pb.it = co.ib
  WHERE n_co >= {MIN_CO})"""


def interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized basket-capped (u, it) interaction matrix.

    ONE-EXCHANGE layout (VERDICT r08 item 3): ``repartition("u")``
    before the distinct, so the dedup agg (hashpartitioning(u)
    satisfies ClusteredDistribution(u, it) — same (u, it) ⇒ same u ⇒
    same partition) and the basket-cap window both ride a single
    shuffle of the raw join output, one sort, one WindowGroupLimit —
    vs the naive distinct-then-window's two full-table Exchanges and
    split partial/final window phases (measured 1.34 s → 0.98 s warm
    at sf0.1). The forfeited map-side partial distinct is ~free here:
    (u, it) duplicates are same-customer re-orders of the same part,
    ~1% of rows at every SF. The cached table's hashpartitioning(u)
    is what makes the downstream item-item pair self-join on u
    zero-Exchange."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        from mapreducecf_spark.sources.tables import spread

        o = load_table(spark, sf_dir, "orders")
        # adaptive input spread (r18, guide §2.5): the broadcast join +
        # dedup map work otherwise runs on the unsplittable test scan's
        # single task; an already-split layout passes through untouched
        l = spread(
            spark, sf_dir, "lineitem",
            load_table(spark, sf_dir, "lineitem"), "l_orderkey",
        )
        raw = (
            o.join(l, o.o_orderkey == l.l_orderkey)
            .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it"))
            .repartition("u")
            .dropDuplicates(["u", "it"])
        )
        w = Window.partitionBy("u").orderBy(
            F.md5(F.concat_ws(":", F.col("u"), F.col("it"))), F.col("it")
        )
        return (
            raw.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= BASKET_CAP)
            .select("u", "it")
        )

    return session_memo(spark, ("cf_inter", sf_dir), build)


def _sim_of(inter: DataFrame) -> DataFrame:
    """Item-item similarity (ia < ib, cos_micro BIGINT) over ANY
    basket-capped (u, it) frame — the full table and the eval query's
    train split both train through this one builder."""
    pop = inter.groupBy("it").agg(F.count("*").alias("n"))
    a = inter.select(F.col("u"), F.col("it").alias("ia"))
    b = inter.select(F.col("u"), F.col("it").alias("ib"))
    co = (
        a.join(b, "u")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= MIN_CO)
    )
    return _sim_from_counts(co, pop, "n_co")


def _sim_from_counts(co: DataFrame, pop: DataFrame, n_col: str) -> DataFrame:
    """The cosine step of :func:`_sim_of` over pre-aggregated pair and
    popularity counts — shared by the classic single-frame builder and
    the fused full+train pass of :func:`pair_counts` (the arithmetic
    is identical integer-exact math either way)."""
    return (
        co.join(pop.select(F.col("it").alias("ia"), F.col("n").alias("na")), "ia")
        .join(pop.select(F.col("it").alias("ib"), F.col("n").alias("nb")), "ib")
        .select(
            "ia",
            "ib",
            F.col(n_col).alias("n_co"),
            F.floor(
                F.col(n_col) * SIM_SCALE / F.sqrt(F.col("na") * F.col("nb"))
            )
            .cast("bigint")
            .alias("cos_micro"),
        )
    )


def _ev_is_test() -> Column:
    """The eval holdout's membership predicate over (u, it) — ONE
    definition shared by the split, the fused pair pass and the
    baselines (md5 'ev:' seeded, independent of the basket-cap
    hash)."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit("ev"), F.col("u"), F.col("it"))), 1, 1
    ).isin(*EVAL_TEST_NIBBLES)


def pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized FUSED co-occurrence pair counts
    (ia, ib, n_co, n_co_tr): the item-item self-join on u — the heavy
    pass of the CF family — run ONCE, counting every pair under the
    full table (``n_co``) and under the eval train split (``n_co_tr``
    = pairs whose BOTH interactions are train rows) in the same
    aggregation (r18 opt, guide §2.4 "two operations keyed the same
    way share one exchange"): the shipped model and the eval model
    previously each paid their own self-join over 100%/81% of the same
    rows. A pair's train count counts exactly the (u, ia, ib) events
    with both sides in train, so filtering/joining on the _tr columns
    is row-identical to running the classic builder on the train
    split (pinned by pytest)."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        inter = interactions(spark, sf_dir).withColumn(
            "tr", (~_ev_is_test()).cast("int")
        )
        # r19 (guide §2.4): the per-user pair generation as ONE
        # zero-exchange aggregation instead of the equi-self-join —
        # interactions is persisted hashpartitioned(u), so the basket
        # collect rides the cached partitioning with no shuffle and no
        # per-side sort (the SMJ variant sorted both 1.9M-row join
        # inputs), and the in-array explode emits the identical
        # (ia < ib) pair set: baskets are DISTINCT (u, it), so sorting
        # the basket array by it makes every (i < j) element pair an
        # (ia < ib) value pair — bit-identical counts (pytest-pinned
        # vs the classic per-split builders). Baskets are ≤
        # {BASKET_CAP} items by construction, bounding every array op.
        baskets = inter.groupBy("u").agg(
            F.array_sort(F.collect_list(F.struct("it", "tr"))).alias("items")
        )
        pairs = baskets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(items, (x, i) -> "
                        "transform(slice(items, i + 2, size(items)), "
                        "y -> struct(x.it AS ia, y.it AS ib, x.tr * y.tr AS tt)))"
                    )
                )
            ).alias("p")
        )
        return (
            pairs.select("p.ia", "p.ib", "p.tt")
            .groupBy("ia", "ib")
            .agg(
                F.count("*").alias("n_co"),
                F.sum("tt").cast("bigint").alias("n_co_tr"),
            )
            # n_co >= n_co_tr always, so this one support floor covers
            # BOTH consumers' filters — and it prunes the persisted
            # table ~30x (12.3M -> 389k pairs at sf0.1): sub-support
            # pairs never survive either model
            .filter(F.col("n_co") >= MIN_CO)
        )

    return session_memo(spark, ("cf_pairs", sf_dir), build)


def item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized item-item similarity table (ia < ib,
    cos_micro BIGINT) — the trained CF model both queries serve
    from."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark,
        ("cf_sim", sf_dir),
        # consume the fused pair pass (r18): same rows as
        # _sim_of(interactions(...)), one shared self-join with the
        # eval model instead of two
        lambda: _sim_from_counts(
            pair_counts(spark, sf_dir).filter(F.col("n_co") >= MIN_CO),
            interactions(spark, sf_dir)
            .groupBy("it")
            .agg(F.count("*").alias("n")),
            "n_co",
        ),
    )


NEIGHBORS_K = 10  # neighbor-list size of the shipped item-item model

# symmetrize + per-item top-K — the pruned serving model, shared by the
# graded similarity query and the recommender (DuckDB twin below)
_MODEL_SQL = f"""
ssym AS (
  SELECT ia AS it, ib AS neighbor, n_co, cos_micro FROM sim
  UNION ALL
  SELECT ib AS it, ia AS neighbor, n_co, cos_micro FROM sim),
model AS (
  SELECT it, neighbor, n_co, cos_micro, sim_rank
  FROM (SELECT *, row_number() OVER (PARTITION BY it
               ORDER BY cos_micro DESC, neighbor) AS sim_rank
        FROM ssym) t
  WHERE sim_rank <= {NEIGHBORS_K})"""


def _model_of(sim: DataFrame) -> DataFrame:
    """Symmetrize + per-item top-{NEIGHBORS_K} prune of a similarity
    pair table — the serving-model shape, frame-agnostic (shared by
    the memoized full model and the eval query's train-split model)."""
    ssym = sim.select(
        F.col("ia").alias("it"), F.col("ib").alias("neighbor"), "n_co", "cos_micro"
    ).unionAll(
        sim.select(
            F.col("ib").alias("it"),
            F.col("ia").alias("neighbor"),
            "n_co",
            "cos_micro",
        )
    )
    w = Window.partitionBy("it").orderBy(F.desc("cos_micro"), F.asc("neighbor"))
    return (
        ssym.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= NEIGHBORS_K)
    )


def neighbor_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized pruned model: each item's top-{NEIGHBORS_K}
    neighbors (it, neighbor, n_co, cos_micro, sim_rank) — what serving
    reads; the full pair table stays in ``item_similarity``."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        sim = item_similarity(spark, sf_dir)
        # eagerly FILL the cf_sim cache before _model_of's symmetric
        # union reads it twice (r19): on a cold memo the two union
        # branches otherwise race to compute the same uncached
        # partitions concurrently — per-block locking makes both
        # SIDES do the similarity join's work in the worst case,
        # which is exactly the 3.1↔13.8 s swing cf_model showed
        # across otherwise-identical runs
        sim.write.format("noop").mode("overwrite").save()
        return _model_of(sim)

    return session_memo(spark, ("cf_model", sf_dir), build)


@register(
    "cf_item_similarity",
    oracle=f"""
WITH {_INTER_SQL.strip()},
{_SIM_SQL.strip()},
{_MODEL_SQL.strip()}
SELECT it, neighbor, CAST(n_co AS BIGINT) AS n_co, cos_micro, sim_rank
FROM model
""",
)
def cf_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1+2 of item-item CF, graded end to end: the co-occurrence
    MapReduce (basket self-join, partial-agg count), binary-cosine
    normalization support-floored at n_co >= {MIN_CO}, pruned to each
    item's top-{NEIGHBORS_K} neighbor list — the artifact a production
    CF ships (full pairs stay in the memoized model table; the pruned
    lists are what serving reads). Oracle replays the identical capped
    pipeline including the md5 basket-cap order."""
    return neighbor_lists(spark, sf_dir).select(
        "it",
        "neighbor",
        F.col("n_co").cast("bigint").alias("n_co"),
        "cos_micro",
        "sim_rank",
    )


@register(
    "cf_recommend_topk",
    oracle=f"""
WITH {_INTER_SQL.strip()},
{_SIM_SQL.strip()},
{_MODEL_SQL.strip()},
batch AS (SELECT u, it FROM inter WHERE u % {QUERY_USER_MOD} = 0),
scored AS (
  SELECT b.u, s.neighbor AS cand,
         CAST(sum(s.cos_micro) AS BIGINT) AS score_micro,
         CAST(count(*) AS BIGINT) AS n_paths
  FROM batch b JOIN model s ON s.it = b.it
  LEFT JOIN inter own ON own.u = b.u AND own.it = s.neighbor
  WHERE own.it IS NULL
  GROUP BY b.u, s.neighbor)
SELECT u, cand AS item, score_micro, n_paths, rec_rank
FROM (SELECT *, row_number() OVER (PARTITION BY u
              ORDER BY score_micro DESC, cand) AS rec_rank
      FROM scored) t
WHERE rec_rank <= {REC_K}
""",
)
def cf_recommend_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 3: top-{REC_K} item recommendations for the deterministic
    user batch (custkey ≡ 0 mod {QUERY_USER_MOD}) — score every item on
    the top-{NEIGHBORS_K} neighbor lists of something the user owns by
    the SUM of integer cosine micro-units over their basket
    (bitwise-identical in any engine or shuffle order), anti-join out
    what they already own, rank with id tiebreak. Scoring runs over the
    PRUNED serving model (cf_item_similarity's artifact, memoized — the
    standard item-based serving path), so probe volume is
    |batch| × basket × {NEIGHBORS_K}, driven by the query workload, not
    the corpus or the full pair table."""
    model = neighbor_lists(spark, sf_dir).select(
        F.col("it"), F.col("neighbor").alias("cand"), "cos_micro"
    )
    inter = interactions(spark, sf_dir)
    ssym = model.withColumnRenamed("it", "owned")
    batch = inter.filter(F.col("u") % QUERY_USER_MOD == 0)
    owned = inter.select(F.col("u"), F.col("it").alias("cand"))
    scored = (
        batch.join(ssym, batch.it == ssym.owned)
        .join(owned, ["u", "cand"], "left_anti")
        .groupBy("u", "cand")
        .agg(
            F.sum("cos_micro").cast("bigint").alias("score_micro"),
            F.count("*").cast("bigint").alias("n_paths"),
        )
    )
    w = Window.partitionBy("u").orderBy(F.desc("score_micro"), F.asc("cand"))
    return (
        scored.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= REC_K)
        .select(
            "u",
            F.col("cand").alias("item"),
            "score_micro",
            "n_paths",
            "rec_rank",
        )
    )


RULES_K = 100  # rules reported (top by lift)


@register(
    "cf_association_rules",
    oracle=f"""
WITH {_INTER_SQL.strip()},
{_SIM_SQL.strip()},
nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users FROM inter),
rules AS (
  SELECT s.ia AS antecedent, s.ib AS consequent, s.n_co,
         CAST(floor(s.n_co * {SIM_SCALE} / nu.n_users) AS BIGINT)
           AS support_micro,
         CAST(floor(s.n_co * {SIM_SCALE} / pa.n) AS BIGINT)
           AS confidence_micro,
         CAST(floor(s.n_co * nu.n_users * {SIM_SCALE} / (pa.n * pb.n))
              AS BIGINT) AS lift_micro
  FROM sim s
  JOIN pop pa ON pa.it = s.ia
  JOIN pop pb ON pb.it = s.ib
  CROSS JOIN nu)
SELECT antecedent, consequent, CAST(n_co AS BIGINT) AS n_co,
       support_micro, confidence_micro, lift_micro
FROM rules
ORDER BY lift_micro DESC, antecedent, consequent
LIMIT {RULES_K}
""",
)
def cf_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules a→b over the same interaction
    matrix: support (co-baskets / users), confidence (co-baskets /
    antecedent baskets) and lift (observed/expected co-occurrence) in
    BIGINT micro-units (floor fixed point — engine-exact, like the CF
    cosine), reported as the top-{RULES_K} rules by lift with id
    tiebreaks. Rides the memoized co-occurrence model: zero new corpus
    passes — the rule stage is arithmetic over the (pairs ⋈ popularity)
    aggregates plus one broadcast 1-row user count, and the cut is
    orderBy+limit (TakeOrderedAndProject, no global sort). This is the
    other classic MapReduce-era basket workload, served from the same
    trained artifact as the recommender."""
    sim = item_similarity(spark, sf_dir)
    inter = interactions(spark, sf_dir)
    pop = inter.groupBy("it").agg(F.count("*").alias("n"))
    nu = inter.agg(F.countDistinct("u").cast("bigint").alias("n_users"))
    rules = (
        sim.join(pop.select(F.col("it").alias("ia"), F.col("n").alias("na")), "ia")
        .join(pop.select(F.col("it").alias("ib"), F.col("n").alias("nb")), "ib")
        .crossJoin(F.broadcast(nu))
        .select(
            F.col("ia").alias("antecedent"),
            F.col("ib").alias("consequent"),
            F.col("n_co").cast("bigint").alias("n_co"),
            F.floor(F.col("n_co") * SIM_SCALE / F.col("n_users"))
            .cast("bigint")
            .alias("support_micro"),
            F.floor(F.col("n_co") * SIM_SCALE / F.col("na"))
            .cast("bigint")
            .alias("confidence_micro"),
            F.floor(
                F.col("n_co") * F.col("n_users") * SIM_SCALE
                / (F.col("na") * F.col("nb"))
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
    )
    return rules.orderBy(
        F.desc("lift_micro"), F.asc("antecedent"), F.asc("consequent")
    ).limit(RULES_K)


# ---------------------------------------------------------------------
# user-user CF (the transposed model)
# ---------------------------------------------------------------------
POP_CAP = 64  # max users kept per item for pair generation (transposed
#               skew valve: a hit item bought by everyone would emit a
#               quadratic user-pair set, the mirror image of the
#               BASKET_CAP problem; md5-deterministic, oracle-replayed)


@register(
    "cf_user_similarity",
    oracle=f"""
WITH {_INTER_SQL.strip()},
icap AS (
  SELECT u, it FROM (
    SELECT u, it,
           row_number() OVER (PARTITION BY it
                              ORDER BY md5(it || ':' || u), u) AS rk
    FROM inter) t
  WHERE rk <= {POP_CAP}),
ubask AS (SELECT u, count(*) AS n FROM inter GROUP BY 1),
uco AS (
  SELECT a.u AS ua, b.u AS ub, count(*) AS n_co
  FROM icap a JOIN icap b ON a.it = b.it AND a.u < b.u
  GROUP BY 1, 2),
usim AS (
  SELECT ua, ub, n_co,
         CAST(floor(n_co * {SIM_SCALE} / sqrt(pa.n * pb.n)) AS BIGINT)
           AS cos_micro
  FROM uco JOIN ubask pa ON pa.u = uco.ua
           JOIN ubask pb ON pb.u = uco.ub
  WHERE n_co >= {MIN_CO}),
usym AS (
  SELECT ua AS u, ub AS neighbor, n_co, cos_micro FROM usim
  UNION ALL
  SELECT ub AS u, ua AS neighbor, n_co, cos_micro FROM usim)
SELECT u, neighbor, CAST(n_co AS BIGINT) AS n_co, cos_micro, sim_rank
FROM (SELECT *, row_number() OVER (PARTITION BY u
            ORDER BY cos_micro DESC, neighbor) AS sim_rank
      FROM usym) t
WHERE sim_rank <= {NEIGHBORS_K}
""",
)
def cf_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-user CF neighbor lists — the TRANSPOSED model next to
    ``cf_item_similarity``: binary cosine between customers' baskets
    (shared items / geometric-mean basket size), each user keeping a
    top-{NEIGHBORS_K} neighbor list. Item-based CF serves "people who
    bought this also bought"; user-based serves "customers like you" —
    a complete CF deployment ships both and picks per surface.

    The transposed skew problem gets the transposed valve: pair
    generation runs over at most {POP_CAP} md5-chosen users PER ITEM
    (a hit item otherwise emits |buyers|² pairs — the mirror of the
    basket cap), while cosine norms use the FULL basket sizes, the
    standard subsampled-co-count discipline (co-counts under-estimate
    on capped items; norms stay exact). Same fixed-point floor
    ({SIM_SCALE}-micro) and support floor ({MIN_CO}) as the item
    model, so the whole pipeline replays bit-exact in the oracle.
    Shape: equi-join on item, partial-agg to pairs, two tiny joins for
    the norms, one per-user window rank — Σ min(pop, {POP_CAP})²
    bounds the shuffle linearly in items."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark,
        ("cf_user_model", sf_dir),
        lambda: _build_user_similarity(spark, sf_dir),
    )


def _build_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    inter = interactions(spark, sf_dir)
    # r19 (guide §2.4): the windowed POP_CAP selection + user-pair
    # self-join collapsed into ONE aggregation keyed by it — collect
    # each item's buyers with their md5 tiebreak key, sort in-array,
    # keep the first {POP_CAP} (identical selection to the
    # row_number() window: same (md5, u) order), then emit the
    # (ua < ub) pairs from the u-sorted capped array. The old shape
    # re-ran the icap window on BOTH self-join sides and sorted both
    # join inputs; this is one exchange (the collect) + one pair
    # exchange, no window, no join — counts bit-identical
    # (pytest-pinned vs the windowed classic).
    buyers = inter.groupBy("it").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.md5(F.concat_ws(":", F.col("it"), F.col("u"))).alias("hk"),
                    F.col("u"),
                )
            )
        ).alias("bs")
    )
    capped = buyers.select(
        F.array_sort(
            F.expr(f"transform(slice(bs, 1, {POP_CAP}), x -> x.u)")
        ).alias("us")
    )
    pairs = capped.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(us, (x, i) -> "
                    "transform(slice(us, i + 2, size(us)), "
                    "y -> struct(x AS ua, y AS ub)))"
                )
            )
        ).alias("p")
    ).select("p.ua", "p.ub")
    ubask = inter.groupBy("u").agg(F.count("*").alias("n"))
    uco = (
        pairs.groupBy("ua", "ub")
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= MIN_CO)
    )
    usim = (
        uco.join(ubask.select(F.col("u").alias("ua"), F.col("n").alias("na")), "ua")
        .join(ubask.select(F.col("u").alias("ub"), F.col("n").alias("nb")), "ub")
        .select(
            "ua",
            "ub",
            "n_co",
            F.floor(F.col("n_co") * SIM_SCALE / F.sqrt(F.col("na") * F.col("nb")))
            .cast("bigint")
            .alias("cos_micro"),
        )
        # eager checkpoint before the symmetric union (r18's
        # twice-consumed-aggregate pattern): usym reads usim TWICE, and
        # an unmaterialized usim re-ran the whole pair pipeline per
        # union branch (the before-plan's 48 Exchanges / 19 Windows)
        .localCheckpoint()
    )
    usym = usim.select(
        F.col("ua").alias("u"), F.col("ub").alias("neighbor"), "n_co", "cos_micro"
    ).unionAll(
        usim.select(
            F.col("ub").alias("u"), F.col("ua").alias("neighbor"), "n_co", "cos_micro"
        )
    )
    w = Window.partitionBy("u").orderBy(F.desc("cos_micro"), F.asc("neighbor"))
    return (
        usym.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= NEIGHBORS_K)
        .select(
            "u",
            "neighbor",
            F.col("n_co").cast("bigint").alias("n_co"),
            "cos_micro",
            "sim_rank",
        )
    )


# ---------------------------------------------------------------------
# recommendation coverage / popularity-bias audit
# ---------------------------------------------------------------------
def _rec_coverage_sql() -> str:
    # LAZY (registry convention): wraps the registered recommend-topk
    # oracle as a CTE so the two stay in lockstep by construction
    from mapreducecf_spark.registry import ORACLES

    rec = ORACLES["cf_recommend_topk"]
    rec = rec() if callable(rec) else rec
    return f"""
WITH recs AS ({rec}),
{_INTER_SQL.strip()},
pop AS (SELECT it, CAST(count(*) AS BIGINT) AS n FROM inter GROUP BY 1),
cat AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(n) AS BIGINT) AS n_inter FROM pop),
rs AS (SELECT DISTINCT item FROM recs),
rp AS (SELECT CAST(count(*) AS BIGINT) AS n_rec_items,
              CAST(sum(p.n) AS BIGINT) AS rec_pop
       FROM rs JOIN pop p ON p.it = rs.item)
SELECT (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM recs) AS n_users,
       (SELECT CAST(count(*) AS BIGINT) FROM recs) AS n_recs,
       rp.n_rec_items, cat.n_items,
       CAST(floor(rp.n_rec_items * 1000000.0 / cat.n_items) AS BIGINT)
         AS coverage_ppm,
       CAST(floor((rp.rec_pop * 1.0 / rp.n_rec_items) * 1000000.0
                  / (cat.n_inter * 1.0 / cat.n_items)) AS BIGINT)
         AS pop_lift_ppm
FROM rp, cat
"""


@register("cf_rec_coverage", oracle=_rec_coverage_sql)
def cf_rec_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage and popularity-bias audit of the recommender —
    the two offline metrics a recsys evaluation reports next to
    accuracy: what fraction of the catalog the top-{REC_K} lists ever
    surface (low coverage = a popularity echo chamber starving the
    long tail) and the mean popularity of recommended items relative
    to the catalog mean (pop_lift ≫ 1e6 ppm quantifies the bias
    item-item CF is known for). Evaluating the recommender is itself a
    one-scan aggregation over the (memoized) recommendation output and
    interaction matrix — the audit costs nothing next to the model.

    All ratios are floored to integer ppm with division order written
    identically in both engines; the oracle WRAPS the registered
    recommend-topk oracle as a CTE, so the audited pipeline and the
    audit can never drift apart."""
    recs = cf_recommend_topk(spark, sf_dir)
    inter = interactions(spark, sf_dir)
    pop = inter.groupBy("it").agg(F.count("*").cast("bigint").alias("n"))
    cat = pop.agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("n").cast("bigint").alias("n_inter"),
    )
    rs = recs.select("item").distinct()
    rp = rs.join(pop, rs.item == pop.it).agg(
        F.count("*").cast("bigint").alias("n_rec_items"),
        F.sum("n").cast("bigint").alias("rec_pop"),
    )
    heads = recs.agg(
        F.count_distinct("u").cast("bigint").alias("n_users"),
        F.count("*").cast("bigint").alias("n_recs"),
    )
    return (
        heads.crossJoin(F.broadcast(rp))
        .crossJoin(F.broadcast(cat))
        .select(
            "n_users",
            "n_recs",
            "n_rec_items",
            "n_items",
            F.floor(F.col("n_rec_items") * 1000000.0 / F.col("n_items"))
            .cast("bigint")
            .alias("coverage_ppm"),
            F.floor(
                (F.col("rec_pop") * 1.0 / F.col("n_rec_items"))
                * 1000000.0
                / (F.col("n_inter") * 1.0 / F.col("n_items"))
            )
            .cast("bigint")
            .alias("pop_lift_ppm"),
        )
    )


# ---------------------------------------------------------------------
# deterministic matrix-factorization sweep (implicit feedback)
# ---------------------------------------------------------------------
ALS_RANK = 4  # latent factors
ALS_INIT_HALF = 500_000  # init range ±0.5 in micro (|v|² ≈ 1 at rank 4)
#: the gradient step is DEGREE-AVERAGED (divide by the entity's
#: observation count): scale-free, so a 64-item basket and a 5-item
#: basket take comparably-sized steps and the sweep cannot diverge
#: on high-degree rows (numpy-replica scan: planted SSE ratio 0.67,
#: skewed-degree 0.89; the un-normalized variant diverges)
ALS_SCALE = 1_000_000  # micro fixed point (shared with SIM_SCALE)


def _als_chain_sql(src: str) -> str:
    """The u0→v1 alternating-sweep CTE chain over interaction source
    ``src`` — shared verbatim by the training oracle (src='inter') and
    the fold-in oracle (src='intr', the held-out-user-free split)."""
    init = (
        "CAST(('0x' || substr(md5('{p}:' || {id} || ':' || k), 1, 8))::BIGINT "
        f"% {2 * ALS_INIT_HALF + 1} - {ALS_INIT_HALF} AS BIGINT)"
    )
    uinit = init.format(p="uf", id="u")
    vinit = init.format(p="vf", id="it")
    return f"""ks AS (SELECT k FROM range(0, {ALS_RANK}) t(k)),
u0 AS (SELECT u, k, {uinit} AS val
       FROM (SELECT DISTINCT u FROM {src}) uu CROSS JOIN ks),
v0 AS (SELECT it, k, {vinit} AS val
       FROM (SELECT DISTINCT it FROM {src}) ii CROSS JOIN ks),
err0 AS (
  SELECT i.u, i.it,
         {ALS_SCALE} - CAST(sum(a.val * b.val) AS BIGINT) // {ALS_SCALE}
           AS err
  FROM {src} i
  JOIN u0 a ON a.u = i.u
  JOIN v0 b ON b.it = i.it AND b.k = a.k
  GROUP BY i.u, i.it),
u1 AS (
  SELECT a.u, a.k,
         a.val + CAST(sum(e.err * b.val // {ALS_SCALE}) AS BIGINT)
                   // CAST(count(*) AS BIGINT) AS val
  FROM u0 a
  JOIN err0 e ON e.u = a.u
  JOIN v0 b ON b.it = e.it AND b.k = a.k
  GROUP BY a.u, a.k, a.val),
err1 AS (
  SELECT i.u, i.it,
         {ALS_SCALE} - CAST(sum(a.val * b.val) AS BIGINT) // {ALS_SCALE}
           AS err
  FROM {src} i
  JOIN u1 a ON a.u = i.u
  JOIN v0 b ON b.it = i.it AND b.k = a.k
  GROUP BY i.u, i.it),
v1 AS (
  SELECT b.it, b.k,
         b.val + CAST(sum(e.err * a.val // {ALS_SCALE}) AS BIGINT)
                   // CAST(count(*) AS BIGINT) AS val
  FROM v0 b
  JOIN err1 e ON e.it = b.it
  JOIN u1 a ON a.u = e.u AND a.k = b.k
  GROUP BY b.it, b.k, b.val)"""


def _als_sql() -> str:
    """DuckDB replay of the alternating gradient sweep. Integer `//`
    in DuckDB TRUNCATES toward zero (measured: -7 // 2 = -3), and the
    error terms go negative — so the Spark side uses the identical
    truncating division (double divide + bigint cast; operands stay
    ≤ ~1e12, far inside double's 2^53 exact-integer range, so the
    round-trip cannot move the quotient)."""
    return f"""
WITH {_INTER_SQL.strip()},
{_als_chain_sql('inter')}
SELECT it,
       CAST(max(CASE WHEN k = 0 THEN val END) AS BIGINT) AS f0_micro,
       CAST(max(CASE WHEN k = 1 THEN val END) AS BIGINT) AS f1_micro,
       CAST(max(CASE WHEN k = 2 THEN val END) AS BIGINT) AS f2_micro,
       CAST(max(CASE WHEN k = 3 THEN val END) AS BIGINT) AS f3_micro
FROM v1 GROUP BY it
"""


def _tdiv(a, d):
    """Truncating division replay of DuckDB's integer `//` (toward
    zero, sign-sensitive — the ALS error terms go negative). Operands
    are ≤ ~1e12 — exact in double, so the cast cannot be off by one.
    ``d``: int literal or a Column (the degree-averaged step)."""
    dd = F.lit(float(d)) if isinstance(d, int) else d.cast("double")
    return (a.cast("double") / dd).cast("bigint")


@register("cf_als_factors", oracle=_als_sql)
def cf_als_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic matrix-factorization sweep (VERDICT r07 item 8) —
    the latent-factor model that completes the repo-namesake CF story
    next to the co-occurrence/association models: rank-{ALS_RANK}
    implicit-feedback factorization of the basket-capped interaction
    matrix, trained for one ALTERNATING fixed-point gradient sweep
    (update U against V0 from the full error matrix, then V against
    the updated U1 — the alternating structure of ALS with a gradient
    step in place of the normal-equation solve, which keeps the whole
    sweep an exact integer program both engines replay bit-for-bit).

    Determinism discipline (the k-means/PageRank pattern): factors are
    BIGINT micro units seeded from md5(entity, k); every division is
    the engines' shared TRUNCATING integer division, placed so all
    cross-row sums are integer sums (order-stable); predictions
    truncate once per (u, it), update contributions per term. The planted-matrix pytest
    verifies the sweep actually LEARNS (squared error drops vs the
    init; block structure separates).

    Shape at 100 TB: factor tables are (entities × {ALS_RANK}) narrow
    rows co-partitioned with the interaction matrix on their join
    keys; each half-sweep is two equi-joins + one partial agg — the
    standard distributed-ALS data layout (Koren et al.; Spark MLlib
    ships the same shape with float math and nondeterministic seeds,
    unusable under a cross-engine hash gate). Rows shuffle as bare
    (id, k, bigint). Since r19 the sweep runs fused with the fold-in
    model's cohort-excluded sweep (``_als_factors_tagged``) — this
    query consumes the src='full' half, bit-identical to the
    standalone sweep it previously ran (pytest-pinned)."""
    v1 = _als_factors_tagged(spark, sf_dir).filter(F.col("src") == "full")
    return v1.select(
        "it",
        *[F.col(f"f{k}").cast("bigint").alias(f"f{k}_micro") for k in range(ALS_RANK)],
    )


def _als_init_k(prefix: str, id_col: str, k: int):
    """md5-seeded init for a FIXED factor index k — the wide-table
    variant of the (id, k) rule (identical string, identical value)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(prefix + ":"),
                    F.col(id_col).cast("string"),
                    F.lit(f":{k}"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (h % (2 * ALS_INIT_HALF + 1) - ALS_INIT_HALF).cast("bigint")


def als_sweep(spark: SparkSession, inter: DataFrame, keys: tuple = ()):
    """One alternating fixed-point gradient sweep over an (u, it)
    interaction DataFrame: returns (u1, v1) factor tables in WIDE form
    — one row per entity, factors as columns (u, f0..f{ALS_RANK-1}).

    ``keys`` (r19, the ``_pq_train_fused`` pattern): extra population
    tag columns prepended to every join key and grouping. With
    ``keys=("src",)`` several INDEPENDENT interaction populations train
    in the SAME distributed passes — per src every init, error term,
    degree-averaged step and integer sum is keyed by (src, entity), so
    each population's factors are bit-identical to a standalone
    ``als_sweep`` over just its rows (populations never interact;
    pinned by pytest). With ``keys=()`` the classic single-population
    behavior is unchanged.

    The wide layout is the performance shape (r08 bench: the long
    (id, k, val) formulation exploded every join 4× and paid double
    the shuffles — 9 s vs ~3 s): the dot product and per-factor
    gradient sums are column EXPRESSIONS inside one join + one
    partial-agg groupBy per half-sweep, and the updated factors ride
    the grouping keys so no join-back is needed. Arithmetic is
    bit-identical to the long form the oracle replays (same per-term
    truncating divisions, same integer sums).

    No ``persist()`` here (ADVICE r08): callers pass the
    session-memoized (already persisted) interactions table, and a
    second persist both warned and leaked cache-manager entries per
    invocation. u1 feeds two consumers (the V half-sweep and the
    caller), so it is ``localCheckpoint``-ed instead — eager, lineage
    cut, and its RDD blocks are GC-cleaned by the ContextCleaner
    rather than pinned until an unpersist nobody owns."""
    kc = list(keys)
    u0 = inter.select(*kc, "u").distinct().select(
        *kc, "u", *[_als_init_k("uf", "u", k).alias(f"f{k}") for k in range(ALS_RANK)]
    )
    v0 = inter.select(*kc, "it").distinct().select(
        *kc, "it", *[_als_init_k("vf", "it", k).alias(f"f{k}") for k in range(ALS_RANK)]
    )

    def pref(df, idc: str, p: str) -> DataFrame:
        return df.select(
            *kc, F.col(idc), *[F.col(f"f{k}").alias(f"{p}{k}") for k in range(ALS_RANK)]
        )

    def err_expr():
        dot = None
        for k in range(ALS_RANK):
            term = F.col(f"uf{k}") * F.col(f"vf{k}")
            dot = term if dot is None else dot + term
        return F.lit(ALS_SCALE) - _tdiv(dot, ALS_SCALE)

    def half_sweep(moving_pref: str, fixed_pref: str, moving_id: str,
                   uw: DataFrame, vw: DataFrame) -> DataFrame:
        j = (
            inter.join(pref(uw, "u", "uf"), [*kc, "u"])
            .join(pref(vw, "it", "vf"), [*kc, "it"])
            .withColumn("err", err_expr())
        )
        aggs = [
            F.sum(_tdiv(F.col("err") * F.col(f"{fixed_pref}{k}"), ALS_SCALE)).alias(f"s{k}")
            for k in range(ALS_RANK)
        ] + [F.count("*").alias("n")]
        g = j.groupBy(
            *kc, moving_id, *[F.col(f"{moving_pref}{k}") for k in range(ALS_RANK)]
        ).agg(*aggs)
        return g.select(
            *kc,
            moving_id,
            *[
                (F.col(f"{moving_pref}{k}") + _tdiv(F.col(f"s{k}"), F.col("n")))
                .cast("bigint")
                .alias(f"f{k}")
                for k in range(ALS_RANK)
            ],
        )

    # U-step against V0, then V-step against the UPDATED U1. Every
    # entity row comes FROM inter, so every group has n >= 1.
    from pyspark import StorageLevel

    u1 = half_sweep("uf", "vf", "u", u0, v0).localCheckpoint(
        storageLevel=StorageLevel.DISK_ONLY
    )
    v1 = half_sweep("vf", "uf", "it", u1, v0)
    return u1, v1


# ---------------------------------------------------------------------
# ALS fold-in: the cold-start serving path
# ---------------------------------------------------------------------
FOLDIN_USER_MOD = 10  # custkey % 10 == 0 -> the held-out cold-start cohort
#: served batch size — the md5-capped deterministic query workload
#: (similarity.QUERY_CAP discipline): the fold-in GRADIENT runs for the
#: whole cohort (that table is the artifact), but the exhaustive
#: user × catalog scoring matmul is a QUERY, and serving all 10% of
#: users against every item measured 20 s of the row's 26 s at sf0.1
FOLDIN_BATCH = 32


def _als_foldin_sql() -> str:
    init = (
        "CAST(('0x' || substr(md5('uf:' || u || ':' || k), 1, 8))::BIGINT "
        f"% {2 * ALS_INIT_HALF + 1} - {ALS_INIT_HALF} AS BIGINT)"
    )
    return f"""
WITH {_INTER_SQL.strip()},
newu AS (SELECT u, it FROM inter WHERE u % {FOLDIN_USER_MOD} = 0),
intr AS (SELECT u, it FROM inter WHERE u % {FOLDIN_USER_MOD} <> 0),
{_als_chain_sql('intr')},
u0n AS (SELECT u, k, {init} AS val
        FROM (SELECT DISTINCT u FROM newu) uu CROSS JOIN ks),
errn AS (
  SELECT i.u, i.it,
         {ALS_SCALE} - CAST(sum(a.val * b.val) AS BIGINT) // {ALS_SCALE}
           AS err
  FROM newu i
  JOIN u0n a ON a.u = i.u
  JOIN v1 b ON b.it = i.it AND b.k = a.k
  GROUP BY i.u, i.it),
ufold AS (
  SELECT a.u, a.k,
         a.val + CAST(sum(e.err * b.val // {ALS_SCALE}) AS BIGINT)
                   // CAST(count(*) AS BIGINT) AS val
  FROM u0n a
  JOIN errn e ON e.u = a.u
  JOIN v1 b ON b.it = e.it AND b.k = a.k
  GROUP BY a.u, a.k, a.val),
qb AS (SELECT u FROM (SELECT DISTINCT u FROM newu) t
       ORDER BY md5(CAST(u AS VARCHAR)), u LIMIT {FOLDIN_BATCH}),
allscore AS (
  SELECT f.u, v.it,
         CAST(sum(f.val * v.val) AS BIGINT) // {ALS_SCALE} AS score_micro
  FROM ufold f JOIN qb USING (u) JOIN v1 v ON v.k = f.k
  GROUP BY f.u, v.it),
unowned AS (
  SELECT s.u, s.it, s.score_micro
  FROM allscore s LEFT JOIN newu own ON own.u = s.u AND own.it = s.it
  WHERE own.it IS NULL)
SELECT u, it AS item, score_micro, rec_rank
FROM (SELECT *, row_number() OVER (PARTITION BY u
              ORDER BY score_micro DESC, it) AS rec_rank
      FROM unowned) t
WHERE rec_rank <= {REC_K}
"""


def _als_factors_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized TAGGED trained item factors
    (src, it, f0..f{ALS_RANK-1}) for BOTH trained populations —
    ``full`` (every interaction: ``cf_als_factors``' sweep) and
    ``trainx`` (the fold-in cohort u ≡ 0 mod {FOLDIN_USER_MOD}
    excluded: the fold-in serving model) — trained in ONE alternating
    sweep keyed by src (r19, VERDICT r18 #3 — the ``_pq_train_fused``
    pattern applied to ``als_sweep``). The populations share ~90% of
    their rows, so the two previously separate sweeps (two full
    driver-sequenced join+agg chains) re-shuffled nearly the same data
    twice; the tagged sweep moves the same total row volume through
    HALF the job chain. Per src the factors are bit-identical to the
    standalone sweep (pytest-pinned), so both consumers' oracles
    replay unchanged."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        tagged = interactions(spark, sf_dir).select(
            F.explode(
                F.when(
                    F.col("u") % FOLDIN_USER_MOD != 0,
                    F.array(F.lit("full"), F.lit("trainx")),
                ).otherwise(F.array(F.lit("full")))
            ).alias("src"),
            "u",
            "it",
        )
        return als_sweep(spark, tagged, keys=("src",))[1]

    return session_memo(spark, ("cf_als_v1", sf_dir), build)


def foldin_item_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED item factors with the fold-in cohort excluded from the
    sweep — the broadcast serving model BOTH fold-in rows (batch
    ``cf_als_foldin`` and streaming ``stream_als_foldin``) consume.
    Since r19 a cheap filter of the fused tagged sweep (one persisted
    artifact serves this AND ``cf_als_factors``); the training cost
    stays in the shared prewarm phase (r14: the streaming twin's 9.7 s
    bench slot was ~half a redundant retrain), exactly the
    train-once/serve-many split a production recommender runs."""
    return (
        _als_factors_tagged(spark, sf_dir)
        .filter(F.col("src") == "trainx")
        .select("it", *[f"f{k}" for k in range(ALS_RANK)])
    )


@register("cf_als_foldin", oracle=_als_foldin_sql)
def cf_als_foldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS FOLD-IN — the cold-start serving path that completes the
    latent-factor lifecycle (train: ``cf_als_factors``; serve known
    users: ``cf_recommend_topk``; this: serve users the trainer never
    saw). Users in the held-out cohort (custkey ≡ 0 mod
    {FOLDIN_USER_MOD}) are EXCLUDED from the training sweep; each then
    folds in with one degree-averaged gradient step against the FIXED
    trained item factors over their own basket — the standard fold-in
    (Sarwar et al. incremental SVD shape, ALS flavor: new-entity
    half-sweep with the other side frozen). The md5-capped
    {FOLDIN_BATCH}-user query batch (the similarity.QUERY_CAP
    discipline) then gets top-{REC_K} recommendations by truncated
    integer dot against every trained item, anti-joined on its
    baskets — the gradient is index-time work for the WHOLE cohort,
    the exhaustive user × catalog matmul is a bounded query workload
    (unbounded it measured 20 s of the row's 26 s at sf0.1).

    Same determinism discipline as the sweep: md5 micro init (the
    identical 'uf:' seeds training would have used), integer sums,
    shared truncating division — bit-replayable in SQL. Items only the
    cohort interacted with are absent from the trained factors and
    drop from both the gradient and the candidate set (inner joins,
    both engines).

    At 100 TB: the trained item-factor table is the broadcast serving
    model (items × rank, domain-bounded); fold-in is one narrow join +
    partial agg over the NEW users' interactions only — no retrain,
    exactly how a production recommender absorbs signups between
    scheduled sweeps."""
    inter = interactions(spark, sf_dir)
    newu = F.col("u") % FOLDIN_USER_MOD == 0
    inter_new = inter.filter(newu)
    v1 = foldin_item_factors(spark, sf_dir)

    u0n = inter_new.select("u").distinct().select(
        "u", *[_als_init_k("uf", "u", k).alias(f"uf{k}") for k in range(ALS_RANK)]
    )
    vpref = v1.select(
        "it", *[F.col(f"f{k}").alias(f"vf{k}") for k in range(ALS_RANK)]
    )
    dot = None
    for k in range(ALS_RANK):
        term = F.col(f"uf{k}") * F.col(f"vf{k}")
        dot = term if dot is None else dot + term
    j = (
        inter_new.join(u0n, "u")
        .join(vpref, "it")
        .withColumn("err", F.lit(ALS_SCALE) - _tdiv(dot, ALS_SCALE))
    )
    g = j.groupBy("u", *[F.col(f"uf{k}") for k in range(ALS_RANK)]).agg(
        *[
            F.sum(_tdiv(F.col("err") * F.col(f"vf{k}"), ALS_SCALE)).alias(f"s{k}")
            for k in range(ALS_RANK)
        ],
        F.count("*").alias("n"),
    )
    ufold = g.select(
        "u",
        *[
            (F.col(f"uf{k}") + _tdiv(F.col(f"s{k}"), F.col("n")))
            .cast("bigint")
            .alias(f"uf{k}")
            for k in range(ALS_RANK)
        ],
    )
    qb = (
        inter_new.select("u")
        .distinct()
        .withColumn("hk", F.md5(F.col("u").cast("string")))
        .orderBy("hk", "u")
        .limit(FOLDIN_BATCH)
        .select("u")
    )
    scored = (
        ufold.join(F.broadcast(qb), "u")
        .crossJoin(F.broadcast(vpref))
        .select("u", "it", _tdiv(dot, ALS_SCALE).alias("score_micro"))
        .join(inter_new, ["u", "it"], "left_anti")
    )
    w = Window.partitionBy("u").orderBy(F.desc("score_micro"), F.asc("it"))
    return (
        scored.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= REC_K)
        .select("u", F.col("it").alias("item"), "score_micro", "rec_rank")
    )


# ---------------------------------------------------------------------
# offline holdout evaluation (r15): recall@K / NDCG@K of the item-item
# recommender against a held-out interaction split — the eval stage a
# production CF pipeline gates model promotion on
# ---------------------------------------------------------------------
#: hex nibbles of md5('ev:'||u||':'||it) held out as TEST (~3/16 = 19%)
EVAL_TEST_NIBBLES = ("0", "1", "2")
#: DCG rank weights in micro-units, round(1e6 / log2(rank+1)) for rank
#: 1..REC_K — computed ONCE in Python and embedded as plan literals in
#: BOTH engines, so no cross-engine log/float enters the metric
_NDCG_W = [round(1_000_000 / __import__("math").log2(r + 1)) for r in range(1, REC_K + 1)]
#: ideal-DCG prefix sums: IDCG@K for min(n_test, K) = 1..REC_K
_NDCG_IDEAL = [sum(_NDCG_W[: i + 1]) for i in range(REC_K)]


def _eval_split(spark: SparkSession, sf_dir: str):
    """(train, test) interaction split by the deterministic md5 'ev:'
    rule — one definition for the promotion gate, the baseline
    ablation, and the memoized train-split model."""
    inter = interactions(spark, sf_dir)
    is_test = _ev_is_test()
    return inter.filter(~is_test), inter.filter(is_test)


def _eval_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized TRAIN split of the eval holdout — referenced
    by FOUR plan branches per eval query (model scoring, ownership
    anti-joins, both baseline pools), each of which is a separate
    broadcast subtree the engine executes independently; before the
    memo cf_eval_baselines additionally paid one eager localCheckpoint
    job per invocation to keep those branches from re-filtering
    (r18 opt, guide §2.4/§5: checkpoint-per-call → build-once
    persisted artifact, like every other family intermediate)."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark,
        ("cf_eval_train", sf_dir),
        lambda: _eval_split(spark, sf_dir)[0],
    )


def _eval_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized TRAIN-SPLIT item-item model — the expensive
    half of the eval family (the co-occurrence pass costs what the
    shipped model costs), consumed by BOTH cf_eval_holdout and
    cf_eval_baselines (which re-runs the holdout for its itemcf row);
    without the memo the ablation paid the train model twice.
    prewarm.py carries the build. The train split is derived HERE
    from the one canonical ``_eval_split`` rule (ADVICE r15: an
    arbitrary caller-supplied split under a split-blind memo key
    could silently serve the first-built model to a different
    split)."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        # consume the fused pair pass (r18): a pair's n_co_tr counts
        # exactly the events with BOTH sides in train, so this is
        # row-identical to _sim_of(train) without re-running the
        # family's heavy self-join (pytest-pinned)
        pairs = pair_counts(spark, sf_dir).filter(F.col("n_co_tr") >= MIN_CO)
        pop_tr = (
            _eval_train(spark, sf_dir).groupBy("it").agg(F.count("*").alias("n"))
        )
        # eager checkpoint before _model_of's symmetric union (r19):
        # unmaterialized, the (pairs ⋈ pop ⋈ pop) cosine subtree ran
        # once per union branch (the before-plan's 49 Exchanges /
        # 911 lines); the shipped model's equivalent input is the
        # cf_sim session memo, this is the train-split twin
        return _model_of(_sim_from_counts(pairs, pop_tr, "n_co_tr").localCheckpoint())

    return session_memo(spark, ("cf_eval_model", sf_dir), build)


def _eval_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized (u, n_test) eval-batch base table — every eval
    row (holdout, baselines ×3 branches, k-sweep) left-joins its
    per-user metrics against this one tiny table; un-memoized it was
    re-aggregated inside each branch's broadcast subtree (r18 opt)."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        train, test = _eval_split(spark, sf_dir)
        batch_tr = train.filter(F.col("u") % QUERY_USER_MOD == 0)
        batch_te = test.filter(F.col("u") % QUERY_USER_MOD == 0)
        return (
            batch_tr.groupBy("u")
            .agg(F.count("*").alias("n_train"))
            .join(batch_te.groupBy("u").agg(F.count("*").alias("n_test")), "u")
            .select("u", "n_test")
        )

    return session_memo(spark, ("cf_eval_base", sf_dir), build)


def _eval_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized top-{REC_K} eval recommendation table
    (u, cand, rec_rank) — THE scoring pass of the eval family
    (batch ⋈ model ⋈ ownership anti-join ⋈ rank window), previously
    re-executed by cf_eval_holdout, cf_eval_baselines' itemcf branch
    AND cf_eval_k_sweep (r18 opt, VERDICT r17 #2's named suspect: the
    eval family's shared-model CONSUMPTION was the un-memoized part).
    {REC_K} rows per batch user — the persisted-recs artifact a real
    eval suite scores against."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        train = _eval_train(spark, sf_dir)
        model = _eval_model(spark, sf_dir).select(
            F.col("it").alias("owned"), F.col("neighbor").alias("cand"), "cos_micro"
        )
        batch_tr = train.filter(F.col("u") % QUERY_USER_MOD == 0)
        scored = (
            batch_tr.join(model, batch_tr.it == model.owned)
            .join(
                train.select("u", F.col("it").alias("cand")),
                ["u", "cand"],
                "left_anti",
            )
            .groupBy("u", "cand")
            .agg(F.sum("cos_micro").cast("bigint").alias("score_micro"))
        )
        w = Window.partitionBy("u").orderBy(F.desc("score_micro"), F.asc("cand"))
        return (
            scored.withColumn("rec_rank", F.row_number().over(w))
            .filter(F.col("rec_rank") <= REC_K)
            .select("u", "cand", "rec_rank")
        )

    return session_memo(spark, ("cf_eval_recs", sf_dir), build)


def _eval_rec_table(spark: SparkSession, sf_dir: str):
    """(base, hit_ranks) for the holdout eval family — base =
    (u, n_test) for the batch users with held-out items, hit_ranks =
    (u, rec_rank) for every top-{REC_K} recommendation that hit a
    held-out item. ONE definition of split/model/score/rank consumed
    by cf_eval_holdout AND the k-sweep (the widest pass both read —
    sweep points are filters over rec_rank, never a re-scoring).
    Since r18 base and the scoring pass are session-memoized
    artifacts; only the tiny hits join is built per caller."""
    test = _eval_split(spark, sf_dir)[1]
    batch_te = test.filter(F.col("u") % QUERY_USER_MOD == 0)
    hit_ranks = _eval_recs(spark, sf_dir).join(
        batch_te.select("u", F.col("it").alias("cand")), ["u", "cand"]
    ).select("u", "rec_rank")
    return _eval_base(spark, sf_dir), hit_ranks


def _eval_holdout_sql() -> str:
    test_pred = (
        "substr(md5('ev:' || u || ':' || it), 1, 1) IN ("
        + ", ".join(f"'{n}'" for n in EVAL_TEST_NIBBLES)
        + ")"
    )
    dcg_case = " ".join(
        f"WHEN {r + 1} THEN {w}" for r, w in enumerate(_NDCG_W)
    )
    idcg_case = " ".join(
        f"WHEN {i + 1} THEN {p}" for i, p in enumerate(_NDCG_IDEAL)
    )
    return f"""
WITH {_INTER_SQL.strip()},
test AS (SELECT u, it FROM inter WHERE {test_pred}),
train AS (SELECT u, it FROM inter WHERE NOT ({test_pred})),
{_SIM_SQL.replace("inter", "train").strip()},
{_MODEL_SQL.strip()},
batch_tr AS (SELECT u, it FROM train WHERE u % {QUERY_USER_MOD} = 0),
batch_te AS (SELECT u, it FROM test WHERE u % {QUERY_USER_MOD} = 0),
base AS (
  SELECT tr.u, te.n_test
  FROM (SELECT u, count(*) AS n_train FROM batch_tr GROUP BY u) tr
  JOIN (SELECT u, count(*) AS n_test FROM batch_te GROUP BY u) te
    ON te.u = tr.u),
scored AS (
  SELECT b.u, s.neighbor AS cand,
         CAST(sum(s.cos_micro) AS BIGINT) AS score_micro
  FROM batch_tr b JOIN model s ON s.it = b.it
  LEFT JOIN train own ON own.u = b.u AND own.it = s.neighbor
  WHERE own.it IS NULL
  GROUP BY b.u, s.neighbor),
recs AS (
  SELECT u, cand, rec_rank
  FROM (SELECT *, row_number() OVER (PARTITION BY u
               ORDER BY score_micro DESC, cand) AS rec_rank
        FROM scored) t
  WHERE rec_rank <= {REC_K}),
hitagg AS (
  SELECT r.u, CAST(count(*) AS BIGINT) AS hits,
         CAST(sum(CASE r.rec_rank {dcg_case} END) AS BIGINT) AS dcg_micro
  FROM recs r JOIN batch_te t ON t.u = r.u AND t.it = r.cand
  GROUP BY r.u)
SELECT b.u,
       CAST(b.n_test AS BIGINT) AS n_test,
       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       CAST(coalesce(h.hits, 0) * 1000000
            // least(b.n_test, {REC_K}) AS BIGINT) AS recall_micro,
       CAST(coalesce(h.dcg_micro, 0) * 1000000
            // (CASE least(b.n_test, {REC_K}) {idcg_case} END)
            AS BIGINT) AS ndcg_micro
FROM base b LEFT JOIN hitagg h ON h.u = b.u
"""


@register("cf_eval_holdout", oracle=_eval_holdout_sql())
def cf_eval_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline holdout evaluation of the item-item recommender —
    the model-promotion gate every production CF pipeline runs before
    shipping a retrained model: hold out ~19% of interactions by a
    deterministic md5 split (seeded 'ev:' so it is independent of the
    basket-cap hash), train the SAME co-occurrence → cosine →
    top-{NEIGHBORS_K} model on the train split only (through the
    shared _sim_of/_model_of builders — zero pipeline drift between
    the shipped model and the evaluated one), recommend top-{REC_K}
    for the standard user batch from train baskets (anti-joining only
    TRAIN-owned items — held-out items must stay recommendable), and
    score per user against the held-out items:

    - hits = |recs ∩ test|,
    - recall_micro = hits·1e6 div min(n_test, {REC_K}) (the capped
      recall@K every CF eval suite reports),
    - ndcg_micro = DCG·1e6 div IDCG with rank weights
      round(1e6/log2(r+1)) precomputed in PYTHON and embedded as plan
      literals in both engines — the metric is pure bigint arithmetic,
      no cross-engine log or float division anywhere.

    Users with no scoreable recommendations keep their row (left
    join, zeros): an eval that silently drops cold users reports the
    wrong number. 100 TB posture: the train model costs what the
    shipped model costs (Σ basket² bounded by the cap); scoring is
    |batch| × basket × {NEIGHBORS_K}; the metric join touches
    {REC_K}-row-per-user tables."""
    base, hit_ranks = _eval_rec_table(spark, sf_dir)
    wts = F.array(*[F.lit(x) for x in _NDCG_W])
    hitagg = hit_ranks.groupBy("u").agg(
        F.count("*").cast("bigint").alias("hits"),
        F.sum(F.element_at(wts, F.col("rec_rank"))).cast("bigint").alias("dcg_micro"),
    )
    ideal = F.array(*[F.lit(x) for x in _NDCG_IDEAL])
    k_eff = F.least(F.col("n_test"), F.lit(REC_K)).cast("int")
    return (
        base.join(hitagg, "u", "left")
        .select(
            "u",
            F.col("n_test").cast("bigint").alias("n_test"),
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
            F.expr(f"CAST(coalesce(hits, 0) * 1000000 div least(n_test, {REC_K}) AS BIGINT)").alias(
                "recall_micro"
            ),
            (
                F.coalesce("dcg_micro", F.lit(0)) * F.lit(1000000)
            ).cast("bigint").alias("_num"),
            F.element_at(ideal, k_eff).cast("bigint").alias("_idcg"),
        )
        .select(
            "u",
            "n_test",
            "hits",
            "recall_micro",
            F.expr("CAST(_num div _idcg AS BIGINT)").alias("ndcg_micro"),
        )
    )


# ---------------------------------------------------------------------
# baseline ablation for the holdout eval (r15 continuation): the same
# metrics for popularity and a deterministic-random floor
# ---------------------------------------------------------------------
#: candidate-pool size for the non-personalized baselines: the global
#: top-POP_POOL items. REC_K + BASKET_CAP guarantees the pool NEVER
#: starves — a batch user owns at most BASKET_CAP train items (the
#: interactions cap), so at least REC_K candidates always survive the
#: owned anti-join. The pool cut is part of the baseline's semantics,
#: replayed in the oracle.
POP_POOL = REC_K + BASKET_CAP


def _eval_baselines_sql() -> str:
    test_pred = (
        "substr(md5('ev:' || u || ':' || it), 1, 1) IN ("
        + ", ".join(f"'{n}'" for n in EVAL_TEST_NIBBLES)
        + ")"
    )
    dcg_case = " ".join(f"WHEN {r + 1} THEN {w}" for r, w in enumerate(_NDCG_W))
    idcg_case = " ".join(f"WHEN {i + 1} THEN {p}" for i, p in enumerate(_NDCG_IDEAL))
    pools = {
        "popularity": f"""(
  SELECT it, row_number() OVER (ORDER BY pop DESC, it) AS prank
  FROM (SELECT it, count(*) AS pop FROM train GROUP BY it) t
  QUALIFY prank <= {POP_POOL})""",
        "random_md5": f"""(
  SELECT it, row_number() OVER (ORDER BY md5('rb:' || it), it) AS prank
  FROM (SELECT DISTINCT it FROM train) t
  QUALIFY prank <= {POP_POOL})""",
    }
    blocks = []
    finals = ["SELECT * FROM itemcf"]
    for name, pool in pools.items():
        tag = name[:3]
        blocks.append(f"""
pool_{tag} AS MATERIALIZED {pool},
recs_{tag} AS (
  SELECT u, it, rec_rank FROM (
    SELECT b.u, p.it,
           row_number() OVER (PARTITION BY b.u ORDER BY p.prank) AS rec_rank
    FROM base b JOIN pool_{tag} p ON TRUE
    LEFT JOIN train own ON own.u = b.u AND own.it = p.it
    WHERE own.it IS NULL) z
  WHERE rec_rank <= {REC_K}),
hit_{tag} AS (
  SELECT r.u, CAST(count(*) AS BIGINT) AS hits,
         CAST(sum(CASE r.rec_rank {dcg_case} END) AS BIGINT) AS dcg_micro
  FROM recs_{tag} r JOIN batch_te t ON t.u = r.u AND t.it = r.it
  GROUP BY r.u),
perq_{tag} AS (
  SELECT b.u,
         CAST(coalesce(h.hits, 0) * 1000000
              // least(b.n_test, {REC_K}) AS BIGINT) AS recall_micro,
         CAST(coalesce(h.dcg_micro, 0) * 1000000
              // (CASE least(b.n_test, {REC_K}) {idcg_case} END)
              AS BIGINT) AS ndcg_micro
  FROM base b LEFT JOIN hit_{tag} h ON h.u = b.u),
agg_{tag} AS (
  SELECT '{name}' AS recommender,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(recall_micro) // count(*) AS BIGINT) AS mean_recall_micro,
         CAST(sum(ndcg_micro) // count(*) AS BIGINT) AS mean_ndcg_micro
  FROM perq_{tag})""")
        finals.append(f"SELECT * FROM agg_{tag}")
    return f"""
WITH ih AS MATERIALIZED ({_eval_holdout_sql()}
),
itemcf AS (
  SELECT 'itemcf' AS recommender,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(recall_micro) // count(*) AS BIGINT) AS mean_recall_micro,
         CAST(sum(ndcg_micro) // count(*) AS BIGINT) AS mean_ndcg_micro
  FROM ih),
{_INTER_SQL.strip()},
test AS (SELECT u, it FROM inter WHERE {test_pred}),
train AS (SELECT u, it FROM inter WHERE NOT ({test_pred})),
batch_tr AS (SELECT u, it FROM train WHERE u % {QUERY_USER_MOD} = 0),
batch_te AS (SELECT u, it FROM test WHERE u % {QUERY_USER_MOD} = 0),
base AS (
  SELECT tr.u, te.n_test
  FROM (SELECT u, count(*) AS n_train FROM batch_tr GROUP BY u) tr
  JOIN (SELECT u, count(*) AS n_test FROM batch_te GROUP BY u) te
    ON te.u = tr.u),{','.join(blocks)}
{chr(10).join(f if i == 0 else 'UNION ALL' + chr(10) + f for i, f in enumerate(finals))}
"""


@register("cf_eval_baselines", oracle=_eval_baselines_sql)
def cf_eval_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BASELINE ABLATION every recommender eval table leads with —
    the same holdout metrics (mean recall@{REC_K} / NDCG@{REC_K} over
    the eval user batch) for THREE recommenders side by side: the
    shipped item-item CF model (per-user rows aggregated from
    ``cf_eval_holdout`` — one definition, so the ablation can never
    drift from the promotion gate), the POPULARITY baseline (global
    top-{POP_POOL} train items by interaction count, owned items
    anti-joined away — the bar any personalized model must clear), and
    a DETERMINISTIC-RANDOM floor (items ranked by md5('rb:'||it) —
    what chance alone scores, without a cross-engine RNG). A CF model
    that does not beat popularity is a regression no per-model number
    reveals; this row makes the comparison a single query.

    All-integer metrics: per-user recall/NDCG are the holdout's exact
    bigint micro forms; the means are sum div count. The candidate
    pools are {POP_POOL}-row TakeOrdered tables broadcast into the
    user batch ({POP_POOL} = REC_K + BASKET_CAP, so the owned
    anti-join can never starve a user below {REC_K} candidates — the
    pool cut is declared semantics, replayed in the oracle). 100 TB
    posture: the itemcf half costs what the promotion gate already
    costs (and shares its session memo); each baseline adds ONE
    global item count (map-side combinable) + a batch-sized broadcast
    join — the cheap part of any eval suite."""
    ih = cf_eval_holdout(spark, sf_dir)

    def _mean_row(perq: DataFrame, name: str) -> DataFrame:
        return perq.agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.expr("CAST(sum(recall_micro) div count(*) AS BIGINT)").alias(
                "mean_recall_micro"
            ),
            F.expr("CAST(sum(ndcg_micro) div count(*) AS BIGINT)").alias(
                "mean_ndcg_micro"
            ),
        ).select(
            F.lit(name).alias("recommender"),
            "n_users",
            "mean_recall_micro",
            "mean_ndcg_micro",
        )

    out = _mean_row(ih, "itemcf")
    # memoized split + base (r18 opt): the train table is referenced by
    # FOUR broadcast subtrees below (two pools, two ownership
    # anti-joins) and base by two — the per-call localCheckpoint this
    # replaced paid one blocking job per bench slot and the
    # un-memoized base re-aggregated inside every branch
    train = _eval_train(spark, sf_dir)
    test = _eval_split(spark, sf_dir)[1]
    batch_te = test.filter(F.col("u") % QUERY_USER_MOD == 0)
    base = _eval_base(spark, sf_dir)
    w_pool_pop = Window.orderBy(F.desc("pop"), F.asc("it"))
    pool_pop = (
        train.groupBy("it")
        .agg(F.count("*").alias("pop"))
        .withColumn("prank", F.row_number().over(w_pool_pop))
        .filter(F.col("prank") <= POP_POOL)
        .select("it", "prank")
    )
    w_pool_rnd = Window.orderBy(F.md5(F.concat(F.lit("rb:"), F.col("it"))), F.asc("it"))
    pool_rnd = (
        train.select("it")
        .distinct()
        .withColumn("prank", F.row_number().over(w_pool_rnd))
        .filter(F.col("prank") <= POP_POOL)
        .select("it", "prank")
    )
    wts = F.array(*[F.lit(x) for x in _NDCG_W])
    ideal = F.array(*[F.lit(x) for x in _NDCG_IDEAL])
    k_eff = F.least(F.col("n_test"), F.lit(REC_K)).cast("int")
    w_rec = Window.partitionBy("u").orderBy(F.asc("prank"))
    for name, pool in (("popularity", pool_pop), ("random_md5", pool_rnd)):
        recs = (
            base.select("u")
            .crossJoin(F.broadcast(pool))
            .join(train, ["u", "it"], "left_anti")
            .withColumn("rec_rank", F.row_number().over(w_rec))
            .filter(F.col("rec_rank") <= REC_K)
            .select("u", "it", "rec_rank")
        )
        hitagg = (
            recs.join(batch_te.select("u", "it"), ["u", "it"])
            .groupBy("u")
            .agg(
                F.count("*").cast("bigint").alias("hits"),
                F.sum(F.element_at(wts, F.col("rec_rank")))
                .cast("bigint")
                .alias("dcg_micro"),
            )
        )
        perq = (
            base.join(hitagg, "u", "left")
            .select(
                "u",
                F.expr(
                    f"CAST(coalesce(hits, 0) * 1000000 div least(n_test, {REC_K}) AS BIGINT)"
                ).alias("recall_micro"),
                (F.coalesce("dcg_micro", F.lit(0)) * F.lit(1000000))
                .cast("bigint")
                .alias("_num"),
                F.element_at(ideal, k_eff).cast("bigint").alias("_idcg"),
            )
            .select(
                "u",
                "recall_micro",
                F.expr("CAST(_num div _idcg AS BIGINT)").alias("ndcg_micro"),
            )
        )
        out = out.unionByName(_mean_row(perq, name))
    return out


# ---------------------------------------------------------------------
# recall/NDCG @k tuning curve (r16) — the eval family's sweep row:
# one widest rec table, every k a filter (the nprobe/ef/threshold
# sweep pattern applied to the promotion gate)
# ---------------------------------------------------------------------
#: sweep cutoffs; all <= REC_K so the top-{REC_K} rec table IS the
#: widest pass and no point re-scores anything
EVAL_SWEEP_KS = (1, 2, 3, 5)


def _eval_k_sweep_sql() -> str:
    test_pred = (
        "substr(md5('ev:' || u || ':' || it), 1, 1) IN ("
        + ", ".join(f"'{n}'" for n in EVAL_TEST_NIBBLES)
        + ")"
    )
    dcg_case = " ".join(f"WHEN {r + 1} THEN {w}" for r, w in enumerate(_NDCG_W))
    idcg_case = " ".join(
        f"WHEN {i + 1} THEN {p}" for i, p in enumerate(_NDCG_IDEAL)
    )
    ks = ", ".join(str(k) for k in EVAL_SWEEP_KS)
    return f"""
WITH {_INTER_SQL.strip()},
test AS (SELECT u, it FROM inter WHERE {test_pred}),
train AS (SELECT u, it FROM inter WHERE NOT ({test_pred})),
{_SIM_SQL.replace("inter", "train").strip()},
{_MODEL_SQL.strip()},
batch_tr AS (SELECT u, it FROM train WHERE u % {QUERY_USER_MOD} = 0),
batch_te AS (SELECT u, it FROM test WHERE u % {QUERY_USER_MOD} = 0),
base AS (
  SELECT tr.u, te.n_test
  FROM (SELECT u, count(*) AS n_train FROM batch_tr GROUP BY u) tr
  JOIN (SELECT u, count(*) AS n_test FROM batch_te GROUP BY u) te
    ON te.u = tr.u),
scored AS (
  SELECT b.u, s.neighbor AS cand,
         CAST(sum(s.cos_micro) AS BIGINT) AS score_micro
  FROM batch_tr b JOIN model s ON s.it = b.it
  LEFT JOIN train own ON own.u = b.u AND own.it = s.neighbor
  WHERE own.it IS NULL
  GROUP BY b.u, s.neighbor),
recs AS (
  SELECT u, cand, rec_rank
  FROM (SELECT *, row_number() OVER (PARTITION BY u
               ORDER BY score_micro DESC, cand) AS rec_rank
        FROM scored) t
  WHERE rec_rank <= {REC_K}),
hitranks AS (
  SELECT r.u, r.rec_rank
  FROM recs r JOIN batch_te t ON t.u = r.u AND t.it = r.cand),
ks AS (SELECT CAST(unnest([{ks}]) AS INT) AS k),
peruser AS (
  SELECT k.k, b.u, b.n_test,
         CAST(count(h.rec_rank) AS BIGINT) AS hits,
         CAST(coalesce(sum(CASE h.rec_rank {dcg_case} END), 0) AS BIGINT)
           AS dcg_micro
  FROM base b CROSS JOIN ks k
  LEFT JOIN hitranks h ON h.u = b.u AND h.rec_rank <= k.k
  GROUP BY 1, 2, 3),
met AS (
  SELECT k, u,
         hits * 1000000 // least(n_test, k) AS rec_micro,
         dcg_micro * 1000000 // (CASE least(n_test, k) {idcg_case} END)
           AS ndcg_micro
  FROM peruser)
SELECT k, CAST(count(*) AS BIGINT) AS n_users,
       CAST((2 * sum(rec_micro) + count(*)) // (2 * count(*)) AS BIGINT)
         AS mean_recall_micro,
       CAST((2 * sum(ndcg_micro) + count(*)) // (2 * count(*)) AS BIGINT)
         AS mean_ndcg_micro
FROM met GROUP BY 1
"""


@register("cf_eval_k_sweep", oracle=_eval_k_sweep_sql)
def cf_eval_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k / NDCG@k TUNING CURVE over the holdout eval — the
    how-many-recommendations-do-we-actually-need question answered
    from ONE widest pass: the top-{REC_K} rec table (shared with
    cf_eval_holdout via _eval_rec_table, model memoized) is computed
    once, and every sweep point k ∈ {EVAL_SWEEP_KS} is a FILTER on
    rec_rank — the nprobe/ef/threshold sweep pattern applied to the
    promotion gate. Per k: batch-mean recall_micro and ndcg_micro,
    per-user metrics the exact-bigint holdout arithmetic (rank-weight
    plan literals, `div` quotients), means half-up integer — zero
    floats end to end.

    The k={REC_K} point is ANCHORED by pytest to cf_eval_holdout's own
    per-user rows aggregated in pure Python (the sweep's widest point
    IS the gate, not a re-scoring; note the reported MEANS need not be
    monotone in k — recall@k's denominator min(n_test, k) grows with
    the numerator). 100 TB posture: the sweep adds |ks| × batch rows
    of pure filtering on top of the eval the gate already runs."""
    base, hit_ranks = _eval_rec_table(spark, sf_dir)
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(int(k)) for k in EVAL_SWEEP_KS])).alias("k")
    ).select(F.col("k").cast("int").alias("k"))
    wts = F.array(*[F.lit(x) for x in _NDCG_W])
    ideal = F.array(*[F.lit(x) for x in _NDCG_IDEAL])
    h = hit_ranks.select(F.col("u").alias("h_u"), "rec_rank")
    peruser = (
        base.crossJoin(F.broadcast(ks))
        .join(
            h,
            (F.col("h_u") == F.col("u")) & (F.col("rec_rank") <= F.col("k")),
            "left",
        )
        .groupBy("k", "u", "n_test")
        .agg(
            F.count("rec_rank").cast("bigint").alias("hits"),
            # explicit null-guard: element_at with a NULL index
            # returns NULL (which sum already skips) — the guard just
            # keeps the zero-hit contribution visibly 0 rather than
            # relying on sum's null-skipping
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("rec_rank").isNotNull(),
                        F.element_at(wts, F.col("rec_rank")),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("dcg_micro"),
        )
    )
    k_eff = F.least(F.col("n_test"), F.col("k")).cast("int")
    met = peruser.select(
        "k",
        "u",
        F.expr("hits * 1000000 div least(n_test, k)").alias("rec_micro"),
        (F.col("dcg_micro") * F.lit(1000000)).cast("bigint").alias("_num"),
        F.element_at(ideal, k_eff).cast("bigint").alias("_idcg"),
    ).select(
        "k",
        "u",
        "rec_micro",
        F.expr("CAST(_num div _idcg AS BIGINT)").alias("ndcg_micro"),
    )
    return met.groupBy("k").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.expr(
            "CAST((2 * sum(rec_micro) + count(*)) div (2 * count(*)) AS BIGINT)"
        ).alias("mean_recall_micro"),
        F.expr(
            "CAST((2 * sum(ndcg_micro) + count(*)) div (2 * count(*)) AS BIGINT)"
        ).alias("mean_ndcg_micro"),
    )
