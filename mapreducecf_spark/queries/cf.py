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

from pyspark.sql import DataFrame, SparkSession
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
    """Session-memoized basket-capped (u, it) interaction matrix."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        l = load_table(spark, sf_dir, "lineitem")
        raw = (
            o.join(l, o.o_orderkey == l.l_orderkey)
            .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it"))
            .distinct()
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


def item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized item-item similarity table (ia < ib,
    cos_micro BIGINT) — the trained CF model both queries serve
    from."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        inter = interactions(spark, sf_dir)
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
        return (
            co.join(pop.select(F.col("it").alias("ia"), F.col("n").alias("na")), "ia")
            .join(pop.select(F.col("it").alias("ib"), F.col("n").alias("nb")), "ib")
            .select(
                "ia",
                "ib",
                "n_co",
                F.floor(
                    F.col("n_co") * SIM_SCALE / F.sqrt(F.col("na") * F.col("nb"))
                )
                .cast("bigint")
                .alias("cos_micro"),
            )
        )

    return session_memo(spark, ("cf_sim", sf_dir), build)


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


def neighbor_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized pruned model: each item's top-{NEIGHBORS_K}
    neighbors (it, neighbor, n_co, cos_micro, sim_rank) — what serving
    reads; the full pair table stays in ``item_similarity``."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        sim = item_similarity(spark, sf_dir)
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
    wi = Window.partitionBy("it").orderBy(
        F.md5(F.concat_ws(":", F.col("it"), F.col("u"))), F.col("u")
    )
    icap = (
        inter.withColumn("rk", F.row_number().over(wi))
        .filter(F.col("rk") <= POP_CAP)
        .select("u", "it")
    )
    ubask = inter.groupBy("u").agg(F.count("*").alias("n"))
    a = icap.select("it", F.col("u").alias("ua"))
    b = icap.select("it", F.col("u").alias("ub"))
    uco = (
        a.join(b, "it")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
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
