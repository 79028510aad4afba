"""Deduplication over ``documents`` — exact, MinHash-LSH, n-gram
Jaccard, and SimHash (SURVEY.md §7.2 step 5; the north-star pipeline
ops the reference's tokenizer naturally extends into).

Everything is built on the reference tokenizer (T1-T3+F1,
``client.py:16-21``) so "duplicate" means the same thing here as in the
wordcount family.

Determinism & oracles: all hash families are derived from md5, which is
bit-identical in every engine — so even the MinHash-LSH pipeline is
EXACTLY reproducible in the DuckDB oracle (same signatures, same bands,
same candidate pairs), and the driver's value-hash gate applies to the
full LSH output, not a weakened rows-only check.

100 TB design notes:

- ``dedup_exact*``: hash-groupBy on a 16-byte fingerprint — one shuffle
  of (fingerprint, doc_id), never the document text. The canonical-form
  md5 comes from queries.text.text_fingerprint.
- ``dedup_minhash_lsh``: the scale path. Per-doc signatures are one
  groupBy over distinct shingles (shuffle keyed by doc_id); candidate
  generation is an equi-join on (band, band_key) — documents only meet
  if a band collides, never all-pairs. Band buckets are the unit of
  skew: a degenerate corpus (everyone shares a band) is handled by
  AQE skew-join splitting, and real deployments drop band buckets over
  a size cap (documented, not needed at test SF).
- ``dedup_ngram_jaccard``: the exact-verification path — an
  inverted-index (shingle) equi-join, count shared shingles, compute
  J = shared/(|A|+|B|-shared). Skews on stop-shingles at scale; the
  fix — drop shingles with document frequency above ``NGRAM_DF_CAP``
  before the join — is IMPLEMENTED (``df_capped``), default-on, and
  replayed in the oracles.
- ``dedup_simhash``: narrow per-doc fingerprint (no shuffle at all);
  near-dup lookup at scale is a band join on fingerprint chunks, same
  shape as MinHash bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecf_spark.operators.wordcount import tokens_array
from mapreducecf_spark.registry import register
from mapreducecf_spark.sources import load_table
from mapreducecf_spark.sources.tables import spread

# ---------------------------------------------------------------------
# tunables (fixed — part of the query semantics, mirrored in oracles)
# ---------------------------------------------------------------------
SHINGLE_K = 3  # tokens per shingle
MINHASH_K = 12  # signature length
LSH_BANDS = 4  # bands of MINHASH_K / LSH_BANDS rows each
LSH_ROWS = MINHASH_K // LSH_BANDS
JACCARD_THRESHOLD = 0.5
#: stop-shingle document-frequency cap for the inverted-index joins
#: (dedup_ngram_jaccard / dedup_containment): a shingle present in more
#: than this many documents is boilerplate and is dropped from the index
#: BEFORE sizes and the self-join. ABSOLUTE, not fractional, on purpose:
#: it bounds the per-shingle candidate work at <= cap^2 pairs no matter
#: the corpus size (a fractional cap grows quadratically with the
#: corpus and so bounds nothing at 100 TB). Part of the query semantics,
#: replayed in the oracles. DATA-DRIVEN via the engine's own telemetry:
#: ``lsh_bucket_skew`` measures the uncapped shingle_df family at
#: max_size 7 / avg 1.6 (sf0.01) — 64 sits an order of magnitude above
#: the organic tail, so it only fires on true boilerplate; re-read that
#: query's max_size after a corpus change before retuning this.
NGRAM_DF_CAP = 64

# DuckDB twin of queries.text tokens_array(text)
_TOKS = (
    r"list_filter(string_split_regex("
    r"regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'), ' +'), "
    r"x -> regexp_matches(x, '\S'))"
)

# DuckDB: distinct 3-token shingles of a doc (empty when < 3 tokens)
_SHINGLES_SQL = f"""
SELECT doc_id,
       unnest(list_distinct(
         [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          for i in range(1, len(t) - 1)])) AS shingle
FROM (SELECT doc_id, {_TOKS} AS t FROM documents) toks
WHERE len(t) >= {SHINGLE_K}
"""

_CANON_SQL = f"md5(list_aggregate(list_transform({_TOKS}, x -> lower(x)), 'string_agg', ' '))"


# ---------------------------------------------------------------------
# shared Spark expressions
# ---------------------------------------------------------------------
def _canonical_fingerprint(text: Column) -> Column:
    """md5 of the lowercased token stream (case/punct/whitespace
    normalized) — identical to text_fingerprint's key."""
    return F.md5(F.array_join(F.transform(tokens_array(text), F.lower), " "))


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table with the adaptive input spread applied —
    ``sources.spread`` over the MODULE-LOCAL ``load_table`` (pytest
    plants synthetic corpora by monkeypatching the latter)."""
    return spread(
        spark, sf_dir, "documents", load_table(spark, sf_dir, "documents"), "doc_id"
    )


def shingles_df(spark: SparkSession, sf_dir: str, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle): distinct k-token shingles per doc, session-
    memoized+persisted — the whole fuzzy-dedup family (jaccard,
    containment, minhash, calibration) reads this one index, so only
    the first caller pays the tokenize+explode pass (at 100 TB: the
    shingle index is written to parquet once and every stage joins it).
    Narrow until the explode; docs shorter than k tokens contribute no
    shingles (and so can never pair)."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark, ("shingles", sf_dir, k), lambda: _build_shingles(spark, sf_dir, k)
    )


def _build_shingles(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    # adaptive input spread (r18, guide §2.5): the tokenize+shingle map
    # is the build's whole cost; on the single-row-group test layout the
    # scan is ONE task, so spread it cluster-wide (a layout that already
    # splits passes through untouched — no shuffle added at scale)
    return shingles_of(_docs_spread(spark, sf_dir), k)


def shingles_of(
    docs: DataFrame, k: int = SHINGLE_K, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra, shingle) distinct k-token shingles from ANY
    (doc_id, text, …) frame — the ROW-WISE form the streaming probes
    need (an arriving doc shingles itself with no corpus knowledge);
    the batch index is the same expression over the loaded table.

    Built as k shifted slices zipped together, NOT as
    ``transform(sequence, i -> element_at(toks, i+j))``: expressions
    referenced inside a higher-order lambda are re-evaluated per
    element, so the element_at form re-runs the whole tokenizer
    (regexp + split + filter) for every shingle×position — measured
    ~20 s vs <2 s at sf0.1 for the same output."""
    toks = tokens_array(F.col("text"))
    length = F.size(toks) - (k - 1)
    parts = [F.slice(toks, F.lit(j + 1), length) for j in range(k)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda x, y: F.concat_ws(" ", x, y))
    return (
        docs.filter(F.size(toks) >= k)
        .select("doc_id", *extra, F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def df_capped(sh: DataFrame, cap: int = NGRAM_DF_CAP) -> DataFrame:
    """Drop stop-shingles (document frequency > cap) from a
    (doc_id, shingle) index — THE skew relief for inverted-index joins:
    without it one boilerplate shingle shared by m documents emits m²
    candidate pairs, and AQE can split the straggler partition but
    cannot shrink the quadratic pair set itself. With the cap, work per
    shingle is <= cap² regardless of corpus size.

    The hot list is tiny by construction (<= index_rows / cap entries,
    and in real corpora boilerplate is a handful of strings), so it
    broadcasts and the filter costs one map-side anti-join — the index
    itself never shuffles here."""
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > cap)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def capped_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized ``df_capped`` shingle index — shared by
    dedup_ngram_jaccard and dedup_containment (same index, two
    queries), on top of the already-memoized raw shingle table."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark,
        ("capped_shingles", sf_dir, NGRAM_DF_CAP),
        lambda: df_capped(shingles_df(spark, sf_dir)),
    )


#: DuckDB twin of ``df_capped`` — expects a CTE named sh_all
_CAPPED_SH_SQL = f"""
SELECT doc_id, shingle FROM sh_all
WHERE shingle NOT IN (SELECT shingle FROM sh_all
                      GROUP BY shingle HAVING count(*) > {NGRAM_DF_CAP})
"""


def _jaccard_from_counts(shared: DataFrame, sizes: DataFrame) -> DataFrame:
    """J = shared / (|A| + |B| - shared), keep J >= threshold."""
    return (
        shared.join(sizes.select(F.col("doc_id").alias("ida"), F.col("n").alias("na")), "ida")
        .join(sizes.select(F.col("doc_id").alias("idb"), F.col("n").alias("nb")), "idb")
        .select(
            "ida",
            "idb",
            F.round(
                F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _verify_candidates(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact-verify a (small) candidate-pair set: join each pair to its
    two per-doc shingle ARRAYS (two equi-joins on id — each candidate
    row stays one row) and intersect narrowly. Never re-joins through
    the exploded shingle index: that shape multiplies every candidate
    by its shingle count before filtering, which is what made the
    naïve verify the bottleneck."""
    sets_df = sh.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("shs"), F.count("*").alias("n")
    )
    a = sets_df.select(F.col("doc_id").alias("ida"), F.col("shs").alias("sha"), F.col("n").alias("na"))
    b = sets_df.select(F.col("doc_id").alias("idb"), F.col("shs").alias("shb"), F.col("n").alias("nb"))
    return (
        cand.join(a, "ida")
        .join(b, "idb")
        .select(
            "ida",
            "idb",
            F.round(
                F.size(F.array_intersect("sha", "shb")).cast("double")
                / (F.col("na") + F.col("nb") - F.size(F.array_intersect("sha", "shb"))),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


_JACCARD_VERIFY_SQL = f"""
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT c.ida, c.idb, count(*) AS shared
  FROM cand c
  JOIN sh a ON a.doc_id = c.ida
  JOIN sh b ON b.doc_id = c.idb AND b.shingle = a.shingle
  GROUP BY c.ida, c.idb)
SELECT s.ida, s.idb,
       round(CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON sa.doc_id = s.ida
JOIN sizes sb ON sb.doc_id = s.idb
WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle=f"""
SELECT fingerprint,
       count(*) AS n_dups,
       min(doc_id) AS keep_id
FROM (SELECT doc_id, {_CANON_SQL} AS fingerprint FROM documents) t
GROUP BY fingerprint
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup clusters: hash-groupBy on the canonical md5
    fingerprint; keeper = lowest doc_id. The shuffle carries 16-byte
    keys + ids, never text — at 100 TB the text stays columnar on disk
    and the dedup pass is I/O-bound on two pruned columns."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", _canonical_fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
    )


@register(
    "dedup_exact_keep",
    oracle=f"""
SELECT min(doc_id) AS doc_id
FROM (SELECT doc_id, {_CANON_SQL} AS fingerprint FROM documents) t
GROUP BY fingerprint
""",
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving document ids after exact dedup (first-seen keeper
    per fingerprint) — the `dropDuplicates` shape, expressed as
    min-per-group so the keeper choice is deterministic (Spark's
    dropDuplicates keeps an arbitrary row)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", _canonical_fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


# ---------------------------------------------------------------------
# fuzzy dedup: exact n-gram Jaccard (inverted-index join)
# ---------------------------------------------------------------------
@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh_all AS ({_SHINGLES_SQL}),
sh AS MATERIALIZED ({_CAPPED_SH_SQL}),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
{_JACCARD_VERIFY_SQL}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard over the DF-capped
    shingle vocabulary: stop-shingles (document frequency >
    {NGRAM_DF_CAP}, boilerplate by definition) are dropped from the
    index first — ``df_capped`` — then candidates = any pair sharing
    >= 1 surviving shingle (inverted-index equi-join, never a cross
    join), then exact Jaccard >= {JACCARD_THRESHOLD} over the capped
    sets. The cap is what makes this shape survive 100 TB: without it
    one boilerplate shingle emits a quadratic pair set that no runtime
    skew-splitting can shrink. md5-free and fully deterministic, so the
    oracle replays the identical capped pipeline and the value-hash
    gate applies."""
    sh = capped_shingles(spark, sf_dir)  # memoized: 3 consumers below + containment
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    shared = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .agg(F.count("*").alias("shared"))
    )
    return _jaccard_from_counts(shared, sizes)


# ---------------------------------------------------------------------
# fuzzy dedup: IDF-WEIGHTED n-gram Jaccard (inverted-index join)
# ---------------------------------------------------------------------
WEIGHTED_JACCARD_THRESHOLD = 0.5


@register(
    "dedup_jaccard_weighted",
    oracle=f"""
WITH sh_all AS MATERIALIZED ({_SHINGLES_SQL}),
sh AS MATERIALIZED ({_CAPPED_SH_SQL}),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
w AS (SELECT shingle,
             CAST(round(ln(nd / count(*)) * 1000000, 0) AS BIGINT) AS w
      FROM sh_all CROSS JOIN n GROUP BY shingle, nd),
swh AS MATERIALIZED (
  SELECT sh.doc_id, sh.shingle, w.w FROM sh JOIN w USING (shingle)),
tot AS (SELECT doc_id, sum(w) AS tw FROM swh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, sum(a.w) AS iw
  FROM swh a JOIN swh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i.ida, i.idb,
       round(CAST(i.iw AS DOUBLE) / (ta.tw + tb.tw - i.iw), 6) AS wjaccard
FROM inter i JOIN tot ta ON ta.doc_id = i.ida
             JOIN tot tb ON tb.doc_id = i.idb
WHERE ta.tw + tb.tw - i.iw > 0
  AND round(CAST(i.iw AS DOUBLE) / (ta.tw + tb.tw - i.iw), 6)
      >= {WEIGHTED_JACCARD_THRESHOLD}
""",
)
def dedup_jaccard_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by IDF-WEIGHTED n-gram Jaccard — the
    weighted-MinHash objective (Ioffe CWS's target measure) computed
    EXACTLY over the DF-capped inverted index: rare shingles count for
    more, boilerplate counts for (near-)nothing, so a pair sharing one
    distinctive sentence outranks a pair sharing ten stock phrases.
    J_w(A,B) = sum_{{s in A∩B}} w(s) / sum_{{s in A∪B}} w(s) with
    w(s) = ln(N/df(s)) — df from the RAW shingle index (true document
    frequency), weights applied to the CAPPED index (stop-shingles are
    dropped from pairing entirely, same as the unweighted query, so the
    pair volume bound is identical: <= cap² per shingle).

    Determinism: weights are integer MICRO (round(ln*1e6) as bigint),
    so the intersection/total sums are exact integer aggregations —
    order-independent under any partitioning — and the single final
    division is rounded to 6dp on both engines. At 100 TB the weights
    table is vocab-sized (persisted here; a deployment materializes it
    with the shingle index) and everything else rides the same two
    shuffles as the unweighted Jaccard."""
    sh_all = shingles_df(spark, sf_dir)  # memoized raw index: df source
    sh = capped_shingles(spark, sf_dir)  # memoized capped index: pairing
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count("*").cast("double").alias("nd"))
    w = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n))
        .select(
            "shingle",
            F.round(F.log(F.col("nd") / F.col("df")) * 1000000.0, 0)
            .cast("bigint")
            .alias("w"),
        )
        # localCheckpoint, not persist: blocks are ContextCleaner-freed
        # when the query's references go — an intra-query persist pins
        # a cache-manager entry for the whole session (ADVICE r08; the
        # one-session 258-query bench/driver run measured the leak)
        .localCheckpoint()
    )
    swh = sh.join(w, "shingle")
    tot = swh.groupBy("doc_id").agg(F.sum("w").alias("tw"))
    inter = (
        swh.alias("a")
        .join(swh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .agg(F.sum(F.col("a.w")).alias("iw"))
    )
    return (
        inter.join(
            tot.select(F.col("doc_id").alias("ida"), F.col("tw").alias("ta")), "ida"
        )
        .join(tot.select(F.col("doc_id").alias("idb"), F.col("tw").alias("tb")), "idb")
        # an all-boilerplate pair (every shared shingle at weight 0 and
        # nothing else) has union weight 0: J_w is undefined — Spark
        # NULLs the division, DuckDB NaNs it — so guard the denominator
        .filter(F.col("ta") + F.col("tb") - F.col("iw") > 0)
        .select(
            "ida",
            "idb",
            F.round(
                F.col("iw").cast("double")
                / (F.col("ta") + F.col("tb") - F.col("iw")),
                6,
            ).alias("wjaccard"),
        )
        .filter(F.col("wjaccard") >= WEIGHTED_JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------
# fuzzy dedup: MinHash-LSH (banded candidate generation)
# ---------------------------------------------------------------------
def _minhash_sigs(sh: DataFrame) -> DataFrame:
    """(doc_id, h0..h{MINHASH_K-1}): md5-based MinHash. Seed i's hash of
    a shingle is md5('i:'||shingle); the signature entry is the MIN over
    the doc's shingles — a plain min-aggregate, one shuffle by doc_id.
    md5 makes the signature bit-identical across engines (seeds are
    baked into the query semantics, SURVEY.md §7.4.5)."""
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("shingle")))).alias(f"h{i}")
        for i in range(MINHASH_K)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _minhash_sigs_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized signature table — shared by the pair build and
    the calibration query (two consumers, one groupBy pass)."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark,
        ("minhash_sigs", sf_dir),
        lambda: _minhash_sigs(shingles_df(spark, sf_dir)),
    )


def _band_keys(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bkey): hash each band's LSH_ROWS signature entries
    into one bucket key."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.md5(
                    F.concat(*[F.col(f"h{j * LSH_ROWS + r}") for r in range(LSH_ROWS)])
                ).alias("bkey"),
            )
            for j in range(LSH_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )


def _minhash_oracle() -> str:
    mins = ",\n       ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(MINHASH_K)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {j} AS band, "
        f"md5({' || '.join(f'h{j * LSH_ROWS + r}' for r in range(LSH_ROWS))}) AS bkey "
        "FROM sigs"
        for j in range(LSH_BANDS)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id,
       {mins}
  FROM sh GROUP BY doc_id),
bands AS (
{band_selects}),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
{_JACCARD_VERIFY_SQL}
"""


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs — the 100 TB dedup path:
    shingle -> {MINHASH_K}-entry MinHash signature -> {LSH_BANDS} bands
    of {LSH_ROWS} -> equi-join on (band, bucket) -> exact-Jaccard
    verify. Candidate generation is banded/bucketed, NEVER all-pairs:
    cost is proportional to colliding-bucket sizes, not n². Fixed
    md5-derived hash family => deterministic output, so the oracle
    replays the identical algorithm in SQL and the driver hash-checks
    the full pipeline.

    The verified-pair table is session-memoized: dedup_clusters,
    dedup_pipeline_keep and dedup_minhash_calibration all consume it,
    so only the first of the family pays the band-join+verify (at
    100 TB: one materialized pair table on parquet)."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark, ("minhash_pairs", sf_dir), lambda: _build_minhash_pairs(spark, sf_dir)
    )


def _build_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shingle index (memoized in shingles_df) feeds the signature
    # build AND the per-doc array verify; the signature table is itself
    # memoized because the calibration query re-reads it
    sh = shingles_df(spark, sf_dir)
    bands = _band_keys(_minhash_sigs_memo(spark, sf_dir)).persist()
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .distinct()
    )
    return _verify_candidates(cand, sh)


# ---------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------
SIMHASH_BITS = 32


def _simhash(text: Column) -> Column:
    """32-bit SimHash as a bitstring. Bit b is the sign of the sum over
    tokens (with multiplicity) of ±1, where token t votes +1 iff hex
    digit b of md5(t) has its high bit set ('8'..'f').

    ONE fold over the token array: each token is md5'd once and votes a
    32-wide ±1 vector, accumulated element-wise with zip_with (the
    per-bit formulation re-evaluates the md5 array 32× — measured 9 s
    vs ~1 s at sf0.1). Pure narrow array math, no shuffle."""

    def votes(x: Column) -> Column:
        # one split into chars + one transform, NOT 32 substring()
        # calls: each substring re-walks the string, and 32 of them per
        # token measured 5.1 s vs 1.4 s at sf0.1
        chars = F.slice(F.split(x, ""), 1, SIMHASH_BITS)
        return F.transform(chars, lambda c: F.when(c >= "8", 1).otherwise(-1))

    bitsums = F.aggregate(
        tokens_array(text),
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, t: F.zip_with(acc, votes(F.md5(t)), lambda a, v: a + v),
    )
    return F.array_join(
        F.transform(bitsums, lambda s: F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))),
        "",
    )


def _simhash_sql() -> str:
    bit = (
        "CASE WHEN list_sum(list_transform(h, x -> "
        "CASE WHEN substr(x, {p}, 1) >= '8' THEN 1 ELSE -1 END)) > 0 "
        "THEN '1' ELSE '0' END"
    )
    bits = " || ".join(bit.format(p=b + 1) for b in range(SIMHASH_BITS))
    return f"""
SELECT doc_id, {bits} AS simhash
FROM (SELECT doc_id, list_transform({_TOKS}, x -> md5(x)) AS h FROM documents) t
"""


#: rounds-to-fixpoint of the most recent connected_components run —
#: operational telemetry (VERDICT r05 stretch 8). Star contraction
#: converges in O(log n) alternation rounds REGARDLESS of component
#: diameter, so this should stay 2-5 even on chain-shaped graphs.
#: Read it after any consumer (dedup_clusters) runs; a 100 TB
#: deployment would emit the same scalar to its metrics sink per run.
LAST_CC_ROUNDS: int = 0

#: log a warning past this many rounds — star contraction halves the
#: representative-tree height per alternation, so a count this high
#: means a component of ~2^8 distinct representatives survived that
#: long: either a pathological pair graph (the dedup threshold
#: collapsed and everything merged) or a correctness bug upstream
CC_ROUND_WARN = 8


#: salts for the m(u) join-back in the star rounds. In late rounds the
#: component representative is a hub whose degree ≈ component size, so
#: a 100M-member dup cluster would serialize one task under a per-key
#: window or an unsalted join; salting spreads the hub's edges over
#: this many tasks (AQE skew-split can't split window partitions, and
#: its join splitting is best-effort — salting is deterministic).
CC_JOIN_SALTS = 32


def _with_key_min(E: DataFrame, key: str, val: str) -> DataFrame:
    """Attach ``m = min(val) per key`` to every row of ``E``,
    skew-safely (VERDICT r08 item 2). The min itself is a ``groupBy``
    — hash aggregation gets MAP-SIDE PARTIAL AGG, so even a mega-hub
    key contributes one row per map partition to the agg shuffle
    (a window gets no partial agg: every edge of the hub ships to one
    task). The join-back is the residual skew point, so it is salted
    ``CC_JOIN_SALTS`` ways via :func:`salted_join`: the tiny per-key
    min table replicates across salts while the hub's edges spread
    across ``CC_JOIN_SALTS`` tasks. Everything shuffled is bare
    bigints."""
    from mapreducecf_spark.functions.skew import salted_join

    m = E.groupBy(key).agg(F.min(val).alias("m"))
    return salted_join(E, m, on=[key], n_salts=CC_JOIN_SALTS, salt_source=val)


def _large_star(E: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): for each node u, connect every STRICTLY
    LARGER neighbor to m(u) = min(N(u) ∪ {u}), computed as a
    partial-agg min + salted join-back (:func:`_with_key_min`); the
    distinct is the round's closing Exchange."""
    sym = E.selectExpr("a AS u", "b AS v").union(E.selectExpr("b AS u", "a AS v"))
    return (
        _with_key_min(sym, "u", "v")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("a"), F.least("m", F.col("u")).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(E: DataFrame) -> DataFrame:
    """Small-star round: orient every edge toward its larger endpoint
    u, then connect u and all its (smaller) neighbors to
    m(u) = min(N(u)) — the contraction that actually collapses star
    height. Same skew-safe partial-agg + salted join-back shape as the
    large star."""
    o = E.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )
    return (
        _with_key_min(o, "u", "v")
        .select(F.explode(F.array("u", "v")).alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Connected components by ALTERNATING STAR CONTRACTION
    (large-star / small-star, Kiveris et al. 2014 — the MapReduce-
    native CC algorithm): ``(doc_id, component)`` where component =
    min vertex id in the component.

    The one genuinely ITERATIVE operator in the engine (SURVEY.md §2.1
    has no analogue). r07 shipped min-label propagation, whose round
    count is O(component diameter) — fine for clique-ish near-dup
    clusters, an honest-but-warned limitation on chain-shaped graphs
    (the r07 diameter property test). Star contraction replaces it
    (VERDICT r07 item 7): each large-star/small-star alternation at
    least halves the height of every representative tree, so ANY graph
    converges in O(log n) rounds — an 11-hop path needs ~3
    alternations, not 11 label hops. Per round: two map-side-partial
    ``groupBy`` mins + two SALTED equi-join-backs
    (:func:`_with_key_min`), all shuffling bare (bigint, bigint)
    edges; no windows (a per-key window would ship every edge of a
    mega-component's hub representative to one task — the r08
    skew flag), no cartesian. The fixpoint (every node connected directly
    to its component min) is the same closed-form property min-label
    propagation converged to, so ``dedup_clusters`` stays hash-green
    against the unchanged recursive-CTE oracle.

    Each round's edge set is ``localCheckpoint``-ed to DISK_ONLY: the
    output feeds both the next round and the convergence check, so
    without the cut the logical plan doubles per round (driver OOM by
    ~round 10); disk-only blocks can't evict the session's MEMORY-
    cached family intermediates. The driver reads one changed-count
    scalar per round (a cluster deployment that must survive executor
    loss would use reliable ``checkpoint`` — same shape, durable
    storage)."""
    from pyspark import StorageLevel

    global LAST_CC_ROUNDS
    rounds = 0
    cur = (
        edges.selectExpr("ida AS a", "idb AS b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    while True:
        rounds += 1
        stepped = _small_star(_large_star(cur)).localCheckpoint(
            storageLevel=StorageLevel.DISK_ONLY
        )
        # fixpoint = edge set unchanged. Both sets are distinct and
        # small-star-canonical (a > b), so equality is one symmetric
        # subtract pair; counts first short-circuits the common case.
        changed = (
            stepped.count() != cur.count()
            or stepped.subtract(cur).limit(1).count() > 0
        )
        cur = stepped
        if not changed:
            break
        if rounds == CC_ROUND_WARN:
            import warnings

            warnings.warn(
                f"connected_components still contracting after {rounds} "
                "alternations (~2^{rounds} representatives): the pair "
                "graph is pathologically connected — check the dedup "
                "threshold upstream",
                stacklevel=2,
            )
    LAST_CC_ROUNDS = rounds
    # at the fixpoint every non-root node has exactly the edge
    # (node, component-min); roots and isolated vertices label themselves
    labels = cur.select(F.col("a").alias("doc_id"), F.col("b").alias("component"))
    return (
        vertices.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
        )
    )


@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS ({{MINHASH}}),
edges AS (SELECT ida AS a, idb AS b FROM pairs
          UNION ALL
          SELECT idb, ida FROM pairs),
reach AS (
  SELECT doc_id AS id, doc_id AS lbl FROM documents
  UNION
  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id)
SELECT id AS doc_id, min(lbl) AS component
FROM reach GROUP BY id
""".replace("{MINHASH}", _minhash_oracle()),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: connected components over the
    MinHash-LSH verified pair graph — the step that turns pairs into
    keep/drop groups (keeper = component min). Every doc appears;
    singletons are their own component.

    The Spark side iterates min-label propagation to a FIXPOINT, which
    is round-count-independent (component = min reachable id, a
    closed-form property of the graph) — so even this iterative
    operator hash-checks exactly against a recursive-CTE oracle that
    computes the same transitive closure declaratively."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash_lsh(spark, sf_dir).select("ida", "idb")
    return connected_components(pairs, d)


@register(
    "dedup_pipeline_keep",
    oracle=f"""
WITH exact_keep AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, {_CANON_SQL} AS fingerprint FROM documents) t
  GROUP BY fingerprint),
sh AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id,
       {", ".join(f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(MINHASH_K))}
  FROM sh GROUP BY doc_id),
bands AS (
{chr(10).join(f"  SELECT doc_id, {j} AS band, md5({' || '.join(f'h{j * LSH_ROWS + r}' for r in range(LSH_ROWS))}) AS bkey FROM sigs" + (" UNION ALL" if j < LSH_BANDS - 1 else "") for j in range(LSH_BANDS))}),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT c.ida, c.idb, count(*) AS shared
  FROM cand c
  JOIN sh a ON a.doc_id = c.ida
  JOIN sh b ON b.doc_id = c.idb AND b.shingle = a.shingle
  GROUP BY c.ida, c.idb),
dropped AS (
  SELECT DISTINCT s.idb AS doc_id
  FROM shared s
  JOIN sizes sa ON sa.doc_id = s.ida
  JOIN sizes sb ON sb.doc_id = s.idb
  WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= {JACCARD_THRESHOLD})
SELECT doc_id FROM exact_keep
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
""",
)
def dedup_pipeline_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed dedup pipeline a training-data run actually
    executes: exact dedup keepers, minus the higher-id member of every
    verified fuzzy near-dup pair (pair-based drop policy — unlike the
    transitive dedup_clusters variant, this stays single-statement SQL,
    so the driver hash-checks the WHOLE pipeline end to end). Built
    from the same building blocks: canonical fingerprints, MinHash-LSH
    candidates, exact-Jaccard verification, one anti-join to finish."""
    exact_keep = dedup_exact_keep(spark, sf_dir)
    dropped = dedup_minhash_lsh(spark, sf_dir).select(F.col("idb").alias("doc_id")).distinct()
    return exact_keep.join(dropped, "doc_id", "left_anti")


@register("dedup_simhash", oracle=_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SimHash fingerprint. Near-dup docs differ in few
    bits; at scale, candidate pairs come from a band join on fingerprint
    chunks (dedup_simhash_pairs below), then a Hamming-distance
    verify — the fingerprint pass itself is shuffle-free map work (the
    adaptive spread below only fires on a scan layout too coarse for
    the cluster, e.g. the single-row-group test file; see
    sources.load_spread)."""
    d = _docs_spread(spark, sf_dir)
    return d.select("doc_id", _simhash(F.col("text")).alias("simhash"))


# SimHash near-dup: Hamming <= HAMMING_K across SIMHASH_CHUNKS chunks.
# Pigeonhole: with 4 chunks and <= 3 differing bits, at least one chunk
# is untouched — so the chunk equi-join has EXACT recall at this
# threshold (not probabilistic like MinHash banding).
SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS
HAMMING_K = SIMHASH_CHUNKS - 1


def _simhash_int(text: Column) -> Column:
    """The 32-bit SimHash as a BIGINT (same sign rule, bit 0 most
    significant — the integer value of ``_simhash``'s bitstring).
    Integer form so the Hamming verify is ONE codegen'd
    ``bit_count(a ^ b)`` instead of a 32-wide string zip."""

    def votes(x: Column) -> Column:
        chars = F.slice(F.split(x, ""), 1, SIMHASH_BITS)
        return F.transform(chars, lambda c: F.when(c >= "8", 1).otherwise(-1))

    bitsums = F.aggregate(
        tokens_array(text),
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, t: F.zip_with(acc, votes(F.md5(t)), lambda a, v: a + v),
    )
    return F.aggregate(
        bitsums,
        F.lit(0).cast("bigint"),
        lambda acc, s: acc * 2 + F.when(s > 0, 1).otherwise(0),
    )


def _simhash_int_sql() -> str:
    bit = (
        "(CASE WHEN list_sum(list_transform(h, x -> "
        "CASE WHEN substr(x, {p}, 1) >= '8' THEN 1 ELSE -1 END)) > 0 "
        "THEN {w} ELSE 0 END)"
    )
    total = " + ".join(
        bit.format(p=b + 1, w=2 ** (SIMHASH_BITS - 1 - b)) for b in range(SIMHASH_BITS)
    )
    return (
        f"SELECT doc_id, CAST({total} AS BIGINT) AS f "
        f"FROM (SELECT doc_id, list_transform({_TOKS}, x -> md5(x)) AS h FROM documents) t"
    )


def _simhash_pairs_sql() -> str:
    return f"""
WITH fp AS ({_simhash_int_sql()}),
chunks AS (
  SELECT doc_id, f, j AS ci, (f >> (8 * ({SIMHASH_CHUNKS - 1} - j))) & 255 AS ck
  FROM fp, range(0, {SIMHASH_CHUNKS}) t(j))
SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
       CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
FROM chunks a JOIN chunks b
  ON a.ci = b.ci AND a.ck = b.ck AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= {HAMMING_K}
"""


def simhash_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, f, ci, ck) — the SimHash fingerprint + byte-chunk
    table, session-memoized: ``dedup_simhash_pairs`` (both self-join
    sides) and ``lsh_bucket_skew`` consume the same build (r06 verdict
    item 8 — each used to recompute the fingerprint pass)."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        # adaptive input spread (r18, guide §2.5): the per-token md5 vote
        # fold is the whole build — spread the unsplittable test scan
        d = _docs_spread(spark, sf_dir)
        fp = d.select("doc_id", _simhash_int(F.col("text")).alias("f"))
        chunks_arr = F.array(
            *[
                F.struct(
                    F.lit(j).alias("ci"),
                    F.shiftright(F.col("f"), 8 * (SIMHASH_CHUNKS - 1 - j))
                    .bitwiseAND(F.lit(255))
                    .alias("ck"),
                )
                for j in range(SIMHASH_CHUNKS)
            ]
        )
        return fp.select("doc_id", "f", F.explode(chunks_arr).alias("c")).select(
            "doc_id", "f", "c.ci", "c.ck"
        )

    return session_memo(spark, ("simhash_chunks", sf_dir), build)


@register("dedup_simhash_pairs", oracle=_simhash_pairs_sql())
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs end-to-end — the banded Hamming join the
    fingerprint pass feeds: integer fingerprints -> {SIMHASH_CHUNKS}
    byte chunks (shift+mask) -> equi-join on (chunk_idx, chunk) ->
    Hamming <= {HAMMING_K} verify FUSED into the join projection as
    ``bit_count(a.fp ^ b.fp)``. The chunk join is EXACT at this
    threshold (pigeonhole: {HAMMING_K} flipped bits can't touch all
    {SIMHASH_CHUNKS} chunks), so unlike MinHash banding this pair set
    has provably full recall.

    Scale shape: because each side of the join CARRIES its 8-byte
    fingerprint, the verify needs no second join and no candidate
    materialization — unverified pairs exist only transiently inside
    the join task, and the only shuffle after the join is a distinct
    over the (much smaller) VERIFIED pair set. SimHash bits are biased
    on real corpora (common tokens dominate the sign votes), so chunk
    buckets skew — AQE skew-join splits the hot buckets; the
    documented DF-cap (drop chunk values whose bucket exceeds a size
    cap, accepting recall loss on boilerplate-identical docs) is the
    100 TB relief valve, same as stop-shingles in the Jaccard path."""
    chunks = simhash_chunks(spark, sf_dir)
    ham = F.bit_count(F.col("a.f").bitwiseXOR(F.col("b.f"))).cast("bigint")
    return (
        chunks.alias("a")
        .join(chunks.alias("b"), ["ci", "ck"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_K)
        .distinct()
    )


# ---------------------------------------------------------------------
# edit-distance verification of near-dup candidates
# ---------------------------------------------------------------------
LEV_REL_MAX = 0.5  # relative edit distance at or below which a
#                    candidate pair is confirmed a near-duplicate


@register(
    "dedup_levenshtein",
    oracle=f"""
WITH pairs AS ({_minhash_oracle()}),
lev AS (
  SELECT p.ida, p.idb, p.jaccard,
         levenshtein(da.text, db.text) AS lev_dist,
         greatest(length(da.text), length(db.text)) AS max_len
  FROM pairs p
  JOIN documents da ON da.doc_id = p.ida
  JOIN documents db ON db.doc_id = p.idb)
SELECT ida, idb, jaccard,
       CAST(lev_dist AS BIGINT) AS lev_dist,
       round(CAST(lev_dist AS DOUBLE) / max_len, 6) AS rel_dist,
       (CAST(lev_dist AS DOUBLE) / max_len <= {LEV_REL_MAX}) AS confirmed
FROM lev
""",
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level edit-distance verification stacked on the
    MinHash-LSH candidate pipeline: the strictest (and most expensive)
    duplicate check, so it runs LAST, only on pairs that already
    passed banding + exact-Jaccard — never on the corpus itself.
    Levenshtein is O(len²) per pair; at 100 TB the cost is
    |verified pairs| × len², which banding keeps proportional to the
    true duplicate count, not n². Pairs whose relative edit distance
    (distance / longer length) is <= {LEV_REL_MAX} are confirmed."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("ida"), F.col("text").alias("ta"))
    b = d.select(F.col("doc_id").alias("idb"), F.col("text").alias("tb"))
    lev = F.levenshtein("ta", "tb")
    max_len = F.greatest(F.length("ta"), F.length("tb"))
    rel = lev.cast("double") / max_len
    return (
        pairs.join(a, "ida")
        .join(b, "idb")
        .select(
            "ida",
            "idb",
            "jaccard",
            lev.cast("bigint").alias("lev_dist"),
            F.round(rel, 6).alias("rel_dist"),
            (rel <= LEV_REL_MAX).alias("confirmed"),
        )
    )


# ---------------------------------------------------------------------
# asymmetric containment (quote / subset detection)
# ---------------------------------------------------------------------
CONTAINMENT_THRESHOLD = 0.8


@register(
    "dedup_containment",
    oracle=f"""
WITH sh_all AS ({_SHINGLES_SQL}),
sh AS MATERIALIZED ({_CAPPED_SH_SQL}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2)
SELECT ida, idb,
       round(CAST(shared AS DOUBLE) / na.n, 6) AS containment
FROM shared JOIN sizes na ON na.doc_id = ida
WHERE CAST(shared AS DOUBLE) / na.n >= {CONTAINMENT_THRESHOLD}
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment c(a→b) = |A∩B| / |A|: flags
    documents mostly CONTAINED in another (quotes, boilerplate
    inclusion, doc-in-doc) that symmetric Jaccard misses whenever the
    container is much longer than the contained doc.

    Same inverted-index shape as ``dedup_ngram_jaccard``, including the
    ``df_capped`` stop-shingle filter (DF > {NGRAM_DF_CAP} dropped
    before sizes and the join — the quadratic-pair relief valve);
    candidates meet through a shingle equi-join (never all-pairs),
    counts aggregate map-side, and only the ORDERED pair direction
    changes (<> instead of <, so both directions are scored).
    Containment is an int/int division — bit-identical in both
    engines, so the threshold comparison needs no tolerance."""
    sh = capped_shingles(spark, sf_dir)  # memoized: sizes + both join sides
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("ida"), "shingle")
    b = sh.select(F.col("doc_id").alias("idb"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("ida") != F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count("*").alias("shared"))
    )
    c = F.col("shared").cast("double") / F.col("n")
    return (
        shared.join(sizes.select(F.col("doc_id").alias("ida"), "n"), "ida")
        .filter(c >= CONTAINMENT_THRESHOLD)
        .select("ida", "idb", F.round(c, 6).alias("containment"))
    )


# ---------------------------------------------------------------------
# doc-vs-corpus asymmetric containment SEARCH (top-k per query doc)
# ---------------------------------------------------------------------
CONTAIN_QUERY_CAP = 8  # md5-ranked query-doc workload (QUERY_CAP discipline)
CONTAIN_TOPK = 5  # results per query doc


def _containment_search_oracle() -> str:
    mins = ",\n       ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(MINHASH_K)
    )
    msig = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(MINHASH_K)
    )
    return f"""
WITH sh_all AS ({_SHINGLES_SQL}),
sh AS MATERIALIZED ({_CAPPED_SH_SQL}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
q AS (SELECT doc_id AS qid, n AS qn FROM sizes
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {CONTAIN_QUERY_CAP}),
qsh AS (SELECT q.qid, q.qn, sh.shingle FROM sh JOIN q ON sh.doc_id = q.qid),
shared AS (
  SELECT qsh.qid, qsh.qn, sh.doc_id AS did, count(*) AS shared
  FROM qsh JOIN sh ON sh.shingle = qsh.shingle AND sh.doc_id <> qsh.qid
  GROUP BY 1, 2, 3),
sigs AS (SELECT doc_id,
       {mins}
  FROM sh_all GROUP BY doc_id),
scored AS (
  SELECT s.qid, s.did, s.qn, s.shared, sd.n AS dn,
         ({msig}) AS msig
  FROM shared s JOIN sigs a ON a.doc_id = s.qid
                JOIN sigs b ON b.doc_id = s.did
                JOIN sizes sd ON sd.doc_id = s.did)
SELECT qid AS query_id, did AS doc_id,
       CAST(shared AS BIGINT) AS n_shared,
       round(CAST(shared AS DOUBLE) / qn, 6) AS containment,
       CAST((1000000 * msig * (qn + dn)) // (({MINHASH_K} + msig) * qn)
            AS BIGINT) AS contain_est_micro,
       CAST(rk AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid
             ORDER BY shared DESC, did) AS rk
      FROM scored) t
WHERE rk <= {CONTAIN_TOPK}
"""


@register("dedup_containment_search", oracle=_containment_search_oracle)
def dedup_containment_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-doc-vs-corpus asymmetric containment SEARCH (VERDICT r10
    item 9): for each of {CONTAIN_QUERY_CAP} md5-chosen query docs,
    the top-{CONTAIN_TOPK} corpus docs by containment
    c(q→d) = |S(q)∩S(d)| / |S(q)| — "where else does this document's
    content appear" — the long-doc case symmetric Jaccard search
    misses (a quote inside a 100× longer container scores ~0 Jaccard
    but ~1 containment). Next to the exact score, the MinHash-SKETCH
    containment estimate in micro ints (the signature-index pre-filter
    a 100 TB deployment prunes with BEFORE touching posting lists):
    Ĵ = m/{MINHASH_K} matching signature entries ⇒
    Ĉ = m·(|q|+|d|) / (({MINHASH_K}+m)·|q|), all integer arithmetic
    (truncating div both engines), so the estimate-vs-exact gap is
    auditable per result row.

    Bounded workload by construction: the query side is
    {CONTAIN_QUERY_CAP} docs (md5-rank LIMIT, the similarity-family
    QUERY_CAP discipline); candidates meet through the DF-capped
    inverted shingle index (``capped_shingles`` — ≤ |q-shingles| ×
    {NGRAM_DF_CAP} candidate rows, never all-pairs); signature lookups
    are equi-joins against the memoized signature table (the query
    side broadcasts); ranking is a per-query row_number ≤
    {CONTAIN_TOPK} that WindowGroupLimit prunes map-side. Exact rank
    order is (shared DESC, doc_id) — containment is monotone in
    shared for a fixed query, so no float enters the ordering."""
    sh = capped_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    q = (
        sizes.select(
            F.col("doc_id").alias("qid"),
            F.col("n").alias("qn"),
            F.md5(F.col("doc_id").cast("string")).alias("hk"),
        )
        .orderBy("hk", "qid")
        .limit(CONTAIN_QUERY_CAP)
        .select("qid", "qn")
    )
    qsh = sh.join(F.broadcast(q), sh.doc_id == F.col("qid")).select(
        "qid", "qn", "shingle"
    )
    shared = (
        qsh.join(sh, "shingle")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "qn", F.col("doc_id").alias("did"))
        .agg(F.count("*").alias("shared"))
    )
    sigs = _minhash_sigs_memo(spark, sf_dir)
    qsigs = sigs.join(
        F.broadcast(q.select(F.col("qid").alias("doc_id"))), "doc_id"
    ).select(
        F.col("doc_id").alias("qid"),
        *[F.col(f"h{i}").alias(f"qh{i}") for i in range(MINHASH_K)],
    )
    msig = sum(
        F.when(F.col(f"qh{i}") == F.col(f"h{i}"), 1).otherwise(0)
        for i in range(MINHASH_K)
    )
    scored = (
        shared.join(F.broadcast(qsigs), "qid")
        .join(sigs.withColumnRenamed("doc_id", "did"), "did")
        .join(
            sizes.select(F.col("doc_id").alias("did"), F.col("n").alias("dn")),
            "did",
        )
        .select("qid", "did", "qn", "dn", "shared", msig.alias("msig"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("shared"), F.asc("did"))
    est = F.expr(
        f"CAST((1000000 * msig * (qn + dn)) DIV "
        f"(({MINHASH_K} + msig) * qn) AS BIGINT)"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= CONTAIN_TOPK)
        .select(
            F.col("qid").alias("query_id"),
            F.col("did").alias("doc_id"),
            F.col("shared").cast("bigint").alias("n_shared"),
            F.round(F.col("shared").cast("double") / F.col("qn"), 6).alias(
                "containment"
            ),
            est.alias("contain_est_micro"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------
# benchmark-split containment search (decontamination angle #3)
# ---------------------------------------------------------------------
#: md5-bucket split predicate fragments (the text_train_val_split
#: expression — 90/10 by md5(doc_id) prefix mod 100)
_SPLIT_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100"
)


def _containment_benchmark_oracle() -> str:
    return f"""
WITH sh_all AS ({_SHINGLES_SQL}),
sh AS MATERIALIZED ({_CAPPED_SH_SQL}),
spl AS (SELECT doc_id, {_SPLIT_BUCKET_SQL} AS b FROM documents),
tr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN spl USING (doc_id) WHERE b < 90),
vl AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN spl USING (doc_id) WHERE b >= 90),
qsizes AS (SELECT doc_id, count(*) AS n FROM vl GROUP BY 1),
q AS (SELECT doc_id AS qid, n AS qn FROM qsizes
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {CONTAIN_QUERY_CAP}),
qsh AS (SELECT q.qid, q.qn, vl.shingle FROM vl JOIN q ON vl.doc_id = q.qid),
shared AS (
  SELECT qsh.qid, qsh.qn, tr.doc_id AS did, count(*) AS shared
  FROM qsh JOIN tr ON tr.shingle = qsh.shingle
  GROUP BY 1, 2, 3),
ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
             ORDER BY shared DESC, did) AS rk FROM shared)
SELECT r.qid AS query_id, r.did AS doc_id, d.source AS source,
       CAST(r.shared AS BIGINT) AS n_shared,
       round(CAST(r.shared AS DOUBLE) / r.qn, 6) AS containment,
       CAST(r.rk AS INT) AS rank
FROM ranked r JOIN documents d ON d.doc_id = r.did
WHERE r.rk <= {CONTAIN_TOPK}
"""


@register("dedup_containment_benchmark", oracle=_containment_benchmark_oracle)
def dedup_containment_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-split containment search (VERDICT r11/r12 carry) —
    the third decontamination angle beside the exact-shingle
    (``pipe_contamination_attribution``) and embedding-near-dup
    (``pipe_contamination_semantic``) reports: for each of
    {CONTAIN_QUERY_CAP} md5-chosen VAL-split docs (the held-out split
    standing in for an eval benchmark, same md5-bucket split as
    ``text_train_val_split``), the top-{CONTAIN_TOPK} TRAIN-split
    docs by containment c(q→d) = |S(q)∩S(d)| / |S(q)| — "how much of
    this benchmark item already sits inside the training corpus, and
    in which source" (the hit's ``source`` rides along for the
    release-review attribution).

    Same bounded shape as ``dedup_containment_search``: both sides
    filter the ONE memoized DF-capped shingle index by the md5-split
    predicate (computable on doc_id alone — no documents join touches
    the index), candidates meet through the inverted index (≤
    |q-shingles| × {NGRAM_DF_CAP} rows, never all-pairs), ranking is
    a WindowGroupLimit-pruned row_number, and the source attribution
    joins the ≤ {CONTAIN_QUERY_CAP}×{CONTAIN_TOPK}-row result
    broadcast into documents — the corpus table is never shuffled.
    No self-exclusion needed: the splits are disjoint by
    construction."""
    sh = capped_shingles(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")
        % 100
    )
    tr = sh.filter(bucket < 90)
    vl = sh.filter(bucket >= 90)
    qsizes = vl.groupBy("doc_id").agg(F.count("*").alias("n"))
    q = (
        qsizes.select(
            F.col("doc_id").alias("qid"),
            F.col("n").alias("qn"),
            F.md5(F.col("doc_id").cast("string")).alias("hk"),
        )
        .orderBy("hk", "qid")
        .limit(CONTAIN_QUERY_CAP)
        .select("qid", "qn")
    )
    qsh = vl.join(F.broadcast(q), vl.doc_id == F.col("qid")).select(
        "qid", "qn", "shingle"
    )
    shared = (
        qsh.join(tr, "shingle")
        .groupBy("qid", "qn", F.col("doc_id").alias("did"))
        .agg(F.count("*").alias("shared"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("shared"), F.asc("did"))
    ranked = (
        shared.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= CONTAIN_TOPK)
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        src.join(F.broadcast(ranked), src.doc_id == ranked.did)
        .select(
            F.col("qid").alias("query_id"),
            F.col("did").alias("doc_id"),
            "source",
            F.col("shared").cast("bigint").alias("n_shared"),
            F.round(F.col("shared").cast("double") / F.col("qn"), 6).alias(
                "containment"
            ),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@register(
    "dedup_rate_report",
    oracle=f"""
WITH fp AS (SELECT source, {_CANON_SQL} AS fingerprint FROM documents)
SELECT source,
       count(*) AS n_docs,
       CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_unique,
       CAST(count(*) - count(DISTINCT fingerprint) AS BIGINT) AS n_dup_rows,
       round((count(*) - count(DISTINCT fingerprint)) * 100.0 / count(*), 6)
         AS dup_pct
FROM fp GROUP BY source
""",
)
def dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate telemetry — the dashboard number a
    corpus build tracks per crawl/source before deciding dedup budget:
    document count, distinct canonical fingerprints, redundant rows,
    and duplicate percentage. Uses the SAME canonical md5 as
    dedup_exact / text_fingerprint, so the report's "n_dup_rows" is
    exactly the rows dedup_exact_keep would drop, per source.

    100 TB shape: one partial-aggregated groupBy(source) over
    (source, 16-byte fingerprint) — count(DISTINCT) expands to a
    two-level aggregate on narrow keys; the text never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("source", _canonical_fingerprint(F.col("text")).alias("fingerprint"))
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("fingerprint").cast("bigint").alias("n_unique"),
        (F.count("*") - F.count_distinct("fingerprint"))
        .cast("bigint")
        .alias("n_dup_rows"),
        F.round(
            (F.count("*") - F.count_distinct("fingerprint")) * 100.0 / F.count("*"), 6
        ).alias("dup_pct"),
    )


def _minhash_calibration_oracle() -> str:
    mins = ",\n       ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(MINHASH_K)
    )
    matches = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(MINHASH_K)
    )
    return f"""
WITH base AS ({_minhash_oracle()}),
sh2 AS ({_SHINGLES_SQL}),
sigs2 AS (
  SELECT doc_id,
       {mins}
  FROM sh2 GROUP BY doc_id)
SELECT ida, idb, jaccard, jaccard_est,
       round(abs(jaccard_est - jaccard), 6) AS abs_err
FROM (
  SELECT b.ida, b.idb, b.jaccard,
         round(({matches}) / {MINHASH_K}.0, 6) AS jaccard_est
  FROM base b
  JOIN sigs2 sa ON sa.doc_id = b.ida
  JOIN sigs2 sb ON sb.doc_id = b.idb) t
"""


@register("dedup_minhash_calibration", oracle=_minhash_calibration_oracle)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-calibration telemetry for the MinHash family: for every
    verified near-dup pair, the {MINHASH_K}-entry signature's Jaccard
    ESTIMATE (fraction of agreeing positions) next to the exact
    verified Jaccard and the absolute error — the number that tells you
    whether {MINHASH_K} hashes are enough before you spend 100 TB of
    compute trusting them (E[est] = J; observed spread at k={MINHASH_K}
    is the sizing argument for k).

    Reuses the verified-pair pipeline and the signature build via
    their session memos (zero rebuild when graded after the LSH query);
    the only additions are two id-equi-joins of (doc_id,
    {MINHASH_K}×16-byte signature) rows and a narrow agreement count —
    nothing new shuffles at corpus scale."""
    sigs = _minhash_sigs_memo(spark, sf_dir)
    pairs = dedup_minhash_lsh(spark, sf_dir)
    sa = sigs.select(
        F.col("doc_id").alias("ida"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(MINHASH_K)]
    )
    sb = sigs.select(
        F.col("doc_id").alias("idb"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(MINHASH_K)]
    )
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(MINHASH_K)
    )
    est = F.round(matches / float(MINHASH_K), 6)
    return (
        pairs.join(sa, "ida")
        .join(sb, "idb")
        .select("ida", "idb", "jaccard", est.alias("jaccard_est"))
        .select(
            "ida",
            "idb",
            "jaccard",
            "jaccard_est",
            F.round(F.abs(F.col("jaccard_est") - F.col("jaccard")), 6).alias(
                "abs_err"
            ),
        )
    )


# ---------------------------------------------------------------------
# fuzzy dedup: WEIGHTED MinHash sketch (replication / integer CWS)
# ---------------------------------------------------------------------
#: Kirsch-Mitzenmacher seed space for the weighted sketch: g_i =
#: (v1 + i*v2) mod 2^48 from ONE md5 per copy key — the replicated
#: index is ~avg-q x larger than the plain one (df=1 shingles carry
#: q ~ ln N copies), so the plain family's 12-md5s-per-row signature
#: build measured 12.8 s warm at sf0.1; double hashing cuts the md5
#: count 12x with the standard independence guarantee
WMH_MOD = 1 << 48
_WMH_SEP = " || ':' || "


def _minhash_weighted_oracle() -> str:
    mins = ",\n       ".join(
        f"min((v1 + {i} * v2) % {WMH_MOD}) AS h{i}" for i in range(MINHASH_K)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {j} AS band, "
        f"md5({_WMH_SEP.join(f'h{j * LSH_ROWS + r}' for r in range(LSH_ROWS))}) AS bkey "
        "FROM sigs"
        for j in range(LSH_BANDS)
    )
    matches = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(MINHASH_K)
    )
    return f"""
WITH sh_all AS MATERIALIZED ({_SHINGLES_SQL}),
sh AS MATERIALIZED ({_CAPPED_SH_SQL}),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
q AS (SELECT shingle, CAST(round(ln(nd / count(*)), 0) AS INT) AS q
      FROM sh_all CROSS JOIN n GROUP BY shingle, nd
      HAVING CAST(round(ln(nd / count(*)), 0) AS INT) >= 1),
swq AS MATERIALIZED (SELECT sh.doc_id, sh.shingle, q.q FROM sh JOIN q USING (shingle)),
copies AS (SELECT doc_id, shingle || ':' || c AS ckey
           FROM (SELECT doc_id, shingle, unnest(range(q)) AS c FROM swq) t),
cv AS (SELECT doc_id,
              CAST(('0x' || substr(md5(ckey), 1, 12)) AS BIGINT) AS v1,
              CAST(('0x' || substr(md5(ckey), 13, 12)) AS BIGINT) AS v2
       FROM copies),
sigs AS MATERIALIZED (
  SELECT doc_id,
       {mins}
  FROM cv GROUP BY doc_id),
bands AS (
{band_selects}),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
tot AS (SELECT doc_id, sum(q) AS tq FROM swq GROUP BY doc_id),
iw AS (SELECT c.ida, c.idb, sum(s.q) AS iw
       FROM cand c JOIN swq s ON s.doc_id = c.ida
       JOIN swq s2 ON s2.doc_id = c.idb AND s2.shingle = s.shingle
       GROUP BY 1, 2),
scored AS (
  SELECT i.ida, i.idb,
         round(CAST(i.iw AS DOUBLE) / (ta.tq + tb.tq - i.iw), 6) AS wjaccard,
         round(({matches}) / {float(MINHASH_K)}, 6) AS wjaccard_est
  FROM iw i JOIN tot ta ON ta.doc_id = i.ida
            JOIN tot tb ON tb.doc_id = i.idb
            JOIN sigs sa ON sa.doc_id = i.ida
            JOIN sigs sb ON sb.doc_id = i.idb)
SELECT ida, idb, wjaccard, wjaccard_est,
       round(abs(wjaccard_est - wjaccard), 6) AS abs_err
FROM scored WHERE wjaccard >= {WEIGHTED_JACCARD_THRESHOLD}
"""


@register("dedup_minhash_weighted", oracle=_minhash_weighted_oracle)
def dedup_minhash_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED MinHash near-dup sketch with built-in calibration — the
    sketch twin of ``dedup_jaccard_weighted``. Consistent weighted
    sampling by REPLICATION (the integer-weight reduction of Ioffe
    CWS, Gollapudi-Panigrahy): each capped shingle is replicated
    q(s) = round(ln(N/df)) times (weight-0 boilerplate drops out of
    the sketch entirely), the {MINHASH_K}-entry signature derives its seeds by
    Kirsch-Mitzenmacher double hashing from ONE md5 per copy key
    ``shingle:c`` (g_i = (v1 + i*v2) mod 2^48 — exact bigint
    arithmetic, identical in both engines), and Pr[sig collision] is
    exactly the integer-weighted Jaccard
    J_q = sum min(q) / sum max(q). Hash-only — no float draws, no
    exp/ln argmins — so the signature is bitwise-replayable in SQL,
    unlike full ICWS whose float argmin would be ULP-fragile across
    engines.

    Pipeline: copies -> signatures -> {LSH_BANDS}x{LSH_ROWS} banded
    candidates (never all-pairs; copy expansion multiplies index rows
    by avg q, a small constant) -> EXACT J_q verify on candidates via
    per-doc weighted shingle arrays (fixed-width q-prefixed elements,
    array_intersect + integer fold — never a re-join through the
    exploded index) -> estimate = agreeing-position fraction beside
    the exact value and |err|, the k-sizing telemetry the unweighted
    calibration row provides for plain MinHash."""
    sh_all = shingles_df(spark, sf_dir)
    sh = capped_shingles(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count("*").cast("double").alias("nd"))
    q = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n))
        .select(
            "shingle",
            F.round(F.log(F.col("nd") / F.col("df")), 0).cast("int").alias("q"),
        )
        .filter(F.col("q") >= 1)
    )
    swq = sh.join(q, "shingle").localCheckpoint()  # see w note above
    copies = swq.select(
        "doc_id",
        "shingle",
        F.explode(F.sequence(F.lit(0), F.col("q") - 1)).alias("c"),
    ).select(
        "doc_id", F.concat_ws(":", "shingle", F.col("c").cast("string")).alias("ckey")
    )
    h = F.md5("ckey")
    cv = copies.select(
        "doc_id",
        F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint").alias("v1"),
        F.conv(F.substring(h, 13, 12), 16, 10).cast("bigint").alias("v2"),
    )
    sigs = cv.groupBy("doc_id").agg(
        *[
            F.min((F.col("v1") + F.lit(i) * F.col("v2")) % WMH_MOD).alias(f"h{i}")
            for i in range(MINHASH_K)
        ]
    ).localCheckpoint()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ":",
                                *[
                                    F.col(f"h{j * LSH_ROWS + r}").cast("string")
                                    for r in range(LSH_ROWS)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for j in range(LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .distinct()
    )
    # exact J_q verify: per-doc arrays of zero-padded-q-prefixed
    # shingles; intersection elements carry their own q to the fold
    sets_df = swq.groupBy("doc_id").agg(
        F.collect_list(
            F.concat(F.lpad(F.col("q").cast("string"), 8, "0"), F.col("shingle"))
        ).alias("shq"),
        F.sum("q").alias("tq"),
        # r18 opt (guide §5): consumed twice (the sa and sb sides of
        # the verify join) — without truncation each side re-ran the
        # collect_list aggregation over the shingle table
    ).localCheckpoint()
    inter_w = F.aggregate(
        F.array_intersect(F.col("a_shq"), F.col("b_shq")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.substring(x, 1, 8).cast("long"),
    )
    matches = sum(
        (F.col(f"a_h{i}") == F.col(f"b_h{i}")).cast("int") for i in range(MINHASH_K)
    )
    sa = sets_df.select(
        F.col("doc_id").alias("ida"),
        F.col("shq").alias("a_shq"),
        F.col("tq").alias("ta"),
    )
    sb = sets_df.select(
        F.col("doc_id").alias("idb"),
        F.col("shq").alias("b_shq"),
        F.col("tq").alias("tb"),
    )
    siga = sigs.select(
        F.col("doc_id").alias("ida"),
        *[F.col(f"h{i}").alias(f"a_h{i}") for i in range(MINHASH_K)],
    )
    sigb = sigs.select(
        F.col("doc_id").alias("idb"),
        *[F.col(f"h{i}").alias(f"b_h{i}") for i in range(MINHASH_K)],
    )
    return (
        cand.join(sa, "ida")
        .join(sb, "idb")
        .join(siga, "ida")
        .join(sigb, "idb")
        .select(
            "ida",
            "idb",
            F.round(
                inter_w.cast("double") / (F.col("ta") + F.col("tb") - inter_w), 6
            ).alias("wjaccard"),
            F.round(matches / float(MINHASH_K), 6).alias("wjaccard_est"),
        )
        .withColumn(
            "abs_err", F.round(F.abs(F.col("wjaccard_est") - F.col("wjaccard")), 6)
        )
        .filter(F.col("wjaccard") >= WEIGHTED_JACCARD_THRESHOLD)
    )


@register(
    "text_crosslingual_overlap",
    oracle=f"""
WITH sh_all AS ({_SHINGLES_SQL}),
sh AS MATERIALIZED ({_CAPPED_SH_SQL}),
shl AS (SELECT s.doc_id, s.shingle, d.lang
        FROM sh s JOIN documents d USING (doc_id)),
px AS (SELECT a.lang AS lang_a, b.lang AS lang_b, a.shingle,
              a.doc_id AS ida, b.doc_id AS idb
       FROM shl a JOIN shl b
         ON a.shingle = b.shingle AND a.lang < b.lang)
SELECT lang_a, lang_b,
       CAST(count(DISTINCT shingle) AS BIGINT) AS n_shared_shingles,
       CAST(count(DISTINCT ida || ':' || idb) AS BIGINT) AS n_doc_pairs
FROM px GROUP BY lang_a, lang_b
""",
)
def text_crosslingual_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual verbatim-overlap telemetry: for every language
    pair, how many distinct {SHINGLE_K}-token shingles and document
    pairs share text ACROSS the language boundary. Same-script verbatim
    leakage between language subsets — license boilerplate, templated
    spam, mislabeled documents, translation-memory artifacts — is the
    contamination mode per-language dedup runs never see, because each
    run partitions BY language; this rollup is the audit that says
    where a cross-lingual dedup pass would pay off (and, inverted, a
    language-ID quality check: heavy en↔xx overlap often means the xx
    side is mislabeled English).

    Scale shape: rides the session-memoized DF-capped shingle index
    (stop-shingles already removed, per-shingle work ≤ cap²), one
    broadcast-sized lang lookup join, one shingle-equi self-join
    restricted to lang_a < lang_b, one partial-agg rollup over
    {SHINGLE_K}-token keys — never document pairs across the whole
    corpus."""
    sh = capped_shingles(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    shl = sh.join(langs, "doc_id")
    a = shl.select(
        "shingle", F.col("doc_id").alias("ida"), F.col("lang").alias("lang_a")
    )
    b = shl.select(
        "shingle", F.col("doc_id").alias("idb"), F.col("lang").alias("lang_b")
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.countDistinct("shingle").cast("bigint").alias("n_shared_shingles"),
            F.countDistinct(F.concat_ws(":", "ida", "idb"))
            .cast("bigint")
            .alias("n_doc_pairs"),
        )
    )


# ---------------------------------------------------------------------
# segment-level (line-level) global exact dedup
# ---------------------------------------------------------------------
#: tokens per non-overlapping segment for the line-level dedup family.
#: The corpus has no newline structure, so the C4/RefinedWeb "remove
#: lines duplicated across the corpus" op is expressed over fixed
#: SEG_LEN-token segments (the ExactSubstr framing: dedup repeated
#: spans, not whole documents). Trailing < SEG_LEN tokens are always
#: retained (they form no segment). Part of the query semantics,
#: replayed in the oracles.
SEG_LEN = 5
#: boilerplate hotlist size
SEG_HOTLIST_TOPK = 20

#: DuckDB twin of ``_build_segments``: (doc_id, source, seg_idx, seg)
#: — non-overlapping SEG_LEN-token lowercased segments, seg_idx is the
#: 0-based segment position within the doc.
_SEGMENTS_SQL = f"""
SELECT doc_id, source, u.idx AS seg_idx, u.seg AS seg
FROM (SELECT doc_id, source,
        unnest([struct_pack(idx := i,
          seg := list_aggregate(t[(i*{SEG_LEN}+1):((i+1)*{SEG_LEN})],
                                'string_agg', ' '))
          for i in range(0, len(t) // {SEG_LEN})]) AS u
      FROM (SELECT doc_id, source,
              list_transform({_TOKS}, x -> lower(x)) AS t
            FROM documents) toks
      WHERE len(t) >= {SEG_LEN}) x
"""


def segments_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, seg_idx, seg): non-overlapping lowercased
    {SEG_LEN}-token segments per doc, session-memoized — the
    line-level dedup family (report + hotlist) reads this one table."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark, ("segments", sf_dir, SEG_LEN), lambda: _build_segments(spark, sf_dir)
    )


def segment_tiling(d: DataFrame) -> DataFrame:
    """(doc_id, source, seg_idx, seg) tiling of a documents-shaped
    DataFrame — a STATELESS row-wise projection (works unchanged on a
    streaming source): same shifted-slice zip as ``_build_shingles``
    (the lambda re-evaluation trap documented there applies here too),
    then an index-filter keeps every {SEG_LEN}-th overlapping gram —
    i.e. the non-overlapping tiling. ``posexplode`` over the filtered
    array yields the 0-based segment index directly."""
    toks = F.transform(tokens_array(F.col("text")), F.lower)
    length = F.size(toks) - (SEG_LEN - 1)
    parts = [F.slice(toks, F.lit(j + 1), length) for j in range(SEG_LEN)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda x, y: F.concat_ws(" ", x, y))
    segs = F.filter(grams, lambda _x, i: (i % SEG_LEN) == 0)
    return d.filter(F.size(toks) >= SEG_LEN).select(
        "doc_id", "source", F.posexplode(segs).alias("seg_idx", "seg")
    )


def _build_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # adaptive input spread (r18, guide §2.5) — same reasoning as
    # _build_shingles: the tiling map dominated a one-task persist fill
    return segment_tiling(_docs_spread(spark, sf_dir))


def segment_keeper_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(h, keep_doc, keep_idx): the corpus-wide FIRST occurrence (min
    (doc_id, seg_idx) — struct min is lexicographic) of every segment
    hash — the static reference the streaming keep-first probe joins
    against, session-memoized. At 100 TB this is the persisted
    line-dedup index the ingestion edge reads; it is narrow (16-byte
    hash + two ints) and partial-aggregates map-side."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        occ = segments_df(spark, sf_dir).select(
            F.md5("seg").alias("h"), "doc_id", "seg_idx"
        )
        return (
            occ.groupBy("h")
            .agg(F.min(F.struct("doc_id", "seg_idx")).alias("k"))
            .select(
                "h",
                F.col("k.doc_id").alias("keep_doc"),
                F.col("k.seg_idx").alias("keep_idx"),
            )
        )

    return session_memo(spark, ("segment_keepers", sf_dir, SEG_LEN), build)


@register(
    "dedup_segment_exact",
    oracle=f"""
WITH segs AS ({_SEGMENTS_SQL}),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY md5(seg)
                            ORDER BY doc_id, seg_idx) AS rk
  FROM segs)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       round(1.0 - sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS retained_ratio
FROM ranked GROUP BY doc_id, source
""",
)
def dedup_segment_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level global exact dedup (the C4/RefinedWeb "remove lines
    duplicated across the corpus" op, in the ExactSubstr framing of
    Lee et al. 2022 — dedup repeated SPANS, not whole documents):
    every non-overlapping {SEG_LEN}-token segment is hashed, the
    corpus-wide FIRST occurrence (min (doc_id, seg_idx)) of each hash
    is kept, every later occurrence is removed — including repeats
    WITHIN a document, exactly what line-dedup does to templated
    text. Output is the per-doc retained-ratio report a corpus build
    reviews before committing the pass: segment count, removed count,
    and retained fraction. Docs shorter than {SEG_LEN} tokens form no
    segment and are out of scope (never destroyed by the op).

    100 TB shape: the only shuffle is one window over the 16-byte
    segment hash — the segment TEXT is dropped before the exchange,
    so the sorted partitions hold (hash, doc_id, seg_idx) rows only;
    per-hash work is linear in its occurrence count (rank, no pairs),
    so even a degenerate boilerplate hash costs its group size, not
    its square. The per-doc rollup partial-aggregates map-side.
    Keep-first is a total order, so the result is deterministic under
    any partitioning (DOP-invariance gate applies)."""
    from pyspark.sql.window import Window

    occ = segments_df(spark, sf_dir).select(
        "doc_id", "source", "seg_idx", F.md5("seg").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id", "seg_idx")
    removed = (F.row_number().over(w) > 1).cast("int")
    return (
        occ.withColumn("removed", removed)
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_segs"),
            F.sum("removed").cast("bigint").alias("n_removed"),
            F.round(
                1.0 - F.sum("removed") / F.count("*").cast("double"), 6
            ).alias("retained_ratio"),
        )
    )


@register(
    "dedup_segment_hotlist",
    oracle=f"""
WITH segs AS ({_SEGMENTS_SQL}),
g AS (SELECT seg,
             CAST(count(*) AS BIGINT) AS n_occ,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM segs GROUP BY seg HAVING count(*) >= 2)
SELECT seg, n_occ, n_docs,
       CAST(row_number() OVER (ORDER BY n_occ DESC, seg) AS INT) AS rank
FROM g ORDER BY n_occ DESC, seg LIMIT {SEG_HOTLIST_TOPK}
""",
)
def dedup_segment_hotlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate hotlist: the top-{SEG_HOTLIST_TOPK} duplicated
    {SEG_LEN}-token segments by global occurrence count (ties broken
    by segment text), with the distinct-document spread — the report
    that tells you WHAT the line-dedup pass is removing (license
    headers, templated spam, navigation chrome) before you trust it,
    and the candidate list for a curated boilerplate filter.

    100 TB shape: partial-aggregated groupBy over the segment string
    (map-side combine collapses repeats before the exchange), then a
    global top-k via orderBy().limit() — TakeOrdered on (count, seg),
    never a single-partition sort of the full group table; the rank
    column is attached by a window over the {SEG_HOTLIST_TOPK}-row
    result only."""
    from pyspark.sql.window import Window

    g = (
        segments_df(spark, sf_dir)
        .groupBy("seg")
        .agg(
            F.count("*").cast("bigint").alias("n_occ"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= 2)
    )
    top = g.orderBy(F.desc("n_occ"), "seg").limit(SEG_HOTLIST_TOPK)
    w = Window.orderBy(F.desc("n_occ"), "seg")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------
# LSH index maintenance over the CDC feed
# ---------------------------------------------------------------------
def _rowwise_bands(d: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) LSH band rows computed ROW-WISE from a
    documents-shaped DataFrame: the doc's distinct shingle array is
    built per row (same shifted-slice zip as ``_build_shingles``), each
    signature entry is ``array_min`` over md5-seeded transforms of that
    array (lexicographic min over the same set the groupBy form
    aggregates — identical signatures, zero shuffle), and the band keys
    hash {LSH_ROWS}-entry groups exactly like ``_band_keys``. The
    shape index maintenance needs: delta docs are signed through a
    narrow projection without touching the corpus."""
    toks = tokens_array(F.col("text"))
    length = F.size(toks) - (SHINGLE_K - 1)
    parts = [F.slice(toks, F.lit(j + 1), length) for j in range(SHINGLE_K)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda x, y: F.concat_ws(" ", x, y))
    shs = F.array_distinct(sh)
    hcols = [
        F.array_min(
            F.transform(
                F.col("shs"), lambda x: F.md5(F.concat_ws(":", F.lit(str(i)), x))
            )
        ).alias(f"h{i}")
        for i in range(MINHASH_K)
    ]
    sigs = (
        d.filter(F.size(toks) >= SHINGLE_K)
        .select("doc_id", shs.alias("shs"))
        .select("doc_id", *hcols)
    )
    return _band_keys(sigs)


def _lsh_index_cdc_oracle() -> str:
    from mapreducecf_spark.queries.pipeline import (
        _SNAP_CHANGED,
        _SNAP_NEW_DROP,
    )

    mins = ",\n       ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(MINHASH_K)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {j} AS band, "
        f"md5({' || '.join(f'h{j * LSH_ROWS + r}' for r in range(LSH_ROWS))}) AS bkey "
        "FROM sigs"
        for j in range(LSH_BANDS)
    )
    return f"""
WITH newsnap AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = {_SNAP_CHANGED} THEN text || ' v2'
              ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> {_SNAP_NEW_DROP}),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
            for i in range(1, len(t) - 1)])) AS shingle
  FROM (SELECT doc_id, {_TOKS} AS t FROM newsnap) toks
  WHERE len(t) >= {SHINGLE_K}),
sigs AS (
  SELECT doc_id,
       {mins}
  FROM sh GROUP BY doc_id),
bands AS (
{band_selects})
SELECT doc_id, CAST(band AS INT) AS band, bkey FROM bands
"""


@register("dedup_lsh_index_cdc", oracle=_lsh_index_cdc_oracle)
def dedup_lsh_index_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded MinHash signature INDEX maintained incrementally over
    the CDC feed (the ``pipe_incremental_agg`` pattern applied to the
    near-dup index instead of a rollup): starting from the OLD
    snapshot's band rows, deletes and updates retract their old-text
    rows via an anti-join on the touched doc ids, inserts and updates
    contribute their new-text rows through the row-wise signature
    projection — and the gate proves the delta algebra exact, because
    the oracle REBUILDS the index from the new snapshot in full. Uses
    the same simulated CDC classes as the snapshot-diff family
    (doc_id mod 10 / mod 7).

    This is the op that keeps streaming near-dup probes
    (``stream_minhash_neardup``) honest between full index rebuilds:
    at 100 TB the old index is the persisted banded table; maintenance
    is O(delta) signature work (row-wise, zero shuffle) plus a
    broadcast anti-join of the delta-sized touched-id set against the
    index — the corpus is never re-shingled, never re-signed. A
    signature index is NOT self-maintainable from deltas alone in the
    aggregate sense (a doc's signature depends only on its own text),
    which is exactly why per-doc retract+insert suffices — contrast
    the rollup case where signed sums do it."""
    from mapreducecf_spark.queries.pipeline import (
        _SNAP_CHANGED,
        _SNAP_NEW_DROP,
        _SNAP_OLD_DROP,
    )

    d = load_table(spark, sf_dir, "documents")
    mod10 = F.col("doc_id") % 10
    changed = F.col("doc_id") % 7 == _SNAP_CHANGED
    new_text = F.when(changed, F.concat("text", F.lit(" v2"))).otherwise(
        F.col("text")
    )
    # r18 opt (guide §1.2 "don't compute things you throw away"): the
    # old snapshot's band rows are a FILTER of the session-memoized
    # full-corpus signature index (signatures are per-doc functions of
    # unchanged text; min over a multiset == min over its set, so the
    # row-wise and groupBy signature forms are identical — pinned by
    # the oracle, which rebuilds the post-CDC index from scratch).
    # This is the docstring's own 100 TB story: maintenance starts
    # from the PERSISTED banded table, it never re-signs the corpus.
    old_index = _band_keys(_minhash_sigs_memo(spark, sf_dir)).filter(
        mod10 != _SNAP_OLD_DROP
    )
    # old rows leaving the index: deletes + updates
    gone = d.filter(
        (mod10 == _SNAP_NEW_DROP)
        | ((mod10 != _SNAP_OLD_DROP) & (mod10 != _SNAP_NEW_DROP) & changed)
    ).select("doc_id")
    # new rows entering: inserts + updates, at their new-snapshot text
    incoming = d.filter(
        (mod10 == _SNAP_OLD_DROP)
        | ((mod10 != _SNAP_OLD_DROP) & (mod10 != _SNAP_NEW_DROP) & changed)
    ).select("doc_id", new_text.alias("text"))
    return (
        old_index.join(F.broadcast(gone), "doc_id", "left_anti")
        .unionByName(_rowwise_bands(incoming))
        .select("doc_id", F.col("band").cast("int").alias("band"), "bkey")
    )


# ---------------------------------------------------------------------
# segment-boundary audit: what keep-first tiling misses
# ---------------------------------------------------------------------
def _segment_boundary_oracle() -> str:
    seg_js = ", ".join(str(j) for j in range(1, SEG_LEN + 1))
    sh_js = ", ".join(str(j) for j in range(SHINGLE_K))
    return f"""
WITH t AS (
  SELECT doc_id, list_transform({_TOKS}, x -> lower(x)) AS t FROM documents),
psh AS (
  SELECT doc_id, u.i AS p, md5(u.sh) AS h
  FROM (SELECT doc_id,
          unnest([struct_pack(i := i,
                  sh := t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  for i in range(1, len(t) - 1)]) AS u
        FROM t WHERE len(t) >= {SHINGLE_K}) x),
hot AS (SELECT h FROM psh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
cp AS (
  SELECT DISTINCT doc_id, p + j.j AS tp
  FROM psh JOIN hot USING (h), (SELECT unnest([{sh_js}]) AS j) j),
segs AS ({_SEGMENTS_SQL}),
rk AS (
  SELECT doc_id, seg_idx,
         row_number() OVER (PARTITION BY md5(seg)
                            ORDER BY doc_id, seg_idx) AS rk
  FROM segs),
rp AS (
  SELECT doc_id, seg_idx * {SEG_LEN} + j.j AS tp
  FROM rk, (SELECT unnest([{seg_js}]) AS j) j
  WHERE rk > 1),
base AS (SELECT doc_id, len(t) AS n_tokens FROM t WHERE len(t) >= {SHINGLE_K}),
cps AS (SELECT doc_id, count(*) AS crossdup FROM cp GROUP BY 1),
rps AS (SELECT doc_id, count(*) AS segrem FROM rp GROUP BY 1),
miss AS (
  SELECT c.doc_id, count(*) AS missed
  FROM cp c
  WHERE NOT EXISTS (SELECT 1 FROM rp
                    WHERE rp.doc_id = c.doc_id AND rp.tp = c.tp)
  GROUP BY 1)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(rps.segrem, 0) AS BIGINT) AS seg_removed_tokens,
       CAST(coalesce(cps.crossdup, 0) AS BIGINT) AS crossdup_tokens,
       CAST(coalesce(miss.missed, 0) AS BIGINT) AS missed_tokens,
       round(coalesce(miss.missed, 0) / CAST(b.n_tokens AS DOUBLE), 6)
         AS missed_ratio
FROM base b
LEFT JOIN cps ON cps.doc_id = b.doc_id
LEFT JOIN rps ON rps.doc_id = b.doc_id
LEFT JOIN miss ON miss.doc_id = b.doc_id
"""


@register("dedup_segment_boundary_audit", oracle=_segment_boundary_oracle)
def dedup_segment_boundary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The segment tiling's BLIND-SPOT audit (the reason ExactSubstr
    dedup uses suffix arrays, quantified per doc): a duplicated span
    that straddles a {SEG_LEN}-token segment boundary — or sits at a
    different offset mod {SEG_LEN} in its twin — hashes into different
    segments and survives keep-first. The overlapping {SHINGLE_K}-gram
    index sees every such span regardless of alignment, so per doc this
    reports: token positions covered by at least one CROSS-DOC-shared
    shingle (``crossdup_tokens``, the alignment-free upper bound),
    positions inside keep-first-removed segments
    (``seg_removed_tokens``), and the positions the tiling MISSED
    (covered by a shared shingle, outside every removed segment) with
    their ratio — the number that decides whether the cheap tiling
    pass suffices or a suffix-style pass is worth its cost. Both sides
    use the segment family's normalization (lowercased tokens).

    100 TB shape: no pair join anywhere — the cross-doc test is a
    linear partial-aggregated count(DISTINCT doc_id) per 16-byte
    shingle hash, coverage explodes are a constant {SHINGLE_K}x /
    {SEG_LEN}x of linear, the miss test is a per-(doc, position)
    anti-join co-partitioned on doc_id, and every rollup
    partial-aggregates. Shingle text never shuffles (md5 first)."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.transform(tokens_array(F.col("text")), F.lower)
    t = d.filter(F.size(toks) >= SHINGLE_K).select(
        "doc_id", toks.alias("t")
    )
    length = F.size("t") - (SHINGLE_K - 1)
    parts = [F.slice("t", F.lit(j + 1), length) for j in range(SHINGLE_K)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda x, y: F.concat_ws(" ", x, y))
    # r18 opt (guide §5): psh fed four executions (hot + the cp join,
    # each twice via cp's two consumers); cp and rp each fed two (their
    # per-doc count and the miss anti-join). Checkpoint each once.
    psh = t.select("doc_id", F.posexplode(grams).alias("p0", "sh")).select(
        "doc_id", (F.col("p0") + 1).alias("p"), F.md5("sh").alias("h")
    ).localCheckpoint()
    hot = (
        psh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    cp = (
        psh.join(hot, "h")
        .select(
            "doc_id",
            F.explode(
                F.array(*[F.col("p") + j for j in range(SHINGLE_K)])
            ).alias("tp"),
        )
        .distinct()
        .localCheckpoint()
    )
    occ = segments_df(spark, sf_dir).select(
        "doc_id", "seg_idx", F.md5("seg").alias("sh_h")
    )
    w = Window.partitionBy("sh_h").orderBy("doc_id", "seg_idx")
    rp = (
        occ.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.col("seg_idx") * SEG_LEN + j
                        for j in range(1, SEG_LEN + 1)
                    ]
                )
            ).alias("tp"),
        )
        .localCheckpoint()
    )
    base = t.select("doc_id", F.size("t").cast("bigint").alias("n_tokens"))
    cps = cp.groupBy("doc_id").agg(F.count("*").alias("crossdup"))
    rps = rp.groupBy("doc_id").agg(F.count("*").alias("segrem"))
    miss = (
        cp.join(rp, ["doc_id", "tp"], "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("missed"))
    )
    return (
        base.join(cps, "doc_id", "left")
        .join(rps, "doc_id", "left")
        .join(miss, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("segrem", F.lit(0)).cast("bigint").alias(
                "seg_removed_tokens"
            ),
            F.coalesce("crossdup", F.lit(0)).cast("bigint").alias(
                "crossdup_tokens"
            ),
            F.coalesce("missed", F.lit(0)).cast("bigint").alias("missed_tokens"),
            F.round(
                F.coalesce("missed", F.lit(0)) / F.col("n_tokens").cast("double"),
                6,
            ).alias("missed_ratio"),
        )
    )


# ---------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
# MOSS local-fingerprinting algorithm; north-star dedup family)
# ---------------------------------------------------------------------
#: winnowing window: every WINNOW_W consecutive shingle hashes select
#: exactly one fingerprint (the minimum, rightmost on ties)
WINNOW_W = 4
#: the winnowing GUARANTEE (paper §3): any token run shared by two
#: documents of at least WINNOW_W + SHINGLE_K - 1 tokens produces at
#: least one shared fingerprint — pinned by pytest on planted docs
WINNOW_GUARANTEE = WINNOW_W + SHINGLE_K - 1

#: the winnowing selection as reusable CTEs ending in ``sel`` (raw
#: per-doc distinct fingerprints) and ``fps`` (the DF-capped index) —
#: shared by dedup_winnowing and the streaming ingestion probe
_WINNOW_SEL_SQL = f"""
t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
shl AS (
  SELECT doc_id,
         [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          for i in range(1, len(t) - 1)] AS shl
  FROM t WHERE len(t) >= {WINNOW_GUARANTEE}),
pos AS (
  SELECT doc_id, len(shl) AS m, unnest(shl) AS shingle,
         unnest(range(1, len(shl) + 1)) AS pos
  FROM shl),
keys AS (
  SELECT doc_id, pos, m,
         md5(shingle) || lpad(CAST(1000000000 - pos AS VARCHAR), 10, '0') AS key
  FROM pos),
sel AS MATERIALIZED (
  SELECT DISTINCT doc_id, substr(wk, 1, 32) AS fp
  FROM (SELECT doc_id, pos, m,
               min(key) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW
                              AND {WINNOW_W - 1} FOLLOWING) AS wk
        FROM keys) x
  WHERE pos + {WINNOW_W} - 1 <= m),
fps AS (
  SELECT doc_id, fp FROM sel
  WHERE fp NOT IN (SELECT fp FROM sel
                   GROUP BY fp HAVING count(*) > {NGRAM_DF_CAP}))
"""

_WINNOW_ORACLE = f"""
WITH {_WINNOW_SEL_SQL.strip()}
SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(count(*) AS BIGINT) AS shared_fps
FROM fps a JOIN fps b ON b.fp = a.fp AND b.doc_id > a.doc_id
GROUP BY 1, 2
"""


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp) for the batch documents table — see winnow_fps_of
    (the streaming ingestion probe applies the same expressions to the
    arriving feed)."""
    return winnow_fps_of(load_table(spark, sf_dir, "documents"))


def winnow_fps_of(d: DataFrame) -> DataFrame:
    """(doc_id, fp): the distinct winnowing fingerprints of every doc
    with >= WINNOW_GUARANTEE tokens, selected ENTIRELY with narrow
    array expressions — zero shuffles until the consumer aggregates:

    - positional k-gram hash keys via the zip_with-slices trick
      (_build_shingles' shape: lambdas only ever reference their OWN
      arguments, so nothing re-evaluates per element);
    - the rightmost-min-of-window rule as ``md5(shingle) ||
      lpad(10^9 - pos)`` string keys (smaller key = smaller hash, then
      LATER position — classic winnowing's tie-break) folded across
      WINNOW_W shifted slices with ``zip_with(least)``: a sliding
      window minimum with no window function, no per-doc sort, no
      Exchange. At 100 TB the fingerprint pass is a pure map stage.

    Row-wise over ANY (doc_id, text) frame — batch table or streaming
    feed (every expression is a stateless projection, so the selection
    is streaming-legal as-is).
    """
    toks = tokens_array(F.col("text"))
    length = F.size(toks) - (SHINGLE_K - 1)
    parts = [F.slice(toks, F.lit(j + 1), length) for j in range(SHINGLE_K)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda x, y: F.concat_ws(" ", x, y))
    keyed = (
        d.filter(F.size(toks) >= WINNOW_GUARANTEE)
        .select(
            "doc_id",
            F.zip_with(
                sh,
                F.sequence(F.lit(1), F.size(sh)),
                lambda s, i: F.concat(
                    F.md5(s),
                    F.lpad((F.lit(1000000000) - i).cast("string"), 10, "0"),
                ),
            ).alias("keys"),
        )
    )
    n_win = F.size(F.col("keys")) - (WINNOW_W - 1)
    wparts = [F.slice(F.col("keys"), F.lit(j + 1), n_win) for j in range(WINNOW_W)]
    wmin = wparts[0]
    for p in wparts[1:]:
        wmin = F.zip_with(wmin, p, lambda x, y: F.least(x, y))
    return keyed.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.transform(wmin, lambda x: F.substring(x, 1, 32)))
        ).alias("fp"),
    )


def winnow_sel_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized RAW winnowing selection (doc_id, fp) — the one
    corpus map pass BOTH the capped index build and the per-source
    telemetry read (r16: the telemetry previously re-ran the pass)."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark,
        ("winnow_sel", sf_dir),
        # adaptive input spread (r18, guide §2.5): the fingerprint
        # selection is a pure map — spread the unsplittable test scan so
        # it runs cluster-wide (winnow_fingerprints itself stays
        # Exchange-free, the pinned 100 TB map-stage shape)
        lambda: winnow_fps_of(_docs_spread(spark, sf_dir)),
    )


def _build_winnow_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DF-capped winnowing fingerprint index: hot fingerprints
    (> NGRAM_DF_CAP docs = boilerplate) dropped via the family's
    broadcast anti-join (the hot list is tiny by construction)."""
    sel = winnow_sel_memo(spark, sf_dir)
    hot = (
        sel.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > NGRAM_DF_CAP)
        .select("fp")
    )
    return sel.join(F.broadcast(hot), "fp", "left_anti")


def winnow_fps_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized capped winnowing fingerprint index — consumed
    by dedup_winnowing (both join sides) and the streaming ingestion
    probe's static index (at 100 TB: one materialized fingerprint
    table on parquet, every consumer joins it)."""
    from mapreducecf_spark.memo import session_memo

    return session_memo(
        spark, ("winnow_fps", sf_dir), lambda: _build_winnow_capped(spark, sf_dir)
    )


@register("dedup_winnowing", oracle=_WINNOW_ORACLE)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by WINNOWING fingerprints — the MOSS
    local-fingerprinting dedup, the positional complement of MinHash
    (which sketches the shingle SET and loses locality): per document,
    every window of {WINNOW_W} consecutive k-gram hashes contributes
    its minimum (rightmost on ties), giving ~2/(w+1) selection density
    with the GUARANTEE that any shared token run of >=
    {WINNOW_GUARANTEE} tokens is caught — the property exact-set
    sketches cannot offer. Fingerprinting is a pure narrow map stage
    (see winnow_fingerprints); pairing is one equi-join on the
    fingerprint hash with the same DF-cap (> {NGRAM_DF_CAP} docs =
    boilerplate, dropped broadcast-anti-join-side) that bounds every
    inverted-index join here, so per-fingerprint work is <= cap^2
    regardless of corpus size. md5-derived and fully deterministic:
    the oracle replays the identical selection with SQL window
    functions — two engines, two mechanisms, one result. The capped
    index is session-memoized (winnow_fps_capped — the streaming
    ingestion probe shares it)."""
    fps = winnow_fps_capped(spark, sf_dir)
    return (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .agg(F.count("*").alias("shared_fps"))
    )


# ---------------------------------------------------------------------
# per-source winnowing telemetry (r16) — the boilerplate report the
# local-fingerprint family was missing (VERDICT r15 #6 candidate)
# ---------------------------------------------------------------------
_WINNOW_TELEMETRY_ORACLE = f"""
WITH {_WINNOW_SEL_SQL.strip()},
hot AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) > {NGRAM_DF_CAP}),
per AS (
  SELECT d.source,
         CAST(count(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_fp_rows,
         CAST(count(*) FILTER (WHERE h.fp IS NOT NULL) AS BIGINT) AS n_hot_rows,
         CAST(count(DISTINCT s.fp) AS BIGINT) AS n_uniq_fps
  FROM sel s JOIN documents d ON d.doc_id = s.doc_id
  LEFT JOIN hot h ON h.fp = s.fp
  GROUP BY 1)
SELECT source, n_docs, n_fp_rows, n_hot_rows, n_uniq_fps,
       CAST((2000000 * n_hot_rows + n_fp_rows) // (2 * n_fp_rows) AS BIGINT)
         AS boilerplate_micro,
       CAST((2000000 * n_fp_rows + n_docs) // (2 * n_docs) AS BIGINT)
         AS density_micro
FROM per
"""


@register("dedup_winnow_telemetry", oracle=_WINNOW_TELEMETRY_ORACLE)
def dedup_winnow_telemetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE winnowing telemetry — the boilerplate health report
    a crawl-curation pipeline reads before it trusts the near-dup
    pass: for every source, the fingerprinted doc count, total and
    distinct fingerprint volume, how many fingerprint occurrences sit
    on corpus-HOT fingerprints (> {NGRAM_DF_CAP} docs — the DF-cap's
    boilerplate class: headers, licenses, navigation chrome), the
    half-up boilerplate share in micro units, and fingerprint density
    per doc. A source whose boilerplate_micro spikes is shipping
    templated chrome the capped pair join is silently (and correctly)
    ignoring — this row makes that visible instead of implicit.

    Scale shape: rides the same narrow zero-Exchange fingerprint
    selection as dedup_winnowing (one map pass over the corpus); the
    hot list is tiny by construction and broadcast; the report is one
    partial-aggregated groupBy per source. Exact bigint `div` for
    both rates (the pipe_token_apportion recipe — no float division
    anywhere)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sel = winnow_sel_memo(spark, sf_dir)
    hot = (
        sel.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > NGRAM_DF_CAP)
        .select("fp", F.lit(1).alias("is_hot"))
    )
    per = (
        sel.join(F.broadcast(hot), "fp", "left")
        .join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_fp_rows"),
            F.sum(F.coalesce(F.col("is_hot"), F.lit(0)))
            .cast("bigint")
            .alias("n_hot_rows"),
            F.countDistinct("fp").cast("bigint").alias("n_uniq_fps"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "n_fp_rows",
        "n_hot_rows",
        "n_uniq_fps",
        F.expr("(2000000 * n_hot_rows + n_fp_rows) div (2 * n_fp_rows)").alias(
            "boilerplate_micro"
        ),
        F.expr("(2000000 * n_fp_rows + n_docs) div (2 * n_docs)").alias(
            "density_micro"
        ),
    )


# ---------------------------------------------------------------------
# dedup threshold tuning curve (r15) — the dedup twin of the ANN
# nprobe/ef sweeps: one widest pass, every sweep point a filter
# ---------------------------------------------------------------------
#: sweep points over the verified-pair Jaccard (>= the family floor)
SWEEP_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9, 1.0)


def _threshold_sweep_sql() -> str:
    ths = ", ".join(f"{t}::DOUBLE" for t in SWEEP_THRESHOLDS)
    return f"""
WITH pairs AS ({_minhash_oracle()}),
nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
th AS (SELECT unnest([{ths}]) AS threshold),
hits AS (
  SELECT t.threshold, p.ida, p.idb
  FROM pairs p JOIN th t ON p.jaccard >= t.threshold),
agg AS (
  SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT idb) AS BIGINT) AS n_removed
  FROM hits GROUP BY 1)
SELECT t.threshold,
       CAST(coalesce(a.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(coalesce(a.n_removed, 0) * 1000000 // nd AS BIGINT) AS removed_ppm
FROM th t CROSS JOIN nd LEFT JOIN agg a ON a.threshold = t.threshold
"""


@register("dedup_threshold_sweep", oracle=_threshold_sweep_sql())
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aggressiveness tuning curve — the threshold sweep every
    near-dup deployment runs before picking its cutoff, in the same
    one-widest-pass shape as sim_ivf_nprobe_sweep / sim_beam_ef_sweep:
    the MEMOIZED verified MinHash-LSH pair table (already computed at
    the family floor {JACCARD_THRESHOLD}) is the widest point, and
    every sweep threshold in {SWEEP_THRESHOLDS} is a pure FILTER over
    its rounded Jaccard — no re-pairing, no second corpus scan.
    Per point: surviving pair count, docs removed under the keep-first
    greedy (drop every doc that near-dups a SMALLER id — the pair-level
    aggressiveness proxy; per-threshold transitive closure would re-run
    the star contraction six times for a tuning report), and removal
    parts-per-million of the corpus as exact bigint div. Zero-match
    points keep their row (left join from the threshold literals).
    Sweep points NEST by construction — pinned in pytest."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    nd = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("nd")
    )
    th = (
        pairs.sparkSession.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(float(t)) for t in SWEEP_THRESHOLDS])
            ).alias("threshold")
        )
    )
    hits = pairs.crossJoin(F.broadcast(th)).filter(
        F.col("jaccard") >= F.col("threshold")
    )
    agg = hits.groupBy("threshold").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.countDistinct("idb").cast("bigint").alias("n_removed"),
    )
    return (
        th.join(agg, "threshold", "left")
        .crossJoin(F.broadcast(nd))
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias("n_removed"),
            F.expr(
                "CAST(coalesce(n_removed, 0) * 1000000 div nd AS BIGINT)"
            ).alias("removed_ppm"),
        )
    )


# ---------------------------------------------------------------------
# Bloom-filter shard overlap — the constant-size cross-shard dedup scout
# ---------------------------------------------------------------------
#: Bloom geometry: 64 words × 62 usable bits (bit 62/63 never set, so no
#: engine ever left-shifts into the sign bit — DuckDB's checked ``<<``
#: overflows on 1<<63) = 3968 positions, probed by BLOOM_K
#: Kirsch-Mitzenmacher double hashes from ONE md5 per shingle (the
#: dedup_minhash_weighted seed recipe — exact bigint arithmetic,
#: identical in both engines). Sized for the TEST corpus (≈1–3k capped
#: shingles per shard at the graded SFs → a visibly loaded filter); a
#: production shard filter scales m with expected items (Dolma runs
#: tens of GB of bits) but the PLAN is identical — the constant below
#: is the only knob.
BLOOM_WORDS = 64
BLOOM_WORD_BITS = 62
BLOOM_M = BLOOM_WORDS * BLOOM_WORD_BITS
BLOOM_K = 3


def _bloom_positions(col: Column) -> list[Column]:
    """The {BLOOM_K} Kirsch-Mitzenmacher bit positions of a shingle —
    v1/v2 from ONE md5 (the ``dedup_minhash_weighted`` seed recipe,
    dedup.py:1537), position_i = (v1 + i·v2) mod {BLOOM_M}. Pure
    row-wise JVM expressions, shared by the batch filter build and the
    streaming edge probe."""
    h = F.md5(col)
    v1 = F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")
    v2 = F.conv(F.substring(h, 13, 12), 16, 10).cast("bigint")
    return [(v1 + F.lit(i) * v2) % F.lit(BLOOM_M) for i in range(BLOOM_K)]


def bloom_shard_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized distinct (source, shingle) item sets — the
    probe/truth base THREE bloom operators re-derived per call
    (bloom_shard_words' build, dedup_bloom_shards, and
    dedup_bloom_fpp_audit each joined the capped index to the docs dim
    and re-distincted it; r18 opt, the family's build-once shape)."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        sh = capped_shingles(spark, sf_dir)
        d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        return sh.join(d, "doc_id").select("source", "shingle").distinct()

    return session_memo(spark, ("bloom_items", sf_dir), build)


def bloom_shard_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, w, bits) — every shard's Bloom filter as ≤{BLOOM_WORDS}
    int64 words, session-memoized (the persisted-artifact shape: at
    100 TB this IS the tiny table a deployment keeps per shard). One
    linear pass: distinct (source, shingle) → {BLOOM_K} positions →
    per-(shard, word) bit_or — a bounded-cardinality map-side-
    combinable aggregation (shards × {BLOOM_WORDS} rows total no
    matter the corpus). Shared by ``dedup_bloom_shards`` (pairwise
    AND popcounts) and the ``stream_bloom_dedup`` edge probe."""
    from mapreducecf_spark.memo import session_memo

    def build() -> DataFrame:
        items = bloom_shard_items(spark, sf_dir)
        pos = items.select(
            "source",
            F.explode(F.array(*_bloom_positions(F.col("shingle")))).alias("p"),
        ).distinct()
        return pos.groupBy(
            "source", F.expr(f"p div {BLOOM_WORD_BITS}").alias("w")
        ).agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), "
                f"CAST(p % {BLOOM_WORD_BITS} AS INT)))"
            ).alias("bits")
        )

    return session_memo(spark, ("bloom_words", sf_dir), build)


def _bloom_shards_sql() -> str:
    return f"""
WITH sh_all AS ({_SHINGLES_SQL}),
sh AS ({_CAPPED_SH_SQL}),
items AS MATERIALIZED (
  SELECT DISTINCT d.source, s.shingle
  FROM sh s JOIN documents d USING (doc_id)),
pos AS (
  SELECT DISTINCT source,
         ((('0x' || substr(md5(shingle), 1, 12))::BIGINT
           + i.i * ('0x' || substr(md5(shingle), 13, 12))::BIGINT)
          % {BLOOM_M}) AS p
  FROM items, range(0, {BLOOM_K}) i(i)),
words AS MATERIALIZED (
  SELECT source, p // {BLOOM_WORD_BITS} AS w,
         bit_or(1::BIGINT << CAST(p % {BLOOM_WORD_BITS} AS INT)) AS bits
  FROM pos GROUP BY 1, 2),
shard AS MATERIALIZED (
  SELECT n.source, n.n_items, b.bits_set
  FROM (SELECT source, CAST(count(DISTINCT shingle) AS BIGINT) AS n_items
        FROM items GROUP BY 1) n
  JOIN (SELECT source, CAST(sum(bit_count(bits)) AS BIGINT) AS bits_set
        FROM words GROUP BY 1) b USING (source)),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM shard a, shard b WHERE a.source < b.source),
band AS (
  SELECT wa.source AS src_a, wb.source AS src_b,
         CAST(sum(bit_count(wa.bits & wb.bits)) AS BIGINT) AS bits_and
  FROM words wa JOIN words wb ON wa.w = wb.w AND wa.source < wb.source
  GROUP BY 1, 2),
ex AS (
  SELECT ia.source AS src_a, ib.source AS src_b,
         CAST(count(*) AS BIGINT) AS exact_shared
  FROM items ia JOIN items ib
    ON ia.shingle = ib.shingle AND ia.source < ib.source
  GROUP BY 1, 2)
SELECT p.src_a, p.src_b,
       sa.n_items AS n_a, sb.n_items AS n_b,
       sa.bits_set AS bits_a, sb.bits_set AS bits_b,
       COALESCE(band.bits_and, 0) AS bits_and,
       COALESCE(ex.exact_shared, 0) AS exact_shared
FROM pairs p
JOIN shard sa ON sa.source = p.src_a
JOIN shard sb ON sb.source = p.src_b
LEFT JOIN band ON band.src_a = p.src_a AND band.src_b = p.src_b
LEFT JOIN ex ON ex.src_a = p.src_a AND ex.src_b = p.src_b
"""


@register("dedup_bloom_shards", oracle=_bloom_shards_sql)
def dedup_bloom_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER SHARD OVERLAP — the constant-size scout that tells
    a 100 TB dedup run WHICH shard pairs are worth a cross-shard pass
    (the Dolma/CCNet bloom pre-filter, shard = source): each shard's
    DF-capped shingle set folds into a {BLOOM_M}-bit filter
    ({BLOOM_WORDS} int64 words, {BLOOM_K} Kirsch-Mitzenmacher probes
    per shingle), and every pair's overlap signal is a
    {BLOOM_WORDS}-word AND + popcount — the cross-shard comparison
    reads {BLOOM_WORDS} integers per shard, NEVER the shards' content.
    Per the family's sketch-vs-exact discipline the exact distinct
    shared-shingle count rides beside the popcounts (at the graded SFs
    the audit is cheap; at 100 TB a deployment keeps only the filters
    and runs the exact join on the flagged pairs).

    Scale shape: ONE linear pass builds all filters (distinct
    (source, shingle) → {BLOOM_K} positions → per-(shard, word) bit_or
    — a bounded-cardinality map-side-combinable aggregation: shards ×
    {BLOOM_WORDS} rows total, no matter the corpus); the pair stage
    joins word tables of ≤{BLOOM_WORDS} rows per shard (shard count is
    bounded — sources, not documents); the exact audit is the capped
    inverted-index equi-join (fan-out ≤ shards² per shingle, DF-capped
    upstream). No float anywhere: popcounts and counts are the output,
    so the full hash gate applies. Hash family: v1/v2 from one md5
    (``dedup.py:1537`` recipe), positions (v1 + i·v2) mod {BLOOM_M} —
    62-bit words so neither engine shifts into the sign bit."""
    items = bloom_shard_items(spark, sf_dir)
    words = bloom_shard_words(spark, sf_dir)
    shard = (
        items.groupBy("source")
        .agg(F.countDistinct("shingle").cast("bigint").alias("n_items"))
        .join(
            words.groupBy("source").agg(
                F.sum(F.bit_count("bits")).cast("bigint").alias("bits_set")
            ),
            "source",
        )
        .localCheckpoint()
    )
    sa = shard.select(
        F.col("source").alias("src_a"),
        F.col("n_items").alias("n_a"),
        F.col("bits_set").alias("bits_a"),
    )
    sb = shard.select(
        F.col("source").alias("src_b"),
        F.col("n_items").alias("n_b"),
        F.col("bits_set").alias("bits_b"),
    )
    pairs = sa.join(F.broadcast(sb), F.col("src_a") < F.col("src_b"))
    wa = words.select(
        F.col("source").alias("src_a"), "w", F.col("bits").alias("wbits_a")
    )
    wb = words.select(
        F.col("source").alias("src_b"),
        F.col("w").alias("w_b"),
        F.col("bits").alias("wbits_b"),
    )
    band = (
        wa.join(
            F.broadcast(wb),
            (F.col("w") == F.col("w_b")) & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.bit_count(F.col("wbits_a").bitwiseAND(F.col("wbits_b"))))
            .cast("bigint")
            .alias("bits_and")
        )
    )
    ia = items.select(F.col("source").alias("src_a"), "shingle")
    ib = items.select(
        F.col("source").alias("src_b"), F.col("shingle").alias("shingle_b")
    )
    ex = (
        ia.join(
            ib,
            (F.col("shingle") == F.col("shingle_b"))
            & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("exact_shared"))
    )
    return (
        pairs.join(band, ["src_a", "src_b"], "left")
        .join(ex, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "bits_a",
            "bits_b",
            F.coalesce("bits_and", F.lit(0)).cast("bigint").alias("bits_and"),
            F.coalesce("exact_shared", F.lit(0)).cast("bigint").alias("exact_shared"),
        )
    )


def _bloom_fpp_sql() -> str:
    return f"""
WITH sh_all AS ({_SHINGLES_SQL}),
sh AS ({_CAPPED_SH_SQL}),
items AS MATERIALIZED (
  SELECT DISTINCT d.source, s.shingle
  FROM sh s JOIN documents d USING (doc_id)),
pos AS (
  SELECT DISTINCT source,
         ((('0x' || substr(md5(shingle), 1, 12))::BIGINT
           + i.i * ('0x' || substr(md5(shingle), 13, 12))::BIGINT)
          % {BLOOM_M}) AS p
  FROM items, range(0, {BLOOM_K}) i(i)),
words AS MATERIALIZED (
  SELECT source, p // {BLOOM_WORD_BITS} AS w,
         bit_or(1::BIGINT << CAST(p % {BLOOM_WORD_BITS} AS INT)) AS bits
  FROM pos GROUP BY 1, 2),
probe AS (
  SELECT it.source AS src_probe, it.shingle, i.i AS i,
         ((('0x' || substr(md5(it.shingle), 1, 12))::BIGINT
           + i.i * ('0x' || substr(md5(it.shingle), 13, 12))::BIGINT)
          % {BLOOM_M}) AS p
  FROM items it, range(0, {BLOOM_K}) i(i)),
bhit AS MATERIALIZED (
  SELECT p.src_probe, p.shingle, w.source AS shard
  FROM probe p
  JOIN words w
    ON w.w = p.p // {BLOOM_WORD_BITS}
   AND (w.bits & (1::BIGINT << CAST(p.p % {BLOOM_WORD_BITS} AS INT)))
       = (1::BIGINT << CAST(p.p % {BLOOM_WORD_BITS} AS INT))
   AND w.source <> p.src_probe
  GROUP BY 1, 2, 3
  HAVING count(*) = {BLOOM_K}),
truth AS (
  SELECT ia.source AS src_probe, ia.shingle, ib.source AS shard
  FROM items ia JOIN items ib
    ON ib.shingle = ia.shingle AND ib.source <> ia.source),
audited AS (
  SELECT b.src_probe, b.shingle, b.shard,
         CASE WHEN t.shard IS NULL THEN 1 ELSE 0 END AS fp
  FROM bhit b LEFT JOIN truth t
    ON t.src_probe = b.src_probe AND t.shingle = b.shingle
   AND t.shard = b.shard),
shardn AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_shards FROM items)
SELECT CAST((SELECT count(*) FROM items) AS BIGINT)
         * ((SELECT n_shards FROM shardn) - 1) AS n_probes,
       CAST((SELECT count(*) FROM bhit) AS BIGINT) AS n_bloom_hits,
       CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT CAST(sum(fp) AS BIGINT) FROM audited) AS BIGINT) AS n_fp,
       CAST((SELECT CAST(sum(fp) AS BIGINT) FROM audited) * 1000000
            // ((SELECT count(*) FROM items)
                * ((SELECT n_shards FROM shardn) - 1)
                - (SELECT count(*) FROM truth)) AS BIGINT) AS fpp_ppm
"""


@register("dedup_bloom_fpp_audit", oracle=_bloom_fpp_sql)
def dedup_bloom_fpp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom filters' MEASURED false-positive rate — the family's
    audit discipline applied to the shard scout (a compression tier
    ships with a measured recall; a Bloom filter ships with a measured
    FPP, because the theoretical (1−e^{{−kn/m}})^k curve assumes ideal
    hashes and the deployment's k/m/n sit wherever they sit): every
    (shingle, FOREIGN shard) probe — exactly the ``stream_bloom_dedup``
    membership test — is audited against exact cross-shard membership.
    n_probes = items × (shards − 1); a bloom hit with no true match is
    a false positive; fpp_ppm = n_fp·1e6 div (negatives) is the
    operating number a deployment compares to its budget before
    trusting an empty popcount to skip a shard pair. Bloom's
    no-false-negative guarantee is NOT restated here as a column — it
    is pytest-pinned (n_bloom_hits − n_fp == n_true, i.e. every true
    cross-shard shingle is hit).

    Shape: probes are the same three stateless broadcast word-table
    equi-joins as the edge probe (fan-out ≤ shard count per probe);
    the truth side is the capped inverted-index equi-join
    (``dedup_bloom_shards``'s exact audit); output is ONE integer row
    — all counts, one bigint div."""
    items = bloom_shard_items(spark, sf_dir)
    wt = bloom_shard_words(spark, sf_dir)
    posns = _bloom_positions(F.col("shingle"))
    own = items.select(
        F.col("source").alias("src_probe"),
        "shingle",
        *[p.alias(f"p{i}") for i, p in enumerate(posns)],
    )
    for i in range(BLOOM_K):
        own = own.withColumn(
            f"w{i}", F.expr(f"p{i} div {BLOOM_WORD_BITS}")
        ).withColumn(
            f"m{i}",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(p{i} % {BLOOM_WORD_BITS} AS INT))"
            ),
        )
    j = own
    for i in range(BLOOM_K):
        side = F.broadcast(
            wt.select(
                F.col("source").alias(f"s{i}"),
                F.col("w").alias(f"sw{i}"),
                F.col("bits").alias(f"sb{i}"),
            )
        )
        cond = F.col(f"w{i}") == F.col(f"sw{i}")
        if i > 0:
            cond = cond & (F.col(f"s{i}") == F.col("s0"))
        j = j.join(side, cond).filter(
            F.col(f"sb{i}").bitwiseAND(F.col(f"m{i}")) == F.col(f"m{i}")
        )
    bhit = (
        j.filter(F.col("s0") != F.col("src_probe"))
        .select("src_probe", "shingle", F.col("s0").alias("shard"))
        .localCheckpoint()
    )
    truth = (
        items.select(F.col("source").alias("src_probe"), "shingle")
        .join(
            items.select(
                F.col("source").alias("shard"), F.col("shingle").alias("sh_b")
            ),
            F.col("sh_b") == F.col("shingle"),
        )
        .filter(F.col("shard") != F.col("src_probe"))
        .select("src_probe", "shingle", "shard")
        # r18 opt (guide §5): the expensive inverted-index self-join
        # feeds THREE branches of the one counts plan (fp's anti-join
        # side, n_true, and n_fp via fp); without truncation each
        # branch re-executes it — checkpoint once, reuse thrice
        .localCheckpoint()
    )
    fp = bhit.join(truth, ["src_probe", "shingle", "shard"], "left_anti")
    # one pass over the checkpointed items for both scalars (was two)
    n_ns = items.agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.countDistinct("source").cast("bigint").alias("n_shards"),
    )
    counts = (
        n_ns.crossJoin(
            F.broadcast(bhit.agg(F.count("*").cast("bigint").alias("n_bloom_hits")))
        )
        .crossJoin(
            F.broadcast(truth.agg(F.count("*").cast("bigint").alias("n_true")))
        )
        .crossJoin(F.broadcast(fp.agg(F.count("*").cast("bigint").alias("n_fp"))))
    )
    return counts.select(
        (F.col("n_items") * (F.col("n_shards") - 1)).cast("bigint").alias("n_probes"),
        "n_bloom_hits",
        "n_true",
        "n_fp",
        F.expr(
            "CAST(n_fp * 1000000 div (n_items * (n_shards - 1) - n_true)"
            " AS BIGINT)"
        ).alias("fpp_ppm"),
    )
