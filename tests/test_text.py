"""Unit tests for queries.text — the properties the parity check can't
see: normalization collisions and heuristic behavior on known inputs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fingerprint_collapses_case_punct_whitespace(spark):
    from mapreducecf_spark.operators.wordcount import tokenize  # noqa: F401
    from mapreducecf_spark.queries.text import tokens_array

    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "HELLO--WORLD"),  # punct deleted, not spaced: "helloworld"
        ],
        "doc_id int, text string",
    )
    canon = F.array_join(F.transform(tokens_array(F.col("text")), F.lower), " ")
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", F.md5(canon).alias("fp")).collect()}
    assert fps[1] == fps[2]
    # reference tokenizer deletes punctuation (T2), so 3 is ONE token
    assert fps[3] != fps[1]


def test_language_id_flags_stopword_heavy_text(spark):
    from mapreducecf_spark.queries.text import STOPWORDS, tokens_array

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and it is warm"), (2, "foo bar baz qux")],
        "doc_id int, text string",
    )
    toks = tokens_array(F.col("text"))
    lowered = F.transform(toks, F.lower)
    ratio = (
        F.size(F.filter(lowered, lambda x: x.isin(*STOPWORDS))).cast("double")
        / F.size(toks)
    )
    rows = {r["doc_id"]: r["r"] for r in df.select("doc_id", ratio.alias("r")).collect()}
    assert rows[1] >= 0.05
    assert rows[2] == 0.0


def test_doc_token_stats_is_narrow(spark, sf_dir):
    """The per-doc stats must not shuffle: no Exchange in the plan."""
    import contextlib
    import io

    from mapreducecf_spark.registry import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["text_doc_token_stats"](spark, sf_dir).explain(mode="simple")
    assert "Exchange" not in buf.getvalue()


def test_registered_udf_matches_native_tokenizer(spark, sf_dir):
    """The SQL-registered Arrow UDF and the JVM-side HOF expression
    must agree token-for-token (same reference tokenizer semantics)."""
    from mapreducecf_spark.registry import QUERIES

    udf_counts = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["scalar_udf_tokens"](spark, sf_dir).collect()
    }
    native = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["text_doc_token_stats"](spark, sf_dir).collect()
    }
    assert udf_counts == native


def test_bpe_merge_step_shape(spark, sf_dir):
    """Top-20 adjacent pairs: all length 2, counts non-increasing, and
    the top pair matches a driver-side recount."""
    from collections import Counter

    from pyspark.sql import functions as F

    from mapreducecf_spark.operators.wordcount import tokens_array
    from mapreducecf_spark.queries.text import text_bpe_merge_step
    from mapreducecf_spark.sources import load_table

    rows = text_bpe_merge_step(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(len(r["pair"]) == 2 for r in rows)
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens_array(F.col("text"))).alias("t"))
        .collect()
    )
    c = Counter()
    for r in toks:
        w = r["t"].lower()
        for i in range(len(w) - 1):
            c[w[i : i + 2]] += 1
    best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert (rows[0]["pair"], rows[0]["cnt"]) == best


def test_bigram_ppl_matches_driver_recompute(spark, sf_dir):
    """Full add-one bigram LM recomputed driver-side for a sample of
    docs; ppl must be exp(-avg) of the rounded avg."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from mapreducecf_spark.operators.wordcount import tokens_array
    from mapreducecf_spark.queries.text import text_bigram_ppl
    from mapreducecf_spark.sources import load_table

    got = {r["doc_id"]: r for r in text_bigram_ppl(spark, sf_dir).collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.transform(tokens_array(F.col("text")), F.lower).alias("lt"))
        .collect()
    )
    c2: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    seqs = {}
    for r in docs:
        lt = list(r["lt"])
        seqs[r["doc_id"]] = lt
        vocab.update(lt)
        for a, b in zip(lt, lt[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    V = float(len(vocab))
    for doc_id in list(seqs)[:50]:
        lt = seqs[doc_id]
        if len(lt) < 2:
            assert doc_id not in got
            continue
        lps = [
            math.log((c2[(a, b)] + 1.0) / (c1[a] + V)) for a, b in zip(lt, lt[1:])
        ]
        r = got[doc_id]
        assert r["n_bigrams"] == len(lps)
        assert abs(r["avg_logprob"] - sum(lps) / len(lps)) < 1e-5
        assert abs(r["ppl"] - round(math.exp(-r["avg_logprob"]), 6)) < 1e-9


def test_langid_confusion_cells_partition_the_corpus(spark, sf_dir, tables):
    """Confusion cells must partition the corpus: per-lang fractions
    sum to 1 and cell counts sum to the document count; predictions
    take only the classifier's two values."""
    from mapreducecf_spark.queries.text import text_langid_confusion

    rows = text_langid_confusion(spark, sf_dir).collect()
    n_docs = tables["documents"].count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["pred_lang"] for r in rows} <= {"en", "unknown"}
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["frac_of_lang"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-5, (lang, s)


def test_char_entropy_bounds_and_extremes(spark):
    """0 for a single-repeated-char doc; exactly ln(n)·1e6-ish for an
    all-distinct doc; always within [0, ln(n_distinct)] + flooring
    slack."""
    import math

    from mapreducecf_spark.queries.text import text_char_entropy  # noqa: F401
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abcdefgh"), (3, "aabbccdd")],
        "doc_id long, text string",
    )
    ch = (
        df.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("doc_id", F.explode(F.split("text", "")).alias("c"))
        .filter(F.col("c") != "")
    )
    cnts = ch.groupBy("doc_id", "c").agg(F.count("*").alias("cnt"))
    agg = cnts.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(
            F.floor(F.col("cnt") * F.log(F.col("cnt").cast("double")) * F.lit(1e6)).cast("bigint")
        ).alias("s"),
    )
    ent = {
        r["doc_id"]: math.floor(math.log(r["n"]) * 1e6) - r["s"] // r["n"]
        for r in agg.collect()
    }
    assert ent[1] == 0  # all same char
    assert abs(ent[2] - math.floor(math.log(8) * 1e6)) <= 8  # all distinct
    assert 0 < ent[3] < ent[2]  # between the extremes


def test_source_divergence_bounds(spark, sf_dir):
    """JSD is bounded by ln2 (in nano units, plus per-char flooring
    slack) and non-vacuous: sources genuinely differ somewhere."""
    import math

    from mapreducecf_spark.queries.text import text_source_divergence

    rows = text_source_divergence(spark, sf_dir).collect()
    assert rows
    bound = math.log(2) * 1e9
    for r in rows:
        assert -r["n_chars_profile"] <= r["jsd_nano"] <= bound + r["n_chars_profile"]
    assert any(r["jsd_nano"] > 0 for r in rows)


def test_pmi_collocations_support_and_order(spark, sf_dir):
    from mapreducecf_spark.queries.text import (
        PMI_MIN_SUPPORT,
        PMI_TOP_K,
        text_pmi_collocations,
    )

    rows = text_pmi_collocations(spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_TOP_K
    assert all(r["n_pair"] >= PMI_MIN_SUPPORT for r in rows)
    pm = [r["pmi_micro"] for r in rows]
    assert pm == sorted(pm, reverse=True)


def test_readability_extremes(spark):
    """A one-syllable-per-word text must grade far below a
    long-word text; sentence floor prevents div-by-zero on
    punctuation-free docs."""
    from pyspark.sql import functions as F

    from mapreducecf_spark.operators.wordcount import tokens_array

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat. it was flat."),
            (2, "extraordinarily multisyllabic vocabulary notwithstanding interminable verbosity"),
        ],
        "doc_id long, text string",
    )
    n_words = F.size(tokens_array(F.col("text"))).cast("bigint")
    n_sent = F.greatest(F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1)).cast("bigint")
    n_syll = F.regexp_count(F.lower("text"), F.lit(r"[aeiouy]+")).cast("bigint")
    fk = (
        F.lit(0.39) * (n_words / n_sent.cast("double"))
        + F.lit(11.8) * (n_syll / n_words.cast("double"))
        - F.lit(15.59)
    )
    rows = {r["doc_id"]: r["g"] for r in df.select("doc_id", fk.alias("g")).collect()}
    assert rows[1] < 5  # simple prose ≈ primary grade
    assert rows[2] > 20  # degenerate long words ≈ absurd grade


def test_bpe_train_matches_reference_python_bpe(spark, monkeypatch):
    """The full merge loop must reproduce canonical Sennrich BPE
    (count adjacent pairs weighted by word freq; best by (count DESC,
    pair text); greedy left-to-right non-overlapping merge) computed
    by a plain Python reference — including doubled-letter runs, where
    greedy parity is the easy thing to get wrong ('aaaa' merges at
    positions 1 and 3, never 2)."""
    import mapreducecf_spark.registry  # noqa: F401  (full init first:
    # queries.text cannot be imported standalone — registry's import
    # order resolves the text<->pipeline fragment dependency)
    import mapreducecf_spark.queries.text as tx

    text1 = "aaaa aaaa aaaa banana banana bandana abba"
    text2 = "banana aaaa cabana abba abba"
    df = spark.createDataFrame(
        [(1, text1), (2, text2)], "doc_id bigint, text string"
    )
    monkeypatch.setattr(tx, "load_table", lambda spark, sf_dir, name: df)

    # pure-Python canonical BPE on the same vocab
    from collections import Counter

    vocab = Counter((text1 + " " + text2).split())
    syms = {w: [c for c in w] for w in vocab}

    def merge(s, a, b):
        out, i = [], 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    expected = []
    for r in range(1, tx.BPE_MERGES + 1):
        counts = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), wf = best
        expected.append((r, a, b, a + b, wf))
        for w in vocab:
            syms[w] = merge(syms[w], a, b)

    got = sorted(
        (r["rk"], r["lhs"], r["rhs"], r["merged"], r["pair_freq"])
        for r in tx.text_bpe_train(spark, "-bpetrain").collect()
    )
    assert got == expected


def test_bpe_apply_encodes_oov_val_words_with_trained_merges(spark, monkeypatch):
    """Rank-ordered application of the TRAIN-split-learned merge table
    to the VAL split must reproduce canonical BPE encoding computed by
    a plain Python reference — including an OOV word the trainer never
    saw (doc ids 1-3 hash to the train bucket, 8/14 to val under the
    md5 mod-100 split)."""
    import mapreducecf_spark.registry  # noqa: F401
    import mapreducecf_spark.queries.text as tx

    train_text = "abab abab abab abab cd cd"
    val_text = "ababab aba cd"  # 'ababab'/'aba' are OOV word types
    df = spark.createDataFrame(
        [(1, train_text), (2, train_text), (3, train_text), (8, val_text), (14, val_text)],
        "doc_id bigint, text string",
    )
    monkeypatch.setattr(tx, "load_table", lambda spark, sf_dir, name: df)

    from collections import Counter

    def merge(s, a, b):
        out, i = [], 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    # reference: train on the train split only
    tvocab = Counter((train_text + " " + train_text + " " + train_text).split())
    tsyms = {w: [c for c in w] for w in tvocab}
    merges = []
    for _ in range(tx.BPE_MERGES):
        counts = Counter()
        for w, f in tvocab.items():
            s = tsyms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append(best)
        tsyms = {w: merge(s, *best) for w, s in tsyms.items()}
    # reference: encode the val vocabulary in rank order
    vvocab = Counter((val_text + " " + val_text).split())
    vsyms = {w: [c for c in w] for w in vvocab}
    for a, b in merges:
        vsyms = {w: merge(s, a, b) for w, s in vsyms.items()}
    expected = {
        w: (vvocab[w], len(s), " ".join(s)) for w, s in vsyms.items()
    }

    got = {
        r["word"]: (r["freq"], r["n_pieces"], r["pieces"])
        for r in tx.text_bpe_apply(spark, "-bpeapply").collect()
    }
    assert got == expected
    # the OOV word really decomposed through learned merges (not chars)
    assert got["ababab"][1] < len("ababab")


def test_kn_ppl_matches_python_reference(spark, monkeypatch):
    """Interpolated fixed-discount KN computed by a plain Python
    reference on a tiny corpus must match the query's per-doc
    avg_logprob to the rounded 6dp — including the continuation
    distribution (a word's probability driven by how many contexts it
    follows, not raw frequency)."""
    import math
    from collections import Counter

    import mapreducecf_spark.registry  # noqa: F401
    import mapreducecf_spark.queries.text as tx

    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the rug",
        3: "a cat and a dog and a bird",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    monkeypatch.setattr(tx, "load_table", lambda spark, sf_dir, name: df)

    D = tx.KN_D
    bigrams = {d: list(zip(t.split(), t.split()[1:])) for d, t in texts.items()}
    c2 = Counter(b for bs in bigrams.values() for b in bs)
    c1 = Counter(b[0] for bs in bigrams.values() for b in bs)
    n1p = Counter(w1 for (w1, _) in c2)
    ncont = Counter(w2 for (_, w2) in c2)
    nbig = float(len(c2))

    def p(w1, w2):
        return (c2[(w1, w2)] - D) / c1[w1] + (D * n1p[w1] / c1[w1]) * (
            ncont[w2] / nbig
        )

    expected = {
        d: round(sum(math.log(p(*b)) for b in bs) / len(bs), 6)
        for d, bs in bigrams.items()
    }
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in tx.text_bigram_kn_ppl(spark, "-knppl").collect()
    }
    assert got == expected
    # interpolated KN is a proper probability: every scored P < 1
    assert all(v < 0 for v in got.values())


def test_trigram_kn_matches_python_reference(spark, monkeypatch):
    """Order-3 interpolated KN (bigram-KN as the lower order) against a
    plain Python reference, rounded 6dp."""
    import math
    from collections import Counter

    import mapreducecf_spark.registry  # noqa: F401
    import mapreducecf_spark.queries.text as tx

    texts = {
        1: "the cat sat on the mat and the cat ran",
        2: "the dog sat on the rug and the dog ran",
        3: "a cat and a dog and a bird sat",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    monkeypatch.setattr(tx, "load_table", lambda spark, sf_dir, name: df)

    D = tx.KN_D
    toks = {d: t.split() for d, t in texts.items()}
    tris = {d: list(zip(t, t[1:], t[2:])) for d, t in toks.items()}
    bigs = {d: list(zip(t, t[1:])) for d, t in toks.items()}
    c3 = Counter(x for xs in tris.values() for x in xs)
    cctx = Counter((a, b) for (a, b, _) in (x for xs in tris.values() for x in xs))
    n1ptri = Counter((a, b) for (a, b, _) in c3)
    c2 = Counter(x for xs in bigs.values() for x in xs)
    c1 = Counter(a for (a, _) in (x for xs in bigs.values() for x in xs))
    n1p = Counter(a for (a, _) in c2)
    ncont = Counter(b for (_, b) in c2)
    nbig = float(len(c2))

    def p2(w1, w2):
        return (c2[(w1, w2)] - D) / c1[w1] + (D * n1p[w1] / c1[w1]) * (
            ncont[w2] / nbig
        )

    def p3(a, b, c):
        return (c3[(a, b, c)] - D) / cctx[(a, b)] + (
            D * n1ptri[(a, b)] / cctx[(a, b)]
        ) * p2(b, c)

    expected = {
        d: round(sum(math.log(p3(*t)) for t in ts) / len(ts), 6)
        for d, ts in tris.items()
    }
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in tx.text_trigram_kn_ppl(spark, "-kn3").collect()
    }
    assert got == expected


def test_mkn_ppl_matches_python_reference(spark, monkeypatch):
    """Modified KN (Chen-Goodman count-estimated discounts) against a
    plain Python reference on a corpus where all three count bands are
    populated — D1/D2/D3+ all fire, plus the backoff-mass identity
    gamma(w1) = sum of removed discounts / c(w1)."""
    import math
    from collections import Counter

    import mapreducecf_spark.registry  # noqa: F401
    import mapreducecf_spark.queries.text as tx

    texts = {
        1: "a b a b a b c d c d e f g h",
        2: "a b c d e f e f e f g h i j",
        3: "g h g h i j k l m n o p q r",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    monkeypatch.setattr(tx, "load_table", lambda spark, sf_dir, name: df)

    D = tx.KN_D
    bigs = {d: list(zip(t.split(), t.split()[1:])) for d, t in texts.items()}
    c2 = Counter(b for bs in bigs.values() for b in bs)
    nr = Counter(c for c in c2.values())
    n1, n2, n3, n4 = (float(nr.get(r, 0)) for r in (1, 2, 3, 4))
    assert n1 > 0 and n2 > 0 and n3 > 0  # all bands populated
    y = n1 / (n1 + 2 * n2) if n1 + 2 * n2 > 0 else 0.0
    d1 = 1 - 2 * y * n2 / n1 if n1 > 0 else D
    d2 = 2 - 3 * y * n3 / n2 if n2 > 0 and n1 + 2 * n2 > 0 else D
    d3 = 3 - 4 * y * n4 / n3 if n3 > 0 and n1 + 2 * n2 > 0 else D
    c1 = Counter(a for (a, _) in (b for bs in bigs.values() for b in bs))
    m = {}
    for (a, _), c in c2.items():
        s = m.setdefault(a, [0.0, 0.0, 0.0])
        s[0 if c == 1 else 1 if c == 2 else 2] += 1
    ncont = Counter(b for (_, b) in c2)
    nbig = float(len(c2))

    def p(w1, w2):
        c = c2[(w1, w2)]
        disc = d1 if c == 1 else d2 if c == 2 else d3
        m1, m2_, m3 = m[w1]
        gamma = (d1 * m1 + d2 * m2_ + d3 * m3) / c1[w1]
        return (c - disc) / c1[w1] + gamma * (ncont[w2] / nbig)

    expected = {
        d: round(sum(math.log(p(*b)) for b in bs) / len(bs), 6)
        for d, bs in bigs.items()
    }
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in tx.text_bigram_mkn_ppl(spark, "-mkn").collect()
    }
    assert got == expected


def test_text_ppl_filter_gate_semantics(spark, sf_dir):
    """The perplexity gate must flag exactly the docs strictly above
    the interpolated p90 of the per-doc KN perplexities (recomputed
    here from the scoring query itself), and the per-source report
    must reconcile with the doc-level truth."""
    import math

    import mapreducecf_spark.registry  # noqa: F401  (full init first:
    # importing queries.text directly mid-registry trips the circular
    # BPE_RE import from queries.pipeline)
    from mapreducecf_spark.queries.text import (
        PPL_FILTER_Q,
        text_bigram_kn_ppl,
        text_ppl_filter,
    )

    ppl = {
        r["doc_id"]: int(round(r["ppl"] * 1_000_000))
        for r in text_bigram_kn_ppl(spark, sf_dir).collect()
    }
    vals = sorted(ppl.values())
    idx = (len(vals) - 1) * PPL_FILTER_Q
    lo, hi = vals[math.floor(idx)], vals[math.ceil(idx)]
    cut = lo + (idx - math.floor(idx)) * (hi - lo)
    expected_flagged = sum(1 for v in ppl.values() if v > cut)

    rows = text_ppl_filter(spark, sf_dir).collect()
    assert sum(r["n_flagged"] for r in rows) == expected_flagged
    assert sum(r["n_docs"] for r in rows) == len(vals)
    assert expected_flagged > 0  # the gate must not be vacuous
    worst_overall = max(r["worst_ppl_micro"] for r in rows)
    assert worst_overall == max(vals)
    for r in rows:
        assert 0 <= r["flag_rate_micro"] <= 1_000_000
        assert ppl[r["worst_doc_id"]] == r["worst_ppl_micro"]


def _ref_textrank(texts, vocab_cap=200, rounds=3, topk=20):
    """Pure-Python witness for text_textrank_keywords: tokenizer,
    frequency vocab, symmetrized bigram weights, micro-share floors,
    damped integer power iteration — independent of Spark/SQL."""
    import re
    from collections import defaultdict

    stop = {"the", "a", "an", "of", "to", "and", "in", "is", "it", "that"}
    docs = []
    for t in texts:
        cleaned = re.sub(r"[!-/:-@\[-`{-~]", "", t)
        docs.append([x.lower() for x in re.split(" +", cleaned) if re.search(r"\S", x)])
    freq = defaultdict(int)
    for d in docs:
        for w in d:
            if w not in stop:
                freq[w] += 1
    vocab = [w for w, _ in sorted(freq.items(), key=lambda x: (-x[1], x[0]))[:vocab_cap]]
    vs = set(vocab)
    pair = defaultdict(int)
    for d in docs:
        for a, b in zip(d, d[1:]):
            if a != b and a in vs and b in vs:
                pair[(a, b)] += 1
    ew = defaultdict(int)
    for (a, b), w in pair.items():
        ew[(a, b)] += w
        ew[(b, a)] += w
    tw = defaultdict(int)
    for (a, _b), w in ew.items():
        tw[a] += w
    sh = {e: (w * 10**6) // tw[e[0]] for e, w in ew.items()}
    nv = len(vocab)
    r = {w: 10**12 // nv for w in vocab}
    tele = (3 * 10**12 // 20) // nv
    for _ in range(rounds):
        c = defaultdict(int)
        for (a, b), s in sh.items():
            c[b] += (r[a] * s) // 10**6
        r = {w: tele + (17 * c[w]) // 20 for w in vocab}
    ranked = sorted(r.items(), key=lambda x: (-x[1], x[0]))[:topk]
    return {w: (v, i + 1) for i, (w, v) in enumerate(ranked)}


def test_textrank_matches_independent_witness(spark, monkeypatch):
    """text_textrank_keywords on a planted corpus must equal the
    pure-Python witness EXACTLY (pico values and ranks), and a hub
    token that connects many distinct neighbors must out-rank a token
    of equal raw frequency that only ever repeats against one filler —
    the centrality-vs-frequency property TextRank exists for."""
    import mapreducecf_spark.registry  # noqa: F401  (full init first:
    # a direct queries.text import re-enters via pipeline's BPE_RE)
    import mapreducecf_spark.queries.text as tx

    texts = [
        # 'engine' is a hub: adjacent to many distinct in-vocab words
        "spark engine shuffles engine plans engine joins engine reads",
        # 'filler' has the same raw frequency but one repeated neighbor
        "filler pad filler pad filler pad filler pad",
        "the engine of the corpus is it that and",
        "plans joins reads shuffles pad corpus spark",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    monkeypatch.setattr(tx, "load_table", lambda spark, sf_dir, name: df)
    got = {
        r["tok"]: (r["rank_pico"], r["kw_rank"])
        for r in tx.text_textrank_keywords(spark, "-textrank").collect()
    }
    want = _ref_textrank(texts)
    assert got == want
    assert got["engine"][1] < got["filler"][1], "hub must out-rank the filler"


def test_bpe_merge_tagged_table_equals_per_side_runs(spark):
    """The r18 fused ``text_bpe_apply`` rides train+val on ONE
    side-tagged table through ``_bpe_merge(keys=("side","word"))`` —
    pin the invariant the fusion relies on: a tagged-table merge is
    row-identical to two independent per-side merges (every window and
    join keys on the full tuple, so sides can never interact)."""
    import mapreducecf_spark.registry  # noqa: F401  (init order)
    import mapreducecf_spark.queries.text as tx
    from pyspark.sql import functions as F

    # vocab with doubled-letter runs (the greedy-parity hard case) and
    # a word that exists on BOTH sides with different freq
    rows = [
        ("t", "aaaa", 3), ("t", "banana", 2), ("t", "abba", 1),
        ("v", "aaaa", 1), ("v", "cabana", 2), ("v", "ababab", 1),
    ]
    vocab = spark.createDataFrame(
        rows, "side string, word string, freq bigint"
    ).select(
        "side", "word", "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("syms"),
    )
    pair = spark.createDataFrame([("a", "a")], "x string, y string")

    keys = ("side", "word")
    fused = {
        (r["side"], r["word"]): (r["freq"], tuple(r["syms"]))
        for r in tx._bpe_merge(
            vocab, tx._bpe_pair_rows(vocab, keys=keys), pair, keys=keys
        ).collect()
    }
    per_side = {}
    for s in ("t", "v"):
        sv = vocab.filter(F.col("side") == s).drop("side")
        for r in tx._bpe_merge(sv, tx._bpe_pair_rows(sv), pair).collect():
            per_side[(s, r["word"])] = (r["freq"], tuple(r["syms"]))
    assert fused == per_side
    # and the greedy run parity really happened: aaaa -> [aa, aa]
    assert fused[("t", "aaaa")][1] == ("aa", "aa")
