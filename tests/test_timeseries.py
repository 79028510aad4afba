"""Unit tests for queries.timeseries — planted-signal guarantees the
parity gate can't see (exact decomposition recovery, reconstruction
identities)."""

from __future__ import annotations
def test_seasonal_decompose_recovers_planted_daily_pattern(spark, monkeypatch):
    """Planted pure daily seasonality (no trend drift): a repeating
    24-hour count pattern decomposes EXACTLY — any centered 24-row
    window covers each hour-of-day once, so trend is the flat daily
    mean, seasonal is the pattern minus that mean (exact micro ints on
    this dyadic pattern), and the residual is identically zero on
    every interior row."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    pattern = [10 + (6 if 8 <= h <= 18 else 0) + (3 if h == 12 else 0) for h in range(24)]
    rows, eid = [], 0
    t0 = dt.datetime(2024, 3, 1)
    for day in range(3):
        for h in range(24):
            for _ in range(pattern[h]):
                rows.append(
                    (eid, t0 + dt.timedelta(days=day, hours=h, minutes=7), 1, "view", 1.0, None)
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)

    out = sorted(
        tsq.ts_seasonal_decompose(spark, "-decomp").collect(), key=lambda r: r["hb"]
    )
    # 72 spine hours, 23 edge rows dropped
    assert len(out) == 72 - 23
    mean = sum(pattern) / 24.0  # dyadic here, so every micro is exact
    for r in out:
        h = r["hb"].hour
        assert r["n"] == pattern[h]
        assert r["trend_micro"] == round(mean * 1_000_000)
        assert r["seasonal_micro"] == round((pattern[h] - mean) * 1_000_000)
        assert r["resid_micro"] == 0


def test_seasonal_decompose_reconstruction_on_corpus(spark, sf_dir):
    """Corpus-level identity: trend + seasonal + resid reconstructs the
    observed count EXACTLY in micro units on every interior row, and
    the emitted domain is exactly the full-window interior of the
    gap-filled spine (contiguous hours, 23 fewer than the span)."""
    from mapreducecf_spark.registry import QUERIES

    rows = sorted(
        QUERIES["ts_seasonal_decompose"](spark, sf_dir).collect(),
        key=lambda r: r["hb"],
    )
    assert rows
    for r in rows:
        assert (
            r["trend_micro"] + r["seasonal_micro"] + r["resid_micro"]
            == r["n"] * 1_000_000
        ), "reconstruction must be EXACT in micro units"
    span = (rows[-1]["hb"] - rows[0]["hb"]).total_seconds() / 3600
    assert len(rows) == int(span) + 1, "interior must be contiguous hourly"


def test_audience_kmv_matches_python_witness_on_planted_sets(spark, monkeypatch):
    """Planted overlapping audiences (|A|=200, |B|=200, |A∩B|=100 —
    well past the sketch size, so real estimation happens): every
    sketch value, θ, a-only count, and the estimate itself must equal
    an independent pure-Python KMV replay, and the exact difference
    columns are the planted truth."""
    import datetime as dt
    import hashlib

    import mapreducecf_spark.queries.timeseries as tsq

    a_users = list(range(1, 201))
    b_users = list(range(101, 301))
    rows = []
    t0 = dt.datetime(2024, 5, 1)
    eid = 0
    for t, users in (("aa", a_users), ("bb", b_users)):
        for u in users:
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, t, 1.0, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)

    out = {
        (r["ta"], r["tb"]): r
        for r in tsq.ts_audience_kmv(spark, "-kmv").collect()
    }
    assert set(out) == {("aa", "bb"), ("bb", "aa")}

    def h48(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)

    K, M = tsq.KMV_K, tsq.KMV_M
    sk = {
        "aa": sorted(h48(u) for u in a_users)[:K],
        "bb": sorted(h48(u) for u in b_users)[:K],
    }
    for ta, tb, exact in (("aa", "bb", 100), ("bb", "aa", 100)):
        r = out[(ta, tb)]
        assert r["n_a"] == 200 and r["n_b"] == 200
        assert r["exact_diff_ab"] == exact
        un = sorted(set(sk[ta]) | set(sk[tb]))[:K]
        theta = un[-1]
        n_aonly = sum(1 for h in un if h in set(sk[ta]) and h not in set(sk[tb]))
        est = n_aonly / len(un) * ((K - 1.0) * M / theta)
        assert r["k_used"] == len(un) and r["theta"] == theta
        assert r["est_diff_ab"] == round(est, 6)
        # the estimator actually estimates: within the declared bound
        assert abs(est - exact) <= tsq.KMV_TOL * (200 + 200)
        assert r["approx_ok"]


def test_kmv_set_algebra_matches_python_witness(spark, monkeypatch):
    """Planted overlapping audiences (same fixture as the difference
    report): the UNORDERED-pair set algebra must equal an independent
    pure-Python Theta-sketch replay — union/inter/diff estimates from
    ONE merged cut, exact union/intersection by inclusion-exclusion —
    and the four estimates must be internally consistent
    (inter + diff_ab + diff_ba == union up to 6-dp rounding)."""
    import datetime as dt
    import hashlib

    import mapreducecf_spark.queries.timeseries as tsq

    a_users = list(range(1, 201))
    b_users = list(range(101, 301))
    rows = []
    t0 = dt.datetime(2024, 5, 1)
    eid = 0
    for t, users in (("aa", a_users), ("bb", b_users)):
        for u in users:
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, t, 1.0, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)

    out = tsq.ts_kmv_set_algebra(spark, "-kmv").collect()
    assert len(out) == 1, "unordered pairs: exactly one (aa, bb) row"
    r = out[0]
    assert (r["ta"], r["tb"]) == ("aa", "bb")
    assert r["n_a"] == 200 and r["n_b"] == 200
    assert r["exact_union"] == 300 and r["exact_inter"] == 100

    def h48(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)

    K, M = tsq.KMV_K, tsq.KMV_M
    ska = set(sorted({h48(u) for u in a_users})[:K])
    skb = set(sorted({h48(u) for u in b_users})[:K])
    un = sorted(ska | skb)[:K]
    theta = un[-1]
    est_union = (K - 1.0) * M / theta
    n_both = sum(1 for h in un if h in ska and h in skb)
    n_aonly = sum(1 for h in un if h in ska and h not in skb)
    n_bonly = sum(1 for h in un if h in skb and h not in ska)
    assert r["k_used"] == len(un) and r["theta"] == theta
    assert r["est_union"] == round(est_union, 6)
    assert r["est_inter"] == round(n_both / len(un) * est_union, 6)
    assert r["est_diff_ab"] == round(n_aonly / len(un) * est_union, 6)
    assert r["est_diff_ba"] == round(n_bonly / len(un) * est_union, 6)
    # internal consistency: the three parts partition the union cut
    assert abs(
        r["est_inter"] + r["est_diff_ab"] + r["est_diff_ba"] - r["est_union"]
    ) <= 3e-6
    assert r["approx_ok_union"] and r["approx_ok_inter"]


def test_interval_align_tiles_planted_history_exactly(spark, monkeypatch):
    """Planted two-dimension history: the aligned intervals must be
    exactly the hand-derived intersections — boundaries from BOTH
    dimensions split the timeline, is_current marks only the final
    open piece, and the pieces tile without gap or overlap."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    t = [dt.datetime(2024, 6, 1, h) for h in range(6)]
    rows = [
        # user 1: type A,A,B at t0,t1,t2; band low,high,high
        (1, t[0], 1, "A", 10.0, None),
        (2, t[1], 1, "A", 90.0, None),
        (3, t[2], 1, "B", 90.0, None),
        # user 2: single event -> one open interval in both dims
        (4, t[0], 2, "C", 10.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)

    out = sorted(
        (
            (r["user_id"], r["valid_from"], r["valid_to"], r["event_type"], r["band"], r["is_current"])
            for r in tsq.ts_interval_align(spark, "-align").collect()
        )
    )
    assert out == [
        (1, t[0], t[1], "A", "low", False),
        (1, t[1], t[2], "A", "high", False),
        (1, t[2], None, "B", "high", True),
        (2, t[0], None, "C", "low", True),
    ]


def test_interval_align_tiles_corpus_timeline(spark, sf_dir):
    """Corpus-level: per user the aligned intervals must tile — sorted
    by valid_from, each piece ends exactly where the next begins, the
    last (and only the last) is open/current."""
    from mapreducecf_spark.registry import QUERIES

    per_user: dict = {}
    for r in QUERIES["ts_interval_align"](spark, sf_dir).collect():
        per_user.setdefault(r["user_id"], []).append(r)
    assert per_user
    for u, rows in per_user.items():
        rows.sort(key=lambda r: r["valid_from"])
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"], (u, a, b)
            assert not a["is_current"]
        assert rows[-1]["valid_to"] is None and rows[-1]["is_current"]


def test_kmv_union_k_matches_python_witness(spark, monkeypatch):
    """K-way union on the planted audiences: exact_total is the
    planted 300, and k_used/θ/est_total equal a pure-Python merge of
    the per-type sketches (dedup by hash, cut to k)."""
    import datetime as dt
    import hashlib

    import mapreducecf_spark.queries.timeseries as tsq

    a_users = list(range(1, 201))
    b_users = list(range(101, 301))
    rows = []
    t0 = dt.datetime(2024, 5, 1)
    eid = 0
    for t, users in (("aa", a_users), ("bb", b_users)):
        for u in users:
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, t, 1.0, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)

    out = tsq.ts_audience_union_kmv(spark, "-kmv").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_types"] == 2 and r["exact_total"] == 300

    def h48(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)

    K, M = tsq.KMV_K, tsq.KMV_M
    ska = sorted({h48(u) for u in a_users})[:K]
    skb = sorted({h48(u) for u in b_users})[:K]
    cut = sorted(set(ska) | set(skb))[:K]
    assert r["k_used"] == len(cut) and r["theta"] == cut[-1]
    est = (K - 1.0) * M / cut[-1]
    assert r["est_total"] == round(est, 6)
    assert abs(est - 300) <= tsq.KMV_TOL * 300
    assert r["approx_ok"]


def test_mannwhitney_matches_python_witness(spark, monkeypatch):
    """Planted two-sample fixtures vs an independent pure-Python
    rank-sum witness (average ranks, tie correction): a strongly
    shifted pair must reject at 95%, an identical pair must not, and
    U/tie/z match the witness exactly in both cases."""
    import datetime as dt
    import math

    import mapreducecf_spark.queries.timeseries as tsq

    def witness(xs, ys):
        pooled = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
        n = len(pooled)
        # average ranks with ties (2x to stay integer)
        ranks2 = {}
        i = 0
        while i < n:
            j = i
            while j < n and pooled[j][0] == pooled[i][0]:
                j += 1
            for k in range(i, j):
                ranks2[k] = (i + 1) + j  # 2*avg of ranks i+1..j
            i = j
        r2a = sum(ranks2[k] for k in range(n) if pooled[k][1] == 0)
        na, nb = len(xs), len(ys)
        u2a = r2a - na * (na + 1)
        tie = 0
        i = 0
        while i < n:
            j = i
            while j < n and pooled[j][0] == pooled[i][0]:
                j += 1
            t = j - i
            tie += t * t * t - t
            i = j
        var = (na * nb / 12.0) * ((na + nb + 1.0) - tie / ((na + nb) * (na + nb - 1.0)))
        z = (u2a - na * nb) / (2.0 * math.sqrt(var))
        return na, nb, u2a, tie, round(z, 6)

    def run(a_cents, b_cents):
        rows = []
        t0 = dt.datetime(2024, 7, 1)
        eid = 0
        for t, cs in (("aa", a_cents), ("bb", b_cents)):
            for c in cs:
                rows.append((eid, t0 + dt.timedelta(minutes=eid), 1, t, c / 100.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_mannwhitney_u(spark, "-mwu").collect()
        assert len(out) == 1
        return out[0]

    # shifted: B sits far above A (with ties inside each sample)
    a = [100, 100, 105, 110, 115, 120, 120, 125, 130, 135] * 3
    b = [500, 505, 505, 510, 515, 520, 525, 530, 530, 535] * 3
    r = run(a, b)
    na, nb, u2a, tie, z = witness(a, b)
    assert (r["ta"], r["tb"]) == ("aa", "bb")
    assert (r["n_a"], r["n_b"], r["u2_a"], r["tie_t"]) == (na, nb, u2a, tie)
    assert r["z"] == z
    assert r["reject_95"] and z < -1.96  # A stochastically below B

    # identical distributions: must NOT reject
    c = [100, 105, 110, 115, 120] * 8
    r2 = run(c, list(c))
    na, nb, u2a, tie, z = witness(c, list(c))
    assert (r2["n_a"], r2["n_b"], r2["u2_a"], r2["tie_t"]) == (na, nb, u2a, tie)
    assert r2["z"] == z and abs(z) < 1e-9
    assert not r2["reject_95"]


def test_chi2_independence_matches_python_witness(spark, monkeypatch):
    """Planted contingency fixtures vs a pure-Python Pearson chi²
    witness: a weekday-dependent mix must reject at 95%, a perfectly
    proportional mix must yield chi² == 0 and not reject; dof and the
    statistic match the witness exactly (incl. a planted EMPTY cell,
    which the margin cross join must keep as o=0 evidence)."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    # Mondays 2024-07-01/08 and Tuesdays 02/09
    mon, tue = dt.datetime(2024, 7, 1, 12), dt.datetime(2024, 7, 2, 12)

    def run(counts):  # {(et, 'mon'|'tue'): n}
        rows, eid = [], 0
        for (et, d), n in counts.items():
            for _ in range(n):
                base = mon if d == "mon" else tue
                rows.append((eid, base + dt.timedelta(minutes=eid % 59), 1, et, 1.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_chi2_independence(spark, "-chi2").collect()
        assert len(out) == 1
        return out[0]

    def witness(counts):
        ets = sorted({k[0] for k in counts})
        ds = sorted({k[1] for k in counts})
        n = sum(counts.values())
        chi2 = 0.0
        for et in ets:
            r = sum(v for k, v in counts.items() if k[0] == et)
            for d in ds:
                c = sum(v for k, v in counts.items() if k[1] == d)
                o = counts.get((et, d), 0)
                chi2 += (float(o) * n - float(r) * c) ** 2 / (float(n) * r * c)
        return (len(ets) - 1) * (len(ds) - 1), round(chi2, 6)

    # dependent mix with an empty cell: type bb never fires on Tuesday
    dep = {("aa", "mon"): 10, ("aa", "tue"): 90, ("bb", "mon"): 80, ("bb", "tue"): 0,
           ("cc", "mon"): 30, ("cc", "tue"): 30}
    r = run(dep)
    dof, chi2 = witness(dep)
    assert (r["dof"], r["chi2"]) == (dof, chi2)
    assert r["n_rows"] == 3 and r["n_cols"] == 2 and r["reject_95"]

    # perfectly proportional: chi² identically 0
    prop = {("aa", "mon"): 20, ("aa", "tue"): 40, ("bb", "mon"): 10, ("bb", "tue"): 20}
    r2 = run(prop)
    assert r2["chi2"] == 0.0 and not r2["reject_95"]

    # GAP dof (VERDICT/ADVICE r16): 12 types × 2 days → dof 11, a key
    # the sparse pre-r17 table lacked (its ELSE fell to the dof-30
    # value 43.773 and under-rejected). A moderately dependent mix
    # whose chi² lands between the true crit 19.675 and 43.773 must
    # now reject.
    gap = {}
    for i in range(12):
        et = f"t{i:02d}"
        gap[(et, "mon")] = 30
        gap[(et, "tue")] = 30
    gap[("t00", "mon")], gap[("t00", "tue")] = 55, 5  # one skewed type
    r3 = run(gap)
    dof3, chi23 = witness(gap)
    assert r3["dof"] == dof3 == 11
    assert r3["chi2"] == chi23 and 19.675 < chi23 < 43.773
    assert r3["reject_95"]


def test_chi2_crit_expr_dense_table_and_wilson_hilferty():
    """The shared critical-value expression: table literals for dof
    1..42 (spot-checked against the public chi² table, including keys
    the pre-r17 sparse table lacked), Wilson-Hilferty beyond 42
    (within 0.5% of the true quantile), and BIT-IDENTICAL between
    DuckDB and a pure-Python eval of the same closed form — the
    parity property the oracle relies on."""
    import math

    import duckdb

    from mapreducecf_spark.queries.timeseries import (
        _CHI2_CRIT_95,
        _chi2_crit_expr,
    )

    assert sorted(_CHI2_CRIT_95) == list(range(1, 43))  # dense 1..42
    expr = _chi2_crit_expr("d")
    con = duckdb.connect()

    def crit(d: int) -> float:
        return con.sql(
            f"SELECT {expr} AS c FROM (SELECT {d}::BIGINT AS d)"
        ).fetchone()[0]

    # gap keys the old table missed + both ends of the dense range
    for d, want in [(1, 3.841), (11, 19.675), (13, 22.362), (17, 27.587),
                    (36, 50.998), (42, 58.124)]:
        assert crit(d) == want
    # beyond the table: Wilson-Hilferty, vs true 95% quantiles
    for d, true in [(43, 59.304), (60, 79.082), (100, 124.342)]:
        got = crit(d)
        z = 1.6448536269514722
        wh = d * (1.0 - 2.0 / (9.0 * d) + z * math.sqrt(2.0 / (9.0 * d))) ** 3
        assert got == wh  # the SQL is the same IEEE closed form
        assert abs(got - true) / true < 0.005
    con.close()


def test_wilcoxon_signed_rank_matches_python_witness(spark, monkeypatch):
    """Planted per-user before/after fixtures vs a pure-Python
    Wilcoxon signed-rank witness (average ranks on tied |d|, zeros
    dropped but counted): a one-sided activity lift must reject at
    95%, a sign-symmetric null must yield z == 0 and not reject;
    n/w2/tie and z match the witness exactly."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    before, after = dt.datetime(2024, 7, 1, 12), dt.datetime(2024, 7, 9, 12)
    lo_pin, hi_pin = dt.datetime(2024, 7, 1, 0), dt.datetime(2024, 7, 10, 0)

    def run(pairs):  # {user_id: (n_before, n_after)}
        rows, eid = [], 0
        # pin the window so the midpoint (2024-07-05 12:00) separates
        # the two planting instants for every fixture
        rows.append((10**6, lo_pin, 10**6, "pin", 1.0, None))
        rows.append((10**6 + 1, hi_pin, 10**6 + 1, "pin", 1.0, None))
        for u, (nb, na) in pairs.items():
            for i in range(nb):
                rows.append((eid, before + dt.timedelta(seconds=i), u, "x", 1.0, None))
                eid += 1
            for i in range(na):
                rows.append((eid, after + dt.timedelta(seconds=i), u, "x", 1.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_wilcoxon_signed_rank(spark, "-wsr").collect()
        assert len(out) == 1
        return out[0]

    def witness(pairs, extra_ds=()):
        ds = [na - nb for nb, na in pairs.values()] + list(extra_ds)
        nz = [d for d in ds if d != 0]
        nz.sort(key=abs)
        # average ranks over tied |d|
        ranks, i = {}, 0
        while i < len(nz):
            j = i
            while j < len(nz) and abs(nz[j]) == abs(nz[i]):
                j += 1
            avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
            for k in range(i, j):
                ranks[k] = avg
            i = j
        wplus = sum(ranks[k] for k, d in enumerate(nz) if d > 0)
        n = len(nz)
        from collections import Counter

        tie = sum(t**3 - t for t in Counter(abs(d) for d in nz).values())
        num = 2.0 * (2.0 * wplus) - float(n) * (n + 1.0)
        den = 4.0 * ((n * (n + 1.0) * (2.0 * n + 1.0)) / 24.0 - tie / 48.0) ** 0.5
        z = round(num / den, 6)
        return n, int(2 * wplus), tie, z

    # the two pin users contribute d = ±1 (one event each side of the
    # midpoint: lo is before, hi is after)
    pin_ds = (-1, 1)

    # planted LIFT: 40 users, activity up by 1..3 events after; a few
    # ties in |d| and two zero pairs (dropped, counted)
    lift = {u: (5, 5 + 1 + u % 3) for u in range(40)}
    lift[100], lift[101] = (4, 4), (7, 7)  # zeros
    r = run(lift)
    n, w2, tie, z = witness(lift, extra_ds=pin_ds)
    assert (r["n_pairs"], r["n_zero"]) == (44, 2)
    assert (r["n_nz"], r["w2"], r["tie_t"]) == (n, w2, tie)
    assert r["z"] == z and z > 1.96 and r["reject_95"]

    # sign-symmetric null: +k and -k in equal numbers at every |d|
    null = {}
    u = 0
    for k in (1, 2, 3):
        for _ in range(6):
            null[u] = (5, 5 + k)
            null[u + 1] = (5 + k, 5)
            u += 2
    r2 = run(null)
    n2, w22, tie2, z2 = witness(null, extra_ds=pin_ds)
    assert (r2["n_nz"], r2["w2"], r2["tie_t"]) == (n2, w22, tie2)
    assert r2["z"] == z2 == 0.0 and not r2["reject_95"]


def test_kruskal_wallis_matches_python_witness(spark, monkeypatch):
    """Planted k-group fixtures vs a pure-Python Kruskal-Wallis
    witness (global average ranks with ties, tie-corrected H): one
    shifted group among three must reject at 95% (dof 2, crit 5.991),
    identically-distributed groups must not; n/ties/H match the
    witness exactly."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    t0 = dt.datetime(2024, 7, 1, 12)

    def run(groups):  # {type: [cents value…]} (values are ints = cents/100)
        rows, eid = [], 0
        for t, vals in groups.items():
            for v in vals:
                rows.append((eid, t0 + dt.timedelta(minutes=eid % 999), 1, t, v / 100.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_kruskal_wallis(spark, "-kw").collect()
        assert len(out) == 1
        return out[0]

    def witness(groups):
        from collections import Counter

        allv = sorted(v for vals in groups.values() for v in vals)
        n = len(allv)
        cnt = Counter(allv)
        # average rank per value (1-based), via cumulative counts
        ranks, cum = {}, 0
        for v in sorted(cnt):
            ranks[v] = cum + (cnt[v] + 1) / 2.0
            cum += cnt[v]
        s2 = 0.0
        for vals in groups.values():
            r2 = sum(2 * ranks[v] for v in vals)  # doubled rank sum (int)
            s2 += float(r2) * r2 / len(vals)
        tie = sum(t**3 - t for t in cnt.values())
        h = (3.0 * s2 / (float(n) * (n + 1.0)) - 3.0 * (n + 1.0)) / (
            1.0 - float(tie) / (float(n) * n * n - n)
        )
        return n, tie, round(h, 6)

    # one group shifted up by 40 cents: must reject at dof 2
    base = [100 + (i % 7) * 10 for i in range(30)]
    shifted = {"aa": list(base), "bb": list(base), "cc": [v + 40 for v in base]}
    r = run(shifted)
    n, tie, h = witness(shifted)
    assert (r["n_groups"], r["n_total"], r["tie_t"]) == (3, n, tie)
    assert r["h"] == h and h > 5.991 and r["reject_95"]

    # identical distributions: H small, no reject
    null = {"aa": list(base), "bb": list(base), "cc": list(base)}
    r2 = run(null)
    n2, tie2, h2 = witness(null)
    assert (r2["n_total"], r2["tie_t"]) == (n2, tie2)
    assert r2["h"] == h2 and not r2["reject_95"]


def test_brown_forsythe_matches_python_witness(spark, monkeypatch):
    """Planted k-group fixtures vs a pure-Python Brown-Forsythe
    witness (median-centered absolute deviations, one-way ANOVA F):
    one wider group among three must reject at 95% via the
    large-sample (k-1)·F ~ chi² rule; equal-spread groups must not;
    n and F match the witness exactly."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    t0 = dt.datetime(2024, 7, 1, 12)

    def run(groups):
        rows, eid = [], 0
        for t, vals in groups.items():
            for v in vals:
                rows.append((eid, t0 + dt.timedelta(minutes=eid % 999), 1, t, v / 100.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_brown_forsythe(spark, "-bf").collect()
        assert len(out) == 1
        return out[0]

    def witness(groups):
        k = len(groups)
        # doubled median = sum of the two middle order statistics
        d2s = {}
        for t, vals in groups.items():
            sv = sorted(vals)
            n = len(sv)
            m2 = sv[(n - 1) // 2] + sv[n // 2]
            d2s[t] = [abs(2 * v - m2) for v in vals]
        N = sum(len(d) for d in d2s.values())
        sb = sum(float(sum(d)) * sum(d) / len(d) for d in d2s.values())
        s_tot = sum(sum(d) for d in d2s.values())
        ss_tot = sum(x * x for d in d2s.values() for x in d)
        ssb = sb - float(s_tot) * s_tot / N
        ssw = float(ss_tot) - sb
        f = ((float(N) - k) * ssb) / ((k - 1.0) * ssw)
        return N, round(f, 6)

    base = [100 + (i % 9) * 5 for i in range(36)]  # spread 0..40
    wide = [100 + (i % 9) * 25 for i in range(36)]  # spread 0..200
    het = {"aa": list(base), "bb": list(base), "cc": wide}
    r = run(het)
    n, f = witness(het)
    assert (r["n_groups"], r["n_total"]) == (3, n)
    assert r["f"] == f and 2.0 * f > 5.991 and r["reject_95"]

    hom = {"aa": list(base), "bb": [v + 7 for v in base], "cc": [v - 13 for v in base]}
    r2 = run(hom)  # shifted LOCATIONS, same spread: BF must NOT fire
    n2, f2 = witness(hom)
    assert r2["f"] == f2 and not r2["reject_95"]


def test_permutation_mean_shift_matches_python_witness(spark, monkeypatch):
    """Planted daily series vs a pure-Python replay of the md5-seeded
    permutation harness (rank-by-hash subset selection, cross-scaled
    integer statistic): a big second-half step must reject at the
    minimum attainable p = 1/200; a flat series must not; stat_obs
    and n_ge match the witness EXACTLY (the md5 determinism that lets
    DuckDB replay the same 199 shuffles)."""
    import datetime as dt
    import hashlib

    import mapreducecf_spark.queries.timeseries as tsq

    def run(day_counts):  # {date: n_events}
        rows, eid = [], 0
        for day, n in day_counts.items():
            for i in range(n):
                rows.append((eid, dt.datetime.combine(day, dt.time(12, 0)) + dt.timedelta(seconds=i), 1, "x", 1.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_permutation_mean_shift(spark, "-perm").collect()
        assert len(out) == 1
        return out[0]

    def witness(day_counts):
        days = sorted(day_counts)
        cnts = {d: day_counts[d] for d in days}
        n = len(days)
        n_a = n // 2
        n_b = n - n_a
        s_tot = sum(cnts.values())
        s_a = sum(cnts[d] for d in days[:n_a])
        stat_obs = abs(n_b * s_a - n_a * (s_tot - s_a))
        n_ge = 0
        for p in range(1, tsq.PERM_P + 1):
            ranked = sorted(
                days, key=lambda d: (hashlib.md5(f"{p}:{d}".encode()).hexdigest(), str(d))
            )
            sa = sum(cnts[d] for d in ranked[:n_a])
            if abs(n_b * sa - n_a * (s_tot - sa)) >= stat_obs:
                n_ge += 1
        return stat_obs, n_ge

    import datetime as dt2

    base = dt2.date(2024, 7, 1)
    # planted STEP: second half triples
    step = {base + dt2.timedelta(days=i): (20 if i < 10 else 60) for i in range(20)}
    r = run(step)
    stat, nge = witness(step)
    assert (r["n_days"], r["n_a"], r["n_b"]) == (20, 10, 10)
    assert (r["stat_obs"], r["n_ge"]) == (stat, nge)
    assert nge == 0 and r["p_value"] == 0.005 and r["reject_95"]

    # near-flat series: must NOT reject, witness agrees exactly
    flat = {base + dt2.timedelta(days=i): 30 + (i % 3) for i in range(20)}
    r2 = run(flat)
    stat2, nge2 = witness(flat)
    assert (r2["stat_obs"], r2["n_ge"]) == (stat2, nge2)
    assert not r2["reject_95"]


def test_bootstrap_mean_ci_matches_python_witness(spark, monkeypatch):
    """Planted daily series vs a pure-Python replay of the md5-seeded
    bootstrap (48-bit hash slice mod n slot picks, integer micro
    means, order-statistic CI): every output value matches EXACTLY,
    the interval brackets the true mean on a well-behaved series, and
    widens for a wilder one."""
    import datetime as dt
    import hashlib

    import mapreducecf_spark.queries.timeseries as tsq

    def run(day_counts):
        rows, eid = [], 0
        for day, n in day_counts.items():
            for i in range(n):
                rows.append((eid, dt.datetime.combine(day, dt.time(12, 0)) + dt.timedelta(seconds=i), 1, "x", 1.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_bootstrap_mean_ci(spark, "-boot").collect()
        assert len(out) == 1
        return out[0]

    def witness(day_counts):
        days = sorted(day_counts)
        cnts = [day_counts[d] for d in days]
        n = len(days)
        B = tsq.BOOT_B
        means = []
        for b in range(1, B + 1):
            s = 0
            for slot in range(1, n + 1):
                h = int(hashlib.md5(f"{b}:{slot}".encode()).hexdigest()[:12], 16)
                s += cnts[h % n]
            means.append((1_000_000 * s // n, b))
        means.sort()
        k = (B + 1) // 40
        return (
            1_000_000 * sum(cnts) // n,
            means[k - 1][0],
            means[B - k][0],
        )

    base = __import__("datetime").date(2024, 7, 1)
    td = __import__("datetime").timedelta
    smooth = {base + td(days=i): 100 + (i % 5) for i in range(24)}
    r = run(smooth)
    mean, lo, hi = witness(smooth)
    assert (r["mean_micro"], r["ci_lo_micro"], r["ci_hi_micro"]) == (mean, lo, hi)
    assert lo <= mean <= hi

    wild = {base + td(days=i): (40 if i % 2 else 160) for i in range(24)}
    r2 = run(wild)
    mean2, lo2, hi2 = witness(wild)
    assert (r2["mean_micro"], r2["ci_lo_micro"], r2["ci_hi_micro"]) == (mean2, lo2, hi2)
    assert (hi2 - lo2) > (hi - lo), "wilder series => wider interval"


def test_bootstrap_median_ci_matches_python_witness(spark, monkeypatch):
    """Planted series vs a pure-Python replay of the median bootstrap
    (md5-mod picks, exact integer med2 = middle-pair sum, order-
    statistic endpoints): exact match at an ODD and an EVEN day
    count (both median paths), and a wilder series must widen the
    interval."""
    import hashlib

    import mapreducecf_spark.queries.timeseries as tsq

    def run(day_counts):
        rows, eid = [], 0
        for day, n in day_counts.items():
            for i in range(n):
                rows.append((eid, __import__("datetime").datetime.combine(day, __import__("datetime").time(9)) + __import__("datetime").timedelta(seconds=i), 1, "x", 1.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_bootstrap_median_ci(spark, "-bootmd").collect()
        assert len(out) == 1
        return out[0]

    def witness(day_counts):
        days = sorted(day_counts)
        cnts = [day_counts[d] for d in days]
        n = len(days)

        def med2(vals):
            v = sorted(vals)
            return v[(n + 1) // 2 - 1] + v[(n + 2) // 2 - 1]

        B = tsq.BOOT_B
        meds = []
        for b in range(1, B + 1):
            picks = []
            for slot in range(1, n + 1):
                h = int(hashlib.md5(f"{b}:{slot}".encode()).hexdigest()[:12], 16)
                picks.append(cnts[h % n])
            meds.append((med2(picks), b))
        meds.sort()
        k = (B + 1) // 40
        return med2(cnts), meds[k - 1][0], meds[B - k][0]

    base = __import__("datetime").date(2024, 7, 1)
    td = __import__("datetime").timedelta
    for ndays in (23, 24):  # odd (med2 = 2x middle) and even (pair sum)
        smooth = {base + td(days=i): 100 + (i % 5) for i in range(ndays)}
        r = run(smooth)
        med, lo, hi = witness(smooth)
        assert (r["med2"], r["ci_lo_med2"], r["ci_hi_med2"]) == (med, lo, hi)
        assert lo <= med <= hi

        wild = {base + td(days=i): (40 if i % 2 else 160) for i in range(ndays)}
        r2 = run(wild)
        med2_, lo2, hi2 = witness(wild)
        assert (r2["med2"], r2["ci_lo_med2"], r2["ci_hi_med2"]) == (med2_, lo2, hi2)
        assert (hi2 - lo2) > (hi - lo), "wilder series => wider interval"


def test_permutation_weekday_effect_matches_python_witness(spark, monkeypatch):
    """Planted series vs a pure-Python replay of the weekday-effect
    permutation (slot-preserving md5 day shuffles, integer
    between-weekday statistic): a strong weekend dip must reject at
    the minimum attainable p = 1/200; a near-constant series must
    not; stat_obs and n_ge match the witness EXACTLY."""
    import datetime as dt
    import hashlib

    import mapreducecf_spark.queries.timeseries as tsq

    def run(day_counts):
        rows, eid = [], 0
        for day, n in day_counts.items():
            for i in range(n):
                rows.append((eid, dt.datetime.combine(day, dt.time(9)) + dt.timedelta(seconds=i), 1, "x", 1.0, None))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_permutation_weekday_effect(spark, "-pwd").collect()
        assert len(out) == 1
        return out[0]

    def witness(day_counts):
        days = sorted(day_counts)
        cnts = [day_counts[d] for d in days]
        wds = [d.isoweekday() for d in days]
        m = len(days)
        s_tot = sum(cnts)

        def stat(assign):  # assign[i] = count at calendar slot i
            by = {}
            for wd, c in zip(wds, assign):
                n, s = by.get(wd, (0, 0))
                by[wd] = (n + 1, s + c)
            return sum((m * s - n * s_tot) ** 2 for n, s in by.values())

        stat_obs = stat(cnts)
        n_ge = 0
        for p in range(1, tsq.PERM_P + 1):
            order = sorted(
                range(m),
                key=lambda i: (hashlib.md5(f"{p}:{days[i]}".encode()).hexdigest(), str(days[i])),
            )
            # the day at hash-rank j fills calendar slot j
            assign = [cnts[order[j]] for j in range(m)]
            if stat(assign) >= stat_obs:
                n_ge += 1
        return stat_obs, n_ge

    base = dt.date(2024, 7, 1)  # a Monday
    dipped = {
        base + dt.timedelta(days=i): (20 if (base + dt.timedelta(days=i)).isoweekday() >= 6 else 60)
        for i in range(28)
    }
    r = run(dipped)
    stat, nge = witness(dipped)
    assert (r["stat_obs"], r["n_ge"]) == (stat, nge)
    assert nge == 0 and r["p_value"] == 0.005 and r["reject_95"]

    flat = {base + dt.timedelta(days=i): 40 + (i % 2) for i in range(28)}
    r2 = run(flat)
    stat2, nge2 = witness(flat)
    assert (r2["stat_obs"], r2["n_ge"]) == (stat2, nge2)
    assert not r2["reject_95"]


def test_permutation_weekday_effect_kdiv_overflow_guard(spark):
    """ADVICE r17: with ~1e14 events/day the unscaled dev² would blow
    past int64 (dev ≤ m·s_tot ≈ 7.8e16 here). The kdiv rescale must
    (a) keep the statistic an exact bigint both engines can hold and
    (b) match a pure-Python replay of the SCALED statistic exactly —
    fed straight into the shared (day, cnt) helper so no 1e14 rows
    are materialized."""
    import datetime as dt
    import hashlib

    import mapreducecf_spark.queries.timeseries as tsq

    base = dt.date(2024, 7, 1)  # a Monday
    day_counts = {
        base
        + dt.timedelta(days=i): (
            40_000_000_000_000
            if (base + dt.timedelta(days=i)).isoweekday() >= 6
            else 120_000_000_000_000
        )
        for i in range(28)
    }
    daily = spark.createDataFrame(
        sorted(day_counts.items()), "day date, cnt bigint"
    )
    out = tsq._perm_weekday_of_daily(spark, daily).collect()
    assert len(out) == 1
    r = out[0]

    days = sorted(day_counts)
    cnts = [day_counts[d] for d in days]
    wds = [d.isoweekday() for d in days]
    m = len(days)
    s_tot = sum(cnts)
    kdiv = max(1, (m * s_tot) // 500_000_000)
    assert kdiv > 1, "fixture must exercise the scaled path"

    def stat(assign):
        by = {}
        for wd, c in zip(wds, assign):
            n, s = by.get(wd, (0, 0))
            by[wd] = (n + 1, s + c)
        return sum((abs(m * s - n * s_tot) // kdiv) ** 2 for n, s in by.values())

    stat_obs = stat(cnts)
    assert stat_obs < 2**63, "scaled statistic fits int64"
    n_ge = 0
    for p in range(1, tsq.PERM_P + 1):
        order = sorted(
            range(m),
            key=lambda i: (
                hashlib.md5(f"{p}:{days[i]}".encode()).hexdigest(),
                str(days[i]),
            ),
        )
        if stat([cnts[order[j]] for j in range(m)]) >= stat_obs:
            n_ge += 1
    assert (r["stat_obs"], r["n_ge"]) == (stat_obs, n_ge)
    assert r["reject_95"], "planted weekend dip must still reject at scale"


def test_spearman_corr_matches_python_witness(spark, monkeypatch):
    """Planted daily (volume, value) series vs a pure-Python
    average-rank Spearman: perfectly monotone association gives
    rho = 1 and rejects, anti-monotone gives rho = -1 and rejects, a
    tie-heavy series matches the witness exactly, and an
    association-free alternating series must not reject."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    def run(series):  # series: list of (x_events, cents_per_event)
        rows, eid = [], 0
        base = dt.date(2024, 7, 1)
        for i, (x, c) in enumerate(series):
            day = base + dt.timedelta(days=i)
            for j in range(x):
                rows.append(
                    (eid, dt.datetime.combine(day, dt.time(9))
                     + dt.timedelta(seconds=j), 1, "x", c / 100.0, None)
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_spearman_corr(spark, "-spear").collect()
        assert len(out) == 1
        return out[0]

    def witness(series):
        xs = [x for x, c in series]
        ys = [x * c for x, c in series]
        n = len(series)

        def r2(vals):
            s = sorted(vals)
            return [2 * (s.index(v) + 1) + s.count(v) - 1 for v in vals]

        u, v = r2(xs), r2(ys)
        suv = sum(a * b for a, b in zip(u, v))
        su2 = sum(a * a for a in u)
        sv2 = sum(b * b for b in v)
        num = n * suv - (n * (n + 1)) ** 2
        import math

        rho = round(num / (math.sqrt(n * su2 - (n * (n + 1)) ** 2)
                           * math.sqrt(n * sv2 - (n * (n + 1)) ** 2)), 6)
        z = round(rho * math.sqrt(n - 1.0), 6)
        return rho, z

    mono = [(10 + i, 50 + 3 * i) for i in range(14)]  # y strictly rises with x
    r = run(mono)
    assert (r["rho"], r["z"]) == witness(mono) == (1.0, round((13) ** 0.5, 6))
    assert r["reject_95"]

    # x strictly falls while y = x*c strictly rises (y = (100-i)(i+1)
    # is increasing for i < 49) => perfect anti-association
    anti = [(100 - i, i + 1) for i in range(14)]
    r = run(anti)
    rho_a, z_a = witness(anti)
    assert (r["rho"], r["z"]) == (rho_a, z_a) and rho_a == -1.0
    assert r["reject_95"]

    tied = [(10 + (i % 3), 40 + 7 * (i % 4)) for i in range(16)]
    r = run(tied)
    assert (r["rho"], r["z"]) == witness(tied)

    flat = [(10 + (i % 2), 50 + 9 * ((i * 5) % 7)) for i in range(14)]
    r = run(flat)
    rho_f, z_f = witness(flat)
    assert (r["rho"], r["z"]) == (rho_f, z_f)
    assert abs(z_f) <= 1.96 and not r["reject_95"]


def test_theil_sen_slope_matches_python_witness(spark, monkeypatch):
    """Planted daily series vs a pure-Python pairwise-slope replay:
    a clean linear ramp recovers its slope exactly (med2 = 2x slope
    in micro-units/day), a ramp with one wild outlier day still
    recovers it (the robustness OLS lacks), a constant series gives
    slope 0, and a calendar GAP exercises the day-distance
    denominator."""
    import datetime as dt

    import mapreducecf_spark.queries.timeseries as tsq

    def run(day_counts):
        rows, eid = [], 0
        for day, n in day_counts.items():
            for j in range(n):
                rows.append(
                    (eid, dt.datetime.combine(day, dt.time(9))
                     + dt.timedelta(seconds=j), 1, "x", 1.0, None)
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        monkeypatch.setattr(tsq, "load_table", lambda spark, sf_dir, name: df)
        out = tsq.ts_theil_sen_slope(spark, "-ts").collect()
        assert len(out) == 1
        return out[0]

    def witness(day_counts):
        days = sorted(day_counts)
        n = len(days)
        sls = []
        for i in range(n):
            for j in range(i + 1, n):
                dc = day_counts[days[j]] - day_counts[days[i]]
                dd = (days[j] - days[i]).days
                q = 1_000_000 * dc
                sls.append(abs(q) // dd * (1 if q >= 0 else -1))  # trunc div
        sls.sort()
        m = len(sls)
        return m, sls[(m + 1) // 2 - 1] + sls[(m + 2) // 2 - 1]

    base = dt.date(2024, 7, 1)
    td = dt.timedelta

    ramp = {base + td(days=i): 100 + 7 * i for i in range(15)}
    r = run(ramp)
    np_, med2 = witness(ramp)
    assert (r["n_pairs"], r["slope_med2_micro"]) == (np_, med2)
    assert med2 == 2 * 7_000_000  # exact: every pairwise slope is 7/day

    outlier = dict(ramp)
    outlier[base + td(days=7)] = 900  # one wild day
    r = run(outlier)
    np_, med2 = witness(outlier)
    assert (r["n_pairs"], r["slope_med2_micro"]) == (np_, med2)
    assert abs(med2 / 2e6 - 7) <= 0.5, "median slope shrugs off the outlier"

    flat = {base + td(days=i): 50 for i in range(12)}
    r = run(flat)
    assert (r["n_pairs"], r["slope_med2_micro"]) == (66, 0)

    gappy = {base + td(days=d): 10 + 3 * d for d in (0, 1, 4, 9, 10, 16)}
    r = run(gappy)
    np_, med2 = witness(gappy)
    assert (r["n_pairs"], r["slope_med2_micro"]) == (np_, med2)
    assert med2 == 2 * 3_000_000  # slope per CALENDAR day, gaps and all
