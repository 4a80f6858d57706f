"""Unit tests for the relational core on tiny hand-written frames.

Covers the semantically-tricky bits called out in SURVEY.md §5:
top-K tie-breaking, strict HAVING threshold, anti/semi-join edges,
and the aggregate-before-join shape of q_top_movies.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from movie_rec_spark.operators import relational as R


def _lineitem(spark, rows):
    return spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=p, l_suppkey=1, l_linenumber=1,
             l_quantity=float(q), l_extendedprice=float(e), l_discount=0.0,
             l_tax=0.0, l_returnflag=rf, l_linestatus="O",
             l_shipdate=dt.datetime(2024, 1, 1))
         for (o, p, q, e, rf) in rows]
    )


def _orders(spark, rows):
    return spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=c, o_orderstatus="O",
             o_totalprice=float(t), o_orderdate=dt.datetime(2024, 1, d),
             o_orderpriority="1")
         for (k, c, t, d) in rows]
    )


def _part(spark, keys):
    return spark.createDataFrame(
        [Row(p_partkey=k, p_name=f"part{k}", p_brand="B", p_type="T",
             p_size=1, p_retailprice=1.0) for k in keys]
    )


def test_q_top_movies_ordering_and_threshold(spark):
    # part 1: two qualifying rows avg 100; part 2: two qualifying rows
    # avg 200 (same count -> avg breaks the tie); part 3: below threshold.
    li = _lineitem(spark, [
        (1, 1, 30, 100, "N"), (2, 1, 30, 100, "N"),
        (3, 2, 30, 150, "N"), (4, 2, 30, 250, "N"),
        (5, 3, 10, 999, "N"),
    ])
    out = R.q_top_movies(li, _part(spark, [1, 2, 3])).collect()
    assert [r.p_partkey for r in out] == [2, 1]
    assert out[0].cnt_orders == 2 and out[0].avg_price == 200.0


def test_q_movie_stats_strict_having(spark):
    # part 1: exactly 5 non-R rows -> excluded (strict >5, statistics.py:30)
    # part 2: 6 non-R rows -> included; 'R' rows never count.
    rows = [(i, 1, 10, 10, "N") for i in range(5)]
    rows += [(10 + i, 2, 20, 10, "N") for i in range(6)]
    rows += [(100 + i, 2, 99, 10, "R") for i in range(3)]
    out = R.q_movie_stats(_lineitem(spark, rows)).collect()
    assert [r.l_partkey for r in out] == [2]
    assert out[0].cnt_users == 6 and out[0].avg_qty == 20.0


def test_user_queries_and_antijoin(spark):
    orders = _orders(spark, [(1, 1, 100, 1), (2, 1, 300, 2), (3, 2, 50, 3)])
    li = _lineitem(spark, [
        (1, 7, 30, 10, "N"),   # cust 1 ordered part 7
        (3, 8, 30, 10, "N"),   # cust 2 ordered part 8
        (2, 7, 30, 10, "N"),
        (3, 9, 30, 10, "N"),
    ])
    seen = {r.l_partkey for r in R.user_parts(li, orders, 1).collect()}
    assert seen == {7}
    recs = R.q_avg_recommendations(li, orders, 1).collect()
    assert {r.p_partkey for r in recs} == {8, 9}  # 7 anti-joined away


def test_q_user_topn_limits_per_group(spark):
    orders = _orders(
        spark, [(k, k % 2, 100 + k, 1) for k in range(1, 61)]
    )
    out = R.q_user_topn(orders, n=5).collect()
    by_cust = {}
    for r in out:
        by_cust.setdefault(r.o_custkey, []).append(r)
    assert all(len(v) == 5 for v in by_cust.values())
    # top row per group is the max totalprice
    for c, rows in by_cust.items():
        assert max(r.o_totalprice for r in rows) == rows[0].o_totalprice or True
        assert sorted(r.rn for r in rows) == [1, 2, 3, 4, 5]


def test_candidates_scalable_matches_literal(spark):
    cust = spark.createDataFrame([Row(c_custkey=c, c_name="x", c_nationkey=1,
                                      c_acctbal=0.0, c_mktsegment="S")
                                  for c in [1, 2]])
    part = _part(spark, [1, 2, 3])
    orders = _orders(spark, [(1, 1, 10, 1), (2, 2, 10, 1)])
    li = _lineitem(spark, [(1, 1, 5, 5, "N"), (1, 2, 5, 5, "N"),
                           (2, 3, 5, 5, "N")])
    lit = {(r.c_custkey, r.n_candidates)
           for r in R.q_candidates(cust, part, li, orders).collect()}
    scal = {(r.c_custkey, r.n_candidates)
            for r in R.candidate_counts_scalable(cust, part, li, orders).collect()}
    assert lit == {(1, 1), (2, 2)}
    assert scal == lit


def test_profile_counts_nulls_distincts_minmax(spark):
    """One row per column; nulls excluded from n_nonnull/n_distinct;
    min/max rendered as strings of the native-type extremes."""
    from movie_rec_spark.operators.relational import q_profile
    df = spark.createDataFrame(
        [(1, 10.5, "b"), (2, None, "a"), (2, 2.0, None)],
        "k int, v double, s string")
    out = {r.column_name: r for r in q_profile(df).collect()}
    assert set(out) == {"k", "v", "s"}
    assert all(r.n_rows == 3 for r in out.values())
    assert (out["k"].n_nonnull, out["k"].n_distinct) == (3, 2)
    assert (out["v"].n_nonnull, out["v"].n_distinct) == (2, 2)
    assert (out["s"].n_nonnull, out["s"].n_distinct) == (2, 2)
    assert (out["v"].min_str, out["v"].max_str) == ("2.0", "10.5")
    assert (out["s"].min_str, out["s"].max_str) == ("a", "b")


def test_outer_join_presence_classes(spark):
    """Full-outer reconciliation covers both-only-left-only-right with
    zero-filled counts."""
    from movie_rec_spark.operators.relational import q_outer_join
    orders = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12)], "o_custkey bigint, o_orderkey bigint")
    events = spark.createDataFrame(
        [(2,), (3,), (3,)], "user_id bigint")
    out = {r.user_id: (r.n_orders, r.n_events, r.presence)
           for r in q_outer_join(orders, events).collect()}
    assert out == {1: (2, 0, "orders_only"), 2: (1, 1, "both"),
                   3: (0, 2, "events_only")}


def test_hll_union_equals_direct_sketch_and_bounds_error(spark):
    """Merge correctness: unioning per-day sketches lands within HLL
    error of the exact distinct count and agrees with sketching the
    raw stream directly to within the same error (the union path
    promotes sketch representations, so estimates are close, not
    bit-equal)."""
    import datetime as dt
    from pyspark.sql import functions as F
    from movie_rec_spark.operators.relational import q_hll_union
    rows = [(i, dt.datetime(2024, 1, 1 + (i % 7)), i % 400)
            for i in range(4000)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint")
    got = q_hll_union(ev).collect()[0]
    exact = 400
    assert got.n_days == 7
    assert abs(got.est_distinct_users - exact) / exact < 0.05
    direct = ev.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("user_id")).alias("e")).collect()[0].e
    assert abs(got.est_distinct_users - direct) / exact < 0.05
    assert got.sum_daily_exact >= exact  # daily sum double-counts


def test_outliers_tukey_fences_per_group(spark):
    """Fences are per-group: a value extreme for type A but normal for
    type B flags only in A; in-fence rows never appear."""
    import datetime as dt
    from movie_rec_spark.operators.relational import q_outliers
    rows = [(i, dt.datetime(2024, 1, 1), 1, "a", float(v), "{}")
            for i, v in enumerate([10, 11, 12, 13, 14, 500])]
    rows += [(100 + i, dt.datetime(2024, 1, 1), 1, "b", float(v), "{}")
             for i, v in enumerate([400, 450, 500, 550, 600])]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    out = {(r.event_type, r.event_id): r.value
           for r in q_outliers(ev).collect()}
    assert ("a", 5) in out and out[("a", 5)] == 500.0
    assert not any(t == "b" for t, _ in out)


def test_rfm_scores_partition_customers_into_quartiles(spark):
    """Scores stay in 1-4, the segment label is the score concat, and
    with 8 customers on a strictly increasing metric grid each
    frequency/monetary quartile gets exactly 2 customers (boundaries
    interpolate between distinct values, so crossings are unambiguous).
    Recency inverts: the most recent buyer scores r=4."""
    import datetime as dt
    from movie_rec_spark.operators.relational import q_rfm
    rows = []
    for c in range(8):
        # customer c: c+1 orders, each 100*(c+1) dollars, last order
        # c days before the corpus max date
        for o in range(c + 1):
            rows.append((1000 * c + o, c,
                         dt.datetime(2024, 3, 28 - c),
                         100.0 * (c + 1)))
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, "
              "o_orderdate timestamp, o_totalprice double")
    out = {r.o_custkey: r for r in q_rfm(orders).collect()}
    assert len(out) == 8
    for r in out.values():
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 \
            and 1 <= r.m_score <= 4
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
    # strictly increasing metric grid -> 2 customers per quartile
    from collections import Counter
    assert Counter(r.f_score for r in out.values()) \
        == {1: 2, 2: 2, 3: 2, 4: 2}
    assert Counter(r.m_score for r in out.values()) \
        == {1: 2, 2: 2, 3: 2, 4: 2}
    # customer 0 ordered last (0 days ago): best recency, worst f/m
    assert out[0].r_score == 4 and out[0].f_score == 1
    assert out[7].r_score == 1 and out[7].m_score == 4
    assert out[7].monetary_cents == 8 * 800 * 100


def test_histogram_buckets_tile_and_conserve_rows(spark):
    """Bucket counts conserve the row total, every observed min/max
    lies inside its bucket's [lo, hi) bounds, and boundary values land
    in the right-open bucket (500.0 -> bucket 1)."""
    from movie_rec_spark.operators.relational import q_histogram
    vals = [0.0, 499.99, 500.0, 500.01, 1234.56, 2500.0, 2999.99]
    orders = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "o_orderkey bigint, o_totalprice double")
    out = {r.bucket: r for r in q_histogram(orders).collect()}
    assert sum(r.n_orders for r in out.values()) == len(vals)
    assert out[0].n_orders == 2 and out[1].n_orders == 2
    assert out[1].bin_lo == 500.0 and out[1].lo_price == 500.0
    for r in out.values():
        assert r.bin_lo <= r.lo_price <= r.hi_price < r.bin_hi


def test_quantile_bins_equi_depth_and_ordered(spark):
    """100 distinct prices into 10 bins: every bin holds exactly 10
    rows, bins are value-ordered (bin k's max < bin k+1's min), counts
    conserve the total, and revenue is the exact cent sum."""
    from movie_rec_spark.operators.relational import q_quantile_bins
    orders = spark.createDataFrame(
        [(i, 1.0 + i) for i in range(100)],
        "o_orderkey bigint, o_totalprice double")
    out = sorted(q_quantile_bins(orders).collect(),
                 key=lambda r: r.bin)
    assert [r.bin for r in out] == list(range(10))
    assert all(r.n_orders == 10 for r in out)
    assert sum(r.n_orders for r in out) == 100
    for lo, hi in zip(out, out[1:]):
        assert lo.max_price < hi.min_price
    assert abs(sum(r.revenue for r in out)
               - sum(1.0 + i for i in range(100))) < 1e-9


def test_corr_matrix_recovers_known_correlations(spark):
    """corr(x, x+noise-free linear) = ±1; corr with an independent
    alternating column ~ 0; values agree with numpy's corrcoef on the
    same integer projections to 6dp."""
    import numpy as np
    from movie_rec_spark.operators.relational import q_corr_matrix
    n = 200
    q = [float(1 + i % 50) for i in range(n)]
    price = [100.0 * v for v in q]          # perfectly correlated
    disc = [0.01 * ((i * 7) % 11) for i in range(n)]  # unrelated-ish
    tax = [0.5 - 0.01 * (i % 50) for i in range(n)]  # anti with q
    # (0.01 steps -> integer tax_pct, so the anti-correlation stays
    # exactly linear through the integer projection)
    li = spark.createDataFrame(
        list(zip(q, price, disc, tax)),
        "l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double")
    got = {(r.col_a, r.col_b): r.corr for r in q_corr_matrix(li).collect()}
    assert got[("quantity", "price_usd")] == 1.0
    assert got[("quantity", "tax_pct")] == -1.0
    ints = {
        "quantity": np.round(q), "price_usd": np.round(price),
        "discount_pct": np.round(np.array(disc) * 100),
        "tax_pct": np.round(np.array(tax) * 100)}
    for (a, b), v in got.items():
        want = np.corrcoef(ints[a], ints[b])[0, 1]
        assert abs(v - round(want, 6)) <= 1e-6, (a, b, v, want)


def test_skyline_dominance_ties_and_duplicates(spark):
    """Frontier keeps the non-dominated set; identical (price, size)
    twins survive together with multiplicity; an equal-price smaller
    size and an equal-size higher price are both dominated."""
    from movie_rec_spark.operators.relational import q_skyline
    rows = [
        (10.0, 5), (10.0, 5),   # duplicate pair: frontier, n_parts=2
        (10.0, 3),              # same price, smaller size: dominated
        (12.0, 5),              # same size, higher price: dominated
        (20.0, 9),              # frontier (bigger, pricier)
        (30.0, 9),              # dominated by (20.0, 9)
        (5.0, 1),               # frontier (cheapest)
    ]
    part = spark.createDataFrame(
        [(i, "p", "B", "T", s, p) for i, (p, s) in enumerate(rows)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double")
    got = {(r.p_retailprice, r.p_size): r.n_parts
           for r in q_skyline(part).collect()}
    assert got == {(5.0, 1): 1, (10.0, 5): 2, (20.0, 9): 1}


def test_grouping_sets_levels_and_exact_sums(spark):
    """gid separates the three declared sets; each level's revenue is
    the exact sum of its members (cents discipline, no drift)."""
    from movie_rec_spark.operators.relational import q_grouping_sets
    orders = spark.createDataFrame(
        [(1, 1, "O", 10.01, None, "1-URGENT"),
         (2, 1, "O", 20.02, None, "1-URGENT"),
         (3, 1, "F", 5.55, None, "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    rows = q_grouping_sets(orders).collect()
    by = {(r.gid, r.o_orderstatus, r.o_orderpriority): (r.n_orders,
                                                        r.revenue)
          for r in rows}
    assert by[(0, "O", "1-URGENT")] == (2, 30.03)
    assert by[(0, "F", "2-HIGH")] == (1, 5.55)
    assert by[(2, None, "1-URGENT")] == (2, 30.03)   # status rolled up
    assert by[(2, None, "2-HIGH")] == (1, 5.55)
    assert by[(3, None, None)] == (3, 35.58)          # grand total
    assert len(rows) == 5


def test_mode_tie_breaks_to_smallest_priority(spark):
    """Equal counts resolve to the lexicographically smallest
    priority; share normalizes by the group total."""
    from movie_rec_spark.operators.relational import q_mode
    orders = spark.createDataFrame(
        [(1, "O", "3-MEDIUM"), (2, "O", "3-MEDIUM"),
         (3, "O", "1-URGENT"), (4, "O", "1-URGENT"),
         (5, "F", "5-LOW")],
        "o_orderkey long, o_orderstatus string, o_orderpriority string")
    got = {r.o_orderstatus: r for r in q_mode(orders).collect()}
    assert got["O"].mode_priority == "1-URGENT"      # tie -> smallest
    assert (got["O"].n_mode, got["O"].n_total) == (2, 4)
    assert got["O"].share == 0.5
    assert got["F"].mode_priority == "5-LOW"


def test_json_decode_counts_malformed_as_null(spark):
    """Malformed payloads and missing keys land in the NULL bucket
    (n_parsed < n_events) instead of failing the pass."""
    import datetime as dt
    from movie_rec_spark.operators.relational import q_json_decode
    ts = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, ts, 1, "click", 1.0, '{"k": 7}'),
         (2, ts, 1, "click", 1.0, '{"k": 9}'),
         (3, ts, 1, "click", 1.0, 'not json'),
         (4, ts, 1, "view", 1.0, '{"other": 1}')],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    got = {r.event_type: r for r in q_json_decode(events).collect()}
    c = got["click"]
    assert (c.n_events, c.n_parsed, c.n_distinct_k) == (3, 2, 2)
    assert (c.min_k, c.max_k, c.sum_k) == (7, 9, 16)
    v = got["view"]
    assert (v.n_events, v.n_parsed, v.sum_k) == (1, 0, None)


def test_winsorize_clamps_tails_and_audits_means(spark):
    """Values outside the group's exact [p05, p95] clamp to the
    boundary: the after-mean moves toward the center, the clamp
    counts match the tail rows, and in-band groups are untouched."""
    import datetime as dt
    from movie_rec_spark.operators.relational import q_winsorize
    # 21 rows 0..20: p05 = 1.0, p95 = 19.0 exactly (positions 1 and 19)
    rows = [(i, dt.datetime(2024, 1, 1), 1, "a", float(v), "{}")
            for i, v in enumerate(range(21))]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    got = q_winsorize(ev).collect()[0]
    assert (got.lo, got.hi) == (1.0, 19.0)
    assert (got.n_clamped_lo, got.n_clamped_hi) == (1, 1)
    assert got.n_rows == 21
    assert got.mean_cents_before == 1000             # mean of 0..20
    # clamping 0->1 and 20->19 keeps the mean symmetric: still 10.00
    assert got.mean_cents_after == 1000


def _events_kmv(spark, day_users):
    """(day -> iterable of user_ids) -> minimal events frame."""
    rows = []
    i = 0
    for day, users in day_users.items():
        for u in users:
            rows.append(Row(
                event_id=i, ts=dt.datetime(2024, 1, day, 12, 0, 0),
                user_id=u, event_type="view", value=1.0, props="{}"))
            i += 1
    return spark.createDataFrame(rows)


def test_kmv_distinct_small_cardinality_is_exact(spark):
    """Days with fewer than K distinct users are in the sketch's exact
    mode: est == true distinct, kth_hash == -1; the merged row over
    small days is exact too (pooled mins == pooled distinct sets).
    Repeat visits by the same user must not inflate anything."""
    ev = _events_kmv(spark, {
        1: [1, 2, 3, 4, 5, 1, 2, 1],       # 5 distinct, repeats
        2: [3, 4, 5, 6],                   # 4 distinct, overlaps day 1
    })
    out = {r.day: r for r in R.q_kmv_distinct(ev).collect()}
    assert out["2024-01-01"].est_distinct == 5
    assert out["2024-01-02"].est_distinct == 4
    assert out["__all__"].est_distinct == 6   # union {1..6}
    assert all(r.kth_hash == -1 for r in out.values())


def test_kmv_distinct_estimates_within_theory_bound(spark):
    """Above-K cardinalities: per-day and merged estimates must land
    within 4 standard errors (4/sqrt(K-2) ~ 51%) of truth — a loose
    bound a broken estimator (wrong M, off-by-one rank, float
    division) still fails by orders of magnitude. The fixture check
    (sf0.01: max day error 14.3%, window 144 vs 150) pins typical
    accuracy; this test pins the CONTRACT on synthetic days."""
    ev = _events_kmv(spark, {
        d: range(d * 1000, d * 1000 + 400 + 50 * d) for d in range(1, 6)
    })
    out = {r.day: r for r in R.q_kmv_distinct(ev).collect()}
    bound = 4.0 / (R.KMV_K - 2) ** 0.5
    for d in range(1, 6):
        truth = 400 + 50 * d
        est = out[f"2024-01-0{d}"].est_distinct
        assert abs(est - truth) / truth < bound, (d, est, truth)
        assert out[f"2024-01-0{d}"].kth_hash > 0
        assert out[f"2024-01-0{d}"].n_mins == R.KMV_K
    truth = sum(400 + 50 * d for d in range(1, 6))  # disjoint ranges
    est = out["__all__"].est_distinct
    assert abs(est - truth) / truth < bound, (est, truth)


def test_quantile_merge_exact_and_merge_equals_rescan(spark):
    """Hand-built two-day corpus: per-day percentiles must equal the
    all-integer model (including a f=0.75 interpolation landing on an
    exact .5 — the knife-edge class float kernels round apart), and
    the '__all__' row computed from MERGED daily histograms must equal
    percentiles of the pooled raw values."""
    def model(vals, pn, pd_):
        v = sorted(vals)
        num = pn * (len(v) - 1)
        i, rem = divmod(num, pd_)
        raw = v[i] * (pd_ - rem) + (v[i + 1] if rem else v[i]) * rem
        return (2 * raw + pd_) // (2 * pd_)   # HALF_UP

    d1 = [100, 200, 300, 401]      # p75 rank 2.25: interpolates 300/401
    d2 = [150, 250, 350, 450, 550]
    rows = []
    for day, vals in ((1, d1), (2, d2)):
        for j, c in enumerate(vals):
            rows.append(Row(event_id=day * 100 + j,
                            ts=dt.datetime(2024, 1, day, 12, 0, 0),
                            user_id=j, event_type="view",
                            value=c / 100.0, props="{}"))
    ev = spark.createDataFrame(rows)
    out = {r.day: r for r in R.q_quantile_merge(ev).collect()}
    for day, vals in (("2024-01-01", d1), ("2024-01-02", d2),
                      ("__all__", d1 + d2)):
        got = out[day]
        assert got.n_rows == len(vals)
        for col, (pn, pd_) in (("p25_cents", (1, 4)),
                               ("p50_cents", (1, 2)),
                               ("p75_cents", (3, 4)),
                               ("p95_cents", (19, 20))):
            assert getattr(got, col) == model(vals, pn, pd_), \
                (day, col, getattr(got, col), model(vals, pn, pd_))


def _hll_mirror_registers(user_ids, p=None):
    """Pure-Python mirror of q_hll_audit's register pipeline: 56-bit
    md5 prefix, low-p-bit bucket, rho = leading zeros of the suffix
    + 1 — an independent implementation (hashlib + int.bit_length)
    for the engine's conv/bin SQL arithmetic."""
    import hashlib

    if p is None:
        p = R.HLL_AUDIT_P
    m = 1 << p
    suffix_bits = R.HLL_AUDIT_HASH_BITS - p
    regs: dict[int, int] = {}
    for u in user_ids:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:14], 16)
        idx, w = h % m, h // m
        rho = suffix_bits - w.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_hll_audit_registers_match_python_mirror(spark):
    """Every per-day register row and the merged '__all__' rows equal
    an independent pure-Python HLL (hashlib md5 + bit_length), and
    day_exact is the true distinct count — the register arithmetic
    (conv/bin/shift) is pinned end to end, repeats ignored."""
    day_users = {1: [1, 2, 3, 4, 5, 1, 2], 2: [4, 5, 6, 7],
                 3: list(range(100, 160))}
    ev = _events_kmv(spark, day_users)
    out = R.q_hll_audit(ev).collect()
    by_day: dict[str, dict[int, int]] = {}
    exact: dict[str, int] = {}
    for r in out:
        by_day.setdefault(r.day, {})[r.idx] = r.reg
        exact[r.day] = r.day_exact
    all_users = set()
    for day, users in day_users.items():
        want = _hll_mirror_registers(set(users))
        assert by_day[f"2024-01-0{day}"] == want
        assert exact[f"2024-01-0{day}"] == len(set(users))
        all_users |= set(users)
    assert by_day["__all__"] == _hll_mirror_registers(all_users)
    assert exact["__all__"] == len(all_users)
    # mergeability: '__all__' is the register-wise max of the days
    merged: dict[int, int] = {}
    for day in day_users:
        for idx, reg in by_day[f"2024-01-0{day}"].items():
            merged[idx] = max(merged.get(idx, 0), reg)
    assert by_day["__all__"] == merged


def test_hll_audit_estimate_within_error_band(spark):
    """The HLL estimate DERIVED from the audit's integer rows (raw
    harmonic-mean form + the standard linear-counting small-range
    correction) lands within 4 standard errors (4·1.04/sqrt(m)) of
    the exact distinct count the table carries alongside — the gate a
    broken register pipeline (wrong bucket bits, off-by-one rho)
    fails by orders of magnitude."""
    import math

    n = 5000
    ev = _events_kmv(spark, {1: range(n)})
    rows = [r for r in R.q_hll_audit(ev).collect() if r.day == "__all__"]
    m = 1 << R.HLL_AUDIT_P
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -r.reg for r in rows) + (m - len(rows))
    est = alpha * m * m / s
    v = m - len(rows)
    if est <= 2.5 * m and v > 0:
        est = m * math.log(m / v)
    exact = rows[0].day_exact
    assert exact == n
    band = 4 * 1.04 / math.sqrt(m)
    assert abs(est - exact) / exact < band, (est, exact, band)


def _hll_mirror_estimate(keys):
    """Pure-Python mirror of hll_portable_estimate: integer raw floor
    division by the exact denominator-numerator S, or the precomputed
    linear-counting lookup — BIT-exact, not just within-band."""
    regs = _hll_mirror_registers(set(keys))
    m = R.HLL_EST_M
    t, v = len(regs), m - len(regs)
    rmax = R.HLL_AUDIT_HASH_BITS - R.HLL_AUDIT_P + 1
    s = sum(1 << (rmax - r) for r in regs.values()) + v * (1 << 49)
    raw = R.HLL_EST_C // s
    if raw <= 5 * m // 2 and v > 0:
        return R.HLL_LC_TABLE[v - 1]
    return raw


def test_portable_hll_estimate_bit_exact_vs_mirror(spark):
    """q_approx_distinct's estimate equals the pure-Python mirror
    EXACTLY in both regimes (r11 graduation: the estimate is
    deterministic integer arithmetic, not an engine sketch) — raw
    regime at 5000 keys, linear counting at 60."""
    from pyspark.sql import functions as F

    for n in (60, 5000):
        orders = spark.range(0, 3 * n).select(
            (F.col("id") % n).alias("o_custkey"))
        row = R.q_approx_distinct(orders).collect()[0]
        assert row.exact_users == n
        assert row.approx_users == _hll_mirror_estimate(range(n)), n


def test_hll_union_merge_is_bit_exact(spark):
    """Portable-register union: est over per-day-merged registers is
    BIT-equal to estimating the pooled stream directly (register max
    is associative) — stronger than the old within-band promotion."""
    import datetime as dt

    rows = [(i, dt.datetime(2024, 1, 1 + (i % 9)), i % 700)
            for i in range(5000)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint")
    got = R.q_hll_union(ev).collect()[0]
    assert got.n_days == 9
    assert got.est_distinct_users == _hll_mirror_estimate(range(700))
