"""Temporal operators: as-of join (point-in-time lookup).

The reference has no as-of/range joins (SURVEY.md §2.3 note) — provided
for engine completeness, and because point-in-time joins are a staple of
event analytics at scale. Spark has no native ASOF JOIN; the idiomatic
composition is union-sort-backfill: tag both sides, union on the key
with an ordering that puts the build side first at equal timestamps
(inclusive `event.ts >= build.ts` semantics), then ``last(..,
ignorenulls=True)`` over an unbounded-preceding window per key.

One shuffle on the join key; no range explosion, no per-row probe. At
100 TB both sides shuffle once on user_id — same cost as any equi-join
— and the window runs sorted within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(events: DataFrame, snapshots: DataFrame,
              key: str, event_ts: str, snap_ts: str,
              value_cols: list[str]) -> DataFrame:
    """For each event row, attach the latest snapshot row of the same
    ``key`` with ``snap_ts <= event_ts`` (inclusive). Left semantics:
    events with no prior snapshot keep NULL values.

    Ties — several snapshot rows at one (key, snap_ts) — resolve to a
    deterministic winner (max of the value_cols tuple), because they
    would otherwise be engine-dependent.

    Single shuffle total: snapshot values ride in ONE struct column
    (atomic row semantics for ``last``), and the sort order
    (_ts, _side, _snap ascending) makes the max tuple sort last, so tie
    dedupe happens inside the SAME window as the backfill — no separate
    (key, snap_ts) dedupe exchange.
    """
    snap_t = dict(snapshots.dtypes)
    struct_t = "struct<" + ",".join(
        f"{c}:{snap_t[c]}" for c in value_cols) + ">"
    s = snapshots.select(
        F.col(key).alias("_k"),
        F.col(snap_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_event_id"),
        F.struct(*value_cols).alias("_snap"),
    )
    e = events.select(
        F.col(key).alias("_k"),
        F.col(event_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col("event_id").alias("_event_id"),
        F.lit(None).cast(struct_t).alias("_snap"),
    )
    # snapshots sort before events at the same timestamp -> inclusive;
    # among tied snapshots the max value tuple sorts last and wins.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc("_snap"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = e.unionByName(s).select(
        "_side", "_event_id", "_k", "_ts",
        F.last("_snap", ignorenulls=True).over(w).alias("_snap"),
    )
    return filled.filter(F.col("_side") == 1).select(
        F.col("_event_id").alias("event_id"),
        F.col("_k").alias(key),
        F.col("_ts").alias(event_ts),
        *[F.col(f"_snap.{c}").alias(c) for c in value_cols],
    )


SESSION_GAP = "30 minutes"
SESSION_GAP_SEC = 30 * 60


def q_sessionize(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Gap-based sessionization with Spark's native ``session_window``
    (beyond reference — it has no session concept, SURVEY.md §2.10):
    events of one user belong to one session while consecutive gaps stay
    under ``gap``. One shuffle on user_id; Spark merges overlapping
    session intervals inside the aggregation — no self-join, no window
    scan. The oracle expresses the same semantics as
    lag → gap-flag → running-sum (see ``oracle_sql``), proving the
    built-in operator against first principles.
    """
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end",
                "n_events", "total_value")
    )


def q_asof_join(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Declared query: each event joined to the user's most recent order
    at-or-before the event time (point-in-time account state)."""
    snaps = orders.select(
        F.col("o_custkey").alias("user_id"), "o_orderdate",
        "o_orderkey", "o_totalprice")
    return asof_join(
        events.select("event_id", "user_id", "ts"),
        snaps,
        key="user_id", event_ts="ts", snap_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    )


def range_join_binned(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_start: str, right_end: str,
                      bin_seconds: int) -> DataFrame:
    """Interval (range) join without the nested-loop trap.

    Naive `l.ts BETWEEN r.start AND r.end` forces Spark into a
    broadcast-nested-loop join (quadratic). Binning makes it an
    equi-join: quantize the probe timestamp to fixed-width bins,
    explode each interval into the bins it covers, join on (key, bin),
    then apply the exact range predicate. Shuffle volume is
    |left| + |right|·(interval/bin_width) — pick bin_seconds near the
    typical interval length so intervals explode into ~1-2 bins.
    Interval semantics: [start, end) — end exclusive.
    """
    lb = left.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(left_ts)) / bin_seconds))
    # Right-side bins run through floor(unix(end)/bin) INCLUSIVE:
    # unix_timestamp truncates sub-second fractions, so an interval end
    # like 12:30:00.4 still owns probes in the [12:30:00, 12:30:00.4)
    # sliver of bin unix(end)/bin — ending the sequence at
    # (unix(end)-1)/bin would drop them (testdata timestamps are
    # ns-precision). The exact post-filter below removes the extra
    # candidates this over-generation admits for exactly-aligned ends.
    rb = right.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(right_start)) / bin_seconds),
            F.floor(F.unix_timestamp(F.col(right_end)) / bin_seconds),
        )),
    )
    return (
        lb.join(rb, [key, "_bin"])
        .filter((F.col(left_ts) >= F.col(right_start))
                & (F.col(left_ts) < F.col(right_end)))
        .drop("_bin")
    )


def q_range_join(events: DataFrame) -> DataFrame:
    """Declared query: view events attributed to the 30-minute window
    after each purchase by the same user (post-purchase activity
    attribution). Self-contained on the events table because the
    testdata orders/events time domains are disjoint."""
    intervals = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts")
    return range_join_binned(
        views, intervals,
        key="user_id", left_ts="ts",
        right_start="win_start", right_end="win_end",
        bin_seconds=30 * 60,
    ).select("event_id", "user_id", "ts", "purchase_id", "win_start")


FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel(events: DataFrame,
             steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """Ordered conversion funnel — how many users complete each step of
    ``steps`` IN ORDER (each step's event at-or-after the user's first
    qualifying time of the previous step; first-touch semantics). The
    standard product-analytics query every event warehouse serves.

    Reference analogue: none (the reference has no event analytics);
    extends the T-family event surface (SURVEY §2.10).

    Scale shape: one user-keyed aggregate per step, each joined back to
    the events table on user_id — every shuffle in the chain is keyed
    on user_id, so once AQE/co-partitioning has hashed events by user
    the per-step joins reuse the layout rather than re-exchanging the
    big side. Step count is a small constant; nothing is quadratic and
    no window over the full event stream is needed. Output is one row
    per step: (step_idx, step, n_users), monotone non-increasing.
    """
    return _funnel(events, steps, max_delay_days=None)


FUNNEL_MAX_DELAY_DAYS = 3


def q_funnel_window(events: DataFrame,
                    steps: tuple[str, ...] = FUNNEL_STEPS,
                    max_delay_days: int = FUNNEL_MAX_DELAY_DAYS) -> DataFrame:
    """Conversion funnel with a MAX-DELAY constraint between steps —
    the form product analytics actually ships ("converted within N
    days"): step k counts only if its event lands in
    [t_{k-1}, t_{k-1} + N days]. Without the bound, a purchase a year
    after the click still 'converts', which overstates every funnel;
    the windowed count is monotone ≤ the unbounded q_funnel per step.
    First-touch semantics within the window: t_k is the user's
    EARLIEST qualifying step-k time (matching q_funnel), so a user who
    converts late at step k may fail step k+1 even though a later
    qualifying k-event existed — the standard strict-first-touch
    trade-off, identical in the oracle.

    Scale shape: identical to q_funnel — every shuffle keyed on
    user_id, the window predicate rides the existing per-step join.
    """
    return _funnel(events, steps, max_delay_days)


def _funnel(events: DataFrame, steps: tuple[str, ...],
            max_delay_days: int | None) -> DataFrame:
    """Single-shuffle funnel kernel: one window PER STEP, all over the
    SAME user_id partitioning, so Catalyst plans ONE Exchange + one
    Sort reused by every Window operator (plan-asserted ≤2 exchanges
    incl. the O(steps)-row global count; the naive per-step
    agg-and-join-back chain costs ``2·steps − 1`` user-keyed shuffles
    of the full event table — the r4 shape, 5 Exchanges at 3 steps).
    Step k's first-touch time t_k = min ts of step-k events with
    ts ≥ t_{k-1} (and ≤ t_{k-1} + max_delay when bounded) — t_{k-1} is
    a previously-computed window column, constant within the user
    partition, so the dependency never leaves the executor."""
    w = Window.partitionBy("user_id")
    ev = events.select("user_id", "event_type", "ts")
    prev: F.Column | None = None
    tcols = []
    for i, step in enumerate(steps):
        qual = F.col("event_type") == step
        if prev is not None:
            qual = qual & (F.col("ts") >= prev)
            if max_delay_days is not None:
                qual = qual & (
                    F.col("ts") <= prev
                    + F.expr(f"INTERVAL {max_delay_days} DAYS"))
        ev = ev.withColumn(
            f"_t{i}", F.min(F.when(qual, F.col("ts"))).over(w))
        prev = F.col(f"_t{i}")
        tcols.append(f"_t{i}")
    # one row per user (groupBy on the window key reuses the layout),
    # then an O(steps)-row conditional count finishes on the driver side
    per_user = ev.groupBy("user_id").agg(
        *[F.first(c).alias(c) for c in tcols])
    counts = per_user.agg(*[
        F.count(F.col(c)).alias(f"_n{i}") for i, c in enumerate(tcols)])
    # one stack() generate over the single counts row — a per-step
    # union would replicate the whole agg subtree once per step
    cells = ", ".join(
        f"CAST({i} AS INT), '{step}', _n{i}"
        for i, step in enumerate(steps))
    return counts.select(F.expr(
        f"stack({len(steps)}, {cells}) AS (step_idx, step, n_users)"))


def q_cohort(events: DataFrame) -> DataFrame:
    """Weekly cohort retention — users bucketed by their first-activity
    date's week, counted per whole weeks elapsed at each later
    activity: (cohort_week, offset_weeks, n_users). The classic
    retention triangle behind every growth dashboard.

    Week anchoring: cohort_week = the user's first activity date
    truncated to Monday; offset = floor(days-since-first / 7) so
    offset 0 is the first seven days REGARDLESS of weekday — per-user
    anchoring (not calendar-week diffs) keeps cohorts comparable.

    Scale shape: first-seen agg (one user-keyed shuffle), joined back
    on user_id (same key, layout reuse as q_funnel), a distinct
    (user, cohort, offset) collapse, then the small
    (cohort_week, offset) count — cost is one pass over events plus
    user-keyed exchanges; the retention matrix itself is tiny.
    """
    ev = events.select("user_id", F.to_date("ts").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", "d0").cast("date").alias("cohort_week"),
            F.floor(F.datediff(F.col("d"), F.col("d0")) / 7)
            .cast("int").alias("offset_weeks"),
        )
        .distinct()
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ROLLING_WINDOW_SEC = 7 * 24 * 3600  # 7-day trailing frame


def q_rolling_window(events: DataFrame,
                     window_sec: int = ROLLING_WINDOW_SEC) -> DataFrame:
    """Trailing time-RANGE window — per user, each event row carries
    the count and value-sum of that user's events in the preceding
    ``window_sec`` seconds (inclusive of now): the rolling-exposure /
    velocity feature every fraud, abuse, and engagement model consumes
    at training AND serving time.

    This is the frame-spec member of the window family the engine was
    still missing: q_window_analytics covers ROWS frames (lag, ma3,
    running totals); a RANGE frame bounds by event-TIME distance, so
    irregular event spacing changes how many rows each frame holds.

    Scale shape: ONE shuffle keyed on user_id, then a per-partition
    sort and a two-pointer frame scan inside the window operator — the
    same cost class as any analytic window; no self-join range
    explosion (the naive events×events ts-range join it replaces).
    Ties on ts collapse into the same RANGE frame on both engines, so
    the output is deterministic even with duplicate timestamps.
    """
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_timestamp("ts"))  # NTZ-safe floor to seconds
         .rangeBetween(-window_sec, 0))
    return events.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 2).alias("value_7d"),
    )


ANOMALY_MIN_N = 5    # frame must hold this many points to score
ANOMALY_Z_CUT = 3.0  # |z| at-or-above flags the event


def q_anomaly(events: DataFrame,
              window_sec: int = ROLLING_WINDOW_SEC,
              min_n: int = ANOMALY_MIN_N,
              z_cut: float = ANOMALY_Z_CUT) -> DataFrame:
    """Rolling z-score anomaly detection — the alerting twin of
    q_rolling_window and the streaming-monitoring form of q_outliers'
    batch IQR fences: each event's ``value`` scores against the mean
    and population-σ of that user's OWN trailing ``window_sec`` frame,
    and |z| ≥ ``z_cut`` flags it. Per-entity baselines (not global
    ones) are what fraud/abuse/SLO monitors actually run, because a
    heavy user's normal is another user's anomaly.

    The baseline frame EXCLUDES the scored event (RANGE … PRECEDING
    AND 1 PRECEDING): an inclusive frame dilutes its own spike into
    the mean/σ it is judged against — a 100× outlier after 5 steady
    points only reaches z ≈ 2.2 self-diluted, vs z ≈ 700 against the
    prior-only baseline (the unit test pins exactly this case).

    Guards: a baseline with fewer than ``min_n`` points or zero
    variance yields a NULL z (never a flag) — cold-start and constant
    streams must not alert. z is rounded to 2dp BEFORE the threshold
    compare in both engines, so the flag itself is hash-stable despite
    float accumulation-order differences inside the window aggregates.

    Scale shape: identical to q_rolling_window — ONE user-keyed
    shuffle, per-partition sort, two-pointer RANGE frame; the three
    window aggregates (count, avg, stddev_pop) share the same frame
    and sort.
    """
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_timestamp("ts"))
         .rangeBetween(-window_sec, -1))
    n = F.count(F.lit(1)).over(w)
    mu = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    z = F.when((n >= min_n) & (sd > 0),
               F.round((F.col("value") - mu) / sd, 2))
    return events.select(
        "event_id", "user_id", "ts", "value",
        n.alias("n_win"),
        z.alias("zscore"),
        (F.coalesce(F.abs(z), F.lit(0.0)) >= F.lit(z_cut))
        .alias("is_anomaly"),
    )


def q_scd2(events: DataFrame) -> DataFrame:
    """SCD Type-2 history build — turn a change log into a validity-
    interval dimension: each user's attribute stream (event_type here
    stands in for the tracked attribute) collapses consecutive repeats
    into islands, and each island becomes one row with
    [valid_from, valid_to) — valid_to NULL marks the current version.
    This is the lakehouse dimension-history pattern that pairs with
    sources/merge.py's type-1 MERGE (latest-wins overwrites vs
    full-history retention); an AS-OF read of the dimension at time T
    is then a plain filter valid_from <= T < coalesce(valid_to, inf),
    the same point-in-time shape asof_join serves row-by-row.

    Scale shape: ONE shuffle on user_id drives all three window
    passes (change-flag lag, running island sum, island lead) — the
    per-user sort is shared; the island aggregate rides the same key.
    Tie order inside a user is (ts, event_id) so islands are
    deterministic under same-timestamp changes.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "event_id", "ts", "event_type",
        F.when(F.lag("event_type").over(w).isNull()
               | (F.lag("event_type").over(w) != F.col("event_type")), 1)
        .otherwise(0).alias("chg"))
    islands = flagged.withColumn(
        "island", F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    hist = islands.groupBy("user_id", "island").agg(
        F.first("event_type").alias("attr"),
        F.min(F.struct("ts", "event_id")).alias("_s"),
        F.count(F.lit(1)).alias("n_events"))
    wi = Window.partitionBy("user_id").orderBy("island")
    return (
        hist.select(
            "user_id", F.col("island").cast("int").alias("version"),
            "attr", F.col("_s.ts").alias("valid_from"), "n_events",
            F.lead(F.col("_s.ts")).over(wi).alias("valid_to"))
    )


def q_resample(events: DataFrame) -> DataFrame:
    """Hourly resampling with gap fill (the 'date spine'): each user's
    event stream becomes a dense hourly grid from their first to their
    last active hour, with explicit zero rows for silent hours — the
    shape every downstream time-series model (forecasting, anomaly
    detection) requires, and the step ad-hoc SQL gets wrong by
    silently omitting empty buckets.

    Scale shape: the per-user [min, max] hour span aggregates in the
    same user-keyed shuffle as the hourly counts; the spine explodes
    from a ``sequence`` per user (rows = active-span hours, not
    calendar hours, so a user active for a day costs 24 rows no matter
    how old the corpus is) and the grid left-joins the counts on the
    SAME user key — layout reuse end to end. Span explosion is the
    knob to watch: a years-long span at hour grain is ~10k rows/user;
    coarsen the grain (day/week) as the span grows.
    """
    hours = events.select(
        "user_id", F.date_trunc("hour", "ts").alias("h"), "value")
    counts = hours.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"))
    span = hours.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1",
                             F.expr("INTERVAL 1 HOUR"))).alias("h"))
    return (
        spine.join(counts, ["user_id", "h"], "left")
        .select(
            "user_id", F.col("h").alias("hour"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
            F.col("n_events").isNull().alias("gap"),
        )
    )


def q_cumulative_users(events: DataFrame) -> DataFrame:
    """Daily active / new / cumulative-distinct users — the growth
    dashboard's base series. The naive formulation (COUNT(DISTINCT
    user) OVER an expanding date window) re-scans every prior day per
    day — quadratic; the scale form used here is the FIRST-SEEN trick:
    cumulative distinct users at day d ≡ running sum of users whose
    first-ever event lands on ≤ d. One per-user min, one per-day
    aggregate pair, one tiny ordered prefix sum over |days| rows —
    everything keyed, nothing quadratic, same shape at 100 TB.
    """
    day = F.date_trunc("day", F.col("ts"))
    daily = (events.groupBy(day.alias("day"))
             .agg(F.countDistinct("user_id").alias("active_users")))
    first_seen = (events.groupBy("user_id")
                  .agg(F.min(day).alias("day")))
    new_per_day = (first_seen.groupBy("day")
                   .agg(F.count(F.lit(1)).alias("new_users")))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        daily.join(new_per_day, "day", "left")
        .select("day", "active_users",
                F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .withColumn("cumulative_users",
                    F.sum("new_users").over(w).cast("bigint"))
    )


ACTIVE_WINDOW_DAYS = 7   # trailing window for the WAU series


def q_active_users(events: DataFrame,
                   window_days: int = ACTIVE_WINDOW_DAYS) -> DataFrame:
    """DAU / trailing-WAU series — daily distinct actives plus the
    distinct actives over the trailing ``window_days`` calendar days,
    reported for every day with ≥1 event (beyond reference; the
    engagement twin of q_cumulative_users' growth series).

    Sliding COUNT(DISTINCT) is the classic scale trap: a RANGE-frame
    window would re-scan ``window_days`` of raw events per day, and
    Spark refuses DISTINCT aggregates in windows outright. The scale
    form is CONTRIBUTION EXPANSION: collapse the corpus to distinct
    (user, day) pairs first — the only pass over raw data — then each
    pair votes for the ≤``window_days`` window-end days it makes
    active, and ONE day-keyed aggregate finishes BOTH series: votes
    carry their offset, so DAU is the conditional countDistinct of
    offset-0 votes inside the same pass as WAU — no separate daily
    aggregate, no dau⋈wau join (measured 6 → 4 Exchanges). The
    blow-up factor is bounded by the window length ON THE DEDUPED
    PAIRS (≤7× of |user-days|, not of raw rows at 100 TB), and every
    stage is a keyed aggregate — no per-day rescans, no window sort
    over the corpus. Vote days beyond the data's horizon are clipped
    by the inner join against the observed-day dimension (tiny —
    |days| rows — and broadcast).
    """
    ud = (events.select(F.to_date("ts").alias("day"), "user_id")
          .distinct())
    days = ud.select("day").distinct()
    votes = (ud.select(
        "user_id",
        F.explode(F.expr(
            f"sequence(0, {window_days - 1})")).alias("off"),
        "day")
        .select("user_id", "off",
                F.expr("date_add(day, off)").alias("day")))
    return (votes.join(F.broadcast(days), "day")
            .groupBy("day")
            .agg(F.countDistinct(
                F.when(F.col("off") == 0, F.col("user_id")))
                .alias("dau"),
                F.countDistinct("user_id").alias("wau"))
            .select("day", "dau", "wau"))


def q_lag_features(events: DataFrame) -> DataFrame:
    """Per-user feature-store row — the lag-feature assembly a churn /
    propensity model trains on, computed AS OF the corpus's last
    event: activity counts over trailing 7- and 30-day windows, 30-day
    spend, days since last activity, and the value of the LATEST event
    (beyond reference; the batch feature-materialization pattern).

    Everything is ONE user-keyed aggregate over the scan: the trailing
    windows are conditional sums against a broadcast now-scalar
    (microsecond-exact integer compares, no per-window rescan, no
    window function at all), and latest-event extraction is
    max(struct(ts, event_id, cents)) — an argmax by the (ts, event_id)
    total order that stays inside the same partial-aggregable pass
    instead of costing a sort. All features are exact integers.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    now = events.agg(F.max(us).alias("now_us"))
    day_us = 86_400 * 1_000_000
    in_7d = us > F.col("now_us") - F.lit(7 * day_us)
    in_30d = us > F.col("now_us") - F.lit(30 * day_us)
    return (
        events.crossJoin(F.broadcast(now))
        .groupBy("user_id")
        .agg(F.sum(in_7d.cast("long")).alias("n_events_7d"),
             F.sum(in_30d.cast("long")).alias("n_events_30d"),
             F.sum(F.when(in_30d, cents).otherwise(F.lit(0)))
             .alias("spend_cents_30d"),
             F.min(F.col("now_us") - us).alias("_gap_us"),
             F.max(F.struct(F.col("ts"), F.col("event_id"),
                            cents.alias("c"))).alias("_last"))
        .select("user_id", "n_events_7d", "n_events_30d",
                "spend_cents_30d",
                F.floor(F.col("_gap_us") / F.lit(day_us)).cast("long")
                .alias("days_since_last"),
                F.col("_last.c").alias("last_cents"))
    )


def q_new_vs_returning(events: DataFrame) -> DataFrame:
    """Daily active users split into NEW (first-ever activity that
    day) vs RETURNING — the acquisition-vs-retention headline the
    growth dashboard leads with (beyond reference; composes
    q_cumulative_users' first-seen trick with the per-day split).

    The naive spelling re-scans history per day ("was this user seen
    before d?"); the scale form computes each user's first-seen day
    ONCE (one user-keyed min), joins it back onto deduped user-day
    pairs (same key, one co-partitioned join), and classifies
    row-locally. Every stage is keyed on user_id or day; nothing
    rescans, nothing is quadratic in days.
    """
    ud = (events.select(F.to_date("ts").alias("day"), "user_id")
          .distinct())
    first = ud.groupBy("user_id").agg(F.min("day").alias("day0"))
    return (
        ud.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("day0")).cast("long"))
            .alias("new_users"),
            F.sum((F.col("day") > F.col("day0")).cast("long"))
            .alias("returning_users"))
        .select("day", "new_users", "returning_users",
                (F.col("new_users") + F.col("returning_users"))
                .alias("active_users"))
    )


WALKFORWARD_FOLDS = 3


def q_walkforward_splits(events: DataFrame,
                         n_folds: int = WALKFORWARD_FOLDS) -> DataFrame:
    """Walk-forward (expanding-window) cross-validation splits — the
    time-series replacement for random k-fold, where every fold trains
    strictly BEFORE its test window (random folds leak the future; the
    reference's 3-fold CV, trainer.py:45-66, is only sound for its
    stationary ratings use). The observed time range divides into
    ``n_folds + 1`` equal windows; fold k trains on windows 0..k and
    tests on window k+1, so later folds see strictly more history —
    the standard backtest layout.

    Output is the per-(fold, role) audit summary (event/user counts +
    actual time bounds) a training job logs next to its metrics; the
    per-event assignment is the same expression un-aggregated. All
    window arithmetic is integer epoch math, bit-equal across engines.

    Scale shape: one scalar min/max agg broadcast back, a 3-row fold
    table broadcast-joined (each event lands in ≤ n_folds+1 roles),
    one (fold, role) aggregate — no window function, no sort.
    """
    sec = F.unix_timestamp("ts")
    bounds = events.agg(F.min(sec).alias("t0"), F.max(sec).alias("t1"))
    folds = events.sparkSession.range(n_folds).select(
        F.col("id").cast("int").alias("fold"))
    # integer floor-div, NOT a double cast: Spark's bigint cast
    # truncates while DuckDB's rounds — div keeps both engines exact
    width = F.expr(f"(t1 - t0) div {n_folds + 1}") + 1
    w = F.floor((sec - F.col("t0")) / width).cast("int")
    role = (F.when(w <= F.col("fold"), "train")
            .when(w == F.col("fold") + 1, "test"))
    return (
        events.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(folds))
        .withColumn("role", role)
        .filter(F.col("role").isNotNull())
        .groupBy("fold", "role")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.min("ts").alias("ts_min"),
             F.max("ts").alias("ts_max"))
    )


def q_twap(events: DataFrame) -> DataFrame:
    """Per-user TIME-weighted average event value — the TWAP/telemetry
    aggregate (beyond reference): a sensor reading or price holds
    until the next observation, so each value is weighted by how long
    it was current, not by its row count. Plain AVG over-weights
    bursts; TWAP is the honest summary under irregular sampling.

    Semantics: events order by the (ts, event_id) total order per
    user; value_i carries weight Δt_i = millis until the user's next
    event (the final observation carries zero — it holds for no
    measured time); users with zero total span (single event, or all
    events at one instant) are excluded. Arithmetic is exact end to
    end: integer-cents values × integer epoch-millis gaps (µs-exact
    timestamps truncate to ms identically on both engines), summed in
    int64 — bounded by span·max_cents (~10¹⁵ per user-year), NOT by
    event count — with one final division, identically rounded.

    Plan shape: ONE user-keyed shuffle — the lead() window and the
    closing aggregate share the same hash layout as the rest of the
    event-analytics family (q_sessionize, q_anomaly, q_rolling_window
    — SCALE.md), so a pipeline running several of these pays the
    exchange once.
    """
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ → TIMESTAMP first (the attribution idiom): unix_millis ≡
    # DuckDB epoch_ms, both truncating the µs remainder
    t = F.unix_millis(F.col("ts").cast("timestamp"))
    stepped = events.select(
        "user_id", cents.alias("cents"),
        (F.lead(t, 1).over(w) - t).alias("dt_ms"))
    return (
        stepped.where(F.col("dt_ms").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_intervals"),
             F.sum("dt_ms").alias("span_ms"),
             F.sum(F.col("cents") * F.col("dt_ms")).alias("_wsum"))
        .where(F.col("span_ms") > 0)
        .select("user_id", "n_intervals", "span_ms",
                (F.round(F.col("_wsum").cast("double")
                         / F.col("span_ms").cast("double") / 100.0, 4)
                 + F.lit(0.0)).alias("twap"))
    )


TREND_MIN_EVENTS = 5   # users with fewer events have no stable trend


def q_trend(events: DataFrame,
            min_events: int = TREND_MIN_EVENTS) -> DataFrame:
    """Per-user spend trend: the OLS slope/intercept of event value
    (cents) against days-since-first-activity, for users with
    ``min_events``+ events spanning >1 day (beyond reference — the
    grouped-regression feature a churn model trains on).

    Closed-form OLS is an ALGEBRAIC aggregate — five sums (n, Σx, Σy,
    Σxy, Σx²) fully map-side-combinable, so the corpus collapses in
    ONE keyed shuffle exactly like a COUNT; no per-user iteration, no
    matrix library. All five sums stay in exact int64 — x is DAYS
    since the user's first event (≤ ~4·10² for a year span, so
    n·Σx² ≤ ~10¹¹ even at 10⁵ events/user) and y is integer cents —
    so numerator and denominator are bit-equal across engines and the
    only float op is one final division, identically rounded.

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), intercept at x=0 (first
    day) = (ΣyΣx² − ΣxΣxy) / same-denominator; both reported in cents.
    """
    cents = F.round(F.col("value") * 100, 0).cast("long")
    base = events.select("user_id", F.to_date("ts").alias("day"),
                         cents.alias("y"))
    x0 = base.groupBy("user_id").agg(F.min("day").alias("day0"))
    xy = (base.join(x0, "user_id")
          .select("user_id", "y",
                  F.datediff("day", "day0").cast("long").alias("x")))
    s = xy.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num_b = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    num_a = (F.col("sy") * F.col("sxx")
             - F.col("sx") * F.col("sxy"))
    return (
        s.where((F.col("n") >= min_events) & (den > 0))
        .select(
            "user_id", "n",
            (F.round(num_b.cast("double") / den.cast("double"), 4)
             + F.lit(0.0)).alias("slope_cents_per_day"),
            (F.round(num_a.cast("double") / den.cast("double"), 4)
             + F.lit(0.0)).alias("intercept_cents"))
    )


def q_audience_overlap(events: DataFrame) -> DataFrame:
    """Pairwise audience overlap between event types: shared distinct
    users, each side's audience size, and the Jaccard overlap — the
    segment-intersection matrix an activation/campaign dashboard shows
    (beyond reference; the set-level cousin of q_event_transitions'
    sequence matrix).

    Exact set intersections at scale WITHOUT a distinct-count-per-pair
    rescan OR a membership self-join: ONE user-keyed aggregate
    collapses the corpus to per-user sorted type SETS, pair
    enumeration is then a row-local array transform (fan-out bounded
    by |event_types|² per user — a few dozen rows for any real type
    vocabulary, never corpus-squared, and never a second corpus
    shuffle the way the membership self-join costs), and two tiny
    aggs finish. Audience sizes explode from the same checkpointed
    sets; Jaccard = shared / (a + b − shared) stays an exact-integer
    ratio until one identically-rounded division. Pairs are
    canonicalized type_a < type_b by the array sort.
    """
    sets = (events.groupBy("user_id")
            .agg(F.array_sort(F.collect_set("event_type")).alias("ts"))
            .localCheckpoint(eager=False))
    pair = F.explode(F.expr(
        "flatten(transform(ts, (x, i) -> "
        "transform(slice(ts, i + 2, size(ts)), "
        "y -> struct(x AS type_a, y AS type_b))))"))
    shared = (sets.select(pair.alias("p"))
              .groupBy("p.type_a", "p.type_b")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    sizes = (sets.select(F.explode("ts").alias("event_type"))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_users")))
    return (
        shared
        .join(F.broadcast(sizes.select(
            F.col("event_type").alias("type_a"),
            F.col("n_users").alias("n_users_a"))), "type_a")
        .join(F.broadcast(sizes.select(
            F.col("event_type").alias("type_b"),
            F.col("n_users").alias("n_users_b"))), "type_b")
        .select(
            "type_a", "type_b", "n_shared", "n_users_a", "n_users_b",
            (F.round(F.col("n_shared").cast("double")
                     / (F.col("n_users_a") + F.col("n_users_b")
                        - F.col("n_shared")).cast("double"), 4)
             + F.lit(0.0)).alias("jaccard"))
    )


def q_event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — "what does a user do NEXT after event X" (beyond
    reference — SURVEY.md §2 note; the event-analytics sibling of the
    bigram LM in text.py, which does the same estimator over token
    streams). Output is one row per observed (from_type, to_type)
    transition with its count and the conditional probability
    P(to | from), the matrix a product-analytics "next action" panel
    or a session-simulation model consumes.

    Scale shape: ONE user-keyed shuffle for the lead() window (the
    same exchange every sequence operator here rides), one (from, to)
    aggregate over a |event_types|² keyspace (tiny), and the
    normalizer is a sum() window over the ALREADY-AGGREGATED matrix —
    a per-from total via self-join would recompute the corpus-sized
    window subtree twice, while the window form re-shards only the
    |event_types|²-row result. At 100 TB the only corpus-sized move
    is the per-user sort.

    P is long/long division rounded to 4dp — both engines do exact
    IEEE division of exact integers then the same away-from-zero
    round, so the matrix is hash-identical (positive everywhere, so no
    -0.0 class either).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events
        .select(F.col("user_id"),
                F.col("event_type").alias("from_type"),
                F.lead("event_type").over(w).alias("to_type"))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_pairs")))
    n_from = F.sum("n_pairs").over(Window.partitionBy("from_type"))
    return pairs.select(
        "from_type", "to_type", "n_pairs",
        F.round(F.col("n_pairs") / n_from, 4).alias("pr"))


def q_session_paths(events: DataFrame,
                    gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Session path analysis — the "what do users actually DO in a
    visit" panel: sessionize by inactivity gap, serialize each
    session's events into an ordered `a>b>c` path string, count
    sessions per distinct path (beyond reference — SURVEY.md §2.10
    note; composes q_sessionize's gap rule with q_event_transitions'
    sequence view into whole-journey granularity).

    The gap rule is written from first principles on BOTH engines
    (lag → boundary flag → running sum) with fractional-second epoch
    arithmetic — `ts` carries real microseconds, so truncating
    unix_timestamp would move gap boundaries vs the oracle's epoch().
    Path order is (ts, event_id) — total, so the string is unique.

    Scale shape: sessionization is two same-key windows on ONE
    user_id Exchange; the (user, session) collapse reuses that
    partitioning (user_id ⊆ grouping key, no new shuffle — Spark's
    ClusteredDistribution accepts the subset partitioning); only the
    final path-count agg re-shards, keyed on the path string. Path
    strings stay session-sized; the heavy corpus never moves twice.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ won't cast to double directly; TIMESTAMP→DOUBLE gives
    # fractional epoch seconds (same UTC-session assumption every
    # unix_timestamp-on-NTZ query here already makes)
    sec = F.col("ts").cast("timestamp").cast("double")
    prev = F.lag("ts").over(w).cast("timestamp").cast("double")
    new_sess = F.when(
        prev.isNull() | ((sec - prev) > gap_sec), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    paths = (
        events
        .select("user_id", "ts", "event_id", "event_type",
                sess.alias("sess"))
        .groupBy("user_id", "sess")
        .agg(F.array_sort(F.collect_list(
            F.struct("ts", "event_id", "event_type"))).alias("evs"))
        .select(
            F.concat_ws(
                ">", F.expr("transform(evs, x -> x.event_type)"))
            .alias("path"),
            F.size("evs").alias("path_len")))
    return paths.groupBy("path", "path_len").agg(
        F.count(F.lit(1)).alias("n_sessions"))


AB_Z_CRITICAL = 1.96  # two-sided 95%


def q_ab_test(events: DataFrame) -> DataFrame:
    """Welch two-sample z-test on mean event value, arms assigned by
    user-id parity (the deterministic stand-in for a bucketing
    column) — the one-row readout an experimentation dashboard shows:
    per-arm event counts, mean values, the z statistic, and the 95%
    verdict (beyond reference — SURVEY.md §2 note). The metric is a
    continuous per-event value rather than a conversion flag because
    on this corpus every user fires every event type, which makes a
    proportion test degenerate (pooled p = 1 -> se = 0 -> NaN).

    Determinism: values enter as integer cents (HALF_UP), so the
    per-arm (n, sum, sum-of-squares) triples are EXACT integers at any
    partitioning; the z formula is written with identical association
    over CAST-to-double sums on both engines. Rounded outputs are
    positive (means) or oracle-normalized `+ 0.0` (z, which can round
    to DuckDB's signed zero — the round-5 q_anomaly lesson).

    Scale shape: ONE scalar aggregate (map-side partials collapse each
    partition to six numbers) — O(1) output at any corpus size; the
    user-parity arm needs no per-user collapse at all.
    """
    arm = (F.col("user_id") % 2 == 1).cast("int")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    g = events.agg(
        F.sum(1 - arm).alias("n_a"),
        F.sum(arm).alias("n_b"),
        F.sum((1 - arm) * cents).alias("s_a"),
        F.sum(arm * cents).alias("s_b"),
        F.sum((1 - arm) * cents * cents).alias("ss_a"),
        F.sum(arm * cents * cents).alias("ss_b"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = lambda x: d(f"s_{x}") / d(f"n_{x}")  # noqa: E731
    # sample variance via the exact-sums identity, then Welch SE
    var = lambda x: (d(f"n_{x}") * d(f"ss_{x}")  # noqa: E731
                     - d(f"s_{x}") * d(f"s_{x}"))         / (d(f"n_{x}") * (d(f"n_{x}") - 1))
    se = F.sqrt(var("a") / d("n_a") + var("b") / d("n_b"))
    z = F.round((mean("b") - mean("a")) / se, 4)
    return g.select(
        "n_a", "n_b",
        F.round(mean("a") / 100, 4).alias("mean_a"),
        F.round(mean("b") / 100, 4).alias("mean_b"),
        z.alias("z_score"),
        (F.abs(z) >= AB_Z_CRITICAL).alias("significant"))


ATTRIBUTION_LOOKBACK_SEC = 7 * 24 * 3600  # touch older than this -> direct


def q_attribution(events: DataFrame,
                  lookback_s: int = ATTRIBUTION_LOOKBACK_SEC) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent click/view STRICTLY before it (total order
    (ts, event_id), so a same-timestamp touch still attributes
    deterministically); purchases with no touch inside the 7-day
    lookback credit the synthetic 'direct' channel. Per channel:
    conversions and attributed revenue (beyond reference — SURVEY.md §2
    note; the serving layer logs recommendations and purchases but
    never joins them, prototype/controller.py:293 analogue).

    Shape: the classic asof-join specialization — one user-keyed window
    carries (touch ts, touch type) forward via ``last(..,
    ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING..1 PRECEDING, so
    touch and conversion meet WITHOUT a self-join; both carried columns
    ride the same frame, so they always come from the same touch row.
    Revenue stays integer cents until the final division.

    Scale shape: ONE user_id exchange (the same layout every event-
    analytics query here keys on) + the O(|channels|) final agg.
    """
    is_touch = F.col("event_type").isin("click", "view")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    touch_ts = F.last(F.when(is_touch, F.col("ts")),
                      ignorenulls=True).over(w)
    touch_type = F.last(F.when(is_touch, F.col("event_type")),
                        ignorenulls=True).over(w)
    conv = (
        events
        .withColumn("_tts", touch_ts)
        .withColumn("_ttype", touch_type)
        .where(F.col("event_type") == "purchase")
        .select(
            # microsecond-exact boundary: unix_micros ≡ DuckDB epoch_us
            # (unix_timestamp would floor to seconds and disagree with
            # the oracle's fractional epoch near the lookback edge);
            # ts arrives TIMESTAMP_NTZ — the cast shifts both ends by
            # the same session-tz offset, so the difference is exact
            F.when(
                F.col("_tts").isNull()
                | ((F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("_tts").cast("timestamp")))
                   > lookback_s * 1_000_000),
                F.lit("direct")).otherwise(F.col("_ttype"))
            .alias("channel"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"))
    )
    return conv.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        (F.sum("c").cast("double") / 100.0).alias("revenue"))


SEASONAL_LAG_DAYS = 7   # day-of-week seasonality


def q_seasonal_naive(events: DataFrame,
                     lag_days: int = SEASONAL_LAG_DAYS) -> DataFrame:
    """Seasonal-naive forecast backtest over the daily event-count
    series: each day's forecast is the count ``lag_days`` earlier
    (the day-of-week baseline every real forecaster must beat), scored
    with its absolute percentage error — the capacity-planning sanity
    series (beyond reference; shares q_changepoint's collapsed-series
    cost class).

    Exactness: actual and forecast are integer counts; APE is one
    integer-ratio division, identically rounded (4dp) — no float
    accumulates. Days without a lag-predecessor (the first week, and
    any gap day whose lag lands on a no-event day) are absent, same
    convention both engines.

    Scale shape: ONE keyed aggregate collapses the corpus to |days|
    rows; the lag lookup is a |days|-row self-join on a derived key —
    bounded work at any corpus size, no window sort over raw events.
    """
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("actual"))
    fc = daily.select(
        F.date_add("d", lag_days).alias("d"),
        F.col("actual").alias("forecast"))
    return (
        daily.join(fc, "d")
        .select(
            "d", "actual", "forecast",
            (F.round(F.abs(F.col("actual") - F.col("forecast"))
                     .cast("double") / F.col("actual").cast("double"),
                     4) + F.lit(0.0)).alias("ape"))
    )


def q_changepoint(events: DataFrame) -> DataFrame:
    """Mean-shift change-point scan (binary-segmentation statistic)
    over the daily event-count series: the day t maximizing the scaled
    CUSUM |S_t| = |T·C_t − t·N| (C_t = events through day t, N = total,
    T = days — S_t is T·t·(mean_≤t − mean_all), the unnormalized CUSUM
    numerator kept in EXACT integers so the argmax is engine-exact with
    no float merge-order sensitivity). Output: the full daily series
    with its statistic plus the flagged change day (earliest wins ties;
    the final day, where S ≡ 0 by construction, is excluded from the
    argmax).

    Scale shape: the corpus collapses to |days| rows in one keyed agg;
    every window after that (cumsum, totals, argmax rank) runs over the
    collapsed series in a single bounded task — same contract as
    q_skyline's frontier scan and q_cumulative_users' prefix window.
    """
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events"))
    w_cum = (Window.orderBy("d")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = (Window.orderBy("d")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    t = F.row_number().over(Window.orderBy("d"))
    # tn/td (not t/T): case-insensitive resolution on either engine
    # would collide the two names
    series = daily.select(
        "d", "n_events",
        F.sum("n_events").over(w_cum).alias("cum_events"),
        t.alias("tn"),
        F.count(F.lit(1)).over(w_all).alias("td"),
        F.sum("n_events").over(w_all).alias("nn"))
    s = (F.col("td") * F.col("cum_events")
         - F.col("tn") * F.col("nn")).cast("long")
    scored = series.select(
        "d", "n_events",
        F.col("cum_events").cast("long").alias("cum_events"),
        s.alias("cusum_scaled"),
        # final day ranks last (S_T = 0 identically, not a candidate)
        F.when(F.col("tn") == F.col("td"), F.lit(-1))
        .otherwise(F.abs(s)).alias("_key"))
    rk = F.row_number().over(
        Window.orderBy(F.desc("_key"), F.asc("d")))
    return (scored.withColumn("is_change", rk == 1)
            .select("d", "n_events", "cum_events", "cusum_scaled",
                    "is_change"))


def q_rolling_percentiles(events: DataFrame,
                          window_days: int = ACTIVE_WINDOW_DAYS
                          ) -> DataFrame:
    """Trailing 7-day p50/p95 of event value per day — the latency/
    spend SLO dashboard series (beyond reference; the quantile member
    of the trailing-window family: q_active_users covers sliding
    DISTINCT, q_rolling_window per-event RANGE sums).

    Sliding percentiles are a worse scale trap than sliding DISTINCT:
    no algebraic decomposition exists at all, so a RANGE-frame window
    re-sorts ``window_days`` of raw events per day and per partition.
    The scale form reuses the q_active_users CONTRIBUTION-EXPANSION
    trick with a HISTOGRAM twist: collapse raw rows to per-day value
    histograms first (one day-keyed aggregate — value is cents-grain,
    so |distinct values| is bounded, ~49k cells max here), expand each
    histogram row to the ≤``window_days`` window-end days it serves,
    and finish with ONE weighted exact percentile per day (Spark
    ``percentile``'s frequency argument ≡ quantile over the expanded
    multiset). Expansion cost is window × |histogram cells|, never
    window × raw rows — at 100 TB the histogram is what grows with
    data VARIETY, not data VOLUME. Horizon days beyond the data are
    clipped by the broadcast observed-day join, same as q_active_users.

    Representation: percentiles are computed and EMITTED in integer
    cents, with EXACT integer-rational interpolation (the
    q_interpolate / q_twap / q_kmeans posture). Float quantile
    kernels are a midpoint hazard beyond f=0.5: the linear method's
    fraction f = frac(p·(n−1)) can be any multiple of 0.05 for
    p=0.95, and over integer cents many of those land on an exact
    .5 result (e.g. window [0, 23, 238]: p95 = 23 + 0.9·215 =
    216.5 exactly) where Spark's (1−f)·a + f·b evaluation order
    rounds HALF_UP to 217 while the a + f·(b−a) order (numpy,
    DuckDB quantile_cont) computes 216.49999999999997 → 216. So no
    float path at all: both bracketing order statistics are picked
    by cumulative-count bracketing over the sorted histogram, the
    interpolated value is the rational
    (lo·(den−rem) + hi·rem) / den with i = ⌊p_num·(n−1)/p_den⌋,
    rem = p_num·(n−1) mod p_den, and the whole-cents HALF_UP round
    is the integer identity floor((2·num + den)/(2·den)) — the
    DuckDB oracle mirrors the identical integer arithmetic, so
    agreement is by construction, not by the data avoiding
    knife-edge windows (tests/test_properties.py pins the f=0.9
    counterexample class with Hypothesis).
    """
    day = F.to_date("ts")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    hist = (events.groupBy(day.alias("day"), cents.alias("c"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    days = hist.select("day").distinct()
    votes = (hist.select(
        "c", "cnt",
        F.explode(F.expr(f"sequence(0, {window_days - 1})")).alias("off"),
        "day")
        .select("c", "cnt",
                F.expr("date_add(day, off)").alias("day")))
    # window-collapsed histogram: one row per (day, c); cum/prev give
    # each cell's 0-indexed rank span [prev, cum) in the sorted
    # trailing-window multiset, n the multiset size. repartition by
    # day ONLY: HashPartitioning(day) satisfies the (day, c) agg's
    # ClusteredDistribution (subset rule) AND the day-keyed windows
    # AND the final day groupBy, so the whole tail rides ONE Exchange
    merged = (votes.join(F.broadcast(days), "day")
              .repartition("day")
              .groupBy("day", "c").agg(F.sum("cnt").alias("cnt")))
    w_cum = (Window.partitionBy("day").orderBy("c")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy("day")
    ranked = merged.select(
        "day", "c", "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"))

    # F.floor(long / long) routes through IEEE double division, which
    # is still EXACT here: operands are exact integers < 2^53, the
    # quotient is correctly rounded, and the nearest floor boundary is
    # either hit exactly (den | num → exact representable integer) or
    # ≥ 1/(2·den) = 1/40 away — 10 orders of magnitude beyond the ulp
    # at any realistic window population (< 2^46 events/cents).

    def order_stat(rank):
        """value at 0-indexed `rank` = the cell whose span covers it"""
        prev = F.col("cum") - F.col("cnt")
        return F.max(F.when((prev <= rank) & (F.col("cum") > rank),
                            F.col("c")))

    def brackets(p_num, p_den, tag):
        i = F.floor((F.lit(p_num) * (F.col("n") - 1)) / F.lit(p_den))
        return [order_stat(i).alias(f"lo{tag}"),
                order_stat(i + 1).alias(f"hi{tag}")]

    def half_up(p_num, p_den, tag):
        rem = F.pmod(F.lit(p_num) * (F.col("n") - 1), F.lit(p_den))
        num = (F.col(f"lo{tag}") * (F.lit(p_den) - rem)
               + F.coalesce(F.col(f"hi{tag}"), F.col(f"lo{tag}")) * rem)
        return F.floor((2 * num + p_den) / F.lit(2 * p_den)).cast("long")

    return (ranked.groupBy("day")
            .agg(F.max("n").alias("n"),
                 *brackets(1, 2, "50"), *brackets(19, 20, "95"))
            .select("day",
                    half_up(1, 2, "50").alias("p50_cents"),
                    half_up(19, 20, "95").alias("p95_cents"),
                    F.col("n").cast("long").alias("n_events")))


def q_interpolate(events: DataFrame) -> DataFrame:
    """Per-user hourly series with LINEAR interpolation across silent
    hours — the imputation step after q_resample's gap fill: resample
    marks gaps and zero-fills; models that treat the series as a
    continuous signal (forecasting, drift) want the straight line
    between the surrounding observations instead.

    Exact-integer discipline (the q_twap/q_kmeans posture): hourly
    totals become cents, the interpolated value is the rational
    (prev·(t1−t) + next·(t−t0)) / (t1−t0) evaluated with integer
    cents×hour weights and HALF_UP-rounded via the integer identity
    floor((2·num + den) / (2·den)) — no float accumulation anywhere,
    so the result is engine-exact by construction, not by luck.

    Scale shape: one (user, hour) aggregate, one user-keyed lead()
    window over the OBSERVED rows only, then every grid row — observed
    or gap — emits from a row-local sequence explode between each
    observation and its successor. The dense grid is never joined or
    window-scanned (a first formulation materialized the spine and ran
    two IGNORE-NULLS windows across it: 119.4 s at the 100x events
    corpus vs 8.1 s for this shape, and 13.2 s -> 1.6 s warm at sf0.1
    — the dense grid is OUTPUT, so the only per-grid-row work the plan
    may do is the projection itself). Span explosion is
    the same documented knob as q_resample: output rows per user =
    active-span hours.
    """
    hours = (events
             .select("user_id", F.date_trunc("hour", "ts").alias("h"),
                     "value")
             .groupBy("user_id", "h")
             .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                  .alias("cents")))
    w = Window.partitionBy("user_id").orderBy("h")
    led = hours.select(
        "user_id", "cents", "h",
        F.unix_timestamp("h").alias("t0"),
        F.lead("cents").over(w).alias("nc"),
        F.lead("h").over(w).alias("nh"))
    seq = led.select(
        "user_id", "cents", "t0", "nc",
        F.unix_timestamp("nh").alias("t1"),
        # [h, next_h) hourly for interior observations; [h, h] for the
        # last — every grid hour emits from exactly one observed row
        F.explode(F.sequence(
            "h",
            F.coalesce(F.col("nh") - F.expr("INTERVAL 1 HOUR"), "h"),
            F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    t = F.unix_timestamp("hour")
    num = (F.col("cents") * (F.col("t1") - t)
           + F.col("nc") * (t - F.col("t0")))
    den = F.col("t1") - F.col("t0")
    interp = F.floor((2 * num + den) / (2 * den)).cast("long")
    is_gap = t > F.col("t0")
    cents_out = F.when(is_gap, interp).otherwise(F.col("cents"))
    return seq.select(
        "user_id", "hour",
        F.round(cents_out / 100.0, 2).alias("value"),
        is_gap.alias("interpolated"))


AUTOCORR_MIN_PAIRS = 10  # fewer consecutive pairs -> no stable estimate


def q_autocorr(events: DataFrame,
               min_pairs: int = AUTOCORR_MIN_PAIRS) -> DataFrame:
    """Per-user lag-1 autocorrelation of the spend series — the
    time-series feature that separates bursty spenders from steady
    ones (beyond reference; a staple input to churn/LTV models).

    Pearson r over consecutive pairs (y_t, y_{t+1}) in (ts, event_id)
    order — the unique event_id breaks timestamp ties so the pairing
    is deterministic across engines. Like q_trend, the estimator is an
    ALGEBRAIC aggregate: six exact-int64 sums over integer cents
    (n, Σy, Σz, Σyz, Σy², Σz²), fully map-side-combinable, then ONE
    float expression — num / (√da · √db) — evaluated with the same
    shape on both engines (IEEE sqrt/mul/div are correctly rounded, so
    the doubles agree bit-for-bit) and rounded once.

    Scale shape: ONE user-keyed Exchange total — the lead() window and
    the groupBy share the user_id partitioning, so Catalyst reuses the
    shuffle. Overflow bound: n·Σyz ≤ n²·max_cents² needs n·max_cents
    < 3·10⁹ per user (10⁵ events of $300 each); beyond that, scale
    cents to dollars first.
    """
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", cents.alias("y"))
        .select("user_id", "y", F.lead("y").over(w).alias("z"))
        .where(F.col("z").isNotNull())
    )
    s = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"))
    num = F.col("n") * F.col("syz") - F.col("sy") * F.col("sz")
    da = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    db = F.col("n") * F.col("szz") - F.col("sz") * F.col("sz")
    r = num.cast("double") / (F.sqrt(da.cast("double"))
                              * F.sqrt(db.cast("double")))
    return (
        s.where((F.col("n") >= min_pairs) & (da > 0) & (db > 0))
        .select("user_id", F.col("n").alias("n_pairs"),
                (F.round(r, 4) + F.lit(0.0)).alias("lag1_autocorr"))
    )


EWMA_ALPHA = 0.3  # smoothing factor
EWMA_TAPS = 8     # FIR truncation: (1-α)^8 ≈ 5.8% residual mass


def ewma_weights(alpha: float = EWMA_ALPHA,
                 taps: int = EWMA_TAPS) -> list[float]:
    """Normalized truncated-EWMA tap weights α(1−α)^j / Σ, computed
    once in Python so the Spark build and the SQL oracle interpolate
    the IDENTICAL double literals (repr round-trips exactly)."""
    raw = [alpha * (1 - alpha) ** j for j in range(taps)]
    tot = sum(raw)
    return [x / tot for x in raw]


def q_ewma(events: DataFrame, alpha: float = EWMA_ALPHA,
           taps: int = EWMA_TAPS) -> DataFrame:
    """Truncated-FIR EWMA smoothing of the per-type daily event-count
    series (beyond reference — the denoising step before q_changepoint
    / q_seasonal_naive style downstream analysis).

    The textbook EWMA is a recurrence (not SQL-expressible without
    per-row iteration); the standard scalable form truncates it to a
    ``taps``-tap FIR filter — here 8 taps keep >94% of the weight mass,
    renormalized to sum to 1. Each output row is Σ w_j·count_{t−j}
    over the OBSERVED row sequence (smooth after any gap-fill, same
    order as pandas ewm on a resampled frame); rows whose trailing
    window is incomplete (first taps−1 per series) are dropped rather
    than renormalized, so every emitted value uses the full kernel.

    Determinism across engines: counts are exact-int doubles, the tap
    weights are shared literals, and the dot product is written as the
    same left-associated chain on both sides, so the IEEE result is
    bit-identical before the final shared rounding.

    Scale shape: one (event_type, day) count aggregate, then ONE
    event_type-keyed window sort serving all ``taps`` lag() calls —
    two Exchanges total, no self-join against shifted copies.
    """
    daily = (
        events.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    acc = None
    for j, wt in enumerate(ewma_weights(alpha, taps)):
        term = F.lag("n_events", j).over(w).cast("double") * F.lit(wt)
        acc = term if acc is None else acc + term
    return (
        daily.select("event_type", "day", "n_events",
                     (F.round(acc, 4) + F.lit(0.0)).alias("ewma"))
        .where(F.col("ewma").isNotNull())
    )
