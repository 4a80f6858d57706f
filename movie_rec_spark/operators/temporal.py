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

    Snapshots are pre-deduped to one row per (key, snap_ts) —
    deterministic winner (max of value_cols tuple) — because ties would
    otherwise be engine-dependent.
    """
    w_dedupe = Window.partitionBy(key, snap_ts).orderBy(
        *[F.desc(c) for c in value_cols])
    snap = (
        snapshots.withColumn("_rn", F.row_number().over(w_dedupe))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    s = snap.select(
        F.col(key).alias("_k"),
        F.col(snap_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_event_id"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    e = events.select(
        F.col(key).alias("_k"),
        F.col(event_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col("event_id").alias("_event_id"),
        *[F.lit(None).cast(dict(snap.dtypes)[c]).alias(f"_v_{c}")
          for c in value_cols],
    )
    # snapshots sort before events at the same timestamp -> inclusive.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = e.unionByName(s).select(
        "_k", "_ts", "_side", "_event_id",
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_v_{c}")
          for c in value_cols],
    )
    return filled.filter(F.col("_side") == 1).select(
        F.col("_event_id").alias("event_id"),
        F.col("_k").alias(key),
        F.col("_ts").alias(event_ts),
        *[F.col(f"_v_{c}").alias(c) for c in value_cols],
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