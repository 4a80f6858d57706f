"""Stream-stream joins — watermark-bounded interval joins.

Beyond the reference (it has no streaming joins): the streaming
analogue of ``operators.temporal.q_range_join`` — attribute each view
event to purchases of the same user within the preceding 30 minutes,
with BOTH sides arriving as streams.

State management at scale: a stream-stream inner join buffers rows
until the watermark proves no more matches can arrive. The time-bound
condition (`v.ts` within [p.ts, p.ts + 30 min)) plus the watermark lets
Spark evict: purchase state is dropped once watermark > p.ts + 30 min,
view state once watermark > v.ts. State is therefore
O(events within the watermark horizon), not O(stream history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "30 minutes"
WATERMARK = "1 hour"


def split_typed_streams(stream: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One event stream → (views, purchases) — the two join sides."""
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    return views, purchases


def attribution_join(views: DataFrame, purchases: DataFrame,
                     window: str = ATTRIBUTION_WINDOW,
                     watermark: str = WATERMARK) -> DataFrame:
    """Views attributed to the same user's purchase within the window —
    identical semantics to the batch ``q_range_join`` ([p.ts, p.ts +
    window) half-open interval), joinable stream-to-stream because the
    range condition bounds state eviction on both sides."""
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") >= F.col("p_ts"))
        & (F.col("v_ts") < F.col("p_ts") + F.expr(f"INTERVAL {window}"))
    )
    return v.join(p, cond, "inner").select(
        F.col("view_id").alias("event_id"),
        F.col("v_user").alias("user_id"),
        F.col("v_ts").alias("ts"),
        "purchase_id",
        F.col("p_ts").alias("win_start"),
    )


def q_stream_join_et(events: DataFrame) -> DataFrame:
    """The stream-stream interval join as a DECLARED, oracle-backed
    query: the events table replays as two deliberately out-of-order
    arrival batches (even event_ids then odd — so a view can arrive
    BEFORE or AFTER its matching purchase, and each side's state must
    hold for the other), attribution runs through the watermarked
    stream-stream join, and the per-row output must hash-match batch
    ``q_range_join``'s DuckDB oracle exactly.

    Inner stream-stream joins emit every match regardless of arrival
    order — the watermark bounds STATE EVICTION, not emission — so
    batch parity holds for ANY arrival order within the lateness
    bound; the bound is DERIVED from the input's observed span
    (replay.derive_lateness — fixture-independent, ADVICE r6), same
    contract as q_anomaly_stream_et. At production scale the bound is
    the state-size dial: state is O(events inside the horizon), and
    this query is the driver-verified proof the eviction bound does
    not change the answer.
    """
    from movie_rec_spark.streaming.replay import (
        derive_lateness,
        replay_file_stream,
    )

    schema = ("event_id bigint, user_id bigint, ts timestamp, "
              "event_type string")
    ev = events.select("event_id", "user_id", "ts", "event_type")
    wm_days, _ = derive_lateness(events)
    batches = [
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    ]

    def build(stream: DataFrame) -> DataFrame:
        views, purchases = split_typed_streams(stream)
        return attribution_join(views, purchases,
                                watermark=f"{wm_days} days")

    return replay_file_stream(batches, schema, build,
                              prefix="mrs_sj_et_")
