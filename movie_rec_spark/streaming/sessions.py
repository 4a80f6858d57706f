"""Custom stateful streaming operator: gap-based sessionization.

Two implementations of the same semantics as the batch
``operators.temporal.q_sessionize`` (session = run of one user's events
with consecutive gaps <= 30 min; a gap strictly over the threshold
splits, matching ``session_window``):

1. ``session_windows_stream`` — declarative: ``session_window`` +
   watermark. Spark's native session aggregation; state merge/cleanup
   is the engine's job. Prefer this at any scale.
2. ``stateful_sessions`` — ``applyInPandasWithState``: the template for
   operators Spark has NO built-in for (the custom-stateful path the
   engine exposes). Per-user GroupState holds the open session
   (start/last/count/sum); a closed session is emitted as soon as a
   later event proves the gap, and event-time timeout flushes sessions
   the stream never extends.

State sizing at 100 TB: one open-session row per active user; the
watermark/timeout bounds it to users active within the horizon —
identical asymptotics to the built-in session_window state store.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from movie_rec_spark.localdf import local_df

SESSION_GAP = "30 minutes"
GAP_US = 30 * 60 * 1_000_000  # microseconds

SESSION_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

# open session: (start_us, last_us, n_events, total_value)
SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def session_windows_stream(stream: DataFrame,
                           gap: str = SESSION_GAP,
                           watermark: str = "1 hour") -> DataFrame:
    """Declarative path: watermarked session-window aggregation.
    Append mode emits a session once the watermark passes its close."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end",
                "n_events", "total_value")
    )


def _sessionize_group(key: tuple, pdfs: Iterable[pd.DataFrame],
                      state: Any) -> Iterator[pd.DataFrame]:
    """Walk one user's micro-batch events in ts order, carrying the open
    session in GroupState; yield sessions closed by an observed gap."""
    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, tot = state.get
            state.remove()
            yield _emit(user_id, start_us, last_us, n, tot)
        return

    events = pd.concat(list(pdfs), ignore_index=True)
    events = events.sort_values("ts", kind="mergesort")
    ts_us = events["ts"].astype("int64")  # ns -> int64 ns; convert below
    ts_us = ts_us // 1000  # microseconds
    vals = events["value"].fillna(0.0)

    if state.exists:
        start_us, last_us, n, tot = state.get
    else:
        start_us, last_us, n, tot = None, None, 0, 0.0

    closed: list[tuple] = []
    for t, v in zip(ts_us, vals):
        t = int(t)
        if start_us is None:
            start_us, last_us, n, tot = t, t, 1, float(v)
        elif t - last_us <= GAP_US:  # gap == 30 min merges (session_window parity)
            last_us, n, tot = t, n + 1, tot + float(v)
        else:
            closed.append((user_id, start_us, last_us, n, tot))
            start_us, last_us, n, tot = t, t, 1, float(v)

    state.update((start_us, last_us, n, tot))
    # flush if the stream goes quiet past the gap (event-time timeout)
    state.setTimeoutTimestamp(last_us // 1000 + GAP_US // 1000)

    for row in closed:
        yield _emit(*row)


def _emit(user_id: int, start_us: int, last_us: int, n: int,
          tot: float) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": [user_id],
        "session_start": [pd.Timestamp(start_us, unit="us")],
        "session_end": [pd.Timestamp(last_us, unit="us")],
        "n_events": [n],
        "total_value": [round(tot, 2)],
    })


def stateful_sessions(stream: DataFrame,
                      watermark: str = "1 hour") -> DataFrame:
    """Custom-stateful path: one GroupState row per user. Emits each
    session when a later event closes it, or when event-time timeout
    (watermark past last event + gap) flushes it."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def q_sessionize_stream(events: DataFrame) -> DataFrame:
    """The native session_window aggregation as a DECLARED, oracle-backed
    replay: the events table arrives as a file stream in two
    deliberately OUT-OF-ORDER batches (even event_ids, then odd — every
    user's odd-id events land after younger even-id ones), sessionized
    by ``session_windows_stream`` under a lateness bound covering the
    corpus span, and the emitted sessions must hash-match batch
    q_sessionize's DuckDB oracle exactly. A far-future sentinel row
    advances the global watermark past every session close + gap, so
    append mode finalizes and emits ALL sessions — the engine's late
    session-window merge is what's under test: any arrival order within
    the bound reproduces the batch answer.

    The lateness bound and the sentinel are DERIVED from the input's
    observed [min(ts), max(ts)] span (one tiny agg before the replay,
    the cost of fixture independence): the watermark delay must exceed
    the full span (batch 2 can be span-late relative to batch 1's
    max), and the sentinel must sit past max(ts) + gap + delay so the
    final watermark closes every session. Hardcoded literals here
    ('45 days', a 2024-06-01 sentinel) would silently late-drop events
    if the fixture were regenerated with a longer span or a different
    epoch.
    """
    from movie_rec_spark.streaming.replay import (
        derive_lateness,
        replay_file_stream,
    )

    spark = events.sparkSession
    schema = ("event_id bigint, user_id bigint, ts timestamp, "
              "value double")
    ev = events.select("event_id", "user_id", "ts", "value")
    wm_days, sentinel = derive_lateness(events)
    batches = [
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        local_df(spark, [(-1, -1, sentinel, 0.0)], schema),
    ]
    out = replay_file_stream(
        batches, schema,
        lambda s: session_windows_stream(
            s.select("user_id", "ts", "value"),
            watermark=f"{wm_days} days"),
        prefix="mrs_sess_et_")
    return out.filter(F.col("user_id") >= 0)
