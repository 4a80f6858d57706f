"""Streaming frequent-items sketch — the online twin of
``operators.skew.q_heavy_hitters``.

The batch operator runs two passes (Misra-Gries candidates, exact
recount); a stream cannot rescan history for the second pass, so the
online form maintains the SKETCH as keyed state and exposes its
deterministic error bound instead: each emitted candidate carries its
summary estimate ``est`` and its shard's total ``n_shard``, and the MG
guarantee pins the true count into
``[est, est + n_shard // (capacity + 1)]``.

Sharding makes the guarantee STRONGER than the batch union argument:
``user_id % n_shards`` routes every occurrence of a key to one shard,
so a key with global count > n/capacity has count_s = count >
n_s/capacity in its own shard and must survive that shard's summary —
the candidate union over shards is complete for the global threshold.
State per shard is exactly ``capacity`` counters + one total — bytes,
not rows — so state size is O(shards · capacity) forever, independent
of stream length: the whole point of sketching the stream instead of
counting it.

Each micro-batch folds its per-shard ``value_counts`` into the state
(one counter update per DISTINCT key per batch — the same Arrow-batched
kernel as the batch sketch, ``skew.mg_fold``) and emits the shard's
current candidates in update mode; ``n_shard`` is monotone, so a
consumer (and the parity test) takes each shard's max-``n_shard``
generation as the live view.

Completeness is pytest-gated against batch ``q_heavy_hitters`` on the
union of the micro-batches (test_streaming): final candidates ⊇ exact
heavy hitters, with every estimate inside the MG bound.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from movie_rec_spark.operators.skew import HH_CAPACITY, mg_fold

HH_SHARDS = 8

SKETCH_STATE = StructType([
    StructField("items", ArrayType(LongType())),
    StructField("counts", ArrayType(LongType())),
    StructField("n", LongType()),
])

SKETCH_OUTPUT = StructType([
    StructField("shard", LongType()),
    StructField("user_id", LongType()),
    StructField("est", LongType()),
    StructField("n_shard", LongType()),
])


def _make_update(capacity: int):
    def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: Any) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            items, counts, n = state.get
            counters = dict(zip(items, counts))
            n = int(n)
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            vc = pdf["user_id"].dropna().value_counts()
            mg_fold(counters, vc.items(), capacity)
            n += int(vc.sum())
        state.update((list(counters), list(counters.values()), n))
        if counters:
            yield pd.DataFrame({
                "shard": [int(shard)] * len(counters),
                "user_id": list(counters),
                "est": list(counters.values()),
                "n_shard": [n] * len(counters),
            })

    return _update


def heavy_hitters_stream(stream: DataFrame,
                         capacity: int = HH_CAPACITY,
                         n_shards: int = HH_SHARDS) -> DataFrame:
    """Maintain per-shard Misra-Gries summaries over a user_id stream;
    emits each shard's current candidate set per micro-batch with the
    estimate and shard total that bound the true count."""
    return (
        stream.select(
            (F.col("user_id") % n_shards).alias("shard"), "user_id")
        .groupBy("shard")
        .applyInPandasWithState(
            _make_update(capacity),
            outputStructType=SKETCH_OUTPUT,
            stateStructType=SKETCH_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def q_heavy_hitters_stream(events: DataFrame,
                           capacity: int = HH_CAPACITY,
                           n_shards: int = HH_SHARDS) -> DataFrame:
    """The streaming sketch as a DECLARED, oracle-backed query — made
    possible by the completeness guarantee, not in spite of the
    sketch's approximation: events replay in two out-of-order batches
    through the stateful per-shard Misra-Gries sketch, each shard's
    FINAL candidate generation (max monotone ``n_shard``) is recounted
    EXACTLY against the batch table, and the integer threshold
    ``count·capacity > n`` filters to the true frequent items.

    Why this hash-matches a plain GROUP-BY/HAVING oracle regardless of
    arrival order: every key with global count > n/capacity routes all
    its occurrences to one shard (count_s = count > n/capacity ≥
    n_s/capacity > n_s/(capacity+1)), so the MG undercount bound says
    it SURVIVES that shard's summary under any fold order; the exact
    recount then removes every false positive. Candidate set contents
    vary with arrival order — the post-recount answer provably cannot.
    Same two-pass shape as batch ``skew.q_heavy_hitters``, with the
    sketch pass running online in O(shards·capacity) state.
    """
    from pyspark.sql import Window

    from movie_rec_spark.streaming.replay import replay_file_stream

    schema = "event_id bigint, user_id bigint, ts timestamp"
    ev = events.select("event_id", "user_id", "ts")
    batches = [
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    ]
    emitted = replay_file_stream(
        batches, schema,
        lambda s: heavy_hitters_stream(s, capacity, n_shards),
        prefix="mrs_hh_", output_mode="update",
        # the sketch groups by shard: more partitions than shards buy
        # nothing, so floor exactly there
        state_parallelism=n_shards)
    w = Window.partitionBy("shard")
    final = (emitted
             .withColumn("_maxn", F.max("n_shard").over(w))
             .filter(F.col("n_shard") == F.col("_maxn"))
             .select("user_id").distinct())
    total = events.agg(F.count(F.lit(1)).alias("n"))
    counted = (events.join(F.broadcast(final), "user_id")
               .groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n_occurrences")))
    return (counted.join(F.broadcast(total))
            .where(F.col("n_occurrences") * capacity > F.col("n"))
            .select("user_id", "n_occurrences"))
