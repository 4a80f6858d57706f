"""KV sink — pipelined batch writes (SURVEY.md §2.1 S9-S11).

The reference materializes recs/stats into Redis with pipelined SETs in
chunks of REDIS_CHUNK_SIZE=1000 (estimator.py:81-102, statistics.py:39-60,
web/config.py:21). The Spark-native equivalent is a partitioned table
write; for true KV parity this module ships rows via ``foreachPartition``
with client-side batching — one client per PARTITION, one flush per
``batch_size`` keys, never a driver-side collect.

The client is pluggable (``client_factory``); tests use
``FileKVClient`` (one file per partition under a directory — same
interface shape as a Redis pipeline: set / flush / close).
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BATCH_SIZE = 1000  # reference REDIS_CHUNK_SIZE (web/config.py:21)


class FileKVClient:
    """File-backed stand-in for a Redis pipeline (tests/local runs)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self._buf: list[tuple[str, str]] = []
        self._path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.kv")

    def set(self, key: str, value: str) -> None:
        self._buf.append((key, value))

    def flush(self) -> None:
        if not self._buf:
            return
        with open(self._path, "a", encoding="utf-8") as f:
            for k, v in self._buf:
                f.write(f"{k}\t{v}\n")
        self._buf.clear()

    def close(self) -> None:
        self.flush()


def write_kv(df: DataFrame, key_col: str, value_col: str,
             client_factory: Callable[[], object],
             batch_size: int = BATCH_SIZE) -> None:
    """S9/S10: ship (key, value) rows to a KV store, batched per
    partition. Executor-side only — the driver never sees the data."""
    rows = df.select(F.col(key_col).alias("k"), F.col(value_col).alias("v"))

    def per_partition(it):
        client = client_factory()
        n = 0
        try:
            for row in it:
                client.set(str(row.k), str(row.v))
                n += 1
                if n % batch_size == 0:
                    client.flush()
        finally:
            client.close()

    rows.foreachPartition(per_partition)


def encode_rec_list(recs: DataFrame, n: int = 20) -> DataFrame:
    """S9 value encoding: per-user ';'-joined item list ordered by rank
    (estimator.py:89-91: ``u{uid} → "id;id;..."``) — F5 concat_ws over a
    rank-sorted collect_list."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("rank"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        recs.filter(F.col("rank") <= n)
        .withColumn("ids", F.collect_list(F.col("item_id").cast("string")).over(w))
        .groupBy("user_id")
        .agg(F.first("ids").alias("ids"))
        .select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("key"),
            F.concat_ws(";", "ids").alias("value"),
        )
    )


def decode_rec_list(kv: DataFrame) -> DataFrame:
    """S11/F4 decode: ``"id;id;..."`` → array<int> rows
    (controller.py:224)."""
    return kv.select(
        F.regexp_replace("key", "^u", "").cast("bigint").alias("user_id"),
        F.split("value", ";").cast("array<int>").alias("item_ids"),
    )
