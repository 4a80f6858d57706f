"""CDC stream → lakehouse table: Structured Streaming foreachBatch
driving ``sources.merge.merge_into``.

This is the T-family composition the reference runs as row-at-a-time
ORM writes (controller.py:124,142-146,170: session.merge / delete per
request): a change stream lands as micro-batches, each batch is
collapsed latest-wins per key and MERGEd into the partitioned parquet
table — update/delete/insert in one statement, touching only the
partitions present in the batch.

Correctness under streaming's failure model:
- WITHIN a batch: ``upsert_latest`` collapse (newest ts wins, unique
  tiebreak) makes the merge input key-unique and deterministic.
- ACROSS batches / on REPLAY: the merge runs with ``ts_col``, so a
  replayed batch or late-arriving older version can never regress a row
  the table already advanced past (WHEN MATCHED AND s.ts >= t.ts).
  Re-merging identical rows is a no-op — idempotent by construction,
  which is exactly what foreachBatch's at-least-once contract requires.
- Deletes are CDC tombstones (``_deleted = true``); a tombstone is the
  newest version of its key, so the same ts guard orders it correctly.

The commit summaries go to a driver-side log list (observability hook;
production would emit them to the metrics sink): merge summaries are
O(1) per batch, never row data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_rec_spark.operators.mutation import upsert_latest
from movie_rec_spark.sources.merge import DELETED_COL, merge_into


def merge_batch(batch: DataFrame, target_path: str, keys: Sequence[str],
                partition_col: str, ts_col: str,
                tiebreak_col: str) -> dict:
    """One micro-batch of the CDC merge — module-level pure function of
    (batch, current table) so replay idempotency is directly testable
    (same pattern as ingest._ingest_apply). No isEmpty() pre-probe:
    merge_into's meta aggregate answers emptiness in the same job that
    gates key-uniqueness (r13 — one fewer driver-synced job per batch)."""
    collapsed = upsert_latest(batch, keys=keys, ts_col=ts_col,
                              tiebreak_col=tiebreak_col)
    return merge_into(batch.sparkSession, target_path, collapsed,
                      keys=keys, partition_col=partition_col,
                      ts_col=ts_col)


def merge_stream(spark: SparkSession, stream: DataFrame, target_path: str,
                 checkpoint_dir: str, keys: Sequence[str],
                 partition_col: str, ts_col: str = "ts",
                 tiebreak_col: str = "event_id") -> list[dict]:
    """Drive the CDC stream into the table with availableNow; returns
    the per-batch commit summaries. ``stream`` rows carry the target
    schema plus optional ``_deleted`` tombstone flags."""
    log: list[dict] = []

    def apply(batch: DataFrame, batch_id: int) -> None:
        summary = merge_batch(batch, target_path, keys, partition_col,
                              ts_col, tiebreak_col)
        log.append({"batch_id": batch_id, **summary})

    q = (stream.writeStream.foreachBatch(apply)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return log


def merge_batch_snapshot(batch: DataFrame, table_path: str,
                         keys: Sequence[str], ts_col: str,
                         tiebreak_col: str, batch_id: int) -> dict:
    """One micro-batch committed to the MANIFEST table with TRUE
    exactly-once semantics: the snapshot's ``last_stream_batch_id``
    floor (carried through every commit, vacuum-proof) identifies a
    replayed batch, which is SKIPPED rather than re-applied. That
    upgrades ``merge_batch``'s at-least-once-plus-ts-idempotence to
    exactly-once COMMITS — correct even for payload semantics that are
    not naturally idempotent, and the whole batch is one atomic version
    claim (a crash mid-commit publishes nothing; the replay then
    commits cleanly). Assumes one writer stream per table: the floor is
    keyed to the checkpoint's batch-id lineage, so pointing a FRESH
    checkpoint (ids restarting at 0) at an existing table requires a
    new table (same single-writer contract as the plain path)."""
    from movie_rec_spark.sources.snapshot import (
        snapshot_merge,
        snapshot_stream_floor,
    )

    if batch_id <= snapshot_stream_floor(table_path):
        return {"batch_id": batch_id, "skipped_replay": True}
    if batch.isEmpty():
        return {"batch_id": batch_id, "partitions": 0, "updated": 0,
                "deleted": 0, "inserted": 0, "ignored": 0}
    collapsed = upsert_latest(batch, keys=keys, ts_col=ts_col,
                              tiebreak_col=tiebreak_col)
    summary = snapshot_merge(batch.sparkSession, table_path, collapsed,
                             keys=keys, ts_col=ts_col,
                             stream_batch_id=batch_id)
    return {"batch_id": batch_id, **summary}


def merge_stream_snapshot(spark: SparkSession, stream: DataFrame,
                          table_path: str, checkpoint_dir: str,
                          keys: Sequence[str], ts_col: str = "ts",
                          tiebreak_col: str = "event_id") -> list[dict]:
    """Drive the CDC stream into a snapshot table with exactly-once
    commits (``merge_batch_snapshot``); returns per-batch summaries
    including replay skips."""
    log: list[dict] = []

    def apply(batch: DataFrame, batch_id: int) -> None:
        log.append(merge_batch_snapshot(
            batch, table_path, keys, ts_col, tiebreak_col, batch_id))

    q = (stream.writeStream.foreachBatch(apply)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return log


def read_change_stream(spark: SparkSession, src_dir: str, schema,
                       max_files_per_trigger: int | None = 1) -> DataFrame:
    """File-source change stream: one parquet file per CDC batch. The
    ``_deleted`` column is optional in the files; absent → all upserts."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = r.parquet(src_dir)
    if DELETED_COL not in df.columns:
        df = df.withColumn(DELETED_COL, F.lit(False))
    return df


def q_merge_stream(events: DataFrame) -> DataFrame:
    """The CDC-stream merge sink as a DECLARED query, proven under
    AT-LEAST-ONCE delivery: the q_merge_events scenario (even half =
    resident table, odd half = CDC with %5 tombstones) arrives as
    THREE micro-batches of which the first two are THE SAME BATCH
    twice — the duplicate is the point. foreachBatch applies each
    batch through the latest-wins collapse + ts-guarded MERGE, and the
    final table must hash-match the same DuckDB oracle as
    q_merge_events / q_merge_snapshot: duplicate delivery provably
    cannot change the result (re-merged rows no-op on the ts guard,
    re-delivered tombstones find nothing to delete and insert
    nothing). Batches are key-disjoint (user parity), so each key's
    versions collapse within one batch exactly as the oracle's
    windowed CTE does; the docstring claim "idempotent by
    construction" is now a driver-verified hash, not prose.
    """
    import os
    import shutil

    from movie_rec_spark.scratch import scratch_dir
    from movie_rec_spark.streaming.replay import stage_batches

    spark = events.sparkSession
    cols = ["event_id", "user_id", "event_type", "value", "ts"]
    t = upsert_latest(
        events.filter(F.col("event_id") % 2 == 0)).select(*cols)
    u = (events.filter(F.col("event_id") % 2 == 1).select(*cols)
         .withColumn("_deleted", F.col("event_id") % 5 == 0))
    b1 = u.filter(F.col("user_id") % 2 == 0)
    b2 = u.filter(F.col("user_id") % 2 == 1)
    # t (even event_ids) and u (odd) are both empty iff events is —
    # probe the BASE SCAN once instead of executing the upsert window
    # + the CDC projection just to test emptiness (r12: two subtree
    # executions → one limit-1 scan job). ASSUMES event_id is non-null
    # (true for the generated events table): rows with null event_id
    # fall out of both parity filters, so an all-null-id frame would
    # wrongly pass this probe and seed a zero-row table.
    if events.isEmpty():
        # a bare-parquet table seeded from nothing has no schema to
        # read back — empty in, empty out (the totality contract)
        return t
    base = scratch_dir("mrs_mstream_")
    try:
        path = os.path.join(base, "tbl")
        # cluster by the partition column before the partitioned write
        # (guide §6 / Iceberg write.distribution-mode=hash): one task
        # per partition value instead of every shuffle partition
        # spraying a file into every directory — the seeded table's
        # footer count is what every subsequent merge's mergeSchema
        # read and scan pays for
        t.repartition("event_type").write.partitionBy("event_type") \
            .parquet(path)
        src = stage_batches(os.path.join(base, "src"), [b1, b1, b2])
        schema = ("event_id bigint, user_id bigint, event_type string, "
                  "value double, ts timestamp, _deleted boolean")
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        merge_stream(spark, stream, path, os.path.join(base, "ck"),
                     keys=["user_id", "event_type"],
                     partition_col="event_type", ts_col="ts")
        return (spark.read.parquet(path).select(*cols)
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(base, ignore_errors=True)
