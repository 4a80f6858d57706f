"""Deterministic file-stream replay — the harness behind declared,
oracle-backed STREAMING queries.

Stages authored micro-batches as parquet files with pinned strictly
increasing mtimes (FileStreamSource delivers files in (mtime, path)
order), runs a caller-built streaming DataFrame to a memory sink with
``availableNow``, and returns the MATERIALIZED result (localCheckpoint)
so the temp view and staging directory can be reclaimed immediately —
no tempdir outlives the call (the q_merge_snapshot mkdtemp-leak
lesson, ADVICE r5).

Why replay at all: the in-order pytest parities
(tests/test_streaming.py) prove streaming operators equal their batch
twins under friendly arrival; replaying the SAME corpus in
deliberately out-of-order batches and hashing against the BATCH
DuckDB oracle proves the watermarked semantics under arrival orders
the driver can verify independently. Used by
``anomaly.q_anomaly_stream_et`` and ``joins.q_stream_join_et``.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def derive_lateness(events: DataFrame, ts_col: str = "ts"):
    """Fixture-independent lateness bound + sentinel for out-of-order
    replays (ADVICE r6): one tiny min/max agg over the input derives
    (wm_days, sentinel) such that the watermark delay exceeds the full
    observed span (batch 2 can be span-late relative to batch 1's max)
    and the sentinel sits past max(ts) + gap + delay, so the final
    watermark seals every window/session. Hardcoded literals would
    silently late-drop rows if the fixture were regenerated with a
    longer span or a different epoch."""
    import datetime

    from pyspark.sql import functions as F

    lo, hi = events.agg(F.min(ts_col), F.max(ts_col)).first()
    if hi is None:
        lo = hi = datetime.datetime(1970, 1, 1)
    wm_days = (hi - lo).days + 2
    sentinel = (hi + datetime.timedelta(days=wm_days + 2)
                ).replace(microsecond=0)
    return wm_days, sentinel


def stage_batches(src: str, batches: Sequence[DataFrame]) -> str:
    """Write each batch as one parquet file under ``src`` with pinned
    strictly-increasing mtimes, so FileStreamSource's (mtime, path)
    order delivers them as authored. Staging the SAME batch twice is
    the at-least-once simulation: identical rows arrive as two
    distinct micro-batches."""
    for i, b in enumerate(batches):
        before = set(glob.glob(os.path.join(src, "*.parquet"))) \
            if os.path.isdir(src) else set()
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    return src


def replay_file_stream(
    batches: Sequence[DataFrame],
    schema: str,
    build: Callable[[DataFrame], DataFrame],
    prefix: str = "mrs_replay_",
    output_mode: str = "append",
) -> DataFrame:
    """Replay ``batches`` (delivered one file per trigger, in order)
    through the streaming transformation ``build`` and return the
    materialized output — EVERY emitted generation for ``update``-mode
    operators (the memory sink accumulates; consumers pick the final
    generation, e.g. by a monotone counter)."""
    spark = batches[0].sparkSession
    base = tempfile.mkdtemp(prefix=prefix)
    name = f"{prefix}{uuid.uuid4().hex[:8]}"
    try:
        src = stage_batches(os.path.join(base, "src"), batches)
        q = (build(spark.readStream.schema(schema)
                   .option("maxFilesPerTrigger", "1").parquet(src))
             .writeStream.outputMode(output_mode)
             .format("memory").queryName(name)
             .option("checkpointLocation", os.path.join(base, "ck"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return spark.table(name).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(base, ignore_errors=True)
