"""One-partition literal DataFrames.

``spark.createDataFrame(rows)`` slices the driver-local list into
``defaultParallelism`` pickled partitions. For the tiny literal frames
query builders create (stream sentinels, query rows, index centers,
telemetry rows) that sizing is pathological twice over:

- any downstream ``coalesce(1)`` (e.g. staging a replay batch as ONE
  parquet file) evaluates all N pickled partitions SERIALLY through the
  Python worker — measured 5.3 s for a ONE-ROW frame at local[32]
  (~160 ms per empty partition round-trip) vs 0.36 s with one slice;
- the partition count lies about the frame's size: a 1-row frame
  reporting 32 partitions makes ``fanout_scan`` treat a downstream
  union as already-parallel (q_rrf's corpus+query-row union came out
  at 33 partitions, skipping the fanout the embed kernel needs).

``local_df`` pins ``numSlices=1`` so a literal frame is one pickled
partition at any core count. Values and schema are identical to the
plain form (same row-by-row pickling, same DDL/StructType handling) —
only the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with ONE partition."""
    rows = list(rows)
    # rows == [] works through the same call: parallelize([], 1) yields
    # one empty partition that still carries the declared schema
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
