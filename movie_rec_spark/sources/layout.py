"""Physical table layout for scale: bucketing + partitioned writes.

At 100 TB the dominant cost of the core joins (lineitem ⋈ orders on
orderkey, ratings ⋈ ratings-shaped facts on user_id) is the shuffle.
Two storage-layout answers, both pure Spark:

- **Bucketing**: ``bucketBy(n, key)`` at write time pre-hashes rows into
  a fixed number of buckets per key. A join of two tables bucketed on
  the join key with compatible bucket counts needs NO Exchange at all —
  tasks zip matching buckets (tests/test_layout.py asserts the
  zero-Exchange plan). Re-used across every downstream join/agg on that
  key, the one-time write cost amortizes exactly like an index.
- **Partitioned writes**: ``partitionBy(col)`` creates a directory per
  value; a filter on that column prunes entire directories at planning
  time (PartitionFilters in the scan, no data read) — the 100 TB answer
  to time-range and category predicates.

Bucket-count sizing: aim for bucket files of 100-200 MB at target scale
(e.g. 100 TB fact / 128 MB ≈ 800 K buckets is too many files; bucket on
top of date partitions instead: buckets × partitions files total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None) -> None:
    """Persist ``df`` as a bucketed managed table. ``sortBy`` inside the
    bucket additionally removes the Sort from downstream sort-merge
    joins (zip directly)."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, bucket_col))
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Directory-per-value layout; filters on ``partition_col`` prune at
    planning time (never touch excluded directories)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
