"""JDBC source/sink shims — true external-database parity for S6/S7.

The reference reads its ratings table straight from Postgres
(estimator.py:22-36 via SQLAlchemy) and bulk-loads it in chunks
(prepare_dataset.py:170-183). SURVEY.md §1.4 maps that surface onto the
parquet lakehouse as the PRIMARY path (sources/catalog.py); these thin
wrappers are the alternate path for running against a live database
without changing query code.

Scale rules encoded here rather than left to the caller:

- A JDBC read with no partitioning options is ONE task on one executor —
  at any real table size that's the whole cluster waiting on one
  connection. ``read_jdbc`` therefore takes the four partitioning options
  as first-class arguments and warns when an unbounded read is requested.
- Writes batch rows per round-trip (``batchsize``) and bound parallelism
  (``num_partitions``) so a 1000-task stage doesn't open 1000
  simultaneous connections against one database.

No JDBC driver jar ships in this container, so tests exercise the
option-plumbing contract through an injectable reader/writer factory and
skip live round-trips; against a real cluster pass nothing and the
SparkSession's own reader is used.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(spark: SparkSession, url: str, table: str, *,
              user: str | None = None, password: str | None = None,
              driver: str | None = None,
              partition_column: str | None = None,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              num_partitions: int | None = None,
              fetchsize: int = 10_000,
              reader=None) -> DataFrame:
    """S6 alternate path: parallel JDBC scan.

    ``partition_column``/``lower_bound``/``upper_bound``/``num_partitions``
    split the scan into range predicates executed concurrently — the only
    way a JDBC read scales past one task. Pushdown note: Catalyst pushes
    filters and column pruning through the JDBC relation, so
    ``read_jdbc(...).select(a, b).filter(...)`` runs as
    ``SELECT a, b FROM t WHERE ...`` server-side; ``table`` may also be a
    ``(SELECT ...) AS t`` subquery for arbitrary source SQL
    (the reference's estimator.py:22-36 query moves server-side intact).
    """
    r = (reader if reader is not None else spark.read).format("jdbc")
    r = r.option("url", url).option("dbtable", table)
    r = r.option("fetchsize", str(fetchsize))
    if user is not None:
        r = r.option("user", user)
    if password is not None:
        r = r.option("password", password)
    if driver is not None:
        r = r.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions")
        r = (r.option("partitionColumn", partition_column)
             .option("lowerBound", str(lower_bound))
             .option("upperBound", str(upper_bound))
             .option("numPartitions", str(num_partitions)))
    else:
        warnings.warn(
            "read_jdbc without partition_column is a single-task scan; "
            "pass partitioning bounds for any non-tiny table",
            stacklevel=2)
    return r.load()


def write_jdbc(df: DataFrame, url: str, table: str, *,
               mode: str = "append",
               user: str | None = None, password: str | None = None,
               driver: str | None = None,
               batchsize: int = 1_000,
               num_partitions: int | None = 8,
               isolation_level: str = "READ_COMMITTED",
               writer=None) -> None:
    """S7 alternate path: chunked JDBC append (prepare_dataset.py:170-183
    chunksize=1000 → ``batchsize``). ``num_partitions`` coalesces the
    write stage so executor-count parallelism doesn't translate into
    executor-count open connections."""
    if num_partitions:
        df = df.coalesce(num_partitions)
    w = (writer if writer is not None else df.write).format("jdbc")
    w = (w.option("url", url).option("dbtable", table)
         .option("batchsize", str(batchsize))
         .option("isolationLevel", isolation_level))
    if user is not None:
        w = w.option("user", user)
    if password is not None:
        w = w.option("password", password)
    if driver is not None:
        w = w.option("driver", driver)
    w.mode(mode).save()
