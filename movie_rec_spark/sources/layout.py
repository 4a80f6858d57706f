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


def bucketed_table(spark: SparkSession, sf_dir: str, table: str,
                   bucket_col: str, n_buckets: int = 16,
                   sort_col: str | None = None) -> DataFrame:
    """MAINTAINED bucketed copy of a catalog table — the index-like
    layer the reference gets from its PK b-tree indexes
    (movierama_ddl.sql:3,18-19): pay one write, then every downstream
    join/groupBy on ``bucket_col`` skips its Exchange forever.

    The data lives at a deterministic external location keyed by
    (sf_dir, table, bucket_col, n_buckets), so it is built AT MOST ONCE
    per corpus: a fresh session finds the finished files (_SUCCESS) and
    only re-registers the metadata via ``CREATE TABLE ... CLUSTERED
    BY ... LOCATION`` — bucketing info lives in the session catalog,
    not the parquet footers, so the DDL is what tells Spark the layout
    is trustworthy. This is exactly the amortization contract of a
    database index, and why the first bench pass of a *_bucketed query
    pays the build while the min-of-2 reports steady state (same
    declared serving model as q_knn_ivf's built index).
    """
    import hashlib
    import os

    digest = hashlib.md5(
        os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    # sort_col participates in the identity: a sorted layout is a
    # DIFFERENT physical contract (zero-Sort merge zip) than the
    # unsorted one, and must not collide with it on disk
    sfx = f"_s{sort_col}" if sort_col else ""
    name = f"mrs_b_{table}_{bucket_col}_{n_buckets}{sfx}_{digest}"
    if spark.catalog.tableExists(name):
        return spark.table(name)

    from movie_rec_spark.sources.catalog import load_table

    src = load_table(spark, sf_dir, table)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    path = os.path.join(warehouse, name)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                         for f in src.schema.fields)
        sort = f"SORTED BY ({sort_col})" if sort_col else ""
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING parquet "
            f"CLUSTERED BY ({bucket_col}) {sort} "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'")
    else:
        # ONE file per bucket: repartition on the bucket hash so each
        # task owns exactly one bucket — Spark only reports sorted
        # output (and skips the downstream Sort) for single-file
        # buckets; multi-file buckets would demote sortBy to a
        # per-file property the planner can't use.
        from pyspark.sql import functions as F
        w = (src.repartition(n_buckets, F.col(bucket_col))
             .write.mode("overwrite").format("parquet")
             .bucketBy(n_buckets, bucket_col).option("path", path))
        if sort_col:
            w = w.sortBy(sort_col)
        w.saveAsTable(name)
    return spark.table(name)


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Directory-per-value layout; filters on ``partition_col`` prune at
    planning time (never touch excluded directories)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def zvalue(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative integer columns,
    ``bits`` bits each — a pure codegen expression (aggregate over a
    bit sequence; no UDF). Sorting by the z-value clusters rows so that
    BOTH dimensions are locally coherent, which is what makes
    row-group min/max statistics selective for 2-D predicates.
    """
    return zvalue_n([col_a, col_b], bits)


def zvalue_n(cols, bits: int = 16):
    """N-dimensional Morton interleave — ``zvalue`` for any number of
    cluster columns (Delta's OPTIMIZE ZORDER BY accepts a column LIST
    for the same reason: a 3-D workload filters on three dimensions).
    Dimension d contributes its bit i at output position i·n + d, so
    the total z-width is n·bits — keep n·bits ≤ 62 to stay inside a
    signed long (3 dims × 16 bits = 48 default). Still pure unrolled
    codegen: shift amounts are literals, no UDF, no shuffle."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zvalue_n needs at least 2 cluster columns")
    if n * bits > 62:
        raise ValueError(
            f"{n} dims x {bits} bits = {n * bits} z-bits overflows a "
            "signed long; lower bits")
    longs = [c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):  # unrolled: shift amounts must be literals
        for d, c in enumerate(longs):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d)
    return z


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   *more_cols: str, n_files: int = 8,
                   row_group_bytes: int = 512 * 1024) -> None:
    """OPTIMIZE ZORDER BY (a, b, ...), the plain-parquet way: sort by
    the Morton interleave of the cluster columns (2 by signature, more
    via ``*more_cols`` — ``zvalue_n`` handles any count with 62
    z-bits, bits shrinking as dimensions grow) and write with small
    row groups, so every row group's (min, max) on EVERY cluster
    column covers a tight box of the value space. A multi-column
    predicate then skips
    most row groups on parquet statistics alone — the data-skipping
    answer when a query filters on two columns and directory
    partitioning can only serve one. repartitionByRange on the z-value
    keeps the sort global across output files (each file owns a
    z-range), so file-level footer stats prune too, not just row
    groups.

    Both dimensions min/max-scale onto the same [0, 2^bits) grid
    BEFORE interleaving (two driver scalars from one tiny agg):
    interleaving RAW values lets the wider-ranged column's high bits
    dominate every z prefix and the narrow column never clusters —
    the standard Z-order normalization (Delta's OPTIMIZE ZORDER uses
    range-partition ids for the same reason). Measured on sf0.1
    orders (tools/zorder_demo.py): a customer x date box predicate
    touches 33.8x fewer candidate row groups than insertion order
    (4/137 vs 135/135 at identical 64 KB row groups).

    ``row_group_bytes`` sets the parquet block size DIRECTLY (it is
    the skipping granularity: rows-per-group = row_group_bytes /
    encoded-row-width, so a byte knob is the honest one — a
    rows-based knob silently shrinks for wide rows). Smaller groups
    skip tighter but cost more footer metadata; 128 KB-1 MB is the
    useful range for stat-pruning workloads vs parquet's 128 MB
    scan-throughput default.

    Both cluster columns must be numeric (or date/timestamp cast
    upstream to a numeric — the demo's epoch-day conversion is the
    intended pattern); empty input raises rather than writing an
    unreadable layout.
    """
    from pyspark.sql import functions as F

    cols = [col_a, col_b, *more_cols]
    bits = min(16, 62 // len(cols))
    grid = (1 << bits) - 1
    mm = df.agg(*[f for c in cols
                  for f in (F.min(c), F.max(c))]).collect()[0]
    if any(mm[2 * i] is None for i in range(len(cols))):
        raise ValueError(
            "write_zordered: empty input (or all-null cluster column) — "
            f"no {tuple(cols)} value range to grid")
    try:
        bounds = [(float(mm[2 * i]), float(mm[2 * i + 1]))
                  for i in range(len(cols))]
    except (TypeError, ValueError) as exc:
        raise ValueError(
            f"write_zordered: cluster columns {tuple(cols)} must be "
            "numeric; convert dates/timestamps to epoch days/seconds "
            "first (see tools/zorder_demo.py::_day)") from exc

    def scaled(c, lo, hi):
        span = (hi - lo) or 1.0
        return F.floor((c.cast("double") - lo) / span * grid).cast("long")

    z = df.withColumn("_z", zvalue_n(
        [scaled(F.col(c), lo, hi) for c, (lo, hi) in zip(cols, bounds)],
        bits))
    (z.repartitionByRange(n_files, "_z")
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite")
     .option("parquet.block.size", row_group_bytes)
     .parquet(path))
