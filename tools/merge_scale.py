"""Measure the merge scale claim: a small-batch MERGE costs the
touched partitions, not the table. Builds tables with identical
partition geometry at 1x/10x/100x row count, merges the SAME 10-row
batch into each through BOTH write paths — plain ``merge_into``
(dynamic partition overwrite) and the manifest-committed
``snapshot_merge`` — and reports wall times (expected: flat for both;
the snapshot protocol must not cost throughput for its atomicity),
plus the full-rewrite alternative for contrast.

Usage: python tools/merge_scale.py [rows_small] [n_partitions]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.merge import merge_into  # noqa: E402
from movie_rec_spark.sources.snapshot import (  # noqa: E402
    snapshot_create,
    snapshot_merge,
)


def build(spark, path: str, rows: int, parts: int) -> None:
    (spark.range(rows)
     .select(F.col("id"),
             (F.col("id") % parts).alias("day"),
             F.concat(F.lit("v"), F.col("id")).alias("val"),
             F.lit(0).alias("ts"))
     .write.partitionBy("day").parquet(path))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("merge_scale")
    spark.sparkContext.setLogLevel("ERROR")
    batch = spark.createDataFrame(
        [(i * parts, 0, "UP", 1) for i in range(10)],
        "id bigint, day bigint, val string, ts bigint")
    # untimed warm-up: JVM/codegen startup must not pollute the 1x point
    wpath = tempfile.mkdtemp(prefix="mscale_warm_") + "/tbl"
    build(spark, wpath, 1000, parts)
    merge_into(spark, wpath, batch, keys=["id", "day"],
               partition_col="day", ts_col="ts")
    spath = tempfile.mkdtemp(prefix="mscale_warm_snap_") + "/tbl"
    snapshot_create(spark, spath,
                    spark.read.parquet(wpath), "day")
    snapshot_merge(spark, spath, batch, keys=["id", "day"], ts_col="ts")
    out = []
    for mult in (1, 10, 100):
        path = tempfile.mkdtemp(prefix=f"mscale_{mult}x_") + "/tbl"
        build(spark, path, rows * mult, parts)
        snap = tempfile.mkdtemp(prefix=f"mscale_snap_{mult}x_") + "/tbl"
        snapshot_create(spark, snap, spark.read.parquet(path), "day")
        t0 = time.time()
        s = merge_into(spark, path, batch, keys=["id", "day"],
                       partition_col="day", ts_col="ts")
        dt = time.time() - t0
        t2 = time.time()
        snapshot_merge(spark, snap, batch, keys=["id", "day"],
                       ts_col="ts")
        snap_dt = time.time() - t2
        t1 = time.time()  # contrast: what a naive full rewrite costs
        spark.read.parquet(path).write.mode("overwrite").parquet(
            path + "_copy")
        full = time.time() - t1
        out.append((mult, rows * mult, dt, snap_dt, full, s["updated"]))
    print("| table rows | merge_into 10-row batch | snapshot_merge "
          "10-row batch | full rewrite |")
    print("|---|---|---|---|")
    for mult, n, dt, snap_dt, full, upd in out:
        assert upd == 10
        print(f"| {n:,} | {dt:.2f} s | {snap_dt:.2f} s | {full:.2f} s |")


if __name__ == "__main__":
    main()
