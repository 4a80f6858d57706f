"""SparkSession factory with scale-aware defaults.

The reference performs no query optimization of its own (SURVEY.md §4.1);
here the session is configured so Catalyst/AQE do the heavy lifting:
adaptive execution (runtime coalesce + skew-join splitting), broadcast
joins for the dimension tables, Arrow for any pandas boundary.

On a real cluster these settings are a starting point; `shuffle_partitions`
should scale with executor cores (2-3× total cores) and
`autoBroadcastJoinThreshold` with executor memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "movie_rec_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Local test default: ``local[$SPARK_GRAFT_CPUS]`` with 32 shuffle
    partitions — sized so sf0.1 shuffle partitions fit comfortably in
    memory; at 100 TB the same code runs with cluster-level values.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    parts = str(shuffle_partitions or 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", parts)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching — essential at 100 TB where
        # static planning can't know per-key skew.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dimension tables (part/customer/nation/region analogues) are
        # small relative to the fact tables — let Spark broadcast them.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge when the per-partition
        # build side fits (guide §3.1/§9): skips both sort steps; AQE
        # additionally rewrites planned SMJs at runtime when every
        # post-shuffle partition is under the local-map threshold.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                str(128 * 1024 * 1024))
        # Arrow for any pandas_udf / toPandas boundary (10-100× vs pickle).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scans: vectorized reader + pushdown are on by default;
        # cap split size so local[32] gets real scan parallelism even on
        # the small test files.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # local[*] is a SINGLE JVM acting as driver + all executors +
        # block manager: checkpoint/broadcast/shuffle blocks all live in
        # this one heap. 8g measurably GC-throttled a full bench pass
        # (105 s -> 77 s at 24g, sf0.1); on a real cluster this setting
        # is irrelevant (executors get their own spark.executor.memory).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    # Reliable checkpoint dir for iterative algorithms: MLlib ALS (and
    # any long-lineage loop) checkpoints every checkpointInterval
    # iterations ONLY when a dir is set; without one, a 50-iteration fit
    # builds a lineage deep enough to StackOverflow task serialization.
    # On a cluster point this at durable shared storage (HDFS/S3) so
    # checkpoints also survive executor loss.
    if not spark.sparkContext.getCheckpointDir():
        import tempfile
        spark.sparkContext.setCheckpointDir(
            os.environ.get("SPARK_CHECKPOINT_DIR",
                           tempfile.mkdtemp(prefix="mrs_ckpt_")))
    return spark
