"""Streaming incremental corpus ingestion with exact dedup.

The streaming twin of ``operators.dedup.q_dedup_incremental``: document
batches arrive continuously, each micro-batch is deduped against the
PERSISTENT digest table of everything already ingested (and within
itself), verdicts land in an append-only ingest log, and the newly seen
digests are merged back into the digest table — so the corpus digest
state is transactional per micro-batch and survives restarts.

Reference analogue: the reference's write path upserts one rating at a
time inside a DB transaction (``web/app/controller.py:124,170``); a
corpus pipeline ingests batches, and foreachBatch is Structured
Streaming's unit of exactly-once batch side effects (checkpoint +
idempotent-by-batch_id writes = the same replay safety the DB commit
gave the reference).

Scale shape: per micro-batch, the work is |batch| digest computations,
one fp-keyed join of the batch against the digest table scan, and an
append of new digests partitioned the same way — never a rescan of the
corpus text. At 100 TB the digest table is itself fp-bucketed parquet
(sources/layout.py), so the probe join co-locates without a shuffle of
the big side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])


def read_doc_stream(spark: SparkSession, src_dir: str,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of document batches (one parquet file ≈ one
    producer batch). Production is Kafka/queue; the file source has the
    same append-only replayable semantics for tests."""
    reader = spark.readStream.schema(DOC_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(src_dir)


def dedup_batch_against_state(batch: DataFrame,
                              known_fps: DataFrame) -> DataFrame:
    """Verdict per batch doc against the digest state — the same
    first-match-wins rules as q_dedup_incremental: dup_of_corpus if the
    digest is already ingested, dup_in_batch if a smaller doc_id in
    THIS batch has it, else new."""
    from pyspark.sql import Window

    inc = batch.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fp"))
    min_id = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        inc.join(known_fps.withColumn("in_corpus", F.lit(1)), "fp", "left")
        .withColumn("min_batch_id", min_id)
        .select(
            "doc_id", "fp",
            F.when(F.col("in_corpus").isNotNull(), "dup_of_corpus")
            .when(F.col("doc_id") != F.col("min_batch_id"), "dup_in_batch")
            .otherwise("new").alias("status"),
        )
    )


def neardup_batch_against_state(batch_banded: DataFrame,
                                state_banded: DataFrame,
                                num_perms: int = 32,
                                threshold: float = 0.5) -> DataFrame:
    """Cross-batch near-dup pairs: the incoming batch's banded MinHash
    rows equi-join the PERSISTENT band state on (band, band-hash), and
    candidates verify by signature agreement — identical semantics to
    the batch q_dedup_minhash, restricted to (new doc, old doc) pairs.
    Shuffle is keyed on the band hash on both sides; nothing rescans
    old text (the state carries signatures, not documents)."""
    a = batch_banded.select(
        F.col("doc_id").alias("new_doc"), F.col("sig").alias("sig_a"),
        "band", "bh")
    b = state_banded.select(
        F.col("doc_id").alias("old_doc"), F.col("sig").alias("sig_b"),
        "band", "bh")
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq)) / F.lit(num_perms), 4)
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("new_doc") != F.col("old_doc"))
        .select("new_doc", "old_doc", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= F.lit(threshold))
        .dropDuplicates(["new_doc", "old_doc"])
    )


def run_incremental_neardup(spark: SparkSession, src_dir: str,
                            checkpoint_dir: str, state_dir: str,
                            log_dir: str, threshold: float = 0.5,
                            max_files_per_trigger: int | None = 1) -> None:
    """Streaming NEAR-dup detection — the MinHash twin of
    ``run_incremental_ingest``: each micro-batch's banded signatures
    join the persistent band state for cross-batch near-dups, the
    batch dedups against itself with the ordinary q_dedup_minhash, and
    the batch's own banded rows merge into the state. Same
    idempotent-by-batch_id exactly-once recipe; state size is
    bands·|corpus| signature rows — linear, no text retained.
    """
    from movie_rec_spark.operators.dedup import (
        MINHASH_PERMS,
        minhash_banded,
        q_dedup_minhash,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        banded = minhash_banded(batch).localCheckpoint(eager=False)
        try:
            state = s.read.parquet(state_dir + "/*/")
        except Exception:
            state = None
        cross = (neardup_batch_against_state(
            banded, state, MINHASH_PERMS, threshold)
            if state is not None else
            s.createDataFrame(
                [], "new_doc bigint, old_doc bigint, est_jaccard double"))
        within = q_dedup_minhash(batch, threshold).select(
            F.col("doc_a").alias("new_doc"),
            F.col("doc_b").alias("old_doc"),
            "est_jaccard")
        verdicts = cross.unionByName(within)
        verdicts.write.mode("overwrite").parquet(
            os.path.join(log_dir, f"batch_{batch_id}"))
        banded.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_{batch_id}"))

    q = (
        read_doc_stream(spark, src_dir, max_files_per_trigger)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_incremental_ingest(spark: SparkSession, src_dir: str,
                           checkpoint_dir: str, state_dir: str,
                           log_dir: str,
                           max_files_per_trigger: int | None = 1) -> None:
    """Drive the ingest stream with availableNow: every micro-batch is
    deduped against the digest state as of the PREVIOUS batch, its
    verdicts written to the append-only ``log_dir`` (production: a
    parquet/Delta ingest log), and its previously-unseen digests
    written to ``state_dir``.

    Both writes are keyed by batch_id into their own subdirectory with
    mode=overwrite, making the foreachBatch side effects IDEMPOTENT
    under micro-batch replay (a re-run of batch N overwrites batch N's
    own delta instead of double-inserting it) — checkpoint +
    idempotent-by-batch_id writes is the exactly-once recipe for
    foreachBatch sinks. Nothing is collected to the driver.
    """
    fp_schema = StructType([StructField("fp", StringType())])

    def apply(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        try:
            known = s.read.schema(fp_schema).parquet(
                state_dir + "/*/").select("fp")
        except Exception:
            known = s.createDataFrame([], fp_schema)
        verdicts = dedup_batch_against_state(batch, known)
        verdicts.persist()
        try:
            verdicts.write.mode("overwrite").parquet(
                os.path.join(log_dir, f"batch_{batch_id}"))
            (verdicts.filter(F.col("status") == "new")
             .select("fp").distinct()
             .write.mode("overwrite")
             .parquet(os.path.join(state_dir, f"batch_{batch_id}")))
        finally:
            verdicts.unpersist()

    q = (
        read_doc_stream(spark, src_dir, max_files_per_trigger)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
