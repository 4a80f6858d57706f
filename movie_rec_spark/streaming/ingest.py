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

Replay safety (exactly-once): every state/log write is keyed by
batch_id into its own subdirectory with mode=overwrite, AND every state
READ inside the batch lists only subdirectories ``batch_i`` with
``i < batch_id``.  The second half matters: if the driver crashes after
batch N's state write but before its checkpoint commit, the replayed
batch N must NOT see its own half-committed delta (it would classify
its docs as corpus duplicates and then overwrite its delta with an
empty one, silently losing those digests).  Reading strictly-prior
batches makes the foreachBatch body a pure function of (input batch,
pre-batch state), so replays are idempotent.

Scale shape: per micro-batch, the work is |batch| digest computations,
one fp-keyed join of the batch against the digest table scan, and an
append of new digests partitioned the same way — never a rescan of the
corpus text. At 100 TB the digest table is itself fp-bucketed parquet
(sources/layout.py), so the probe join co-locates without a shuffle of
the big side.

State-store posture: this module keeps its corpus state in explicit
parquet tables (a lakehouse pattern — the state IS the product: the
digest/band tables double as the serving index). For operators that
use Spark's internal state store instead (windowed aggregations in
``streaming/counters.py``, the applyInPandasWithState sessionizer in
``streaming/sessions.py``), ``rocksdb_state_conf()`` below returns the
RocksDB provider configuration that keeps multi-TB state off the
executor heap; per-batch state telemetry for THIS module's band state
is written by ``run_incremental_neardup`` (see ``read_state_metrics``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from movie_rec_spark.localdf import local_df
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


def rocksdb_state_conf(changelog: bool = True) -> dict[str, str]:
    """Spark conf for RocksDB-backed streaming state.

    The default HDFSBackedStateStoreProvider keeps every key in executor
    heap; stateful streams whose state grows with the corpus (windowed
    counters, sessionization, dropDuplicates watermark state) need the
    RocksDB provider so state spills to local SSD and snapshots to the
    checkpoint dir.  ``changelog`` enables changelog checkpointing:
    per-batch uploads ship only the delta, with periodic full snapshots
    (``minDeltasForSnapshot``) bounding replay — the compaction cadence.
    Apply at session build time (conf is read when the query starts):

        for k, v in rocksdb_state_conf().items():
            builder = builder.config(k, v)
    """
    conf = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        # compaction cadence: snapshot every 10 deltas, keep 2 versions
        "spark.sql.streaming.stateStore.minDeltasForSnapshot": "10",
        "spark.sql.streaming.minBatchesToRetain": "2",
        # bound RocksDB memory: shared block cache + write buffers
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "512",
    }
    if changelog:
        conf["spark.sql.streaming.stateStore.rocksdb."
             "changelogCheckpointing.enabled"] = "true"
    return conf


def _list_state_dirs(spark: SparkSession, root: str):
    """(batch dirs {i: path}, snapshot dirs {N: path}) under root, via
    the Hadoop FileSystem API so the same code works on HDFS/S3."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    batches, snaps = {}, {}
    if not fs.exists(path):
        return batches, snaps
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not st.isDirectory():
            continue
        for prefix, bucket in (("batch_", batches), ("snapshot_", snaps)):
            if name.startswith(prefix):
                try:
                    bucket[int(name[len(prefix):])] = str(st.getPath())
                except ValueError:
                    pass
    return batches, snaps


def _list_prior_batches(spark: SparkSession, root: str,
                        batch_id: int) -> list[str]:
    """State paths covering exactly batches ``< batch_id``: the newest
    ``snapshot_N`` with ``N <= batch_id`` (a compacted stand-in for all
    batches < N, see ``compact_state``) plus the ``batch_i`` dirs with
    ``N <= i < batch_id``.

    Excluding ``i >= batch_id`` — and any snapshot covering them — is
    the replay-safety half of exactly-once (module docstring): a
    replayed batch must not read the half-committed delta its crashed
    first run may have left behind.
    """
    batches, snaps = _list_state_dirs(spark, root)
    floor = max((n for n in snaps if n <= batch_id), default=None)
    out = [] if floor is None else [snaps[floor]]
    lo = floor if floor is not None else 0
    out += [p for i, p in sorted(batches.items()) if lo <= i < batch_id]
    return out


def compact_state(spark: SparkSession, root: str,
                  upto: int | None = None) -> dict:
    """Compact the per-batch state deltas under ``root`` into one
    ``snapshot_N`` dir (N = first batch NOT covered) and remove the
    merged deltas — bounding the O(batches) listing/scan cost that the
    delta layout otherwise accretes (the lakehouse analogue of the
    RocksDB ``minDeltasForSnapshot`` cadence in ``rocksdb_state_conf``).

    MUST run against COMMITTED state only: between runs of the
    availableNow harness, or with ``upto`` <= last checkpointed
    batch_id + 1 while live. Compacting an uncommitted batch's delta
    would bake it into a snapshot its own replay then reads. The
    default (``upto=None``) covers every delta present, which is safe
    exactly when the stream is stopped.

    Crash-safe: the snapshot is written BEFORE the deltas are removed,
    and readers prefer the newest applicable snapshot — a crash between
    the two steps leaves redundant deltas that the next compaction
    sweeps, never a gap.
    """
    batches, snaps = _list_state_dirs(spark, root)
    if not batches:
        return {"snapshot": None, "merged": 0, "rows": 0}
    hw = max(batches) + 1
    if upto is not None:
        hw = min(hw, upto)
    sources = _list_prior_batches(spark, root, hw)
    snap_path = os.path.join(root, f"snapshot_{hw}")
    if not sources or sources == [snaps.get(hw)]:
        # nothing new to fold in (or snapshot_hw already current)
        return {"snapshot": None, "merged": 0, "rows": 0}
    merged = spark.read.parquet(*sources).distinct()
    merged.write.mode("overwrite").parquet(snap_path)
    n_rows = spark.read.parquet(snap_path).count()
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    removed = 0
    for p in ([path for i, path in batches.items() if i < hw]
              + [path for n, path in snaps.items() if n < hw]):
        hp = jvm.org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).delete(hp, True)
        removed += 1
    return {"snapshot": hw, "merged": removed, "rows": n_rows}


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
                                state_bands: DataFrame,
                                state_sigs: DataFrame,
                                num_perms: int = 32,
                                threshold: float = 0.5) -> DataFrame:
    """Cross-batch near-dup pairs: the incoming batch's banded MinHash
    rows equi-join the PERSISTENT band state on (band, band-hash), and
    candidates verify by signature agreement — identical semantics to
    the batch q_dedup_minhash, restricted to (new doc, old doc) pairs.

    The band state carries only (doc_id, band, bh); each old doc's
    signature lives ONCE in a separate (doc_id, sig) table and is
    joined in per CANDIDATE (post-banding, so the sig join is sized to
    collision count, not bands·|corpus|).  Shuffles: one keyed on the
    band hash, one doc-keyed for the candidate signatures.  Nothing
    rescans old text.
    """
    a = batch_banded.select(
        F.col("doc_id").alias("new_doc"), F.col("sig").alias("sig_a"),
        "band", "bh")
    b = state_bands.select(F.col("doc_id").alias("old_doc"), "band", "bh")
    sigs = state_sigs.select(
        F.col("doc_id").alias("old_doc"), F.col("sig").alias("sig_b"))
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq)) / F.lit(num_perms), 4)
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("new_doc") != F.col("old_doc"))
        .select("new_doc", "old_doc", "sig_a")
        .dropDuplicates(["new_doc", "old_doc"])
        .join(sigs, "old_doc")
        .select("new_doc", "old_doc", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= F.lit(threshold))
    )


def read_state_metrics(spark: SparkSession, state_dir: str) -> DataFrame:
    """The per-micro-batch state telemetry emitted by
    ``run_incremental_neardup`` — one row per committed batch:
    (batch_id, band_rows_added, sig_rows_added, state_files,
    state_bytes).  state_bytes/state_files cover the WHOLE band+sig
    state as of that batch (Hadoop-FS file lengths — no data scan), so
    growth rate and compaction needs are observable per batch."""
    return (spark.read.option("recursiveFileLookup", "true")
            .parquet(os.path.join(state_dir, "metrics")))


def _dir_stats(spark: SparkSession, roots: list[str]) -> tuple[int, int]:
    """(file_count, total_bytes) across roots via Hadoop FS listing —
    metadata only, never reads data files."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    files, total = 0, 0
    for root in roots:
        path = jvm.org.apache.hadoop.fs.Path(root)
        fs = path.getFileSystem(conf)
        if not fs.exists(path):
            continue
        it = fs.listFiles(path, True)
        while it.hasNext():
            st = it.next()
            files += 1
            total += st.getLen()
    return files, total


def run_incremental_neardup(spark: SparkSession, src_dir: str,
                            checkpoint_dir: str, state_dir: str,
                            log_dir: str, threshold: float = 0.5,
                            max_files_per_trigger: int | None = 1,
                            portable: bool = True) -> None:
    """Streaming NEAR-dup detection — the MinHash twin of
    ``run_incremental_ingest``: each micro-batch's banded signatures
    join the persistent band state for cross-batch near-dups, the
    batch dedups against itself with the ordinary q_dedup_minhash, and
    the batch's own banded rows merge into the state.  Same
    replay-safe exactly-once recipe (module docstring): state reads see
    only batches ``< batch_id``; writes are idempotent-by-batch_id.

    State layout (each signature stored ONCE, not once per band):
      state_dir/family/         one-row signature-family marker
      state_dir/bands/batch_N   (doc_id, band, bh)      bands·|batch| rows
      state_dir/sigs/batch_N    (doc_id, sig)           |batch| rows
      state_dir/metrics/batch_N one telemetry row (see read_state_metrics)

    Signature-family versioning: persisted band keys and signatures
    are only comparable WITHIN one hash family, so the state dir
    carries a family marker (written on first use, checked on every
    resume). Resuming a pre-marker (r09 xxhash64) or cross-family
    state raises instead of silently joining STRING portable band
    keys against BIGINT xxhash ones — which would report every
    cross-batch duplicate as absent. Rebuild the state dir (replay
    the stream) or pass the matching ``portable`` flag to continue.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from movie_rec_spark.operators.dedup import (
        MINHASH_PERMS,
        minhash_banded,
        q_dedup_minhash,
    )

    bands_dir = os.path.join(state_dir, "bands")
    sigs_dir = os.path.join(state_dir, "sigs")
    metrics_dir = os.path.join(state_dir, "metrics")

    family = ("minhash-portable-v1" if portable
              else "minhash-xxhash64-v0")
    fam_dir = os.path.join(state_dir, "family")
    try:
        existing = spark.read.parquet(fam_dir).first()[0]
        if existing != family:
            raise ValueError(
                f"near-dup state at {state_dir} was written with "
                f"signature family {existing!r}; resuming with "
                f"{family!r} would silently miss every cross-batch "
                f"duplicate. Rebuild the state dir or pass the "
                f"matching portable= flag.")
    except AnalysisException:
        if _list_prior_batches(spark, bands_dir, 1 << 62):
            raise ValueError(
                f"near-dup state at {state_dir} predates family "
                f"markers (r09 xxhash64 signatures); its band keys "
                f"cannot be compared with {family!r}. Rebuild the "
                f"state dir (replay the stream) or resume with "
                f"portable=False.") from None
        (local_df(spark, [(family,)], "family string")
         .coalesce(1).write.mode("overwrite").parquet(fam_dir))

    def apply(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        banded = minhash_banded(batch, portable=portable) \
            .localCheckpoint(eager=False)
        prior_bands = _list_prior_batches(s, bands_dir, batch_id)
        prior_sigs = _list_prior_batches(s, sigs_dir, batch_id)
        if prior_bands and prior_sigs:
            cross = neardup_batch_against_state(
                banded, s.read.parquet(*prior_bands),
                s.read.parquet(*prior_sigs), MINHASH_PERMS, threshold)
        else:
            cross = local_df(
                s, [], "new_doc bigint, old_doc bigint, est_jaccard double")
        within = q_dedup_minhash(batch, threshold,
                                 portable=portable).select(
            F.col("doc_a").alias("new_doc"),
            F.col("doc_b").alias("old_doc"),
            "est_jaccard")
        verdicts = cross.unionByName(within)
        verdicts.write.mode("overwrite").parquet(
            os.path.join(log_dir, f"batch_{batch_id}"))
        band_delta = banded.select("doc_id", "band", "bh")
        sig_delta = banded.select("doc_id", "sig").dropDuplicates(["doc_id"])
        band_delta.write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"batch_{batch_id}"))
        sig_delta.write.mode("overwrite").parquet(
            os.path.join(sigs_dir, f"batch_{batch_id}"))
        # state telemetry: metadata-only FS stats over the full state
        n_files, n_bytes = _dir_stats(s, [bands_dir, sigs_dir])
        local_df(
            s, [(batch_id, band_delta.count(), sig_delta.count(),
                 n_files, n_bytes)],
            "batch_id bigint, band_rows_added bigint, sig_rows_added "
            "bigint, state_files bigint, state_bytes bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(metrics_dir, f"batch_{batch_id}"))

    q = (
        read_doc_stream(spark, src_dir, max_files_per_trigger)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _ingest_apply(batch: DataFrame, batch_id: int,
                  state_dir: str, log_dir: str) -> None:
    """One micro-batch of the exact-dedup ingest — a pure function of
    (batch, pre-batch state), exposed at module level so replay
    idempotency is directly testable.  Reads only state batches
    ``< batch_id`` (replay safety), writes verdicts + new-digest delta
    idempotently into batch_id-keyed subdirectories."""
    s = batch.sparkSession
    fp_schema = StructType([StructField("fp", StringType())])
    prior = _list_prior_batches(s, state_dir, batch_id)
    if prior:
        known = s.read.schema(fp_schema).parquet(*prior).select("fp")
    else:
        known = local_df(s, [], fp_schema)
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


def run_incremental_ingest(spark: SparkSession, src_dir: str,
                           checkpoint_dir: str, state_dir: str,
                           log_dir: str,
                           max_files_per_trigger: int | None = 1) -> None:
    """Drive the ingest stream with availableNow: every micro-batch is
    deduped against the digest state as of the PREVIOUS batch, its
    verdicts written to the append-only ``log_dir`` (production: a
    parquet/Delta ingest log), and its previously-unseen digests
    written to ``state_dir``.

    Exactly-once: checkpoint + idempotent-by-batch_id writes + state
    reads restricted to strictly-prior batches (module docstring).
    Nothing is collected to the driver.
    """
    def apply(batch: DataFrame, batch_id: int) -> None:
        _ingest_apply(batch, batch_id, state_dir, log_dir)

    q = (
        read_doc_stream(spark, src_dir, max_files_per_trigger)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
