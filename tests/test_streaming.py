"""Structured Streaming tests: availableNow over a file source, state
equivalence with the batch aggregation."""

from __future__ import annotations

import shutil

from movie_rec_spark.operators.relational import q_event_counters
from movie_rec_spark.sources.catalog import load_table
from movie_rec_spark.streaming import (
    read_event_stream,
    run_counters_batchwise,
    windowed_counters,
)

SF = "/root/testdata/sf0.001"


def _stage_events(spark, tmp_path, n_files=3):
    """Split the events table into several files so the stream sees
    multiple input files (micro-batch boundaries)."""
    src = str(tmp_path / "events_src")
    load_table(spark, SF, "events").repartition(n_files).write.mode(
        "overwrite").parquet(src)
    shutil.rmtree(f"{src}/_SUCCESS", ignore_errors=True)
    return src


def test_streaming_counters_equal_batch(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    run_counters_batchwise(
        spark, src, str(tmp_path / "ckpt"), sink_table="t_counters")
    got = {
        (r.user_id): (r.n_events, round(r.total_value, 2))
        for r in spark.sql("SELECT * FROM t_counters").collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in q_event_counters(load_table(spark, SF, "events")).collect()
    }
    assert got == want


def test_windowed_counters_with_watermark(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    q = (
        windowed_counters(read_event_stream(spark, src))
        .writeStream.outputMode("append")
        .format("memory").queryName("t_windowed")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM t_windowed").collect()
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark closes all but the last window(s).
    assert rows, "no closed windows emitted"
    assert all(r.n_events > 0 for r in rows)


def test_foreach_batch_applies(spark, tmp_path):
    from movie_rec_spark.streaming.counters import run_with_foreach_batch

    src = _stage_events(spark, tmp_path)
    out_dir = str(tmp_path / "gold")

    def apply_fn(df, batch_id):
        df.groupBy("event_type").count().write.mode("overwrite").parquet(out_dir)

    run_with_foreach_batch(spark, src, str(tmp_path / "ckpt3"), apply_fn)
    gold = spark.read.parquet(out_dir)
    assert gold.count() == 5  # five event types


def test_stream_stream_join_equals_batch_range_join(spark, tmp_path):
    from movie_rec_spark.operators.temporal import q_range_join
    from movie_rec_spark.streaming.joins import (
        attribution_join,
        split_typed_streams,
    )

    src = _stage_events(spark, tmp_path)
    views, purchases = split_typed_streams(read_event_stream(spark, src))
    q = (
        attribution_join(views, purchases)
        .writeStream.outputMode("append")
        .format("memory").queryName("t_attr")
        .option("checkpointLocation", str(tmp_path / "ck_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.event_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM t_attr").collect()
    }
    want = {
        (r.event_id, r.purchase_id)
        for r in q_range_join(load_table(spark, SF, "events")).collect()
    }
    # inner stream-stream join emits every match (watermark only evicts
    # state) -> exact equality with the batch interval join.
    assert got == want
    assert got, "no attributed views in test data"


def test_cdc_counters_retract_deletes_to_batch_recount(spark, tmp_path):
    """M4 DECR path: adds then delete-tombstones; final counter state
    must equal a batch recount over the surviving events."""
    from pyspark.sql import functions as F

    from movie_rec_spark.streaming import event_counters_cdc, read_cdc_stream

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "cdc_src")
    # batch 1: every event as an insert
    ev.withColumn("op", F.lit(1).cast("long")) \
        .repartition(2).write.mode("overwrite").parquet(src)
    # batch 2: tombstones retracting every 'error' event
    ev.filter(F.col("event_type") == "error") \
        .withColumn("op", F.lit(-1).cast("long")) \
        .repartition(1).write.mode("append").parquet(src)
    q = (
        event_counters_cdc(read_cdc_stream(spark, src))
        .writeStream.outputMode("complete")
        .format("memory").queryName("t_cdc")
        .option("checkpointLocation", str(tmp_path / "ck_cdc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, round(r.total_value or 0.0, 2))
        for r in spark.sql("SELECT * FROM t_cdc").collect()
        if r.n_events != 0  # fully-deleted user == absent from recount
    }
    survivors = ev.filter(F.col("event_type") != "error")
    want = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in q_event_counters(survivors).collect()
    }
    assert got == want
    # sanity: the tombstones actually changed somebody's counter
    assert ev.filter(F.col("event_type") == "error").count() > 0


def test_streaming_dedup_drops_replayed_batch(spark, tmp_path):
    import shutil as sh

    from movie_rec_spark.streaming.counters import dedup_stream

    # stage the same events TWICE (simulated at-least-once replay)
    src = str(tmp_path / "dup_src")
    ev = load_table(spark, SF, "events")
    ev.repartition(2).write.mode("overwrite").parquet(src)
    for f in list(__import__("pathlib").Path(src).glob("part-*.parquet")):
        sh.copy(f, f.with_name("replay-" + f.name))
    q = (
        dedup_stream(read_event_stream(spark, src))
        .groupBy().count()
        .writeStream.outputMode("complete")
        .format("memory").queryName("t_dedup")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM t_dedup").collect()[0][0]
    assert got == ev.count(), "replayed rows must be deduped"


def test_incremental_ingest_dedups_across_batches(spark, tmp_path):
    """A doc whose text arrived in an earlier micro-batch must be
    flagged dup_of_corpus when it reappears later; in-batch dups get
    dup_in_batch on all but the smallest id; state survives batches."""
    import os

    from pyspark.sql import Row

    from movie_rec_spark.streaming.ingest import run_incremental_ingest

    src = str(tmp_path / "docs_src")
    os.makedirs(src)

    def doc(i, t):
        return Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))

    b1 = [doc(1, "first text"), doc(2, "second text"), doc(3, "first text")]
    b2 = [doc(10, "first text"), doc(11, "brand new text")]
    # one parquet file per producer batch; maxFilesPerTrigger=1 makes
    # each file its own micro-batch, and file-source ordering follows
    # modification time — stamp b2 strictly later.
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    import glob
    import time
    first_files = set(glob.glob(src + "/*.parquet"))
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    for f in set(glob.glob(src + "/*.parquet")) - first_files:
        os.utime(f)

    run_incremental_ingest(
        spark, src, str(tmp_path / "ingest_ckpt"),
        str(tmp_path / "digest_state"), str(tmp_path / "ingest_log"))

    log = spark.read.parquet(str(tmp_path / "ingest_log") + "/*/")
    got = {r.doc_id: r.status for r in log.collect()}
    assert got[1] == "new" and got[3] == "dup_in_batch"
    assert got[2] == "new"
    assert got[10] == "dup_of_corpus"
    assert got[11] == "new"
    # digest state holds exactly the distinct ingested texts
    fps = spark.read.parquet(str(tmp_path / "digest_state") + "/*/")
    assert fps.distinct().count() == 3


def test_incremental_neardup_finds_cross_batch_pair(spark, tmp_path):
    """A near-identical doc arriving in a later micro-batch must pair
    with the earlier original via the persistent band state; unrelated
    docs must not pair; within-batch dups are also reported."""
    import glob
    import os
    import time

    from pyspark.sql import Row

    from movie_rec_spark.streaming.ingest import run_incremental_neardup

    src = str(tmp_path / "nd_src")
    os.makedirs(src)
    base = "the quick brown fox jumps over the lazy dog again and again"

    def doc(i, t):
        return Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))

    b1 = [doc(1, base), doc(2, "completely unrelated words about spark "
                               "query engines and shuffles")]
    # one appended word: 10 of 11 shingles shared (J≈0.91) — high
    # enough that at least one of 8 bands collides with certainty
    # instead of the coin flip a mid-string one-word swap gives (J≈0.5)
    b2 = [doc(10, base + " tail"),               # near-dup of 1
          doc(11, "fresh content with nothing in common here at all"),
          doc(12, base + " tail")]               # exact dup of 10, in-batch
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    first = set(glob.glob(src + "/*.parquet"))
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    for f in set(glob.glob(src + "/*.parquet")) - first:
        os.utime(f)

    run_incremental_neardup(
        spark, src, str(tmp_path / "nd_ckpt"),
        str(tmp_path / "nd_state"), str(tmp_path / "nd_log"))

    log = spark.read.parquet(str(tmp_path / "nd_log") + "/*/")
    pairs = {(r.new_doc, r.old_doc) for r in log.collect()}
    assert (10, 1) in pairs or (12, 1) in pairs   # cross-batch near-dup
    assert (10, 12) in pairs or (12, 10) in pairs  # within-batch dup
    flat = {d for p in pairs for d in p}
    assert 2 not in flat and 11 not in flat


def test_ingest_replay_is_idempotent(spark, tmp_path):
    """ADVICE r3 (medium): a replayed micro-batch must see exactly the
    PRE-batch state — not its own half-committed delta.  Simulate the
    crash-after-state-write-before-checkpoint-commit window by applying
    batch 1 twice: verdicts and the digest state must be identical, and
    batch 1's genuinely-new digest must NOT be reclassified as
    dup_of_corpus (which would overwrite the delta with an empty one
    and permanently lose it)."""
    from pyspark.sql import Row

    from movie_rec_spark.streaming.ingest import _ingest_apply

    def doc(i, t):
        return Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))

    state, log = str(tmp_path / "state"), str(tmp_path / "log")
    b0 = spark.createDataFrame([doc(1, "first text"), doc(2, "second text")])
    b1 = spark.createDataFrame([doc(10, "first text"), doc(11, "brand new")])
    _ingest_apply(b0, 0, state, log)
    _ingest_apply(b1, 1, state, log)

    def snapshot():
        v = {r.doc_id: r.status
             for r in spark.read.parquet(log + "/*/").collect()}
        fps = sorted(r.fp for r in spark.read.parquet(state + "/*/").collect())
        return v, fps

    first = snapshot()
    assert first[0][11] == "new" and first[0][10] == "dup_of_corpus"
    _ingest_apply(b1, 1, state, log)          # replay batch 1
    assert snapshot() == first, "replay must be byte-idempotent"
    assert len(first[1]) == 3                 # doc 11's digest survived


def test_neardup_state_metrics_and_single_sig_storage(spark, tmp_path):
    """ADVICE r3 (low): each signature is persisted once in the sigs
    table (not once per band), and per-batch state telemetry is
    emitted with monotonically growing state_bytes."""
    import glob
    import os
    import time

    from pyspark.sql import Row

    from movie_rec_spark.operators.dedup import MINHASH_BANDS
    from movie_rec_spark.streaming.ingest import (
        read_state_metrics,
        run_incremental_neardup,
    )

    src = str(tmp_path / "m_src")
    os.makedirs(src)

    def doc(i, t):
        return Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))

    base = "the quick brown fox jumps over the lazy dog again and again"
    b1 = [doc(1, base), doc(2, "completely unrelated words about spark")]
    b2 = [doc(10, base + " tail")]
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    first = set(glob.glob(src + "/*.parquet"))
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    for f in set(glob.glob(src + "/*.parquet")) - first:
        os.utime(f)

    state = str(tmp_path / "m_state")
    run_incremental_neardup(
        spark, src, str(tmp_path / "m_ckpt"), state,
        str(tmp_path / "m_log"))

    # cross-batch pair still found with the split band/sig state
    pairs = {(r.new_doc, r.old_doc)
             for r in spark.read.parquet(str(tmp_path / "m_log") + "/*/").collect()}
    assert (10, 1) in pairs

    sigs = spark.read.parquet(state + "/sigs/*/")
    bands = spark.read.parquet(state + "/bands/*/")
    assert sigs.count() == 3                       # one row per doc
    assert bands.count() == 3 * MINHASH_BANDS
    assert "sig" not in bands.columns              # no 8x sig duplication

    m = {r.batch_id: r for r in read_state_metrics(spark, state).collect()}
    assert set(m) == {0, 1}
    assert m[0].sig_rows_added == 2 and m[1].sig_rows_added == 1
    assert m[1].state_bytes > m[0].state_bytes > 0
    assert m[1].state_files > 0


def test_neardup_state_family_guard(spark, tmp_path):
    """r10 review finding: persisted band keys are only comparable
    within one signature family. Resuming a portable-family state with
    portable=False must raise (not silently join STRING keys against
    BIGINT ones), and a legacy pre-marker state (bands exist, no
    family dir) must raise with the rebuild guidance."""
    import os
    import shutil

    import pytest
    from pyspark.sql import Row

    from movie_rec_spark.streaming.ingest import run_incremental_neardup

    src = str(tmp_path / "f_src")
    os.makedirs(src)
    spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta", lang="en",
             source="s", n_chars=22)]).coalesce(1) \
        .write.mode("append").parquet(src)
    state = str(tmp_path / "f_state")
    run_incremental_neardup(
        spark, src, str(tmp_path / "f_ckpt"), state,
        str(tmp_path / "f_log"))
    assert spark.read.parquet(state + "/family").first()[0] \
        == "minhash-portable-v1"
    with pytest.raises(ValueError, match="signature family"):
        run_incremental_neardup(
            spark, src, str(tmp_path / "f_ckpt2"), state,
            str(tmp_path / "f_log2"), portable=False)
    shutil.rmtree(state + "/family")  # simulate a pre-r10 state dir
    with pytest.raises(ValueError, match="predates family markers"):
        run_incremental_neardup(
            spark, src, str(tmp_path / "f_ckpt3"), state,
            str(tmp_path / "f_log3"))


def test_rocksdb_state_conf_shape():
    """The RocksDB posture helper pins the provider class and a
    bounded compaction cadence (snapshot every N deltas)."""
    from movie_rec_spark.streaming.ingest import rocksdb_state_conf

    conf = rocksdb_state_conf()
    assert conf["spark.sql.streaming.stateStore.providerClass"].endswith(
        "RocksDBStateStoreProvider")
    assert int(conf["spark.sql.streaming.stateStore.minDeltasForSnapshot"]) > 0
    assert conf["spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled"] == "true"
    assert "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" in conf


def test_state_compaction_snapshot_and_replay_floor(spark, tmp_path):
    """compact_state folds the per-batch digest deltas into one
    snapshot, readers see identical pre-batch state afterwards, the
    stream keeps deduping correctly against the compacted state, and a
    reader positioned BEFORE the snapshot boundary (an uncommitted
    batch replay) never sees data the snapshot baked in."""
    import glob
    import os
    import time

    from pyspark.sql import Row

    from movie_rec_spark.streaming.ingest import (
        _list_prior_batches,
        compact_state,
        run_incremental_ingest,
    )

    src = str(tmp_path / "c_src")
    state = str(tmp_path / "c_state")
    log = str(tmp_path / "c_log")
    ckpt = str(tmp_path / "c_ckpt")
    os.makedirs(src)

    def doc(i, t):
        return Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))

    def add_batch(rows):
        before = set(glob.glob(src + "/*.parquet"))
        time.sleep(1.05)
        spark.createDataFrame(rows).coalesce(1).write.mode(
            "append").parquet(src)
        for f in set(glob.glob(src + "/*.parquet")) - before:
            os.utime(f)

    add_batch([doc(1, "alpha"), doc(2, "beta")])
    add_batch([doc(3, "gamma")])
    run_incremental_ingest(spark, src, ckpt, state, log)

    before_rows = {r.fp for r in
                   spark.read.parquet(*_list_prior_batches(
                       spark, state, 99)).collect()}
    summary = compact_state(spark, state)
    assert summary["snapshot"] == 2 and summary["rows"] == 3
    dirs = sorted(os.path.basename(p)
                  for p in glob.glob(state + "/*") if os.path.isdir(p))
    assert dirs == ["snapshot_2"]
    after_rows = {r.fp for r in
                  spark.read.parquet(*_list_prior_batches(
                      spark, state, 99)).collect()}
    assert after_rows == before_rows
    # a replay positioned BEFORE the snapshot boundary must not read it
    assert _list_prior_batches(spark, state, 1) == []

    # the stream continues against the compacted state: 'alpha' from
    # batch 0 is still recognized as a corpus duplicate
    add_batch([doc(10, "alpha"), doc(11, "delta")])
    run_incremental_ingest(spark, src, ckpt, state, log)
    verdicts = {r.doc_id: r.status
                for r in spark.read.option("recursiveFileLookup", "true")
                .parquet(log).collect()}
    assert verdicts[10] == "dup_of_corpus"
    assert verdicts[11] == "new"
    # idempotent: nothing new to fold -> no-op... until new deltas exist
    again = compact_state(spark, state)
    assert again["snapshot"] == 3 and again["rows"] == 4
    assert compact_state(spark, state)["snapshot"] is None


def test_streaming_anomaly_matches_batch_kernel(spark, tmp_path):
    """Batch/stream parity for the anomaly detector: the stateful
    online scorer over in-order micro-batches produces the SAME
    per-event (n_win, zscore, is_anomaly) as batch q_anomaly on the
    union of the batches — including the spike flag, cold-start NULLs,
    and zero-variance NULLs — with the window state carried ACROSS the
    batch boundary."""
    import datetime as dt

    from pyspark.sql import functions as F

    from movie_rec_spark.operators.temporal import q_anomaly
    from movie_rec_spark.streaming.anomaly import anomaly_stream

    def rows(recs):
        return [(eid, u, dt.datetime(2024, 1, d, 12, 0, 0), v)
                for eid, u, d, v in recs]

    schema = "event_id bigint, user_id bigint, ts timestamp, value double"
    batch1 = rows([
        (0, 1, 1, 1.0), (1, 1, 2, 1.2), (2, 1, 3, 0.8), (3, 1, 4, 1.1),
        (10, 3, 1, 5.0), (11, 3, 2, 5.0), (12, 3, 3, 5.0),
    ])
    batch2 = rows([
        (4, 1, 5, 0.9), (5, 1, 6, 100.0),        # spike in batch 2:
        # its 5-point baseline spans BOTH batches (state carry-over)
        (13, 3, 4, 5.0), (14, 3, 5, 5.0), (15, 3, 6, 5.0),
    ])
    src = str(tmp_path / "an_src")
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (anomaly_stream(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_anom")
         .option("checkpointLocation", str(tmp_path / "an_ck"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    got = {r.event_id: (r.n_win, r.zscore, r.is_anomaly)
           for r in spark.sql("SELECT * FROM t_anom").collect()}

    batch_df = spark.createDataFrame(batch1 + batch2, schema)
    want = {r.event_id: (r.n_win, r.zscore, r.is_anomaly)
            for r in q_anomaly(batch_df).collect()}
    assert got == want, {k: (got.get(k), want.get(k))
                         for k in set(got) | set(want)
                         if got.get(k) != want.get(k)}
    assert got[5][2] is True            # the spike flags
    assert all(got[e][1] is None for e in (10, 11, 12, 13, 14, 15))


def test_streaming_anomaly_eventtime_tolerates_out_of_order(spark, tmp_path):
    """The watermarked variant: a LATE event (day 3 arriving after
    days 4-6 were seen) still lands in its correct event-time position
    — per-event output equals batch q_anomaly on the union, which the
    immediate-scoring variant cannot promise under this arrival order.
    A far-future sentinel advances the global watermark so every real
    event flushes."""
    import datetime as dt

    from movie_rec_spark.operators.temporal import q_anomaly
    from movie_rec_spark.streaming.anomaly import anomaly_stream_eventtime

    def rows(recs):
        return [(eid, u, dt.datetime(2024, 1, d, 12, 0, 0), v)
                for eid, u, d, v in recs]

    schema = "event_id bigint, user_id bigint, ts timestamp, value double"
    batch1 = rows([(0, 1, 1, 1.0), (1, 1, 2, 1.2), (3, 1, 4, 1.1),
                   (4, 1, 5, 0.9), (5, 1, 6, 100.0)])   # day 3 missing
    batch2 = rows([(2, 1, 3, 0.8)])                     # late day 3
    sentinel = rows([(99, 9, 30, 0.0)])                 # watermark push
    src = str(tmp_path / "et_src")
    for b in (batch1, batch2, sentinel):
        spark.createDataFrame(b, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (anomaly_stream_eventtime(stream, watermark="3 days")
         .writeStream.outputMode("append")
         .format("memory").queryName("t_anom_et")
         .option("checkpointLocation", str(tmp_path / "et_ck"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    got = {r.event_id: (r.ts, r.n_win, r.zscore, r.is_anomaly)
           for r in spark.sql(
               "SELECT * FROM t_anom_et WHERE user_id != 9").collect()}

    want = {r.event_id: (r.ts, r.n_win, r.zscore, r.is_anomaly)
            for r in q_anomaly(
                spark.createDataFrame(batch1 + batch2, schema)).collect()}
    assert got == want, {k: (got.get(k), want.get(k))
                         for k in set(got) | set(want)
                         if got.get(k) != want.get(k)}
    assert got[5][3] is True   # spike flags with the late event counted
    assert got[5][1] == 5      # its baseline includes the late day 3


def test_stateful_anomaly_runs_on_rocksdb_state_store(spark, tmp_path):
    """The at-scale state backend: HDFS-backed state lives on the
    executor HEAP (state size bounded by memory), RocksDB spills to
    local disk with incremental checkpointing — the default any
    large-state production stream should run. The stateful scorer must
    produce IDENTICAL output under it; pinned here so the kernels never
    grow a heap-provider dependency."""
    import datetime as dt

    from movie_rec_spark.operators.temporal import q_anomaly
    from movie_rec_spark.streaming.anomaly import anomaly_stream

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    try:
        spark.conf.set(
            key, "org.apache.spark.sql.execution.streaming."
                 "state.RocksDBStateStoreProvider")
        schema = ("event_id bigint, user_id bigint, ts timestamp, "
                  "value double")
        rows = [(i, 1, dt.datetime(2024, 1, 1 + i, 12, 0, 0),
                 100.0 if i == 5 else 1.0 + (i % 3) * 0.1)
                for i in range(7)]
        src = str(tmp_path / "rdb_src")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q = (anomaly_stream(
                spark.readStream.schema(schema).parquet(src))
             .writeStream.outputMode("append")
             .format("memory").queryName("t_rocks")
             .option("checkpointLocation", str(tmp_path / "rdb_ck"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = {r.event_id: (r.n_win, r.zscore, r.is_anomaly)
               for r in spark.sql("SELECT * FROM t_rocks").collect()}
        want = {r.event_id: (r.n_win, r.zscore, r.is_anomaly)
                for r in q_anomaly(
                    spark.createDataFrame(rows, schema)).collect()}
        assert got == want
        assert got[5][2] is True
    finally:
        spark.conf.set(key, old)


def test_streaming_heavy_hitters_complete_and_bounded(spark, tmp_path):
    """The stateful Misra-Gries stream, drained over two micro-batches
    with a heavy key split ACROSS the batch boundary, must (a) emit a
    final candidate set containing every exact heavy hitter of the
    batch union, (b) keep every estimate inside the MG bound
    [true - n_shard//(capacity+1), true], and (c) bound state to
    capacity counters per shard."""
    import datetime as dt
    from collections import Counter

    from movie_rec_spark.streaming.sketch import heavy_hitters_stream

    cap, shards = 3, 2
    t0 = dt.datetime(2024, 1, 1)
    # heavy keys 2 (count 24, shard 0) and 7 (count 16, shard 1), tail
    # keys force decrement churn; key 2 splits across the two batches
    b1 = [2] * 10 + [7] * 16 + [4, 6, 8, 10, 12, 14]
    b2 = [2] * 14 + [1, 3, 5, 9, 11, 13]
    schema = "event_id bigint, user_id bigint, ts timestamp"
    for i, batch in enumerate((b1, b2)):
        rows = [(j + i * 1000, int(u), t0) for j, u in enumerate(batch)]
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(str(tmp_path / "hh_src"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(tmp_path / "hh_src")))
    q = (heavy_hitters_stream(stream, capacity=cap, n_shards=shards)
         .writeStream.outputMode("update")
         .format("memory").queryName("t_hh")
         .option("checkpointLocation", str(tmp_path / "hh_ck"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM t_hh").collect()
    # live view = each shard's max-n_shard generation (n is monotone)
    latest_n = {}
    for r in rows:
        latest_n[r.shard] = max(latest_n.get(r.shard, 0), r.n_shard)
    live = {r.user_id: r for r in rows
            if r.n_shard == latest_n[r.shard]}

    truth = Counter(b1 + b2)
    n = len(b1) + len(b2)
    heavy = {k for k, v in truth.items() if v * cap > n}
    assert heavy <= set(live), (heavy, set(live))
    for uid, r in live.items():
        assert r.est <= truth[uid] <= r.est + r.n_shard // (cap + 1)
    per_shard = Counter(r.shard for r in live.values())
    assert all(c <= cap for c in per_shard.values())


def test_stream_join_et_out_of_order_equals_batch(spark):
    """The declared replay query: even-id events arrive a full batch
    before odd-id ones (views and purchases split across batches both
    ways), and the watermarked stream-stream join still reproduces
    batch q_range_join row-for-row."""
    from movie_rec_spark.operators.temporal import q_range_join
    from movie_rec_spark.streaming.joins import q_stream_join_et

    ev = load_table(spark, SF, "events")
    got = {(r.event_id, r.purchase_id)
           for r in q_stream_join_et(ev).collect()}
    want = {(r.event_id, r.purchase_id)
            for r in q_range_join(ev).collect()}
    assert got == want and got
    # the out-of-order claim is real: some pair splits across batches
    assert any(e % 2 != p % 2 for e, p in got)


def test_heavy_hitters_stream_query_equals_batch(spark):
    """The declared replay query: out-of-order arrival (even ids a
    batch before odd) cannot change the post-recount answer — it
    equals batch q_heavy_hitters exactly, counts included."""
    from movie_rec_spark.operators.skew import q_heavy_hitters
    from movie_rec_spark.streaming.sketch import q_heavy_hitters_stream

    ev = load_table(spark, SF, "events")
    got = {(r.user_id, r.n_occurrences)
           for r in q_heavy_hitters_stream(ev).collect()}
    want = {(r.user_id, r.n_occurrences)
            for r in q_heavy_hitters(ev).collect()}
    assert got == want and got


def test_stream_dedup_first_occurrence_and_idempotence(spark):
    """q_stream_dedup emits exactly one row per (user_id, event_type)
    — the key's globally minimal event_id under the pinned in-order
    staging — and the TWICE-delivered batch changes nothing (the
    at-least-once contract). Checked against a plain batch min()."""
    from pyspark.sql import functions as F

    from movie_rec_spark.streaming.dedupe import q_stream_dedup

    ev = load_table(spark, SF, "events")
    got = {(r.user_id, r.event_type): r.first_event_id
           for r in q_stream_dedup(ev).collect()}
    want = {(r.user_id, r.event_type): r.m
            for r in ev.groupBy("user_id", "event_type")
            .agg(F.min("event_id").alias("m")).collect()}
    assert got == want


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except Exception:
        return False


import pytest as _pytest  # noqa: E402


@_pytest.mark.skipif(not _has_protobuf(), reason=(
    "ENVIRONMENT-BOUND (the tests/test_codecs.py posture): Spark 4's "
    "transformWithStateInPandas runner imports google.protobuf, which "
    "this container does not ship and installs are forbidden "
    "(measured: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / "
    "ImportError google.protobuf.descriptor). The GroupState twin "
    "stream_dedup_first runs the same logic above; any image with "
    "protobuf runs this TWS version automatically."))
def test_stream_dedup_transform_with_state_twin(spark, tmp_path):
    """The SAME first-seen dedup on the transformWithStateInPandas
    StatefulProcessor API — must equal the GroupState implementation
    row for row."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import LongType, StringType, StructField
    from pyspark.sql.types import StructType as ST

    from movie_rec_spark.streaming.replay import stage_batches

    class FirstSeen(StatefulProcessor):
        def init(self, handle):
            self.seen = handle.getValueState(
                "seen", ST([StructField("first_event_id", LongType())]))

        def handleInputRows(self, key, rows, timerValues):
            if self.seen.exists():
                return
            first = None
            for pdf in rows:
                m = int(pdf["event_id"].min())
                if first is None or m < first:
                    first = m
            if first is None:
                return
            self.seen.update((first,))
            yield pd.DataFrame({"user_id": [int(key[0])],
                                "event_type": [str(key[1])],
                                "first_event_id": [first]})

        def close(self):
            pass

    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type")
    n = ev.agg(F.max("event_id")).first()[0]
    batches = [ev.filter((F.col("event_id") >= lo)
                         & (F.col("event_id") < hi))
               for lo, hi in ((0, n // 2), (n // 2, n + 1))]
    src = stage_batches(str(tmp_path / "src"), batches)
    out_schema = ST([StructField("user_id", LongType()),
                     StructField("event_type", StringType()),
                     StructField("first_event_id", LongType())])
    q = (spark.readStream
         .schema("event_id bigint, user_id bigint, event_type string")
         .option("maxFilesPerTrigger", "1").parquet(src)
         .groupBy("user_id", "event_type")
         .transformWithStateInPandas(
             FirstSeen(), outputStructType=out_schema,
             outputMode="append", timeMode="none")
         .writeStream.format("memory").queryName("tws_dedup")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.event_type): r.first_event_id
           for r in spark.table("tws_dedup").collect()}
    want = {(r.user_id, r.event_type): r.m
            for r in ev.groupBy("user_id", "event_type")
            .agg(F.min("event_id").alias("m")).collect()}
    assert got == want
