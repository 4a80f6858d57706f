"""Measured STREAMING-STATE scale trend — the bounded-state claim of
the stateful operators turned into StreamingQueryProgress numbers
(VERDICT r7 #6: "the bounded-state claim is argued, not measured").

The declared replay queries (q_sessionize_stream, q_anomaly_stream_et,
q_heavy_hitters_stream) deliberately use a FULL-SPAN watermark so an
adversarial even/odd arrival split still reproduces the batch oracle —
under that config the event-time buffer legitimately holds the whole
corpus, which says nothing about production state size. This probe
measures the PRODUCTION configuration instead: near-in-order arrival
(4 chronological batches, the regime a real ingest produces) with the
operators' production watermarks, and reads the engine's own
`stateOperators` progress telemetry (numRowsTotal / memoryUsedBytes)
at each trigger.

Two scale regimes isolate the two state drivers:

- DEPTH N× ("same keys, N× events"): every event replicated N times
  with an event_id stride and a +i-seconds timestamp jitter — the same
  1 500 users, the same sessions (jitter << gap), N× the rows. The
  bounded-state claim says peak state must PLATEAU (state rows track
  keys-with-open-state, never events): sessions keep one window per
  open session, the anomaly scorer keeps one GroupState row per user,
  the MG sketch keeps exactly shards×capacity counters.
- KEYS N× ("N× keys, N× events"): the tools/event_scale.py user-stride
  replication — per-user structure bit-identical, user cardinality N×.
  State must grow LINEARLY IN KEYS (that is the design: state ∝ keys
  within the watermark horizon), still orders of magnitude below
  events once per-key activity is realistic.

Usage: python tools/stream_state_scale.py [N] [base_sf_dir]
(default 30, /root/testdata/sf0.1). Prints the markdown rows recorded
in SCALE.md §Round 8. Run EXCLUSIVELY (no concurrent Spark jobs).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402
from movie_rec_spark.streaming.anomaly import (  # noqa: E402
    anomaly_stream_eventtime,
)
from movie_rec_spark.streaming.replay import (  # noqa: E402
    derive_lateness,
    stage_batches,
)
from movie_rec_spark.streaming.sessions import (  # noqa: E402
    session_windows_stream,
)
from movie_rec_spark.streaming.sketch import (  # noqa: E402
    heavy_hitters_stream,
)

STRIDE = 10_000_000
N_BATCHES = 4
SCHEMA = "event_id bigint, user_id bigint, ts timestamp, value double"


def scaled(ev, n: int, regime: str):
    """DEPTH: same users, n× events (+i s jitter keeps sessions and
    watermark horizons intact). KEYS: n× users via id stride, per-user
    sequences bit-identical (the event_scale replication)."""
    if n == 1:
        return ev
    reps = ev.sparkSession.range(n).select(F.col("id").alias("rep"))
    x = ev.crossJoin(F.broadcast(reps))
    if regime == "depth":
        return x.select(
            (F.col("event_id") + F.col("rep") * STRIDE).alias("event_id"),
            "user_id",
            (F.col("ts") + F.make_interval(secs=F.col("rep"))).alias("ts"),
            "value")
    return x.select(
        (F.col("event_id") + F.col("rep") * STRIDE).alias("event_id"),
        (F.col("user_id") + F.col("rep") * STRIDE).alias("user_id"),
        "ts", "value")


def chronological_batches(ev, sentinel):
    """Near-in-order arrival: 4 ts-quantile batches + the watermark
    sentinel — the production regime (late data spans batch edges but
    arrival is broadly chronological)."""
    spark = ev.sparkSession
    b = ev.withColumn(
        "_b", F.ntile(N_BATCHES).over(Window.orderBy("ts")))
    batches = [b.filter(F.col("_b") == i + 1).drop("_b")
               for i in range(N_BATCHES)]
    batches.append(spark.createDataFrame(
        [(-1, -1, sentinel, 0.0)], SCHEMA))
    return batches


def run_streaming(batches, build, output_mode="append"):
    """stage → availableNow run → (wall, input_rows, peak/final state
    rows, peak state bytes) from the engine's own progress telemetry."""
    spark = batches[0].sparkSession
    base = tempfile.mkdtemp(prefix="mrs_state_scale_")
    name = f"ss_{uuid.uuid4().hex[:8]}"
    try:
        src = stage_batches(os.path.join(base, "src"), batches)
        t0 = time.time()
        q = (build(spark.readStream.schema(SCHEMA)
                   .option("maxFilesPerTrigger", "1").parquet(src))
             .writeStream.outputMode(output_mode)
             .format("memory").queryName(name)
             .option("checkpointLocation", os.path.join(base, "ck"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        wall = time.time() - t0
        rows_in, peak_rows, final_rows, peak_bytes = 0, 0, 0, 0
        for p in q.recentProgress:
            rows_in += p["numInputRows"]
            ops = p.get("stateOperators") or []
            tot = sum(o.get("numRowsTotal", 0) for o in ops)
            byt = sum(o.get("memoryUsedBytes", 0) for o in ops)
            peak_rows = max(peak_rows, tot)
            peak_bytes = max(peak_bytes, byt)
            final_rows = tot
        return wall, rows_in, peak_rows, final_rows, peak_bytes
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stream_state_scale")
    spark.sparkContext.setLogLevel("ERROR")
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "user_id", "ts", "value"))

    # production watermarks: sessions tolerate 1 day of lateness,
    # the anomaly scorer 10 minutes (its module default), MG is
    # watermark-free O(shards·capacity) by construction
    queries = {
        "sessions(1d wm)": (
            lambda s: session_windows_stream(
                s.select("user_id", "ts", "value"), watermark="1 day"),
            "append"),
        "anomaly_et(10m wm)": (
            lambda s: anomaly_stream_eventtime(
                s.select("event_id", "user_id", "ts", "value"),
                watermark="10 minutes"),
            "append"),
        "mg_sketch": (
            lambda s: heavy_hitters_stream(
                s.select("user_id")), "update"),
    }

    print("| query | regime | events | peak state rows | final state "
          "rows | peak state MB | wall s |")
    print("|---|---|---|---|---|---|---|")
    for regime in ("base", "depth", "keys"):
        nn = 1 if regime == "base" else n
        data = scaled(ev, nn, regime).localCheckpoint(eager=True)
        _, sentinel = derive_lateness(data)
        batches = chronological_batches(data, sentinel)
        for qname, (build, mode) in queries.items():
            wall, rows_in, peak, final, byt = run_streaming(
                batches, build, mode)
            tag = regime if regime == "base" else f"{regime} {nn}x"
            print(f"| {qname} | {tag} | {rows_in:,} | {peak:,} "
                  f"| {final:,} | {byt / 1e6:.1f} | {wall:.1f} |",
                  flush=True)


if __name__ == "__main__":
    main()
