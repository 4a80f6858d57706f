"""Measured scale-trend for the EVENT-ANALYTICS family — the third
data dimension (tools/scale_trend.py covers documents/embeddings).

Synthesizes an N× events corpus by replicating with a user_id/event_id
STRIDE: per-user event sequences are preserved bit-for-bit (same
timestamps, values, types — so windows, sessions, funnels, and
baselines per user are EXACTLY the 1× structure), while the global
row count, user cardinality, and per-day volumes grow N×. That is the
regime every event-keyed operator claims to scale in: user-keyed
shuffles grow linearly with users, day-keyed aggregates see N× deeper
days, and nothing about any single user's computation changes.

What each query proves at N×:
- q_anomaly / q_rolling_window: ONE user-keyed Exchange + RANGE frame
  — wall must track rows, not users².
- q_active_users / q_rolling_percentiles: contribution expansion —
  the vote/histogram blow-up is bounded by the window length, so N×
  rows → N× votes, never N× re-scans per day.
- q_funnel: the single-Exchange stacked-window kernel.
- q_sessionize / q_session_paths / q_event_transitions: session_window
  agg and user-ordered windows.
- q_twap / q_cohort: user-keyed aggregate families.
- q_heavy_hitters: the matched set SHRINKS as n grows (threshold
  n/capacity rises) while both scans grow — cost must track the scan,
  the BM25 argument. The MG summary union stays ≤ tasks×capacity.
- q_interpolate: the per-user hourly spine — output rows grow with
  users × span, the documented knob.

Usage: python tools/event_scale.py [N] [base_sf_dir]   # default 30, sf0.1
Writes the N× corpus under /tmp/event_scale_{N}x (reused if present)
and prints the markdown rows recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from movie_rec_spark.operators import mutation as M  # noqa: E402
from movie_rec_spark.operators import relational as R  # noqa: E402
from movie_rec_spark.operators import skew as SK  # noqa: E402
from movie_rec_spark.operators import temporal as TP  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402

STRIDE = 10_000_000


def build_corpus(spark, base_dir: str, out_dir: str, mult: int) -> None:
    ev = load_table(spark, base_dir, "events")
    parts = []
    for k in range(mult):
        if k == 0:
            parts.append(ev)
            continue
        parts.append(ev.select(
            (F.col("event_id") + F.lit(k * STRIDE)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * STRIDE)).alias("user_id"),
            "event_type", "value", "props"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet")


def _time(fn) -> float:
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def measure(spark, events) -> dict:
    queries = {
        "q_anomaly": lambda: TP.q_anomaly(events),
        "q_rolling_window": lambda: TP.q_rolling_window(events),
        "q_active_users": lambda: TP.q_active_users(events),
        "q_rolling_percentiles":
            lambda: TP.q_rolling_percentiles(events),
        "q_funnel": lambda: TP.q_funnel(events),
        "q_sessionize": lambda: TP.q_sessionize(events),
        "q_session_paths": lambda: TP.q_session_paths(events),
        "q_event_transitions": lambda: TP.q_event_transitions(events),
        "q_twap": lambda: TP.q_twap(events),
        "q_cohort": lambda: TP.q_cohort(events),
        "q_heavy_hitters": lambda: SK.q_heavy_hitters(events),
        "q_winsorize": lambda: R.q_winsorize(events),
        "q_interpolate": lambda: TP.q_interpolate(events),
        # wave 4: both must track rows (one user-keyed Exchange for
        # autocorr; a day-collapsed series for ewma, so the window
        # input GROWS only with types×days, never with raw rows)
        "q_autocorr": lambda: TP.q_autocorr(events),
        "q_ewma": lambda: TP.q_ewma(events),
        # round 11: the M1 batch id stamper at event scale — two
        # batch-row Exchanges (range + pid hash), no batch-cardinality
        # window; the density counters below carry the claim
        "q_assign_ids": lambda: M.q_assign_ids(events),
    }
    # EVENT_ONLY_WALL: comma allowlist — time ONLY these queries (for
    # adding new members' rows without re-running the whole family)
    only = set(filter(None, os.environ.get(
        "EVENT_ONLY_WALL", "").split(",")))
    walls = {name: (round(_time(fn), 1)
                    if not only or name in only else None)
             for name, fn in queries.items()}
    # q_assign_ids density counters: ids must be EXACTLY dense
    # max(existing)+1 .. max+N at any batch scale (the property test's
    # invariant, measured instead of assumed at 100x). Gated on the
    # same `only` allowlist as the walls: a targeted single-query
    # re-timing run must not pay an unrelated full-scale id job.
    if not only or "q_assign_ids" in only:
        out = M.q_assign_ids(events).agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("event_id").alias("n_distinct"),
            (F.max("event_id") - F.min("event_id") + 1).alias("span"))
        r = out.collect()[0]
        walls["_assign_ids_density"] = (
            int(r.n), int(r.n_distinct), int(r.span))
    return walls


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = f"/tmp/event_scale_{mult}x"
    spark = get_spark("event_scale")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{out_dir}/events.parquet"):
        print(f"building {mult}x events under {out_dir} ...", flush=True)
        build_corpus(spark, base, out_dir, mult)
    ev1 = load_table(spark, base, "events")
    evn = spark.read.parquet(f"{out_dir}/events.parquet")
    n1, nn = ev1.count(), evn.count()
    base_m = measure(spark, ev1)
    big_m = measure(spark, evn)
    print(f"\nbase: {n1} events; {mult}x: {nn} events\n")
    print(f"| query | wall 1x | wall {mult}x | ratio |")
    print("|---|---|---|---|")
    for q in base_m:
        w1, wn = base_m[q], big_m[q]
        if w1 is None and q != "_assign_ids_density":
            continue
        if q == "_assign_ids_density":
            print(f"| q_assign_ids density (n, n_distinct, span) | "
                  f"{w1} | {wn} | dense iff n==n_distinct==span |")
            continue
        print(f"| {q} | {w1} s | {wn} s | {wn / max(w1, 0.1):.1f}x |")


if __name__ == "__main__":
    main()
