"""Round 13 item 1: split the per-query session floor into phases.

For each named query, measures on a warm session:
  build_s    — Python-side plan construction (fn(spark, sf_dir) wall)
  analyze_s  — first touch of queryExecution().executedPlan() (Catalyst
               analysis + optimization + physical planning, driver JVM)
  exec1_s    — first noop write (includes codegen compile + run)
  exec2_s    — second noop write of a FRESH build (the bench's min-of-2
               number ~= build + analyze + exec on warm codegen caches)
  tracker    — QueryPlanningTracker phase durations (ms) from the JVM

Optionally cProfiles the build phase (--profile) to attribute
Python-side time (py4j round trips vs local work).

Usage: python tools/r13/profile_floor.py [--profile] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from movie_rec_spark.session import get_spark  # noqa: E402


def tracker_phases(df) -> dict[str, int]:
    try:
        qe = df._jdf.queryExecution()
        phases = qe.tracker().phases()
        out = {}
        it = phases.keysIterator()
        while it.hasNext():
            k = it.next()
            ps = phases.apply(k)
            out[str(k)] = int(ps.durationMs())
        return out
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)[:120]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("floorprof")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    qs = E.queries()

    # warm-up identical to bench.py
    qs["q_top_movies"](spark, args.sf).write.format(
        "noop").mode("overwrite").save()
    spark.range(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    results = {}
    for name in args.queries:
        fn = qs[name]
        # pass 0: absorb one full run so caches (codegen, footers) warm
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()

        t0 = time.time()
        df = fn(spark, args.sf)
        build = time.time() - t0

        t0 = time.time()
        df._jdf.queryExecution().executedPlan()
        analyze = time.time() - t0

        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        exec1 = time.time() - t0

        t0 = time.time()
        df2 = fn(spark, args.sf)
        df2.write.format("noop").mode("overwrite").save()
        full2 = time.time() - t0

        res = {"build_s": round(build, 3), "analyze_s": round(analyze, 3),
               "exec_after_analyze_s": round(exec1, 3),
               "fresh_full_s": round(full2, 3),
               "tracker_ms": tracker_phases(df)}
        if args.profile:
            import cProfile
            import io
            import pstats
            pr = cProfile.Profile()
            pr.enable()
            fn(spark, args.sf)
            pr.disable()
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
            res["profile"] = s.getvalue()
        results[name] = res
        print(f"== {name}: build={build:.3f} analyze={analyze:.3f} "
              f"exec={exec1:.3f} fresh_full={full2:.3f}", flush=True)
        print(f"   tracker: {res['tracker_ms']}", flush=True)
        if args.profile:
            print(res["profile"], flush=True)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "profile"}
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
