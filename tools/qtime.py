"""Per-query isolation harness for optimization round 12.

Times individual declared queries with the bench methodology (noop
sink, warm-up, min-of-N) and optionally captures
``.explain("formatted")`` to ``plans/r12/<query>_<tag>.txt`` so plan
claims in OPTIMIZATION_r12.md are backed by committed artifacts.

Usage:
    python tools/qtime.py [--passes N] [--explain TAG] [--sf DIR] q1 q2 ...

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movie_rec_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="write plans/r13/<q>_<TAG>.txt explain output")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    qs = E.queries()

    # warm-up: JVM + codegen + parquet footer + Python worker pool
    qs["q_top_movies"](spark, args.sf).write.format(
        "noop").mode("overwrite").save()
    spark.range(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in args.queries:
        fn = qs[name]
        if args.explain:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            pdir = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "plans", "r13")
            os.makedirs(pdir, exist_ok=True)
            with open(os.path.join(
                    pdir, f"{name}_{args.explain}.txt"), "w") as fh:
                fh.write(plan)
        best = None
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            t0 = time.time()
            fn(spark, args.sf).write.format(
                "noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            print(f"  {name} pass{p} {dt}s", file=sys.stderr, flush=True)
            best = dt if best is None else min(best, dt)
        out[name] = best
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
