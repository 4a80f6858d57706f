"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full
materialization on executors, nothing collected to the driver) — the
honest analogue of a sink at cluster scale. A single untimed warm-up
query absorbs JVM/codegen startup so per-query numbers measure the
plans, not the JIT.

Each query is timed over TWO passes and the MIN is reported: the
recorded number measures the PLAN, not transient host noise (a
recorded r2 run showed a pure-codegen 5000-row projection at 16 s —
a one-off host stall — next to 0.4 s siblings; min-of-2 suppresses
exactly that class of artifact while leaving real plan costs, which
reproduce in both passes, untouched).

r13 measurement fix (r12 verdict item 4): q_knn_ivf's pass 2 used to
hit the portable-fit memo, so its min was a WARM-index search while
every other query rebuilt its state per pass. The bench now evicts
that memo entry before each timed q_knn_ivf pass
(similarity.portable_fit_cache_clear), so its number prices a cold
build+search under the same min-of-2 meaning as the other 189 —
the number went UP accordingly (~0.29 -> ~1.33 s cold vs 0.37 warm,
measured same-host; the old warm-serve figure remains in
BENCH_local_r13pre.json and earlier artifacts).
The build-once/serve-many model itself is unchanged in the code.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from movie_rec_spark.session import get_spark  # noqa: E402

# q_candidates (literal cross-join) is deliberately absent: it is the
# reference's documented scaling cliff (SURVEY.md §7.3 item 2), kept
# correctness-only; q_candidates_scalable is the at-scale formulation.
# q_dedup_char_jaccard is the second exact ground-truth Jaccard (char
# granularity); q_dedup_jaccard already represents that cost class in
# the headline set, and the scale paths (minhash/simhash/lsh) are all
# benched. (q_recommend is back in the set since r2: it serves from the
# overlay without refitting ALS.)
EXCLUDE = {"q_candidates", "q_dedup_char_jaccard",
           # diameter-999 CC diagnostics: deliberately worst-case
           # iterative queries (~20 s of driver round latency, not plan
           # cost); their measured wall/round numbers live in SCALE.md's
           # chain-graph section instead of the headline total.
           "q_cc_chain_star", "q_cc_chain_minlabel",
           # same chain-graph diagnostic family: 5 fixed rounds of
           # join+agg whose cost is driver round latency at test scale
           "q_pagerank_chain", "q_pagerank_general",
           # 8 CV ALS fits: the ALS cost class is already benched via
           # q_als_recs/q_als_implicit; a CV grid in the headline set
           # would just re-time the same fits x8
           "q_grid_search"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = {k: v for k, v in E.queries().items() if k not in EXCLUDE}

    def run(fn):
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM + codegen + parquet footer caches, plus one tiny
    # Arrow round-trip so Python-UDF queries measure their plans, not
    # the one-time Python worker pool spin-up.
    run(next(iter(qs.values())))
    spark.range(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    import gc

    timings: dict[str, float] = {}
    from movie_rec_spark.operators.similarity import (
        portable_fit_cache_clear,
    )

    for npass in (1, 2):
        for name, fn in qs.items():
            print(f"RUN {name} (pass {npass})", file=sys.stderr, flush=True)
            if name == "q_knn_ivf":
                # cold build+search on BOTH passes (see module docstring)
                portable_fit_cache_clear(n_cells=8)
            t0 = time.time()
            run(fn)
            dt = round(time.time() - t0, 3)
            # UNTIMED session hygiene (r12 measurement fix, documented
            # in OPTIMIZATION_r12.md): release this query's Python
            # references NOW so py4j detaches the finished plan's
            # localCheckpoint block RDDs and the ContextCleaner can
            # drop them — without it ~380 runs accrete executor blocks
            # until the shared heap GC-throttles the LATE queries
            # (q_rest_enrichment measured 4.0 s late-session vs 0.9 s
            # isolated, same code). Deliberately-held caches (e.g. the
            # ivf_build index whose warm pass 2 is the documented
            # serving model) keep their module references and survive.
            gc.collect()
            print(f"  {name} {dt}s", file=sys.stderr, flush=True)
            timings[name] = min(timings.get(name, dt), dt)
    total = sum(timings.values())

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # Drift tripwire: diff per-query against the newest committed
    # round artifact (BENCH_local_r0N.json) and announce any query
    # >1.5x its prior min as a WARNING block. This makes a silent
    # host-contention run (the r08 +6.6% diffuse drift) visible at
    # run time instead of burying +seconds across 40 queries. The
    # block prints ABOVE the totals lines so the driver's tail parse
    # (last stdout line) is unaffected.
    import glob
    prior_files = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_local_r0*.json")))
    if prior_files:
        with open(prior_files[-1]) as fh:
            prior = json.load(fh).get("queries", {})
        drifted = {k: (prior[k], v) for k, v in timings.items()
                   if k in prior and prior[k] > 0.05 and v > 1.5 * prior[k]}
        if drifted:
            print(f"WARNING: {len(drifted)} queries >1.5x their "
                  f"{os.path.basename(prior_files[-1])} min:")
            for k, (p, v) in sorted(drifted.items(),
                                    key=lambda kv: -kv[1][1] / kv[1][0]):
                print(f"WARNING:   {k}: {p:.3f}s -> {v:.3f}s "
                      f"({v / p:.2f}x)")
    print(json.dumps(out))
    # The driver records only a fixed-size TAIL of stdout and parses
    # the last JSON it can find; the full per-query line above has
    # outgrown that window since r04 (BENCH_rN.json `parsed: null`),
    # its head getting cut mid-object. So the LAST line is a compact
    # totals-first summary guaranteed to fit the tail window — the
    # complete per-query dict lives in the line above and in the
    # committed BENCH_local.json.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "slowest10": slowest,
        "queries_full": "BENCH_local.json",
    }))
    # Persist the COMPLETE per-query dict next to the script
    # (committed per round as BENCH_local_r0N.json).
    full = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_local.json")
    with open(full, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
