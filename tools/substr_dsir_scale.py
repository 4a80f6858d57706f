"""Scale probe for the round-9 operators (SCALE.md §Round 9).

Measures q_dedup_substring / q_substring_prune / q_importance_resample
at 1x (sf0.1, 5k docs) and Nx (the scale_trend salted corpus — token
salting makes replicas non-colliding ACROSS copies, so the duplicated-
span population scales linearly with the corpus and the probe isolates
the operators' own scaling, not a growing duplicate blowup).

Walls are end-to-end noop-sink writes, min-of-2; structural counters
(window rows, duplicated windows, spans, removed tokens, selected
docs) carry the scaling claim — single-run seconds-scale walls in long
probe sessions carry 2-5x session-warmup noise (SCALE.md §Round 8
amortization note).

Usage: python tools/substr_dsir_scale.py [mult] [base_dir]
Run EXCLUSIVELY (no concurrent Spark).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from movie_rec_spark.operators import dedup as D  # noqa: E402
from movie_rec_spark.operators import text as T  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402
from tools.scale_trend import build_corpus  # noqa: E402


def _wall(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 1)


def measure(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    wins = D.substring_windows(docs)
    n_wins = wins.count()
    from pyspark.sql.window import Window
    wfp = Window.partitionBy("fp")
    n_dup = (wins.withColumn(
        "dup", F.min("doc_id").over(wfp) != F.max("doc_id").over(wfp))
        .filter("dup").count())
    spans = D.q_dedup_substring(docs)
    n_spans = spans.count()
    pruned = D.q_substring_prune(docs)
    n_removed = pruned.agg(F.sum("n_removed")).collect()[0][0]
    dsir = T.q_importance_resample(docs)
    n_sel = dsir.agg(F.sum("selected")).collect()[0][0]
    # the r10 at-scale form must select the SAME count (set equality
    # is oracle-proven at sf0.01; the counter cross-checks it at Nx)
    n_sel_thr = (T.q_importance_threshold(docs)
                 .agg(F.sum("selected")).collect()[0][0])
    return {
        "n_docs": docs.count(),
        "n_wins": n_wins,
        "n_dup_wins": n_dup,
        "n_spans": n_spans,
        "n_removed": int(n_removed),
        "n_selected": int(n_sel),
        "n_selected_thr": int(n_sel_thr),
        "wall": {
            "q_dedup_substring": _wall(
                lambda: D.q_dedup_substring(docs)),
            "q_substring_prune": _wall(
                lambda: D.q_substring_prune(docs)),
            "q_importance_resample": _wall(
                lambda: T.q_importance_resample(docs)),
            "q_importance_threshold": _wall(
                lambda: T.q_importance_threshold(docs)),
        },
    }


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = f"/tmp/scale_trend_{mult}x"
    spark = get_spark("substr_dsir_scale")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        print(f"building {mult}x corpus under {out_dir} ...", flush=True)
        build_corpus(spark, base, out_dir, mult)
    m1 = measure(spark, base)
    mn = measure(spark, out_dir)
    print(f"\nbase: {m1['n_docs']} docs; {mult}x: {mn['n_docs']} docs\n")
    print("| metric | 1x | %dx | ratio |" % mult)
    print("|---|---|---|---|")
    for k in ("n_wins", "n_dup_wins", "n_spans", "n_removed",
              "n_selected", "n_selected_thr"):
        print(f"| {k} | {m1[k]} | {mn[k]} | "
              f"{mn[k] / max(m1[k], 1):.1f}x |")
    for q in m1["wall"]:
        w1, wn = m1["wall"][q], mn["wall"][q]
        print(f"| wall {q} | {w1} s | {wn} s | "
              f"{wn / max(w1, 0.1):.1f}x |")


if __name__ == "__main__":
    main()
