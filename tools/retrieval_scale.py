"""Measured scale-trend for the RETRIEVAL family (VERDICT r6 item 5).

tools/scale_trend.py (dedup/ANN) and tools/event_scale.py (events)
cover their families; this probe gives the retrieval stack — the
documents→vectors→neighbors path a RAG pipeline runs per query — its
own measured 30×/100× evidence, at corpus sizes where the claimed plan
shapes must carry the cost:

- q_text_embed: the hashing-trick featurizer — map-side explode +
  (doc, pos) agg; wall must track the token scan.
- q_knn_text: exact cosine top-k of ONE query vector against the
  hash-featurized corpus — a linear scan ending in a constant-size
  TakeOrdered; no pair space exists to explode.
- q_chunk_knn: the same search at PARAGRAPH granularity — chunk_rows
  explodes row-local (stride-K slices), so the scan grows with chunks
  (docs × chunks/doc), still linear.
- q_bm25: sparse ranking — per-term df/tf aggregates over the posting
  scan; the matched set stays top-K while the scan grows.
- q_rrf: both arms end in constant-size top-K lists, fusion is O(1);
  its wall is the two arms' scans, nothing more.

Corpus: tools/scale_trend.py's word-salted replication (``w#k`` per
copy k) — a bijection of the term space per copy, so per-copy df/tf
structure, cosine geometry, and chunk boundaries are EXACTLY the 1×
structure while N, the vocabulary, and the posting volume grow N×.
The query doc/chunk (id 0) lives in copy 0 (identity), so the
searched-for neighborhood is the same at every scale; what grows is
the corpus the scan must reject.

Alongside wall times the probe records each query's shuffle-Exchange
count at 1× and N× — the plan-shape invariance claim ("the plan does
not change with corpus size, only task counts do") made checkable.

Usage: python tools/retrieval_scale.py [N] [base_sf_dir]  # default 30, sf0.1
Reuses /tmp/scale_trend_{N}x if tools/scale_trend.py already built it.
Prints the markdown rows recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from movie_rec_spark.operators import text as T  # noqa: E402
from movie_rec_spark.plans import count_exchanges  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402
from tools.scale_trend import build_corpus  # noqa: E402


def _time(fn) -> float:
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def queries(docs):
    return {
        "q_text_embed": lambda: T.q_text_embed(docs),
        "q_knn_text": lambda: T.q_knn_text(docs),
        "q_chunk_knn": lambda: T.q_chunk_knn(docs),
        "q_bm25": lambda: T.q_bm25(docs),
        "q_rrf": lambda: T.q_rrf(docs),
    }


def measure(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    out = {"n_docs": docs.count(), "wall": {}, "exch": {}}
    for name, fn in queries(docs).items():
        out["exch"][name] = count_exchanges(fn())
        # min of 2 runs: the first pays scan-cache and codegen warmup
        out["wall"][name] = round(min(_time(fn), _time(fn)), 1)
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = f"/tmp/scale_trend_{mult}x"
    spark = get_spark("retrieval_scale")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{out_dir}/documents.parquet"):
        print(f"building {mult}x corpus under {out_dir} ...", flush=True)
        build_corpus(spark, base, out_dir, mult)
    base_m = measure(spark, base)
    big_m = measure(spark, out_dir)
    print(f"\nbase: {base_m['n_docs']} docs; "
          f"{mult}x: {big_m['n_docs']} docs\n")
    print(f"| query | wall 1x | wall {mult}x | ratio | "
          f"Exch 1x | Exch {mult}x |")
    print("|---|---|---|---|---|---|")
    for q in base_m["wall"]:
        w1, wn = base_m["wall"][q], big_m["wall"][q]
        print(f"| {q} | {w1} s | {wn} s | {wn / max(w1, 0.1):.1f}x | "
              f"{base_m['exch'][q]} | {big_m['exch'][q]} |")


if __name__ == "__main__":
    main()
