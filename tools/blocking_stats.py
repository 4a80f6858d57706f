"""Print the LSH/blocking occupancy telemetry table for SCALE.md.

Usage: python tools/blocking_stats.py [sf_dir]   # default sf0.1

One markdown row per blocked dedup/ANN path: block count, occupancy
shape, and candidate_pairs — the exact pair-comparison count the bucket
self-join performs (the 'no silent caps' metric to alert on at scale).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from movie_rec_spark.operators import dedup as D  # noqa: E402
from movie_rec_spark.operators import similarity as S  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("blocking_stats")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n_docs = docs.count()
    n_vecs = emb.count()
    paths = [
        ("minhash bands (b=8, r=4)",
         D.minhash_banded(docs), ["band", "bh"], n_docs),
        ("simhash segments (k=3 -> 4x16-bit)",
         D.simhash_segments(docs, 3), ["q", "qh"], n_docs),
        ("hyperplane LSH (L=8, b=3)",
         S.lsh_bucketed(emb, S.EMBED_DIM), ["tbl", "bucket"], n_vecs),
        ("full inverted index (word-3-gram)",
         D._shingle_rows(docs), ["g"], n_docs),
        ("prefix-filtered index (tau=0.5)",
         D.prefix_index(docs), ["g"], n_docs),
    ]
    print("| path | n_items | n_blocks | max_occ | p99_occ | "
          "candidate_pairs | all-pairs would be |")
    print("|---|---|---|---|---|---|---|")
    for label, blocked, cols, n in paths:
        r = D.blocking_stats(blocked, cols).collect()[0]
        allpairs = n * (n - 1) // 2
        print(f"| {label} | {n} | {r.n_blocks} | {r.max_occ} | "
              f"{r.p99_occ} | {r.candidate_pairs} | {allpairs} |")


if __name__ == "__main__":
    main()
