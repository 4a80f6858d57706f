"""Measure the image-neardup hash-WIDTH knob (SCALE.md §Round 9).

q_image_neardup's 100×-docs cliff is the chance-collision floor of
pigeonhole blocking at FIXED 56-bit width (~n²·segs/2^(seg_bits+1)
candidate pairs from uniform-random signatures). The documented
production fix is a WIDER hash: 128-bit dHash → 32-bit segments →
floor ~n²·4/2^33. This probe turns that prose into numbers: at 1×
(sf0.1, 5k docs) and 100× (/tmp/scale_trend_100x, 500k docs) it
measures, for BOTH widths, the blocking candidate_pairs (exact bucket
telemetry via dedup.blocking_stats — never materializes pairs) and the
end-to-end wall of the near-dup query.

Usage: python tools/image_width_probe.py [big_dir] [base_dir]
Run EXCLUSIVELY (no concurrent Spark) — walls are min-of-2.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from movie_rec_spark.operators import dedup as D  # noqa: E402
from movie_rec_spark.operators import multimodal as MM  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402


def _wall(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 1)


def _blocked_56(docs):
    """The (s, v) blocked frame of the 56-bit declared pipeline."""
    sigs = MM.bmp_dhash(MM.synth_bmp(docs))
    seg_w = 56 // MM.PHASH_SEGS
    return sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("s"),
                     F.expr(f"(sig >> {seg_w * s}) & {(1 << seg_w) - 1}")
                     .alias("v"))
            for s in range(MM.PHASH_SEGS)])).alias("seg"),
    ).select("doc_id", F.col("seg.s").alias("s"), F.col("seg.v").alias("v"))


def _blocked_wide(docs):
    sigs = MM.bmp_dhash_segs(MM.synth_bmp(docs, grid_h=MM.WIDE_GRID_H),
                             grid_h=MM.WIDE_GRID_H)
    return sigs.select("doc_id", F.posexplode("sig").alias("s", "v"))


def measure(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = {"n_docs": n}
    c56 = D.blocking_stats(_blocked_56(docs), ["s", "v"]).collect()[0]
    out["cand_56"] = int(c56.candidate_pairs)
    c128 = D.blocking_stats(_blocked_wide(docs), ["s", "v"]).collect()[0]
    out["cand_128"] = int(c128.candidate_pairs)
    out["wall_56"] = _wall(lambda: MM.q_image_neardup(docs))
    out["wall_128"] = _wall(lambda: MM.image_neardup_wide(docs))
    return out


def main() -> None:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_trend_100x"
    base_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("image_width_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = measure(spark, base_dir)
    big = measure(spark, big_dir)
    print("| width | cand 1x | cand 100x | wall 1x | wall 100x | ratio |")
    print("|---|---|---|---|---|---|")
    for w in ("56", "128"):
        r = big[f"wall_{w}"] / max(base[f"wall_{w}"], 0.1)
        print(f"| {w}-bit | {base[f'cand_{w}']} | {big[f'cand_{w}']} "
              f"| {base[f'wall_{w}']} s | {big[f'wall_{w}']} s "
              f"| {r:.1f}x |")
    print(base)
    print(big)


if __name__ == "__main__":
    main()
