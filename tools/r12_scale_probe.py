"""Round-12 scale rows (SCALE.md §Round 12).

Measures, at 1x (sf0.1) and the prebuilt 30x/100x trend corpora:

1. q_image_dedup_groups under the SIZED operator default
   (image_sized_grid via n_docs) — wall + blocked candidate pairs at
   the chosen width. Closes the r11 verdict's What's-missing #1 scale
   half: the composition (pairs -> CC groups) gets its own trend rows,
   and the sized width is the path actually exercised (56-bit floor at
   sf0.1's 5k docs, wider grids above).
2. q_pipeline_llm with the r12 near-dedup stage — warm wall, plus the
   nd stage's internal blocked candidate counters over the REAL docs2
   survivor set (both the pinned 56/14 form the declared query runs
   and the simhash_sized_params form the n_docs= scale path selects),
   so the composed query carries the same counter-level evidence its
   stages have individually (r11 verdict item 8).

Usage: python tools/r12_scale_probe.py [mult] [big_dir] [base_dir]
Run EXCLUSIVELY (no concurrent Spark) — walls are min-of-2.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from movie_rec_spark.operators import dedup as D  # noqa: E402
from movie_rec_spark.operators import multimodal as MM  # noqa: E402
from movie_rec_spark.operators import text as T  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402


def _wall(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 1)


def _image_blocked_sized(docs, gh: int):
    """The (s, v) blocked frame at the sizer-chosen grid height."""
    if gh == MM.PHASH_GRID_H:
        sigs = MM.bmp_dhash(MM.synth_bmp(docs))
        seg_w = 56 // MM.PHASH_SEGS
        return sigs.select(
            "doc_id",
            F.explode(F.array(*[
                F.struct(F.lit(s).alias("s"),
                         F.expr(f"(sig >> {seg_w * s})"
                                f" & {(1 << seg_w) - 1}").alias("v"))
                for s in range(MM.PHASH_SEGS)])).alias("seg"),
        ).select("doc_id", F.col("seg.s").alias("s"),
                 F.col("seg.v").alias("v"))
    sigs = MM.bmp_dhash_segs(MM.synth_bmp(docs, grid_h=gh), grid_h=gh)
    return sigs.select("doc_id", F.posexplode("sig").alias("s", "v"))


def _pipeline_docs2(docs):
    """Rebuild the pipeline's stage-2 survivor set exactly as
    q_pipeline_llm does (clean gates + exact dedup + ExactSubstr
    scrub) — the frame its near-dedup stage blocks on."""
    score = T._quality_score(F.col("text"))
    gated = (docs
             .select("doc_id", "source", "text",
                     F.md5(F.col("text").cast("binary")).alias("fp"))
             .filter((score >= 0.75)
                     & (T._guessed_lang(F.col("text")) == "en")))
    kept = (gated
            .withColumn("_mi", F.min("doc_id").over(
                Window.partitionBy("fp")))
            .filter(F.col("doc_id") == F.col("_mi"))
            .select("doc_id", "source", "text")
            .localCheckpoint(eager=False))
    scrub = D.q_substring_prune(kept)
    return (scrub
            .join(kept.select("doc_id", "source"), "doc_id")
            .select("doc_id", F.col("cleaned_text").alias("text"),
                    "source")
            .localCheckpoint(eager=False))


def measure(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out: dict = {"n_docs": n}
    # 1. sized image groups
    gh = MM.image_sized_grid(n)
    out["grid_h"] = gh
    c = D.blocking_stats(_image_blocked_sized(docs, gh),
                         ["s", "v"]).collect()[0]
    out["img_cand_sized"] = int(c.candidate_pairs)
    out["img_max_occ"] = int(c.max_occ)
    out["wall_groups_sized"] = _wall(
        lambda: MM.q_image_dedup_groups(docs, n_docs=n))
    # 2. pipeline with the nd stage
    out["wall_pipeline"] = _wall(lambda: T.q_pipeline_llm(docs))
    docs2 = _pipeline_docs2(docs)
    n2 = docs2.count()
    out["n_docs2"] = n2
    c56 = D.blocking_stats(
        D.simhash_sized_segments(docs2, 56, 14), ["q", "qh"]).collect()[0]
    out["nd_cand_fixed"] = int(c56.candidate_pairs)
    sb, sw = D.simhash_sized_params(n)
    out["nd_sized_params"] = (sb, sw)
    cs = D.blocking_stats(
        D.simhash_sized_segments(docs2, sb, sw), ["q", "qh"]).collect()[0]
    out["nd_cand_sized"] = int(cs.candidate_pairs)
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    big_dir = (sys.argv[2] if len(sys.argv) > 2
               else f"/tmp/scale_trend_{mult}x")
    base_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("r12_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = measure(spark, base_dir)
    big = measure(spark, big_dir)
    print(f"\nbase: {base['n_docs']} docs; {mult}x: {big['n_docs']} docs")
    print(json.dumps({"base": base, f"{mult}x": big}))


if __name__ == "__main__":
    main()
