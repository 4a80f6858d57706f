"""Round-12 second wave (SCALE.md §Round 12):

1. q_pipeline_media walls at 1x (sf0.1-sized, 5k docs) / 30x / 100x
   under the sized operator defaults (n_docs routes BOTH modality
   hash widths). The media families synthesize from doc_id alone, so
   the trend corpora are plain id ranges — no salted text needed.
2. Audio blocked-candidate counters, declared 57-frame form vs the
   audio_sized_frames form, at the same scales: bucket telemetry
   (sum c*(c-1)/2 over (s, v) buckets — pairs never materialized),
   the blocking_stats discipline.

Usage: python tools/r12b_scale_probe.py [mults...]   # default 1 30 100
Run EXCLUSIVELY (no concurrent Spark) — walls are min-of-2.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from movie_rec_spark.operators import multimodal as MM  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402

BASE_DOCS = 5_000  # sf0.1's documents cardinality


def _wall(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 1)


def _bucket_candidates(segs_df) -> tuple[int, int]:
    """(blocked candidate pairs, max occupancy) from a (doc_id, s, v)
    frame — telemetry aggregation, pairs never materialized."""
    row = (segs_df.groupBy("s", "v").count()
           .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("c"),
                F.max("count").alias("m")).collect()[0])
    return int(row.c or 0), int(row.m or 0)


def _audio_segs_declared(docs):
    sigs = MM.wav_fingerprint(MM.synth_wav(docs))
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


def _audio_segs_sized(docs, nf: int):
    sigs = MM.wav_fingerprint_segs(
        MM.synth_wav(docs, n_frames=nf), n_frames=nf,
        n_segs=MM.AFP_HMAX + 1)
    return sigs.select("doc_id", F.posexplode("sig").alias("s", "v"))


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "30", "100"])]
    spark = get_spark()
    out = {}
    for mult in mults:
        n = BASE_DOCS * mult
        docs = spark.range(n).toDF("doc_id")
        nf = MM.audio_sized_frames(n)
        gh = MM.image_sized_grid(n)
        cd, md = _bucket_candidates(_audio_segs_declared(docs))
        if nf != MM.AFP_FRAMES:
            cs, ms = _bucket_candidates(_audio_segs_sized(docs, nf))
        else:
            cs, ms = cd, md
        w = _wall(lambda: MM.q_pipeline_media(docs, n_docs=n))
        kept = MM.q_pipeline_media(docs, n_docs=n).count()
        out[f"{mult}x"] = {
            "n_docs": n, "audio_frames": nf, "image_grid_h": gh,
            "aud_cand_declared56": cd, "aud_maxocc_declared": md,
            "aud_cand_sized": cs, "aud_maxocc_sized": ms,
            "pipeline_wall_s": w, "kept": kept,
        }
        print(mult, "x:", json.dumps(out[f"{mult}x"]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
