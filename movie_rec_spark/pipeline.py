"""End-to-end movie-rec pipeline — the reference's three jobs composed.

Reference flow (SURVEY.md §3.3/§3.4):
  1. ingest: CSV → typed ratings table (prepare_dataset.py:76-87)
  2. compact: composite-PK upsert semantics (session.merge, M2)
  3. stats: per-movie count/avg with HAVING (statistics.py:19-35, T2)
  4. train + top-N: SVD → per-user top-20 (estimator.py:104-129, T1)
  5. persist: pipelined KV writes (estimator.py:81-102, S9)
  6. serve: recs minus already-rated, popularity back-fill (T4)

Here each stage is a pure transform over gold parquet tables; the
15/30-minute cadence is an external trigger (cron/Structured Streaming
``trigger(processingTime=...)`` — streaming/counters.py) re-running
``run_pipeline``. Nothing in the flow collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_rec_spark import ml
from movie_rec_spark.operators.mutation import upsert_latest
from movie_rec_spark.sources import kv as KV

STAT_LOWER_LIMIT = 5   # web/config.py:27
TOP_N = 20             # web/config.py:26


@dataclass
class PipelineResult:
    ratings: DataFrame        # deduped (user_id, movie_id) latest-wins
    movie_stats: DataFrame    # movie_id, count_users, avg_ratings
    recommendations: DataFrame  # user_id, item_id, score, rank
    rec_kv: DataFrame         # key "u{uid}", value "id;id;..."


def compact_ratings(raw_ratings: DataFrame) -> DataFrame:
    """M2: one row per (user_id, movie_id), newest ts wins — the batch
    equivalent of the reference's ``session.merge`` upsert."""
    return upsert_latest(
        raw_ratings, keys=("user_id", "movie_id"),
        ts_col="ts", tiebreak_col="rating",
    )


def movie_stats(ratings: DataFrame,
                lower_limit: int = STAT_LOWER_LIMIT) -> DataFrame:
    """statistics.py:19-35: explicit ratings only, count/avg per movie,
    strict HAVING count > lower_limit."""
    return (
        ratings.filter(~F.col("is_implicit"))
        .groupBy("movie_id")
        .agg(
            F.count("user_id").cast("int").alias("count_users"),
            F.avg("rating").alias("avg_ratings"),
        )
        .filter(F.col("count_users") > F.lit(lower_limit))
    )


def run_pipeline(spark: SparkSession, raw_ratings: DataFrame,
                 out_dir: str | None = None,
                 top_n: int = TOP_N,
                 als_kwargs: dict | None = None) -> PipelineResult:
    """The full recompute job (T1+T2). With ``out_dir``, gold tables are
    written as parquet (the Redis-materialization replacement, S9/S10)."""
    ratings = compact_ratings(raw_ratings)
    stats = movie_stats(ratings)

    als_input = ratings.select(
        "user_id",
        F.col("movie_id").alias("item_id"),
        "rating",
    ).filter(F.col("rating").isNotNull())
    model = ml.train_als(als_input, **(als_kwargs or {}))
    recs = ml.recommend_top_n(model, top_n)
    rec_kv = KV.encode_rec_list(recs, top_n)

    if out_dir:
        stats.write.mode("overwrite").parquet(f"{out_dir}/movie_stats")
        recs.write.mode("overwrite").parquet(f"{out_dir}/recommendations")
        rec_kv.write.mode("overwrite").parquet(f"{out_dir}/rec_kv")
    return PipelineResult(ratings, stats, recs, rec_kv)


def serve_recommendations(result: PipelineResult, user_id: int,
                          n: int = 10) -> DataFrame:
    """T4 read path: PRECOMPUTED recs (the pipeline's gold table — no
    model fit at serve time) minus CURRENT ratings (freshness
    reconciliation, controller.py:227-233 intent), back-filled from the
    popularity ranking (README.md:42-44). The overlay itself is the
    shared oracle-checked operator (relational.serve_overlay)."""
    from movie_rec_spark.operators.relational import serve_overlay

    seen = (
        result.ratings.filter(F.col("user_id") == user_id)
        .select(F.col("movie_id").alias("item_id"))
    )
    recs = (
        result.recommendations.filter(F.col("user_id") == user_id)
        .select("item_id", "score", F.lit("als").alias("rec_source"))
    )
    popularity = result.movie_stats.select(
        F.col("movie_id").alias("item_id"),
        F.col("count_users").cast("double").alias("score"),
    )
    return serve_overlay(recs, seen, popularity, n)