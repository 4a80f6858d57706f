"""End-to-end pipeline (pipeline.py): the reference's
ingest→compact→stats→train→persist→serve flow as one composable job
(estimator.py:104-129 + statistics.py:19-35 + controller.py:180-314
semantics), on a deterministic synthetic ratings table.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from movie_rec_spark import schemas
from movie_rec_spark.pipeline import (
    compact_ratings,
    movie_stats,
    run_pipeline,
    serve_recommendations,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def raw_ratings(spark):
    rows = []
    # 12 users x 8 movies, deterministic half-star ratings; movie 7 rated
    # by only 3 users (below the HAVING limit); user 1 re-rates movie 0
    # (upsert case: old 1.0 -> new 4.5).
    for u in range(1, 13):
        for m in range(8):
            if m == 7 and u > 3:
                continue
            r = 0.5 + ((u * 3 + m * 5) % 10) * 0.5
            rows.append((u, m, r, False, T0 + dt.timedelta(minutes=u * 10 + m)))
    # movies 8..11 rated by everyone EXCEPT user 1 — guaranteed-unseen,
    # stats-eligible serving candidates for user 1
    for u in range(2, 13):
        for m in range(8, 12):
            r = 0.5 + ((u * 3 + m * 5) % 10) * 0.5
            rows.append((u, m, r, False, T0 + dt.timedelta(minutes=u * 10 + m)))
    rows.append((1, 0, 1.0, False, T0 - dt.timedelta(days=1)))  # stale dupe
    rows.append((2, 1, None, True, T0 + dt.timedelta(days=2)))  # implicit watch
    return spark.createDataFrame(rows, schemas.RATINGS)


def test_compact_latest_wins(raw_ratings):
    compacted = compact_ratings(raw_ratings)
    assert compacted.groupBy("user_id", "movie_id").count().filter(
        F.col("count") > 1).count() == 0
    row = compacted.filter((F.col("user_id") == 1) & (F.col("movie_id") == 0)).collect()[0]
    assert row["rating"] == 2.0  # newest ts won, stale 1.0 dropped


def test_movie_stats_having_and_explicit_only(raw_ratings):
    stats = movie_stats(compact_ratings(raw_ratings))
    ids = {r["movie_id"] for r in stats.collect()}
    assert 7 not in ids          # only 3 raters, HAVING count > 5
    assert 1 in ids
    # movie 1: user 2's row became implicit (upsert) -> 11 explicit raters
    m1 = stats.filter(F.col("movie_id") == 1).collect()[0]
    assert m1["count_users"] == 11


def test_full_pipeline_and_serving(spark, raw_ratings, tmp_path):
    result = run_pipeline(
        spark, raw_ratings, out_dir=str(tmp_path),
        top_n=5, als_kwargs={"rank": 4, "max_iter": 5},
    )
    # recs: <= top_n per user, scores clamped into the rating domain
    per_user = result.recommendations.groupBy("user_id").count().collect()
    assert per_user and all(r["count"] <= 5 for r in per_user)
    bad = result.recommendations.filter(
        (F.col("score") < 0.5) | (F.col("score") > 5.0)).count()
    assert bad == 0
    # kv encoding round-trips the rank order
    kv = {r["key"]: r["value"] for r in result.rec_kv.collect()}
    u1 = result.recommendations.filter(F.col("user_id") == 1) \
        .orderBy("rank").select("item_id").collect()
    assert kv["u1"] == ";".join(str(r["item_id"]) for r in u1)
    # gold tables persisted
    assert spark.read.parquet(str(tmp_path / "movie_stats")).count() == \
        result.movie_stats.count()
    # serving: never recommend an already-rated movie, ALS recs first
    served = serve_recommendations(result, user_id=1, n=10).collect()
    seen = {r["movie_id"] for r in
            result.ratings.filter(F.col("user_id") == 1).collect()}
    assert served and all(r["item_id"] not in seen for r in served)
    sources = [r["rec_source"] for r in served]
    assert sources.index("als") < len(sources) if "als" in sources else True
    first_backfill = sources.index("popular") if "popular" in sources else len(sources)
    assert all(s == "als" for s in sources[:first_backfill])
