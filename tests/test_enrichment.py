"""S5 enrichment pipeline tests (offline fake fetcher)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from movie_rec_spark.sources import enrichment as EN


def _ids(spark, n=10):
    return spark.createDataFrame([Row(movie_id=i) for i in range(1, n + 1)])


def test_fetch_and_parse_shapes_json_jvm_side(spark):
    raw = EN.fetch_raw(_ids(spark), fetcher=EN.make_fake_fetcher(),
                       batch_size=3)
    out = {r.movie_id: r for r in EN.parse_enrichment(raw).collect()}
    assert len(out) == 10
    r = out[4]
    assert r.title == "Movie 4"
    assert 1950 <= r.year < 2020
    assert "|" in out[3].genres or out[3].genres  # pipe-joined when >1
    assert r.description == "Synopsis of movie 4."


def test_genres_pipe_join_counts(spark):
    raw = EN.fetch_raw(_ids(spark, 6), fetcher=EN.make_fake_fetcher())
    parsed = EN.parse_enrichment(raw)
    got = {r.movie_id: r.genres for r in parsed.collect()}
    # id i gets (i % 3) + 1 genres
    for i, g in got.items():
        assert len(g.split("|")) == (i % 3) + 1


def test_default_fetcher_raises(spark):
    with pytest.raises(Exception):
        EN.fetch_raw(_ids(spark, 2)).collect()
