"""CSV source + KV sink tests (SURVEY.md §2.1 S1-S3, S9-S11)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from movie_rec_spark.sources import csv as C
from movie_rec_spark.sources import kv as KV


def test_read_ratings_csv(spark, tmp_path):
    p = tmp_path / "ratings.csv"
    p.write_text(
        "userId,movieId,rating,timestamp\n"
        "1,10,3.5,1704067200\n"
        "2,20,5.0,1704067260\n"
    )
    out = C.read_ratings_csv(spark, str(p)).collect()
    assert {(r.user_id, r.movie_id, r.rating) for r in out} == {
        (1, 10, 3.5), (2, 20, 5.0)}
    assert out[0].ts.year == 2024


def test_read_links_csv_prunes_columns(spark, tmp_path):
    p = tmp_path / "links.csv"
    p.write_text("movieId,imdbId,tmdbId\n1,tt1,100\n2,tt2,200\n")
    df = C.read_links_csv(spark, str(p))
    assert df.columns == ["movie_id", "tmdb_id"]
    assert {(r.movie_id, r.tmdb_id) for r in df.collect()} == {(1, 100), (2, 200)}


def test_read_quoted_csv_multiline(spark, tmp_path):
    p = tmp_path / "movies.csv"
    p.write_text(
        '"movieId","title","description"\n'
        '"1","Comma, The Movie","line one\nline two"\n'
        '"2","Quote ""inner"" title","plain"\n'
    )
    schema = StructType([
        StructField("movieId", IntegerType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
    ])
    out = {r.movieId: r for r in
           C.read_quoted_csv(spark, str(p), schema).collect()}
    assert out[1].title == "Comma, The Movie"
    assert out[1].description == "line one\nline two"
    assert out[2].title == 'Quote "inner" title'


def test_kv_roundtrip_with_batching(spark, tmp_path):
    recs = spark.createDataFrame([
        Row(user_id=u, item_id=u * 10 + r, score=5.0 - r, rank=r)
        for u in (1, 2) for r in (1, 2, 3)
    ])
    encoded = KV.encode_rec_list(recs, n=2)
    rows = {r.key: r.value for r in encoded.collect()}
    assert rows == {"u1": "11;12", "u2": "21;22"}

    out_dir = str(tmp_path / "kv")
    os.makedirs(out_dir, exist_ok=True)
    KV.write_kv(encoded, "key", "value",
                client_factory=lambda: KV.FileKVClient(out_dir),
                batch_size=1)
    lines = []
    for f in glob.glob(f"{out_dir}/*.kv"):
        lines += open(f).read().splitlines()
    assert sorted(lines) == ["u1\t11;12", "u2\t21;22"]

    decoded = KV.decode_rec_list(encoded)
    got = {r.user_id: r.item_ids for r in decoded.collect()}
    assert got == {1: [11, 12], 2: [21, 22]}
