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


class _FakeJdbcReader:
    """Captures the DataFrameReader option-chain; load() returns a marker."""

    def __init__(self):
        self.options: dict[str, str] = {}
        self.fmt = None

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self):
        return ("loaded", self.fmt, dict(self.options))


class _FakeJdbcWriter(_FakeJdbcReader):
    def __init__(self):
        super().__init__()
        self.saved_mode = None

    def mode(self, m):
        self.saved_mode = m
        return self

    def save(self):
        self.saved = True


def test_read_jdbc_partitioned_option_contract(spark):
    from movie_rec_spark.sources.jdbc import read_jdbc

    fake = _FakeJdbcReader()
    out = read_jdbc(
        spark, "jdbc:postgresql://db/movies", "ratings",
        user="u", driver="org.postgresql.Driver",
        partition_column="id", lower_bound=1, upper_bound=1_000_000,
        num_partitions=16, reader=fake)
    marker, fmt, opts = out
    assert marker == "loaded" and fmt == "jdbc"
    assert opts["url"] == "jdbc:postgresql://db/movies"
    assert opts["dbtable"] == "ratings"
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "1000000")
    assert opts["numPartitions"] == "16"


def test_read_jdbc_unbounded_warns_and_bounds_require_all(spark):
    import warnings

    import pytest

    from movie_rec_spark.sources.jdbc import read_jdbc

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        read_jdbc(spark, "jdbc:x", "t", reader=_FakeJdbcReader())
    assert any("single-task scan" in str(x.message) for x in w)
    with pytest.raises(ValueError, match="partition_column requires"):
        read_jdbc(spark, "jdbc:x", "t", partition_column="id",
                  reader=_FakeJdbcReader())


def test_write_jdbc_chunked_option_contract(spark):
    from movie_rec_spark.sources.jdbc import write_jdbc

    df = spark.range(10)
    fake = _FakeJdbcWriter()
    write_jdbc(df, "jdbc:postgresql://db/movies", "ratings",
               mode="overwrite", batchsize=500, writer=fake)
    assert fake.saved and fake.saved_mode == "overwrite"
    assert fake.options["batchsize"] == "500"
    assert fake.options["isolationLevel"] == "READ_COMMITTED"


def test_jsonl_roundtrip_and_parse(spark, tmp_path):
    """JSON-lines sink -> typed source round trip preserves values; an
    embedded JSON string column parses JVM-side with from_json."""
    from pyspark.sql import Row
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from movie_rec_spark.sources.jsonl import (
        parse_json_column, read_jsonl, write_jsonl,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("score", DoubleType()),
    ])
    rows = [Row(doc_id=1, text='has "quotes", commas', score=0.5),
            Row(doc_id=2, text="plain", score=1.25)]
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(spark.createDataFrame(rows, schema), path)
    back = read_jsonl(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))

    inner = StructType([StructField("lang", StringType()),
                        StructField("stars", LongType())])
    df = spark.createDataFrame(
        [Row(doc_id=1, js='{"lang": "en", "stars": 4}')])
    parsed = parse_json_column(df, "js", inner).select(
        "doc_id", "parsed.lang", "parsed.stars").collect()[0]
    assert (parsed.doc_id, parsed.lang, parsed.stars) == (1, "en", 4)


def test_jsonl_corrupt_record_modes(spark, tmp_path):
    """PERMISSIVE keeps malformed rows as nulls; DROPMALFORMED drops
    them — the explicit corrupt-record policy, never inference."""
    from pyspark.sql.types import LongType, StructField, StructType

    from movie_rec_spark.sources.jsonl import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1}\nnot json at all\n{"doc_id": 2}\n')
    schema = StructType([StructField("doc_id", LongType())])
    permissive = read_jsonl(spark, str(p), schema).collect()
    assert len(permissive) == 3
    dropped = read_jsonl(spark, str(p), schema,
                         mode="DROPMALFORMED").collect()
    assert sorted(r.doc_id for r in dropped) == [1, 2]


def test_kvfile_writer_commits_manifest(spark, tmp_path):
    """The registered writer's commit protocol: staged per-task files
    publish atomically via one manifest; read-back sees every row."""
    from movie_rec_spark.sources.kv import (
        KVFileDataSource,
        read_kv_manifested,
    )

    spark.dataSource.register(KVFileDataSource)
    out = str(tmp_path / "kvout")
    df = spark.createDataFrame(
        [(f"u{i}", f"{i};{i+1}") for i in range(100)],
        "key string, value string").repartition(4)
    df.write.format("kvfile").option("path", out).mode("append").save()
    import json
    import os
    man = json.load(open(os.path.join(out, "_manifest.json")))
    assert man["rows"] == 100 and 1 <= len(man["files"]) <= 4
    back = {r.key: r.value
            for r in read_kv_manifested(spark, out).collect()}
    assert len(back) == 100 and back["u7"] == "7;8"


def test_kvfile_writer_abort_leaves_no_manifest(spark, tmp_path):
    """A failing task aborts the job: no manifest is published, so a
    manifested read sees NOTHING — partial flushes stay invisible."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from movie_rec_spark.sources.kv import KVFileDataSource

    spark.dataSource.register(KVFileDataSource)
    out = str(tmp_path / "kvfail")
    from pyspark.sql.types import StringType

    @F.udf(returnType=StringType())
    def poison(v):
        if v == 99:
            raise RuntimeError("poison row")
        return str(v)

    df = spark.range(100).select(
        F.concat(F.lit("u"), "id").alias("key"), poison("id").alias("value"))
    with pytest.raises(Exception):
        df.coalesce(1).write.format("kvfile") \
          .option("path", out).mode("append").save()
    assert not os.path.exists(os.path.join(out, "_manifest.json"))
