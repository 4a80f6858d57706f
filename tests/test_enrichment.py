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


def test_datasource_partitions_plan_the_id_space():
    from movie_rec_spark.sources.restds import RestEnrichmentReader

    r = RestEnrichmentReader({"lo": "1", "hi": "101",
                              "num_partitions": "4"})
    parts = r.partitions()
    assert len(parts) == 4
    covered = [i for p in parts for i in range(p.lo, p.hi)]
    assert covered == list(range(1, 101))


def test_datasource_retry_survives_injected_transients(spark):
    from movie_rec_spark.sources.restds import read_enrichment

    df = read_enrichment(spark, 1, 201, num_partitions=4,
                         fail_every=2, backoff_s=0.0)
    got = {r.movie_id: r.title for r in df.collect()}
    assert len(got) == 200 and got[7] == "Movie 7"


def test_datasource_retry_exhaustion_fails_loudly(spark):
    from movie_rec_spark.sources.restds import read_enrichment

    df = read_enrichment(spark, 1, 201, num_partitions=1,
                         fail_every=1, retries=0, backoff_s=0.0)
    with pytest.raises(Exception, match="transient"):
        df.collect()


def test_datasource_matches_mapinpandas_enrichment_path(spark):
    """The registered source and the mapInPandas fetch_raw path share
    the fake-payload arithmetic; the parsed outputs must be identical
    row-for-row — two front doors, one answer."""
    from movie_rec_spark.sources.restds import read_enrichment

    ids = spark.createDataFrame([Row(movie_id=i) for i in range(1, 51)])
    via_map = EN.parse_enrichment(
        EN.fetch_raw(ids, fetcher=EN.make_fake_fetcher()))
    via_src = read_enrichment(spark, 1, 51, num_partitions=3)
    a = {tuple(r) for r in via_map.collect()}
    b = {tuple(r) for r in via_src.collect()}
    assert a == b


def test_datasource_streams_with_offset_resume(spark, tmp_path):
    """The STREAMING reader: id offsets advance per micro-batch, the
    checkpoint carries them, and a restarted query (with a wider id
    cap) resumes at the parked offset instead of refetching — 400
    distinct ids across the restart, zero duplicates. That is the
    exactly-once contract a polling REST ingester needs."""
    import time

    from movie_rec_spark.sources.restds import RestEnrichmentDataSource

    spark.dataSource.register(RestEnrichmentDataSource)
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def start(hi):
        return (spark.readStream.format("rest_enrichment")
                .option("lo", 1).option("hi", hi)
                .option("block", 100).load()
                .writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ck).start())

    def count():
        try:
            return spark.read.parquet(out).count()
        except Exception:  # noqa: BLE001 - sink dir not created yet
            return 0

    q = start(251)
    deadline = time.time() + 90
    while time.time() < deadline and count() < 250:
        time.sleep(0.5)
    q.stop()
    assert count() == 250
    q2 = start(401)
    deadline = time.time() + 90
    while time.time() < deadline and count() < 400:
        time.sleep(0.5)
    q2.stop()
    df = spark.read.parquet(out)
    assert df.count() == 400
    assert df.select("movie_id").distinct().count() == 400


# ---- S4 closed for real: a loopback http.server drives the actual ----
# ---- urllib socket path, with injected 503s exercising the retry ----

class _TMDBLoopbackHandler:
    """Builds a BaseHTTPRequestHandler class serving the deterministic
    fake corpus over REAL HTTP, failing each distinct chunk's FIRST
    request with 503 when fail_first=True."""

    @staticmethod
    def make(fail_first: bool):
        import json as _json
        from http.server import BaseHTTPRequestHandler
        from urllib.parse import parse_qs, urlparse

        from movie_rec_spark.sources.restds import _fake_fetch

        seen: set = set()

        class Handler(BaseHTTPRequestHandler):
            n_requests = 0
            n_failed = 0

            def do_GET(self):  # noqa: N802 - stdlib API name
                Handler.n_requests += 1
                ids = [int(x) for x in parse_qs(
                    urlparse(self.path).query)["ids"][0].split(",")]
                key = tuple(ids)
                if fail_first and key not in seen:
                    seen.add(key)
                    Handler.n_failed += 1
                    self.send_response(503)
                    self.end_headers()
                    return
                body = _json.dumps(
                    [_json.loads(r) for r in _fake_fetch(ids)]).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        return Handler


def _serve(handler_cls):
    import threading
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/api"


def test_http_datasource_survives_real_503s(spark):
    """mode=http against a live loopback server that 503s every
    chunk's first request: the reader's backoff retry must recover
    every row, and the server must have seen real retried requests."""
    from movie_rec_spark.sources.restds import RestEnrichmentDataSource

    handler = _TMDBLoopbackHandler.make(fail_first=True)
    srv, url = _serve(handler)
    try:
        spark.dataSource.register(RestEnrichmentDataSource)
        df = (spark.read.format("rest_enrichment")
              .option("mode", "http").option("base_url", url)
              .option("lo", 1).option("hi", 201)
              .option("num_partitions", 4)
              .option("batch_size", 32)
              .option("backoff_s", 0.05)
              .load())
        rows = df.collect()
    finally:
        srv.shutdown()
    assert len(rows) == 200
    assert {r.movie_id for r in rows} == set(range(1, 201))
    assert handler.n_failed >= 4, "503 injection never fired"
    assert handler.n_requests > handler.n_failed, "no retries happened"


def test_http_fetcher_matches_fake_path_end_to_end(spark):
    """make_http_fetcher through mapInPandas + JVM parsing equals the
    injected-fake path bit-for-bit — the socket is the only variable,
    so S4's real transport provably changes nothing downstream."""
    from movie_rec_spark.sources.enrichment import (
        fetch_raw,
        make_fake_fetcher,
        make_http_fetcher,
        parse_enrichment,
    )

    handler = _TMDBLoopbackHandler.make(fail_first=False)
    srv, url = _serve(handler)
    try:
        ids = spark.range(1, 101).withColumnRenamed("id", "movie_id")
        via_http = parse_enrichment(
            fetch_raw(ids, fetcher=make_http_fetcher(url, backoff_s=0.05),
                      batch_size=16)).collect()
    finally:
        srv.shutdown()
    via_fake = parse_enrichment(
        fetch_raw(ids, fetcher=make_fake_fetcher(), batch_size=16)).collect()
    assert sorted(map(tuple, via_http)) == sorted(map(tuple, via_fake))
    assert handler.n_requests > 0
