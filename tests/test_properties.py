"""Property tests (hypothesis) for the semantically-tricky operators
(SURVEY.md §5d): round-to-half HALF_UP, latest-wins upsert, as-of join,
salted aggregation, sessionization — each checked against a pure-Python
reference model on generated inputs."""

from __future__ import annotations

import datetime as dt
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hyp import SLOW
from pyspark.sql import functions as F

from movie_rec_spark.functions import round_half_up
from movie_rec_spark.operators.mutation import upsert_latest
from movie_rec_spark.operators.skew import salted_count
from movie_rec_spark.operators.temporal import asof_join, q_sessionize

EPOCH = dt.datetime(2024, 1, 1)


def _model_round_half(x: float) -> float:
    """Reference model: HALF_UP on the shortest decimal repr of 2x —
    exactly what Spark's round() (BigDecimal.valueOf) does."""
    return float(Decimal(repr(x * 2)).quantize(Decimal("1"), ROUND_HALF_UP)) / 2


@SLOW
@given(st.lists(st.integers(min_value=0, max_value=101), min_size=1,
                max_size=30))
def test_round_half_up_matches_decimal_model(spark, twentieths):
    # n/20 grid covers every .x25/.x75 tie plus plenty of non-ties.
    vals = [n / 20 for n in twentieths]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in
           df.select(round_half_up(F.col("x")).alias("y")).collect()]
    assert got == [_model_round_half(v) for v in vals]


@SLOW
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3),   # user, movie
              st.integers(0, 5),                      # ts offset (collides)
              st.integers(0, 10_000)),                # unique-ish tiebreak
    min_size=1, max_size=40))
def test_upsert_latest_keeps_max_ts_then_tiebreak(spark, rows):
    # make tiebreak unique so the winner is fully deterministic
    data = [(u, m, ts, i * 100_000 + tb)
            for i, (u, m, ts, tb) in enumerate(rows)]
    df = spark.createDataFrame(
        [(u, m, EPOCH + dt.timedelta(hours=ts), tb) for u, m, ts, tb in data],
        "user_id int, movie_id int, ts timestamp, event_id long")
    got = {(r.user_id, r.movie_id): (r.ts, r.event_id)
           for r in upsert_latest(
               df, keys=("user_id", "movie_id"), ts_col="ts",
               tiebreak_col="event_id").collect()}
    model: dict[tuple, tuple] = {}
    for u, m, ts, tb in data:
        t = EPOCH + dt.timedelta(hours=ts)
        if (u, m) not in model or (t, tb) > model[(u, m)]:
            model[(u, m)] = (t, tb)
    assert got == model


@SLOW
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
             min_size=1, max_size=25),          # events: (key, ts)
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20),
                       st.integers(0, 100)),
             min_size=0, max_size=25))          # snaps: (key, ts, val)
def test_asof_join_matches_point_in_time_model(spark, events, snaps):
    edf = spark.createDataFrame(
        [(i, k, EPOCH + dt.timedelta(minutes=t))
         for i, (k, t) in enumerate(events)],
        "event_id long, user_id int, ts timestamp")
    sdf = spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(minutes=t), v) for k, t, v in snaps],
        "user_id int, snap_ts timestamp, val int")
    got = {r.event_id: r.val for r in asof_join(
        edf, sdf, key="user_id", event_ts="ts", snap_ts="snap_ts",
        value_cols=["val"]).collect()}
    for i, (k, t) in enumerate(events):
        eligible = [(ts, v) for (sk, ts, v) in snaps if sk == k and ts <= t]
        want = max(eligible)[1] if eligible else None
        assert got[i] == want, (i, k, t, eligible)


@SLOW
@given(st.lists(st.integers(0, 4), min_size=1, max_size=60),
       st.integers(1, 5))
def test_salted_count_equals_plain_count(spark, keys, n_salts):
    df = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "user_id int, event_id int")
    got = {r.user_id: r.n
           for r in salted_count(df, "user_id", n_salts).collect()}
    want: dict[int, int] = {}
    for k in keys:
        want[k] = want.get(k, 0) + 1
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 300)),
                min_size=1, max_size=40))
def test_sessionize_matches_gap_model(spark, rows):
    df = spark.createDataFrame(
        [(i, EPOCH + dt.timedelta(minutes=t), k, "view", 1.0, "")
         for i, (k, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    got = {(r.user_id, r.session_start.minute + 60 * r.session_start.hour,
            r.session_end.minute + 60 * r.session_end.hour): r.n_events
           for r in q_sessionize(df).collect()}
    # model: sort each user's minutes; split where gap > 30
    model: dict[tuple, int] = {}
    by_user: dict[int, list[int]] = {}
    for k, t in rows:
        by_user.setdefault(k, []).append(t)
    for k, ts in by_user.items():
        ts.sort()
        start, prev, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - prev > 30:
                model[(k, start, prev)] = n
                start, n = t, 0
            prev = t
            n += 1
        model[(k, start, prev)] = n
    assert got == model


def test_operators_handle_empty_inputs(spark):
    """Empty-input totality: core custom operators must return empty
    results (correct schema), not raise, when a partition or whole
    input is empty — at 100 TB empty partitions are routine."""
    from movie_rec_spark.operators.skew import salted_count
    from movie_rec_spark.operators.temporal import (
        asof_join,
        q_sessionize,
        range_join_binned,
    )

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
    empty_snap = spark.createDataFrame(
        [], "user_id long, snap_ts timestamp, val int")

    assert q_sessionize(empty_ev).count() == 0
    assert salted_count(empty_ev, "user_id").count() == 0
    assert asof_join(
        empty_ev.select("event_id", "user_id", "ts"), empty_snap,
        key="user_id", event_ts="ts", snap_ts="snap_ts",
        value_cols=["val"]).count() == 0
    iv = empty_snap.select(
        "user_id",
        F.col("snap_ts").alias("win_start"),
        F.col("snap_ts").alias("win_end"))
    assert range_join_binned(
        empty_ev.select("event_id", "user_id", "ts"), iv,
        key="user_id", left_ts="ts", right_start="win_start",
        right_end="win_end", bin_seconds=3600).count() == 0


def test_new_text_dedup_ops_handle_empty_inputs(spark):
    """Empty-input totality for the round-3 operators."""
    from movie_rec_spark.operators.dedup import q_dedup_incremental
    from movie_rec_spark.operators.text import (
        q_domain_stats,
        q_ngram_counts,
        q_pack_sequences,
    )

    empty_docs = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint")
    assert q_ngram_counts(empty_docs).count() == 0
    assert q_domain_stats(empty_docs).count() == 0
    assert q_dedup_incremental(empty_docs).count() == 0
    assert q_pack_sequences(empty_docs).count() == 0


def test_quantize_and_int8_knn_empty_corpus(spark):
    from movie_rec_spark.operators.similarity import q_embed_quantize

    empty_emb = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>, label int")
    assert q_embed_quantize(empty_emb).count() == 0


@SLOW
@given(st.lists(st.lists(st.integers(0, 5), min_size=1, max_size=12),
                min_size=1, max_size=6))
def test_chunk_prune_matches_reference_model(spark, token_lists):
    """q_chunk_prune against a pure-Python model: chunk each doc into
    stride-3 windows, keep a chunk only at its first (doc, idx)
    occurrence, reassemble in order."""
    from movie_rec_spark.operators.dedup import q_chunk_prune
    texts = [" ".join(f"w{t}" for t in toks) for toks in token_lists]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    got = {r.doc_id: r for r in q_chunk_prune(df, k=3).collect()}

    seen, model = set(), {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        chunks = [" ".join(w[j:j + 3]) for j in range(0, len(w), 3)]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        model[i] = (len(chunks), len(kept), " ".join(kept))
    for i, (nc, nk, txt) in model.items():
        assert (got[i].n_chunks, got[i].n_kept, got[i].cleaned_text) \
            == (nc, nk, txt)


@SLOW
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)),
                min_size=0, max_size=15),
       st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)),
                min_size=0, max_size=15))
def test_snapshot_diff_matches_set_model(spark, old_rows, new_rows):
    """snapshot_diff against dict-model semantics: keys classify by
    presence/equality; latest value per key wins via max (the model
    dedupes the generated rows the same way)."""
    from movie_rec_spark.operators.mutation import snapshot_diff
    old_m = {}
    for k, v in old_rows:
        old_m[k] = max(old_m.get(k, v), v)
    new_m = {}
    for k, v in new_rows:
        new_m[k] = max(new_m.get(k, v), v)
    old = spark.createDataFrame(
        [(k, v) for k, v in old_m.items()] or [(None, None)],
        "k bigint, v bigint").filter("k is not null")
    new = spark.createDataFrame(
        [(k, v) for k, v in new_m.items()] or [(None, None)],
        "k bigint, v bigint").filter("k is not null")
    got = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
    for k in set(old_m) | set(new_m):
        if k not in new_m:
            assert got[k] == "removed"
        elif k not in old_m:
            assert got[k] == "added"
        elif old_m[k] != new_m[k]:
            assert got[k] == "changed"
        else:
            assert got[k] == "unchanged"
    assert set(got) == set(old_m) | set(new_m)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.tuples(st.integers(0, 6),        # id
                       st.integers(1, 3),        # day (partition)
                       st.integers(0, 50),       # ts
                       st.booleans()),           # tombstone
             min_size=1, max_size=5),
    min_size=1, max_size=4))
def test_snapshot_merge_matches_dict_model(spark, tmp_path_factory, batches):
    """Model-based: a random sequence of merge batches against the
    snapshot table equals a python dict applying the same Delta
    semantics (latest-wins collapse inside a batch, ts-guarded update,
    tombstone delete, insert) — table state AND version count agree
    after every commit."""
    from movie_rec_spark.sources.snapshot import (
        snapshot_create,
        snapshot_merge,
        snapshot_read,
        snapshot_version,
    )

    path = str(tmp_path_factory.mktemp("snapmodel") / "tbl")
    seed = [(i, 1 + i % 3, -1, f"seed{i}") for i in range(3)]
    schema = "id bigint, day bigint, ts bigint, val string"
    snapshot_create(
        spark, path, spark.createDataFrame(seed, schema), "day")
    model = {(i, d): (ts, v) for i, d, ts, v in seed}

    for bi, batch in enumerate(batches):
        # latest-wins collapse to key-unique (max ts, later row wins tie)
        collapsed: dict = {}
        for j, (i, d, ts, dead) in enumerate(batch):
            k = (i, d)
            if k not in collapsed or (ts, j) >= collapsed[k][:2]:
                collapsed[k] = (ts, j, dead)
        rows = [(i, d, ts, f"b{bi}", dead)
                for (i, d), (ts, _j, dead) in collapsed.items()]
        snapshot_merge(
            spark, path,
            spark.createDataFrame(
                rows, schema + ", _deleted boolean"),
            keys=["id", "day"], ts_col="ts")
        for (i, d), (ts, _j, dead) in collapsed.items():
            k = (i, d)
            in_t = k in model
            wins = (not in_t) or ts >= model[k][0]
            if wins and dead:
                model.pop(k, None)
            elif wins:
                model[k] = (ts, f"b{bi}")
            # stale updates (incl. stale tombstones) are ignored
        got = {(r.id, r.day): (r.ts, r.val)
               for r in snapshot_read(spark, path).collect()}
        assert got == model, f"after batch {bi}"
    assert snapshot_version(path) == 1 + len(batches)


def test_snapshot_orphans_from_failed_commit_are_vacuumed(spark, tmp_path):
    """Crash-safety: data files written but never published (a writer
    dying before its version claim, or losing the race) are invisible
    to readers and reclaimed by vacuum; the table is untouched."""
    from pyspark.sql import Row

    from movie_rec_spark.sources.snapshot import (
        _write_data_files,
        snapshot_create,
        snapshot_read,
        snapshot_vacuum,
        snapshot_version,
    )

    path = str(tmp_path / "orph")
    snapshot_create(
        spark, path,
        spark.createDataFrame([Row(id=1, day=1, val="a")]), "day")
    # simulate the crash: files land, no manifest is ever claimed
    orphans = _write_data_files(
        spark.createDataFrame([Row(id=9, day=1, val="ghost")]),
        path, "day")
    assert orphans
    assert {r.id for r in snapshot_read(spark, path).collect()} == {1}
    res = snapshot_vacuum(spark, path, keep_versions=2, retention_s=0.0)
    assert res["removed_files"] >= len(orphans)
    import os
    assert all(not os.path.exists(e["path"]) for e in orphans)
    assert snapshot_version(path) == 1
    assert {r.id for r in snapshot_read(spark, path).collect()} == {1}


@SLOW
@given(st.lists(
    st.tuples(st.integers(min_value=1, max_value=5),      # user
              st.integers(min_value=0, max_value=7200),   # offset sec
              st.sampled_from(["a", "b", "c"])),          # type
    min_size=1, max_size=40, unique_by=lambda t: (t[0], t[1])))
def test_session_paths_conserve_events_against_model(spark, evs):
    """Σ(path_len × n_sessions) == |events|, and the per-path counts
    match a pure-Python gap-rule model on generated inputs."""
    from collections import Counter

    from movie_rec_spark.operators.temporal import q_session_paths
    rows = [(i, EPOCH + dt.timedelta(seconds=off), u, t)
            for i, (u, off, t) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")
    got = {(r.path, r.path_len): r.n_sessions
           for r in q_session_paths(df, gap_sec=1800).collect()}
    assert sum(pl * n for (_, pl), n in got.items()) == len(rows)
    # pure-Python model
    by_user: dict[int, list[tuple[dt.datetime, int, str]]] = {}
    for i, (u, off, t) in enumerate(evs):
        by_user.setdefault(u, []).append(
            (EPOCH + dt.timedelta(seconds=off), i, t))
    want: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        path: list[str] = []
        prev = None
        for ts, _, t in seq:
            if prev is not None and (ts - prev).total_seconds() > 1800:
                want[(">".join(path), len(path))] += 1
                path = []
            path.append(t)
            prev = ts
        want[(">".join(path), len(path))] += 1
    assert got == dict(want)


@SLOW
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=19),
                          st.integers(min_value=0, max_value=10000)),
                min_size=4, max_size=60))
def test_event_transitions_counts_match_model(spark, evs):
    """Transition counts equal the adjacent-pair census of each user's
    (ts, event_id)-ordered sequence; probabilities sum to 1 per from."""
    from collections import Counter

    from movie_rec_spark.operators.temporal import q_event_transitions
    rows = [(i, EPOCH + dt.timedelta(seconds=s), u % 4,
             "t" + str(u % 3)) for i, (u, s) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")
    got = {(r.from_type, r.to_type): r.n_pairs
           for r in q_event_transitions(df).collect()}
    by_user: dict[int, list] = {}
    for i, (u, s) in enumerate(evs):
        by_user.setdefault(u % 4, []).append(
            (EPOCH + dt.timedelta(seconds=s), i, "t" + str(u % 3)))
    want: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


@SLOW
@given(st.lists(st.integers(min_value=0, max_value=30),
                min_size=1, max_size=120),
       st.integers(min_value=2, max_value=5))
def test_misra_gries_candidates_complete_model(spark, keys, capacity):
    """Sketch completeness under random multisets and tiny capacities
    (forcing heavy decrement churn): every key whose count exceeds
    n/capacity must appear in the candidate set, and q_heavy_hitters
    must return exactly the over-threshold keys with exact counts."""
    from collections import Counter

    from movie_rec_spark.operators.skew import (
        misra_gries_candidates,
        q_heavy_hitters,
    )
    df = spark.createDataFrame([(k,) for k in keys],
                               "user_id long").repartition(4)
    c = Counter(keys)
    n = len(keys)
    heavy = {k for k, v in c.items() if v * capacity > n}
    cands = {r.user_id for r in
             misra_gries_candidates(df, "user_id", capacity).collect()}
    assert heavy <= cands
    got = {r.user_id: r.n_occurrences
           for r in q_heavy_hitters(df, capacity).collect()}
    assert got == {k: c[k] for k in heavy}


@SLOW
@given(st.lists(st.lists(st.integers(0, 9), min_size=3, max_size=10),
                min_size=2, max_size=12))
def test_prefix_jaccard_equals_full_index_model(spark, token_lists):
    """Prefix filtering never changes the answer: on random small-
    vocabulary docs (maximal shingle collisions), the prefix-filtered
    pair set and jaccard values equal the full inverted index's."""
    from movie_rec_spark.operators.dedup import (
        q_dedup_jaccard,
        q_dedup_prefix,
    )
    from pyspark.sql import Row
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"w{t}" for t in toks),
             lang="en", source="s", n_chars=1)
         for i, toks in enumerate(token_lists)])
    full = {(r.doc_a, r.doc_b): r.jaccard
            for r in q_dedup_jaccard(docs).collect()}
    pref = {(r.doc_a, r.doc_b): r.jaccard
            for r in q_dedup_prefix(docs).collect()}
    assert pref == full


@SLOW
@given(st.lists(st.tuples(st.integers(0, 3),      # user
                          st.integers(0, 5000),   # second offset
                          st.integers(0, 400)),   # cents
                min_size=1, max_size=50))
def test_twap_matches_holding_time_model(spark, evs):
    """TWAP equals the pure-Python holding-time weighted mean over
    each user's (ts, event_id)-ordered sequence; zero-span users are
    absent; interval count excludes only the final observation."""
    from movie_rec_spark.operators.temporal import q_twap
    rows = [(i, EPOCH + dt.timedelta(seconds=s), u, "e", c / 100)
            for i, (u, s, c) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    got = {r.user_id: (r.n_intervals, r.span_ms, r.twap)
           for r in q_twap(df).collect()}
    by_user: dict[int, list] = {}
    for i, (u, s, c) in enumerate(evs):
        by_user.setdefault(u, []).append((s * 1000, i, c))
    want = {}
    for u, seq in by_user.items():
        seq.sort()
        gaps = [(b[0] - a[0], a[2]) for a, b in zip(seq, seq[1:])]
        span = sum(g for g, _ in gaps)
        if not gaps or span == 0:
            continue
        wsum = sum(g * c for g, c in gaps)
        want[u] = (len(gaps), span, round(wsum / span / 100, 4))
    assert got == want


def test_round6_wave_ops_handle_empty_inputs(spark):
    """Empty-input totality for the round-6 wave: every new operator
    returns an empty result with the right schema, never raises —
    empty partitions and empty tables are routine at scale."""
    from movie_rec_spark.operators.dedup import khop_counts, q_dedup_prefix
    from movie_rec_spark.operators.skew import q_heavy_hitters
    from movie_rec_spark.operators.temporal import (
        q_active_users,
        q_audience_overlap,
        q_lag_features,
        q_new_vs_returning,
        q_seasonal_naive,
        q_trend,
        q_twap,
    )

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long")
    empty_edges = spark.createDataFrame([], "doc_a long, doc_b long")

    for op in (q_active_users, q_trend, q_twap, q_audience_overlap,
               q_seasonal_naive, q_new_vs_returning, q_lag_features,
               q_heavy_hitters):
        out = op(empty_ev)
        assert out.count() == 0, op.__name__
        assert len(out.columns) > 1, op.__name__
    assert q_dedup_prefix(empty_docs).count() == 0
    assert khop_counts(empty_edges).count() == 0


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.integers(-20, 20), min_size=2, max_size=2),
                min_size=3, max_size=20))
def test_kmeans_matches_exact_integer_model(spark, vecs):
    """q_kmeans is bit-deterministic by design, so a pure-Python model
    of the same integer algorithm (grid snap, (d, cid)-argmin,
    floor((2s+n)/(2n)) centroid update, empty-cluster carry-forward)
    must reproduce centroids AND sizes exactly on random inputs."""
    import math

    from pyspark.sql import Row

    from movie_rec_spark.operators.similarity import (
        KMEANS_SCALE,
        q_kmeans,
    )
    k = min(3, len(vecs))
    e = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(a), float(b)], label=0)
         for i, (a, b) in enumerate(vecs)])
    got = {(r.cluster, r.pos): (r.centroid_val, r.n_vectors)
           for r in q_kmeans(e, k=k, iters=2).collect()}

    pts = {i: [round(a * KMEANS_SCALE), round(b * KMEANS_SCALE)]
           for i, (a, b) in enumerate(vecs)}
    centers = {cid: list(pts[cid]) for cid in range(k)}
    assign = {}
    for _ in range(2):
        assign = {}
        for i, p in pts.items():
            best = min(((sum((pc - cc) ** 2
                             for pc, cc in zip(p, c)), cid)
                        for cid, c in centers.items()))
            assign[i] = best[1]
        for cid in centers:
            members = [pts[i] for i, c in assign.items() if c == cid]
            if members:
                n = len(members)
                centers[cid] = [
                    math.floor((2 * sum(m[d] for m in members) + n)
                               / (2 * n))
                    for d in range(2)]
    sizes = {cid: sum(1 for c in assign.values() if c == cid)
             for cid in centers}
    want = {(cid, d): (centers[cid][d] / KMEANS_SCALE, sizes[cid])
            for cid in centers for d in range(2)}
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.integers(0, 2),       # user
                          st.integers(0, 96),      # hour offset
                          st.integers(0, 5000)),   # cents
                min_size=1, max_size=40))
def test_interpolate_matches_rational_model(spark, evs):
    """q_interpolate equals the pure-Python exact-rational model on
    random hourly series: observed hours pass through, gap hours get
    floor((2·(pc·(nt−t)+nc·(t−pt)) + (nt−pt)) / (2·(nt−pt))) cents —
    HALF_UP of the exact interpolation rational, no floats anywhere."""
    from movie_rec_spark.operators.temporal import q_interpolate
    rows = [(i, EPOCH + dt.timedelta(hours=h), u, "e", c / 100)
            for i, (u, h, c) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    got = {(r.user_id, r.hour): (round(r.value * 100), r.interpolated)
           for r in q_interpolate(df).collect()}
    hourly: dict[tuple, int] = {}
    for u, h, c in evs:
        hourly[(u, h)] = hourly.get((u, h), 0) + c
    want = {}
    for u in {u for u, _, _ in evs}:
        hs = sorted(h for (uu, h) in hourly if uu == u)
        for h in range(hs[0], hs[-1] + 1):
            ts = EPOCH + dt.timedelta(hours=h)
            if (u, h) in hourly:
                want[(u, ts)] = (hourly[(u, h)], False)
            else:
                p = max(x for x in hs if x < h)
                n = min(x for x in hs if x > h)
                pc, nc = hourly[(u, p)], hourly[(u, n)]
                num = pc * (n - h) + nc * (h - p)
                den = n - p
                want[(u, ts)] = ((2 * num + den) // (2 * den), True)
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.integers(0, 13),      # day offset
                          st.integers(0, 300)),    # cents
                min_size=1, max_size=60))
def test_rolling_percentiles_match_exact_rational_model(spark, evs):
    """q_rolling_percentiles equals the EXACT integer-rational
    linear-interpolation quantile over each day's trailing-7-day
    multiset, HALF_UP-rounded to whole cents via
    floor((2·num+den)/(2·den)) — all-integer model, so knife-edge
    f≠0.5 interpolation points like window [0, 23, 238] p95 = 216.5
    (where float evaluation orders disagree by 1 ulp: numpy/DuckDB
    a+f·(b−a) → 216, Spark (1−f)a+fb → 217) are decided by the
    arithmetic spec, not by which float kernel the engine uses."""
    from movie_rec_spark.operators.temporal import q_rolling_percentiles
    rows = [(i, EPOCH + dt.timedelta(days=d, hours=1), 1, "e", c / 100)
            for i, (d, c) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    got = {(r.day - EPOCH.date()).days:
           (r.p50_cents, r.p95_cents, r.n_events)
           for r in q_rolling_percentiles(df).collect()}

    def exact_q(sorted_vals, p_num, p_den):
        n = len(sorted_vals)
        i, rem = divmod(p_num * (n - 1), p_den)
        lo = sorted_vals[i]
        hi = sorted_vals[i + 1] if rem else lo
        num = lo * (p_den - rem) + hi * rem
        return (2 * num + p_den) // (2 * p_den)

    days = sorted({d for d, _ in evs})
    want = {}
    for d in days:
        window = sorted(c for dd, c in evs if d - 6 <= dd <= d)
        want[d] = (exact_q(window, 1, 2), exact_q(window, 19, 20),
                   len(window))
    assert got == want


def test_late_round6_ops_handle_empty_inputs(spark):
    """Empty-input totality for the late-round-6 wave: imputation,
    rolling percentiles, winsorization, and both streaming replay
    queries return empty results with their schemas, never raise."""
    from movie_rec_spark.operators.relational import q_winsorize
    from movie_rec_spark.operators.temporal import (
        q_interpolate,
        q_rolling_percentiles,
    )
    from movie_rec_spark.streaming.joins import q_stream_join_et
    from movie_rec_spark.streaming.lakehouse import q_merge_stream
    from movie_rec_spark.streaming.sketch import q_heavy_hitters_stream

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
    for op in (q_interpolate, q_rolling_percentiles, q_winsorize,
               q_heavy_hitters_stream, q_stream_join_et,
               q_merge_stream):
        out = op(empty_ev)
        assert out.count() == 0, op.__name__
        assert len(out.columns) > 1, op.__name__


def _exact_q_num(sorted_vals: list[int], p_num: int,
                 p_den: int) -> tuple[int, int]:
    """Exact interpolated percentile of an integer multiset as a
    rational (numerator, denominator p_den) — the arithmetic spec
    shared by exact_pct_brackets (Spark) and the _pq_* oracle SQL."""
    n = len(sorted_vals)
    i, rem = divmod(p_num * (n - 1), p_den)
    lo = sorted_vals[i]
    hi = sorted_vals[i + 1] if rem else lo
    return lo * (p_den - rem) + hi * rem, p_den


def _half_up(num: int, den: int) -> int:
    return (2 * num + den) // (2 * den)


@SLOW
@given(st.lists(st.tuples(st.sampled_from(["A", "N", "R"]),
                          st.integers(0, 300),    # price cents
                          st.integers(1, 50)),    # whole quantity
                min_size=1, max_size=40))
def test_percentiles_match_exact_rational_model(spark, rows):
    """q_percentiles equals the exact integer-rational percentile
    model on adversarial small-integer inputs — the f≠0.5 knife-edge
    class (p90's f is a non-dyadic multiple of 1/10) that float
    quantile kernels decide by evaluation order."""
    from movie_rec_spark.operators.relational import q_percentiles
    df = spark.createDataFrame(
        [(f, c / 100, float(q)) for f, c, q in rows],
        "l_returnflag string, l_extendedprice double, l_quantity double")
    got = {r.l_returnflag: (r.p50_price, r.p90_price, r.p50_qty,
                            r.n_rows)
           for r in q_percentiles(df).collect()}
    want = {}
    for flag in {f for f, _, _ in rows}:
        pc = sorted(c for f, c, _ in rows if f == flag)
        qc = sorted(q * 100 for f, _, q in rows if f == flag)
        want[flag] = (_half_up(*_exact_q_num(pc, 1, 2)) / 100.0,
                      _half_up(*_exact_q_num(pc, 9, 10)) / 100.0,
                      _half_up(*_exact_q_num(qc, 1, 2)) / 100.0,
                      len(pc))
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.sampled_from(["u", "v"]),
                          st.integers(0, 400)),   # cents
                min_size=1, max_size=40))
def test_outliers_fences_match_exact_rational_model(spark, rows):
    """q_outliers' emitted Tukey fences and membership equal the
    exact-rational model: lo = (5·q1num − 3·q3num)/8 cents HALF_UP
    (k=1.5 over quartile rationals of denominator 4)."""
    from movie_rec_spark.operators.relational import q_outliers
    df = spark.createDataFrame(
        [(i, t, c / 100) for i, (t, c) in enumerate(rows)],
        "event_id long, event_type string, value double")
    got = {r.event_id: (r.value, r.lo, r.hi)
           for r in q_outliers(df).collect()}
    want = {}
    for t in {t for t, _ in rows}:
        vs = sorted(c for tt, c in rows if tt == t)
        n1, _ = _exact_q_num(vs, 1, 4)
        n3, _ = _exact_q_num(vs, 3, 4)
        lo = _half_up(5 * n1 - 3 * n3, 8) / 100.0
        hi = _half_up(5 * n3 - 3 * n1, 8) / 100.0
        for i, (tt, c) in enumerate(rows):
            if tt == t and (c / 100 < lo or c / 100 > hi):
                want[i] = (c / 100, lo, hi)
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.sampled_from(["u", "v"]),
                          st.integers(0, 400)),
                min_size=1, max_size=40))
def test_winsorize_match_exact_rational_model(spark, rows):
    """q_winsorize's [p05, p95] clamp audit equals the exact-rational
    model — p05/p95 rationals have denominator 20, the densest
    knife-edge grid on the declared surface."""
    from movie_rec_spark.operators.relational import q_winsorize
    df = spark.createDataFrame(
        [(t, c / 100) for t, c in rows],
        "event_type string, value double")
    got = {r.event_type:
           (r.lo, r.hi, r.n_clamped_lo, r.n_clamped_hi, r.n_rows,
            r.mean_cents_before, r.mean_cents_after)
           for r in q_winsorize(df).collect()}
    want = {}
    for t in {t for t, _ in rows}:
        vs = sorted(c for tt, c in rows if tt == t)
        lo = _half_up(*_exact_q_num(vs, 1, 20)) / 100.0
        hi = _half_up(*_exact_q_num(vs, 19, 20)) / 100.0
        cw = [round(max(min(c / 100, hi), lo) * 100) for c in vs]
        want[t] = (lo, hi,
                   sum(1 for c in vs if c / 100 < lo),
                   sum(1 for c in vs if c / 100 > hi),
                   len(vs),
                   (2 * sum(vs) + len(vs)) // (2 * len(vs)),
                   (2 * sum(cw) + len(cw)) // (2 * len(cw)))
    assert got == want


@SLOW
@given(st.lists(st.integers(0, 200), min_size=1, max_size=40))
def test_quantile_bins_match_exact_model(spark, cents):
    """q_quantile_bins' decile boundaries as exact rationals and the
    pure-integer bin predicate cents·10 > numerator — bin membership
    can never flip on a boundary whose exact value lands on an
    integer cent."""
    from movie_rec_spark.operators.relational import (
        QUANTILE_BINS,
        q_quantile_bins,
    )
    df = spark.createDataFrame([(c / 100,) for c in cents],
                               "o_totalprice double")
    got = {r.bin: (r.n_orders, r.min_price, r.max_price, r.revenue)
           for r in q_quantile_bins(df).collect()}
    vs = sorted(cents)
    nums = [_exact_q_num(vs, k, QUANTILE_BINS)[0]
            for k in range(1, QUANTILE_BINS)]
    bins: dict[int, list[int]] = {}
    for c in cents:
        b = sum(1 for num in nums if c * QUANTILE_BINS > num)
        bins.setdefault(b, []).append(c)
    want = {b: (len(cs), min(cs) / 100.0, max(cs) / 100.0,
                sum(cs) / 100.0)
            for b, cs in bins.items()}
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.integers(1, 9),       # day of month
                          st.integers(-200, 300)),  # cents (negatives!)
                min_size=1, max_size=50))
def test_quantile_merge_matches_exact_model(spark, evs):
    """q_quantile_merge equals the all-integer exact-rational quantile
    model on every per-day row AND on the '__all__' row built from
    merged histograms — including negative cents (the HALF_UP identity
    must agree with the engine's floor semantics below zero) and
    singleton days (rem = 0 everywhere)."""
    from movie_rec_spark.operators.relational import q_quantile_merge
    rows = [(i, EPOCH + dt.timedelta(days=d - 1, hours=2), 1, "e",
             c / 100) for i, (d, c) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")

    def exact_q(vals, p_num, p_den):
        v = sorted(vals)
        i, rem = divmod(p_num * (len(v) - 1), p_den)
        num = v[i] * (p_den - rem) + (v[i + 1] if rem else v[i]) * rem
        q, r = divmod(2 * num + p_den, 2 * p_den)
        return q  # floor((2num+den)/(2den)) == HALF_UP

    def expect(vals):
        return (len(vals), exact_q(vals, 1, 4), exact_q(vals, 1, 2),
                exact_q(vals, 3, 4), exact_q(vals, 19, 20))

    got = {r.day: (r.n_rows, r.p25_cents, r.p50_cents,
                   r.p75_cents, r.p95_cents)
           for r in q_quantile_merge(df).collect()}
    want = {}
    for d in {d for d, _ in evs}:
        day = (EPOCH + dt.timedelta(days=d - 1)).date().isoformat()
        want[day] = expect([c for dd, c in evs if dd == d])
    want["__all__"] = expect([c for _, c in evs])
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.integers(1, 4),        # day of month
                          st.integers(0, 5000)),    # user id
                min_size=1, max_size=80))
def test_kmv_distinct_matches_exact_model(spark, evs):
    """q_kmv_distinct equals a pure-Python mirror of the sketch: same
    md5-prefix hashes, same per-day k-min sets, same distinct pooled
    merge, same integer (K-1)*M div kth estimator — on corpora that
    exercise both the exact small-cardinality mode and (via the k=8
    override) the estimating mode with cross-day repeat users."""
    import hashlib

    from movie_rec_spark.operators.relational import (
        KMV_M,
        q_kmv_distinct,
    )
    k = 8
    rows = [(i, EPOCH + dt.timedelta(days=d - 1, hours=3), u, "e", 1.0)
            for i, (d, u) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:14], 16)

    def sketch(hashes):
        mins = sorted(set(hashes))[:k]
        if len(mins) < k:
            return (len(mins), -1, len(mins))
        kth = mins[-1]
        return (k, kth, (k - 1) * KMV_M // kth)

    got = {r.day: (r.n_mins, r.kth_hash, r.est_distinct)
           for r in q_kmv_distinct(df, k=k).collect()}
    want = {}
    pooled = []
    for d in {d for d, _ in evs}:
        day = (EPOCH + dt.timedelta(days=d - 1)).date().isoformat()
        day_mins = sorted({h(u) for dd, u in evs if dd == d})[:k]
        pooled.extend(day_mins)
        want[day] = sketch(day_mins)
    want["__all__"] = sketch(pooled)
    assert got == want


_AUDIT_VOCAB = ["alpha", "beta", "gamma", "delta",
                "epsilon", "zeta", "eta", "theta"]


@SLOW
@given(st.lists(st.lists(st.sampled_from(_AUDIT_VOCAB),
                         min_size=3, max_size=10),
                min_size=2, max_size=5))
def test_minhash_eval_matches_python_mirror_property(spark, words):
    """The fixed-corpus mirror test generalized: on RANDOM tiny
    corpora (8-word vocabulary, so exact dups, near-dups, and
    disjoint docs all occur) q_minhash_eval must equal the
    pure-Python portable-minhash mirror exactly — candidates, truth
    flags, signature agreement counts, and overlap sizes."""
    from test_text_dedup import _mhp_py

    from movie_rec_spark.operators.dedup import q_minhash_eval
    texts = [" ".join(ws) for ws in words]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    got = {(r.doc_a, r.doc_b): (r.candidate, r.is_true, r.n_match,
                                r.n_inter, r.n_union)
           for r in q_minhash_eval(df).collect()}
    assert got == _mhp_py(texts)


@SLOW
@given(st.lists(st.lists(st.sampled_from(_AUDIT_VOCAB),
                         min_size=3, max_size=10),
                min_size=2, max_size=5))
def test_simhash_eval_matches_python_mirror_property(spark, words):
    """q_simhash_eval on random tiny corpora vs an independent mirror:
    md5 token hashes, 56 vote sums, positive-vote bits, BRUTE-FORCE
    hamming candidates (so the Spark side's pigeonhole blocking is
    proved exact on every generated corpus), exact-Jaccard truth."""
    import hashlib

    from movie_rec_spark.operators import dedup as D
    texts = [" ".join(ws) for ws in words]

    def sig(t):
        bits = [0] * D.SHP_BITS
        for w in set(t.split(" ")):
            hv = int(hashlib.md5(w.encode()).hexdigest()[:14], 16)
            for i in range(D.SHP_BITS):
                bits[i] += 1 if (hv >> i) & 1 else -1
        return sum((1 << i) for i in range(D.SHP_BITS) if bits[i] > 0)

    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1))}

    sigs = [sig(t) for t in texts]
    shs = [shingles(t) for t in texts]
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            i = len(shs[a] & shs[b])
            u = len(shs[a] | shs[b])
            cand, true = ham <= D.SHP_HMAX, i * 2000 >= u * 1000
            if cand or true:
                want[(a, b)] = (int(cand), int(true), ham, i, u)
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    got = {(r.doc_a, r.doc_b): (r.candidate, r.is_true, r.hamming,
                                r.n_inter, r.n_union)
           for r in D.q_simhash_eval(df).collect()}
    assert got == want


@given(st.integers(min_value=1, max_value=1000),
       st.integers(min_value=1, max_value=1000),
       st.fractions(min_value=__import__("fractions").Fraction(1, 100),
                    max_value=__import__("fractions").Fraction(99, 100),
                    max_denominator=100))
def test_jaccard_threshold_frac_is_boundary_exact(i, extra, thr):
    """The rational cut i*den >= union*num must agree with EXACT
    fraction comparison i/union >= thr for every (i, union) and every
    small-denominator threshold — including pairs exactly AT the
    threshold, the class int(1/t*1000) silently excluded (ADVICE r7:
    t=0.9 rejected Jaccard exactly 9/10). Pure integer model, no
    Spark."""
    from fractions import Fraction

    from movie_rec_spark.operators.dedup import jaccard_threshold_frac

    union = i + extra - 1  # union >= i always
    num, den = jaccard_threshold_frac(float(thr))
    got = i * den >= union * num
    want = Fraction(i, union) >= Fraction(num, den)
    assert got == want
    # limit_denominator recovers small-denominator thresholds exactly
    assert Fraction(num, den) == thr


@given(st.integers(min_value=0, max_value=(1 << 56) - 1))
def test_hll_rho_formula_matches_bit_length(h):
    """rho = 49 - len(bin(w)) (the engines' length(bin(w)) arithmetic,
    with the w=0 -> 49 special case) must equal the definitional
    leading-zero count of the 48-bit suffix + 1 for EVERY 56-bit
    hash. Pure-integer model of relational.q_hll_audit's kernel."""
    from movie_rec_spark.operators.relational import (
        HLL_AUDIT_HASH_BITS,
        HLL_AUDIT_P,
    )

    p = HLL_AUDIT_P
    w = h >> p  # suffix (engine uses h div 2^p; same for nonneg)
    suffix_bits = HLL_AUDIT_HASH_BITS - p
    # engine formula: special-case 0, else 49 - length(bin(w));
    # Python's bin() prefixes '0b', SQL bin() does not
    rho_engine = (suffix_bits + 1 if w == 0
                  else suffix_bits + 1 - (len(bin(w)) - 2))
    # definition: leading zeros in the suffix_bits-wide window + 1
    rho_def = 1
    for bit in range(suffix_bits - 1, -1, -1):
        if w >> bit & 1:
            break
        rho_def += 1
    assert rho_engine == rho_def
    assert 1 <= rho_engine <= suffix_bits + 1


# ---- round-9 kernels vs pure-Python mirrors ----------------------------

def _model_substr_windows(texts, k):
    from collections import defaultdict

    occ = defaultdict(list)
    for d, t in enumerate(texts):
        toks = t.split(" ")
        for i in range(len(toks) - k + 1):
            occ[" ".join(toks[i:i + k])].append((d, i))
    return occ


def _model_spans(texts, k):
    from collections import defaultdict

    occ = _model_substr_windows(texts, k)
    by_doc = defaultdict(list)
    for lst in occ.values():
        if len({d for d, _ in lst}) > 1:
            for d, i in lst:
                by_doc[d].append(i)
    spans = []
    for d, starts in by_doc.items():
        starts.sort()
        cur = [starts[0]]
        for s in starts[1:]:
            if s - cur[-1] > k:
                spans.append((d, cur[0], cur[-1] + k - cur[0], len(cur)))
                cur = [s]
            else:
                cur.append(s)
        spans.append((d, cur[0], cur[-1] + k - cur[0], len(cur)))
    return sorted(spans)


def _model_prune(texts, k):
    from collections import defaultdict

    occ = _model_substr_windows(texts, k)
    removed = defaultdict(set)
    for lst in occ.values():
        if len({d for d, _ in lst}) > 1:
            for d, s in sorted(lst)[1:]:
                removed[d].update(range(s, s + k))
    out = []
    for d, t in enumerate(texts):
        toks = t.split(" ")
        keep = [w for i, w in enumerate(toks) if i not in removed[d]]
        out.append((d, len(toks), len(removed[d]), " ".join(keep)))
    return out


def _mk_docs(spark, texts, sources=None):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en",
             source=(sources[i] if sources else "s"), n_chars=len(t))
         for i, t in enumerate(texts)])


_tok_doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0,
                    max_size=10).map(" ".join)


@SLOW
@given(st.lists(_tok_doc, min_size=1, max_size=5))
def test_dedup_substring_matches_python_mirror(spark, texts):
    """Maximal cross-doc duplicated spans agree with a brute-force
    pure-Python mirror on tiny-vocab corpora (vocab of 3 forces heavy
    window collisions, exercising merge and gap-split paths)."""
    from movie_rec_spark.operators.dedup import q_dedup_substring

    got = sorted((r.doc_id, r.span_start, r.span_len, r.n_windows)
                 for r in q_dedup_substring(
                     _mk_docs(spark, texts), k=3).collect())
    assert got == _model_spans(texts, 3)


@SLOW
@given(st.lists(_tok_doc, min_size=1, max_size=5))
def test_substring_prune_matches_python_mirror(spark, texts):
    """Pruned corpora agree with the mirror: canonical (doc_id,
    start)-minimal occurrence survives, removed-position union
    accounting is exact, short docs pass through."""
    from movie_rec_spark.operators.dedup import q_substring_prune

    got = sorted((r.doc_id, r.n_tokens, r.n_removed, r.cleaned_text)
                 for r in q_substring_prune(
                     _mk_docs(spark, texts), k=3).collect())
    assert got == _model_prune(texts, 3)


@SLOW
@given(st.lists(
    st.tuples(_tok_doc, st.sampled_from(["src0", "s1"])),
    min_size=1, max_size=6))
def test_importance_resample_matches_python_mirror(spark, rows):
    """DSIR integer margins, ranks, and the top-1/5 cut agree with a
    pure-Python md5-bucket mirror (independent of both engines)."""
    from hashlib import md5

    from movie_rec_spark.operators.text import (
        DSIR_BUCKETS, DSIR_KEEP_DEN, DSIR_KEEP_NUM, q_importance_resample)

    texts = [t for t, _ in rows]
    sources = [s for _, s in rows]

    def bucket(tok):
        return int(md5(tok.encode()).hexdigest()[:14], 16) % DSIR_BUCKETS

    from collections import Counter

    ct: Counter = Counter()
    cr: Counter = Counter()
    for t, s in rows:
        for tok in t.split(" "):
            b = bucket(tok)
            cr[b] += 1
            if s == "src0":
                ct[b] += 1
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    w = {b: (ct[b] + 1) * (r_tot + DSIR_BUCKETS)
         - (cr[b] + 1) * (t_tot + DSIR_BUCKETS) for b in cr}
    scores = [(d, sum(w[bucket(tok)] for tok in t.split(" ")))
              for d, t in enumerate(texts)]
    order = sorted(scores, key=lambda x: (-x[1], x[0]))
    n = len(order)
    model = {d: (s, i + 1, int((i + 1) * DSIR_KEEP_DEN <= n * DSIR_KEEP_NUM))
             for i, (d, s) in enumerate(order)}
    got = {r.doc_id: (r.score, r.imp_rank, r.selected)
           for r in q_importance_resample(
               _mk_docs(spark, texts, sources)).collect()}
    assert got == model
