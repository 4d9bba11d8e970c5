"""Multimodal plumbing: pack_media metadata correctness against
hashlib, and the fake featurizer's byte histogram on a known payload."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from pipeline_query_engine_demo_spark.functions import multimodal


def test_pack_media_meta(spark):
    payload = b"hello media"
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    packed = df.select(
        "doc_id", multimodal.pack_media(F.col("payload"), F.lit("image")).alias("m")
    )
    row = packed.select("m.meta.kind", "m.meta.n_bytes", "m.meta.checksum").collect()[0]
    assert row.kind == "image"
    assert row.n_bytes == len(payload)
    assert row.checksum == hashlib.md5(payload).hexdigest()


def test_fake_decode_features_histogram(spark):
    # payload of 4 bytes: 0x00, 0x10, 0x10, 0xF0 → high nibbles 0,1,1,15
    payload = bytes([0x00, 0x10, 0x10, 0xF0])
    df = spark.createDataFrame(
        [(7, payload, "audio")], "doc_id long, payload binary, kind string"
    )
    row = multimodal.fake_decode_features(df, "doc_id", "payload", "kind").collect()[0]
    assert row.doc_id == 7 and row.kind == "audio" and row.n_bytes == 4
    expected = [0.0] * 16
    expected[0] = 0.25
    expected[1] = 0.5
    expected[15] = 0.25
    assert list(row.feat) == expected


def test_frame_sample_boundaries(spark):
    import hashlib

    # 300 bytes, stride 128, frame 64: frames at 0,128,256; last is 44 bytes
    payload = bytes(range(256)) + bytes(44)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    rows = sorted(
        multimodal.frame_sample(df, "doc_id", "payload").collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.frame_len) for r in rows] == [(0, 64), (1, 64), (2, 44)]
    assert rows[2].checksum == hashlib.md5(payload[256:]).hexdigest()
    # empty payload → zero frames
    empty = spark.createDataFrame([(2, b"")], "doc_id long, payload binary")
    assert multimodal.frame_sample(empty, "doc_id", "payload").count() == 0


def _checker_rgb(w: int, h: int) -> bytes:
    """Deterministic non-symmetric RGB test pattern (top-down
    row-major) — row- and channel-order bugs change it."""
    return bytes(
        ((y * w + x) * 3 + c) * 7 % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_decode_bmp_roundtrip_bottom_up_and_top_down(spark):
    rgb = _checker_rgb(5, 3)  # width 5 → 15-byte rows, stride 16 (padding)
    for top_down in (False, True):
        payload = multimodal.encode_bmp(5, 3, rgb, top_down=top_down)
        df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
        row = multimodal.decode_media(df, "doc_id", "payload").collect()[0]
        assert row.err is None
        assert (row.format, row.width, row.height, row.channels) == ("bmp", 5, 3, 3)
        assert bytes(row.pixels) == rgb


def test_decode_bmp_32bit_drops_alpha(spark):
    rgb = _checker_rgb(3, 2)
    payload = multimodal.encode_bmp(3, 2, rgb, alpha=True)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    row = multimodal.decode_media(df, "doc_id", "payload").collect()[0]
    assert row.err is None and row.channels == 3
    assert bytes(row.pixels) == rgb


def test_decode_pnm_with_comments_and_errors(spark):
    rgb = _checker_rgb(4, 2)
    ppm = multimodal.encode_pnm(4, 2, rgb)
    # comment-laden header variant
    commented = b"P6\n# a comment\n4 2\n# another\n255\n" + rgb
    gray = bytes(range(12))
    pgm = multimodal.encode_pnm(4, 3, gray, gray=True)
    rows = {
        r.doc_id: r
        for r in multimodal.decode_media(
            spark.createDataFrame(
                [
                    (1, ppm),
                    (2, commented),
                    (3, pgm),
                    (4, b"\x89PNG not supported"),
                    (5, ppm[:10]),  # truncated
                    (6, None),  # NULL payload must yield an err row (ADVICE r5)
                ],
                "doc_id long, payload binary",
            ),
            "doc_id",
            "payload",
        ).collect()
    }
    assert bytes(rows[1].pixels) == rgb and rows[1].format == "ppm"
    assert bytes(rows[2].pixels) == rgb
    assert (rows[3].format, rows[3].channels) == ("pgm", 1)
    assert bytes(rows[3].pixels) == gray
    assert rows[4].err is not None and rows[4].width is None
    assert rows[5].err is not None
    assert rows[6].err == "null media payload" and rows[6].pixels is None
    # with_stats: exact integer reductions, order-sensitive checksum
    st = multimodal.decode_media(
        spark.createDataFrame([(1, ppm)], "doc_id long, payload binary"),
        "doc_id",
        "payload",
        with_stats=True,
    ).collect()[0]
    assert st.pixel_sum == sum(rgb)
    assert st.weighted_sum == sum(
        (i + 1) * v for i, v in enumerate(rgb)
    ) % 2147483647


def test_fake_resize_fits_box_preserving_aspect(spark):
    from pipeline_query_engine_demo_spark.functions import multimodal

    df = spark.createDataFrame(
        [(1, b"x" * 10, "image"), (2, b"y" * 400, "video")],
        "doc_id long, payload binary, kind string",
    )
    rows = {r.doc_id: r for r in multimodal.fake_resize(df, "doc_id", "payload", "kind").collect()}
    for r in rows.values():
        # fits in the box, and at least one side touches it (floor slack <= 1px)
        assert r.width_out <= 256 and r.height_out <= 256
        assert max(r.width_out, r.height_out) >= 255
        # aspect preserved within floor rounding
        assert abs(r.width_out / r.height_out - r.width_in / r.height_in) < 0.02
    assert rows[1].kind == "image" and rows[2].kind == "video"


def test_wav_roundtrip_planted_square_wave(spark):
    """Encoder and decoder pinned against a clip with closed-form stats:
    a ±8192 square wave (period 8) at 8 kHz mono for exactly 1 s has
    duration 1_000_000 µs, peak 8192, energy n·8192², RMS exactly
    8192 — and the junk-chunk variant must decode identically (the
    parser walks chunks, it does not assume the 44-byte layout)."""
    import numpy as np

    n = 8000
    wave = np.where(np.arange(n) % 8 < 4, 8192, -8192).astype("<i2")
    plain = multimodal.encode_wav(8000, 1, wave.tobytes())
    junked = multimodal.encode_wav(8000, 1, wave.tobytes(), junk_chunk=True)
    assert plain[:4] == b"RIFF" and plain[8:12] == b"WAVE"
    assert b"LIST" in junked and b"LIST" not in plain
    df = spark.createDataFrame(
        [(1, plain), (2, junked)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in multimodal.decode_audio(df, "doc_id", "payload").collect()}
    for r in rows.values():
        assert r.err is None
        assert (r.sample_rate, r.channels, r.n_frames) == (8000, 1, n)
        assert r.duration_us == 1_000_000
        assert r.peak == 8192
        assert r.sum_sq == n * 8192 * 8192
        assert r.ch0_sum == 0  # symmetric wave sums to zero


def test_wav_stereo_interleave_and_error_capture(spark):
    """Channel-0 extraction must honor the interleave stride (constant
    L=100 / R=-50 frames), and undecodable payloads must yield err rows
    instead of failing the task: wrong magic, truncated data chunk,
    non-PCM format code, 8-bit depth, null payload."""
    import numpy as np

    frames = 50
    inter = np.empty(frames * 2, dtype="<i2")
    inter[0::2] = 100
    inter[1::2] = -50
    stereo = multimodal.encode_wav(16000, 2, inter.tobytes())
    # hand-corrupt: flip the PCM format code to 3 (IEEE float)
    nonpcm = bytearray(stereo)
    fmt_at = stereo.index(b"fmt ") + 8
    nonpcm[fmt_at : fmt_at + 2] = (3).to_bytes(2, "little")
    # hand-corrupt: claim 8-bit depth
    bits8 = bytearray(stereo)
    bits8[fmt_at + 14 : fmt_at + 16] = (8).to_bytes(2, "little")
    truncated = stereo[:-10]
    df = spark.createDataFrame(
        [
            (1, stereo),
            (2, b"JUNKJUNKJUNK"),
            (3, truncated),
            (4, bytes(nonpcm)),
            (5, bytes(bits8)),
            (6, None),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in multimodal.decode_audio(df, "doc_id", "payload").collect()}
    ok = rows[1]
    assert ok.err is None and ok.channels == 2 and ok.n_frames == frames
    assert ok.ch0_sum == 100 * frames  # stride-correct channel-0 sum
    assert ok.peak == 100
    assert ok.sum_sq == frames * (100 * 100 + 50 * 50)
    assert ok.duration_us == frames * 1_000_000 // 16000
    assert rows[2].err is not None and rows[2].peak is None
    assert "truncated" in rows[3].err
    assert "only PCM" in rows[4].err
    assert "16-bit" in rows[5].err
    assert "null audio payload" in rows[6].err
