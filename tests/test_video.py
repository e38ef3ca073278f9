"""Dependency-free YUV4MPEG2 parser + Spark video operators."""

from __future__ import annotations

import numpy as np
import pytest

from vanus_spark.llm.video import (
    _iter_y4m_frames,
    attach_video_metadata,
    parse_y4m_header,
    sample_video_frames,
    synthesize_y4m_video,
)


def _y4m(w, h, frames, cs=b"C444", frame_params=b""):
    hdr = b"YUV4MPEG2 W%d H%d F30:1 %s\n" % (w, h, cs)
    sixths = {b"C444": 18, b"C420": 9, b"Cmono": 6}[cs]
    out = hdr
    for i in range(frames):
        out += b"FRAME" + frame_params + b"\n"
        out += bytes((i + p) % 256 for p in range(w * h * sixths // 6))
    return out


def test_header_parse_defaults():
    hdr = parse_y4m_header(b"YUV4MPEG2 W64 H48\nFRAME\n")
    assert (hdr["width"], hdr["height"]) == (64, 48)
    assert (hdr["fps_num"], hdr["fps_den"]) == (25, 1)
    assert hdr["colorspace"] == "C420"


def test_frame_walk_c444_and_mono():
    frames = list(_iter_y4m_frames(_y4m(4, 2, 3)))
    assert [f[0] for f in frames] == [0, 1, 2]
    idx, y, u, v = frames[1]
    assert y.shape == (2, 4) and u.shape == (8,) and v.shape == (8,)
    assert y[0, 0] == 1  # frame 1, pixel 0
    mono = list(_iter_y4m_frames(_y4m(4, 2, 2, cs=b"Cmono")))
    assert mono[0][2] is None and mono[0][3] is None


def test_frame_walk_tolerates_frame_params():
    frames = list(_iter_y4m_frames(_y4m(4, 2, 2, frame_params=b" Xtag=1")))
    assert len(frames) == 2


def test_frame_walk_rejects_garbage():
    with pytest.raises(ValueError, match="FRAME marker"):
        list(_iter_y4m_frames(b"YUV4MPEG2 W2 H2 C444\nJUNK" + b"\x00" * 50))


def test_metadata_columns_match_python_parse(spark):
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    vids = synthesize_y4m_video(docs)
    meta = {r.media_id: r.meta for r in attach_video_metadata(vids).collect()}
    for r in vids.collect():
        hdr = parse_y4m_header(bytes(r.content))
        m = meta[r.media_id]
        assert (m.width, m.height) == (hdr["width"], hdr["height"])
        assert (m.fps_num, m.fps_den) == (hdr["fps_num"], hdr["fps_den"]) == (25, 1)
        assert m.colorspace == hdr["colorspace"] == "C444"
        n_frames = len(list(_iter_y4m_frames(bytes(r.content))))
        assert m.n_frames == n_frames
        assert m.n_bytes == len(bytes(r.content))


def test_sample_frames_stats_and_pgm_composition(spark):
    from vanus_spark.llm.multimodal import decode_ppm

    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    rows = sample_video_frames(
        synthesize_y4m_video(docs), every_n=2, decode_stub=False
    ).collect()
    assert all(r.frame_index % 2 == 0 for r in rows)
    for r in rows:
        m = r.media_id
        w, h = 8 + (m % 3) * 4, 6 + (m % 3) * 2
        assert (r.width, r.height) == (w, h)
        y = (m + r.frame_index * 7 + np.arange(w * h)) % 256
        assert abs(r.y_mean - y.mean()) < 1e-9
        assert (r.y_min, r.y_max) == (y.min(), y.max())
        # the sampled luma plane is a valid PGM the image codec reads
        px = decode_ppm(bytes(r.frame_pgm))
        assert px.shape == (h, w, 3)
        assert px[0, 0, 0] == y[0]


def test_stub_path_for_compressed(spark):
    df = spark.createDataFrame([(1, bytearray(b"\x00\x00\x01mp4x"))], ["media_id", "content"])
    out = sample_video_frames(df, decode_stub=True).collect()
    assert len(out) == 1 and out[0].frame_index == 0
    with pytest.raises(Exception, match="ffmpeg"):
        sample_video_frames(df, decode_stub=False).collect()


# ---------------------------------------------------------------------------
# temporal perceptual hash
# ---------------------------------------------------------------------------

def test_video_phash_majority_cancels_outlier_frame(spark):
    """3-frame clip where frame 2 is the COMPLEMENT of frames 0-1: the
    majority-pooled hash must equal the frames-0/1 pattern (a pooling
    bug that trusts any single frame, or averages, would flip bits)."""
    import numpy as np

    from vanus_spark.llm.video import video_phash

    rng = np.random.RandomState(5)
    pattern = rng.rand(8, 8) > 0.5
    if pattern.all():
        pattern[0, 0] = False
    if not pattern.any():
        pattern[0, 0] = True

    def luma(bits):
        return np.where(np.kron(bits, np.ones((2, 2), bool)), 200, 50).astype(
            np.uint8
        )

    uv = np.full((16, 16), 128, dtype=np.uint8)

    def frame(y):
        return b"FRAME\n" + y.tobytes() + uv.tobytes() + uv.tobytes()

    clip = (
        b"YUV4MPEG2 W16 H16 F25:1 Ip A1:1 C444\n"
        + frame(luma(pattern))
        + frame(luma(pattern))
        + frame(luma(~pattern))
    )
    pdf = spark.createDataFrame(
        [(0, bytearray(clip))], "media_id long, content binary"
    )
    got = video_phash(pdf).collect()[0]["vhash"]
    expect_bits = pattern.ravel()
    u = sum(int(b) << k for k, b in enumerate(expect_bits))
    expect = u - (1 << 64) if u >= (1 << 63) else u
    assert got == expect


def test_video_phash_matches_python_reference(spark, sf_dir):
    import hashlib

    from vanus_spark.llm.video import synthesize_y4m_block_videos, video_phash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = synthesize_y4m_block_videos(docs.limit(20))
    got = {r["media_id"]: r["vhash"] for r in video_phash(media).collect()}

    def expect(d):
        b, v = d // 5, d % 5
        bits = [
            int(hashlib.md5(f"{b}:{k}".encode()).hexdigest()[0], 16) % 2
            for k in range(64)
        ]
        if v > 0:
            bits[(b + v - 1) % 64] ^= 1
        u = sum(bits[k] << k for k in range(64))
        return u - (1 << 64) if u >= (1 << 63) else u

    assert got == {d: expect(d) for d in got}
