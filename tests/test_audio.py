"""Dependency-free WAV codec + Spark audio operators."""

from __future__ import annotations

import numpy as np
import pytest
import struct

from vanus_spark.llm.audio import (
    SYNTH_RATE,
    decode_audio,
    decode_wav,
    encode_wav,
    resample_audio,
    synthesize_wav_audio,
    window_audio,
)


def test_wav_roundtrip_16bit_stereo():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int16)
    rate, out = decode_wav(encode_wav(x, 44100))
    assert rate == 44100 and out.shape == (1000, 2)
    np.testing.assert_allclose(out * 32768.0, x.astype(np.float64), atol=0)


def test_wav_roundtrip_8bit_mono():
    x = np.arange(256, dtype=np.uint8)
    rate, out = decode_wav(encode_wav(x, 8000, bits=8))
    assert rate == 8000 and out.shape == (256, 1)
    np.testing.assert_allclose(out[:, 0], (x.astype(np.float64) - 128) / 128)


def test_wav_chunk_walk_skips_unknown_chunks():
    raw = encode_wav(np.zeros(10, dtype=np.int16), 16000)
    # splice a LIST chunk (odd size -> padded) between fmt and data
    fmt_end = 12 + 8 + 16
    alien = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = raw[:fmt_end] + alien + raw[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, out = decode_wav(spliced)
    assert rate == 16000 and out.shape[0] == 10


def test_wav_rejects_non_pcm():
    raw = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
    raw[20] = 3  # format code -> IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(raw))


def test_synthesize_then_decode_matches_formula(spark):
    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    out = {
        r.media_id: r
        for r in decode_audio(
            synthesize_wav_audio(docs), decode_stub=False
        ).collect()
    }
    for m in range(5):
        n = 300 + (m % 8) * 50
        v = (m * 3 + np.arange(n) * (1 + m % 7)) % 256
        x = (v.astype(np.float64) - 128) / 128
        row = out[m]
        assert row.sample_rate == SYNTH_RATE
        assert row.n_channels == 1
        assert row.n_samples == n
        assert abs(row.features[0] - x.mean()) < 1e-12  # mean
        assert abs(row.features[1] - np.sqrt((x**2).mean())) < 1e-12  # rms
        assert row.features[2] == np.abs(x).max()  # peak


def test_resample_halves_samples(spark):
    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    wavs = synthesize_wav_audio(docs)
    res = resample_audio(wavs, SYNTH_RATE // 2, decode_stub=False)
    rows = {r.media_id: r for r in res.collect()}
    for m in range(3):
        n = 300 + (m % 8) * 50
        assert rows[m].n_samples == n // 2
        rate, x = decode_wav(bytes(rows[m].content))
        assert rate == SYNTH_RATE // 2 and x.shape == (n // 2, 1)


def test_window_audio_counts(spark):
    docs = spark.range(1).withColumnRenamed("id", "doc_id")
    # media 0: 300 samples @8k; 25ms window = 200, 10ms hop = 80
    rows = window_audio(
        synthesize_wav_audio(docs), window_s=0.025, hop_s=0.010, decode_stub=False
    ).collect()
    assert [r.window_index for r in rows] == [0, 1, 2, 3]
    assert [r.n_samples for r in rows] == [200, 200, 140, 60]
    assert rows[1].start_s == 80 / SYNTH_RATE
    for r in rows:
        assert 0.0 <= r.rms <= 1.0


def test_window_audio_emits_boundary_tail(spark):
    """Regression (ADVICE r3): a tail window whose hop-multiple start
    lands exactly on len-1 must be emitted — len=5, hop=2 gives starts
    0, 2, 4, the last a 1-sample truncated window."""
    from vanus_spark.llm.audio import encode_wav
    import numpy as np

    raw = encode_wav(np.linspace(-0.5, 0.5, 5).reshape(-1, 1), 1000)
    df = spark.createDataFrame([(7, bytearray(raw))], "media_id long, content binary")
    rows = window_audio(df, window_s=0.002, hop_s=0.002, decode_stub=False).collect()
    assert [r.window_index for r in rows] == [0, 1, 2]
    assert [r.n_samples for r in rows] == [2, 2, 1]


# ---------------------------------------------------------------------------
# band-energy fingerprint near-dup
# ---------------------------------------------------------------------------

def test_audio_fingerprint_matches_python_reference(spark, sf_dir):
    import hashlib

    from vanus_spark.llm.audio import audio_fingerprint, synthesize_wav_tone_blocks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = synthesize_wav_tone_blocks(docs.limit(25))
    got = {
        r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()
    }

    def expect(d):
        b, v = d // 5, d % 5
        bits = [
            int(hashlib.md5(f"{b}:{w}".encode()).hexdigest()[0], 16) % 2
            for w in range(64)
        ]
        if v > 0:
            bits[(b + v - 1) % 64] ^= 1
        u = sum(bits[w] << w for w in range(64))
        return u - (1 << 64) if u >= (1 << 63) else u

    assert got == {d: expect(d) for d in got}


def test_audio_fingerprint_is_gain_invariant_shapewise(spark):
    """Halving the tone amplitude scales every window energy equally,
    so the threshold pattern (window vs clip mean) must not move."""
    import numpy as np

    from vanus_spark.llm.audio import audio_fingerprint, encode_wav

    rng = np.random.RandomState(3)
    tone_windows = rng.rand(64) > 0.5
    if not tone_windows.any():
        tone_windows[0] = True
    if tone_windows.all():
        tone_windows[0] = False

    def clip(amp):
        s = np.zeros(64 * 32, dtype=np.int16)
        for w in range(64):
            if tone_windows[w]:
                seg = np.arange(32) % 2 * 2 - 1
                s[w * 32 : (w + 1) * 32] = (seg * amp).astype(np.int16)
        return encode_wav(s.reshape(-1, 1), 8000)

    pdf = spark.createDataFrame(
        [(0, bytearray(clip(8000))), (1, bytearray(clip(4000)))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r["afp"] for r in audio_fingerprint(pdf).collect()}
    assert rows[0] == rows[1]
