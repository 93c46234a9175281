"""PCM WAV decode (textops/multimodal.py::decode_audio) — RIFF chunk
walk + numpy sample conversion, driven through the module's own
encoder plus hand-built payloads for the widths the encoder doesn't
emit (24/32-bit int, float32/64, extra chunks)."""

from __future__ import annotations

import numpy as np
import pytest

from alix_spark.textops.multimodal import decode_audio, encode_wav


def _sine(n=480, rate=16000, ch=1):
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    if ch > 1:
        x = np.stack([x * (c + 1) / ch for c in range(ch)], axis=1)
    return x


@pytest.mark.parametrize("bits,tol", [(16, 1 / 32768 * 1.1), (8, 1 / 128 * 1.1)])
def test_pcm_roundtrip_mono(bits, tol):
    x = _sine()
    out, rate = decode_audio(encode_wav(x, 16000, bits=bits))
    assert rate == 16000 and out.shape == x.shape
    assert np.abs(out - x).max() <= tol


def test_pcm_roundtrip_stereo():
    x = _sine(ch=2)
    out, rate = decode_audio(encode_wav(x, 44100))
    assert out.shape == x.shape
    assert np.abs(out - x).max() <= 1 / 32768 * 1.1


def _wav(fmt_body: bytes, data: bytes, extra: bytes = b"") -> bytes:
    chunks = (
        b"WAVE"
        + b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
        + extra
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


def _fmt(code, ch, rate, bits):
    block = ch * bits // 8
    return (
        code.to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )


def test_24bit_and_32bit_int():
    vals = np.array([0.0, 0.5, -0.5, 0.999], dtype=np.float64)
    i24 = np.clip(np.round(vals * (1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int64)
    raw24 = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in i24
    )
    out, rate = decode_audio(_wav(_fmt(1, 1, 8000, 24), raw24))
    assert rate == 8000
    assert np.abs(out - vals).max() < 1e-6
    i32 = (vals * (1 << 31)).astype("<i4")
    out32, _ = decode_audio(_wav(_fmt(1, 1, 8000, 32), i32.tobytes()))
    assert np.abs(out32 - vals).max() < 1e-6


def test_float_formats():
    vals = np.linspace(-1, 1, 17)
    for bits, dt in ((32, "<f4"), (64, "<f8")):
        raw = vals.astype(dt).tobytes()
        out, _ = decode_audio(_wav(_fmt(3, 1, 48000, bits), raw))
        assert np.abs(out - vals).max() < 1e-6


def test_extra_chunks_skipped_and_word_alignment():
    # a LIST chunk with ODD length before data: the walker must pad
    x = _sine(64)
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    out, rate = decode_audio(_wav(_fmt(1, 1, 16000, 16), pcm.tobytes(), extra))
    assert out.shape == x.shape


def test_compressed_formats_stub():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04\x00...mp3...")
    with pytest.raises(NotImplementedError):
        decode_audio(b"fLaC....")
    # mu-law (format code 7) declared unsupported
    with pytest.raises(NotImplementedError):
        decode_audio(_wav(_fmt(7, 1, 8000, 8), b"\x00" * 16))


def test_audio_stats_kernel(spark):
    import pandas as pd

    from alix_spark.textops.multimodal import decode_audio_stats

    payloads = [
        (0, encode_wav(_sine(1600), 16000)),
        (1, encode_wav(_sine(800, ch=2), 8000)),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(payloads, columns=["doc_id", "payload"])
    )
    rows = {r["doc_id"]: r for r in decode_audio_stats(media).collect()}
    assert rows[0]["sample_rate"] == 16000 and rows[0]["n_frames"] == 1600
    assert rows[0]["n_channels"] == 1
    assert abs(rows[0]["duration_ms"] - 100.0) < 1e-9
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(rows[0]["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert rows[1]["n_channels"] == 2 and rows[1]["sample_rate"] == 8000
