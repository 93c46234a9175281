"""Baseline JPEG codec (textops/jpeg.py) — decode driven through the
REAL bitstream produced by the module's own encoder (Huffman with the
Annex-K tables, DC prediction, byte stuffing, restart markers, MCU
interleaving). With all-ones quantization the only loss is DCT/IDCT
rounding, so gray roundtrips are exact and RGB is within a few counts
(YCbCr rounding) — tight enough for hard bounds, not just PSNR.

Progressive (SOF2) decode is driven the same way, through the
module's own progressive encoder: spectral-selection and
successive-approximation scan scripts, banked EOB runs with
refinement correction bits, restart markers — asserted BIT-EXACT
against the baseline decode of the same image (both paths must
reconstruct identical coefficient grids).

Boundary: arithmetic coding, 12-bit, and lossless/hierarchical modes
remain declared NotImplementedError; `decode_image` dispatches on the
SOI marker.
"""

from __future__ import annotations

import numpy as np
import pytest

from alix_spark.textops.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from alix_spark.textops.multimodal import decode_image


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (13, 21), (1, 1), (7, 40)])
def test_gray_roundtrip_exact(shape):
    # gray + qtable=1: only DCT/IDCT float rounding — exact after round
    img = (_rng(1).integers(0, 256, shape)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_flat_color_dc_only_exact():
    img = np.full((24, 24), 117, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


@pytest.mark.parametrize("shape", [(24, 17, 3), (8, 8, 3), (9, 31, 3)])
def test_rgb_444_roundtrip_tight(shape):
    img = _rng(2).integers(0, 256, shape).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    # YCbCr forward+inverse rounding: a few counts, never more
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_restart_markers_reset_dc_prediction():
    img = _rng(3).integers(0, 256, (40, 40)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, restart_interval=3))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_420_subsampling_smooth_image():
    # chroma is 2x2 box-averaged: exact only where chroma is locally
    # constant — a smooth gradient keeps the error tiny
    x = np.linspace(0, 255, 64)
    img = np.stack(
        [np.tile(x, (64, 1)), np.tile(x[::-1], (64, 1)),
         np.full((64, 64), 100.0)],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_420_with_restarts_odd_dims():
    img = _rng(4).integers(0, 256, (33, 29, 3)).astype(np.uint8)
    out = decode_jpeg(
        encode_jpeg(img, subsampling="420", restart_interval=2)
    )
    assert out.shape == img.shape
    # luma survives subsampling; chroma noise is averaged by design
    def luma(a):
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

    assert (
        np.abs(luma(out.astype(float)) - luma(img.astype(float))).max() < 32
    )


def test_real_quantization_table():
    q = np.array(
        [16, 11, 10, 16, 24, 40, 51, 61] * 8, dtype=np.int64
    )[:64]
    img = _rng(5).integers(0, 256, (32, 32, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, qtable=q))
    assert out.shape == img.shape
    # lossy, but the decode must track the quantized signal, not noise
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 40


def test_decode_image_dispatches_on_soi():
    img = _rng(6).integers(0, 256, (16, 16)).astype(np.uint8)
    out = decode_image(encode_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("successive", [False, True])
@pytest.mark.parametrize("restart_interval", [0, 3])
@pytest.mark.parametrize(
    "shape,sub",
    [
        ((24, 31), "444"),  # gray: single-component scans throughout
        ((24, 31, 3), "444"),
        ((17, 23, 3), "420"),  # MCU padding != non-interleaved dims
        ((16, 40, 3), "422"),
    ],
)
def test_progressive_matches_baseline_exactly(shape, sub, successive,
                                              restart_interval):
    # the hard invariant: every progressive scan script must deposit
    # EXACTLY the coefficient grids the baseline single-scan stream
    # carries, so the two decodes are bit-identical pixel for pixel
    img = _rng(11).integers(0, 256, shape).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img,
            subsampling=sub,
            successive=successive,
            restart_interval=restart_interval,
        )
    )
    assert prog.dtype == base.dtype and prog.shape == base.shape
    assert np.array_equal(prog, base)


def test_progressive_banked_eob_runs():
    # heavy quantization zeroes most AC coefficients -> long EOB runs
    # banked across blocks (the decoder's eobrun>1 path); a smooth
    # gradient keeps DC varying so the scans still carry structure
    x = np.linspace(0, 255, 64, dtype=np.uint8)
    img = np.tile(x, (64, 1))
    q = np.full(64, 255, dtype=np.int64)
    q[0] = 1
    for successive in (False, True):
        base = decode_jpeg(encode_jpeg(img, qtable=q))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, qtable=q, successive=successive)
        )
        assert np.array_equal(prog, base)


def test_progressive_malformed_full_band_interleaved_rejected():
    # a baseline stream whose SOF marker is flipped to SOF2 carries an
    # interleaved full-band scan — illegal in progressive mode (AC
    # scans must be single-component) and rejected, not mis-decoded
    img = _rng(7).integers(0, 256, (8, 8, 3)).astype(np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_truncated_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xdb")


def test_422_subsampling_smooth_image():
    x = np.linspace(0, 255, 64)
    img = np.stack(
        [np.tile(x, (64, 1)), np.tile(x[::-1], (64, 1)),
         np.full((64, 64), 100.0)],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsampling="422"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_fill_bytes_before_marker():
    # T.81 B.1.1.2: any number of 0xFF pad bytes may precede a marker
    img = _rng(8).integers(0, 256, (16, 16, 3)).astype(np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.find(b"\xff\xdb")
    payload[i:i] = b"\xff\xff"
    out = decode_jpeg(bytes(payload))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_16bit_quantization_table():
    # entries > 255 force a Pq=1 (16-bit) DQT segment
    q = np.full(64, 300, dtype=np.int64)
    img = np.full((16, 16), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, qtable=q))
    assert np.abs(out.astype(int) - 200).max() <= 4


def test_error_contract_is_valueerror():
    img = _rng(9).integers(0, 256, (16, 16, 3)).astype(np.uint8)
    full = encode_jpeg(img)
    for cut in (80, 200, len(full) - 10):
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut])


def test_cmyk_guard():
    seg = (
        bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([4]) + bytes(12)
    )
    payload = (
        b"\xff\xd8\xff\xc0" + (len(seg) + 2).to_bytes(2, "big") + seg
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(payload)


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.3: a one-component scan is non-interleaved — a grayscale
    frame DECLARING h=v=2 (some encoders do) must decode to the same
    pixels as the identical entropy stream with h=v=1."""
    import numpy as np

    from alix_spark.textops.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 16)).astype("uint8")
    buf = encode_jpeg(img)
    base = decode_jpeg(buf)
    b = bytearray(buf)
    i = b.find(b"\xff\xc0")
    assert i >= 0 and b[i + 9] == 1  # SOF0, one component
    hv_off = i + 11  # comp id byte, then h<<4|v
    assert b[hv_off] == 0x11
    b[hv_off] = 0x22
    assert np.array_equal(base, decode_jpeg(bytes(b)))
