"""Pure-numpy PPM/PGM/BMP/PNG decode (textops/multimodal.py).

PPM/PGM/BMP need no codec library; PNG (r6) needs only stdlib zlib +
numpy unfiltering, so `decode_image` is a real decoder for all four.
Only JPEG (and interlaced/palette/16-bit PNG) remain behind the declared
NotImplementedError stub. Roundtrips cover the classic trip-up cases:
BMP row padding (width not a multiple of 4), bottom-up vs top-down row
order, BGR channel order, PNM header comments, ascii variants, and all
five PNG scanline filters (the encoder cycles them per row).
"""

from __future__ import annotations

import numpy as np
import pytest

from alix_spark.textops.multimodal import (
    decode_image,
    encode_bmp,
    encode_png,
    encode_ppm,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (5, 7), (1, 1), (3, 2)])
def test_ppm_roundtrip(shape):
    img = _img(*shape)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


@pytest.mark.parametrize("shape", [(8, 8), (5, 7), (6, 3), (2, 5), (1, 1)])
def test_bmp_roundtrip_with_padding(shape):
    # widths 7, 3, 5: rows need 4-byte padding — the classic stride bug
    img = _img(*shape, seed=3)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


def test_ppm_header_comment_and_whitespace():
    img = _img(2, 3, seed=1)
    raw = b"P6\n# a comment line\n3 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(raw), img)


def test_ascii_ppm_and_pgm():
    img = _img(2, 2, seed=2)
    ascii_ppm = b"P3\n2 2\n255\n" + " ".join(
        str(v) for v in img.flatten()
    ).encode()
    assert np.array_equal(decode_image(ascii_ppm), img)
    gray = img[:, :, 0]
    ascii_pgm = b"P2\n2 2\n255\n" + " ".join(
        str(v) for v in gray.flatten()
    ).encode()
    assert np.array_equal(decode_image(ascii_pgm), gray)


def test_binary_pgm():
    gray = _img(4, 5, seed=4)[:, :, 0]
    raw = b"P5\n5 4\n255\n" + gray.tobytes()
    assert np.array_equal(decode_image(raw), gray)


def test_top_down_bmp():
    img = _img(3, 4, seed=5)
    raw = bytearray(encode_bmp(img))
    # flip to top-down: negate height, reverse the stored row order
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raw[22:26] = (-h).to_bytes(4, "little", signed=True)
    off = int.from_bytes(raw[10:14], "little")
    rows = [bytes(raw[off + i * stride : off + (i + 1) * stride]) for i in range(h)]
    raw[off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_image(bytes(raw)), img)


@pytest.mark.parametrize("shape", [(8, 8), (5, 7), (1, 1), (3, 2), (12, 4)])
def test_png_rgb_roundtrip(shape):
    # >=5 rows exercises every scanline filter (encoder cycles 0..4)
    img = _img(*shape, seed=6)
    assert np.array_equal(decode_image(encode_png(img)), img)


@pytest.mark.parametrize("channels", [1, 2, 4])
def test_png_gray_and_alpha_roundtrip(channels):
    rng = np.random.default_rng(8)
    shape = (7, 5) if channels == 1 else (7, 5, channels)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(img)), img)


def test_png_gradient_means_match_formula():
    # the multimodal_decode oracle's pixel formula through the PNG path
    r = np.arange(8).reshape(8, 1, 1)
    c = np.arange(8).reshape(1, 8, 1)
    ch = np.arange(3).reshape(1, 1, 3)
    img = ((5 * 7 + r * 3 + c * 5 + ch * 11) % 256).astype(np.uint8)
    out = decode_image(encode_png(img))
    assert np.array_equal(out, img)


def test_compressed_formats_still_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF....")
    # PNG variants outside the implemented envelope stay declared stubs
    interlaced = bytearray(encode_png(_img(4, 4, seed=9)))
    ihdr_off = 8 + 8  # sig + len/type
    interlaced[ihdr_off + 12] = 1  # interlace flag inside IHDR data
    with pytest.raises(NotImplementedError):
        decode_image(bytes(interlaced))
