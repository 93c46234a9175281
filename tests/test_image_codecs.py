"""Pure-numpy PPM/PGM/BMP/PNG decode (textops/multimodal.py).

PPM/PGM/BMP need no codec library; PNG (r6) needs only stdlib zlib +
numpy unfiltering, so `decode_image` is a real decoder for all four —
including Adam7 interlace, palette, 16-bit, and the sub-byte
(1/2/4-bit) gray/palette depths — the FULL legal PNG envelope
(baseline JPEG decodes too — test_jpeg_codec.py). Only
progressive/arithmetic/12-bit JPEG remains behind the declared
NotImplementedError stub. Roundtrips cover the classic trip-up cases:
BMP row padding (width not a multiple of 4), bottom-up vs top-down row
order, BGR channel order, PNM header comments, ascii variants, all
five PNG scanline filters (the encoder cycles them per row), and
ragged/empty Adam7 passes.
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


@pytest.mark.parametrize(
    "shape", [(13, 17), (13, 17, 2), (13, 17, 3), (13, 17, 4), (1, 1, 3),
              (7, 1), (1, 9, 4), (8, 8, 3), (9, 10)]
)
def test_png_adam7_roundtrip(shape):
    # odd sizes exercise empty and ragged Adam7 passes; the encoder
    # cycles filters 0..4 inside every pass
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(img, interlace=True)), img)


def test_png_palette():
    import zlib

    from alix_spark.textops.multimodal import _PNG_SIG, _png_chunk

    rng = np.random.default_rng(12)
    h, w = 11, 6
    idx = rng.integers(0, 5, (h, w), dtype=np.uint8)
    plte = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    scan = bytearray()
    for y in range(h):
        scan.append(0)
        scan.extend(idx[y].tobytes())
    payload = (
        _PNG_SIG
        + _png_chunk(
            b"IHDR",
            w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 3, 0, 0, 0]),
        )
        + _png_chunk(b"PLTE", plte.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(payload), plte[idx])


def test_png_16bit_high_byte():
    import zlib

    from alix_spark.textops.multimodal import _PNG_SIG, _png_chunk

    rng = np.random.default_rng(13)
    h, w = 9, 7
    vals = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    scan = bytearray()
    be = vals.astype(">u2")
    for y in range(h):
        scan.append(0)
        scan.extend(be[y].tobytes())
    payload = (
        _PNG_SIG
        + _png_chunk(
            b"IHDR",
            w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([16, 0, 0, 0, 0]),
        )
        + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(payload), (vals >> 8).astype(np.uint8))


def test_unknown_container_still_stub():
    # unknown containers stay declared stubs (baseline JPEG and every
    # legal PNG depth now decode natively; progressive JPEG raises in
    # test_jpeg_codec.py)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01not-an-image")


def _build_png(w, h, depth, ctype, scan, plte=None):
    import zlib

    from alix_spark.textops.multimodal import _PNG_SIG, _png_chunk

    p = _PNG_SIG + _png_chunk(
        b"IHDR",
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, ctype, 0, 0, 0]),
    )
    if plte is not None:
        p += _png_chunk(b"PLTE", plte.tobytes())
    return p + _png_chunk(b"IDAT", zlib.compress(bytes(scan))) + _png_chunk(
        b"IEND", b""
    )


def _pack_row(vals, depth):
    bits = np.concatenate(
        [np.unpackbits(np.uint8(v))[8 - depth :] for v in vals]
    )
    pad = (-len(bits)) % 8
    bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(bits).tobytes()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_sub_byte_gray_and_palette(depth):
    rng = np.random.default_rng(30 + depth)
    h, w = 7, 11  # 11 samples: rows are byte-padded mid-bit
    maxv = (1 << depth) - 1
    vals = rng.integers(0, maxv + 1, (h, w))
    scan = bytearray()
    for y in range(h):
        scan.append(0)
        scan.extend(_pack_row(vals[y], depth))
    out = decode_image(_build_png(w, h, depth, 0, scan))
    assert np.array_equal(out, (vals * (255 // maxv)).astype(np.uint8))
    plte = rng.integers(0, 256, (maxv + 1, 3), dtype=np.uint8)
    out2 = decode_image(_build_png(w, h, depth, 3, scan, plte=plte))
    assert np.array_equal(out2, plte[vals])


def test_png_1bit_sub_filtered():
    # sub-byte scanlines filter on BYTES with a 1-byte pixel unit
    rng = np.random.default_rng(40)
    h, w = 5, 16
    vals = rng.integers(0, 2, (h, w))
    scan = bytearray()
    for y in range(h):
        rb = np.frombuffer(_pack_row(vals[y], 1), dtype=np.uint8).astype(
            np.int64
        )
        filt = (rb - np.concatenate([[0], rb[:-1]])) & 255
        scan.append(1)
        scan.extend(filt.astype(np.uint8).tobytes())
    out = decode_image(_build_png(w, h, 1, 0, scan))
    assert np.array_equal(out, (vals * 255).astype(np.uint8))


def test_adam7_stream_contains_all_five_filters():
    # the driver's multimodal_decode PNG leg is an 8x8 Adam7 image: the
    # filter cycle must CONTINUE across passes or Paeth (type 4) would
    # silently drop out of driver-oracle coverage (no pass has 5 rows)
    import zlib

    rng = np.random.default_rng(20)
    payload = encode_png(
        rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), interlace=True
    )
    i, idat = 8, b""
    while i < len(payload):
        ln = int.from_bytes(payload[i : i + 4], "big")
        if payload[i + 4 : i + 8] == b"IDAT":
            idat += payload[i + 8 : i + 8 + ln]
        i += 12 + ln
    raw = zlib.decompress(idat)
    adam7 = (
        (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
        (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
    )
    pos, ftypes = 0, set()
    for x0, xs, y0, ys in adam7:
        pw, ph = (8 - x0 + xs - 1) // xs, (8 - y0 + ys - 1) // ys
        for _ in range(ph):
            ftypes.add(raw[pos])
            pos += 1 + pw * 3
    assert ftypes == {0, 1, 2, 3, 4}
