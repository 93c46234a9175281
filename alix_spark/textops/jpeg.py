"""Baseline JPEG (ITU-T T.81) decode and encode, pure numpy + stdlib.

The reference treats media as opaque binary payloads (the
``java/alix/lucene/util/BinaryInts.java`` §1.3 model); this engine's
multimodal path decodes them for feature extraction. Round 6 removed
the PNG half of the "needs a codec library" boundary; this module
removes the JPEG half for the dominant profile:

* decode: baseline sequential DCT (SOF0/SOF1) AND progressive DCT
  (SOF2 — spectral selection + successive approximation, all four
  scan kinds: DC first/refine, AC first/refine with EOB-run banking),
  8-bit, grayscale or YCbCr, 4:4:4 / 4:2:2 / 4:2:0 chroma
  subsampling, restart markers. Arithmetic coding, 12-bit, and
  lossless/hierarchical modes remain the declared
  ``NotImplementedError`` boundary.
* encode: baseline 4:4:4 with caller-supplied quantization (default:
  all-ones tables → near-lossless roundtrip, so tests can assert a
  tight pixel bound through the REAL bitstream — Huffman, DC
  prediction, byte stuffing, the lot), plus a progressive encoder
  (``encode_jpeg_progressive``) emitting either a spectral-selection
  scan script or a full successive-approximation one, so the
  progressive decoder is driven through real multi-scan bitstreams
  including banked EOB runs and refinement correction bits.

Everything heavy is vectorized: the 2-D DCT-II/III as two 8×8 matrix
multiplies over an (n_blocks, 8, 8) stack, upsampling as
``np.repeat``, color transform as array algebra. The entropy coder is
the only per-symbol Python loop — it decodes from a pre-unstuffed
``np.unpackbits`` bit array with O(1) table lookups per symbol.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------- #
# 8x8 DCT basis (orthonormal): block = C.T @ coeffs @ C
# --------------------------------------------------------------------- #

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16)
_C *= np.sqrt(2.0 / 8.0)
_C[0] /= np.sqrt(2.0)

# zigzag scan order: _ZIGZAG[i] = flat (row*8+col) index of the i-th
# coefficient in zigzag order
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# standard luminance/chrominance Huffman tables (T.81 Annex K.3) used
# by the encoder; the decoder always reads tables from the stream
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


class _HuffTable:
    """Canonical Huffman table as flat lookup arrays.

    ``lookup[code_so_far_state]`` walking bit by bit would be O(len);
    instead we build, per code LENGTH, a dict-free range check: codes
    of each length are consecutive integers (canonical), so symbol =
    values[offset[len] + (code - first_code[len])]."""

    def __init__(self, counts: list[int], values: list[int]) -> None:
        self.first_code = np.zeros(17, dtype=np.int64)
        self.offset = np.zeros(17, dtype=np.int64)
        self.maxcode = np.full(17, -1, dtype=np.int64)
        self.values = np.asarray(values, dtype=np.int64)
        code = 0
        k = 0
        for ln in range(1, 17):
            self.first_code[ln] = code
            self.offset[ln] = k
            n = counts[ln - 1]
            if n:
                self.maxcode[ln] = code + n - 1
            code = (code + n) << 1
            k += n
        self._counts = counts
        self._enc: dict[int, tuple[int, int]] | None = None

    @property
    def enc(self) -> dict[int, tuple[int, int]]:
        """Encoder view (symbol -> (code, length)), built lazily so
        decode-only tables parsed from DHT segments never pay for it."""
        if self._enc is None:
            self._enc = {}
            k = 0
            for ln in range(1, 17):
                c = int(self.first_code[ln])
                for _ in range(self._counts[ln - 1]):
                    self._enc[int(self.values[k])] = (c, ln)
                    c += 1
                    k += 1
        return self._enc


class _BitReader:
    """MSB-first reader over a pre-unstuffed byte array (0xFF00 →
    0xFF already collapsed, restart markers stripped by the caller)."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        bits = self.bits[self.pos : self.pos + n]
        self.pos += n
        for b in bits:
            v = (v << 1) | int(b)
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[ln]:
                return int(
                    table.values[table.offset[ln] + code - table.first_code[ln]]
                )
        raise ValueError("bad Huffman code")


def _extend(v: int, n: int) -> int:
    """T.81 F.12: map an n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/EXIF JPEG → uint8 HxW (gray) or HxWx3 (RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while i + 1 < len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:  # spec-legal fill byte (T.81 B.1.1.2)
            i += 1
            continue
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(payload[i : i + 2], "big")
        if ln < 2 or i + ln > len(payload):
            raise ValueError("JPEG truncated inside a marker segment")
        seg = payload[i + 2 : i + ln]
        if marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc_th = seg[j]
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                values = list(seg[j + 17 : j + 17 + n])
                huff[(tc_th >> 4, tc_th & 15)] = _HuffTable(counts, values)
                j += 17 + n
        elif marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq_tq = seg[j]
                if pq_tq >> 4:  # 16-bit table
                    tbl = np.frombuffer(
                        seg[j + 1 : j + 129], dtype=">u2"
                    ).astype(np.int64)
                    j += 129
                else:
                    tbl = np.frombuffer(
                        seg[j + 1 : j + 65], dtype=np.uint8
                    ).astype(np.int64)
                    j += 65
                qt[pq_tq & 15] = tbl
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("12-bit JPEG not supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG (CMYK/YCCK) not supported"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                _alloc_coef_grids(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                "JPEG supported — no arithmetic/lossless/hierarchical"
            )
        elif marker == 0xDA:  # SOS — scan follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if not frame["progressive"] and ns != len(frame["comps"]):
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline JPEG not supported"
                )
            scan_sel = {}
            for c in range(ns):
                cs, td_ta = seg[1 + 2 * c : 3 + 2 * c]
                scan_sel[cs] = (td_ta >> 4, td_ta & 15)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            # entropy-coded data: up to the next non-RST marker
            j = i + ln
            chunks, start = [], j
            while j < len(payload) - 1:
                if payload[j] == 0xFF and payload[j + 1] not in (0x00,):
                    if 0xD0 <= payload[j + 1] <= 0xD7:  # RSTn
                        chunks.append(payload[start:j])
                        j += 2
                        start = j
                        continue
                    break
                j += 1
            chunks.append(payload[start:j])
            try:
                if frame["progressive"]:
                    _prog_scan(
                        frame, huff, scan_sel, ss, se,
                        ah_al >> 4, ah_al & 15, chunks, restart_interval,
                    )
                    i = j  # keep walking markers: more scans follow
                    continue
                img = _decode_scan(
                    frame, qt, huff, scan_sel, chunks, restart_interval
                )
            except IndexError as exc:
                raise ValueError("JPEG entropy data truncated") from exc
            return img
        i += ln
    if frame is not None and frame.get("progressive") and frame.get("scanned"):
        return _reconstruct(frame, qt)
    raise ValueError("JPEG truncated: no scan decoded")


def _alloc_coef_grids(frame) -> None:
    """Per-component coefficient grids sized to the MCU-padded frame,
    plus the NON-interleaved block dims (T.81 A.2.2: ceil of the
    component's own sample dims — used by progressive single-component
    scans, which do not cover the MCU padding)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["nw"] = (-(-(w * c["h"]) // hmax) + 7) // 8
        c["nh"] = (-(-(h * c["v"]) // vmax) + 7) // 8
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0


def _decode_scan(frame, qt, huff, scan_sel, chunks, restart_interval):
    comps = frame["comps"]
    _alloc_coef_grids(frame)
    if len(scan_sel) == 1:
        # T.81 A.2.3: a one-component scan is NON-interleaved — one
        # block per data unit over the component's own nw×nh raster,
        # ignoring the frame's sampling factors (a grayscale frame
        # declaring h/v > 1 would otherwise mis-decode)
        return _decode_scan_single(
            frame, qt, huff, scan_sel, chunks, restart_interval
        )
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    n_mcu = mcux * mcuy
    mcu_idx = 0
    for chunk in chunks:
        # each restart chunk resets DC prediction; unstuff 0xFF00
        reader = _BitReader(chunk.replace(b"\xff\x00", b"\xff"))
        for c in comps:
            c["pred"] = 0
        end = (
            min(mcu_idx + restart_interval, n_mcu)
            if restart_interval
            else n_mcu
        )
        while mcu_idx < end:
            my, mx = divmod(mcu_idx, mcux)
            for c in comps:
                td, ta = scan_sel[c["id"]]
                dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(dc_t)
                        diff = _extend(reader.read_bits(s), s)
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk
            mcu_idx += 1
    return _reconstruct(frame, qt)


def _decode_scan_single(frame, qt, huff, scan_sel, chunks, restart_interval):
    """Baseline single-component (non-interleaved) scan: data units are
    single blocks in the component's nw×nh raster; the restart interval
    counts blocks (T.81 A.2.3)."""
    (cid,) = scan_sel
    c = next(cc for cc in frame["comps"] if cc["id"] == cid)
    td, ta = scan_sel[cid]
    dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
    nw, nh = c["nw"], c["nh"]
    n_units = nw * nh
    idx = 0
    for chunk in chunks:
        reader = _BitReader(chunk.replace(b"\xff\x00", b"\xff"))
        c["pred"] = 0
        end = (
            min(idx + restart_interval, n_units)
            if restart_interval
            else n_units
        )
        while idx < end:
            blk = np.zeros(64, dtype=np.int64)
            s = reader.decode_symbol(dc_t)
            diff = _extend(reader.read_bits(s), s)
            c["pred"] += diff
            blk[0] = c["pred"]
            k = 1
            while k < 64:
                rs = reader.decode_symbol(ac_t)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC index overflow")
                blk[k] = _extend(reader.read_bits(s), s)
                k += 1
            row, col = divmod(idx, nw)
            c["coef"][row * c["bw"] + col] = blk
            idx += 1
    return _reconstruct(frame, qt)


def _reconstruct(frame, qt):
    """Dequantize + inverse DCT all accumulated coefficient grids,
    upsample, and color-convert — shared by the baseline single-scan
    path and the progressive end-of-image path."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # dequantize + inverse DCT, all blocks of a component at once
    planes = []
    for c in comps:
        dq = c["coef"] * qt[c["tq"]][None, :]
        zz = np.zeros_like(dq)
        zz[:, _ZIGZAG] = dq  # un-zigzag
        blocks = zz.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ki,nkl,lj->nij", _C, blocks, _C)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution then crop
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes[:3])
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# --------------------------------------------------------------------- #
# progressive (SOF2) scan decoding — T.81 G.2. Each scan deposits bits
# of the coefficient grids; _reconstruct runs once at EOI.
# --------------------------------------------------------------------- #


def _dc_unit(reader, c, dc_t, idx, ah, al) -> None:
    """One block's DC contribution (T.81 G.2.1/G.2.2)."""
    if ah == 0:  # first pass: Huffman-coded diff of (DC >> Al)
        s = reader.decode_symbol(dc_t)
        c["pred"] += _extend(reader.read_bits(s), s)
        c["coef"][idx, 0] = c["pred"] << al
    elif reader.read_bit():  # refinement: one raw bit per block
        c["coef"][idx, 0] |= 1 << al


def _ac_first_unit(reader, blk, ac_t, ss, se, al, eobrun) -> int:
    """One block of an AC first-pass scan (T.81 G.2.2, decode side of
    figure G.3): values arrive point-transformed, stored << Al; an EOB
    symbol (r<15, s=0) opens a 2^r + ext-bits run of all-EOB blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_unit(reader, blk, ac_t, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (T.81 G.2.3): every already-
    nonzero coefficient in the band consumes a correction bit as the
    position pointer walks past it; newly-significant coefficients
    (always magnitude 1 at this precision) land on zero-history
    positions counted by the run length; EOB runs still carry the
    correction bits of the blocks they cover."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # correction-bit tail below covers k..se
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                # s is always 1 in a refinement scan (new coefficients
                # surface one bit at a time); the raw bit is the sign
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the remaining band
            if blk[k] != 0:
                if reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _prog_scan(frame, huff, scan_sel, ss, se, ah, al, chunks,
               restart_interval) -> None:
    """Apply one progressive scan to the frame's coefficient grids.

    DC scans (Ss=0) may interleave several components in MCU order;
    AC scans are single-component and walk the component's OWN
    (non-MCU-padded) block raster, per T.81 A.2.2. Restart intervals
    reset DC predictions and the EOB run."""
    comps = [c for c in frame["comps"] if c["id"] in scan_sel]
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    mcux = frame["mcux"]
    interleaved = len(comps) > 1
    if interleaved:
        n_units = mcux * frame["mcuy"]
    else:
        c0 = comps[0]
        # single-component DC scans also use the non-interleaved dims
        n_units = c0["nw"] * c0["nh"]
    unit = 0
    for chunk in chunks:
        reader = _BitReader(chunk.replace(b"\xff\x00", b"\xff"))
        for c in comps:
            c["pred"] = 0
        eobrun = 0
        end = (
            min(unit + restart_interval, n_units)
            if restart_interval
            else n_units
        )
        while unit < end:
            if ss == 0:
                if interleaved:
                    my, mx = divmod(unit, mcux)
                    for c in comps:
                        dc_t = (
                            huff[(0, scan_sel[c["id"]][0])] if ah == 0 else None
                        )
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                idx = (my * c["v"] + by) * c["bw"] + (
                                    mx * c["h"] + bx
                                )
                                _dc_unit(reader, c, dc_t, idx, ah, al)
                else:
                    c = comps[0]
                    dc_t = huff[(0, scan_sel[c["id"]][0])] if ah == 0 else None
                    row, col = divmod(unit, c["nw"])
                    _dc_unit(reader, c, dc_t, row * c["bw"] + col, ah, al)
            else:
                c = comps[0]
                ac_t = huff[(1, scan_sel[c["id"]][1])]
                row, col = divmod(unit, c["nw"])
                blk = c["coef"][row * c["bw"] + col]
                if ah == 0:
                    eobrun = _ac_first_unit(
                        reader, blk, ac_t, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_unit(
                        reader, blk, ac_t, ss, se, al, eobrun
                    )
            unit += 1
    frame["scanned"] = True


# --------------------------------------------------------------------- #
# encoder (baseline 4:4:4; tests drive the decoder through it)
# --------------------------------------------------------------------- #


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0


_STD_DC_TABLE = _HuffTable(*_STD_DC_LUMA)
_STD_AC_TABLE = _HuffTable(*_STD_AC_LUMA)


def _to_planes(img: np.ndarray, subsampling: str):
    """RGB/gray image → (planes, sampling factors) in encode order."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        return [img.astype(np.float64)], [(1, 1)]
    rgb = img.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsampling == "422":
        cbp = np.pad(cb, ((0, 0), (0, w % 2)), mode="edge")
        crp = np.pad(cr, ((0, 0), (0, w % 2)), mode="edge")
        cb = cbp.reshape(cbp.shape[0], cbp.shape[1] // 2, 2).mean(axis=2)
        cr = crp.reshape(crp.shape[0], crp.shape[1] // 2, 2).mean(axis=2)
        samps = [(2, 1), (1, 1), (1, 1)]
    elif subsampling == "420":
        # 2x2 box mean on an edge-padded even grid
        cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
        crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
        cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        samps = [(2, 2), (1, 1), (1, 1)]
    elif subsampling == "444":
        samps = [(1, 1), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling}")
    return [y, cb, cr], samps


def _mag_bits(v: int) -> tuple[int, int]:
    """signed value -> (n_bits, magnitude code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    n = int(abs(v)).bit_length()
    return n, v if v >= 0 else v + (1 << n) - 1


def _block_dct(plane: np.ndarray, bh: int, bw: int, q_rm: np.ndarray):
    """Pad a plane to the (bh, bw) block grid, forward-DCT every 8×8
    block, quantize by the row-major table → (bh, bw, 64) row-major
    coefficient vectors."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    fdct = np.einsum("ik,nmkl,jl->nmij", _C, blocks, _C)
    return np.round(fdct / q_rm.reshape(8, 8)).astype(np.int64).reshape(
        bh, bw, 64
    )


def _emit_block(wtr, blk_rowmajor, pred, dc_t, ac_t) -> int:
    """Entropy-code one block (row-major 64-vector); returns new DC."""
    blk = blk_rowmajor[_ZIGZAG]
    dc = int(blk[0])
    s, mag = _mag_bits(dc - pred)
    code, ln = dc_t.enc[s]
    wtr.write(code, ln)
    if s:
        wtr.write(mag, s)
    run = 0
    last = 63
    while last > 0 and blk[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t.enc[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        s, mag = _mag_bits(v)
        code, ln = ac_t.enc[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(mag, s)
        run = 0
    if last < 63:
        code, ln = ac_t.enc[0x00]  # EOB
        wtr.write(code, ln)
    return dc


def encode_jpeg(
    img: np.ndarray,
    qtable: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) → baseline JPEG using the
    Annex-K standard Huffman tables. ``qtable`` is a flat 64-entry
    zigzag-order quantization table for every component (default:
    all-ones → only DCT/IDCT rounding loss, so roundtrip error is a
    few counts per pixel — tight enough for exact-bound tests).
    ``subsampling``: "444", "422" (2×1 box-mean chroma) or "420"
    (2×2 — RGB only; exercises the decoder's MCU interleave +
    upsample paths).
    ``restart_interval``: emit DRI and RSTn every N MCUs (exercises
    the decoder's DC-prediction reset path)."""
    if qtable is None:
        qtable = np.ones(64, dtype=np.int64)
    qtable = np.asarray(qtable, dtype=np.int64).reshape(64)
    h, w = img.shape[:2]
    planes, samps = _to_planes(img, subsampling)
    dc_t, ac_t = _STD_DC_TABLE, _STD_AC_TABLE
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    q_rowmajor = np.zeros(64, dtype=np.int64)
    q_rowmajor[_ZIGZAG] = qtable
    coefs = [
        _block_dct(p, mcuy * sv, mcux * sh, q_rowmajor)
        for p, (sh, sv) in zip(planes, samps)
    ]
    out_chunks = []
    wtr = _BitWriter()
    preds = [0] * len(planes)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            out_chunks.append(bytes(wtr.out))
            out_chunks.append(
                bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            )
            wtr = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, ((sh, sv), cz) in enumerate(zip(samps, coefs)):
            for by in range(sv):
                for bx in range(sh):
                    preds[ci] = _emit_block(
                        wtr,
                        cz[my * sv + by, mx * sh + bx],
                        preds[ci],
                        dc_t,
                        ac_t,
                    )
    wtr.flush()
    out_chunks.append(bytes(wtr.out))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    ncomp = len(planes)
    if int(qtable.max()) > 255:
        dqt = seg(
            0xDB,
            bytes([0x10])
            + b"".join(int(x).to_bytes(2, "big") for x in qtable),
        )
    else:
        dqt = seg(0xDB, bytes([0]) + bytes(int(x) for x in qtable))
    sof_comps = b"".join(
        bytes([cid + 1, (samps[cid][0] << 4) | samps[cid][1], 0])
        for cid in range(ncomp)
    )
    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([ncomp]) + sof_comps,
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_STD_DC_LUMA[0]) + bytes(_STD_DC_LUMA[1])
        + bytes([0x10]) + bytes(_STD_AC_LUMA[0]) + bytes(_STD_AC_LUMA[1]),
    )
    dri = (
        seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    sos_comps = b"".join(bytes([cid + 1, 0x00]) for cid in range(ncomp))
    sos = seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos
        + b"".join(out_chunks) + b"\xff\xd9"
    )


# --------------------------------------------------------------------- #
# progressive encoder — emits real multi-scan SOF2 bitstreams so the
# progressive decoder's EOB-run and refinement paths are test-driven.
# --------------------------------------------------------------------- #

# The baseline Annex-K AC table has no EOBn symbols (0x10..0xE0), so it
# cannot code banked EOB runs — real progressive encoders ship custom
# tables. This one is the simplest legal choice: every AC symbol value
# 0..254 as a 9-bit canonical code (Kraft: 255/512 < 1). Terrible
# compression, trivially correct — the tests care about the bitstream
# structure, not the byte count.
_FLAT_AC_TABLE = _HuffTable([0] * 8 + [255] + [0] * 7, list(range(255)))


def _emit_eobrun(wtr, state, ac_t) -> None:
    """Flush a banked EOB run: the EOBn symbol, its extension bits,
    then the correction bits buffered for the run's blocks."""
    n = state["eobrun"]
    if n:
        r = n.bit_length() - 1
        code, ln = ac_t.enc[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(n - (1 << r), r)
        state["eobrun"] = 0
    _drain_br(wtr, state)


def _drain_br(wtr, state) -> None:
    for bit in state["br"]:
        wtr.write(bit, 1)
    state["br"] = []


def _emit_ac_first_block(wtr, state, zz, ss, se, al, ac_t) -> None:
    """AC first pass (T.81 G.1.2.2): point-transformed band values,
    EOB runs banked across all-trailing-zero blocks."""
    v = []
    for k in range(ss, se + 1):
        c = int(zz[k])
        m = abs(c) >> al
        v.append(-m if c < 0 else m)
    last = len(v) - 1
    while last >= 0 and v[last] == 0:
        last -= 1
    if last < 0:  # whole band zero: one more run member
        state["eobrun"] += 1
        if state["eobrun"] == 32767:
            _emit_eobrun(wtr, state, ac_t)
        return
    _emit_eobrun(wtr, state, ac_t)  # a coded block ends any pending run
    r = 0
    for i in range(last + 1):
        val = v[i]
        if val == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_t.enc[0xF0]
            wtr.write(code, ln)
            r -= 16
        s, mag = _mag_bits(val)
        code, ln = ac_t.enc[(r << 4) | s]
        wtr.write(code, ln)
        wtr.write(mag, s)
        r = 0
    if last < len(v) - 1:  # trailing zeros: this block joins a new run
        state["eobrun"] += 1
        if state["eobrun"] == 32767:
            _emit_eobrun(wtr, state, ac_t)


def _emit_ac_refine_block(wtr, state, zz, ss, se, al, ac_t) -> None:
    """AC refinement pass (T.81 G.1.2.3): newly-significant
    coefficients (magnitude 1 at this precision) are Huffman-coded
    with zero-HISTORY run lengths; already-nonzero coefficients
    contribute one correction bit each, buffered and drained right
    after the next emitted symbol so the decoder's position walk
    consumes them in order; EOB runs carry the covered blocks'
    correction bits."""
    mags, signs = [], []
    for k in range(ss, se + 1):
        c = int(zz[k])
        mags.append(abs(c) >> al)
        signs.append(1 if c > 0 else 0)
    last_new = -1
    for i, m in enumerate(mags):
        if m == 1:
            last_new = i
    if last_new < 0:  # no new coefficients: run member + its bits
        state["eobrun"] += 1
        state["br"].extend(m & 1 for m in mags if m > 1)
        if state["eobrun"] == 32767:
            _emit_eobrun(wtr, state, ac_t)
        return
    _emit_eobrun(wtr, state, ac_t)
    r = 0
    for i in range(last_new + 1):
        m = mags[i]
        if m == 0:
            r += 1
            continue
        # ZRLs flush BEFORE this position's own contribution, so the
        # buffered bits stay aligned with the decoder's 16-zero walk
        while r > 15:
            code, ln = ac_t.enc[0xF0]
            wtr.write(code, ln)
            _drain_br(wtr, state)
            r -= 16
        if m > 1:
            state["br"].append(m & 1)
            continue
        code, ln = ac_t.enc[(r << 4) | 1]
        wtr.write(code, ln)
        wtr.write(signs[i], 1)
        _drain_br(wtr, state)
        r = 0
    if last_new < len(mags) - 1:  # band tail joins a new EOB run
        state["eobrun"] += 1
        state["br"].extend(
            mags[i] & 1
            for i in range(last_new + 1, len(mags))
            if mags[i] > 1
        )
        if state["eobrun"] == 32767:
            _emit_eobrun(wtr, state, ac_t)


def _scan_entropy(n_units, restart_interval, make_state, emit_unit,
                  finish_chunk=None) -> bytes:
    """Drive one scan's entropy coding, inserting RSTn markers and
    resetting scan state every ``restart_interval`` units."""
    parts: list[bytes] = []
    u = rst = 0
    while True:
        wtr = _BitWriter()
        state = make_state()
        end = (
            min(u + restart_interval, n_units)
            if restart_interval
            else n_units
        )
        while u < end:
            emit_unit(wtr, state, u)
            u += 1
        if finish_chunk:
            finish_chunk(wtr, state)
        wtr.flush()
        parts.append(bytes(wtr.out))
        if u >= n_units:
            return b"".join(parts)
        parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
        rst += 1


def encode_jpeg_progressive(
    img: np.ndarray,
    qtable: np.ndarray | None = None,
    subsampling: str = "444",
    successive: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) → progressive (SOF2) JPEG.

    ``successive=False`` emits a spectral-selection-only script
    (interleaved DC scan, then per-component AC bands 1-5 and 6-63);
    ``successive=True`` adds one successive-approximation level
    (DC first at Al=1 + DC refine; AC first at Al=1 + AC refine to
    Al=0), exercising all four progressive scan kinds including
    banked EOB runs with correction bits."""
    if qtable is None:
        qtable = np.ones(64, dtype=np.int64)
    qtable = np.asarray(qtable, dtype=np.int64).reshape(64)
    h, w = img.shape[:2]
    planes, samps = _to_planes(img, subsampling)
    ncomp = len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    q_rm = np.zeros(64, dtype=np.int64)
    q_rm[_ZIGZAG] = qtable
    coefs = [
        _block_dct(p, mcuy * sv, mcux * sh, q_rm)
        for p, (sh, sv) in zip(planes, samps)
    ]
    zzs = [cz[:, :, _ZIGZAG] for cz in coefs]  # zigzag-order vectors
    # non-interleaved block dims (what single-component scans cover)
    nwh = [
        (
            (-(-(w * sh) // hmax) + 7) // 8,
            (-(-(h * sv) // vmax) + 7) // 8,
        )
        for sh, sv in samps
    ]
    dc_t, ac_t = _STD_DC_TABLE, _FLAT_AC_TABLE

    def dc_scan(al: int):
        def mk():
            return {"preds": [0] * ncomp}

        def emit(wtr, state, m):
            my, mx = divmod(m, mcux)
            for ci in range(ncomp):
                sh, sv = samps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(zzs[ci][my * sv + by, mx * sh + bx, 0]) >> al
                        s, mag = _mag_bits(dc - state["preds"][ci])
                        code, ln = dc_t.enc[s]
                        wtr.write(code, ln)
                        if s:
                            wtr.write(mag, s)
                        state["preds"][ci] = dc

        data = _scan_entropy(mcux * mcuy, restart_interval, mk, emit)
        comps_b = b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
        return bytes([ncomp]) + comps_b + bytes([0, 0, al]), data

    def dc_refine(ah: int, al: int):
        def mk():
            return {}

        def emit(wtr, state, m):
            my, mx = divmod(m, mcux)
            for ci in range(ncomp):
                sh, sv = samps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bit = (
                            int(zzs[ci][my * sv + by, mx * sh + bx, 0]) >> al
                        ) & 1
                        wtr.write(bit, 1)

        data = _scan_entropy(mcux * mcuy, restart_interval, mk, emit)
        comps_b = b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
        return bytes([ncomp]) + comps_b + bytes([0, 0, (ah << 4) | al]), data

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int):
        nw, nh = nwh[ci]
        block_fn = _emit_ac_first_block if ah == 0 else _emit_ac_refine_block

        def mk():
            return {"eobrun": 0, "br": []}

        def emit(wtr, state, u):
            row, col = divmod(u, nw)
            block_fn(wtr, state, zzs[ci][row, col], ss, se, al, ac_t)

        def fin(wtr, state):
            _emit_eobrun(wtr, state, ac_t)

        data = _scan_entropy(nw * nh, restart_interval, mk, emit, fin)
        body = bytes([1, ci + 1, 0x00]) + bytes([ss, se, (ah << 4) | al])
        return body, data

    scans = []
    if successive:
        scans.append(dc_scan(1))
        for ci in range(ncomp):
            scans.append(ac_scan(ci, 1, 63, 0, 1))
        scans.append(dc_refine(1, 0))
        for ci in range(ncomp):
            scans.append(ac_scan(ci, 1, 63, 1, 0))
    else:
        scans.append(dc_scan(0))
        for ci in range(ncomp):
            scans.append(ac_scan(ci, 1, 5, 0, 0))
            scans.append(ac_scan(ci, 6, 63, 0, 0))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    if int(qtable.max()) > 255:
        dqt = seg(
            0xDB,
            bytes([0x10])
            + b"".join(int(x).to_bytes(2, "big") for x in qtable),
        )
    else:
        dqt = seg(0xDB, bytes([0]) + bytes(int(x) for x in qtable))
    sof_comps = b"".join(
        bytes([cid + 1, (samps[cid][0] << 4) | samps[cid][1], 0])
        for cid in range(ncomp)
    )
    sof = seg(
        0xC2,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([ncomp]) + sof_comps,
    )
    flat_counts = [0] * 8 + [255] + [0] * 7
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_STD_DC_LUMA[0]) + bytes(_STD_DC_LUMA[1])
        + bytes([0x10]) + bytes(flat_counts) + bytes(range(255)),
    )
    dri = (
        seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    out = [b"\xff\xd8", dqt, sof, dht, dri]
    for body, data in scans:
        out.append(seg(0xDA, body))
        out.append(data)
    out.append(b"\xff\xd9")
    return b"".join(out)
