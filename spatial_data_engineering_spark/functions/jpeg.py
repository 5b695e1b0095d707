"""Minimal pure-stdlib+numpy baseline JPEG codec.

Round-7 extension of the functions/png.py pattern: the container forbids
installing Pillow, which kept q70's real-decode branch env-gated for
JPEG payloads even after PNG gained its stdlib codec.  Baseline JPEG
(ISO/IEC 10918-1, SOF0) needs nothing beyond ``struct`` for the marker
layer and table math that numpy (a baked-in dependency) does directly:
8x8 DCT via a precomputed orthonormal cosine matrix, the Annex K
quantization and Huffman tables, and a byte-stuffed bit reader/writer.

Supported surface (the baseline every encoder can emit):
- decode: SOF0 baseline, 8-bit, grayscale (1 component) or YCbCr
  (3 components) WITHOUT chroma subsampling (all sampling factors 1x1),
  restart intervals honored; raises ValueError on progressive (SOF2),
  12-bit, arithmetic coding, or subsampled streams so callers can
  distinguish "not supported" from "corrupt".
- probe: header-only (width, height, channels) — parses to SOF0 without
  entropy-decoding, the cheap path q70's metadata decode wants.
- encode: the test-fixture twin (grayscale or RGB input, 4:4:4, Annex K
  tables scaled by the libjpeg quality formula) so tests can build real
  JPEG bytes without any imaging library.

Original implementation from the published spec; the reference repo
delegates all raster IO to terra/GDAL
(scripts/R/spatial_analysis_indonesia.r:11,30) and has no
codec code to copy.  Lossiness note: JPEG round-trips are inexact by
design (DCT quantization); tests pin exactness only where the math is
exact (flat blocks at quality 100 quantize to DC-only with step 1) and
bound the error elsewhere.

Scale note: like the PNG codec, this runs per-payload inside
Arrow-batched ``mapInPandas`` — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag order, Annex K tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization tables (luminance, chrominance)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (bits per code length 1..16, symbol values)
_DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                   list(range(12)))
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal DCT-II matrix: spatial = C.T @ coef @ C, coef = C @ spatial @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.25) if _k else np.sqrt(0.125))


def is_jpeg(payload: bytes) -> bool:
    return bytes(payload[:2]) == b"\xff\xd8"


# ---------------------------------------------------------------------------
# Huffman code construction (spec C.2): canonical codes from (bits, vals)
# ---------------------------------------------------------------------------

def _build_codes(bits, vals):
    """(length, code) per symbol in spec order -> {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits, vals):
    """{(length, code): symbol} for the bit-at-a-time decoder."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing."""

    def __init__(self, data: bytes, off: int):
        self.data, self.off, self.acc, self.nbits = data, off, 0, 0

    def _fill(self):
        b = self.data[self.off]
        self.off += 1
        if b == 0xFF:
            nxt = self.data[self.off]
            if nxt == 0x00:
                self.off += 1  # stuffed byte
            else:
                # restart markers are consumed by the DRI-aware MCU loop
                # at byte-aligned boundaries; hitting ANY marker mid-fill
                # means the stream and the tables disagree
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in "
                                 "entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self):
        self.nbits = 0

    def next_marker(self):
        """After byte_align: step past a marker (used for restarts)."""
        while self.data[self.off] != 0xFF:
            self.off += 1
        while self.data[self.off] == 0xFF:
            self.off += 1
        m = self.data[self.off]
        self.off += 1
        return m


def _decode_symbol(br: _BitReader, table) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | br.read_bit()
        length += 1
        if length > 16:
            raise ValueError("invalid Huffman stream")
        sym = table.get((length, code))
        if sym is not None:
            return sym


def _extend(v: int, t: int) -> int:
    """Spec F.12: map t magnitude bits to a signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# header parse (shared by probe/decode)
# ---------------------------------------------------------------------------

def _parse(payload: bytes, need_tables: bool):
    data = bytes(payload)
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream")
    off = 2
    qt, huff_dc, huff_ac = {}, {}, {}
    frame = None
    restart = 0
    while off + 4 <= len(data):
        if data[off] != 0xFF:
            raise ValueError("marker expected")
        marker = data[off + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            off += 1
            continue
        off += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[off:off + 2])
        seg = data[off + 2:off + seglen]
        if marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("chroma subsampling not supported "
                                     "(4:4:4 only)")
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF 0x{marker:02X}) "
                             "not supported")
        elif marker == 0xDB and need_tables:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4:
                    raise ValueError("16-bit quant tables not supported")
                qt[pq_tq & 0xF] = np.frombuffer(
                    seg[p + 1:p + 65], dtype=np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4 and need_tables:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                table = _build_decoder(bits, vals)
                if tc_th >> 4:
                    huff_ac[tc_th & 0xF] = table
                else:
                    huff_dc[tc_th & 0xF] = table
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scomp = [(seg[1 + 2 * i], seg[2 + 2 * i]) for i in range(ns)]
            return frame, qt, huff_dc, huff_ac, restart, scomp, off + seglen
        off += seglen
    raise ValueError("no SOS/SOF0 marker found")


def probe(payload: bytes):
    """JPEG bytes -> (width, height, channels) from the SOF0 header only."""
    w, h, comps = _parse(payload, need_tables=False)[0]
    return w, h, len(comps)


def decode(payload: bytes):
    """JPEG bytes -> (width, height, channels, flat bytearray of pixels).

    Grayscale streams yield 1 channel; 3-component streams are converted
    JFIF YCbCr -> RGB.  Baseline 4:4:4 only (see module docstring).
    """
    frame, qt, huff_dc, huff_ac, restart, scomp, off = _parse(
        payload, need_tables=True)
    w, h, comps = frame
    ncomp = len(comps)
    if ncomp not in (1, 3):
        raise ValueError(f"{ncomp}-component JPEG not supported")
    data = bytes(payload)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64)
              for _ in range(ncomp)]
    # scan-component order maps component id -> (dc table, ac table, qt)
    tables = []
    for cid_scan, tdta in scomp:
        for cid, tq in comps:
            if cid == cid_scan:
                tables.append((huff_dc[tdta >> 4], huff_ac[tdta & 0xF],
                               qt[tq]))
                break
        else:
            raise ValueError("scan component not in frame")
    br = _BitReader(data, off)
    pred = [0] * ncomp
    n_mcu = bw * bh
    for mcu in range(n_mcu):
        for ci in range(ncomp):
            dc_t, ac_t, q = tables[ci]
            zz = np.zeros(64, dtype=np.int64)
            t = _decode_symbol(br, dc_t)
            diff = _extend(br.read_bits(t), t)
            pred[ci] += diff
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = _decode_symbol(br, ac_t)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.read_bits(s), s)
                k += 1
            block = np.zeros(64, dtype=np.float64)
            block[ZIGZAG] = zz * q
            spatial = _C.T @ block.reshape(8, 8) @ _C
            by, bx = divmod(mcu, bw)
            planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = spatial
        if restart and (mcu + 1) % restart == 0 and mcu + 1 < n_mcu:
            br.byte_align()
            m = br.next_marker()
            if not 0xD0 <= m <= 0xD7:
                raise ValueError("expected restart marker")
            pred = [0] * ncomp
    out = [np.clip(np.round(p[:h, :w] + 128.0), 0, 255) for p in planes]
    if ncomp == 1:
        return w, h, 1, bytearray(out[0].astype(np.uint8).tobytes())
    y, cb, cr = out
    r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(np.round(y - 0.344136 * (cb - 128.0)
                         - 0.714136 * (cr - 128.0)), 0, 255)
    b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255)
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return w, h, 3, bytearray(rgb.tobytes())


# ---------------------------------------------------------------------------
# encoder (test fixtures)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode(pixels, width: int, height: int, channels: int,
           quality: int = 85) -> bytes:
    """Flat pixel bytes (row-major, interleaved) -> baseline JPEG bytes.

    channels 1 (grayscale) or 3 (RGB, stored 4:4:4 YCbCr).
    """
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(np.float64)
    if channels == 1:
        planes = [arr.reshape(height, width)]
        qts = [_quality_scale(_QT_LUMA, quality)]
    elif channels == 3:
        rgb = arr.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        qts = [_quality_scale(_QT_LUMA, quality),
               _quality_scale(_QT_CHROMA, quality),
               _quality_scale(_QT_CHROMA, quality)]
    else:
        raise ValueError("channels must be 1 or 3")

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0: 1x1 density, no thumb
    # DQT (one marker per table; tables are stored in zigzag order)
    uniq_qts = qts[:1] if channels == 1 else qts[:2]
    for tid, q in enumerate(uniq_qts):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()
    # SOF0
    ncomp = channels
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8,
                                     height, width, ncomp)
    for i in range(ncomp):
        out += struct.pack("BBB", i + 1, 0x11, 0 if i == 0 else 1)
    # DHT
    specs = [(0x00, _DC_LUMA_SPEC), (0x10, _AC_LUMA_SPEC)]
    if channels == 3:
        specs += [(0x01, _DC_CHROMA_SPEC), (0x11, _AC_CHROMA_SPEC)]
    for tc_th, (bits, vals) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th) \
            + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += struct.pack("BB", i + 1, 0x00 if i == 0 else 0x11)
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    dc_luma = _build_codes(*_DC_LUMA_SPEC)
    ac_luma = _build_codes(*_AC_LUMA_SPEC)
    dc_chroma = _build_codes(*_DC_CHROMA_SPEC)
    ac_chroma = _build_codes(*_AC_CHROMA_SPEC)

    # interleaved MCUs (4:4:4: one block per component per MCU) with a
    # single predictor per component — encode per-block lazily
    bw = _BitWriter()
    nby, nbx = (height + 7) // 8, (width + 7) // 8
    padded = [np.pad(p, ((0, nby * 8 - height), (0, nbx * 8 - width)),
                     mode="edge") for p in planes]
    pred = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                block = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _C @ (block - 128.0) @ _C.T
                q = qts[ci]
                # zigzag: stream position i carries flat index ZIGZAG[i]
                zz = np.round(coef.reshape(-1)[ZIGZAG]
                              / q.reshape(-1)[ZIGZAG].astype(np.float64)
                              ).astype(np.int64)
                dc_codes = dc_luma if ci == 0 else dc_chroma
                ac_codes = ac_luma if ci == 0 else ac_chroma
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _category(diff)
                code, ln = dc_codes[t]
                bw.write(code, ln)
                if t:
                    bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                last_nz = 0
                for k in range(63, 0, -1):
                    if zz[k]:
                        last_nz = k
                        break
                run = 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[0x00]
                    bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
