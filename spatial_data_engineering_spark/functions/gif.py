"""Minimal pure-stdlib GIF structure parser (metadata path).

Third member of the in-container codec family (png.py, jpeg.py,
y4m.py).  ``decode_image_batch``'s contract is typed METADATA —
(width, height, n_frames) — and GIF's block structure yields all three
without touching LZW: the logical screen descriptor carries the
dimensions, and frames are counted by walking the block graph
(extensions and image descriptors with length-prefixed sub-blocks,
color tables sized by their packed flags).  This notably makes
``n_frames > 1`` REAL for animated GIFs — the one metadata column the
PNG/JPEG paths always pin to 1.

Pixel decode (LZW) is deliberately out of scope: no current operator
consumes GIF pixels, and the gate for them remains Pillow.

Scale note: per-payload inside Arrow-batched mapInPandas, like every
codec here.
"""

from __future__ import annotations

import struct

_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(payload: bytes) -> bool:
    return bytes(payload[:6]) in _MAGICS


def _skip_subblocks(data: bytes, off: int) -> int:
    """Skip a length-prefixed sub-block chain; -> offset past terminator."""
    while True:
        if off >= len(data):
            raise ValueError("truncated GIF sub-block chain")
        n = data[off]
        off += 1 + n
        if n == 0:
            return off


def probe(payload: bytes):
    """GIF bytes -> (width, height, n_frames) by block traversal only."""
    data = bytes(payload)
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", data[6:10])
    packed = data[10]
    off = 13
    if packed & 0x80:  # global color table: 3 * 2^(size+1) bytes
        off += 3 * (2 << (packed & 0x07))
    n_frames = 0
    while off < len(data):
        b = data[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if off >= len(data):
                raise ValueError("truncated GIF extension")
            off = _skip_subblocks(data, off + 1)
        elif b == 0x2C:  # image descriptor
            if off + 9 > len(data):
                raise ValueError("truncated GIF image descriptor")
            ipacked = data[off + 8]
            off += 9
            if ipacked & 0x80:  # local color table
                off += 3 * (2 << (ipacked & 0x07))
            off += 1  # LZW minimum code size
            off = _skip_subblocks(data, off)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    if n_frames == 0:
        raise ValueError("GIF stream contains no image data")
    return w, h, n_frames


def encode_frames(width: int, height: int, n_frames: int) -> bytes:
    """Test-fixture twin: a structurally valid GIF89a with n_frames
    image descriptors (animated when n_frames > 1).  The pixel payload
    per frame is the minimal LZW stream ``clear, EOI`` (codes 4 then 5
    at min-code-size 2, packed LSB-first into the single byte 0x2C) —
    a correct sub-block chain for structure parsers; pixel-level
    decoders would see an empty image, which is fine because nothing
    in-container decodes GIF pixels (that gate stays Pillow)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80, 0, 0])  # GCT present, 2 entries; bg 0; no aspect
    out += bytes([0, 0, 0, 255, 255, 255])  # the 2-entry GCT
    for _ in range(n_frames):
        # graphic control extension (what gives animations their timing)
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) \
            + b"\x00"  # image descriptor, no local color table
        out += bytes([2, 1, 0x2C, 0])  # LZW min size 2; [clear, EOI]; end
    out += b"\x3b"
    return bytes(out)
