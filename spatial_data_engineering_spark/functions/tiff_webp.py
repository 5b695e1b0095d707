"""TIFF and WebP structure parsers (metadata path).

Last two members of the in-container codec family.  Like
functions/gif.py these parse STRUCTURE only — the decode_image_batch
contract is (width, height, n_frames) — so no compression codec is
touched: TIFF metadata lives in IFD tag entries (width 256, length
257; one IFD per page, chained), and WebP metadata lives in the fixed
headers of the VP8 / VP8L / VP8X chunks (ANMF sub-chunks counted for
animations).  Pixel decode for either genuinely needs external
libraries and stays Pillow-gated.
"""

from __future__ import annotations

import struct


# ----------------------------------------------------------------- TIFF

def is_tiff(payload: bytes) -> bool:
    head = bytes(payload[:4])
    return head in (b"II*\x00", b"MM\x00*")


def probe_tiff(payload: bytes):
    """TIFF bytes -> (width, height, n_pages) from the IFD chain."""
    data = bytes(payload)
    if not is_tiff(data):
        raise ValueError("not a TIFF stream")
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    w = h = None
    n_pages = 0
    seen = set()
    while ifd_off:
        if ifd_off in seen:
            raise ValueError("cyclic TIFF IFD chain")
        seen.add(ifd_off)
        if ifd_off + 2 > len(data):
            raise ValueError("truncated TIFF IFD")
        (n_entries,) = struct.unpack(
            endian + "H", data[ifd_off:ifd_off + 2])
        end = ifd_off + 2 + 12 * n_entries
        if end + 4 > len(data):
            raise ValueError("truncated TIFF IFD entries")
        for i in range(n_entries):
            off = ifd_off + 2 + 12 * i
            tag, typ = struct.unpack(endian + "HH", data[off:off + 4])
            if tag in (256, 257):
                if typ == 3:    # SHORT (value packed into the field)
                    (v,) = struct.unpack(
                        endian + "H", data[off + 8:off + 10])
                elif typ == 4:  # LONG
                    (v,) = struct.unpack(
                        endian + "I", data[off + 8:off + 12])
                else:
                    raise ValueError(
                        f"TIFF tag {tag} with unexpected type {typ}")
                if n_pages == 0:  # dimensions: first page's
                    if tag == 256:
                        w = v
                    else:
                        h = v
        n_pages += 1
        (ifd_off,) = struct.unpack(endian + "I", data[end:end + 4])
    if w is None or h is None:
        raise ValueError("TIFF stream missing width/length tags")
    return w, h, n_pages


def encode_tiff(width: int, height: int, n_pages: int = 1) -> bytes:
    """Test-fixture twin: a structurally valid little-endian TIFF with
    n_pages minimal IFDs (no pixel strips — structure parsers only)."""
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8)  # first IFD right after the header
    off = 8
    for p in range(n_pages):
        entries = [(256, 4, width), (257, 4, height)]
        out += struct.pack("<H", len(entries))
        for tag, typ, val in entries:
            out += struct.pack("<HHII", tag, typ, 1, val)
        off = len(out) + 4
        is_last = p == n_pages - 1
        out += struct.pack("<I", 0 if is_last else off)
    return bytes(out)


# ----------------------------------------------------------------- WebP

def is_webp(payload: bytes) -> bool:
    return (bytes(payload[:4]) == b"RIFF"
            and bytes(payload[8:12]) == b"WEBP")


def probe_webp(payload: bytes):
    """WebP bytes -> (width, height, n_frames) from the chunk headers."""
    data = bytes(payload)
    if not is_webp(data):
        raise ValueError("not a WebP stream")
    off = 12
    w = h = None
    n_frames = 0
    while off + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[off:off + 8])
        body = data[off + 8:off + 8 + size]
        if cid == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated VP8X chunk")
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
        elif cid == b"VP8L":
            if len(body) < 5 or body[0] != 0x2F:
                raise ValueError("bad VP8L signature")
            bits = int.from_bytes(body[1:5], "little")
            if w is None:
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
            n_frames += 1
        elif cid == b"VP8 ":
            # lossy: 3-byte frame tag, 3-byte start code 9D 01 2A, then
            # 14-bit width/height (low 14 of each LE 16-bit field)
            if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 key frame header")
            if w is None:
                w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
                h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            n_frames += 1
        elif cid == b"ANMF":
            n_frames += 1
        off += 8 + size + (size & 1)
    if w is None or h is None:
        raise ValueError("WebP stream missing image header chunk")
    return w, h, max(n_frames, 1)


def encode_webp_lossless(width: int, height: int) -> bytes:
    """Test-fixture twin: a VP8L header-only WebP (structure parsers)."""
    if not (1 <= width <= 0x4000 and 1 <= height <= 0x4000):
        raise ValueError("dims out of VP8L 14-bit range")
    bits = (width - 1) | ((height - 1) << 14)
    body = bytes([0x2F]) + bits.to_bytes(4, "little")
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
    out += b"VP8L" + struct.pack("<I", len(body)) + body
    return out
