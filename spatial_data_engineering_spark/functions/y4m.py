"""Minimal pure-stdlib YUV4MPEG2 (Y4M) parser.

The video half of the multimodal surface kept its real branch fully
env-gated on ffmpeg.  Compressed codecs (H.264 etc.) genuinely need it,
but ffmpeg's own uncompressed interchange format — Y4M, what
``ffmpeg -f yuv4mpeg2`` emits and every rawvideo pipeline consumes — is
a plain-text header plus raw planes, parseable with stdlib bytes ops.
This gives ``sample_frames_batch(real=True)`` a genuinely executable
in-container path (the functions/png.py / functions/jpeg.py pattern),
with compressed containers still raising so callers can route them to a
real ffmpeg where one exists.

Supported: C420 family (420, 420jpeg, 420mpeg2, 420paldv), C422, C444,
Cmono; interlacing and frame-level parameter overrides are accepted and
ignored (frame size is constant per stream, per spec).

Scale note: like the image codecs this runs per-payload inside
Arrow-batched ``mapInPandas`` — embarrassingly parallel, no shuffle,
payload bytes never leave the executor.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2 "

# chroma tag -> bytes per frame as a multiple of (w*h) in sixths
_PLANE_SIXTHS = {
    b"420": 9, b"420jpeg": 9, b"420mpeg2": 9, b"420paldv": 9,
    b"422": 12, b"444": 18, b"mono": 6,
}


def is_y4m(payload: bytes) -> bool:
    return bytes(payload[:10]) == _MAGIC


def _header(payload: bytes):
    """-> (width, height, chroma_sixths, first_frame_offset)."""
    data = bytes(payload)
    if not is_y4m(data):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    w = h = None
    sixths = _PLANE_SIXTHS[b"420"]  # C420 is the spec default
    for param in data[10:nl].split(b" "):
        if not param:
            continue
        tag, val = param[:1], param[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            if val not in _PLANE_SIXTHS:
                raise ValueError(f"unsupported Y4M chroma {val!r}")
            sixths = _PLANE_SIXTHS[val]
        # F (rate), I (interlace), A (aspect), X (comment): ignored
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if (w * h * sixths) % 6:
        raise ValueError("fractional plane size (odd dims for 4:2:0?)")
    return w, h, sixths, nl + 1


def probe(payload: bytes):
    """Y4M bytes -> (width, height, n_frames) without copying planes."""
    w, h, sixths, off = _header(payload)
    data = bytes(payload)
    fsize = w * h * sixths // 6
    n = 0
    while off < len(data):
        if data[off:off + 5] != b"FRAME":
            raise ValueError(f"FRAME marker expected at offset {off}")
        nl = data.find(b"\n", off)
        if nl < 0 or nl + 1 + fsize > len(data):
            raise ValueError("truncated Y4M frame")
        off = nl + 1 + fsize
        n += 1
    return w, h, n


def iter_frames(payload: bytes):
    """Yields (frame_idx, width, height, plane_bytes) per frame."""
    w, h, sixths, off = _header(payload)
    data = bytes(payload)
    fsize = w * h * sixths // 6
    idx = 0
    while off < len(data):
        if data[off:off + 5] != b"FRAME":
            raise ValueError(f"FRAME marker expected at offset {off}")
        nl = data.find(b"\n", off)
        if nl < 0 or nl + 1 + fsize > len(data):
            raise ValueError("truncated Y4M frame")
        yield idx, w, h, data[nl + 1:nl + 1 + fsize]
        off = nl + 1 + fsize
        idx += 1


def encode(width: int, height: int, frames, chroma: str = "420") -> bytes:
    """Test-fixture twin: raw plane bytes per frame -> Y4M bytes."""
    tag = chroma.encode()
    if tag not in _PLANE_SIXTHS:
        raise ValueError(f"unsupported chroma {chroma}")
    fsize = width * height * _PLANE_SIXTHS[tag] // 6
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n" % (width, height, tag))
    for planes in frames:
        if len(planes) != fsize:
            raise ValueError(f"frame must be exactly {fsize} bytes")
        out += b"FRAME\n" + bytes(planes)
    return bytes(out)
