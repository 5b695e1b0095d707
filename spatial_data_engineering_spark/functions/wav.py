"""Minimal pure-stdlib WAV (RIFF/WAVE) codec.

Audio member of the in-container codec family (png/jpeg/gif/y4m).  The
multimodal north star treats audio as an opaque binary column with
typed metadata and Pandas-UDF feature extraction; uncompressed WAV —
the interchange format every audio pipeline can emit — parses with
``struct`` alone: RIFF chunk walk, fmt fields, PCM (format 1, 8/16/
24/32-bit) or IEEE float (format 3) samples decoded to numpy float64
in [-1, 1].  Compressed audio (mp3/aac/ogg) raises toward the ffmpeg
gate, exactly like compressed video in functions/y4m.py.

Scale note: per-payload inside Arrow-batched mapInPandas — the same
embarrassingly-parallel, shuffle-free shape as every codec here.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(payload: bytes) -> bool:
    return (bytes(payload[:4]) == b"RIFF"
            and bytes(payload[8:12]) == b"WAVE")


def _chunks(data: bytes):
    off = 12
    while off + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[off:off + 8])
        yield cid, data[off + 8:off + 8 + size]
        off += 8 + size + (size & 1)  # chunks are word-aligned


def _fmt(payload: bytes):
    data = bytes(payload)
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    body = None
    for cid, chunk in _chunks(data):
        if cid == b"fmt ":
            if len(chunk) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            body = chunk
    if fmt is None or body is None:
        raise ValueError("WAV stream missing fmt/data chunk")
    audio_fmt, n_ch, rate, _bps, block_align, bits = fmt
    if audio_fmt not in (1, 3):
        raise ValueError(
            f"compressed WAV (format {audio_fmt}) not supported — "
            "PCM (1) and IEEE float (3) only; route others to ffmpeg")
    if n_ch == 0 or block_align == 0:
        raise ValueError("invalid WAV fmt fields")
    return audio_fmt, n_ch, rate, bits, body


def probe(payload: bytes):
    """WAV bytes -> (sample_rate, n_channels, bit_depth, n_samples)."""
    audio_fmt, n_ch, rate, bits, body = _fmt(payload)
    bytes_per = max(1, bits // 8)
    return rate, n_ch, bits, len(body) // (bytes_per * n_ch)


def decode(payload: bytes):
    """WAV bytes -> (sample_rate, float64 array shaped (n_samples,
    n_channels), values in [-1, 1])."""
    audio_fmt, n_ch, rate, bits, body = _fmt(payload)
    if audio_fmt == 3:
        if bits == 32:
            x = np.frombuffer(body, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(body, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"float WAV with {bits} bits not supported")
    elif bits == 8:  # 8-bit PCM is unsigned
        x = (np.frombuffer(body, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 24:
        raw = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        v = (raw[:, 0].astype(np.int64)
             | (raw[:, 1].astype(np.int64) << 8)
             | (raw[:, 2].astype(np.int64) << 16))
        v = np.where(v >= (1 << 23), v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        x = np.frombuffer(body, dtype="<i4").astype(np.float64) \
            / 2147483648.0
    else:
        raise ValueError(f"PCM WAV with {bits} bits not supported")
    n = (len(x) // n_ch) * n_ch
    return rate, x[:n].reshape(-1, n_ch)


def encode(samples: np.ndarray, sample_rate: int,
           bits: int = 16) -> bytes:
    """Test-fixture twin: float samples in [-1, 1] (n,) or (n, ch) ->
    16-bit PCM WAV bytes."""
    if bits != 16:
        raise ValueError("fixture encoder emits 16-bit PCM only")
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767) \
        .astype("<i2").tobytes()
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    out += b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate,
                                 sample_rate * n_ch * 2, n_ch * 2, 16)
    out += b"data" + struct.pack("<I", len(pcm)) + pcm
    return bytes(out)
