"""GIF structure parser (functions/gif.py).

Same strategy as the other codec tests: a hand-built stream written
from the GIF89a spec (not via our encoder) pins the parser against an
implementation-independent artifact, the fixture encoder covers the
operator surface, and malformed streams are rejected with ValueError
so callers can tell "unsupported" from "corrupt".
"""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from spatial_data_engineering_spark.functions import gif


def test_fixture_roundtrip_and_animation():
    data = gif.encode_frames(320, 200, 1)
    assert gif.is_gif(data)
    assert gif.probe(data) == (320, 200, 1)
    anim = gif.encode_frames(64, 48, 7)
    assert gif.probe(anim) == (64, 48, 7)


def test_hand_built_stream():
    # written field-by-field from the spec, not via encode_frames:
    # GIF87a (no extensions), 4x3, GCT of 4 entries, one image with a
    # LOCAL color table of 2 entries and two data sub-blocks
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", 4, 3)
    out += bytes([0x81, 0, 0])       # GCT flag, size bits 001 -> 4 entries
    out += bytes(12)                  # 4-entry GCT
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 3)
    out += bytes([0x80])              # local color table, 2 entries
    out += bytes(6)                   # the LCT
    out += bytes([2])                 # LZW min code size
    out += bytes([3, 1, 2, 3])        # sub-block of 3 bytes
    out += bytes([1, 9])              # sub-block of 1 byte
    out += bytes([0])                 # chain terminator
    out += b"\x3b"
    assert gif.probe(bytes(out)) == (4, 3, 1)


def test_rejections():
    with pytest.raises(ValueError):
        gif.probe(b"NOTGIF")
    with pytest.raises(ValueError, match="truncated"):
        gif.probe(b"GIF89a\x04\x00")
    # an image-less stream is not probe-able
    out = bytearray(b"GIF89a") + struct.pack("<HH", 4, 3) \
        + bytes([0, 0, 0]) + b"\x3b"
    with pytest.raises(ValueError, match="no image data"):
        gif.probe(bytes(out))
    # truncated sub-block chain
    data = bytearray(gif.encode_frames(8, 8, 1))[:-3]
    with pytest.raises(ValueError):
        gif.probe(bytes(data))


def test_decode_image_batch_gif_n_frames_real():
    from spatial_data_engineering_spark.operators.multimodal import (
        decode_image_batch)

    payloads = pd.DataFrame({
        "doc_id": [1, 2],
        "source": ["cam", "cam"],
        "payload": [gif.encode_frames(100, 60, 1),
                    gif.encode_frames(32, 32, 12)],
    })
    real = decode_image_batch(payloads, real=True)
    fake = decode_image_batch(payloads, real=False)
    assert list(real.columns) == list(fake.columns)
    assert list(real.dtypes) == list(fake.dtypes)
    assert real.loc[0, ["width", "height", "n_frames"]].tolist() == \
        [100, 60, 1]
    # the one metadata column PNG/JPEG always pin to 1 is real for GIF
    assert real.loc[1, ["width", "height", "n_frames"]].tolist() == \
        [32, 32, 12]
