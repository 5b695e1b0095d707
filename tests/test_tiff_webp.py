"""TIFF/WebP structure parsers (functions/tiff_webp.py).

Hand-built streams written field-by-field from the TIFF 6.0 and WebP
container specs pin both parsers independently of the fixture
encoders; multi-page TIFF and animated WebP pin the n_frames path.
"""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from spatial_data_engineering_spark.functions import tiff_webp as TW


# ------------------------------------------------------------------ TIFF

def test_tiff_fixture_and_pages():
    data = TW.encode_tiff(640, 480)
    assert TW.is_tiff(data)
    assert TW.probe_tiff(data) == (640, 480, 1)
    multi = TW.encode_tiff(32, 16, n_pages=5)
    assert TW.probe_tiff(multi) == (32, 16, 5)


def test_tiff_hand_built_big_endian_shorts():
    # big-endian TIFF with SHORT-typed dimension tags, written from the
    # spec: header, one IFD at offset 8 with two entries, no next IFD
    out = bytearray(b"MM\x00*")
    out += struct.pack(">I", 8)
    out += struct.pack(">H", 2)
    out += struct.pack(">HHIHH", 256, 3, 1, 123, 0)  # SHORT width=123
    out += struct.pack(">HHIHH", 257, 3, 1, 45, 0)   # SHORT height=45
    out += struct.pack(">I", 0)
    assert TW.probe_tiff(bytes(out)) == (123, 45, 1)


def test_tiff_rejections():
    with pytest.raises(ValueError):
        TW.probe_tiff(b"not tiff")
    with pytest.raises(ValueError, match="truncated"):
        TW.probe_tiff(b"II*\x00" + struct.pack("<I", 8) + b"\x05")
    # cyclic IFD chain must not loop forever
    out = bytearray(TW.encode_tiff(8, 8))
    out[-4:] = struct.pack("<I", 8)  # next-IFD points back at itself
    with pytest.raises(ValueError, match="cyclic"):
        TW.probe_tiff(bytes(out))


# ------------------------------------------------------------------ WebP

def test_webp_lossless_fixture():
    data = TW.encode_webp_lossless(800, 600)
    assert TW.is_webp(data)
    assert TW.probe_webp(data) == (800, 600, 1)


def test_webp_hand_built_lossy_and_animation():
    # VP8 (lossy) key frame header written from the spec: 3-byte frame
    # tag, start code 9D 01 2A, then 14-bit LE width/height
    vp8 = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240) + b"\0"
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8)) + b"WEBP"
            + b"VP8 " + struct.pack("<I", len(vp8)) + vp8 + b"\x00")
    assert TW.probe_webp(data) == (320, 240, 1)
    # extended animated WebP: VP8X canvas dims + three ANMF frames
    vp8x = bytes([0x02]) + bytes(3) \
        + (99).to_bytes(3, "little") + (49).to_bytes(3, "little")
    chunks = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    for _ in range(3):
        chunks += b"ANMF" + struct.pack("<I", 16) + bytes(16)
    data = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks
    assert TW.probe_webp(data) == (100, 50, 3)


def test_webp_rejections():
    with pytest.raises(ValueError):
        TW.probe_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="missing image header"):
        TW.probe_webp(b"RIFF" + struct.pack("<I", 4) + b"WEBP")
    bad = bytearray(TW.encode_webp_lossless(8, 8))
    bad[20] = 0x00  # break the VP8L signature byte
    with pytest.raises(ValueError, match="VP8L"):
        TW.probe_webp(bytes(bad))


# ------------------------------------------------- operator dispatch

def test_decode_image_batch_tiff_webp():
    from spatial_data_engineering_spark.operators.multimodal import (
        decode_image_batch)

    payloads = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["scan", "web", "scan"],
        "payload": [TW.encode_tiff(200, 100, n_pages=4),
                    TW.encode_webp_lossless(64, 32),
                    TW.encode_tiff(10, 20)],
    })
    real = decode_image_batch(payloads, real=True)
    fake = decode_image_batch(payloads, real=False)
    assert list(real.columns) == list(fake.columns)
    assert list(real.dtypes) == list(fake.dtypes)
    assert real.loc[0, ["width", "height", "n_frames"]].tolist() == \
        [200, 100, 4]  # multi-page TIFF n_frames is real
    assert real.loc[1, ["width", "height", "n_frames"]].tolist() == \
        [64, 32, 1]
    assert real.loc[2, ["width", "height", "n_frames"]].tolist() == \
        [10, 20, 1]
