"""Pure-stdlib baseline JPEG codec (functions/jpeg.py).

Correctness strategy mirrors test_multimodal_real's PNG coverage, plus
two protections a self-round-trip alone cannot give:

- a HAND-BUILT single-MCU stream (markers and entropy bits written out
  byte-by-byte in the test from the spec, not by our encoder) pins the
  decoder's marker parse, Huffman tables, bit reader, dequantization
  and IDCT DC path against an implementation-independent artifact — a
  matched encoder/decoder bug pair (e.g. a mirrored zigzag error)
  cannot cancel through it;
- exactness is asserted ONLY where the math is exact (flat blocks at
  quality 100 quantize to DC-only with step 1); everywhere else the
  test bounds the error, because baseline JPEG is lossy by design.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from spatial_data_engineering_spark.functions import jpeg as J


def _flat(w, h, v, ch=1):
    return bytes([v]) * (w * h * ch)


# ------------------------------------------------------------ round trips


@pytest.mark.parametrize("v", [0, 1, 37, 128, 200, 255])
def test_flat_grayscale_exact_at_q100(v):
    w, h = 24, 16
    enc = J.encode(_flat(w, h, v), w, h, 1, quality=100)
    assert J.is_jpeg(enc)
    dw, dh, dc, px = J.decode(enc)
    arr = np.frombuffer(bytes(px), dtype=np.uint8)
    assert (dw, dh, dc) == (w, h, 1)
    assert (arr == v).all()


def test_gradient_grayscale_bounded_error():
    w, h = 24, 16
    g = np.tile(np.linspace(0, 255, w).astype(np.uint8), (h, 1))
    dw, dh, dc, px = J.decode(J.encode(g.tobytes(), w, h, 1, quality=95))
    a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w)
    assert (dw, dh, dc) == (w, h, 1)
    assert np.abs(a.astype(int) - g.astype(int)).max() <= 2


def test_rgb_roundtrip_bounded_error():
    w, h = 24, 16
    # smooth low-contrast image: quantization error stays small even on
    # the aggressive chroma table
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack([96 + x * 2, 120 + y * 3, 140 - x], axis=-1) \
        .astype(np.uint8)
    enc = J.encode(rgb.tobytes(), w, h, 3, quality=95)
    assert J.probe(enc) == (w, h, 3)
    dw, dh, dc, px = J.decode(enc)
    a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, 3)
    assert (dw, dh, dc) == (w, h, 3)
    assert np.abs(a.astype(int) - rgb.astype(int)).max() <= 12


def test_non_multiple_of_8_dimensions():
    w, h = 13, 9
    g = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    dw, dh, dc, px = J.decode(J.encode(g.tobytes(), w, h, 1, quality=100))
    a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w)
    assert (dw, dh, dc) == (w, h, 1)
    # q=100 on a smooth ramp: quant step 1, error only from DCT rounding
    assert np.abs(a.astype(int) - g.astype(int)).max() <= 1


def test_probe_header_only():
    enc = J.encode(_flat(40, 30, 7, 3), 40, 30, 3, quality=85)
    assert J.probe(enc) == (40, 30, 3)
    # probe must not need the entropy data: truncate right after SOS
    sos = enc.find(b"\xff\xda")
    assert J.probe(enc[:sos + 14]) == (40, 30, 3)


# ------------------------------------------------- decoder-only artifacts


def _hand_built_flat128(restart: bool = False) -> bytes:
    """Single- (or dual-)MCU 8-bit grayscale stream written from the
    spec: flat 128 -> level-shifted 0 -> DC diff 0 (DC category 0, code
    '00') then EOB (AC symbol 0x00, code '1010'); six bits pad to one
    byte 0b00101011 = 0x2B.  With restart=True: two MCUs split by DRI=1
    and an RST0 marker, each byte-aligned to the same 0x2B."""
    qt_zz = np.ones(64, dtype=np.uint8)  # all-1 quant table (zigzag)
    w = 16 if restart else 8
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qt_zz.tobytes()
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI: every MCU
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, w, 1) \
        + bytes([1, 0x11, 0])
    for tc_th, (bits, vals) in ((0x00, J._DC_LUMA_SPEC),
                                (0x10, J._AC_LUMA_SPEC)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th) \
            + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) \
        + b"\x00\x3f\x00"
    out += bytes([0x2B])
    if restart:
        out += b"\xff\xd0" + bytes([0x2B])  # RST0, second MCU
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_stream_decodes():
    dw, dh, dc, px = J.decode(_hand_built_flat128())
    arr = np.frombuffer(bytes(px), dtype=np.uint8)
    assert (dw, dh, dc) == (8, 8, 1)
    assert (arr == 128).all()


def test_hand_built_restart_interval():
    dw, dh, dc, px = J.decode(_hand_built_flat128(restart=True))
    arr = np.frombuffer(bytes(px), dtype=np.uint8)
    assert (dw, dh, dc) == (16, 8, 1)
    assert (arr == 128).all()


# ------------------------------------------------------------- rejections


def test_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        J.decode(b"not a jpeg")
    with pytest.raises(ValueError):
        J.probe(b"\xff\xd8\xff\xe0 truncated nonsense")
    # progressive (SOF2) must be refused, not mis-decoded
    enc = bytearray(J.encode(_flat(8, 8, 10), 8, 8, 1))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        J.probe(bytes(enc))
    # chroma subsampling must be refused
    enc = bytearray(J.encode(_flat(8, 8, 10, 3), 8, 8, 3))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 11] = 0x22  # luma sampling 2x2
    with pytest.raises(ValueError, match="subsampling"):
        J.probe(bytes(enc))


# ------------------------------------------------------ operator surface


def test_decode_image_batch_mixed_png_jpeg():
    import pandas as pd

    from spatial_data_engineering_spark.functions import png
    from spatial_data_engineering_spark.operators.multimodal import (
        decode_image_batch)

    png_px = bytes(range(256)) * (32 * 16 * 3 // 256)
    payloads = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["cam", "cam", "scan"],
        "payload": [png.encode(32, 16, 3, png_px),
                    J.encode(_flat(24, 8, 77, 3), 24, 8, 3, quality=90),
                    J.encode(_flat(9, 33, 5), 9, 33, 1, quality=90)],
    })
    real = decode_image_batch(payloads, real=True)
    fake = decode_image_batch(payloads, real=False)
    assert list(real.columns) == list(fake.columns)
    assert list(real.dtypes) == list(fake.dtypes)
    assert real.loc[0, ["width", "height"]].tolist() == [32, 16]
    assert real.loc[1, ["width", "height"]].tolist() == [24, 8]
    assert real.loc[2, ["width", "height"]].tolist() == [9, 33]
    assert (real["n_frames"] == 1).all()


def test_decode_images_operator_jpeg(spark):
    from spatial_data_engineering_spark.operators.multimodal import (
        DECODE_SCHEMA, decode_images)

    df = spark.createDataFrame(
        [(1, "cam", bytearray(J.encode(_flat(40, 30, 9, 3), 40, 30, 3))),
         (2, "sat", bytearray(J.encode(_flat(3, 7, 200), 3, 7, 1)))],
        "doc_id bigint, source string, payload binary")
    out = decode_images(df, real=True)
    assert out.schema.simpleString() == \
        f"struct<{DECODE_SCHEMA.replace(', ', ',').replace(' ', ':')}>"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (40, 30)
    assert (rows[2]["width"], rows[2]["height"]) == (3, 7)


# ----------------------------------------------- Pillow cross-check

try:
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


@pytest.mark.skipif(
    not _HAS_PIL,
    reason="Pillow not installed in this container — decode correctness "
           "pinned by the hand-built stream + round trips above; PIL "
           "adds an independent encoder where present")
def test_jpeg_codec_agrees_with_pillow():
    import io

    from PIL import Image

    w, h = 24, 16
    y, x = np.mgrid[0:h, 0:w]
    g = (96 + x * 2 + y).astype(np.uint8)
    # PIL encode -> our decode
    buf = io.BytesIO()
    Image.frombytes("L", (w, h), g.tobytes()).save(
        buf, format="JPEG", quality=95, subsampling=0)
    dw, dh, dc, px = J.decode(buf.getvalue())
    a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w)
    assert (dw, dh, dc) == (w, h, 1)
    assert np.abs(a.astype(int) - g.astype(int)).max() <= 4
    # our encode -> PIL decode
    img = Image.open(io.BytesIO(J.encode(g.tobytes(), w, h, 1, quality=95)))
    assert img.size == (w, h)
    b = np.frombuffer(img.tobytes(), dtype=np.uint8).reshape(h, w)
    assert np.abs(b.astype(int) - g.astype(int)).max() <= 4
