"""Real-codec decode paths.

Since round 7 the PNG branch runs IN-CONTAINER: ``functions/png.py`` is
a pure-stdlib (zlib + struct) implementation of baseline PNG, so
``decode_image_batch(real=True)`` decodes real PNG bytes with no
imaging library installed.  The first half of this file exercises that
codec — filter-by-filter round-trips, header probe, corruption errors —
and pushes real PNGs through the mapInPandas operator with the pinned
typed schema.  The second half keeps the Pillow cross-checks, still
gated on PIL being importable (JPEG and friends remain env-blocked:
pip/apt are forbidden here).
"""

from __future__ import annotations

import importlib.util

import pytest

from spatial_data_engineering_spark.functions import png

_HAS_PIL = importlib.util.find_spec("PIL") is not None


def _pixels(w: int, h: int, ch: int) -> bytes:
    # deterministic non-trivial gradient so every filter has signal
    return bytes(((x * 7 + y * 13 + c * 29) % 256)
                 for y in range(h) for x in range(w) for c in range(ch))


# ---------------------------------------------------------------- codec


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_every_filter_and_colortype(filter_type, channels):
    w, h = 13, 9  # odd sizes: stride not a multiple of anything
    px = _pixels(w, h, channels)
    data = png.encode(w, h, channels, px, filter_type=filter_type)
    gw, gh, gch, out = png.decode(data)
    assert (gw, gh, gch) == (w, h, channels)
    assert bytes(out) == px


def test_probe_reads_header_only():
    data = png.encode(640, 480, 3, _pixels(640, 480, 3))
    assert png.probe(data) == (640, 480, 3)
    # probe must not need IDAT: truncate right after IHDR
    assert png.probe(data[:33]) == (640, 480, 3)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        png.decode(b"not a png at all")
    with pytest.raises(ValueError, match="signature"):
        png.probe(b"JFIF....")
    # flip a filter byte range: valid signature, corrupt structure
    data = bytearray(png.encode(4, 4, 1, _pixels(4, 4, 1)))
    data[8:12] = (99).to_bytes(4, "big")  # absurd IHDR length
    with pytest.raises(ValueError):
        png.probe(bytes(data))


def test_decode_rejects_16bit_depth():
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)

    def chunk(ctype, body):
        return (len(body).to_bytes(4, "big") + ctype + body
                + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="depth"):
        png.decode(data)


# ------------------------------------------- in-container real decode


def test_real_decode_batch_in_container():
    import pandas as pd

    from spatial_data_engineering_spark.operators.multimodal import (
        decode_image_batch)

    payloads = pd.DataFrame({
        "doc_id": [1, 2],
        "source": ["cam", "cam"],
        "payload": [png.encode(32, 16, 3, _pixels(32, 16, 3)),
                    png.encode(8, 64, 1, _pixels(8, 64, 1))],
    })
    real = decode_image_batch(payloads, real=True)
    fake = decode_image_batch(payloads, real=False)
    # identical typed surface: swapping the codec cannot change the schema
    assert list(real.columns) == list(fake.columns)
    assert list(real.dtypes) == list(fake.dtypes)
    # and the real branch reports the true dimensions
    assert real.loc[0, ["width", "height"]].tolist() == [32, 16]
    assert real.loc[1, ["width", "height"]].tolist() == [8, 64]
    assert (real["n_frames"] == 1).all()
    assert (real["n_bytes"] == payloads["payload"].map(len)).all()


def test_real_decode_through_operator(spark):
    from spatial_data_engineering_spark.operators.multimodal import (
        DECODE_SCHEMA, decode_images)

    df = spark.createDataFrame(
        [(1, "cam", bytearray(png.encode(40, 30, 4, _pixels(40, 30, 4)))),
         (2, "sat", bytearray(png.encode(3, 7, 1, _pixels(3, 7, 1))))],
        "doc_id bigint, source string, payload binary")
    out = decode_images(df, real=True)
    assert out.schema.simpleString() == \
        f"struct<{DECODE_SCHEMA.replace(', ', ',').replace(' ', ':')}>"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (40, 30)
    assert (rows[2]["width"], rows[2]["height"]) == (3, 7)


def test_real_decode_unsupported_format_without_pil_raises():
    # PNG/JPEG/GIF/TIFF/WebP now take stdlib parser branches; a format
    # with no stdlib parser — e.g. BMP — still requires Pillow
    if _HAS_PIL:
        pytest.skip("PIL present: unknown bytes take the Pillow branch")
    import pandas as pd

    from spatial_data_engineering_spark.operators.multimodal import (
        decode_image_batch)

    payloads = pd.DataFrame({
        "doc_id": [1], "source": ["cam"],
        "payload": [b"BM bitmap bytes not decodable here"],
    })
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_batch(payloads, real=True)


# ----------------------------------------------- Pillow cross-checks


@pytest.mark.skipif(
    not _HAS_PIL,
    reason="Pillow not installed in this container — PNG already covered "
           "by the stdlib codec above; PIL adds JPEG etc. where present")
def test_stdlib_codec_agrees_with_pillow():
    import io

    from PIL import Image

    w, h = 21, 12
    px = _pixels(w, h, 3)
    # our encode -> PIL decode
    img = Image.open(io.BytesIO(png.encode(w, h, 3, px)))
    assert img.size == (w, h)
    assert img.tobytes() == px
    # PIL encode -> our decode
    buf = io.BytesIO()
    Image.frombytes("RGB", (w, h), px).save(buf, format="PNG")
    gw, gh, gch, out = png.decode(buf.getvalue())
    assert (gw, gh, gch) == (w, h, 3)
    assert bytes(out) == px
