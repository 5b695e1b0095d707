"""Real-codec decode path, gated on Pillow being importable.

This container ships no image codec, so these tests skip here with the
documented reason; wherever PIL exists they prove the real branch is a
drop-in for the deterministic fake: same typed schema, same plumbing
through the mapInPandas operator, correct metadata for known bytes.
"""

from __future__ import annotations

import importlib.util

import pytest

_HAS_PIL = importlib.util.find_spec("PIL") is not None

pytestmark = pytest.mark.skipif(
    not _HAS_PIL,
    reason="Pillow not installed in this container — the real-decode "
           "branch is import-guarded in decode_image_batch(real=True) "
           "and runs wherever PIL is importable")


def _png_bytes(w: int, h: int) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
    return buf.getvalue()


def test_real_decode_matches_fake_schema():
    import pandas as pd

    from spatial_data_engineering_spark.operators.multimodal import (
        decode_image_batch)

    payloads = pd.DataFrame({
        "doc_id": [1, 2],
        "source": ["cam", "cam"],
        "payload": [_png_bytes(32, 16), _png_bytes(8, 64)],
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
        [(1, "cam", bytearray(_png_bytes(40, 30)))],
        "doc_id bigint, source string, payload binary")
    out = decode_images(df, real=True)
    assert out.schema.simpleString() == \
        f"struct<{DECODE_SCHEMA.replace(', ', ',').replace(' ', ':')}>"
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0]["width"], rows[0]["height"]) == (40, 30)
