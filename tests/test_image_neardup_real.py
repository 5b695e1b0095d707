"""End-to-end REAL image near-dup: codecs -> pHash -> banded Hamming join.

The integration test the codec family builds toward: images encoded as
real PNG and real JPEG bytes, decoded in-container, hashed on luma, and
paired by q153's pigeonhole band join — all through live Spark
operators.  The scenario plants ground truth: each base image appears
as (a) its PNG original, (b) a JPEG q90 recompression and (c) a
lightly-noised PNG twin, against unrelated distractors; the pair set
must connect every planted trio and no cross-image pair.
"""

from __future__ import annotations

import numpy as np
import pytest

from spatial_data_engineering_spark.functions import jpeg as J
from spatial_data_engineering_spark.functions import png

W, H = 64, 48


def _textured(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.kron(rng.random((H // 4, W // 4)) * 255,
                  np.ones((4, 4))).astype(np.uint8)
    pad = np.pad(img.astype(float), 1, mode="edge")
    out = sum(pad[dy:dy + H, dx:dx + W]
              for dy in range(3) for dx in range(3)) / 9.0
    return out.astype(np.uint8)


def _rgb(gray: np.ndarray) -> bytes:
    return np.stack([gray] * 3, axis=-1).tobytes()


@pytest.fixture(scope="module")
def planted_payloads():
    rows = []
    for base in range(3):  # 3 planted trios: ids 10b+0 / +1 / +2
        img = _textured(seed=base)
        noisy = np.clip(
            img.astype(int)
            + np.random.default_rng(100 + base).integers(-5, 6, img.shape),
            0, 255).astype(np.uint8)
        rows += [
            (base * 10 + 0, png.encode(W, H, 3, _rgb(img))),
            (base * 10 + 1, J.encode(_rgb(img), W, H, 3, quality=90)),
            (base * 10 + 2, png.encode(W, H, 3, _rgb(noisy))),
        ]
    for d in range(3):  # unrelated distractors: ids 100+
        rows.append((100 + d, png.encode(
            W, H, 1, _textured(seed=50 + d).tobytes())))
    return rows


def test_real_image_near_dup_pipeline(spark, planted_payloads):
    from spatial_data_engineering_spark.operators.multimodal import (
        image_near_dup)

    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in planted_payloads],
        "doc_id bigint, payload binary")
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in image_near_dup(df, max_hamming=3).collect()}
    for base in range(3):
        trio = [base * 10 + k for k in range(3)]
        for i in range(3):
            for j in range(i + 1, 3):
                assert (trio[i], trio[j]) in pairs, (
                    f"planted near-dup pair {trio[i]}/{trio[j]} missed")
    # no pair crosses trios or touches a distractor
    for (a, b) in pairs:
        assert a // 10 == b // 10 and a < 100 and b < 100, (
            f"false positive pair {a}/{b}")


def test_image_phashes_format_invariance(spark, planted_payloads):
    # the SAME image as PNG and as JPEG must hash within the join radius
    from spatial_data_engineering_spark.functions.phash import hamming64
    from spatial_data_engineering_spark.operators.multimodal import (
        image_phashes)

    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in planted_payloads[:2]],
        "doc_id bigint, payload binary")
    got = {r["doc_id"]: r["phash"] & 0xFFFFFFFFFFFFFFFF
           for r in image_phashes(df).collect()}
    assert hamming64(got[0], got[1]) <= 3


def test_image_near_dup_radius_guard(spark):
    from spatial_data_engineering_spark.operators.multimodal import (
        image_near_dup)

    df = spark.createDataFrame([], "doc_id bigint, payload binary")
    with pytest.raises(ValueError, match="pigeonhole"):
        image_near_dup(df, max_hamming=4)
