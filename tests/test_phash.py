"""Perceptual hash (functions/phash.py) + the real frame-phash operator.

Robustness is asserted on a TEXTURED fixture (energy spread across
frequencies, like natural images): there the hash is invariant to
noise, JPEG recompression and integer rescaling while unrelated images
sit ~32 bits away.  Ultra-smooth images are the documented degenerate
case (near-zero AC block -> threshold-adjacent bits); the test pins
only determinism there, not robustness — the same caveat every pHash
implementation carries.
"""

from __future__ import annotations

import numpy as np
import pytest

from spatial_data_engineering_spark.functions import jpeg as J
from spatial_data_engineering_spark.functions import y4m
from spatial_data_engineering_spark.functions.phash import (hamming64,
                                                            phash64)

W, H = 96, 64


def _textured():
    rng = np.random.default_rng(42)
    img = np.kron(rng.random((H // 4, W // 4)) * 255,
                  np.ones((4, 4))).astype(np.uint8)
    # light 3x3 box blur, edges replicated
    pad = np.pad(img.astype(float), 1, mode="edge")
    out = sum(pad[dy:dy + H, dx:dx + W]
              for dy in range(3) for dx in range(3)) / 9.0
    return out.astype(np.uint8)


def test_deterministic_and_64bit():
    img = _textured()
    h1 = phash64(img.tobytes(), W, H)
    assert h1 == phash64(img.tobytes(), W, H)
    assert 0 <= h1 < (1 << 64)


def test_noise_and_jpeg_invariance_vs_unrelated():
    img = _textured()
    h1 = phash64(img.tobytes(), W, H)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        noisy = np.clip(img.astype(int) + rng.integers(-6, 7, img.shape),
                        0, 255).astype(np.uint8)
        assert hamming64(h1, phash64(noisy.tobytes(), W, H)) <= 4
        unrelated = rng.integers(0, 256, (H, W), dtype=np.uint8)
        assert hamming64(h1, phash64(unrelated.tobytes(), W, H)) >= 16
    # recompression through the real JPEG codec keeps the hash
    dw, dh, _, px = J.decode(J.encode(img.tobytes(), W, H, 1, quality=90))
    assert hamming64(h1, phash64(bytes(px), dw, dh)) <= 4


def test_scale_invariance_and_odd_dims():
    img = _textured()
    h1 = phash64(img.tobytes(), W, H)
    big = np.repeat(np.repeat(img, 2, 0), 2, 1)
    assert hamming64(h1, phash64(big.tobytes(), W * 2, H * 2)) <= 2
    odd = img[:H - 1, :W - 1]  # exercises the fractional-box resize
    assert isinstance(phash64(odd.tobytes(), W - 1, H - 1), int)


def test_frame_phashes_operator(spark):
    from spatial_data_engineering_spark.operators.multimodal import (
        PHASH_SCHEMA, frame_phashes)

    img = _textured()
    rng = np.random.default_rng(1)
    noisy = np.clip(img.astype(int) + rng.integers(-5, 6, img.shape),
                    0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (H, W), dtype=np.uint8)
    # 4:2:0 frames: luma plane + flat chroma
    chroma = bytes([128]) * (W * H // 2)

    def frame(luma):
        return luma.tobytes() + chroma

    # doc 1: [img, other*4, img-noisy] with stride 5 sampling frames 0,5
    f1 = [frame(img)] + [frame(other)] * 4 + [frame(noisy)]
    payload = y4m.encode(W, H, f1)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id bigint, payload binary")
    out = frame_phashes(df)
    assert out.schema.simpleString() == \
        f"struct<{PHASH_SCHEMA.replace(', ', ',').replace(' ', ':')}>"
    rows = {r["frame_idx"]: r["phash"] for r in out.collect()}
    assert sorted(rows) == [0, 5]
    direct = phash64(img.tobytes(), W, H)
    signed = direct - (1 << 64) if direct >= (1 << 63) else direct
    assert rows[0] == signed  # operator hash == direct luma hash
    # frame 5 (noisy twin) within a few bits of frame 0
    u = lambda v: v & 0xFFFFFFFFFFFFFFFF  # noqa: E731
    assert hamming64(u(rows[0]), u(rows[5])) <= 4


def test_compressed_video_still_gated():
    import pandas as pd

    from spatial_data_engineering_spark.operators.multimodal import (
        frame_phashes_batch)

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        frame_phashes_batch(pd.DataFrame({
            "doc_id": [1], "payload": [b"\x00\x00\x00\x18ftypmp42"]}))
