"""Y4M parser (functions/y4m.py) + the real frame-sampling branch.

Follows the PNG/JPEG codec test pattern: hand-built byte fixtures pin
the parser against the published format (not just our own encoder),
the operator surface is exercised through a live mapInPandas run, and
the fake/real branches are pinned to the same typed schema.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pytest

from spatial_data_engineering_spark.functions import y4m


def _frames(w, h, n, sixths=9):
    fsize = w * h * sixths // 6
    return [bytes([(i * 7 + j) % 256 for j in range(fsize)])
            for i in range(n)]


def test_roundtrip_and_probe():
    w, h, n = 32, 24, 7
    frames = _frames(w, h, n)
    data = y4m.encode(w, h, frames)
    assert y4m.is_y4m(data)
    assert y4m.probe(data) == (w, h, n)
    got = list(y4m.iter_frames(data))
    assert [g[0] for g in got] == list(range(n))
    assert all(g[1:3] == (w, h) for g in got)
    assert [bytes(g[3]) for g in got] == frames


@pytest.mark.parametrize("chroma,sixths", [
    ("420", 9), ("422", 12), ("444", 18), ("mono", 6)])
def test_chroma_variants(chroma, sixths):
    w, h = 16, 8
    frames = _frames(w, h, 2, sixths)
    data = y4m.encode(w, h, frames, chroma=chroma)
    assert y4m.probe(data) == (w, h, 2)


def test_hand_built_stream():
    # written byte-by-byte from the yuv4mpeg(5) format description, not
    # via our encoder: 4x2 mono, 2 frames, extra unknown X param ignored
    f0, f1 = bytes(range(8)), bytes(range(8, 16))
    data = (b"YUV4MPEG2 W4 H2 F30:1 Ip A1:1 Cmono Xcomment\n"
            b"FRAME\n" + f0 + b"FRAME\n" + f1)
    assert y4m.probe(data) == (4, 2, 2)
    got = list(y4m.iter_frames(data))
    assert [bytes(g[3]) for g in got] == [f0, f1]


def test_rejections():
    with pytest.raises(ValueError):
        y4m.probe(b"RIFF not y4m")
    with pytest.raises(ValueError, match="chroma"):
        y4m.probe(b"YUV4MPEG2 W4 H2 C411\n")
    with pytest.raises(ValueError, match="W/H"):
        y4m.probe(b"YUV4MPEG2 F25:1\n")
    # truncated frame payload
    data = y4m.encode(4, 2, [_frames(4, 2, 1, 6)[0]], chroma="mono")
    with pytest.raises(ValueError, match="truncated"):
        y4m.probe(data[:-3])


def test_real_frame_sampling_batch():
    from spatial_data_engineering_spark.operators.multimodal import (
        _FRAME_STRIDE, sample_frames_batch)

    w, h, n = 64, 16, 12  # landscape: resized_w pinned at 224
    frames = _frames(w, h, n)
    pdf = pd.DataFrame({"doc_id": [9], "source": ["cam"],
                        "payload": [y4m.encode(w, h, frames)]})
    real = sample_frames_batch(pdf, real=True)
    fake = sample_frames_batch(pdf, real=False)
    assert list(real.columns) == list(fake.columns)
    want_idx = list(range(0, n, _FRAME_STRIDE))
    assert real["frame_idx"].tolist() == want_idx
    assert real["frame_checksum"].tolist() == [
        zlib.crc32(frames[i]) for i in want_idx]
    assert (real["resized_w"] == 224).all()
    assert (real["resized_h"] == 224 * h // w).all()
    # compressed video still routes to the ffmpeg gate
    bad = pd.DataFrame({"doc_id": [1], "source": ["cam"],
                        "payload": [b"\x00\x00\x00\x18ftypmp42 not raw"]})
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames_batch(bad, real=True)


def test_real_frame_sampling_operator(spark):
    from spatial_data_engineering_spark.operators.multimodal import (
        FRAME_SCHEMA)

    w, h, n = 8, 32, 6  # portrait: resized_h pinned at 224
    frames = _frames(w, h, n)
    df = spark.createDataFrame(
        [(3, bytearray(y4m.encode(w, h, frames)))],
        "doc_id bigint, payload binary")

    def run(batches):
        from spatial_data_engineering_spark.operators.multimodal import (
            sample_frames_batch)
        for pdf in batches:
            yield sample_frames_batch(pdf, real=True)

    out = df.mapInPandas(run, schema=FRAME_SCHEMA)
    rows = sorted(out.collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 5]
    assert all(r["resized_h"] == 224 and r["resized_w"] == 224 * w // h
               for r in rows)
    assert rows[0]["frame_checksum"] == zlib.crc32(frames[0])
