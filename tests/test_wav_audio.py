"""WAV codec (functions/wav.py) + the real audio-features operator.

Fixtures with analytically known answers pin the math: a pure sine has
RMS = A/sqrt(2) and zero-crossing rate 2f/sr; silence and a clipped
square wave pin the ratio features; a hand-built WAV byte stream
(written field-by-field from the RIFF spec, not via our encoder) pins
the parser.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from spatial_data_engineering_spark.functions import wav

SR = 8000


def _sine(freq=440.0, amp=0.5, secs=0.5, sr=SR):
    t = np.arange(int(sr * secs)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_roundtrip_16bit():
    x = _sine()
    data = wav.encode(x, SR)
    assert wav.is_wav(data)
    assert wav.probe(data) == (SR, 1, 16, len(x))
    rate, got = wav.decode(data)
    assert rate == SR and got.shape == (len(x), 1)
    assert np.abs(got[:, 0] - x).max() < 1.5 / 32768  # quantization only


def test_stereo_shapes():
    left, right = _sine(300), _sine(700)
    data = wav.encode(np.stack([left, right], axis=1), SR)
    assert wav.probe(data) == (SR, 2, 16, len(left))
    _, got = wav.decode(data)
    assert got.shape == (len(left), 2)
    assert np.abs(got[:, 1] - right).max() < 1.5 / 32768


def test_hand_built_stream():
    # 4 samples of 16-bit mono PCM at 1000 Hz, written from the spec
    pcm = struct.pack("<4h", 0, 16384, 0, -16384)
    data = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 1000, 2000, 2, 16)
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    assert wav.probe(data) == (1000, 1, 16, 4)
    rate, x = wav.decode(data)
    assert rate == 1000
    assert np.allclose(x[:, 0], [0, 0.5, 0, -0.5], atol=1e-4)


def test_8bit_and_float32_paths():
    # 8-bit PCM is unsigned around 128
    body = bytes([128, 255, 128, 0])
    data = (b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 1000, 1000, 1, 8)
            + b"data" + struct.pack("<I", 4) + body)
    _, x = wav.decode(data)
    assert np.allclose(x[:, 0], [0.0, 127 / 128, 0.0, -1.0])
    # IEEE float32 (format 3)
    fl = np.array([0.25, -0.75], dtype="<f4").tobytes()
    data = (b"RIFF" + struct.pack("<I", 36 + len(fl)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 1000, 4000, 4, 32)
            + b"data" + struct.pack("<I", len(fl)) + fl)
    _, x = wav.decode(data)
    assert np.allclose(x[:, 0], [0.25, -0.75])


def test_rejections():
    with pytest.raises(ValueError):
        wav.probe(b"OggS compressed audio")
    # compressed WAV container (format 85 = mp3) refused with direction
    data = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 85, 1, 8000, 0, 1, 0)
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="ffmpeg"):
        wav.probe(data)


def test_audio_features_math():
    from spatial_data_engineering_spark.operators.multimodal import (
        audio_features_batch)

    amp, freq, secs = 0.5, 440.0, 1.0
    sine = wav.encode(_sine(freq, amp, secs), SR)
    silence = wav.encode(np.zeros(SR // 2), SR)
    clipped = wav.encode(np.sign(_sine(100, 1.0, 0.25)) * 0.9995, SR)
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "payload": [sine, silence, clipped]})
    out = audio_features_batch(pdf).set_index("doc_id")
    s = out.loc[1]
    assert s["sample_rate"] == SR and s["n_channels"] == 1
    assert s["duration_s"] == pytest.approx(secs)
    # RMS of A*sin = A/sqrt(2) -> dBFS = 20 log10(0.3536) = -9.03
    assert s["rms_dbfs"] == pytest.approx(
        20 * np.log10(amp / np.sqrt(2)), abs=0.05)
    # zero-crossing rate of a sine = 2f/sr
    assert s["zero_cross_rate"] == pytest.approx(2 * freq / SR, rel=0.02)
    assert s["clip_ratio"] == 0.0
    q = out.loc[2]
    assert q["rms_dbfs"] == -120.0 and q["silence_ratio"] == 1.0
    c = out.loc[3]
    assert c["clip_ratio"] > 0.95 and c["peak"] >= 0.999


def test_audio_features_operator(spark):
    from spatial_data_engineering_spark.operators.multimodal import (
        AUDIO_SCHEMA, audio_features)

    df = spark.createDataFrame(
        [(7, bytearray(wav.encode(_sine(220, 0.25, 0.25), SR)))],
        "doc_id bigint, payload binary")
    out = audio_features(df)
    assert out.schema.simpleString() == \
        f"struct<{AUDIO_SCHEMA.replace(', ', ',').replace(' ', ':')}>"
    row = out.collect()[0]
    assert row["duration_s"] == pytest.approx(0.25)
    assert row["rms_dbfs"] == pytest.approx(
        20 * np.log10(0.25 / np.sqrt(2)), abs=0.05)


def test_compressed_audio_gated():
    from spatial_data_engineering_spark.operators.multimodal import (
        audio_features_batch)

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        audio_features_batch(pd.DataFrame({
            "doc_id": [1], "payload": [b"ID3\x04 mp3 frames here"]}))


# --------------------------------------------------------------------------
# q227 real path (round 16): Haitsma-Kalker spectral fingerprints over
# the in-container WAV decoder, and the df-capped near-dup index.
# --------------------------------------------------------------------------


def _melody(seed=0, secs=2.0, sr=SR):
    """Structured test audio: a seeded 14-note melody over a seeded
    broadband bed.  Deliberately NOT a stationary pure-tone mix — the
    Haitsma-Kalker double-delta needs temporal structure and nonzero
    energy in every band; a pure tone leaves empty bands whose bits
    are decided by numerical noise (the degenerate case the first cut
    of this test tripped on)."""
    rng = np.random.default_rng(seed)
    notes = rng.choice([392., 440., 523., 587., 660., 784., 880.,
                        1047., 1319., 1568.], 14)
    seg = int(secs * sr / len(notes))
    t = np.arange(seg) / sr
    x = np.concatenate([0.4 * np.sin(2 * np.pi * f * t) for f in notes])
    x = x + 0.08 * rng.standard_normal(len(x))
    return np.clip(x, -1, 1)


def test_audio_fingerprints_shape_and_determinism():
    from spatial_data_engineering_spark.operators.multimodal import (
        audio_fingerprints_batch)

    payload = wav.encode(_melody(1), SR)
    pdf = pd.DataFrame({"doc_id": [1], "payload": [payload]})
    a = audio_fingerprints_batch(pdf)
    b = audio_fingerprints_batch(pdf)
    assert len(a) > 10
    assert (a["fp"] >= 0).all() and (a["fp"] < 2 ** 16).all()
    assert a.equals(b)  # bit-deterministic


def test_audio_fingerprints_survive_gain_and_noise():
    """The Haitsma-Kalker property the real path exists for: a level
    change plus light noise keeps most per-frame sub-fingerprints
    identical, while different material shares almost none."""
    from spatial_data_engineering_spark.operators.multimodal import (
        audio_fingerprints_batch)

    base = _melody(1)
    variant = np.clip(0.7 * base + np.random.default_rng(7).normal(
        0, 0.005, len(base)), -1, 1)
    other = _melody(9)
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "payload": [wav.encode(base, SR),
                    wav.encode(variant, SR),
                    wav.encode(other, SR)],
    })
    out = audio_fingerprints_batch(pdf)
    sets = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    same = len(sets[1] & sets[2]) / max(1, len(sets[1] | sets[2]))
    diff = len(sets[1] & sets[3]) / max(1, len(sets[1] | sets[3]))
    assert same > 0.5, f"gain+noise variant diverged (jaccard {same:.2f})"
    assert diff < same / 2, (same, diff)


def test_audio_near_dup_operator(spark):
    from spatial_data_engineering_spark.operators.multimodal import (
        audio_near_dup)

    base = _melody(1)
    variant = np.clip(0.7 * base + np.random.default_rng(7).normal(
        0, 0.005, len(base)), -1, 1)
    other = _melody(9)
    rows = [(1, bytearray(wav.encode(base, SR))),
            (2, bytearray(wav.encode(variant, SR))),
            (3, bytearray(wav.encode(other, SR)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {(r.a_id, r.b_id): r.n_shared_fp
             for r in audio_near_dup(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_audio_near_dup_compressed_raises():
    from spatial_data_engineering_spark.operators.multimodal import (
        audio_fingerprints_batch)

    pdf = pd.DataFrame({"doc_id": [1],
                        "payload": [b"\xff\xfbnot-a-wav-mp3-frame"]})
    with pytest.raises(NotImplementedError):
        audio_fingerprints_batch(pdf)
