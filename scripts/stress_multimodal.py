#!/usr/bin/env python
"""Throughput stress for the real multimodal path.

Generates N real PNG images (textured, with planted near-dup pairs)
and N real WAV clips as binary payload columns, then measures the
in-container codec operators end-to-end on local[*]:

- image_phashes: decode + luma pHash per image
- image_near_dup: the full banded-Hamming pipeline, with the planted
  pair count asserted (recall on ground truth, not just wall time)
- audio_features: WAV decode + the six quality signals

Prints one JSON line: asset counts, wall seconds, assets/sec, and the
planted-pair recall.  Usage: python scripts/stress_multimodal.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    import numpy as np

    from spatial_data_engineering_spark.functions import png, wav
    from spatial_data_engineering_spark.operators.multimodal import (
        audio_features, image_near_dup, image_phashes)
    from spatial_data_engineering_spark.session import build_session

    spark = build_session(app_name="stress_multimodal")
    out: dict = {"n_assets": n,
                 "loadavg": open("/proc/loadavg").read().split()[0]}

    w, h = 64, 48
    rng = np.random.default_rng(0)

    def textured(seed):
        img = np.kron(rng.random((h // 4, w // 4)) * 255,
                      np.ones((4, 4))).astype(np.uint8)
        return img

    # every even id is a base image; its odd successor is a noised twin
    # -> n/2 planted near-dup pairs as ground truth
    rows = []
    for i in range(0, n, 2):
        img = textured(i)
        noisy = np.clip(img.astype(int)
                        + rng.integers(-4, 5, img.shape), 0, 255) \
            .astype(np.uint8)
        rows.append((i, bytearray(png.encode(w, h, 1, img.tobytes()))))
        rows.append((i + 1,
                     bytearray(png.encode(w, h, 1, noisy.tobytes()))))
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary") \
        .repartition(spark.sparkContext.defaultParallelism)

    t0 = time.perf_counter()
    image_phashes(df).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    out["phash_sec"] = round(dt, 2)
    out["phash_images_per_sec"] = round(n / dt)

    t0 = time.perf_counter()
    pairs = image_near_dup(df, max_hamming=3)
    found = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    dt = time.perf_counter() - t0
    planted = {(i, i + 1) for i in range(0, n, 2)}
    out["neardup_sec"] = round(dt, 2)
    out["planted_pairs"] = len(planted)
    out["planted_recall"] = round(
        len(found & planted) / len(planted), 4)
    out["extra_pairs"] = len(found - planted)

    sr = 16000
    t = np.arange(sr // 2) / sr
    arows = [(i, bytearray(wav.encode(
        0.5 * np.sin(2 * np.pi * (100 + i % 37) * t), sr)))
        for i in range(n)]
    adf = spark.createDataFrame(arows, "doc_id bigint, payload binary") \
        .repartition(spark.sparkContext.defaultParallelism)
    t0 = time.perf_counter()
    audio_features(adf).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    out["audio_sec"] = round(dt, 2)
    out["audio_clips_per_sec"] = round(n / dt)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
