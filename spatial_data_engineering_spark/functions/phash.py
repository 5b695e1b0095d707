"""64-bit perceptual hash (pHash) over real pixel planes.

Completes the multimodal real path: with in-container codecs for PNG
(functions/png.py), baseline JPEG (functions/jpeg.py) and Y4M video
frames (functions/y4m.py), the classic DCT perceptual hash can run on
REAL luma pixels — the drop-in q133's docstring points at for replacing
the fake frame checksum with a similarity-preserving signature.

Algorithm (the standard pHash construction):
1. area-average the luma plane down to 32x32 (box filter — exact mean
   over each cell, no interpolation kernel to disagree about),
2. 2-D orthonormal DCT,
3. keep the top-left 8x8 low-frequency block minus the DC term,
4. threshold each coefficient by the median of the 63 -> 64 bits
   (MSB-first in row-major order, DC slot forced to 0).

Properties the tests pin: identical pixels -> identical hash; small
noise -> small Hamming distance; unrelated images -> ~32-bit distance.
Pure numpy; runs per-payload inside Arrow-batched mapInPandas like the
codecs themselves.
"""

from __future__ import annotations

import numpy as np

_N = 32  # downsample grid
_K = 8   # low-frequency block

_C = np.zeros((_N, _N))
for _k in range(_N):
    for _n in range(_N):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / (2 * _N)) * (
            np.sqrt(1.0 / _N) if _k == 0 else np.sqrt(2.0 / _N))


def _axis_box(m: np.ndarray, n: int) -> np.ndarray:
    """Exact 1-D fractional box average along axis 0: (h, k) -> (n, k).

    Cell i averages rows [i*h/n, (i+1)*h/n); fractional endpoints are
    handled by a cumulative integral with linear end-row weighting —
    vectorized over all cells and columns at once."""
    h = m.shape[0]
    cs = np.vstack([np.zeros((1, m.shape[1])), np.cumsum(m, axis=0)])

    def integral(pos):
        lo = np.minimum(np.floor(pos).astype(int), h - 1)
        frac = pos - lo
        return cs[lo] + frac[:, None] * m[lo]

    edges = np.arange(n + 1) * (h / n)
    upper = integral(edges[1:])
    lower = integral(edges[:-1])
    return (upper - lower) / (h / n)


def _box_resize(gray: np.ndarray, n: int = _N) -> np.ndarray:
    """Exact area-average resize to n x n.  The box weight is a product
    of per-axis weights, so the 2-D fractional box average factors into
    two 1-D passes (rows then columns) — fully vectorized."""
    h, w = gray.shape
    if h % n == 0 and w % n == 0:
        # fast exact path: reshape-mean
        return gray.astype(np.float64).reshape(
            n, h // n, n, w // n).mean(axis=(1, 3))
    rows = _axis_box(gray.astype(np.float64), n)
    return _axis_box(rows.T, n).T


def phash64(gray_pixels, width: int, height: int) -> int:
    """Flat 8-bit luma bytes (row-major) -> 64-bit perceptual hash."""
    gray = np.frombuffer(bytes(gray_pixels), dtype=np.uint8).astype(
        np.float64).reshape(height, width)
    small = _box_resize(gray)
    coef = _C @ small @ _C.T
    block = coef[:_K, :_K].copy().reshape(-1)
    med = np.median(block[1:])  # DC excluded from both median and bits
    bits = 0
    for i in range(_K * _K):
        bits <<= 1
        if i and block[i] > med:
            bits |= 1
    return bits


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
