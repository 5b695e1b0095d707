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


def _box_resize(gray: np.ndarray, n: int = _N) -> np.ndarray:
    """Exact area-average resize to n x n (handles non-multiple dims by
    pixel-weighted cell overlap, still an exact box filter)."""
    h, w = gray.shape
    # integral image for O(1) exact rectangle sums at fractional edges:
    # use cumulative sums padded with a zero row/col
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = np.cumsum(np.cumsum(gray.astype(np.float64), 0), 1)

    def cell_mean(y0, y1, x0, x1):
        # fractional box [y0,y1) x [x0,x1) via whole-pixel decomposition
        iy0, iy1 = int(np.floor(y0)), int(np.ceil(y1))
        ix0, ix1 = int(np.floor(x0)), int(np.ceil(x1))
        total, area = 0.0, 0.0
        for yy in range(iy0, iy1):
            wy = min(y1, yy + 1) - max(y0, yy)
            for xx in range(ix0, ix1):
                wx = min(x1, xx + 1) - max(x0, xx)
                total += gray[yy, xx] * wy * wx
                area += wy * wx
        return total / area

    if h % n == 0 and w % n == 0:
        # fast exact path: reshape-mean
        return gray.astype(np.float64).reshape(
            n, h // n, n, w // n).mean(axis=(1, 3))
    out = np.empty((n, n))
    for i in range(n):
        for j in range(n):
            out[i, j] = cell_mean(i * h / n, (i + 1) * h / n,
                                  j * w / n, (j + 1) * w / n)
    return out


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
