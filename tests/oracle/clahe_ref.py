"""Literal NumPy oracle for CLAHE (reference src/filters/clahe.zig)."""

from __future__ import annotations

import numpy as np


def clahe_ref(img: np.ndarray, limit: int, tiles_x: int, tiles_y: int) -> np.ndarray:
    h, w = img.shape
    bits = 8 * img.itemsize
    hist_size = 1 << bits
    peak = float(hist_size - 1)
    tw, th = w // tiles_x, h // tiles_y
    area = tw * th
    lut_scale = np.float32(peak / area)
    clip_limit = max(limit * area // hist_size, 1)

    lut = np.zeros((tiles_y, tiles_x, hist_size), np.int64)
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            tile = img[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=hist_size).astype(np.int64)
            clipped = int(np.maximum(hist - clip_limit, 0).sum())
            hist = np.minimum(hist, clip_limit)
            batch = clipped // hist_size
            residual = clipped - batch * hist_size
            hist += batch
            if residual:
                step = max(hist_size // residual, 1)
                i = 0
                while i < hist_size and residual > 0:
                    hist[i] += 1
                    residual -= 1
                    i += step
            cdf = np.cumsum(hist)
            lut[ty, tx] = np.trunc(
                cdf.astype(np.float32) * lut_scale + np.float32(0.5)
            ).astype(np.int64)

    out = np.zeros_like(img)
    for y in range(h):
        tyf = np.float32(y) * np.float32(1.0 / th) - np.float32(0.5)
        ty1u = int(np.floor(tyf))
        ya = np.float32(tyf - ty1u)
        ty1 = min(max(ty1u, 0), tiles_y - 1)
        ty2 = min(ty1u + 1, tiles_y - 1)
        for x in range(w):
            txf = np.float32(x) * np.float32(1.0 / tw) - np.float32(0.5)
            tx1u = int(np.floor(txf))
            xa = np.float32(txf - tx1u)
            tx1 = min(max(tx1u, 0), tiles_x - 1)
            tx2 = min(tx1u + 1, tiles_x - 1)
            v = img[y, x]
            l0 = np.float32(lut[ty1, tx1, v])
            l1 = np.float32(lut[ty1, tx2, v])
            l2 = np.float32(lut[ty2, tx1, v])
            l3 = np.float32(lut[ty2, tx2, v])
            res = (l0 * (1 - xa) + l1 * xa) * (1 - ya) + (l2 * (1 - xa) + l3 * xa) * ya
            out[y, x] = np.trunc(res + np.float32(0.5))
    return out
