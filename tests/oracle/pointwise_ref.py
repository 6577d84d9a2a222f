"""Sequential NumPy oracles for the pointwise/stencil filters, written
per-pixel from the reference algorithm descriptions (no vectorization):
Limiter, LimitFilter, AdaptiveBinarize, CombMaskMT, CombMask, Checkmate.
"""

from __future__ import annotations

import numpy as np


def limit_filter_ref(f, s, r, dark_thr, bright_thr, elast):
    """src/filters/limit_filter.zig:3-34."""
    out = np.zeros_like(f)
    is_int = np.issubdtype(f.dtype, np.integer)
    for idx in np.ndindex(f.shape):
        ff = np.float32(f[idx])
        sf = np.float32(s[idx])
        rf = np.float32(r[idx])
        diff = ff - rf
        da = abs(diff)
        thr1 = np.float32(bright_thr if diff > 0 else dark_thr)
        thr2 = thr1 * np.float32(elast)
        if da <= thr1:
            o = ff
        elif da >= thr2:
            o = sf
        else:
            o = sf + (ff - sf) * (thr2 - da) / (thr2 - thr1)
        out[idx] = np.trunc(o + np.float32(0.5)) if is_int else f.dtype.type(o)
    return out


def comb_mask_mt_ref(img, thy1, thy2):
    """src/filters/comb_mask_mt.zig:11-66."""
    h, w = img.shape
    out = np.zeros((h, w), np.uint8)
    for y in range(1, h - 1):
        for x in range(w):
            prod = (int(img[y - 1, x]) - int(img[y, x])) * (
                int(img[y + 1, x]) - int(img[y, x])
            )
            if thy1 == thy2:
                out[y, x] = 255 if prod > thy2 else 0
            else:
                if prod < thy1:
                    out[y, x] = 0
                elif prod > thy2:
                    out[y, x] = 255
                else:
                    out[y, x] = min((prod - thy1) * 256 // (thy2 - thy1), 255)
    return out


def _reflect101(i, n):
    if i < 0:
        return -i
    if i > n - 1:
        return 2 * (n - 1) - i
    return i


def comb_mask_ref(img, prev, cthresh, mthresh, expand, metric):
    """src/filters/comb_mask.zig:18-206 (per plane, single frame)."""
    h, w = img.shape
    mask = np.zeros((h, w), np.uint8)
    if metric:
        for y in range(h):
            up, dn = _reflect101(y - 1, h), _reflect101(y + 1, h)
            for x in range(w):
                v = (int(img[up, x]) - int(img[y, x])) * (
                    int(img[dn, x]) - int(img[y, x])
                )
                mask[y, x] = 255 if v > cthresh else 0
    else:
        cth6 = cthresh * 6
        for y in range(h):
            a, b, d, e = (
                _reflect101(y - 2, h), _reflect101(y - 1, h),
                _reflect101(y + 1, h), _reflect101(y + 2, h),
            )
            for x in range(w):
                d1 = int(img[y, x]) - int(img[b, x])
                d2 = int(img[y, x]) - int(img[d, x])
                pred = (d1 > cthresh and d2 > cthresh) or (
                    d1 < -cthresh and d2 < -cthresh
                )
                val = abs(
                    int(img[a, x]) + 4 * int(img[y, x]) + int(img[e, x])
                    - 3 * (int(img[b, x]) + int(img[d, x]))
                ) > cth6
                mask[y, x] = 255 if (pred and val) else 0

    def expand_mask(m):
        if w < 2:
            return m
        out = m.copy()
        for y in range(h):
            buf = m[y].copy()
            out[y, 0] = buf[0] | buf[1]
            for x in range(1, w - 1):
                out[y, x] = buf[x - 1] | buf[x] | buf[x + 1]
            # out[y, w-1] untouched (reference quirk)
        return out

    motion = mthresh > 0
    if expand and not motion:
        mask = expand_mask(mask)
    if motion:
        diff = np.where(
            np.abs(img.astype(np.int32) - prev.astype(np.int32)) > mthresh,
            255, 0,
        ).astype(np.uint8)
        dil = np.zeros_like(diff)
        for y in range(h):
            up = diff[y - 1] if y > 0 else 0
            dn = diff[min(y + 1, h - 1)]
            dil[y] = up | diff[y] | dn
        mask = mask & dil
        if expand:
            mask = expand_mask(mask)
    return mask


def checkmate_ref(frames, n, thr, tmax, tthr2):
    """src/filters/checkmate.zig:5-57 for frame n of a (N,H,W) u8 stack."""
    N, h, w = frames.shape
    src = frames[n].astype(np.int64)
    p1 = frames[max(0, n - 1)].astype(np.int64)
    n1 = frames[min(n + 1, N - 1)].astype(np.int64)
    p2 = frames[max(0, n - 2)].astype(np.int64)
    n2 = frames[min(n + 2, N - 1)].astype(np.int64)
    out = frames[n].copy()
    use_tthr2 = tthr2 > 0
    tmax_mult = (1 << 13) // tmax
    for y in range(2, h - 2):
        for x in range(w):
            if use_tthr2 and (
                abs(p1[y, x] - n1[y, x]) < tthr2
                and abs(p2[y, x] - src[y, x]) < tthr2
                and abs(src[y, x] - n2[y, x]) < tthr2
            ):
                out[y, x] = (p1[y, x] + src[y, x] * 2 + n1[y, x]) >> 2
                continue
            xl = 0 if x < 2 else x - 2
            xr = w - 1 if x > w - 3 else x + 2
            cur_col = src[y - 2, x] + 2 * src[y, x] + src[y + 2, x]
            curr_value = (
                -src[y - 2, xl] - src[y - 2, xr]
                + 2 * src[y, xl] + 2 * src[y, xr]
                - src[y + 2, xl] - src[y + 2, xr]
                + 2 * cur_col + 12 * src[y, x]
            )
            nc = n1[y - 2, x] + 2 * n1[y, x] + n1[y + 2, x] - cur_col
            pc = p1[y - 2, x] + 2 * p1[y, x] + p1[y + 2, x] - cur_col
            nc = thr + tmax - abs(nc)
            pc = thr + tmax - abs(pc)
            nw = min(max(min(nc, tmax + 1), 0) * tmax_mult, 8192)
            pw = min(max(min(pc, tmax + 1), 0) * tmax_mult, 8192)
            cw = (1 << 14) - (nw + pw)
            nv = src[y, x] + n1[y, x]
            pv = src[y, x] + p1[y, x]
            div10 = int(curr_value / 10)  # trunc toward zero
            o = (cw * div10 + pw * pv + nw * nv) >> 15
            out[y, x] = min(max(o, 0), 255)
    return out
