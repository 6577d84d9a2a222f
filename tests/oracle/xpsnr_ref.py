"""Literal NumPy oracle for XPSNR (reference src/filters/xpsnr.zig)."""

from __future__ import annotations

import math

import numpy as np


def _spatial_act(pic, x0, x1, y0, y1):
    p = pic.astype(np.int64)
    sa = 0
    for y in range(y0, y1):
        for x in range(x0, x1):
            f = (12 * p[y, x]
                 - 2 * (p[y, x - 1] + p[y, x + 1] + p[y - 1, x] + p[y + 1, x])
                 - (p[y - 1, x - 1] + p[y - 1, x + 1] + p[y + 1, x - 1] + p[y + 1, x + 1]))
            sa += abs(f)
    return sa


def _temp_diff(cur, p1, p2, bw, bh, oy, ox, order):
    c = cur.astype(np.int64)
    ta = 0
    for y in range(oy, oy + bh):
        for x in range(ox, ox + bw):
            t = c[y, x]
            if order >= 1 and p1 is not None:
                t -= (2 if order == 2 else 1) * int(p1[y, x])
            if order == 2 and p2 is not None:
                t += int(p2[y, x])
            ta += abs(t)
    return ta * 2


def _highds_act(pic, x0, x1, y0, y1):
    """>HD spatial activity: the reference's 2x-downsampled high-pass
    (src/filters/xpsnr.zig highds, :28-61) evaluated at even coordinates
    y in [y0,y1) step 2, x in [x0,x1) step 2.  Vectorized over the block
    (exact: all int64), taps reach (-2..+3) around each 2x2 cell."""
    p = pic.astype(np.int64)
    ys = np.arange(y0, y1, 2)
    xs = np.arange(x0, x1, 2)
    if len(ys) == 0 or len(xs) == 0:
        return 0
    Y, X = np.meshgrid(ys, xs, indexing="ij")

    def g(dy, dx):
        return p[Y + dy, X + dx]

    f = (
        12 * (g(0, 0) + g(0, 1) + g(1, 0) + g(1, 1))
        - 3 * (g(-1, 0) + g(-1, 1) + g(2, 0) + g(2, 1))
        - 3 * (g(0, -1) + g(0, 2) + g(1, -1) + g(1, 2))
        - 2 * (g(-1, -1) + g(-1, 2) + g(2, -1) + g(2, 2))
        - (g(-2, -1) + g(-2, 0) + g(-2, 1) + g(-2, 2)
           + g(3, -1) + g(3, 0) + g(3, 1) + g(3, 2)
           + g(-1, -2) + g(0, -2) + g(1, -2) + g(2, -2)
           + g(-1, 3) + g(0, 3) + g(1, 3) + g(2, 3))
    )
    return int(np.abs(f).sum())


def _temp_diff_cells(cur, p1, p2, bw, bh, oy, ox, order):
    """>HD temporal activity: 2x2-cell-aggregated |t| over the FULL block
    (reference diff1st/diff2nd, src/filters/xpsnr.zig:63-110)."""
    ys = np.arange(oy, oy + bh, 2)
    xs = np.arange(ox, ox + bw, 2)
    Y, X = np.meshgrid(ys, xs, indexing="ij")

    def cell(a):
        a = a.astype(np.int64)
        return a[Y, X] + a[Y, X + 1] + a[Y + 1, X] + a[Y + 1, X + 1]

    t = cell(cur)
    if order >= 1 and p1 is not None:
        t = t - (2 if order == 2 else 1) * cell(p1)
    if order == 2 and p2 is not None:
        t = t + cell(p2)
    return int(np.abs(t).sum()) * 2


def wsse_frame_ref(org, rec, prv1, prv2, widths, heights, depth, frame_rate,
                   temporal):
    """org/rec: list of (H,W) planes for one frame.  Returns wsse64 list."""
    w, h = widths[0], heights[0]
    wh = w * h
    r = wh / (3840.0 * 2160.0)
    b = int(32.0 * math.sqrt(r) + 0.5) * 4
    num_comps = len(org)
    if b < 4:
        return [
            int(((org[c].astype(np.int64) - rec[c].astype(np.int64)) ** 2).sum())
            for c in range(num_comps)
        ]
    sft = 1 << (2 * depth - 9)
    avg_act = math.sqrt(16.0 * sft / math.sqrt(max(1e-5, r)))
    b_val = 2 if wh > 2048 * 1152 else 1
    nb_w = -(-w // b)
    order = 2 if frame_rate >= 32 else 1

    sse_l, weights = [], []
    for y0 in range(0, h, b):
        bh = min(b, h - y0)
        for x0 in range(0, w, b):
            bw = min(b, w - x0)
            d = org[0][y0:y0+bh, x0:x0+bw].astype(np.int64) - \
                rec[0][y0:y0+bh, x0:x0+bw].astype(np.int64)
            sse = int((d * d).sum())
            xa = b_val if x0 == 0 else 0
            ya = b_val if y0 == 0 else 0
            wa = bw if x0 + bw < w else bw - b_val
            ha = bh if y0 + bh < h else bh - b_val
            ms = 1.0
            if wa > xa and ha > ya:
                if b_val == 2:
                    # >HD path: downsampled high-pass, skipped for narrow
                    # blocks (w_act <= 12); 2x2-cell temporal aggregation.
                    sa = (_highds_act(org[0], x0 + xa, x0 + wa, y0 + ya, y0 + ha)
                          if wa > 12 else 0)
                else:
                    sa = _spatial_act(org[0], x0 + xa, x0 + wa, y0 + ya, y0 + ha)
                ms = sa / ((wa - xa) * (ha - ya))
                if temporal:
                    if b_val == 2:
                        ta = _temp_diff_cells(org[0], prv1, prv2, bw, bh, y0, x0, order)
                    else:
                        ta = _temp_diff(org[0], prv1, prv2, bw, bh, y0, x0, order)
                    ms += ta / (bw * bh)
                ms = max(ms, float(1 << (depth - 6)))
                ms = ms * ms
            sse_l.append(sse)
            weights.append(1.0 / math.sqrt(ms))

    if wh <= 640 * 480:
        idx = 0
        w_blk = nb_w
        for y0 in range(0, h, b):
            for x0 in range(0, w, b):
                x = x0
                if x == 0:
                    mp = weights[idx - 2] if idx > 1 else 0.0
                else:
                    mp = max(weights[idx - 2], weights[idx]) if x > b else weights[idx]
                if idx > w_blk:
                    mp = max(mp, weights[idx - 1 - w_blk])
                if idx > 0 and weights[idx - 1] > mp:
                    weights[idx - 1] = mp
                if x + b >= w and y0 + b >= h and idx > w_blk:
                    mp = max(weights[idx - 1], weights[idx - w_blk])
                    if weights[idx] > mp:
                        weights[idx] = mp
                idx += 1

    wsse = [0] * num_comps
    wl = sum(s * wt for s, wt in zip(sse_l, weights))
    wsse[0] = 0 if wl <= 0 else int(wl * avg_act + 0.5)
    for c in range(1, num_comps):
        wc, hc = widths[c], heights[c]
        bx, by = (b * wc) // w, (b * hc) // h
        acc = 0.0
        idx = 0
        for y0 in range(0, hc, by):
            bh = min(by, hc - y0)
            for x0 in range(0, wc, bx):
                bw = min(bx, wc - x0)
                d = org[c][y0:y0+bh, x0:x0+bw].astype(np.int64) - \
                    rec[c][y0:y0+bh, x0:x0+bw].astype(np.int64)
                acc += float((d * d).sum()) * weights[idx]
                idx += 1
        wsse[c] = 0 if acc <= 0 else int(acc * avg_act + 0.5)
    return wsse
