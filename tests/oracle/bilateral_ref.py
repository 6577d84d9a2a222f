"""NumPy oracle for Bilateral (reference src/filters/bilateral.zig),
literal per-pixel loops for alg2 and row-sequential IIR for alg1."""

from __future__ import annotations

import math

import numpy as np


def gs_lut(radius, sigma_s):
    upper = radius + 1
    y, x = np.mgrid[0:upper, 0:upper].astype(np.float64)
    return np.exp((x * x + y * y) / (sigma_s * sigma_s * -2.0)).astype(np.float32)


def gr_lut(hist_len, sigma_r):
    rng = float(hist_len - 1)
    upper = int(np.trunc(min(rng, sigma_r * 8.0 * rng + 0.5)))
    i = np.arange(hist_len, dtype=np.float64)
    j = np.minimum(i, upper) / rng
    x = j / sigma_r
    return (np.exp(x * x / -2.0) / (math.sqrt(2.0 * math.pi) * sigma_r)).astype(
        np.float32
    )


def _range_idx(cx, nb, is_int):
    if is_int:
        return abs(int(cx) - int(nb))
    ad = np.float32(abs(np.float32(cx) - np.float32(nb)))
    return int(np.trunc(min(np.float32(1.0), ad) * np.float32(65535.0) + np.float32(0.5)))


def truncated_ref(src, ref, gs, gr, radius, step, peak):
    h, w = src.shape
    is_int = np.issubdtype(src.dtype, np.integer)
    out = np.zeros_like(src)
    r2 = radius + 1
    w0 = np.float32(gs[0, 0] * gr[0])
    for y in range(h):
        for x in range(w):
            cx = ref[y, x]
            wsum = w0
            s = np.float32(src[y, x]) * w0
            for yy in range(1, r2, step):
                ya = max(y - yy, 0)
                yb = min(y + yy, h - 1)
                for xx in range(1, r2, step):
                    xa = min(x + xx, w - 1)
                    xb = max(x - xx, 0)
                    swei = gs[yy, xx]
                    rw1 = gr[_range_idx(cx, ref[ya, xa], is_int)]
                    rw2 = gr[_range_idx(cx, ref[yb, xa], is_int)]
                    rw3 = gr[_range_idx(cx, ref[ya, xb], is_int)]
                    rw4 = gr[_range_idx(cx, ref[yb, xb], is_int)]
                    wsum = np.float32(wsum + swei * (rw1 + rw2 + rw3 + rw4))
                    s = np.float32(
                        s
                        + swei
                        * (
                            np.float32(src[ya, xa]) * rw1
                            + np.float32(src[yb, xa]) * rw2
                            + np.float32(src[ya, xb]) * rw3
                            + np.float32(src[yb, xb]) * rw4
                        )
                    )
            r = s / wsum
            if is_int:
                out[y, x] = np.trunc(np.clip(r + np.float32(0.5), 0.0, peak))
            else:
                out[y, x] = src.dtype.type(r)
    return out


def _rg_params(sigma):
    q = (
        3.97156 - 4.14554 * math.sqrt(1 - 0.26891 * sigma)
        if sigma < 2.5
        else 0.98711 * sigma - 0.96330
    )
    den = 1.57825 + 2.44413 * q + 1.4281 * q * q + 0.422205 * q**3
    n1 = 2.44413 * q + 2.85619 * q * q + 1.26661 * q**3
    n2 = -(1.4281 * q * q + 1.26661 * q**3)
    n3 = 0.422205 * q**3
    return (
        np.float32(1 - (n1 + n2 + n3) / den),
        np.float32(n1 / den),
        np.float32(n2 / den),
        np.float32(n3 / den),
    )


def _iir_h(a, b, b1, b2, b3):
    h, w = a.shape
    out = a.copy()
    for j in range(h):
        p1 = p2 = p3 = out[j, 0]
        for i in range(1, w):
            p0 = np.float32(b * out[j, i] + b1 * p1 + b2 * p2 + b3 * p3)
            p3, p2, p1 = p2, p1, p0
            out[j, i] = p0
        p1 = p2 = p3 = out[j, w - 1]
        for i in range(w - 2, -1, -1):
            p0 = np.float32(b * out[j, i] + b1 * p1 + b2 * p2 + b3 * p3)
            p3, p2, p1 = p2, p1, p0
            out[j, i] = p0
    return out


def _iir_v(a, b, b1, b2, b3):
    h, w = a.shape
    out = a.copy()
    for j in range(h):
        r1 = out[j - 1] if j >= 1 else out[j]
        r2 = out[j - 2] if j >= 2 else r1
        r3 = out[j - 3] if j >= 3 else r2
        out[j] = np.float32(b) * out[j] + np.float32(b1) * r1 + np.float32(b2) * r2 + np.float32(b3) * r3
    for j in range(h - 1, -1, -1):
        r1 = out[j + 1] if j < h - 1 else out[j]
        r2 = out[j + 2] if j < h - 2 else r1
        r3 = out[j + 3] if j < h - 3 else r2
        out[j] = np.float32(b) * out[j] + np.float32(b1) * r1 + np.float32(b2) * r2 + np.float32(b3) * r3
    return out


def pbfic_ref(src, ref, num, sigma_s, gr, peak):
    is_int = np.issubdtype(src.dtype, np.integer)
    h, w = src.shape
    b, b1, b2, b3 = _rg_params(sigma_s)
    if is_int:
        ks = np.arange(num, dtype=np.float32)
        pbfick = np.trunc(np.float32(peak) * ks / np.float32(num - 1) + 0.5)
    else:
        pbfick = (np.arange(num) / np.float64(num - 1)).astype(np.float32)
    planes = np.zeros((num, h, w), np.float32)
    for k in range(num):
        pk = src.dtype.type(pbfick[k])
        if is_int:
            idx = np.abs(pk.astype(np.int64) - ref.astype(np.int64))
        else:
            ad = np.abs(np.float32(pk) - ref.astype(src.dtype)).astype(np.float32)
            idx = np.trunc(
                np.minimum(np.float32(1.0), ad) * np.float32(65535.0) + np.float32(0.5)
            ).astype(np.int64)
        wk = gr[idx].astype(np.float32)
        jk = (wk * src.astype(np.float32)).astype(np.float32)
        wk = _iir_v(_iir_h(wk, b, b1, b2, b3), b, b1, b2, b3)
        jk = _iir_v(_iir_h(jk, b, b1, b2, b3), b, b1, b2, b3)
        planes[k] = np.where(wk == 0, 0.0, jk / wk)
    out = np.zeros_like(src)
    reff = ref.astype(np.float32)
    for y in range(h):
        for x in range(w):
            rv = ref[y, x]
            k = num - 2
            for kk in range(num - 2):
                if rv < pbfick[kk + 1] and rv >= pbfick[kk]:
                    k = kk
                    break
            p0, p1 = np.float32(pbfick[k]), np.float32(pbfick[k + 1])
            rf = reff[y, x]
            vf = ((p1 - rf) * planes[k, y, x] + (rf - p0) * planes[k + 1, y, x]) / (
                p1 - p0
            )
            if is_int:
                out[y, x] = np.trunc(np.clip(vf + np.float32(0.5), 0.0, peak))
            else:
                out[y, x] = src.dtype.type(vf)
    return out
