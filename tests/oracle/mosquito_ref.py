"""Literal NumPy oracle for MosquitoNR (reference src/filters/mosquito_nr.zig),
scalar loops; int path only (the float path shares structure and is checked
against looser tolerances in the tests)."""

from __future__ import annotations

import numpy as np


def _pad2(img):
    h, w = img.shape
    p = np.zeros((h + 4, w + 4), np.int64)
    p[2 : h + 2, 2 : w + 2] = img
    p[2 : h + 2, 0] = p[2 : h + 2, 4]
    p[2 : h + 2, 1] = p[2 : h + 2, 3]
    p[2 : h + 2, w + 2] = p[2 : h + 2, w]
    p[2 : h + 2, w + 3] = p[2 : h + 2, w - 1]
    p[0] = p[4]
    p[1] = p[3]
    p[h + 2] = p[h]
    p[h + 3] = p[h + 1 - 2]
    return p


def _smooth(pl, w, h, strength, radius):
    blur = np.zeros((h, w), np.int64)
    if radius == 1:
        coef0, coef1 = 64 - 2 * strength, 128 - 4 * strength
    else:
        coef0, coef1 = 128 - 4 * strength, 256 - 8 * strength
    coef2 = strength
    coef3 = 2 * strength
    for y in range(h):
        for x in range(w):
            cy, cx = y + 2, x + 2
            t = lambda dy, dx: int(pl[cy + dy, cx + dx])
            c = t(0, 0)
            A = lambda dy, dx: abs(t(dy, dx) - c)
            Hm = lambda a, b: abs(((t(*a) + t(*b)) >> 1) - c)
            if radius == 1:
                sad = [
                    A(0, -1) + A(0, 1),
                    A(-1, -1) + A(1, 1),
                    A(-1, 0) + A(1, 0),
                    A(-1, 1) + A(1, -1),
                    Hm((0, -1), (-1, -1)) + Hm((0, 1), (1, 1)),
                    Hm((-1, -1), (-1, 0)) + Hm((1, 1), (1, 0)),
                    Hm((-1, 0), (-1, 1)) + Hm((1, 0), (1, -1)),
                    Hm((0, 1), (-1, 1)) + Hm((0, -1), (1, -1)),
                ]
            else:
                sad = [
                    A(0, -1) + A(0, 1) + A(0, -2) + A(0, 2),
                    A(-1, -1) + A(1, 1) + A(-2, -2) + A(2, 2),
                    A(-1, 0) + A(1, 0) + A(-2, 0) + A(2, 0),
                    A(-1, 1) + A(1, -1) + A(-2, 2) + A(2, -2),
                    A(-1, -2) + A(1, 2) + Hm((0, -1), (-1, -1)) + Hm((0, 1), (1, 1)),
                    A(-2, -1) + A(2, 1) + Hm((-1, -1), (-1, 0)) + Hm((1, 1), (1, 0)),
                    A(-2, 1) + A(2, -1) + Hm((-1, 0), (-1, 1)) + Hm((1, 0), (1, -1)),
                    A(-1, 2) + A(1, -2) + Hm((-1, 1), (0, 1)) + Hm((1, -1), (0, -1)),
                ]
            best, bi = sad[0], 0
            for i in range(1, 8):
                if sad[i] < best:
                    best, bi = sad[i], i
            if best == 0:
                bi = 8
            if bi == 8:
                blur[y, x] = c
            elif radius == 1:
                arms = [
                    (coef0 * c + coef2 * (t(0, -1) + t(0, 1)) + 32) >> 6,
                    (coef0 * c + coef2 * (t(-1, -1) + t(1, 1)) + 32) >> 6,
                    (coef0 * c + coef2 * (t(-1, 0) + t(1, 0)) + 32) >> 6,
                    (coef0 * c + coef2 * (t(-1, 1) + t(1, -1)) + 32) >> 6,
                    (coef1 * c + coef2 * (t(-1, -1) + t(0, -1) + t(0, 1) + t(1, 1)) + 64) >> 7,
                    (coef1 * c + coef2 * (t(-1, -1) + t(-1, 0) + t(1, 0) + t(1, 1)) + 64) >> 7,
                    (coef1 * c + coef2 * (t(-1, 1) + t(-1, 0) + t(1, 0) + t(1, -1)) + 64) >> 7,
                    (coef1 * c + coef2 * (t(-1, 1) + t(0, 1) + t(0, -1) + t(1, -1)) + 64) >> 7,
                ]
                blur[y, x] = arms[bi]
            else:
                arms = [
                    (coef0 * c + coef2 * (t(0, -2) + t(0, -1) + t(0, 1) + t(0, 2)) + 64) >> 7,
                    (coef0 * c + coef2 * (t(-2, -2) + t(-1, -1) + t(1, 1) + t(2, 2)) + 64) >> 7,
                    (coef0 * c + coef2 * (t(-2, 0) + t(-1, 0) + t(1, 0) + t(2, 0)) + 64) >> 7,
                    (coef0 * c + coef2 * (t(-2, 2) + t(-1, 1) + t(1, -1) + t(2, -2)) + 64) >> 7,
                    (coef1 * c + coef3 * (t(-1, -2) + t(1, 2))
                     + coef2 * (t(-1, -1) + t(0, -1) + t(0, 1) + t(1, 1)) + 128) >> 8,
                    (coef1 * c + coef3 * (t(-2, -1) + t(2, 1))
                     + coef2 * (t(-1, -1) + t(-1, 0) + t(1, 0) + t(1, 1)) + 128) >> 8,
                    (coef1 * c + coef3 * (t(-2, 1) + t(2, -1))
                     + coef2 * (t(-1, 1) + t(-1, 0) + t(1, 0) + t(1, -1)) + 128) >> 8,
                    (coef1 * c + coef3 * (t(-1, 2) + t(1, -2))
                     + coef2 * (t(-1, 1) + t(0, 1) + t(0, -1) + t(1, -1)) + 128) >> 8,
                ]
                blur[y, x] = arms[bi]
    return blur


def _fwd_v(x):
    h, w = x.shape
    na, nd = (h + 1) // 2, h // 2
    vd = np.zeros((nd, w), np.int64)
    va = np.zeros((na, w), np.int64)
    for j in range(nd):
        r2 = 2 * j + 2 if 2 * j + 2 < h else h - 2
        vd[j] = x[2 * j + 1] - ((x[2 * j] + x[r2]) >> 1)
    for j in range(na):
        jl = max(j - 1, 0)
        jr = j if j < nd else nd - 1
        va[j] = x[2 * j] + ((vd[jl] + vd[jr]) >> 2)
    return va, vd


def _inv_v(va, vd, h):
    na, nd = (h + 1) // 2, h // 2
    w = va.shape[1]
    out = np.zeros((h, w), np.int64)
    for j in range(na):
        jl = max(j - 1, 0)
        jr = j if j < nd else nd - 1
        out[2 * j] = va[j] - ((vd[jl] + vd[jr]) >> 2)
    for j in range(nd):
        r2 = 2 * j + 2 if 2 * j + 2 < h else h - 2
        out[2 * j + 1] = vd[j] + ((out[2 * j] + out[r2]) >> 1)
    return out


def mosquito_plane_ref(img, strength, restore, radius, bits):
    work = img.astype(np.int64) << 4
    pl = _pad2(work)
    blur = _smooth(pl, img.shape[1], img.shape[0], strength, radius)
    out = blur
    if restore != 0:
        va_o, _ = _fwd_v(work)
        ll_o, _ = _fwd_v(va_o.T)
        va_b, vd_b = _fwd_v(blur)
        ll_b, hd_b = _fwd_v(va_b.T)
        if restore != 128:
            ll = (restore * ll_o + (128 - restore) * ll_b + 64) >> 7
        else:
            ll = ll_o
        va_rec = _inv_v(ll, hd_b, va_b.T.shape[0]).T
        out = _inv_v(va_rec, vd_b, img.shape[0])
    return np.clip((out + 8) >> 4, 0, (1 << bits) - 1).astype(img.dtype)
