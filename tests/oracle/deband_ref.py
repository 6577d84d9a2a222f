"""Literal per-pixel NumPy oracle for the Deband frame kernel
(reference src/filters/deband_int.zig / deband_float.zig), driven by the
independently verified RNG oracle outputs."""

from __future__ import annotations

import numpy as np


def _angle(srcf, y, x):
    h, w = srcf.shape
    d = 20

    def g(yy, xx):
        return srcf[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)]

    p00, p10, p20 = g(y - d, x - d), g(y - d, x), g(y - d, x + d)
    p01, p21 = g(y, x - d), g(y, x + d)
    p02, p12, p22 = g(y + d, x - d), g(y + d, x), g(y + d, x + d)
    gx = (p20 + 2 * p21 + p22) - (p00 + 2 * p01 + p02)
    gy = (p00 + 2 * p10 + p20) - (p02 + 2 * p12 + p22)
    if abs(gx) < np.float32(0.03):
        return np.float32(1.0)
    return np.float32(np.arctan(np.float32(gy / gx)) / np.pi + 0.5)


def deband_plane_ref(src, pre, chroma, mode, blur_first, add_grain, thr3,
                     pix_range, angle_boost, max_angle, vstride, grain_key,
                     grain_offset=0):
    """One frame, one plane.  src: (H, W) uint16 (16-bit internal) or f32."""
    is_int = np.issubdtype(src.dtype, np.integer)
    thr, thr1, thr2 = thr3
    pmin, pmax = pix_range
    h, w = src.shape
    pref = "c_" if chroma else ""
    r1dy, r1dx = pre[pref + "ref1_dy"], pre[pref + "ref1_dx"]
    r2dy, r2dx = pre[pref + "ref2_dy"], pre[pref + "ref2_dx"]
    grain = pre[grain_key]
    out = np.zeros_like(src)
    s = src.astype(np.int64) if is_int else src.astype(np.float32)
    srcf = src.astype(np.float32)

    for y in range(h):
        for x in range(w):
            c = s[y, x]
            dy1, dx1 = int(r1dy[y, x]), int(r1dx[y, x])
            r1 = s[y + dy1, x + dx1]
            r3 = s[y - dy1, x - dx1]
            if mode not in (1, 3):
                dy2, dx2 = int(r2dy[y, x]), int(r2dx[y, x])
                if not is_int and dy2 * vstride + dx2 < 0:
                    # float kernel reads ref2 through @abs of the flat
                    # stride-baked offset (deband_float.zig:159), swapping
                    # r2/r4 vs the int kernel's raw read (deband_int.zig:167)
                    dy2, dx2 = -dy2, -dx2
                r2 = s[y + dy2, x + dx2]
                r4 = s[y - dy2, x - dx2]
            if mode in (1, 3):
                avg = (r1 + r3 + 1) >> 1 if is_int else (r1 + r3) * np.float32(0.5)
                if blur_first:
                    uo = abs(avg - c) >= thr
                else:
                    uo = abs(r1 - c) >= thr or abs(r3 - c) >= thr
                center = c if uo else avg
            elif mode == 2:
                if is_int:
                    a1 = (r1 + r3 + 1) >> 1
                    a2 = (r2 + r4 + 1) >> 1
                    if a1 > 0:
                        a1 -= 1
                    avg = (a1 + a2 + 1) >> 1
                else:
                    avg = (r1 + r2 + r3 + r4) * np.float32(0.25)
                if blur_first:
                    uo = abs(avg - c) >= thr
                else:
                    uo = (abs(r1 - c) >= thr or abs(r2 - c) >= thr
                          or abs(r3 - c) >= thr or abs(r4 - c) >= thr)
                center = c if uo else avg
            elif mode == 4:
                if is_int:
                    av = (r1 + r3 + 1) >> 1
                    ah = (r2 + r4 + 1) >> 1
                else:
                    av = (r1 + r3) * np.float32(0.5)
                    ah = (r2 + r4) * np.float32(0.5)
                if blur_first:
                    uov = abs(av - c) >= thr
                    uoh = abs(ah - c) >= thr
                else:
                    uov = abs(r1 - c) >= thr or abs(r3 - c) >= thr
                    uoh = abs(r2 - c) >= thr or abs(r4 - c) >= thr
                dv = c if uov else av
                dh = c if uoh else ah
                center = (dv + dh + 1) >> 1 if is_int else (dv + dh) * np.float32(0.5)
            elif mode == 5:
                avg = (r1 + r3 + r2 + r4) >> 2 if is_int else (
                    (r1 + r2 + r3 + r4) * np.float32(0.25)
                )
                md = max(abs(r1 - c), abs(r3 - c), abs(r2 - c), abs(r4 - c))
                uo = (abs(avg - c) >= thr or md >= thr1
                      or abs((r1 + r3) - 2 * c) >= thr2
                      or abs((r2 + r4) - 2 * c) >= thr2)
                center = c if uo else avg
            else:  # 6 / 7
                t_avg, t_max, t_mid = (np.float32(thr), np.float32(thr1),
                                       np.float32(thr2))
                if mode == 7:
                    a_org = _angle(srcf, y, x)
                    mad = max(
                        abs(_angle(srcf, y + dy1, x) - a_org),
                        abs(_angle(srcf, y - dy1, x) - a_org),
                        abs(_angle(srcf, y, x + dx2) - a_org),
                        abs(_angle(srcf, y, x - dx2) - a_org),
                    )
                    if mad <= max_angle:
                        t_avg = np.float32(t_avg * angle_boost)
                        t_max = np.float32(t_max * angle_boost)
                        t_mid = np.float32(t_mid * angle_boost)
                cf = np.float32(c)
                p1, p2, p3, p4 = (np.float32(r1), np.float32(r3),
                                  np.float32(r2), np.float32(r4))
                avg_refs = (p1 + p2 + p3 + p4) * np.float32(0.25)
                diff = avg_refs - cf

                def comp(dif, t):
                    return min(max(np.float32(3.0) * (1 - dif / max(t, np.float32(1e-5))), 0.0), 1.0)

                md = max(abs(p1 - cf), abs(p2 - cf), abs(p3 - cf), abs(p4 - cf))
                product = (
                    comp(abs(diff), t_avg)
                    * comp(md, t_max)
                    * comp(abs((p1 + p2) - 2 * cf), t_mid)
                    * comp(abs((p3 + p4) - 2 * cf), t_mid)
                )
                factor = np.float32(product) ** np.float32(0.1)
                blended = cf + diff * factor
                center = np.trunc(blended + np.float32(0.5)) if is_int else blended

            if add_grain:
                center = center + grain[grain_offset + y * vstride + x]
            out[y, x] = min(max(center, pmin), pmax)
    return out
