"""Literal NumPy oracle for SSIMULACRA2 (reference
src/filters/ssimulacra2.zig:46-663): a sequential transcription of the
6-scale pipeline — clamped 2x2 downscale, XYB conversion, 9-tap separable
blur with the reference's exact edge-index rule, f64 SSIM/edge maps, skip
pruning, and the 108-weight score fold — independent of the op's JAX
formulation.  Input: one frame of linear RGB f32 planes."""

from __future__ import annotations

import numpy as np

KERNEL = np.array([
    0.0076144188642501831054687500, 0.0360749699175357818603515625,
    0.1095860823988914489746093750, 0.2134445458650588989257812500,
    0.2665599882602691650390625000, 0.2134445458650588989257812500,
    0.1095860823988914489746093750, 0.0360749699175357818603515625,
    0.0076144188642501831054687500,
], np.float32)
RADIUS = 4
PRUNE = 0.01

# ssimulacra2 v2.1 fitted weights (public metric constants,
# reference src/filters/ssimulacra2.zig:665-774)
WEIGHT = np.array([
    0.0, 0.0007376606707406586, 0.0, 0.0, 0.0007793481682867309, 0.0,
    0.0, 0.0004371155730107379, 0.0, 1.1041726426657346, 0.00066284834129271,
    0.00015231632783718752, 0.0, 0.0016406437456599754, 0.0,
    1.8422455520539298, 11.441172603757666, 0.0, 0.0007989109436015163,
    0.000176816438078653, 0.0, 1.8787594979546387, 10.94906990605142, 0.0,
    0.0007289346991508072, 0.9677937080626833, 0.0, 0.00014003424285435884,
    0.9981766977854967, 0.00031949755934435053, 0.0004550992113792063, 0.0,
    0.0, 0.0013648766163243398, 0.0, 0.0, 0.0, 0.0, 0.0, 7.466890328078848,
    0.0, 17.445833984131262, 0.0006235601634041466, 0.0, 0.0,
    6.683678146179332, 0.00037724407979611296, 1.027889937768264,
    225.20515300849274, 0.0, 0.0, 19.213238186143016, 0.0011401524586618361,
    0.001237755635509985, 176.39317598450694, 0.0, 0.0, 24.43300999870476,
    0.28520802612117757, 0.0004485436923833408, 0.0, 0.0, 0.0,
    34.77906344483772, 44.835625328877896, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0008680556573291698, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0005313191874358747, 0.0, 0.00016533814161379112, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0004179171803251336, 0.0017290828234722833, 0.0,
    0.0020827005846636437, 0.0, 0.0, 8.826982764996862, 23.19243343998926,
    0.0, 95.1080498811086, 0.9863978034400682, 0.9834382792465353,
    0.0012286405048278493, 171.2667255897307, 0.9807858872435379, 0.0, 0.0,
    0.0, 0.0005130064588990679, 0.0, 0.00010854057858411537,
], np.float64)


def _skip(plane, scale):
    base = plane * 36 + scale * 6
    ssim = WEIGHT[base] <= PRUNE and WEIGHT[base + 3] <= PRUNE
    art = WEIGHT[base + 1] <= PRUNE and WEIGHT[base + 4] <= PRUNE
    det = WEIGHT[base + 2] <= PRUNE and WEIGHT[base + 5] <= PRUNE
    return ssim, art, det


def _blur_indices(n: int) -> np.ndarray:
    """(9, n) source index per tap/position: the reference's blurH edge rule
    (src/filters/ssimulacra2.zig:247-309), identical for rows (blurV)."""
    idx = np.empty((9, n), np.int64)
    for j in range(n):
        dist_right = n - 1 - j
        for k in range(9):
            if k < RADIUS:
                if j < RADIUS - k:
                    idx[k, j] = min(RADIUS - k - j, n - 1)
                else:
                    idx[k, j] = j - RADIUS + k
            else:
                if dist_right < k - RADIUS:
                    idx[k, j] = j - min(k - RADIUS - dist_right, j)
                else:
                    idx[k, j] = j - RADIUS + k
    return idx


def _blur(a: np.ndarray) -> np.ndarray:
    """9-tap separable Gaussian, V then H, f32 accumulation."""
    h, w = a.shape
    iv, ih = _blur_indices(h), _blur_indices(w)
    v = np.zeros((h, w), np.float32)
    for k in range(9):
        v += KERNEL[k] * a[iv[k], :]
    out = np.zeros((h, w), np.float32)
    for k in range(9):
        out += KERNEL[k] * v[:, ih[k]]
    return out


def _downscale(planes):
    """Clamped 2x2 box downscale of each plane (edge-replicated for odd
    dims), scalar add order (a00+a01)+a10+a11, * 0.25."""
    out = []
    for a in planes:
        h, w = a.shape
        ap = np.pad(a, ((0, h % 2), (0, w % 2)), mode="edge")
        s = ((ap[0::2, 0::2] + ap[0::2, 1::2]) + ap[1::2, 0::2]) + ap[1::2, 1::2]
        out.append((s * np.float32(0.25)).astype(np.float32))
    return out


_K_M = np.array([
    [0.30, 1.0 - 0.078 - 0.30, 0.078],
    [0.23, 1.0 - 0.078 - 0.23, 0.078],
    [0.24342269, 0.20476745, 1.0 - 0.24342269 - 0.20476745],
], np.float32)
_K_BIAS = np.float32(0.0037930734)
_K_D1 = np.float32(np.cbrt(np.float32(0.0037930734)))


def _to_xyb(planes):
    r, g, b = (p.astype(np.float32) for p in planes)
    mix = []
    for m0, m1, m2 in _K_M:
        v = m0 * r + m1 * g + m2 * b + _K_BIAS
        mix.append(np.cbrt(np.maximum(v, np.float32(0.0))).astype(np.float32)
                   - _K_D1)
    cx, cy, cz = mix
    xv = np.float32(0.5) * (cx - cy)
    yv = np.float32(0.5) * (cx + cy)
    return [
        xv * np.float32(14.0) + np.float32(0.42),
        yv + np.float32(0.01),
        (cz - yv) + np.float32(0.55),
    ]


def _ssim_map(sq, s12, mu1, mu2, one_per_pixels):
    m1 = mu1.astype(np.float32)
    m2 = mu2.astype(np.float32)
    m11, m22, m12 = m1 * m1, m2 * m2, m1 * m2
    m_diff = m1 - m2
    num_m = (np.float32(1.0) - m_diff * m_diff).astype(np.float64)
    num_s = ((s12 - m12) * np.float32(2.0) + np.float32(0.0009)).astype(np.float64)
    denom_s = (sq - np.float32(2.0) * s12 - m11 - m22
               + np.float32(0.0009)).astype(np.float64)
    d1 = np.maximum(1.0 - (num_m * num_s) / denom_s, 0.0)
    s1 = one_per_pixels * d1.sum()
    s4 = np.sqrt(np.sqrt(one_per_pixels * ((d1 * d1) * (d1 * d1)).sum()))
    return s1, s4


def _edge_map(im1, im2, mu1, mu2, one_per_pixels):
    n1 = np.abs(im1 - mu1).astype(np.float64)
    n2 = np.abs(im2 - mu2).astype(np.float64)
    d1 = (1.0 + n2) / (1.0 + n1) - 1.0
    art = np.maximum(d1, 0.0)
    det = np.maximum(-d1, 0.0)
    return (
        one_per_pixels * art.sum(),
        np.sqrt(np.sqrt(one_per_pixels * ((art * art) * (art * art)).sum())),
        one_per_pixels * det.sum(),
        np.sqrt(np.sqrt(one_per_pixels * ((det * det) * (det * det)).sum())),
    )


def _score(avg_ssim, avg_edge) -> float:
    ssim = 0.0
    i = 0
    for plane in range(3):
        for s in range(6):
            for n in range(2):
                ssim += WEIGHT[i] * abs(avg_ssim[s][plane * 2 + n]); i += 1
                ssim += WEIGHT[i] * abs(avg_edge[s][plane * 4 + n]); i += 1
                ssim += WEIGHT[i] * abs(avg_edge[s][plane * 4 + n + 2]); i += 1
    ssim *= 0.9562382616834844
    ssim = (6.248496625763138e-5 * ssim * ssim) * ssim \
        + 2.326765642916932 * ssim \
        - 0.020884521182843837 * ssim * ssim
    if ssim > 0.0:
        ssim = ssim ** 0.6276336467831387 * -10.0 + 100.0
    else:
        ssim = 100.0
    return ssim


def ssimulacra2_frame_ref(rgb1, rgb2) -> float:
    """rgb1/rgb2: lists of three (H, W) linear-RGB f32 planes."""
    src1 = [np.asarray(p, np.float32) for p in rgb1]
    src2 = [np.asarray(p, np.float32) for p in rgb2]
    avg_ssim = np.zeros((6, 6))
    avg_edge = np.zeros((6, 12))
    for scale in range(6):
        if scale > 0:
            src1 = _downscale(src1)
            src2 = _downscale(src2)
        h, w = src1[0].shape
        opp = 1.0 / (w * h)
        xyb1 = _to_xyb(src1)
        xyb2 = _to_xyb(src2)
        for plane in range(3):
            skip_ssim, skip_art, skip_det = _skip(plane, scale)
            if skip_ssim and skip_art and skip_det:
                continue
            if not skip_ssim:
                s12 = _blur(xyb1[plane] * xyb2[plane])
                t = xyb1[plane] + xyb2[plane]
                sq = _blur(t * t)
            mu1 = _blur(xyb1[plane])
            mu2 = _blur(xyb2[plane])
            if not skip_ssim:
                avg_ssim[scale][plane * 2], avg_ssim[scale][plane * 2 + 1] = \
                    _ssim_map(sq, s12, mu1, mu2, opp)
            if not (skip_art and skip_det):
                e = _edge_map(xyb1[plane], xyb2[plane], mu1, mu2, opp)
                avg_edge[scale][plane * 4: plane * 4 + 4] = e
    return _score(avg_ssim, avg_edge)
