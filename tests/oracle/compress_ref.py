"""Literal per-block NumPy oracle for Compress (reference
src/filters/compress.zig, itself modeled on the FFmpeg integer DCT
pipeline).  Scalar loops, wrapping int32 semantics via np.int32."""

from __future__ import annotations

import numpy as np

from vszip_tpu.ops.compress import (
    CONST_BITS, COL_DC_BIAS, COL_SHIFT, JPEG_BIAS, JPEG_CHROMA, JPEG_LUMA,
    MPEG_BIAS, MPEG_INTRA, MPEG_THRESH1, MPEG_THRESH2, PASS1_BITS,
    QMAT_SHIFT, ROW_SHIFT, W1, W2, W3, W4, W5, W6, W7, _F,
)

_I32 = lambda v: np.int64(np.int32(np.int64(v) & 0xFFFFFFFF))
_I16 = lambda v: np.int64(np.int16(np.int64(v) & 0xFFFF))


def _descale(x, n):
    return _I32(x + (1 << (n - 1))) >> n


def _fdct1d(t, out_round, even_shift):
    tmp0, tmp7 = t[0] + t[7], t[0] - t[7]
    tmp1, tmp6 = t[1] + t[6], t[1] - t[6]
    tmp2, tmp5 = t[2] + t[5], t[2] - t[5]
    tmp3, tmp4 = t[3] + t[4], t[3] - t[4]
    tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
    tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
    o = [0] * 8
    if even_shift < 0:
        o[0] = _I32((tmp10 + tmp11) * (1 << PASS1_BITS))
        o[4] = _I32((tmp10 - tmp11) * (1 << PASS1_BITS))
    else:
        o[0] = _descale(tmp10 + tmp11, even_shift)
        o[4] = _descale(tmp10 - tmp11, even_shift)
    z1 = _I32((tmp12 + tmp13) * _F["F0_541196100"])
    o[2] = _descale(z1 + _I32(tmp13 * _F["F0_765366865"]), out_round)
    o[6] = _descale(z1 + _I32(tmp12 * -_F["F1_847759065"]), out_round)
    z1 = tmp4 + tmp7
    z2 = tmp5 + tmp6
    z3 = tmp4 + tmp6
    z4 = tmp5 + tmp7
    z5 = _I32((z3 + z4) * _F["F1_175875602"])
    o4 = _I32(tmp4 * _F["F0_298631336"])
    o5 = _I32(tmp5 * _F["F2_053119869"])
    o6 = _I32(tmp6 * _F["F3_072711026"])
    o7 = _I32(tmp7 * _F["F1_501321110"])
    z1 = _I32(z1 * -_F["F0_899976223"])
    z2 = _I32(z2 * -_F["F2_562915447"])
    z3 = _I32(_I32(z3 * -_F["F1_961570560"]) + z5)
    z4 = _I32(_I32(z4 * -_F["F0_390180644"]) + z5)
    o[7] = _descale(_I32(o4 + z1 + z3), out_round)
    o[5] = _descale(_I32(o5 + z2 + z4), out_round)
    o[3] = _descale(_I32(o6 + z2 + z3), out_round)
    o[1] = _descale(_I32(o7 + z1 + z4), out_round)
    return o


def compress_block_ref(src8, codec, qscale=8, dc_prec=0, quality=50,
                       is_chroma=False):
    """src8: (8,8) uint8 -> (8,8) uint8, literal pipeline."""
    level = 128 if codec == "jpeg" else 0
    blk = (src8.astype(np.int64) - level)
    # fdct rows
    for r in range(8):
        t = [blk[r, c] for c in range(8)]
        o = _fdct1d(t, CONST_BITS - PASS1_BITS, -1)
        for c in range(8):
            blk[r, c] = _I16(o[c])
    for c in range(8):
        t = [blk[r, c] for r in range(8)]
        o = _fdct1d(t, CONST_BITS + PASS1_BITS, PASS1_BITS)
        for r in range(8):
            blk[r, c] = _I16(o[r])

    f = blk.reshape(64)
    if codec == "mpeg2":
        qscale2 = qscale << 1
        qmat = (2 << QMAT_SHIFT) // (qscale2 * MPEG_INTRA)
        deq = qscale2 * MPEG_INTRA
        dc_scale = 8 >> dc_prec
        dc_q = dc_scale << 3
        v = int(f[0]) + (dc_q >> 1)
        f[0] = int(v / dc_q)  # trunc toward zero
        for i in range(1, 64):
            level_q = int(f[i]) * int(qmat[i])
            if ((level_q + MPEG_THRESH1) & 0xFFFFFFFFFFFFFFFF) > MPEG_THRESH2:
                f[i] = ((MPEG_BIAS + level_q) >> QMAT_SHIFT) if level_q > 0 \
                    else -((MPEG_BIAS - level_q) >> QMAT_SHIFT)
            else:
                f[i] = 0
        f[0] = _I16(_I32(f[0] * dc_scale))
        for i in range(1, 64):
            lv = int(f[i])
            if lv:
                s = 1 if lv > 0 else -1
                f[i] = _I16(s * (_I32(abs(lv) * int(deq[i])) >> 4))
    else:
        base = JPEG_CHROMA if is_chroma else JPEG_LUMA
        scale = 5000 // quality if quality < 50 else 200 - quality * 2
        qtab = np.clip((base * scale + 50) // 100, 1, 255)
        jqmat = (1 << QMAT_SHIFT) // (8 * qtab)
        for i in range(64):
            lv = int(f[i]) * int(jqmat[i])
            if lv > 0:
                f[i] = (JPEG_BIAS + lv) >> QMAT_SHIFT
            elif lv < 0:
                f[i] = -((JPEG_BIAS - lv) >> QMAT_SHIFT)
            else:
                f[i] = 0
        for i in range(64):
            f[i] = _I16(_I32(int(f[i]) * int(qtab[i])))

    blk = f.reshape(8, 8)
    # idct rows
    for r in range(8):
        m = blk[r]
        if (m[1] | m[2] | m[3] | m[4] | m[5] | m[6] | m[7]) == 0:
            blk[r, :] = _I16(_I32(m[0] * 8))
            continue
        a0 = _I32(W4 * m[0] + (1 << (ROW_SHIFT - 1)))
        a1 = a2 = a3 = a0
        a0 = _I32(a0 + W2 * m[2]); a1 = _I32(a1 + W6 * m[2])
        a2 = _I32(a2 - W6 * m[2]); a3 = _I32(a3 - W2 * m[2])
        b0 = _I32(W1 * m[1] + W3 * m[3]); b1 = _I32(W3 * m[1] - W7 * m[3])
        b2 = _I32(W5 * m[1] - W1 * m[3]); b3 = _I32(W7 * m[1] - W5 * m[3])
        if (m[4] | m[5] | m[6] | m[7]) != 0:
            a0 = _I32(a0 + W4 * m[4] + W6 * m[6])
            a1 = _I32(a1 - W4 * m[4] - W2 * m[6])
            a2 = _I32(a2 - W4 * m[4] + W2 * m[6])
            a3 = _I32(a3 + W4 * m[4] - W6 * m[6])
            b0 = _I32(b0 + W5 * m[5] + W7 * m[7])
            b1 = _I32(b1 - W1 * m[5] - W5 * m[7])
            b2 = _I32(b2 + W7 * m[5] + W3 * m[7])
            b3 = _I32(b3 + W3 * m[5] - W1 * m[7])
        blk[r, 0] = _I16(a0 + b0 >> ROW_SHIFT) if False else _I16(_I32(a0 + b0) >> ROW_SHIFT)
        blk[r, 7] = _I16(_I32(a0 - b0) >> ROW_SHIFT)
        blk[r, 1] = _I16(_I32(a1 + b1) >> ROW_SHIFT)
        blk[r, 6] = _I16(_I32(a1 - b1) >> ROW_SHIFT)
        blk[r, 2] = _I16(_I32(a2 + b2) >> ROW_SHIFT)
        blk[r, 5] = _I16(_I32(a2 - b2) >> ROW_SHIFT)
        blk[r, 3] = _I16(_I32(a3 + b3) >> ROW_SHIFT)
        blk[r, 4] = _I16(_I32(a3 - b3) >> ROW_SHIFT)

    out = np.zeros((8, 8), np.uint8)
    off = 128 if codec == "jpeg" else 0
    for c in range(8):
        m = blk[:, c]
        a0 = _I32(W4 * (m[0] + COL_DC_BIAS))
        a1 = a2 = a3 = a0
        a0 = _I32(a0 + W2 * m[2]); a1 = _I32(a1 + W6 * m[2])
        a2 = _I32(a2 - W6 * m[2]); a3 = _I32(a3 - W2 * m[2])
        b0 = _I32(W1 * m[1] + W3 * m[3]); b1 = _I32(W3 * m[1] - W7 * m[3])
        b2 = _I32(W5 * m[1] - W1 * m[3]); b3 = _I32(W7 * m[1] - W5 * m[3])
        a0 = _I32(a0 + W4 * m[4] + W6 * m[6])
        a1 = _I32(a1 - W4 * m[4] - W2 * m[6])
        a2 = _I32(a2 - W4 * m[4] + W2 * m[6])
        a3 = _I32(a3 + W4 * m[4] - W6 * m[6])
        b0 = _I32(b0 + W5 * m[5] + W7 * m[7])
        b1 = _I32(b1 - W1 * m[5] - W5 * m[7])
        b2 = _I32(b2 + W7 * m[5] + W3 * m[7])
        b3 = _I32(b3 + W3 * m[5] - W1 * m[7])
        vals = [
            (a0 + b0), (a1 + b1), (a2 + b2), (a3 + b3),
            (a3 - b3), (a2 - b2), (a1 - b1), (a0 - b0),
        ]
        for r in range(8):
            out[r, c] = min(max((_I32(vals[r]) >> COL_SHIFT) + off, 0), 255)
    return out
