"""Compress: MPEG-2 / JPEG intra-block compression-artifact simulator.

Reference: src/filters/compress.zig + src/vapoursynth/compress.zig — an
8-bit 8x8 pipeline of forward integer DCT (the classic JPEG "islow" fixed
point transform, CONST_BITS=13/PASS1_BITS=4), intra quantize/dequantize
(MPEG-2 deadzone or JPEG symmetric rounding), and the FFmpeg-style integer
inverse DCT (ROW_SHIFT=11/COL_SHIFT=20 with the DC-only row fast path).
All arithmetic is wrapping i32 (i64 for the quantizer products) with i16
truncation between stages, so results are bit-exact to the reference.

TPU mapping: every 8x8 block is processed in parallel — planes reshape to a
(blocks, 8, 8) batch and each of the 1-D transforms becomes vectorized
arithmetic over the batch.  The reference's data-dependent fast paths that
change results (the DC-only row path) become masked selects; those that
don't (skipping multiplications by zero coefficients) are simply evaluated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.clip import Clip
from ..core.format import ColorFamily, SampleType
from ..core.params import VSZipError, get_value, require

FILTER_NAME = "Compress"

# standard tables (MPEG-1/2 default intra matrix; JPEG Annex K quant tables)
MPEG_INTRA = np.array([
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83,
], np.int64)

JPEG_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)

JPEG_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)

# islow FDCT constants
_F = dict(
    F0_298631336=2446, F0_390180644=3196, F0_541196100=4433,
    F0_765366865=6270, F0_899976223=7373, F1_175875602=9633,
    F1_501321110=12299, F1_847759065=15137, F1_961570560=16069,
    F2_053119869=16819, F2_562915447=20995, F3_072711026=25172,
)
CONST_BITS, PASS1_BITS = 13, 4
QMAT_SHIFT = 21
INTRA_QUANT_BIAS = 3 << (8 - 3)
MPEG_BIAS = INTRA_QUANT_BIAS * (1 << (QMAT_SHIFT - 8))
MPEG_THRESH1 = (1 << QMAT_SHIFT) - MPEG_BIAS - 1
MPEG_THRESH2 = MPEG_THRESH1 << 1
JPEG_BIAS = 1 << (QMAT_SHIFT - 1)
W1, W2, W3, W4, W5, W6, W7 = 22725, 21407, 19266, 16383, 12873, 8867, 4520
ROW_SHIFT, COL_SHIFT = 11, 20
COL_DC_BIAS = (1 << (COL_SHIFT - 1)) // W4


def _i16(x):
    """wrapping truncation to i16, kept in i32 lanes"""
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _descale(x, n: int):
    return (x + (1 << (n - 1))) >> n


def _fdct1d(t, out_round: int, even_shift: int):
    """8-point islow forward DCT stage; t is a list of 8 (B, 8) i32 arrays."""
    tmp0, tmp7 = t[0] + t[7], t[0] - t[7]
    tmp1, tmp6 = t[1] + t[6], t[1] - t[6]
    tmp2, tmp5 = t[2] + t[5], t[2] - t[5]
    tmp3, tmp4 = t[3] + t[4], t[3] - t[4]
    tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
    tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
    o = [None] * 8
    if even_shift < 0:
        o[0] = (tmp10 + tmp11) * (1 << PASS1_BITS)
        o[4] = (tmp10 - tmp11) * (1 << PASS1_BITS)
    else:
        o[0] = _descale(tmp10 + tmp11, even_shift)
        o[4] = _descale(tmp10 - tmp11, even_shift)
    z1 = (tmp12 + tmp13) * _F["F0_541196100"]
    o[2] = _descale(z1 + tmp13 * _F["F0_765366865"], out_round)
    o[6] = _descale(z1 + tmp12 * (-_F["F1_847759065"]), out_round)
    z1 = tmp4 + tmp7
    z2 = tmp5 + tmp6
    z3 = tmp4 + tmp6
    z4 = tmp5 + tmp7
    z5 = (z3 + z4) * _F["F1_175875602"]
    o4 = tmp4 * _F["F0_298631336"]
    o5 = tmp5 * _F["F2_053119869"]
    o6 = tmp6 * _F["F3_072711026"]
    o7 = tmp7 * _F["F1_501321110"]
    z1 = z1 * (-_F["F0_899976223"])
    z2 = z2 * (-_F["F2_562915447"])
    z3 = z3 * (-_F["F1_961570560"]) + z5
    z4 = z4 * (-_F["F0_390180644"]) + z5
    o[7] = _descale(o4 + z1 + z3, out_round)
    o[5] = _descale(o5 + z2 + z4, out_round)
    o[3] = _descale(o6 + z2 + z3, out_round)
    o[1] = _descale(o7 + z1 + z4, out_round)
    return o


def _fdct(blocks):
    """blocks: (B, 8, 8) i32 (values i16-range).  Two islow passes."""
    # rows
    t = [blocks[:, :, c] for c in range(8)]
    t = _fdct1d(t, CONST_BITS - PASS1_BITS, -1)
    blocks = _i16(jnp.stack(t, axis=2))
    # columns
    t = [blocks[:, r, :] for r in range(8)]
    t = _fdct1d(t, CONST_BITS + PASS1_BITS, PASS1_BITS)
    return _i16(jnp.stack(t, axis=1))


def _idct(blocks):
    """FFmpeg simple integer IDCT; blocks (B, 8, 8) i32 (i16-range).
    Returns i32 pre-offset values after the column pass >> COL_SHIFT."""
    # --- row pass with DC-only fast path ---
    c = [blocks[:, :, i] for i in range(8)]
    ac_zero = (c[1] | c[2] | c[3] | c[4] | c[5] | c[6] | c[7]) == 0
    dc = _i16(c[0] * 8)
    a0 = W4 * c[0] + (1 << (ROW_SHIFT - 1))
    a1, a2, a3 = a0, a0, a0
    a0 = a0 + W2 * c[2]
    a1 = a1 + W6 * c[2]
    a2 = a2 - W6 * c[2]
    a3 = a3 - W2 * c[2]
    b0 = W1 * c[1] + W3 * c[3]
    b1 = W3 * c[1] - W7 * c[3]
    b2 = W5 * c[1] - W1 * c[3]
    b3 = W7 * c[1] - W5 * c[3]
    a0 = a0 + W4 * c[4] + W6 * c[6]
    a1 = a1 - W4 * c[4] - W2 * c[6]
    a2 = a2 - W4 * c[4] + W2 * c[6]
    a3 = a3 + W4 * c[4] - W6 * c[6]
    b0 = b0 + W5 * c[5] + W7 * c[7]
    b1 = b1 - W1 * c[5] - W5 * c[7]
    b2 = b2 + W7 * c[5] + W3 * c[7]
    b3 = b3 + W3 * c[5] - W1 * c[7]
    rows = [
        _i16((a0 + b0) >> ROW_SHIFT), _i16((a1 + b1) >> ROW_SHIFT),
        _i16((a2 + b2) >> ROW_SHIFT), _i16((a3 + b3) >> ROW_SHIFT),
        _i16((a3 - b3) >> ROW_SHIFT), _i16((a2 - b2) >> ROW_SHIFT),
        _i16((a1 - b1) >> ROW_SHIFT), _i16((a0 - b0) >> ROW_SHIFT),
    ]
    out = jnp.stack(rows, axis=2)
    out = jnp.where(ac_zero[:, :, None], dc[:, :, None], out)

    # --- column pass ---
    r = [out[:, i, :] for i in range(8)]
    a0 = W4 * (r[0] + COL_DC_BIAS)
    a1, a2, a3 = a0, a0, a0
    a0 = a0 + W2 * r[2]
    a1 = a1 + W6 * r[2]
    a2 = a2 - W6 * r[2]
    a3 = a3 - W2 * r[2]
    b0 = W1 * r[1] + W3 * r[3]
    b1 = W3 * r[1] - W7 * r[3]
    b2 = W5 * r[1] - W1 * r[3]
    b3 = W7 * r[1] - W5 * r[3]
    a0 = a0 + W4 * r[4] + W6 * r[6]
    a1 = a1 - W4 * r[4] - W2 * r[6]
    a2 = a2 - W4 * r[4] + W2 * r[6]
    a3 = a3 + W4 * r[4] - W6 * r[6]
    b0 = b0 + W5 * r[5] + W7 * r[7]
    b1 = b1 - W1 * r[5] - W5 * r[7]
    b2 = b2 + W7 * r[5] + W3 * r[7]
    b3 = b3 + W3 * r[5] - W1 * r[7]
    cols = [
        (a0 + b0) >> COL_SHIFT, (a1 + b1) >> COL_SHIFT,
        (a2 + b2) >> COL_SHIFT, (a3 + b3) >> COL_SHIFT,
        (a3 - b3) >> COL_SHIFT, (a2 - b2) >> COL_SHIFT,
        (a1 - b1) >> COL_SHIFT, (a0 - b0) >> COL_SHIFT,
    ]
    return jnp.stack(cols, axis=1)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _compress_plane(x, codec: str, qscale: int, dc_prec: int, quality_chroma):
    """x: (N, H, W) uint8 padded to 8-multiples."""
    quality, is_chroma = quality_chroma
    n, h, w = x.shape
    level = 128 if codec == "jpeg" else 0
    blocks = (
        x.reshape(n, h // 8, 8, w // 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(-1, 8, 8)
        .astype(jnp.int32)
        - level
    )
    coeff = _fdct(blocks)

    flat = coeff.reshape(-1, 64).astype(jnp.int64)
    if codec == "mpeg2":
        qscale2 = qscale << 1
        qmat = ((2 << QMAT_SHIFT) // (qscale2 * MPEG_INTRA))
        deq = (qscale2 * MPEG_INTRA).astype(np.int32)
        dc_scale = 8 >> dc_prec
        dc_q = dc_scale << 3
        # DC
        dc_lv = (flat[:, 0] + (dc_q >> 1)).astype(jnp.int32)
        dc_out = jnp.sign(dc_lv) * (jnp.abs(dc_lv) // dc_q)  # trunc division
        # FFmpeg assumes positive DC; divTrunc matches for both signs
        lv = flat[:, 1:] * jnp.asarray(qmat[1:])
        inrange = (lv + MPEG_THRESH1).astype(jnp.uint64) > jnp.uint64(MPEG_THRESH2)
        q = jnp.where(
            lv > 0,
            (MPEG_BIAS + lv) >> QMAT_SHIFT,
            -((MPEG_BIAS - lv) >> QMAT_SHIFT),
        )
        ac = jnp.where(inrange, q, 0).astype(jnp.int32)
        # dequantize
        lvl = jnp.abs(ac)
        deq_ac = _i16(jnp.sign(ac) * ((lvl * jnp.asarray(deq[1:])) >> 4))
        deq_dc = _i16(dc_out * dc_scale)
        out = jnp.concatenate([deq_dc[:, None], deq_ac], axis=1)
    else:
        base = JPEG_CHROMA if is_chroma else JPEG_LUMA
        scale = 5000 // quality if quality < 50 else 200 - quality * 2
        qtab = np.clip((base * scale + 50) // 100, 1, 255)
        jqmat = (1 << QMAT_SHIFT) // (8 * qtab)
        lv = flat * jnp.asarray(jqmat)
        q = jnp.where(
            lv > 0,
            (JPEG_BIAS + lv) >> QMAT_SHIFT,
            jnp.where(lv < 0, -((JPEG_BIAS - lv) >> QMAT_SHIFT), 0),
        ).astype(jnp.int32)
        out = _i16(q * jnp.asarray(qtab.astype(np.int32)))

    pix = _idct(out.reshape(-1, 8, 8)) + level
    pix = jnp.clip(pix, 0, 255).astype(jnp.uint8)
    return (
        pix.reshape(n, h // 8, w // 8, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n, h, w)
    )


def compress(clip: Clip, codec: int = 0, quality: int = 50, qscale: int = 8,
             dc_prec: int = 0, chroma: bool = True) -> Clip:
    """vszip.Compress (reference src/vapoursynth/compress.zig): codec 0 =
    MPEG-2 intra (qscale 1..31, dc_prec 0..3), codec 1 = JPEG (quality
    1..100); chroma=False passes chroma planes through.  8-bit Gray/YUV."""
    fmt = clip.format
    require(
        fmt.sample_type is SampleType.INTEGER and fmt.bits_per_sample == 8
        and fmt.color_family is not ColorFamily.RGB,
        FILTER_NAME, "only 8-bit integer Gray or YUV formats are supported.",
    )
    if codec not in (0, 1):
        raise VSZipError(f"{FILTER_NAME}: codec must be 0 (mpeg2) or 1 (jpeg).")
    if codec == 0:
        if not (1 <= int(qscale) <= 31):
            raise VSZipError(f"{FILTER_NAME}: qscale must be between 1 and 31.")
        if not (0 <= int(dc_prec) <= 3):
            raise VSZipError(f"{FILTER_NAME}: dc_prec must be between 0 and 3.")
    else:
        if not (1 <= int(quality) <= 100):
            raise VSZipError(f"{FILTER_NAME}: quality must be between 1 and 100.")
    codec_name = "jpeg" if codec == 1 else "mpeg2"
    process = [True, bool(chroma), bool(chroma)]

    out = []
    for p, x in enumerate(clip.planes):
        if not process[p]:
            out.append(x)
            continue
        h, w = x.shape[1], x.shape[2]
        ph, pw = -h % 8, -w % 8
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw)), mode="edge")
        y = _compress_plane(xp, codec_name, int(qscale), int(dc_prec),
                            (int(quality), p > 0))
        out.append(y[:, :h, :w])
    return clip.with_planes(out)
