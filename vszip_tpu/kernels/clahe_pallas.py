"""Pallas TPU kernel for CLAHE's 8-bit lookup + bilinear blend stage.

Reference: src/filters/clahe.zig:176-282 (per-pixel bilinear interpolation
of the 4 neighboring tile LUTs).  The histogram/CDF stage stays in jnp
(tiny); this kernel replaces the per-pixel application, which as an XLA
select-chain split into dozens of kernels that re-read the whole padded
plane.

Layout: the plane is padded so rows/columns split into half-tile-shifted
cells (see ops/clahe.py); inside a cell the 4 neighbor-tile LUTs are fixed,
packed as one i32 per (cell, bin) in SMEM.  Because Mosaic block heights
must be 8-divisible, each cell-row band is padded to an 8-multiple height
in HBM (1080p's 135-row tiles become 136-row bands; the pad row computes
garbage that is sliced away).  The grid walks (frame, cell-row); per
column cell the kernel runs a 256-step select chain against the SMEM
scalars entirely in VMEM, unpacks the 4 byte planes, and blends with the
per-row / per-column fractions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIST = 256


def _clahe8_kernel(x_ref, tab_ref, ya_ref, xa_ref, o_ref, *, rx_n: int,
                   tile_w: int):
    ya = ya_ref[0, 0][:, None]  # (tile_h8, 1) f32
    for rx in range(rx_n):
        c0 = rx * tile_w
        sub = x_ref[0, :, c0 : c0 + tile_w].astype(jnp.int32)

        # nibble-split mux: a 256-way mux needs 255 two-way selects however
        # it is shaped, but keying the selects off BITS of the pixel value
        # drops the old chain's 256 per-bin compares.  A fully unrolled
        # 8-level bit tree compiles for minutes in Mosaic (255 live
        # band-sized wheres), so split it: fori over the high nibble
        # (dynamic SMEM scalar reads), per group an unrolled 15-select mux
        # tree over the low-nibble bits — 16*(15+2) ~ 272 VPU ops/pixel vs
        # ~512 for the cmp+sel chain, with a ~17-where loop body that
        # compiles in seconds.
        lo4 = sub & jnp.int32(15)
        hi4 = sub >> 4
        bits = [((lo4 >> b) & jnp.int32(1)) == 1 for b in range(4)]

        def body(g, acc, rx=rx, hi4=hi4, bits=bits):
            base = rx * HIST + g * jnp.int32(16)

            def node(off, span):
                if span == 1:
                    return tab_ref[0, 0, base + off]
                half = span // 2
                return jnp.where(bits[half.bit_length() - 1],
                                 node(off + half, half), node(off, half))

            return jnp.where(hi4 == g, node(0, 16), acc)

        acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(16), body,
            jnp.zeros(sub.shape, jnp.int32))
        l0 = (acc & jnp.int32(255)).astype(jnp.float32)
        l1 = ((acc >> 8) & jnp.int32(255)).astype(jnp.float32)
        l2 = ((acc >> 16) & jnp.int32(255)).astype(jnp.float32)
        l3 = ((acc >> 24) & jnp.int32(255)).astype(jnp.float32)
        xa = xa_ref[0, 0, c0 : c0 + tile_w][None, :]
        res = (l0 * (1.0 - xa) + l1 * xa) * (1.0 - ya) + (
            l2 * (1.0 - xa) + l3 * xa
        ) * ya
        out = jnp.trunc(res + jnp.float32(0.5)).astype(jnp.int32)
        o_ref[0, :, c0 : c0 + tile_w] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5))
def clahe8_lookup_pallas(xp2, tab32, ya, xa, tile_h: int, tile_w: int):
    """xp2 (N, hp, wp) u8 padded plane (wp = rx_n*tile_w, hp = ry_n*tile_h);
    tab32 (N, ry_n, rx_n*256) i32 packed neighbor LUTs; ya (ry_n, tile_h)
    f32 row fractions; xa (1, wp) f32 column fractions.  Returns
    (N, hp, wp) u8."""
    n, hp, wp = xp2.shape
    ry_n = hp // tile_h
    rx_n = wp // tile_w
    th8 = -(tile_h // -8) * 8
    lpad = (-wp) % 128
    wpv = wp + lpad

    xb = xp2.reshape(n, ry_n, tile_h, wp)
    if th8 > tile_h:
        xb = jnp.concatenate(
            [xb, jnp.zeros((n, ry_n, th8 - tile_h, wp), xb.dtype)], axis=2)
        ya = jnp.concatenate(
            [ya, jnp.zeros((ry_n, th8 - tile_h), ya.dtype)], axis=1)
    xb = xb.reshape(n, ry_n * th8, wp)
    if lpad:
        xb = jnp.concatenate(
            [xb, jnp.zeros((n, ry_n * th8, lpad), xb.dtype)], axis=2)
        xa = jnp.concatenate([xa, jnp.zeros((1, lpad), xa.dtype)], axis=1)

    kern = functools.partial(_clahe8_kernel, rx_n=rx_n, tile_w=tile_w)
    zero = np.int32(0)
    # SMEM blocks need an 8-divisible sublane dim: place each band's table
    # in row 0 of an 8-row group
    tab8 = jnp.zeros((n, ry_n * 8, rx_n * HIST), jnp.int32)
    tab8 = tab8.at[:, ::8, :].set(tab32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, ry_n * th8, wpv), xp2.dtype),
        grid=(n, ry_n),
        in_specs=[
            pl.BlockSpec((1, th8, wpv), lambda i, j: (i, j, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, rx_n * HIST), lambda i, j: (i, j, zero),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, th8), lambda i, j: (j, zero, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wpv), lambda i, j: (zero, zero, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th8, wpv), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xb, tab8, ya[:, None], xa[None])
    out = out[:, :, :wp].reshape(n, ry_n, th8, wp)[:, :, :tile_h]
    return out.reshape(n, hp, wp)
