"""PlaneAverage: per-plane average with exclude list (+ optional diff vs a
second clip).

Reference: src/filters/planeaverage.zig + src/vapoursynth/planeaverage.zig.
Integer planes accumulate exactly (f64 here — every sum < 2^53 — where the
reference uses u64) and normalize by ``2^bits - 1``; float planes average in
f64.  ``exclude`` values are dropped from the average (but not from the diff
denominator).  Results are frame props ``{prop}Avg`` / ``{prop}Diff`` on a
copy of clipa, one value per processed plane; default planes = [0].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.clip import Clip
from ..core.format import SampleType
from ..core.params import VSZipError, compare_clips, parse_planes, require

FILTER_NAME = "PlaneAverage"


@partial(jax.jit, static_argnums=(2, 3))
def _avg_plane(x, exclude_vals, peak: float, is_int: bool):
    acc_dt = jnp.float64
    v = x.astype(acc_dt)
    if exclude_vals.shape[0]:
        # compare at i32/f32 width like the reference (no wrap-around matches)
        cmp = x.astype(jnp.int32) if is_int else x.astype(jnp.float32)
        keep = jnp.ones(x.shape, bool)
        for i in range(exclude_vals.shape[0]):
            keep &= cmp != exclude_vals[i].astype(cmp.dtype)
        total = jnp.sum(keep.astype(acc_dt), axis=(1, 2))
        acc = jnp.sum(jnp.where(keep, v, 0), axis=(1, 2))
    else:
        total = jnp.full((x.shape[0],), float(x.shape[1] * x.shape[2]), acc_dt)
        acc = jnp.sum(v, axis=(1, 2))
    avg = jnp.where(total == 0, 0.0, acc / jnp.maximum(total, 1))
    if is_int:
        avg = avg / peak
    return avg


@partial(jax.jit, static_argnums=(2, 3))
def _diff_plane(x, ref, peak: float, is_int: bool):
    if is_int:
        d = jnp.abs(x.astype(jnp.int32) - ref.astype(jnp.int32)).astype(jnp.float64)
    else:
        d = jnp.abs(x.astype(jnp.float32) - ref.astype(jnp.float32)).astype(jnp.float64)
    total = float(x.shape[1] * x.shape[2])
    diff = jnp.sum(d, axis=(1, 2)) / total
    if is_int:
        diff = diff / peak
    return diff


def plane_average(clipa: Clip, exclude=None, clipb: Clip | None = None,
                  planes=None, prop: str = "psm") -> Clip:
    fmt = clipa.format
    is_int = fmt.sample_type is SampleType.INTEGER
    if clipb is not None:
        compare_clips([clipa, clipb], FILTER_NAME, same_len=False, bigger_than=True)
    process = parse_planes(planes, fmt.num_planes, FILTER_NAME, default_all=False)
    if planes is None:
        process = [True] + [False] * (fmt.num_planes - 1)

    if exclude is not None and is_int and fmt.bits_per_sample == 32:
        raise VSZipError(
            f"{FILTER_NAME}: exclude is not supported for 32-bit integer clips."
        )
    ex = jnp.asarray(
        [float(e) for e in (exclude or [])] if not is_int
        else [int(e) for e in (exclude or [])],
        dtype=jnp.float32 if not is_int else jnp.int64,
    )
    peak = float((1 << fmt.bits_per_sample) - 1) if is_int else 1.0

    avgs, diffs = [], []
    n = clipa.num_frames
    for p in range(fmt.num_planes):
        if not process[p]:
            continue
        avgs.append(_avg_plane(clipa.planes[p], ex, peak, is_int))
        if clipb is not None:
            diffs.append(_diff_plane(clipa.planes[p], clipb.planes[p][:n], peak, is_int))

    props = {f"{prop}Avg": jnp.stack(avgs, axis=-1)}
    if clipb is not None:
        props[f"{prop}Diff"] = jnp.stack(diffs, axis=-1)
    return clipa.with_props(**props)
