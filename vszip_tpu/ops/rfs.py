"""RFS: replace-frame-selector.

Reference: src/vapoursynth/rfs.zig — a boolean per-frame table selects clipb
over clipa; an optional ``planes`` subset restricts replacement to those
planes (the reference realizes this by ShufflePlanes-compositing clipb from
a/b planes at create time; here it's a per-plane select).  ``mismatch`` in
the reference switches the output to variable format — not representable in
batched plane tensors, so mismatched clips raise instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.clip import Clip
from ..core.params import VSZipError, parse_planes

FILTER_NAME = "RFS"


def rfs(clipa: Clip, clipb: Clip, frames=None, planes=None,
        mismatch: bool = False) -> Clip:
    if (clipa.width, clipa.height) != (clipb.width, clipb.height):
        if mismatch:
            _mismatch_unsupported()
        raise VSZipError(
            f"{FILTER_NAME}: Clip dimensions don't match, enable mismatch if "
            "you want variable format."
        )
    if clipa.format != clipb.format:
        if mismatch:
            _mismatch_unsupported()
        raise VSZipError(
            f"{FILTER_NAME}: Clip formats don't match, enable mismatch if "
            "you want variable format."
        )

    num_frames = clipa.num_frames
    replace = np.zeros(num_frames, bool)
    for f in frames or []:
        f = int(f)
        if f < 0:
            raise VSZipError(
                f"{FILTER_NAME}: frame index ({f}) must be non-negative."
            )
        if f >= num_frames:
            raise VSZipError(
                f"{FILTER_NAME}: frame index ({f}) > last frame index "
                f"({num_frames - 1})."
            )
        replace[f] = True

    if planes is not None:
        sel = parse_planes(planes, clipa.format.num_planes, FILTER_NAME)
    else:
        sel = [True] * clipa.format.num_planes

    rep = jnp.asarray(replace)
    out = []
    for p in range(clipa.format.num_planes):
        a = clipa.planes[p]
        if not sel[p]:
            out.append(a)
            continue
        b = clipb.planes[p][:num_frames]
        out.append(jnp.where(rep[:, None, None], b, a))
    return clipa.with_planes(out)


def _mismatch_unsupported():
    raise NotImplementedError(
        f"{FILTER_NAME}: mismatch=True (variable-format output) is not "
        "representable in batched plane tensors"
    )
