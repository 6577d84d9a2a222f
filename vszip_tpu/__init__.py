"""vszip_tpu: a TPU-native rebuild of the vszip frame-processing toolkit.

The reference (dnjulek/vapoursynth-zip) is a VapourSynth plugin of 23
hand-SIMD Zig filters scheduled per-frame by the VS core thread pool.  This
package re-designs the same surface TPU-first:

* frames are batched ``(N, H, W)`` plane tensors in HBM (`Clip`);
* every filter is a pure jitted ``Clip -> Clip`` (or ``-> metrics``) op,
  monomorphized by jit static args where the reference used comptime;
* hot kernels are Pallas TPU kernels (vszip_tpu.kernels);
* frame-level parallelism is the batch axis; multi-chip scaling shards the
  batch over a ``jax.sharding.Mesh`` (vszip_tpu.parallel).

64-bit arithmetic is required for the bit-exact integer fixed-point paths
(e.g. BoxBlur's ``(sum*inv + 2^31) >> 16`` chain), so x64 is enabled at
import.  All kernels request explicit dtypes; nothing relies on defaults.
"""

import sys as _sys

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Mosaic lowering of large kernels recurses deeper than CPython's default
# 1000-frame limit (finite recursion over long op chains).
if _sys.getrecursionlimit() < 10000:
    _sys.setrecursionlimit(10000)

from .core.clip import Clip, VariableClip  # noqa: E402
from .core.format import (  # noqa: E402
    ColorFamily,
    ColorRange,
    SampleType,
    VideoFormat,
    get_format,
)
from .core.params import VSZipError  # noqa: E402
from .core.resample import (  # noqa: E402
    bit_depth,
    resize,
    srgb_to_linear,
    to_rgbs,
)
from .io import image_read  # noqa: E402
from .runtime.stream import (  # noqa: E402
    ArraySource,
    SyntheticSource,
    process_stream,
)
from .ops import *  # noqa: E402,F401,F403

__version__ = "0.1.0"
