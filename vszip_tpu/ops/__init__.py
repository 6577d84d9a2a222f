"""Filter ops: one module per reference filter (reference src/vszip.zig:38-223)."""

from .adaptive_binarize import adaptive_binarize
from .bilateral import bilateral
from .bilateral_dither import bilateral_dither
from .boxblur import boxblur
from .checkmate import checkmate
from .clahe import clahe
from .comb_mask import comb_mask
from .compress import compress
from .deband import deband
from .eedi3 import eedi3, eedi3h
from .comb_mask_mt import comb_mask_mt
from .colormap import colormap
from .limit_filter import limit_filter
from .mosquito_nr import mosquito_nr
from .limiter import limiter
from .packrgb import packrgb
from .planeaverage import plane_average
from .planeminmax import plane_minmax
from .rfs import rfs
from .ssimulacra2 import ssimulacra2
from .xpsnr import xpsnr

__all__ = [
    "adaptive_binarize",
    "bilateral",
    "bilateral_dither",
    "boxblur",
    "checkmate",
    "clahe",
    "comb_mask",
    "compress",
    "deband",
    "eedi3",
    "eedi3h",
    "comb_mask_mt",
    "colormap",
    "limit_filter",
    "mosquito_nr",
    "limiter",
    "packrgb",
    "plane_average",
    "plane_minmax",
    "rfs",
    "ssimulacra2",
    "xpsnr",
]
