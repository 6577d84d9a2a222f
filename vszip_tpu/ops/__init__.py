"""Filter ops: one module per reference filter (reference src/vszip.zig:38-223)."""

from .boxblur import boxblur

__all__ = ["boxblur"]
