from .clip import Clip
from .format import (
    ColorFamily,
    ColorRange,
    SampleType,
    VideoFormat,
    get_format,
)
from .params import (
    VSZipError,
    compare_clips,
    get_array,
    get_value,
    parse_planes,
    require,
    scale_value,
)

__all__ = [
    "Clip",
    "ColorFamily",
    "ColorRange",
    "SampleType",
    "VideoFormat",
    "get_format",
    "VSZipError",
    "compare_clips",
    "get_array",
    "get_value",
    "parse_planes",
    "require",
    "scale_value",
]
