from .config import ClipConfig, TextConfig, VisionConfig
from .params import load_params
from .text import encode_text
from .vision import encode_image

__all__ = [
    "ClipConfig",
    "TextConfig",
    "VisionConfig",
    "load_params",
    "encode_text",
    "encode_image",
]
