"""clip_tpu: a TPU-native quantized CLIP inference engine (JAX/XLA/Pallas).

A from-scratch reimplementation of everything monatis/clip.cpp offers — GGUF
checkpoints, q4/q5/q8 block-quantized weights, tokenizer, PIL-parity
preprocessing, text/vision towers, zero-shot utilities, quantizer, converter,
CLIs — redesigned for TPUs: XLA-compiled towers with fused dequantization,
batched MXU-friendly preprocessing, and pjit sharding over device meshes.
"""

__version__ = "0.1.0"

from .engine import ClipEngine, similarity_score, softmax_with_sorting
from .gguf import GGMLType, GGUFReader, GGUFWriter
from .models.config import ClipConfig, TextConfig, VisionConfig
from .preprocess import load_image, preprocess, preprocess_batch
from .quantize import quantize_model
from .tokenizer import ClipTokenizer

__all__ = [
    "ClipEngine",
    "ClipConfig",
    "ClipTokenizer",
    "GGMLType",
    "GGUFReader",
    "GGUFWriter",
    "TextConfig",
    "VisionConfig",
    "load_image",
    "preprocess",
    "preprocess_batch",
    "quantize_model",
    "similarity_score",
    "softmax_with_sorting",
    "__version__",
]
