from .linear import get_default_backend, linear, qmatmul, set_default_backend
from .nn import gelu_quick, gelu_tanh, l2_normalize, layernorm, softmax
from .qtensor import QTensor, dequant, from_ggml_blocks, take_rows

__all__ = [
    "QTensor",
    "dequant",
    "from_ggml_blocks",
    "take_rows",
    "qmatmul",
    "linear",
    "set_default_backend",
    "get_default_backend",
    "gelu_quick",
    "gelu_tanh",
    "l2_normalize",
    "layernorm",
    "softmax",
]
