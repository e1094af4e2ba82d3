"""Parameter pytrees loaded from GGUF checkpoints.

Layout decisions (TPU-first, not a port of the reference's per-tensor pointer
structs at /root/reference/clip.cpp:164-224):

* per-layer weights are **stacked along a leading layer axis** so the towers
  run as a single ``lax.scan`` — one compiled block regardless of depth;
* quantized 2-D weights stay packed as :class:`QTensor` leaves (weight-only
  quantization, activations in ``compute_dtype``), dequantized inside the
  matmul;
* biases / layernorm parameters are small and stay float32.

GGUF name → functional name: note the historical swap where ``ffn_down``
stores HF ``mlp.fc1`` (the *up* projection) and ``ffn_up`` stores ``mlp.fc2``
(see clip_tpu.gguf.constants.TN_FFN_DOWN).  We name by function: ``up_*`` maps
from ``ffn_down`` tensors, ``down_*`` from ``ffn_up``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..gguf import GGMLType, GGUFReader
from ..gguf import constants as C
from ..ops.qtensor import QTensor, from_ggml_blocks
from .config import ClipConfig

LAYER_TENSORS = {
    # param name -> (template, kind)   kind: "weight" | "bias"
    "ln1_w": (C.TN_LN_1, "weight"),
    "ln1_b": (C.TN_LN_1, "bias"),
    "o_w": (C.TN_ATTN_OUTPUT, "weight"),
    "o_b": (C.TN_ATTN_OUTPUT, "bias"),
    "ln2_w": (C.TN_LN_2, "weight"),
    "ln2_b": (C.TN_LN_2, "bias"),
    "up_w": (C.TN_FFN_DOWN, "weight"),    # GGUF "ffn_down" == HF fc1 == up-proj
    "up_b": (C.TN_FFN_DOWN, "bias"),
    "down_w": (C.TN_FFN_UP, "weight"),    # GGUF "ffn_up" == HF fc2 == down-proj
    "down_b": (C.TN_FFN_UP, "bias"),
}

# Q/K/V are fused into one [3H, H] projection at load time: one wide GEMM
# uses the MXU far better than three narrow N=H ones, and column-parallel TP
# sharding is preserved (heads stay contiguous within each third).
_QKV_TENSORS = (C.TN_ATTN_Q, C.TN_ATTN_K, C.TN_ATTN_V)

_QUANT_TYPES = {GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0}


def _load_tensor(reader: GGUFReader, name: str, keep_quantized: bool, dtype) -> Any:
    """Load one tensor: QTensor if block-quantized (and kept), else dense."""
    info = reader.tensors.get(name)
    if info is None:
        raise KeyError(f"missing tensor {name!r} in {reader.path}")
    if info.ggml_type in _QUANT_TYPES:
        if keep_quantized:
            return from_ggml_blocks(reader.tensor_data(name), info.shape, info.ggml_type)
        return reader.tensor_as_float(name).astype(dtype)
    arr = reader.tensor_as_float(name)
    # biases / norms stay f32; weights take the compute dtype
    if name.endswith(".bias") or ".ln" in name or "_ln" in name or name == C.TN_CLASS_EMBD:
        return arr
    return arr.astype(dtype)


def _stack(leaves: list[Any]) -> Any:
    if isinstance(leaves[0], QTensor):
        return QTensor(
            q=np.stack([l.q for l in leaves]),
            d=np.stack([l.d for l in leaves]),
            m=None if leaves[0].m is None else np.stack([l.m for l in leaves]),
            qtype=leaves[0].qtype,
            hb=None if leaves[0].hb is None else np.stack([l.hb for l in leaves]),
        )
    return np.stack(leaves)


def _concat_rows(leaves: list[Any]) -> Any:
    """Concatenate [N_i, K]-shaped tensors along N (QTensor-aware)."""
    if isinstance(leaves[0], QTensor):
        return QTensor(
            q=np.concatenate([l.q for l in leaves], axis=0),
            d=np.concatenate([l.d for l in leaves], axis=0),
            m=None if leaves[0].m is None
            else np.concatenate([l.m for l in leaves], axis=0),
            qtype=leaves[0].qtype,
            hb=None if leaves[0].hb is None
            else np.concatenate([l.hb for l in leaves], axis=0),
        )
    return np.concatenate(leaves, axis=0)


def _load_layers(reader, tower: str, n_layer: int, keep_quantized: bool, dtype):
    per_name: dict[str, list[Any]] = {k: [] for k in LAYER_TENSORS}
    per_name["qkv_w"] = []
    per_name["qkv_b"] = []
    for il in range(n_layer):
        for pname, (tmpl, kind) in LAYER_TENSORS.items():
            tname = tmpl.format(t=tower, i=il, w=kind)
            per_name[pname].append(_load_tensor(reader, tname, keep_quantized, dtype))
        per_name["qkv_w"].append(
            _concat_rows([
                _load_tensor(reader, t.format(t=tower, i=il, w="weight"), keep_quantized, dtype)
                for t in _QKV_TENSORS
            ])
        )
        per_name["qkv_b"].append(
            np.concatenate([
                _load_tensor(reader, t.format(t=tower, i=il, w="bias"), keep_quantized, dtype)
                for t in _QKV_TENSORS
            ])
        )
    return {k: _stack(v) for k, v in per_name.items()}


def load_text_params(
    reader: GGUFReader, cfg: ClipConfig, *, keep_quantized: bool = True, dtype=jnp.float32
) -> dict:
    t = "t"
    return {
        "tok_embd": _load_tensor(reader, C.TN_TOKEN_EMBD.format(t=t), keep_quantized, dtype),
        "pos_embd": _load_tensor(reader, C.TN_POS_EMBD.format(t=t), keep_quantized, dtype),
        "layers": _load_layers(reader, t, cfg.text.n_layer, keep_quantized, dtype),
        "post_ln_w": _load_tensor(reader, C.TN_LN_POST.format(t=t, w="weight"), keep_quantized, dtype),
        "post_ln_b": _load_tensor(reader, C.TN_LN_POST.format(t=t, w="bias"), keep_quantized, dtype),
        "proj": _load_tensor(reader, C.TN_TEXT_PROJ, keep_quantized, dtype),
    }


def load_vision_params(
    reader: GGUFReader, cfg: ClipConfig, *, keep_quantized: bool = True, dtype=jnp.float32
) -> dict:
    t = "v"
    return {
        "class_embd": _load_tensor(reader, C.TN_CLASS_EMBD, keep_quantized, dtype),
        "patch_embd": _load_tensor(reader, C.TN_PATCH_EMBD, keep_quantized, dtype),
        "pos_embd": _load_tensor(reader, C.TN_POS_EMBD.format(t=t), keep_quantized, dtype),
        "pre_ln_w": _load_tensor(reader, C.TN_LN_PRE.format(t=t, w="weight"), keep_quantized, dtype),
        "pre_ln_b": _load_tensor(reader, C.TN_LN_PRE.format(t=t, w="bias"), keep_quantized, dtype),
        "layers": _load_layers(reader, t, cfg.vision.n_layer, keep_quantized, dtype),
        "post_ln_w": _load_tensor(reader, C.TN_LN_POST.format(t=t, w="weight"), keep_quantized, dtype),
        "post_ln_b": _load_tensor(reader, C.TN_LN_POST.format(t=t, w="bias"), keep_quantized, dtype),
        "proj": _load_tensor(reader, C.TN_VIS_PROJ, keep_quantized, dtype),
    }


def load_params(
    reader: GGUFReader,
    cfg: ClipConfig | None = None,
    *,
    keep_quantized: bool = True,
    dtype=jnp.float32,
) -> dict:
    """Load all towers present in the checkpoint into one pytree."""
    cfg = cfg or ClipConfig.from_gguf(reader)
    params: dict = {}
    if cfg.has_text:
        params["text"] = load_text_params(reader, cfg, keep_quantized=keep_quantized, dtype=dtype)
    if cfg.has_vision:
        params["vision"] = load_vision_params(reader, cfg, keep_quantized=keep_quantized, dtype=dtype)
    return params
