"""HF Transformers CLIP -> GGUF converter.

Replaces the reference's offline sidecar
(/root/reference/models/convert_hf_to_gguf.py) using this package's own GGUF
writer instead of the ``gguf`` pip package.  Behavior parity:

* skips ``logit_scale`` and ``position_ids`` buffers;
* squeezes singleton dims (class_embedding becomes 1-D);
* stores 2-D ``*.weight`` tensors as f16 (unless ``use_f32``), 4-D conv
  weights always as f16, everything else f32;
* writes the same KV set (has_text/has_vision/use_gelu, per-tower hparams,
  token list, image mean/std) under the same keys;
* ``--text-only`` / ``--vision-only`` tower selection and mean/std overrides.
"""

from __future__ import annotations

import json
import os
import re
from typing import Mapping, Sequence

import numpy as np

from .gguf import GGUFWriter
from .gguf import constants as C

_SKIP = {
    "logit_scale",
    "text_model.embeddings.position_ids",
    "vision_model.embeddings.position_ids",
}

_LAYER_RE = re.compile(
    r"^(text|vision)_model\.encoder\.layers\.(\d+)\.(.+)$"
)

_LAYER_SUFFIX = {
    "self_attn.q_proj": "attn_q",
    "self_attn.k_proj": "attn_k",
    "self_attn.v_proj": "attn_v",
    "self_attn.out_proj": "attn_out",
    "layer_norm1": "ln1",
    "layer_norm2": "ln2",
    # historical swap preserved for checkpoint compatibility: fc1 -> ffn_down
    "mlp.fc1": "ffn_down",
    "mlp.fc2": "ffn_up",
}

_TOP_LEVEL = {
    "text_model.embeddings.token_embedding.weight": "t.token_embd.weight",
    "text_model.embeddings.position_embedding.weight": "t.position_embd.weight",
    "text_model.final_layer_norm.weight": "t.post_ln.weight",
    "text_model.final_layer_norm.bias": "t.post_ln.bias",
    "text_projection.weight": "text_projection.weight",
    "vision_model.embeddings.class_embedding": "v.class_embd",
    "vision_model.embeddings.patch_embedding.weight": "v.patch_embd.weight",
    "vision_model.embeddings.position_embedding.weight": "v.position_embd.weight",
    "vision_model.pre_layrnorm.weight": "v.pre_ln.weight",   # HF's typo
    "vision_model.pre_layrnorm.bias": "v.pre_ln.bias",
    "vision_model.pre_layernorm.weight": "v.pre_ln.weight",
    "vision_model.pre_layernorm.bias": "v.pre_ln.bias",
    "vision_model.post_layernorm.weight": "v.post_ln.weight",
    "vision_model.post_layernorm.bias": "v.post_ln.bias",
    "visual_projection.weight": "visual_projection.weight",
}


def rename_tensor(name: str) -> str:
    """HF state-dict name -> GGUF tensor name (same results as the rename
    chain at /root/reference/models/convert_hf_to_gguf.py:31-35)."""
    if name in _TOP_LEVEL:
        return _TOP_LEVEL[name]
    m = _LAYER_RE.match(name)
    if m:
        tower = "t" if m.group(1) == "text" else "v"
        rest = m.group(2), m.group(3)
        idx = int(rest[0])
        suffix = rest[1]
        for hf, gg in _LAYER_SUFFIX.items():
            if suffix.startswith(hf + "."):
                kind = suffix[len(hf) + 1 :]
                return f"{tower}.blk.{idx}.{gg}.{kind}"
    raise KeyError(f"don't know how to rename HF tensor {name!r}")


def convert_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    *,
    text_only: bool = False,
    vision_only: bool = False,
    use_f32: bool = False,
) -> dict[str, np.ndarray]:
    """Rename + dtype-select tensors.  Values may be torch tensors or numpy."""
    out: dict[str, np.ndarray] = {}
    for name, t in state_dict.items():
        if name in _SKIP:
            continue
        if text_only and name.startswith("v"):
            continue
        if vision_only and name.startswith("t"):
            continue
        data = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        data = data.squeeze()
        new_name = rename_tensor(name)
        if data.ndim == 4:
            data = data.astype(np.float16)  # conv weights always f16
        elif not use_f32 and new_name.endswith(".weight") and data.ndim == 2:
            data = data.astype(np.float16)
        else:
            data = data.astype(np.float32)
        out[new_name] = data
    return out


def write_clip_gguf(
    path: str,
    tensors: Mapping[str, np.ndarray],
    *,
    text_config: Mapping | None,
    vision_config: Mapping | None,
    tokens: Sequence[str] | None,
    projection_dim: int,
    use_gelu: bool,
    image_mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
    image_std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
    name: str = "",
    ftype: int = 1,
    extra_quantized: Mapping[str, tuple] | None = None,
) -> str:
    """Assemble and write a clip.cpp-compatible GGUF checkpoint.

    ``extra_quantized`` maps tensor name -> (shape, GGMLType, packed blocks)
    for pre-quantized payloads (used by the synthetic-checkpoint factory).
    """
    w = GGUFWriter(path)
    has_text = text_config is not None
    has_vision = vision_config is not None
    w.add_bool(C.KEY_HAS_TEXT_ENC, has_text)
    w.add_bool(C.KEY_HAS_VIS_ENC, has_vision)
    w.add_uint32(C.KEY_FTYPE, ftype)
    if name:
        w.add_string(C.KEY_NAME, name)
    if has_text and has_vision:
        desc = "two-tower CLIP model"
    elif has_text:
        desc = "text-only CLIP model"
    else:
        desc = "vision-only CLIP model"
    w.add_string(C.KEY_DESCRIPTION, desc)

    if has_text:
        tc = text_config
        w.add_uint32(C.KEY_N_POSITIONS, tc["max_position_embeddings"])
        w.add_uint32(C.KEY_N_EMBD.format(tower="text"), tc["hidden_size"])
        w.add_uint32(C.KEY_N_FF.format(tower="text"), tc["intermediate_size"])
        w.add_uint32(C.KEY_PROJ_DIM.format(tower="text"), tc.get("projection_dim", projection_dim))
        w.add_uint32(C.KEY_N_HEAD.format(tower="text"), tc["num_attention_heads"])
        w.add_float32(C.KEY_LAYER_NORM_EPS.format(tower="text"), tc["layer_norm_eps"])
        w.add_uint32(C.KEY_N_BLOCK.format(tower="text"), tc["num_hidden_layers"])
        if tokens is None:
            raise ValueError("tokens list required for a text tower")
        w.add_array_str(C.KEY_TOKENS, tokens)

    if has_vision:
        vc = vision_config
        w.add_uint32(C.KEY_IMAGE_SIZE, vc["image_size"])
        w.add_uint32(C.KEY_PATCH_SIZE, vc["patch_size"])
        w.add_uint32(C.KEY_N_EMBD.format(tower="vision"), vc["hidden_size"])
        w.add_uint32(C.KEY_N_FF.format(tower="vision"), vc["intermediate_size"])
        w.add_uint32(C.KEY_PROJ_DIM.format(tower="vision"), vc.get("projection_dim", projection_dim))
        w.add_uint32(C.KEY_N_HEAD.format(tower="vision"), vc["num_attention_heads"])
        w.add_float32(C.KEY_LAYER_NORM_EPS.format(tower="vision"), vc["layer_norm_eps"])
        w.add_uint32(C.KEY_N_BLOCK.format(tower="vision"), vc["num_hidden_layers"])
        w.add_array_f32(C.KEY_IMAGE_MEAN, image_mean)
        w.add_array_f32(C.KEY_IMAGE_STD, image_std)

    w.add_bool(C.KEY_USE_GELU, use_gelu)

    for tname, data in tensors.items():
        w.add_tensor(tname, data)
    for tname, (shape, qtype, packed) in (extra_quantized or {}).items():
        w.add_quantized_tensor(tname, shape, qtype, packed)
    return w.write()


def convert_hf_clip(
    model,
    tokens: Sequence[str] | None,
    out_path: str,
    *,
    text_only: bool = False,
    vision_only: bool = False,
    use_f32: bool = False,
    image_mean: Sequence[float] | None = None,
    image_std: Sequence[float] | None = None,
    name: str = "",
) -> str:
    """Convert an in-memory ``transformers.CLIPModel`` to GGUF."""
    config = model.config
    tensors = convert_state_dict(
        model.state_dict(), text_only=text_only, vision_only=vision_only, use_f32=use_f32
    )
    vcfg = config.vision_config.to_dict()
    tcfg = config.text_config.to_dict()
    # the projection weights come from the top-level CLIPConfig; tower-config
    # defaults (e.g. CLIPVisionConfig's 512) don't describe the weights
    vcfg["projection_dim"] = config.projection_dim
    tcfg["projection_dim"] = config.projection_dim
    use_gelu = vcfg.get("hidden_act", "quick_gelu") == "gelu"
    return write_clip_gguf(
        out_path,
        tensors,
        text_config=None if vision_only else tcfg,
        vision_config=None if text_only else vcfg,
        tokens=None if vision_only else list(tokens or ()),
        projection_dim=config.projection_dim,
        use_gelu=use_gelu,
        image_mean=image_mean or (0.48145466, 0.4578275, 0.40821073),
        image_std=image_std or (0.26862954, 0.26130258, 0.27577711),
        name=name,
        ftype=0 if use_f32 else 1,
    )


def convert_hf_dir(
    model_dir: str,
    output_dir: str | None = None,
    *,
    text_only: bool = False,
    vision_only: bool = False,
    use_f32: bool = False,
    image_mean: Sequence[float] | None = None,
    image_std: Sequence[float] | None = None,
) -> str:
    """Directory-based conversion mirroring the reference CLI
    (vocab.json + config.json + weights in ``model_dir``)."""
    from transformers import CLIPModel, CLIPProcessor

    with open(os.path.join(model_dir, "vocab.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    tokens = [tok for tok, _ in sorted(vocab.items(), key=lambda kv: kv[1])]

    model = CLIPModel.from_pretrained(model_dir)
    if image_mean is None or image_std is None:
        try:
            proc = CLIPProcessor.from_pretrained(model_dir)
            image_mean = image_mean or proc.image_processor.image_mean
            image_std = image_std or proc.image_processor.image_std
        except Exception:
            pass

    output_dir = output_dir or model_dir
    os.makedirs(output_dir, exist_ok=True)
    prefix = os.path.basename(os.path.normpath(output_dir)).replace("ggml_", "")
    middle = "text-" if text_only else "vision-" if vision_only else ""
    ftype_str = "f32" if use_f32 else "f16"
    out_path = os.path.join(output_dir, f"{prefix}_ggml-{middle}model-{ftype_str}.gguf")
    name = getattr(model.config, "_name_or_path", "") or os.path.basename(model_dir)
    return convert_hf_clip(
        model,
        tokens,
        out_path,
        text_only=text_only,
        vision_only=vision_only,
        use_f32=use_f32,
        image_mean=image_mean,
        image_std=image_std,
        name=name,
    )
