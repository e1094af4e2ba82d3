"""Shared helpers: build a tiny random HF CLIPModel and its GGUF conversion.

Gives every numerics test a ground-truth oracle (HF Transformers' CLIP
implementation) without any network access.
"""

from __future__ import annotations

import numpy as np
import torch
from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

from clip_tpu.convert import convert_hf_clip

TINY_VOCAB = 99
TINY_EOS = 98
TINY_BOS = 97


def tiny_hf_clip(hidden_act: str = "quick_gelu", seed: int = 0) -> CLIPModel:
    text_cfg = CLIPTextConfig(
        vocab_size=TINY_VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        layer_norm_eps=1e-5,
        hidden_act=hidden_act,
        eos_token_id=TINY_EOS,
        bos_token_id=TINY_BOS,
    )
    vision_cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        layer_norm_eps=1e-5,
        hidden_act=hidden_act,
    )
    cfg = CLIPConfig.from_text_vision_configs(text_cfg, vision_cfg, projection_dim=32)
    torch.manual_seed(seed)
    model = CLIPModel(cfg).eval()
    return model


def tiny_vocab_tokens() -> list[str]:
    return [f"tok{i}</w>" for i in range(TINY_VOCAB)]


def tiny_gguf(tmp_path, *, use_f32: bool = True, hidden_act: str = "quick_gelu", seed: int = 0):
    """Returns (gguf_path, hf_model)."""
    model = tiny_hf_clip(hidden_act=hidden_act, seed=seed)
    path = str(tmp_path / f"tiny_{hidden_act}_{'f32' if use_f32 else 'f16'}.gguf")
    convert_hf_clip(model, tiny_vocab_tokens(), path, use_f32=use_f32, name="tiny-clip")
    return path, model


def random_tokens(rng: np.random.Generator, batch: int, length: int) -> np.ndarray:
    """Token batches ending in EOS (appearing only there) like real CLIP
    inputs, so HF's eos-position pooling matches last-index pooling."""
    ids = rng.integers(0, TINY_BOS, size=(batch, length))
    ids[:, 0] = TINY_BOS
    ids[:, -1] = TINY_EOS
    return ids.astype(np.int32)
