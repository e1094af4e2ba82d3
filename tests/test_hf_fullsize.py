"""Full-architecture HF parity: random-weight ViT-B/32 at the TRUE geometry.

The tiny oracle (hf_fixtures: 2 layers, 64 hidden) catches per-op numerics
but not depth- or geometry-dependent drift — eps placement compounding over
12 layers, EOT pooling at the real 77-token context, pad-once key masking at
the real S=50 vision sequence.  This builds a random-weight HF ``CLIPModel``
at the exact published ViT-B/32 config (12L, 768/512 hidden, 224px/32,
49408 vocab — the checkpoint the reference's converter targets,
/root/reference/models/convert_hf_to_gguf.py), converts it through our GGUF
writer, and asserts both towers against HF Transformers on identical
weights.  Offline by construction: no checkpoint download, only the
installed ``transformers`` modeling code (the same oracle the reference
validates against with its CLIP_DEBUG dumps, /root/reference/clip.cpp:1180-1223).

Marked ``slow``: ~600 MB temp GGUF + a 12-layer f32 forward on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

from clip_tpu.convert import convert_hf_clip
from clip_tpu.gguf import GGUFReader
from clip_tpu.models.config import ClipConfig
from clip_tpu.models.params import load_params
from clip_tpu.models.text import encode_text
from clip_tpu.models.vision import encode_image

ON_TPU = jax.default_backend() == "tpu"
# TPU f32 matmuls run as bf16 MXU passes; 12 layers of depth widen the
# envelope vs the tiny test
HF_TOL = dict(atol=5e-2, rtol=5e-2) if ON_TPU else dict(atol=2e-4, rtol=2e-3)

VOCAB = 49408
BOS, EOS = 49406, 49407

pytestmark = pytest.mark.slow


def _b32_hf_clip(seed: int = 0) -> CLIPModel:
    text_cfg = CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=512, intermediate_size=2048,
        num_hidden_layers=12, num_attention_heads=8,
        max_position_embeddings=77, layer_norm_eps=1e-5,
        hidden_act="quick_gelu", bos_token_id=BOS, eos_token_id=EOS,
    )
    vision_cfg = CLIPVisionConfig(
        hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, image_size=224, patch_size=32,
        layer_norm_eps=1e-5, hidden_act="quick_gelu",
    )
    cfg = CLIPConfig.from_text_vision_configs(
        text_cfg, vision_cfg, projection_dim=512)
    torch.manual_seed(seed)
    return CLIPModel(cfg).eval()


@pytest.fixture(scope="module")
def b32(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("b32_fullsize")
    model = _b32_hf_clip()
    path = str(tmp / "vit_b32_random_f32.gguf")
    tokens = [f"tok{i}</w>" for i in range(VOCAB)]
    convert_hf_clip(model, tokens, path, use_f32=True, name="ViT-B/32-random")
    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    params = load_params(reader, cfg, keep_quantized=False, dtype=jnp.float32)
    return dict(model=model, cfg=cfg, params=params)


def test_b32_config_geometry(b32):
    cfg = b32["cfg"]
    assert cfg.text.n_layer == 12 and cfg.text.hidden_size == 512
    assert cfg.text.n_head == 8 and cfg.text.num_positions == 77
    assert cfg.vision.n_layer == 12 and cfg.vision.hidden_size == 768
    assert cfg.vision.image_size == 224 and cfg.vision.patch_size == 32
    assert cfg.vision.num_positions == 50  # (224/32)^2 + CLS
    assert not cfg.use_gelu  # quick_gelu


def test_b32_text_tower_matches_hf_full_context(b32, rng):
    """Full 77-token context: EOT pooling + causal mask at real depth."""
    model, cfg, params = b32["model"], b32["cfg"], b32["params"]
    ids = rng.integers(0, BOS, size=(2, 77))
    ids[:, 0] = BOS
    ids[:, -1] = EOS
    ids = ids.astype(np.int32)
    with torch.no_grad():
        ref = model.get_text_features(
            input_ids=torch.from_numpy(ids).long()).numpy()
    out = np.asarray(encode_text(
        params["text"], cfg.text, jnp.asarray(ids),
        jnp.full(2, 77, jnp.int32), use_gelu=cfg.use_gelu, normalize=False))
    np.testing.assert_allclose(out, ref, **HF_TOL)
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.9999


def test_b32_text_short_prompt_matches_hf(b32, rng):
    """Short prompt padded to the 80-wide pad-once bucket internally: the
    per-example length (EOT index) pooling must match HF's eos-position
    pooling exactly despite the trailing pad rows."""
    model, cfg, params = b32["model"], b32["cfg"], b32["params"]
    n = 9
    ids = rng.integers(0, BOS, size=(2, n))
    ids[:, 0] = BOS
    ids[:, -1] = EOS
    ids = ids.astype(np.int32)
    with torch.no_grad():
        ref = model.get_text_features(
            input_ids=torch.from_numpy(ids).long()).numpy()
    out = np.asarray(encode_text(
        params["text"], cfg.text, jnp.asarray(ids),
        jnp.full(2, n, jnp.int32), use_gelu=cfg.use_gelu, normalize=False))
    np.testing.assert_allclose(out, ref, **HF_TOL)
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.9999


def test_b32_vision_tower_matches_hf(b32, rng):
    """Real 224px geometry (S=50): patch embed, CLS pooling, pre/post LN at
    depth 12.  Patch-embed conv weights are stored f16 even in f32
    checkpoints (reference converter behavior) -> f16-scale tolerance."""
    model, cfg, params = b32["model"], b32["cfg"], b32["params"]
    pixels = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    nchw = torch.from_numpy(pixels.transpose(0, 3, 1, 2)).float()
    with torch.no_grad():
        ref = model.get_image_features(pixel_values=nchw).numpy()
    out = np.asarray(encode_image(
        params["vision"], cfg.vision, jnp.asarray(pixels),
        use_gelu=cfg.use_gelu, normalize=False))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.9999
