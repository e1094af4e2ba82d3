"""End-to-end numerics: our JAX towers vs HF Transformers on identical weights
(via GGUF round-trip), plus quantized-checkpoint quality and padding
invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

ON_TPU = jax.default_backend() == "tpu"
# TPU f32 matmuls run as bf16 MXU passes: HF (torch, exact f32) comparisons
# need wider bounds than on the CPU backend
HF_TOL = dict(atol=2e-2, rtol=2e-2) if ON_TPU else dict(atol=2e-5, rtol=1e-4)

from clip_tpu.gguf import GGUFReader
from clip_tpu.models.config import ClipConfig
from clip_tpu.models.params import load_params
from clip_tpu.models.text import encode_text
from clip_tpu.models.vision import encode_image
from clip_tpu.quantize import quantize_model

from hf_fixtures import TINY_EOS, random_tokens, tiny_gguf


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiny")
    path, model = tiny_gguf(tmp, use_f32=True)
    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    params = load_params(reader, cfg, keep_quantized=False, dtype=jnp.float32)
    return dict(path=path, model=model, reader=reader, cfg=cfg, params=params, tmp=tmp)


def hf_text_features(model, ids: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        return model.get_text_features(input_ids=torch.from_numpy(ids).long()).numpy()


def hf_image_features(model, pixels_nhwc: np.ndarray) -> np.ndarray:
    nchw = torch.from_numpy(pixels_nhwc.transpose(0, 3, 1, 2)).float()
    with torch.no_grad():
        return model.get_image_features(pixel_values=nchw).numpy()


def test_config_parsed(tiny):
    cfg = tiny["cfg"]
    assert cfg.has_text and cfg.has_vision
    assert not cfg.use_gelu  # quick_gelu
    assert cfg.text.hidden_size == 64 and cfg.text.n_head == 4
    assert cfg.vision.image_size == 28 and cfg.vision.num_positions == 5
    assert cfg.ftype == 0


def test_text_tower_matches_hf(tiny, rng):
    cfg, params, model = tiny["cfg"], tiny["params"], tiny["model"]
    ids = random_tokens(rng, batch=3, length=9)
    ref = hf_text_features(model, ids)
    out = encode_text(
        params["text"], cfg.text, jnp.asarray(ids), jnp.full(3, 9, jnp.int32),
        use_gelu=cfg.use_gelu, normalize=False,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out, ref, **HF_TOL)
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.9999


def test_text_padding_invariance(tiny, rng):
    """Padding after EOS must not change the pooled embedding (causal mask)."""
    cfg, params = tiny["cfg"], tiny["params"]
    ids = random_tokens(rng, batch=2, length=7)
    out_exact = encode_text(
        params["text"], cfg.text, jnp.asarray(ids), jnp.full(2, 7, jnp.int32),
        use_gelu=cfg.use_gelu, normalize=True,
    )
    padded = np.concatenate([ids, np.full((2, 9), TINY_EOS, np.int32)], axis=1)
    out_padded = encode_text(
        params["text"], cfg.text, jnp.asarray(padded), jnp.full(2, 7, jnp.int32),
        use_gelu=cfg.use_gelu, normalize=True,
    )
    np.testing.assert_allclose(np.asarray(out_exact), np.asarray(out_padded), atol=1e-5)


def test_vision_tower_matches_hf(tiny, rng):
    cfg, params, model = tiny["cfg"], tiny["params"], tiny["model"]
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    ref = hf_image_features(model, pixels)
    out = encode_image(
        params["vision"], cfg.vision, jnp.asarray(pixels),
        use_gelu=cfg.use_gelu, normalize=False,
    )
    # patch-embed conv weights are stored f16 even in f32 checkpoints
    # (reference behavior: convert_hf_to_gguf.py:184-189) -> ~1e-3 tolerance
    out = np.asarray(out)
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-2)
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.99999


def test_normalize_flag(tiny, rng):
    cfg, params = tiny["cfg"], tiny["params"]
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    out = encode_image(params["vision"], cfg.vision, jnp.asarray(pixels),
                       use_gelu=cfg.use_gelu, normalize=True)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_gelu_variant_matches_hf(tmp_path, rng):
    """LAION-style checkpoints use hidden_act='gelu'; ggml approximates it
    with tanh-gelu so allow a looser tolerance."""
    path, model = tiny_gguf(tmp_path, use_f32=True, hidden_act="gelu")
    with GGUFReader(path) as r:
        cfg = ClipConfig.from_gguf(r)
        assert cfg.use_gelu
        params = load_params(r, cfg, keep_quantized=False)
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    ref = hf_image_features(model, pixels)
    out = encode_image(params["vision"], cfg.vision, jnp.asarray(pixels),
                       use_gelu=cfg.use_gelu, normalize=False)
    # tanh-gelu vs erf-gelu: small systematic difference
    cos = (np.sum(out * ref, -1) /
           (np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)))
    assert cos.min() > 0.999


@pytest.mark.parametrize("qname,min_cos", [("q8_0", 0.999), ("q4_0", 0.98), ("q5_1", 0.995)])
def test_quantized_checkpoint_quality(tiny, rng, qname, min_cos):
    """Quantize -> reload packed -> embeddings stay close to f32."""
    qpath = str(tiny["tmp"] / f"tiny.{qname}.gguf")
    quantize_model(tiny["path"], qpath, qname, verbose=False)
    with GGUFReader(qpath) as r:
        cfg = ClipConfig.from_gguf(r)
        qparams = load_params(r, cfg, keep_quantized=True)
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    base = np.asarray(encode_image(tiny["params"]["vision"], cfg.vision,
                                   jnp.asarray(pixels), use_gelu=cfg.use_gelu,
                                   normalize=True))
    qout = np.asarray(encode_image(qparams["vision"], cfg.vision,
                                   jnp.asarray(pixels), use_gelu=cfg.use_gelu,
                                   normalize=True))
    cos = np.sum(base * qout, axis=-1)
    assert cos.min() > min_cos, f"{qname}: cos={cos}"


def test_qtensor_dequant_matches_numpy_oracle(tiny):
    """Device dequantization must be bit-identical to the numpy reference."""
    from clip_tpu.ops.qtensor import dequant
    from clip_tpu.quant import dequantize, quantize

    qpath = str(tiny["tmp"] / "tiny.deq.gguf")
    quantize_model(tiny["path"], qpath, "q5_0", verbose=False)
    with GGUFReader(qpath) as r:
        info = r.tensors["t.blk.0.attn_q.weight"]
        packed = r.tensor_data("t.blk.0.attn_q.weight")
        oracle = dequantize(packed, info.ggml_type).reshape(info.shape)
        from clip_tpu.ops.qtensor import from_ggml_blocks

        qt = from_ggml_blocks(packed, info.shape, info.ggml_type)
        dev = np.asarray(dequant(qt, dtype=jnp.float32))
    np.testing.assert_array_equal(dev, oracle)


def test_unroll_matches_scan(tiny, rng):
    """run_blocks(unroll=True) must be numerically identical to the scan."""
    cfg = tiny["cfg"]
    pixels = rng.normal(size=(2, cfg.vision.image_size, cfg.vision.image_size, 3))
    pixels = pixels.astype(np.float32)
    outs = {}
    for unroll in (False, True):
        outs[unroll] = np.asarray(encode_image(
            tiny["params"]["vision"], cfg.vision, jnp.asarray(pixels),
            use_gelu=cfg.use_gelu, normalize=True, unroll=unroll))
    np.testing.assert_allclose(outs[False], outs[True], atol=1e-6, rtol=1e-6)


def test_attn_impl_explicit_xla_matches_auto_on_cpu(tiny, rng):
    """On the CPU backend 'auto' resolves to 'xla'; both must agree."""
    if ON_TPU:
        pytest.skip("auto resolves to the Pallas kernel on TPU — the "
                    "premise (auto == xla) only holds on CPU")
    cfg = tiny["cfg"]
    ids = random_tokens(rng, 3, cfg.text.num_positions)
    lengths = np.full((3,), cfg.text.num_positions, np.int32)
    a = np.asarray(encode_text(
        tiny["params"]["text"], cfg.text, jnp.asarray(ids), jnp.asarray(lengths),
        use_gelu=cfg.use_gelu, normalize=True, attn_impl="auto"))
    b = np.asarray(encode_text(
        tiny["params"]["text"], cfg.text, jnp.asarray(ids), jnp.asarray(lengths),
        use_gelu=cfg.use_gelu, normalize=True, attn_impl="xla"))
    np.testing.assert_array_equal(a, b)


def test_attn_impl_pallas_interprets_on_cpu(tiny, rng):
    """Explicit 'pallas' off-TPU runs the kernel in interpret mode and must
    match the XLA path (this is how the CPU mesh tests exercise the exact
    multi-chip graph)."""
    if ON_TPU:
        pytest.skip("pallas runs natively on the TPU backend")
    cfg = tiny["cfg"]
    ids = random_tokens(rng, 2, cfg.text.num_positions)
    lengths = np.full((2,), cfg.text.num_positions, np.int32)
    a = np.asarray(encode_text(
        tiny["params"]["text"], cfg.text, jnp.asarray(ids),
        jnp.asarray(lengths), use_gelu=cfg.use_gelu, normalize=True,
        attn_impl="pallas"))
    b = np.asarray(encode_text(
        tiny["params"]["text"], cfg.text, jnp.asarray(ids),
        jnp.asarray(lengths), use_gelu=cfg.use_gelu, normalize=True,
        attn_impl="xla"))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_engine_rejects_pallas_with_pjit_mesh(tiny):
    """Without shard_map, pjit cannot partition Pallas custom calls — an
    explicit 'pallas' request under a mesh must be refused."""
    import jax as _jax
    from clip_tpu.engine import ClipEngine
    if len(_jax.devices()) < 2:
        pytest.skip("needs a multi-device (virtual) platform")
    with pytest.raises(ValueError, match="pallas"):
        ClipEngine(str(tiny["path"]), use_mesh=True, use_shard_map=False,
                   attn_impl="pallas", verbosity=0)
