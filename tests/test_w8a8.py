"""W8A8 (int8-MXU activation-quantized) path: numerics and wiring.

The path re-quantizes block-quantized weights to per-channel int8 at load
(ops.qtensor.to_w8tensor) and runs their matmuls with per-row int8-quantized
activations (ops.linear.w8a8_matmul) — the TPU analogue of ggml's
vec_dot_q4_0_q8_0 quantized-activation dots.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import ON_TPU

from clip_tpu.engine import ClipEngine
from clip_tpu.gguf.constants import GGMLType
from clip_tpu.ops.linear import linear, w8a8_matmul
from clip_tpu.ops.qtensor import (
    QTensor, W8Tensor, dequant, dequant_np, to_w8tensor,
)
from clip_tpu.quant.formats import quantize as quantize_np

from hf_fixtures import tiny_gguf


def _make_qtensor(rng, n=64, k=128, qtype=GGMLType.Q4_0):
    from clip_tpu.ops.qtensor import from_ggml_blocks

    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    packed = quantize_np(w.reshape(-1, 32), qtype)
    return from_ggml_blocks(packed.reshape(n, -1), (n, k), qtype), w


def test_dequant_np_matches_jax(rng):
    for qtype in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                  GGMLType.Q5_1, GGMLType.Q8_0):
        qt, _ = _make_qtensor(rng, qtype=qtype)
        np.testing.assert_array_equal(
            dequant_np(qt), np.asarray(dequant(qt, dtype=jnp.float32)))


def test_to_w8tensor_reconstruction(rng):
    """Per-channel int8 re-quantization must add only second-order error on
    top of the source block format."""
    qt, w_true = _make_qtensor(rng)
    w8 = to_w8tensor(qt)
    assert w8.c8.dtype == np.int8 and w8.c8.shape == (64, 128)
    w_q4 = dequant_np(qt)
    w_rec = w8.c8.astype(np.float32) * w8.ws[:, None]
    # int8-vs-q4 error must be well under the q4-vs-true error
    err_rec = np.abs(w_rec - w_q4).max()
    err_q4 = np.abs(w_q4 - w_true).max()
    assert err_rec < 0.5 * err_q4, (err_rec, err_q4)


def test_w8a8_matmul_close_to_f32(rng):
    qt, _ = _make_qtensor(rng, n=96, k=256)
    w8 = to_w8tensor(qt)
    x = (rng.standard_normal((40, 256)) * 2.0).astype(np.float32)
    ref = x @ dequant_np(qt).T
    got = np.asarray(w8a8_matmul(jnp.asarray(x), w8, compute_dtype=jnp.float32))
    # per-row activation quant: error scales with row amax; cosine is tight
    cos = (ref * got).sum(1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(got, axis=1) + 1e-12)
    assert cos.min() > 0.9995, cos.min()
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_w8a8_matmul_3d_and_linear_dispatch(rng):
    qt, _ = _make_qtensor(rng, n=96, k=256)
    w8 = to_w8tensor(qt)
    x = jnp.asarray(rng.standard_normal((4, 10, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(96), jnp.float32)
    y = linear(x, w8, b, compute_dtype=jnp.float32)
    assert y.shape == (4, 10, 96)
    y2 = w8a8_matmul(x, w8, compute_dtype=jnp.float32) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_engine_act_quant_matches_dequant_path(tmp_path, rng):
    """Full tiny model: act_quant=True embeddings must stay in lockstep with
    the exact-dequant path (the envelope that matters for the accuracy
    gate)."""
    from clip_tpu.quantize import quantize_model

    src, _ = tiny_gguf(tmp_path, use_f32=True)
    qp = str(tmp_path / "tiny.q4_0.gguf")
    quantize_model(src, qp, "q4_0", verbose=False)

    base = ClipEngine(qp, verbosity=0, act_quant=False)
    w8 = ClipEngine(qp, verbosity=0, act_quant=True)
    from clip_tpu.ops.qtensor import W8Tensor as W8
    assert isinstance(w8.params["text"]["layers"]["qkv_w"], W8)

    texts = ["tok1 tok2", "tok2", "tok1 tok1 tok2"]
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    t0 = base.encode_text(texts, normalize=True)
    t1 = w8.encode_text(texts, normalize=True)
    i0 = base.encode_image(img, normalize=True)
    i1 = w8.encode_image(img, normalize=True)
    assert (t0 * t1).sum(1).min() > 0.999
    assert float(i0 @ i1) > 0.999
    base.close(); w8.close()


def test_engine_act_quant_dense_checkpoint(tmp_path, rng):
    """Explicit act_quant=True on a DENSE (f32/f16) checkpoint int8-izes the
    2-D layer weights too (opt-in serving mode); auto mode must never touch
    dense weights (f16 numerics stay exact unless asked)."""
    src, _ = tiny_gguf(tmp_path, use_f32=True)

    base = ClipEngine(src, verbosity=0, act_quant=False)
    auto = ClipEngine(src, verbosity=0)            # auto: dense stays dense
    w8 = ClipEngine(src, verbosity=0, act_quant=True)
    assert not isinstance(auto.params["text"]["layers"]["qkv_w"], W8Tensor)
    assert isinstance(w8.params["text"]["layers"]["qkv_w"], W8Tensor)
    assert w8.params["text"]["layers"]["qkv_w"].qtype == GGMLType.F16

    texts = ["tok1 tok2", "tok2", "tok1 tok1 tok2"]
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    t0 = base.encode_text(texts, normalize=True)
    t1 = w8.encode_text(texts, normalize=True)
    i0 = base.encode_image(img, normalize=True)
    i1 = w8.encode_image(img, normalize=True)
    # tiny-model int8 weight-quant error sits near the floor; on TPU the
    # dense arm additionally runs bf16 MXU passes (measured 0.9983 round 5)
    floor = 0.997 if ON_TPU else 0.999
    assert (t0 * t1).sum(1).min() > floor
    assert float(i0 @ i1) > floor
    base.close(); auto.close(); w8.close()


def test_to_w8tensor_dense_roundtrip(rng):
    w = (rng.standard_normal((32, 64)) * 0.05).astype(np.float32)
    w8 = to_w8tensor(w)
    rec = w8.c8.astype(np.float32) * w8.ws[:, None]
    rel = np.abs(rec - w).max() / np.abs(w).max()
    assert rel < 1.5 / 127, rel


@pytest.mark.parametrize("n_model", [2])
def test_w8_sharding_specs_and_permute(rng, n_model):
    """W8Tensor shards like a dense weight (c8 col/row-parallel, ws follows N
    and replicates under K-sharding) and survives the QKV head permutation."""
    import jax

    from clip_tpu.parallel import mesh as pmesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device platform")
    qt, _ = _make_qtensor(rng, n=8 * 24, k=64)   # [192, 64] = qkv of h=64
    w8 = to_w8tensor(qt)
    stacked = W8Tensor(c8=np.stack([w8.c8] * 2), ws=np.stack([w8.ws] * 2),
                       qtype=w8.qtype)
    params = {"text": {"layers": {
        "qkv_w": stacked,
        "qkv_b": np.zeros((2, 192), np.float32),
        "down_w": W8Tensor(c8=np.swapaxes(stacked.c8, 1, 2)[:, :64, :],
                           ws=np.zeros((2, 64), np.float32), qtype=w8.qtype),
    }}}
    specs = pmesh.param_specs(params, n_model)
    qspec = specs["text"]["layers"]["qkv_w"]
    assert tuple(qspec.c8) == (None, pmesh.MODEL_AXIS, None)
    assert tuple(qspec.ws) == (None, pmesh.MODEL_AXIS)
    dspec = specs["text"]["layers"]["down_w"]
    assert tuple(dspec.c8) == (None, None, pmesh.MODEL_AXIS)
    assert tuple(dspec.ws) == (None, None)

    perm = pmesh.permute_qkv_params(params, n_model)
    pw = perm["text"]["layers"]["qkv_w"]
    assert isinstance(pw, W8Tensor)
    idx = pmesh.qkv_head_permutation(64, n_model)
    np.testing.assert_array_equal(pw.c8, stacked.c8[:, idx])
    np.testing.assert_array_equal(pw.ws, stacked.ws[:, idx])


def test_w8_engine_under_mesh(tmp_path, rng):
    """act_quant engine over a (data, model) mesh: shard_map path must accept
    W8Tensor leaves and agree with the single-device engine."""
    import jax

    from clip_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device platform")
    from clip_tpu.quantize import quantize_model

    src, _ = tiny_gguf(tmp_path, use_f32=True)
    qp = str(tmp_path / "tiny.q4_0.gguf")
    quantize_model(src, qp, "q4_0", verbose=False)

    n = 4 if len(jax.devices()) >= 4 else 2
    mesh = make_mesh(2, n // 2, devices=jax.devices()[:n])
    single = ClipEngine(qp, verbosity=0, act_quant=True)
    meshed = ClipEngine(qp, verbosity=0, act_quant=True, mesh=mesh)
    texts = ["tok1 tok2", "tok2"]
    a = single.encode_text(texts, normalize=True)
    b = meshed.encode_text(texts, normalize=True)
    assert (a * b).sum(1).min() > 0.999
    single.close(); meshed.close()


def test_hybrid_w8_keeps_source_and_routes(rng, monkeypatch):
    """Hybrid layout: to_w8tensor(keep_source=True) carries the packed
    source, and qmatmul routes small-row GEMMs to the fused dequant kernel
    (weight-bandwidth: ~1.8x fewer bytes than int8 codes) while throughput
    rows stay on the int8 MXU and the pjit fallback (backend='xla') never
    touches a Pallas call."""
    import importlib

    import jax

    L = importlib.import_module("clip_tpu.ops.linear")
    qt, _ = _make_qtensor(rng, n=64, k=128)
    w8 = to_w8tensor(qt, keep_source=True)
    assert w8.qt is qt
    assert to_w8tensor(qt).qt is None  # default unchanged

    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    small = jnp.zeros((8, 128), jnp.float32)
    big = jnp.zeros((4096, 128), jnp.float32)
    jp_small = str(jax.make_jaxpr(lambda x: L.qmatmul(x, w8))(small))
    jp_big = str(jax.make_jaxpr(lambda x: L.qmatmul(x, w8))(big))
    jp_xla = str(jax.make_jaxpr(lambda x: L.qmatmul(x, w8, backend="xla"))(small))
    assert "pallas_call" in jp_small          # hybrid: fused dequant kernel
    assert "pallas_call" not in jp_big        # throughput: int8 MXU
    assert "pallas_call" not in jp_xla        # pjit fallback stays XLA-only


def test_engine_hybrid_params_carry_source(tmp_path):
    """act_quant engines keep the packed blocks alongside the int8 codes."""
    from clip_tpu.quantize import quantize_model

    src, _ = tiny_gguf(tmp_path, use_f32=True)
    qp = str(tmp_path / "tiny.q4_0.gguf")
    quantize_model(src, qp, "q4_0", verbose=False)
    eng = ClipEngine(qp, verbosity=0, act_quant=True)
    w = eng.params["vision"]["layers"]["up_w"]
    assert isinstance(w, W8Tensor) and w.qt is not None
    assert w.qt.qtype == w.qtype
    eng.close()
