"""Multi-device sharding tests on the 8-device virtual CPU mesh: TP + DP
sharded encode must match single-device results, and the graft entry points
must execute."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_tpu.gguf import GGUFReader
from clip_tpu.models.config import ClipConfig
from clip_tpu.models.params import load_params
from clip_tpu.models.vision import encode_image
from clip_tpu.parallel import make_mesh, param_specs, shard_batch, shard_params
from clip_tpu.quantize import quantize_model

from hf_fixtures import tiny_gguf


@pytest.fixture(scope="module")
def tiny_q(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shard")
    path, _ = tiny_gguf(tmp, use_f32=True)
    qpath = str(tmp / "tiny.q4_0.gguf")
    quantize_model(path, qpath, "q4_0", verbose=False)
    return qpath


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2), (2, 4)])
def test_sharded_encode_matches_single_device(tiny_q, rng, n_data, n_model):
    with GGUFReader(tiny_q) as r:
        cfg = ClipConfig.from_gguf(r)
        params = load_params(r, cfg, keep_quantized=True)

    pixels = rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    base = np.asarray(
        encode_image(params["vision"], cfg.vision, jnp.asarray(pixels),
                     use_gelu=cfg.use_gelu, normalize=True)
    )

    mesh = make_mesh(n_data, n_model)
    sp = shard_params(params, mesh)

    @jax.jit
    def step(p, px):
        return encode_image(p, cfg.vision, px, use_gelu=cfg.use_gelu, normalize=True)

    out = np.asarray(step(sp["vision"], shard_batch(jnp.asarray(pixels), mesh)))
    np.testing.assert_allclose(out, base, atol=1e-5)


def test_param_specs_structure(tiny_q):
    from jax.sharding import PartitionSpec as P

    with GGUFReader(tiny_q) as r:
        cfg = ClipConfig.from_gguf(r)
        params = load_params(r, cfg, keep_quantized=True)
    specs = param_specs(params, n_model=2)
    lay = specs["vision"]["layers"]
    assert lay["qkv_w"].q == P(None, "model", None)
    assert lay["o_w"].q == P(None, None, "model")
    assert lay["ln1_w"] == P()
    assert specs["vision"]["proj"].q == P() or specs["vision"]["proj"] == P()


def test_graft_entry_single():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (4, 512)


def test_graft_entry_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_qkv_head_permutation_roundtrip():
    from clip_tpu.parallel import qkv_head_permutation

    h, n_model = 8, 2
    idx = qkv_head_permutation(h, n_model)
    # shard 0 = first half of Q, K, V; shard 1 = second halves
    assert idx.tolist() == (
        list(range(0, 4)) + list(range(8, 12)) + list(range(16, 20))
        + list(range(4, 8)) + list(range(12, 16)) + list(range(20, 24))
    )


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_shard_map_engine_matches_single_device(tiny_q, rng, n_data, n_model, attn_impl):
    """The shard_map path (per-shard Pallas-capable code + Megatron TP
    collectives) must agree with the single-device engine.  attn_impl='pallas'
    runs the fused attention kernel per-shard in interpret mode on CPU —
    proving the multi-chip path keeps the single-chip kernels."""
    from clip_tpu.engine import ClipEngine

    base = ClipEngine(tiny_q, verbosity=0)
    mesh = make_mesh(n_data, n_model)
    eng = ClipEngine(tiny_q, mesh=mesh, attn_impl=attn_impl, verbosity=0)
    assert eng._spmd, "tiny model should be shard_map-compatible on this mesh"
    assert eng._qmm_backend is None

    pixels = rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    out = eng.encode_image(pixels, normalize=True, preprocessed=True)
    ref = base.encode_image(pixels, normalize=True, preprocessed=True)
    np.testing.assert_allclose(out, ref, atol=2e-5)

    texts = ["a", "b", "ab", "ba", "aa", "bb", "a b", "b a"]
    out_t = eng.encode_text(texts)
    ref_t = base.encode_text(texts)
    np.testing.assert_allclose(out_t, ref_t, atol=2e-5)
    base.close(); eng.close()


def test_incompatible_mesh_falls_back_to_pjit(tiny_q, rng):
    """hidden=64 cannot row-shard 4 ways in 32-element quant blocks: the
    engine must fall back to pjit SPMD and force the XLA qmatmul/attention
    paths (the round-1 latent bug: 'auto' routed sharded QTensors into a
    non-partitionable Pallas custom call)."""
    from clip_tpu.engine import ClipEngine

    mesh = make_mesh(2, 4)
    eng = ClipEngine(tiny_q, mesh=mesh, verbosity=0)
    assert not eng._spmd
    assert eng._qmm_backend == "xla"
    assert eng.attn_impl == "xla"

    base = ClipEngine(tiny_q, verbosity=0)
    pixels = rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    np.testing.assert_allclose(
        eng.encode_image(pixels, normalize=True, preprocessed=True),
        base.encode_image(pixels, normalize=True, preprocessed=True),
        atol=2e-5)
    base.close(); eng.close()


def test_use_shard_map_true_rejects_incompatible(tiny_q):
    from clip_tpu.engine import ClipEngine

    mesh = make_mesh(2, 4)
    with pytest.raises(ValueError, match="shard_map"):
        ClipEngine(tiny_q, mesh=mesh, use_shard_map=True, verbosity=0)


@pytest.mark.parametrize("n_data,n_model", [(4, 2), (2, 4)])
def test_shard_map_w8a8_matches_single_device(tiny_q, rng, n_data, n_model):
    """W8A8 (per-channel int8 weights + per-row int8 activations — the
    engine's TPU default) under shard_map TP: ``c8`` shards like a dense
    weight, ``ws`` like a column bias.  The row-parallel K split quantizes
    each shard's activations with its LOCAL amax, so TP output is not
    bit-identical to single-device W8A8 (each shard's rescale is exact for
    its own int8 codes — a finer-grained, equally valid quantization);
    assert agreement at quantization tolerance instead."""
    from clip_tpu.engine import ClipEngine
    from clip_tpu.ops.qtensor import W8Tensor

    base = ClipEngine(tiny_q, verbosity=0, act_quant=True)
    eng = ClipEngine(tiny_q, mesh=make_mesh(n_data, n_model), verbosity=0,
                     act_quant=True)
    assert isinstance(eng.params["vision"]["layers"]["qkv_w"], W8Tensor)

    pixels = rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    out = eng.encode_image(pixels, normalize=True, preprocessed=True)
    ref = base.encode_image(pixels, normalize=True, preprocessed=True)
    cos = np.sum(out * ref, axis=-1)
    assert cos.min() > 0.999, f"min cos {cos.min()}"

    out_t = eng.encode_text(["a", "b", "ab", "ba"])
    ref_t = base.encode_text(["a", "b", "ab", "ba"])
    cos_t = np.sum(out_t * ref_t, axis=-1)
    assert cos_t.min() > 0.999, f"min cos {cos_t.min()}"
    base.close(); eng.close()


def test_shard_map_q5_packed_planes(tiny_q, rng, tmp_path_factory):
    """q5_0's packed device layout (nibble plane + high-bit plane) must
    shard consistently under shard_map TP: all three planes split on the
    same block-aligned boundaries or dequant misaligns."""
    from clip_tpu.engine import ClipEngine
    from clip_tpu.quantize import quantize_model

    tmp = tmp_path_factory.mktemp("q5shard")
    src, _ = tiny_gguf(tmp, use_f32=True)
    q5 = str(tmp / "tiny.q5_0.gguf")
    quantize_model(src, q5, "q5_0", verbose=False)

    base = ClipEngine(q5, verbosity=0)
    eng = ClipEngine(q5, mesh=make_mesh(4, 2), verbosity=0)
    assert eng._spmd
    pixels = rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    np.testing.assert_allclose(
        eng.encode_image(pixels, normalize=True, preprocessed=True),
        base.encode_image(pixels, normalize=True, preprocessed=True),
        atol=2e-5)
    np.testing.assert_allclose(
        eng.encode_text(["a", "b"]), base.encode_text(["a", "b"]), atol=2e-5)
    base.close(); eng.close()
