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
