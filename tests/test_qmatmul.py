"""Fused dequant-matmul kernel tests (interpret mode on CPU; run with
CLIP_TPU_TEST_TPU=1 to compile the same kernels on real hardware, where f32
matmuls use bf16 MXU passes — tolerances widen accordingly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_tpu.gguf.constants import GGMLType
from clip_tpu.ops.linear import qmatmul, set_default_backend
from clip_tpu.ops.qtensor import dequant, from_ggml_blocks
from clip_tpu.ops.qmatmul_pallas import qmatmul_pallas
from clip_tpu.quant import QUANT_TYPES, quantize


ON_TPU = jax.default_backend() == "tpu"
# TPU f32 dots run as bf16 passes on the MXU: ~1e-3-scale rounding vs exact f32
TOL = dict(atol=2e-2, rtol=2e-2) if ON_TPU else dict(atol=1e-4, rtol=1e-4)


def make_qt(rng, n, k, qtype):
    wf = rng.normal(0, 0.05, (n, k)).astype(np.float32)
    return wf, from_ggml_blocks(quantize(wf, qtype), (n, k), qtype)


@pytest.mark.parametrize("qtype", QUANT_TYPES)
def test_kernel_matches_oracle_f32(rng, qtype):
    n, k, m = 256, 128, 48
    wf, qt = make_qt(rng, n, k, qtype)
    x = rng.normal(size=(m, k)).astype(np.float32)
    ref = x @ np.asarray(dequant(qt, jnp.float32)).T
    out = np.asarray(
        qmatmul_pallas(jnp.asarray(x), qt, compute_dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(out, ref, **TOL)


def test_kernel_pads_irregular_shapes(rng):
    # M and N not multiples of the block sizes
    n, k, m = 200, 64, 13
    wf, qt = make_qt(rng, n, k, GGMLType.Q4_0)
    x = rng.normal(size=(m, k)).astype(np.float32)
    ref = x @ np.asarray(dequant(qt, jnp.float32)).T
    out = np.asarray(
        qmatmul_pallas(jnp.asarray(x), qt, compute_dtype=jnp.float32, interpret=True)
    )
    assert out.shape == (m, n)
    np.testing.assert_allclose(out, ref, **TOL)


def test_kernel_batched_lead_dims(rng):
    n, k = 128, 64
    wf, qt = make_qt(rng, n, k, GGMLType.Q8_0)
    x = rng.normal(size=(2, 5, k)).astype(np.float32)
    ref = x @ np.asarray(dequant(qt, jnp.float32)).T
    out = np.asarray(
        qmatmul_pallas(jnp.asarray(x), qt, compute_dtype=jnp.float32, interpret=True)
    )
    assert out.shape == (2, 5, n)
    np.testing.assert_allclose(out, ref, **TOL)


def test_auto_backend_on_cpu_is_xla(rng):
    """On CPU the auto heuristic must route to XLA (pallas needs interpret)."""
    if ON_TPU:
        pytest.skip("CPU-routing assertion; on TPU auto may pick pallas")
    n, k = 64, 64
    wf, qt = make_qt(rng, n, k, GGMLType.Q4_0)
    x = jnp.asarray(rng.normal(size=(4, k)).astype(np.float32))
    set_default_backend("auto")
    out = np.asarray(qmatmul(x, qt))
    ref = np.asarray(x) @ np.asarray(dequant(qt, jnp.float32)).T
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_q5_device_layout_is_packed(rng):
    """q5 codes must live packed on device: 4 low bits as nibbles [N, K/2]
    plus a little-endian high-bit plane [N, K/8] — 5.625 bits/element of
    weight traffic instead of byte-aligned 8 (the bandwidth reason 5-bit
    formats exist; ggml packs the same two planes, clip.cpp q5 blocks)."""
    n, k = 64, 128
    for qtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        wf, qt = make_qt(rng, n, k, qtype)
        assert qt.q.shape == (n, k // 2) and qt.q.dtype == np.uint8
        assert qt.hb is not None and qt.hb.shape == (n, k // 8)
        expected_code_bits = (k // 2 + k // 8) * 8 / k
        assert expected_code_bits == 5.0
        # dequant must remain bit-identical to the numpy oracle
        from clip_tpu.quant import dequantize
        ref = dequantize(quantize(wf, qtype), qtype).reshape(n, k)
        got = np.asarray(dequant(qt, jnp.float32))
        np.testing.assert_array_equal(got, ref)


def test_q4_q8_have_no_highbit_plane(rng):
    for qtype in (GGMLType.Q4_0, GGMLType.Q8_0):
        _, qt = make_qt(rng, 32, 64, qtype)
        assert qt.hb is None


def test_auto_backend_routes_q5_to_pallas_on_tpu(rng, monkeypatch):
    """_resolve keeps packed-q5 on the fused kernel at ANY row count: the
    XLA bit-plane dequant is pathological inside lax.scan over stacked
    layers (ViT-H/14 q5_1 B=32 measured 1962 ms/step via XLA-in-scan vs
    243 via the kernel — round-3 probe)."""
    import importlib

    # ops.__init__ re-exports the `linear` FUNCTION, shadowing the submodule
    # for `import ... as` attribute lookup — fetch the module explicitly
    L = importlib.import_module("clip_tpu.ops.linear")
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    _, q5 = make_qt(rng, 64, 64, GGMLType.Q5_1)
    _, q4 = make_qt(rng, 64, 64, GGMLType.Q4_0)
    big = jnp.zeros((4096, 64), jnp.float32)   # rows > _PALLAS_MAX_ROWS
    small = jnp.zeros((16, 64), jnp.float32)
    assert L._resolve("auto", big, q5) == "pallas"
    assert L._resolve("auto", small, q5) == "pallas"
    assert L._resolve("auto", big, q4) == "xla"
    assert L._resolve("auto", small, q4) == "pallas"
