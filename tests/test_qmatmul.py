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
