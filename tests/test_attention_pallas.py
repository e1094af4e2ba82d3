"""Fused attention kernel vs the einsum reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from clip_tpu.ops.attention_pallas import mha_pallas
from clip_tpu.ops.nn import softmax


def ref_mha(q, k, v, n_head, scale, causal=False):
    b, s, h = q.shape
    dh = h // n_head
    q4 = (q * scale).reshape(b, s, n_head, dh)
    k4 = k.reshape(b, s, n_head, dh)
    v4 = v.reshape(b, s, n_head, dh)
    sc = jnp.einsum("bqhd,bkhd->bhqk", q4, k4, preferred_element_type=jnp.float32)
    if causal:
        i = jnp.arange(s)[:, None]
        j = jnp.arange(s)[None, :]
        sc = sc + jnp.where(j <= i, 0.0, -1e9)[None, None]
    p = softmax(sc.astype(jnp.float32)).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v4, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, s, h)


@pytest.mark.parametrize(
    "b,s,h,nh,causal",
    [(3, 50, 64, 4, False), (2, 77, 64, 4, True), (1, 17, 128, 2, False)],
)
def test_matches_reference(rng, b, s, h, nh, causal):
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h)).astype(np.float32)) for _ in range(3)
    )
    scale = (h // nh) ** -0.5
    ref = np.asarray(ref_mha(q, k, v, nh, scale, causal))
    out = np.asarray(
        mha_pallas(q, k, v, n_head=nh, scale=scale, causal=causal, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_padding_is_masked(rng):
    """Results must not depend on the internal seq padding: compare s=50
    against manually padded inputs restricted to the first 50 rows."""
    b, s, h, nh = 2, 13, 64, 4
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h)).astype(np.float32)) for _ in range(3)
    )
    out = np.asarray(mha_pallas(q, k, v, n_head=nh, scale=0.25, interpret=True))
    ref = np.asarray(ref_mha(q, k, v, nh, 0.25))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("b,s,h,nh,causal", [(3, 50, 64, 4, False), (2, 77, 64, 4, True)])
def test_qkv_variant_matches_reference(rng, b, s, h, nh, causal):
    from clip_tpu.ops.attention_pallas import mha_pallas_qkv

    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h)).astype(np.float32)) for _ in range(3)
    )
    scale = (h // nh) ** -0.5
    ref = np.asarray(ref_mha(q, k, v, nh, scale, causal))
    qkv = jnp.concatenate([q, k, v], axis=-1)
    out = np.asarray(
        mha_pallas_qkv(qkv, n_head=nh, scale=scale, causal=causal, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
