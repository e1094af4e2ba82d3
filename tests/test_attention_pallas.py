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


def test_flat_path_dispatch():
    """The pad-free flat path engages exactly when bb*S fits one score tile."""
    from clip_tpu.ops.attention_pallas import _flat_block_b

    assert _flat_block_b(256, 50) == 4       # ViT-B/32: 200 aligned rows
    assert _flat_block_b(256, 16) == 8       # tiny S: grow to fill MXU tiles
    assert _flat_block_b(256, 77) is None    # text ctx: 616 rows too big
    assert _flat_block_b(256, 257) is None   # ViT-L/14: padded path
    bb = _flat_block_b(8, 5)
    assert bb is not None and (bb * 5) % 8 == 0


@pytest.mark.parametrize(
    "b,s,h,nh,causal",
    [
        (8, 50, 96, 4, False),   # flat path (bb=4), batch padded 8->8
        (6, 50, 96, 4, False),   # flat path with b % bb != 0 (pads to 8)
        (8, 16, 64, 2, True),    # flat path, causal masking
    ],
)
def test_flat_qkv_matches_reference(rng, b, s, h, nh, causal):
    from conftest import TOL

    from clip_tpu.ops.attention_pallas import _flat_block_b, mha_pallas_qkv

    assert _flat_block_b(b, s) is not None
    q = rng.normal(size=(b, s, h)).astype(np.float32)
    k = rng.normal(size=(b, s, h)).astype(np.float32)
    v = rng.normal(size=(b, s, h)).astype(np.float32)
    qkv = jnp.concatenate([jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)], axis=-1)
    scale = (h / nh) ** -0.5
    out = mha_pallas_qkv(qkv, n_head=nh, scale=scale, causal=causal, interpret=True)
    ref = ref_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), nh, scale, causal)
    # TPU tolerance: the reference einsum itself runs as single-pass bf16 MXU
    # dots there (see conftest)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, **TOL)
