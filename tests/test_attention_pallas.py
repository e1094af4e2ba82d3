"""Fused attention kernel vs the einsum reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import TOL  # f32 dots on the TPU MXU are bf16-decomposed at
# default precision, so kernel-vs-reference f32 comparisons carry ~1e-3
# formulation-dependent noise there; TOL widens atol on TPU only.

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
    np.testing.assert_allclose(out, ref, rtol=1e-4, **TOL)


def test_padding_is_masked(rng):
    """Results must not depend on the internal seq padding: compare s=50
    against manually padded inputs restricted to the first 50 rows."""
    b, s, h, nh = 2, 13, 64, 4
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h)).astype(np.float32)) for _ in range(3)
    )
    out = np.asarray(mha_pallas(q, k, v, n_head=nh, scale=0.25, interpret=True))
    ref = np.asarray(ref_mha(q, k, v, nh, 0.25))
    np.testing.assert_allclose(out, ref, rtol=1e-4, **TOL)


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
    np.testing.assert_allclose(out, ref, rtol=1e-4, **TOL)


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


def test_valid_len_masks_pad_keys(rng):
    """valid_len must make padded keys invisible: result rows [0, valid)
    equal the unpadded computation exactly (pad-once vision path)."""
    from clip_tpu.ops.attention_pallas import mha_pallas_qkv

    b, s_real, h, nh = 4, 26, 64, 4
    sp = 32
    q = rng.normal(size=(b, s_real, h)).astype(np.float32)
    k = rng.normal(size=(b, s_real, h)).astype(np.float32)
    v = rng.normal(size=(b, s_real, h)).astype(np.float32)
    qkv = np.concatenate([q, k, v], axis=-1)
    qkv_p = np.zeros((b, sp, 3 * h), np.float32)
    qkv_p[:, :s_real] = qkv
    # garbage in the pad rows must not leak into real rows
    qkv_p[:, s_real:] = 1e3

    scale = (h / nh) ** -0.5
    ref = mha_pallas_qkv(jnp.asarray(qkv), n_head=nh, scale=scale, interpret=True)
    out = mha_pallas_qkv(jnp.asarray(qkv_p), n_head=nh, scale=scale,
                         interpret=True, valid_len=s_real)
    np.testing.assert_allclose(
        np.asarray(out)[:, :s_real], np.asarray(ref), rtol=1e-4, **TOL)


def test_vision_pad_once_matches_unpadded(rng):
    """encode_image's pad-once path (S not flat-eligible, e.g. ViT-B/16's
    197) must produce the same embeddings as a hypothetical unpadded run —
    verified at the run_blocks level with an explicit XLA reference."""
    from clip_tpu.models.transformer import run_blocks

    b, s, h, nh, L = 4, 101, 64, 4, 2   # 101: not flat-eligible, pads to 104
    from clip_tpu.ops.attention_pallas import _flat_block_b
    assert _flat_block_b(b, s) is None and _flat_block_b(b, 104) is not None

    layers = {
        "qkv_w": rng.normal(0, 0.05, (L, 3 * h, h)).astype(np.float32),
        "qkv_b": rng.normal(0, 0.05, (L, 3 * h)).astype(np.float32),
        "o_w": rng.normal(0, 0.05, (L, h, h)).astype(np.float32),
        "o_b": rng.normal(0, 0.05, (L, h)).astype(np.float32),
        "up_w": rng.normal(0, 0.05, (L, 4 * h, h)).astype(np.float32),
        "up_b": rng.normal(0, 0.05, (L, 4 * h)).astype(np.float32),
        "down_w": rng.normal(0, 0.05, (L, h, 4 * h)).astype(np.float32),
        "down_b": rng.normal(0, 0.05, (L, h)).astype(np.float32),
        "ln1_w": np.ones((L, h), np.float32), "ln1_b": np.zeros((L, h), np.float32),
        "ln2_w": np.ones((L, h), np.float32), "ln2_b": np.zeros((L, h), np.float32),
    }
    x = rng.normal(size=(b, s, h)).astype(np.float32)

    ref = run_blocks(jnp.asarray(x), layers, n_head=nh, eps=1e-5,
                     use_gelu=False, attn_impl="xla")
    xp = np.zeros((b, 104, h), np.float32)
    xp[:, :s] = x
    out = run_blocks(jnp.asarray(xp), layers, n_head=nh, eps=1e-5,
                     use_gelu=False, attn_impl="xla", valid_len=s)
    np.testing.assert_allclose(np.asarray(out)[:, :s], np.asarray(ref), **TOL)
    # and the pallas path agrees with the XLA path (interpret on CPU, the
    # real kernel on TPU — where the f32 XLA reference runs as bf16 MXU
    # passes, hence the backend-aware tolerance)
    from conftest import ON_TPU

    outp = run_blocks(jnp.asarray(xp), layers, n_head=nh, eps=1e-5,
                      use_gelu=False, attn_impl="pallas", valid_len=s)
    np.testing.assert_allclose(np.asarray(outp)[:, :s], np.asarray(ref),
                               atol=4e-3 if ON_TPU else 3e-5)
