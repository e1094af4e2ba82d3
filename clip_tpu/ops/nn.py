"""Elementwise / normalization primitives matching ggml semantics.

These replace the reference's ggml VPU-side ops (ggml_norm, ggml_gelu,
ggml_gelu_quick, ggml_soft_max — see the op inventory in SURVEY.md §2.1).
XLA fuses them into surrounding matmuls; no hand-written kernels needed.
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT_2_OVER_PI = 0.7978845608028654


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """ggml_gelu: tanh-approximated GELU (used when clip.use_gelu is true,
    /root/reference/clip.cpp:1130-1131)."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x32 + 0.044715 * x32**3)))
    return y.astype(x.dtype)


def gelu_quick(x: jnp.ndarray) -> jnp.ndarray:
    """ggml_gelu_quick: x * sigmoid(1.702 x) (OpenAI CLIP's quick_gelu,
    /root/reference/clip.cpp:1132-1133).

    Computed via the identity sigmoid(z) = 0.5*(1 + tanh(z/2)) — exactly the
    same function, but tanh lowers to a cheap rational approximation on the
    TPU VPU while the logistic/exp+divide form costs 0.122 ms/layer at the
    B/32 bench shape (measured, scripts/ablate_mlp_kernel.py round 5).  Kept
    identical in ALL paths (XLA, Pallas producers, fused kernels) so fused
    and staged outputs stay bit-matched to each other."""
    x32 = x.astype(jnp.float32)
    y = x32 * (0.5 + 0.5 * jnp.tanh(0.851 * x32))
    return y.astype(x.dtype)


def layernorm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    """ggml_norm + affine (mul/add), computed in float32
    (/root/reference/clip.cpp:1070-1075).

    One-pass moments (E[x^2] - mu^2): both reductions read x once, so XLA
    emits a single fused stats pass instead of two (measured +0.8% end-to-end
    at ViT-B/32 B=256).  f32 accumulation keeps the cancellation error ~1e-6
    at CLIP activation magnitudes.
    """
    import jax

    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    ms = (x32 * x32).mean(axis=-1, keepdims=True)
    # E[x^2]-mu^2 can cancel slightly negative for near-constant rows with a
    # large mean; rsqrt(var+eps) would then be NaN and leak through the
    # additive attention masks into real rows.  Clamp is free (fuses).
    var = jnp.maximum(ms - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)


def softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Max-subtracted softmax in float32 (ggml_soft_max)."""
    x32 = x.astype(jnp.float32)
    m = x32.max(axis=axis, keepdims=True)
    e = jnp.exp(x32 - m)
    return (e / e.sum(axis=axis, keepdims=True)).astype(x.dtype)


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """In-graph L2 normalization (sqrt∘sum∘sqr + scale,
    /root/reference/clip.cpp:1163-1166)."""
    x32 = x.astype(jnp.float32)
    inv = jnp.reciprocal(jnp.sqrt((x32 * x32).sum(axis=axis, keepdims=True)))
    return (x32 * inv).astype(x.dtype)
