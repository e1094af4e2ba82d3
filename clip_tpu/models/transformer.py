"""Shared CLIP transformer block, run as a single ``lax.scan`` over stacked
layer parameters.

Numerics mirror the reference graphs (text: /root/reference/clip.cpp:1064-1143,
vision: :1342-1423): pre-LN -> MHA (Q pre-scaled by 1/sqrt(d_head)) -> residual
-> pre-LN -> MLP (tanh-gelu or quick-gelu) -> residual.  Attention softmax runs
in float32.  TPU-first choices: batched einsum attention (seq <= 577, full
attention fits VMEM tiles; no causal-materialization tricks needed), scan over
the stacked layer axis instead of a Python loop, weights consumed through
``qmatmul`` so quantized checkpoints never materialize dense weights in HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.linear import linear
from ..ops.nn import gelu_quick, gelu_tanh, layernorm, softmax


def attention(x, lp, *, n_head: int, mask=None, compute_dtype=jnp.float32):
    """Multi-head self-attention over ``x [B, S, H]``.

    Q/K/V use one fused [3H, H] projection (see models.params): a single wide
    GEMM instead of three narrow ones — the narrow-N case leaves most of the
    128x128 MXU idle.
    """
    b, s, h = x.shape
    d_head = h // n_head
    scale = 1.0 / (d_head ** 0.5)

    qkv = linear(x, lp["qkv_w"], lp["qkv_b"], compute_dtype=compute_dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q * jnp.asarray(scale, compute_dtype)

    q = q.reshape(b, s, n_head, d_head)
    k = k.reshape(b, s, n_head, d_head)
    v = v.reshape(b, s, n_head, d_head)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    attn = softmax(scores.astype(jnp.float32), axis=-1).astype(compute_dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(compute_dtype).reshape(b, s, h)
    return linear(out, lp["o_w"], lp["o_b"], compute_dtype=compute_dtype)


def block(x, lp, *, n_head, eps, use_gelu, mask=None, compute_dtype=jnp.float32):
    h = layernorm(x, lp["ln1_w"], lp["ln1_b"], eps)
    x = x + attention(h, lp, n_head=n_head, mask=mask, compute_dtype=compute_dtype)
    h = layernorm(x, lp["ln2_w"], lp["ln2_b"], eps)
    h = linear(h, lp["up_w"], lp["up_b"], compute_dtype=compute_dtype)
    h = gelu_tanh(h) if use_gelu else gelu_quick(h)
    h = linear(h, lp["down_w"], lp["down_b"], compute_dtype=compute_dtype)
    return x + h


def run_blocks(x, layers, *, n_head, eps, use_gelu, mask=None, compute_dtype=jnp.float32):
    """Scan the transformer stack; ``layers`` leaves carry a leading L axis."""
    f = partial(
        block, n_head=n_head, eps=eps, use_gelu=use_gelu, mask=mask,
        compute_dtype=compute_dtype,
    )

    def step(carry, lp):
        return f(carry, lp), None

    out, _ = jax.lax.scan(step, x, layers)
    return out
