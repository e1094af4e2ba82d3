"""Micro-benchmark: attention formulations at CLIP shapes.

The score/softmax/value stage is ~1% of ViT-B/32 FLOPs but ~45% of its
runtime (docs/PERF_NOTES.md).  This script races formulations on the real
chip; run as  python scripts/bench_attn.py [B] [S].

Variants
--------
xla_bhqk     current production path (einsum -> [B,H,Q,K] scores in HBM)
xla_bqhk     softmax in [B,Q,H,K] layout (avoids one transpose)
jnn_dpa      jax.nn.dot_product_attention (XLA fused path)
pallas_cur   ops.attention_pallas.mha_pallas (block-diag image stacking)
pallas_hmaj  NEW: head-major [B,H,S,D] layout, grid over (batch, head),
             block-diag image stacking, zero in-kernel relayouts
pallas_qexp  NEW: head-packed Q-expansion — ONE [768,768]x[768,S] dot
             computes all 12 heads' scores (block-diag Q kills cross-head
             terms); softmax over native lanes; one dot for values; mixed
             output extracted with a mask+segment-sum
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_tpu.ops.attention_pallas import mha_pallas
from clip_tpu.ops.nn import softmax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
S = int(sys.argv[2]) if len(sys.argv) > 2 else 50
H = int(sys.argv[3]) if len(sys.argv) > 3 else 768
NH = int(sys.argv[4]) if len(sys.argv) > 4 else 12
DH = H // NH
LAYERS = 12
SCALE = 1.0 / DH ** 0.5
DT = jnp.bfloat16


# ---------------------------------------------------------------- XLA paths
def xla_bhqk(q, k, v):
    b, s, h = q.shape
    qh = q.reshape(b, s, NH, DH)
    kh = k.reshape(b, s, NH, DH)
    vh = v.reshape(b, s, NH, DH)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    attn = softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, s, h)


def xla_bqhk(q, k, v):
    b, s, h = q.shape
    qh = q.reshape(b, s, NH, DH)
    kh = k.reshape(b, s, NH, DH)
    vh = v.reshape(b, s, NH, DH)
    scores = jnp.einsum("bqhd,bkhd->bqhk", qh, kh, preferred_element_type=jnp.float32)
    attn = softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bqhk,bkhd->bqhd", attn, vh, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, s, h)


def jnn_dpa(q, k, v):
    b, s, h = q.shape
    qh = q.reshape(b, s, NH, DH)
    kh = k.reshape(b, s, NH, DH)
    vh = v.reshape(b, s, NH, DH)
    out = jax.nn.dot_product_attention(qh, kh, vh, scale=1.0)  # q pre-scaled
    return out.reshape(b, s, h)


# ------------------------------------------------------- pallas: head-major
def _hmaj_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len):
    g = q_ref.shape[0]
    sp = q_ref.shape[2]
    rows = g * sp
    q = q_ref[:].reshape(rows, DH)
    k = k_ref[:].reshape(rows, DH)
    v = v_ref[:].reshape(rows, DH)
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    bad = (r // sp != c // sp) | (c % sp >= seq_len)
    bias = jnp.where(bad, -1e9, 0.0).astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = out.astype(o_ref.dtype).reshape(g, 1, sp, DH)


def pallas_hmaj_inner(qh, kh, vh, *, seq_len, g):
    b = qh.shape[0]
    sp = qh.shape[2]
    spec = pl.BlockSpec(
        (g, 1, sp, DH), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_hmaj_kernel, seq_len=seq_len),
        out_shape=jax.ShapeDtypeStruct(qh.shape, qh.dtype),
        grid=(b // g, NH),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(qh, kh, vh)


def make_hmaj(g):
    def fn(q, k, v):
        b, s, h = q.shape
        sp = -(-s // 16) * 16
        def prep(x):
            x = x.reshape(b, s, NH, DH).transpose(0, 2, 1, 3)
            return jnp.pad(x, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        out = pallas_hmaj_inner(prep(q), prep(k), prep(v), seq_len=s, g=g)
        return out[:, :, :s, :].transpose(0, 2, 1, 3).reshape(b, s, h)
    return fn


# ------------------------------------------------ pallas: head-packed qexp
def _qexp_kernel(qkv_ref, o_ref, *, seq_len, sp):
    g = qkv_ref.shape[0]
    rows = NH * sp
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, H), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, H), 1)
    same = (r // sp) == (c // DH)
    maskb = same.astype(qkv_ref.dtype)
    maskf = same.astype(jnp.float32)
    for i in range(g):
        q = qkv_ref[i, :, 0:H]                      # [S, H]
        k = qkv_ref[i, :, H:2 * H]
        v = qkv_ref[i, :, 2 * H:3 * H]
        qp = jnp.pad(q, ((0, sp - seq_len), (0, 0)))
        qexp = jnp.broadcast_to(qp[None], (NH, sp, H)).reshape(rows, H) * maskb
        scores = jax.lax.dot_general(                # [rows, S]
            qexp, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv_ref.dtype)
        mixed = jax.lax.dot_general(                 # [rows, H]
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out = (mixed * maskf).reshape(NH, sp, H).sum(axis=0)
        o_ref[i] = out[:seq_len].astype(o_ref.dtype)


def make_qexp(g):
    def fn(q, k, v):
        b, s, h = q.shape
        sp = -(-s // 16) * 16
        qkv = jnp.concatenate([q, k, v], axis=-1)
        in_spec = pl.BlockSpec(
            (g, s, 3 * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (g, s, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            functools.partial(_qexp_kernel, seq_len=s, sp=sp),
            out_shape=jax.ShapeDtypeStruct((b, s, H), q.dtype),
            grid=(b // g,),
            in_specs=[in_spec],
            out_specs=out_spec,
        )(qkv)
    return fn


# ------------------------------------------------------------------ driver
def time_variant(name, fn, q, k, v, check_against=None):
    # Dispatch + host-readback overhead through the axon relay is large and
    # flat, so measure the SLOPE: per_layer = (T(deep) - T(shallow)) / delta.
    def make(depth):
        @jax.jit
        def run(q, k, v):
            x = q
            for _ in range(depth):
                x = fn(x, k, v)
            return jnp.sum(x.astype(jnp.float32))
        return run

    shallow, deep = 2, 50
    run_s, run_d = make(shallow), make(deep)
    try:
        np.asarray(run_s(q, k, v)); np.asarray(run_d(q, k, v))
    except Exception as e:
        print(f"{name:14s}  FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None

    def best(run):
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(run(q, k, v))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_layer = (best(run_d) - best(run_s)) / (deep - shallow) * 1e3
    err = ""
    if check_against is not None:
        got = np.asarray(jax.jit(fn)(q, k, v), np.float32)
        rel = np.abs(got - check_against).max() / (np.abs(check_against).max() + 1e-9)
        err = f"  maxrel={rel:.2e}"
    print(f"{name:14s}  {per_layer:7.3f} ms/layer{err}")
    return per_layer


def main():
    print(f"B={B} S={S} H={H} NH={NH} dtype={DT.__name__} "
          f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H)) * SCALE, DT)
    k = jnp.asarray(rng.standard_normal((B, S, H)), DT)
    v = jnp.asarray(rng.standard_normal((B, S, H)), DT)
    ref = np.asarray(jax.jit(xla_bhqk)(q, k, v), np.float32)

    time_variant("xla_bhqk", xla_bhqk, q, k, v)
    time_variant("xla_bqhk", xla_bqhk, q, k, v, ref)
    time_variant("jnn_dpa", jnn_dpa, q, k, v, ref)
    time_variant(
        "pallas_cur",
        lambda q, k, v: mha_pallas(q, k, v, n_head=NH, scale=1.0),
        q, k, v, ref,
    )
    for g in (2, 4):
        if B % g == 0:
            time_variant(f"pallas_hmaj{g}", make_hmaj(g), q, k, v, ref)
    for g in (1, 2, 4, 8):
        if B % g == 0:
            time_variant(f"pallas_qexp{g}", make_qexp(g), q, k, v, ref)


if __name__ == "__main__":
    main()
