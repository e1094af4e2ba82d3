"""Prototype: the WHOLE attention block in one Pallas kernel.

Production (round 4): lnq_pallas -> XLA int8 qkv GEMM (writes [M, 3H] bf16)
-> flat attention kernel (reads it; int8 quant_out epilogue) -> XLA int8
o-GEMM.  The [M, 3H] projection write+read is ~176 MB/layer at B/32 B=384 —
pure HBM round-trip between two custom calls.  Splitting the qkv GEMM into
its own Pallas call lost (the codes round-trip replaced the bf16 one, see
proto_attn_int8 negative result); the fix is ONE kernel:

    LN -> row quant -> int8 qkv dot (weights VMEM-resident) -> rescale+bias
       -> per-head block-diagonal attention (bf16 dots, f32 softmax)
       -> concat -> row quant -> int8 o dot -> rescale -> bf16 out

HBM per layer: read x bf16 [M,H], write out bf16 [M,H].  Nothing else.

Timing: SLOPE (depth-2 vs depth-14 residual chains inside one jit, divide by
12) — the proto_attn_int8 single-call timings were dispatch-dominated and
mispredicted the in-model outcome; slope timing is the house rule
(docs/PERF_NOTES.md "Measurement methodology").

Run: python scripts/proto_attnblock.py [B] [S] [H] [NH] [causal]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.models.transformer import attention
from clip_tpu.ops.attention_pallas import _flat_block_b
from clip_tpu.ops.qtensor import to_w8tensor
from clip_tpu.utils import enable_compile_cache

B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
S = int(sys.argv[2]) if len(sys.argv) > 2 else 50
H = int(sys.argv[3]) if len(sys.argv) > 3 else 768
NH = int(sys.argv[4]) if len(sys.argv) > 4 else 12
CAUSAL = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
SCALE = (H // NH) ** -0.5
EPS = 1e-5
NEG_INF = -1e9
DEPTHS = (2, 14)
ITERS = 8


def _qrows(y):
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    s = amax / 127.0 + 1e-12
    return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8), s


def _ablk_kernel(x_ref, lw_ref, lb_ref, qw_ref, qws_ref, qb_ref, ow_ref,
                 ows_ref, o_ref, *, n_head, seq_len, causal, scale,
                 valid_len):
    rt = x_ref.shape[0]
    h = x_ref.shape[1]
    h3 = qw_ref.shape[0]
    hl = h3 // 3
    dh = hl // n_head

    # LN + row quant (same math as lnq_pallas)
    xv = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(xv, axis=1, keepdims=True)
    ms = jnp.mean(xv * xv, axis=1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    y = (xv - mu) * jax.lax.rsqrt(var + EPS)
    y = y * lw_ref[0, :].astype(jnp.float32) + lb_ref[0, :].astype(jnp.float32)
    c1, s1 = _qrows(y)

    # int8 qkv projection, weights resident
    acc = jax.lax.dot_general(
        c1, qw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * s1 * qws_ref[0, :]
           + qb_ref[0, :]).astype(jnp.bfloat16)

    rows = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    invalid = (rows // seq_len) != (cols // seq_len)
    if valid_len < seq_len:
        invalid = jnp.logical_or(invalid, cols % seq_len >= valid_len)
    if causal:
        invalid = jnp.logical_or(invalid, cols % seq_len > rows % seq_len)
    bias = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    ct = (((1,), (1,)), ((), ()))
    cn = (((1,), (0,)), ((), ()))
    outs = []
    for hd in range(n_head):
        qs = slice(hd * dh, (hd + 1) * dh)
        ks = slice(hl + hd * dh, hl + (hd + 1) * dh)
        vs = slice(2 * hl + hd * dh, 2 * hl + (hd + 1) * dh)
        qh = qkv[:, qs] * jnp.asarray(scale, qkv.dtype)
        scores = jax.lax.dot_general(
            qh, qkv[:, ks], ct, preferred_element_type=jnp.float32)
        scores = scores + bias
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(jnp.bfloat16), qkv[:, vs], cn,
            preferred_element_type=jnp.float32)
        outs.append(out)

    yo = jnp.concatenate(outs, axis=1)              # [rt, hl] f32
    c2, s2 = _qrows(yo)
    acc2 = jax.lax.dot_general(
        c2, ow_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc2.astype(jnp.float32) * s2 * ows_ref[0, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "scale", "causal",
                                             "valid_len", "bb", "interpret"))
def attnblock(x, lnw, lnb, qw8, qws, qb, ow8, ows, *, n_head, scale,
              causal=False, valid_len=None, bb=4, interpret=False):
    b, s, h = x.shape
    vl = s if valid_len is None else valid_len
    rt = bb * s
    b_pad = -(-b // bb) * bb
    x2 = x.reshape(b * s, h)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, (b_pad - b) * s), (0, 0)))
    h3 = qw8.shape[0]
    kernel = functools.partial(
        _ablk_kernel, n_head=n_head, seq_len=s, causal=causal, scale=scale,
        valid_len=vl)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad * s, h3 // 3), jnp.bfloat16),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((rt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h3, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h3 // 3, h3 // 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3 // 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, h3 // 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, lnw.reshape(1, h), lnb.reshape(1, h), qw8, qws.reshape(1, h3),
      qb.reshape(1, h3), ow8, ows.reshape(1, h3 // 3))
    return out[: b * s].reshape(b, s, -1)


def main():
    enable_compile_cache()
    bb = _flat_block_b(B, S, 3 * H) or 1
    print(f"backend={jax.default_backend()} B={B} S={S} H={H} NH={NH} "
          f"causal={CAUSAL} bb={bb}", flush=True)
    rng = np.random.default_rng(0)

    def mk(shape, sd=0.05):
        return jnp.asarray(rng.normal(0, sd, shape), jnp.float32)

    lp = dict(
        ln1_w=mk(H) + 1, ln1_b=mk(H),
        qkv_w=to_w8tensor(mk((3 * H, H))), qkv_b=mk(3 * H),
        o_w=to_w8tensor(mk((H, H))), o_b=mk(H),
    )
    x0 = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (B, S, H)), jnp.bfloat16))

    def prod_layer(x):
        return x + attention(
            x, lp, n_head=NH, causal=CAUSAL, compute_dtype=jnp.bfloat16,
            attn_impl="pallas", ln=(lp["ln1_w"], lp["ln1_b"], EPS),
            lnq_fuse=True)

    def ablk_layer(x):
        y = attnblock(
            x, lp["ln1_w"], lp["ln1_b"], lp["qkv_w"].c8, lp["qkv_w"].ws,
            lp["qkv_b"], lp["o_w"].c8, lp["o_w"].ws,
            n_head=NH, scale=SCALE, causal=CAUSAL, bb=bb)
        return x + y + lp["o_b"].astype(y.dtype)

    # numerics: one layer, fused vs production
    ya = np.asarray(jax.jit(prod_layer)(x0), np.float32)
    try:
        yb = np.asarray(jax.jit(ablk_layer)(x0), np.float32)
        rel = np.abs(ya - yb).max() / (np.abs(ya).max() or 1.0)
        cos = (ya.ravel() * yb.ravel()).sum() / (
            np.linalg.norm(ya) * np.linalg.norm(yb))
        print(f"ablk vs prod (1 layer): max rel {rel:.2e}  cos {cos:.6f}",
              flush=True)
    except Exception as e:
        print(f"ablk REJECTED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return

    def chain(layer, d):
        def f(x):
            for _ in range(d):
                x = layer(x)
            return x
        return jax.jit(f)

    def slope(name, layer):
        fns = {d: chain(layer, d) for d in DEPTHS}
        for d in DEPTHS:
            float(jnp.sum(fns[d](x0)))  # compile + warm
        ts = {}
        for d in DEPTHS:
            best = []
            for _ in range(4):
                t0 = time.perf_counter()
                acc = []
                for _ in range(ITERS):
                    acc.append(jnp.sum(fns[d](x0)))
                jax.block_until_ready(acc)
                best.append((time.perf_counter() - t0) / ITERS)
            ts[d] = min(best)
        per_layer = (ts[DEPTHS[1]] - ts[DEPTHS[0]]) / (DEPTHS[1] - DEPTHS[0])
        print(f"{name:6s} depth{DEPTHS[0]} {ts[DEPTHS[0]]*1e3:7.3f} ms  "
              f"depth{DEPTHS[1]} {ts[DEPTHS[1]]*1e3:7.3f} ms  "
              f"-> {per_layer*1e3:7.4f} ms/layer", flush=True)
        return per_layer

    tp = slope("prod", prod_layer)
    ta = slope("ablk", ablk_layer)
    slope("prodb", prod_layer)  # drift check
    print(f"attention-block fusion speedup: {tp / ta:.3f}x", flush=True)


if __name__ == "__main__":
    main()
