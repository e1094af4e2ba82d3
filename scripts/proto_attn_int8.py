"""Prototype: int8-consuming flat attention kernel (VERDICT r3 item #2).

The flat attention kernel reads the bf16 [rt, 3H] qkv projection and is ~3x
over its bandwidth floor on VPU softmax + small-dot work.  If the qkv GEMM
instead emits int8 codes + per-row scales (one gemm-epilogue quantize, same
trick as gemm_gq), the kernel:

  * reads HALF the bytes (3H int8 vs 3H bf16);
  * runs the score dot on the int8 MXU with EXACT int32 accumulation:
    scores_ij = s_i * s_j * (q8_i . k8_j) — the per-row scales factor out
    of the dot entirely (rescale is a rank-1 outer product);
  * (arm "full") also runs the V mix on the int8 MXU: fold V's row scales
    into the f32 probabilities first (p'_ij = p_ij * s_j), then per-row
    quantize p' to int8 and dot with the raw V codes.

Arms (slope-timed, in-run, same pre-staged int8 inputs):

  prod      current flat kernel on the dequantized bf16 qkv (baseline)
  i8score   int8 score dot + f32 softmax + bf16 V mix (V dequant in VMEM)
  i8full    int8 score dot + int8 V mix (p requantized in VMEM)

Numerics: i8score vs prod differs only by bf16-dot vs exact-int32 score
rounding; i8full adds the 8-bit p quantization (bounded, measured here).

Run: python scripts/proto_attn_int8.py [B] [S] [H] [NH] [causal]
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

from clip_tpu.ops.attention_pallas import _flat_block_b, mha_pallas_qkv
from clip_tpu.utils import enable_compile_cache

B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
S = int(sys.argv[2]) if len(sys.argv) > 2 else 50
H = int(sys.argv[3]) if len(sys.argv) > 3 else 768
NH = int(sys.argv[4]) if len(sys.argv) > 4 else 12
CAUSAL = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
SCALE = (H // NH) ** -0.5
ITERS = 30
NEG_INF = -1e9


def _kernel_i8(q_ref, s_ref, o_ref, *, n_head, seq_len, causal, scale,
               full: bool):
    rt = q_ref.shape[0]
    h = q_ref.shape[1] // 3
    dh = h // n_head

    rows = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    invalid = (rows // seq_len) != (cols // seq_len)
    if causal:
        invalid = jnp.logical_or(invalid, cols % seq_len > rows % seq_len)
    bias = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    ct = (((1,), (1,)), ((), ()))
    cn = (((1,), (0,)), ((), ()))
    sx = s_ref[:]                                    # [rt, 1] f32
    # rank-1 rescale of the exact int32 score dot: s_i * s_j * scale
    srow = sx * jnp.float32(scale)                   # [rt, 1]
    scol = sx.reshape(1, rt)                         # [1, rt]

    for hd in range(n_head):
        qs = slice(hd * dh, (hd + 1) * dh)
        ks = slice(h + hd * dh, h + (hd + 1) * dh)
        vs = slice(2 * h + hd * dh, 2 * h + (hd + 1) * dh)
        acc = jax.lax.dot_general(
            q_ref[:, qs], q_ref[:, ks], ct, preferred_element_type=jnp.int32)
        scores = acc.astype(jnp.float32) * srow * scol + bias
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if full:
            # fold V's per-row scales into p, requantize, int8 V mix
            pv = p * scol                            # [rt, rt] f32
            amax = jnp.max(jnp.abs(pv), axis=1, keepdims=True)
            sp = amax / 127.0 + 1e-12
            p8 = jnp.clip(jnp.round(pv / sp), -127, 127).astype(jnp.int8)
            acc2 = jax.lax.dot_general(
                p8, q_ref[:, vs], cn, preferred_element_type=jnp.int32)
            out = acc2.astype(jnp.float32) * sp
        else:
            vh = q_ref[:, vs].astype(jnp.float32) * sx  # dequant V in VMEM
            out = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vh.astype(jnp.bfloat16), cn,
                preferred_element_type=jnp.float32)
        o_ref[:, qs] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "scale", "causal",
                                             "full", "bb"))
def attn_i8(codes, sx, *, n_head, scale, causal=False, full=False, bb=4):
    bs, h3 = codes.shape
    h = h3 // 3
    rt = bb * S
    kernel = functools.partial(
        _kernel_i8, n_head=n_head, seq_len=S, causal=causal, scale=scale,
        full=full)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs, h), jnp.bfloat16),
        grid=(pl.cdiv(bs, rt),),
        in_specs=[
            pl.BlockSpec((rt, h3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(codes, sx)


def slope_time(name, fn, inputs):
    outs = [fn(*x) for x in inputs[:2]]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        acc = []
        for i in range(ITERS):
            r = fn(*inputs[i % len(inputs)])
            acc.append(jnp.max(jnp.abs(r)))
        jax.block_until_ready(acc)
        ts.append((time.perf_counter() - t0) / ITERS)
    ms = min(ts) * 1e3
    print(f"{name:10s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    enable_compile_cache()
    bb = _flat_block_b(B, S, 3 * H)
    print(f"backend={jax.default_backend()} B={B} S={S} H={H} NH={NH} "
          f"causal={CAUSAL} flat bb={bb}", flush=True)
    if bb is None:
        print("flat path ineligible at this shape; nothing to race")
        return
    rng = np.random.default_rng(0)

    ins = []
    for _ in range(4):
        qkv = rng.normal(0, 1, (B * S, 3 * H)).astype(np.float32)
        amax = np.abs(qkv).max(axis=1, keepdims=True)
        s = (amax / 127.0 + 1e-12).astype(np.float32)
        c = np.clip(np.round(qkv / s), -127, 127).astype(np.int8)
        ins.append((jax.device_put(jnp.asarray(c)),
                    jax.device_put(jnp.asarray(s))))

    # baseline consumes the DEQUANTIZED bf16 qkv (what w8a8_pre hands it) —
    # same information content, so kernel formulations race fairly
    deq = [jax.device_put((jnp.asarray(c, jnp.float32) * jnp.asarray(s))
                          .astype(jnp.bfloat16).reshape(B, S, 3 * H))
           for c, s in ins]

    prod = jax.jit(lambda x: mha_pallas_qkv(
        x, n_head=NH, scale=SCALE, causal=CAUSAL))
    f_sc = jax.jit(functools.partial(attn_i8, n_head=NH, scale=SCALE,
                                     causal=CAUSAL, full=False, bb=bb))
    f_fu = jax.jit(functools.partial(attn_i8, n_head=NH, scale=SCALE,
                                     causal=CAUSAL, full=True, bb=bb))

    ref = np.asarray(prod(deq[0]), np.float32).reshape(B * S, H)
    for nm, f in (("i8score", f_sc), ("i8full", f_fu)):
        try:
            got = np.asarray(f(*ins[0]), np.float32)
        except Exception as e:
            print(f"{nm} REJECTED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        d = np.abs(got - ref)
        rel = d.max() / (np.abs(ref).max() or 1.0)
        cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
        print(f"{nm:8s} vs prod: max rel {rel:.2e}  cos {cos:.6f}", flush=True)

    t0 = slope_time("prod", prod, [(x,) for x in deq])
    t1 = slope_time("i8score", f_sc, ins)
    t2 = slope_time("i8full", f_fu, ins)
    slope_time("prod_b", prod, [(x,) for x in deq])
    print(f"speedups: i8score {t0 / t1:.3f}x  i8full {t0 / t2:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
