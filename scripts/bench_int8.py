"""Micro-benchmark: int8 MXU GEMMs vs bf16 at CLIP MLP shapes.

The chip measures ~1,830 TOP/s int8 vs ~260 TF/s bf16 (docs/PERF_NOTES.md
hardware note), so a quantized-activation (W8A8/W4A8) GEMM could in principle
run ~4x faster than the current bf16 path.  Round 1 found the XLA-level W8A8
pipeline LOSES (elementwise quantize passes eat the gain); this script
measures whether an IN-KERNEL Pallas dynamic quant changes that:

  xla_bf16        production path (dequant folded into the GEMM by XLA)
  xla_w8a8        full XLA-level dynamic quant pipeline (round-1 loser, re-race)
  xla_int8_pre    raw XLA int8 dot, inputs already int8 (TOP/s ceiling probe)
  pallas_bf16     plain pallas bf16 dot (known ~82 TF/s at M=12.8k)
  pallas_int8_pre raw pallas int8 dot, inputs already int8
  pallas_w8a8     bf16 input, IN-KERNEL per-row quant -> int8 dot -> scale
                  epilogue (the W4A8 inner loop without the nibble unpack)

Run: python scripts/bench_int8.py [M] [K] [N]
Defaults M=12800 K=768 N=3072 (ViT-B/32 MLP-up at B=256).
All numbers are within-run slope timings (depth 2 vs 18 chained inside one
jit; each chain step re-derives the next input from the output so XLA cannot
factor or CSE the loop).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = int(sys.argv[1]) if len(sys.argv) > 1 else 12800
K = int(sys.argv[2]) if len(sys.argv) > 2 else 768
N = int(sys.argv[3]) if len(sys.argv) > 3 else 3072

FLOPS = 2 * M * K * N


# ------------------------------------------------------------------ variants
def xla_bf16(x, wT, w8T, wscale):
    # x [M,K] bf16, wT [K,N] bf16
    return jnp.dot(x, wT, preferred_element_type=jnp.float32)


def xla_int8_pre(x8, wT, w8T, wscale):
    # x8 [M,K] int8, w8T [K,N] int8 -> int32
    return jax.lax.dot_general(
        x8, w8T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


def xla_w8a8(x, wT, w8T, wscale):
    # full dynamic-quant pipeline at the XLA level
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
    sx = amax / 127.0 + 1e-12
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w8T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * wscale[None, :]


def _k_bf16(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _k_int8(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def _k_w8a8(x_ref, w_ref, ws_ref, o_ref):
    x = x_ref[:]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    sx = amax / 127.0 + 1e-12
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * sx * ws_ref[:].astype(jnp.float32)


def make_pallas(kind, bm, bn):
    grid = (M // bm, N // bn)

    def fn(x, wT, w8T, wscale):
        if kind == "bf16":
            kern, xin, win = _k_bf16, x, wT.T
            odt = jnp.float32
        elif kind == "int8":
            kern, xin, win = _k_int8, x, w8T.T
            odt = jnp.int32
        else:
            kern, xin, win = _k_w8a8, x, w8T.T
            odt = jnp.float32
        in_specs = [
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ]
        args = [xin, win]
        if kind == "w8a8":
            in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(wscale[None, :])
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), odt),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=FLOPS, bytes_accessed=M * K + N * K + 4 * M * N,
                transcendentals=0),
        )(*args)

    return fn


# ------------------------------------------------------------------ driver
DEEP, SHALLOW = 18, 2


def time_variant(name, fn, xs, args):
    """Slope timing over INDEPENDENT GEMMs: depth-d runs d distinct
    pre-staged inputs through fn, each output consumed by a max-reduce that
    XLA fuses into the GEMM epilogue.  (Chaining outputs back into inputs —
    the usual anti-DCE trick — costs a full [M, N] HBM read per step here,
    ~0.35 ms at these shapes, which buried the GEMM differences: every
    variant measured 53-63 'TF/s'.  Distinct inputs kill CSE; the fused
    reduce kills DCE and slicing; no chain bandwidth.)"""

    def make(depth):
        @jax.jit
        def run(xs, *a):
            acc = jnp.float32(0)
            for i in range(depth):
                y = fn(xs[i], *a)
                acc = acc + jnp.max(jnp.abs(y).astype(jnp.float32))
            return acc
        return run

    run_s, run_d = make(SHALLOW), make(DEEP)
    try:
        np.asarray(run_s(xs, *args)); np.asarray(run_d(xs, *args))
    except Exception as e:
        print(f"{name:16s}  FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None

    def best(run):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(xs, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per = (best(run_d) - best(run_s)) / (DEEP - SHALLOW)
    eff = FLOPS / per / 1e12
    print(f"{name:16s}  {per * 1e3:7.3f} ms/gemm  {eff:7.1f} T(FL)OP/s", flush=True)
    return per


def main():
    from clip_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print(f"M={M} K={K} N={N} backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    xs = tuple(jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
               for _ in range(DEEP))
    xs8 = tuple(jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
                for _ in range(DEEP))
    w = rng.standard_normal((N, K)).astype(np.float32)
    wT = jnp.asarray(w.T, jnp.bfloat16)
    w8 = np.clip(np.round(w / (np.abs(w).max(1, keepdims=True) / 127)), -127, 127)
    w8T = jnp.asarray(w8.T, jnp.int8)
    wscale = jnp.asarray(np.abs(w).max(1) / 127, jnp.float32)

    time_variant("xla_bf16", xla_bf16, xs, (wT, w8T, wscale))
    time_variant("xla_int8_pre", xla_int8_pre, xs8, (wT, w8T, wscale))
    time_variant("xla_w8a8", xla_w8a8, xs, (wT, w8T, wscale))
    for bm, bn in ((256, 256), (512, 512)):
        if M % bm or N % bn:
            continue
        time_variant(f"pl_bf16_{bm}x{bn}", make_pallas("bf16", bm, bn), xs,
                     (wT, w8T, wscale))
        time_variant(f"pl_int8_{bm}x{bn}", make_pallas("int8", bm, bn), xs8,
                     (wT, w8T, wscale))
        time_variant(f"pl_w8a8_{bm}x{bn}", make_pallas("w8a8", bm, bn), xs,
                     (wT, w8T, wscale))


if __name__ == "__main__":
    main()
