"""Micro-benchmark: GEMM dtype options at CLIP shapes (slope-timed).

ViT-B/32 B=256 folds to M=12800 rows; the MLP GEMMs are [M,768]x[768,3072]
and [M,3072]x[3072,768]; QKV is [M,768]x[768,2304].  Each variant CHAINS
the GEMM output back into the next input (slice + cast), so XLA cannot CSE,
DCE, or algebraically collapse the loop; slope timing removes dispatch
overhead.  bf16 peak on v5e is 197 TF/s; int8 is 394 TOP/s.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

M = int(sys.argv[1]) if len(sys.argv) > 1 else 12800
K, N = 768, 3072
DEPTH_S, DEPTH_D = 2, 26


def slope(step, x0, w, flops):
    def make(depth):
        @jax.jit
        def run(x, w):
            for _ in range(depth):
                x = step(x, w)
            return x[0, 0].astype(jnp.float32)
        return run

    rs, rd = make(DEPTH_S), make(DEPTH_D)
    np.asarray(rs(x0, w)); np.asarray(rd(x0, w))

    def best(run):
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(run(x0, w))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per = (best(rd) - best(rs)) / (DEPTH_D - DEPTH_S)
    return per * 1e3, flops / per / 1e12


def main():
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    flops = 2.0 * M * K * N

    def s_bf16(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return y[:, :K].astype(jnp.bfloat16)

    def s_i8(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.int32)
        return (y[:, :K] >> 12).astype(jnp.int8)

    def s_i8_dyn(x, w):
        # bf16 activations -> per-row dynamic int8 quant -> int8 MXU -> dequant
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
        scale = jnp.maximum(amax, 1e-6) / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
        acc = jnp.dot(xq, w, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * scale * 1e-4
        return y[:, :K].astype(jnp.bfloat16)

    for name, step, x0, w in [
        ("bf16", s_bf16, x16, w16),
        ("int8xint8", s_i8, x8, w8),
        ("bf16->int8 dyn", s_i8_dyn, x16, w8),
    ]:
        try:
            ms, tf = slope(step, x0, w, flops)
            print(f"{name:16s} {ms:7.3f} ms  {tf:7.1f} TF/s")
        except Exception as e:
            print(f"{name:16s} FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    print(f"M={M} K={K} N={N} backend={jax.default_backend()}")
    main()
