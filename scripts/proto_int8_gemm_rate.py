"""Micro: raw Mosaic int8 GEMM rate vs the XLA int8 dot at the up-proj shape.

Attribution for proto_gemm_gq_kernel.py — if the Pallas dot itself lags XLA's
int8 GEMM the way the bf16 Pallas dot did in round 1 (82 vs 188 TF/s), the
epilogue fusion's bandwidth saving is being eaten by the dot.  Arms share one
window; max-reduce consumers.

Run: python scripts/proto_int8_gemm_rate.py [rows] [K] [N]
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

from clip_tpu.utils import enable_compile_cache

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 22400
K = int(sys.argv[2]) if len(sys.argv) > 2 else 768
N = int(sys.argv[3]) if len(sys.argv) > 3 else 3072
ITERS = 30


@functools.partial(jax.jit, static_argnames=("block_rows", "block_n"))
def pallas_i8_dot(x8, w8, *, block_rows=256, block_n=0):
    m, k = x8.shape
    n = w8.shape[0]
    br = block_rows
    mp = -(-m // br) * br
    xp = jnp.pad(x8, ((0, mp - m), (0, 0)))

    if not block_n:
        def kernel(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.int32),
            grid=(mp // br,),
            in_specs=[
                pl.BlockSpec((br, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((br, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(xp, w8)
        return out[:m]

    bn = block_n

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.int32),
        grid=(mp // br, n // bn),
        in_specs=[
            pl.BlockSpec((br, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(xp, w8)
    return out[:m]


def slope_time(name, fn, inputs, flops):
    outs = [fn(x) for x in inputs[:2]]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        acc = []
        for i in range(ITERS):
            acc.append(jnp.max(jnp.abs(fn(inputs[i % len(inputs)]))))
        jax.block_until_ready(acc)
        ts.append((time.perf_counter() - t0) / ITERS)
    ms = min(ts) * 1e3
    print(f"{name:16s} {ms:7.3f} ms  {flops / (ms * 1e-3) / 1e12:6.1f} TOP/s",
          flush=True)
    return ms


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} [{ROWS},{K}]x[{K},{N}] int8",
          flush=True)
    rng = np.random.default_rng(0)
    w8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (N, K), dtype=np.int8)))
    xs = [jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (ROWS, K), dtype=np.int8))) for _ in range(4)]
    flops = 2.0 * ROWS * K * N

    def xla_dot(x):
        return jax.lax.dot_general(x, w8, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    y0 = np.asarray(jax.jit(xla_dot)(xs[0]))
    for br in (128, 256, 512):
        y1 = np.asarray(pallas_i8_dot(xs[0], w8, block_rows=br))
        assert (y0 == y1).all(), f"pallas dot mismatch br={br}"

    slope_time("xla", jax.jit(xla_dot), xs, flops)
    for br in (128, 256, 512):
        slope_time(f"pallas br={br}", functools.partial(
            pallas_i8_dot, w8=w8, block_rows=br), xs, flops)
    for br, bn in ((256, 512), (256, 1024), (512, 1024)):
        if N % bn == 0:
            slope_time(f"pallas {br}x{bn}", functools.partial(
                pallas_i8_dot, w8=w8, block_rows=br, block_n=bn), xs, flops)


if __name__ == "__main__":
    main()
