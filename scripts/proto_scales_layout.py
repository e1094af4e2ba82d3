"""Prototype: lane-oriented [1, M] per-row scales vs the [M, 1] column.

The producer kernels emit per-row scales as f32[M, 1]; in XLA's T(8,128)
tiling that column physically occupies 128 lanes per row (11.5 MB at
M=22400), and every XLA-side consumer fusion (w8a8_pre's rescale for the
qkv/o/down GEMMs) squeezes it to [M] via a reduce that reads the whole
padded buffer — 24 such squeezes in the B=448 program (~5.3% of the
compiler's cycle estimate; see docs/PERF_NOTES.md round-3 residue hunt).

A [1, M] row-vector tiles as 8 sublanes x M lanes (16x smaller) but needs
an in-kernel [br,1]->[1,br] relayout per block.  This script first checks
that Mosaic lowers that relayout at all, then races the isolated
lnq -> w8a8_pre chain both ways at the production shape.

Run: python scripts/proto_scales_layout.py
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

from clip_tpu.ops.actquant_pallas import lnq_pallas, w8a8_pre, _block_rows, _ROW_BUDGET
from clip_tpu.ops.qtensor import to_w8tensor
from clip_tpu.utils import enable_compile_cache

M, H, N = 22400, 768, 2304
ITERS = 30


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def lnq_pallas_t(x, w, b, *, eps: float, block_rows: int | None = None):
    """lnq_pallas variant emitting scales as [1, M] (lane-oriented).

    The scale block is (1, br), so br must tile the 128-wide lanes —
    round the default row block down to a multiple of 128."""
    rows, h = x.shape
    br = block_rows or max(128, (_block_rows(rows, h, _ROW_BUDGET) // 128) * 128)
    w2 = w.reshape(1, h)
    b2 = b.reshape(1, h)

    def kernel(x_ref, w_ref, b_ref, o_ref, s_ref):
        xv = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xv, axis=1, keepdims=True)
        ms = jnp.mean(xv * xv, axis=1, keepdims=True)
        var = jnp.maximum(ms - mu * mu, 0.0)
        y = (xv - mu) * jax.lax.rsqrt(var + eps)
        y = y * w_ref[0, :].astype(jnp.float32) + b_ref[0, :].astype(jnp.float32)
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        sx = amax / 127.0 + 1e-12
        o_ref[:] = jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8)
        s_ref[:] = sx.reshape(1, -1)  # [br,1] -> [1,br] relayout in VMEM

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, h), jnp.int8),
                   jax.ShapeDtypeStruct((1, rows), jnp.float32)),
        grid=(pl.cdiv(rows, br),),
        in_specs=[
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
    )(x, w2, b2)


def w8a8_pre_t(codes, sx_t, w, compute_dtype=jnp.bfloat16):
    acc = jax.lax.dot_general(
        codes, w.c8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx_t[0][:, None] * w.ws[None, :]
    return y.astype(compute_dtype)


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} [{M},{H}]x[{N},{H}]", flush=True)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (M, H), jnp.bfloat16)
    lw = jnp.ones((H,), jnp.float32)
    lb = jnp.zeros((H,), jnp.float32)
    w = to_w8tensor(jax.random.normal(jax.random.PRNGKey(1), (N, H),
                                      jnp.float32) * 0.02)

    # correctness first
    c1, s1 = lnq_pallas(x, lw, lb, eps=1e-5)
    c2, s2 = lnq_pallas_t(x, lw, lb, eps=1e-5)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(s1)[:, 0], np.asarray(s2)[0])
    y1 = np.asarray(w8a8_pre(c1, s1, w), np.float32)
    y2 = np.asarray(w8a8_pre_t(c2, s2, w), np.float32)
    np.testing.assert_array_equal(y1, y2)
    print("numerics: column==row-vector bit-exact", flush=True)

    col = jax.jit(lambda x: w8a8_pre(*lnq_pallas(x, lw, lb, eps=1e-5), w))
    rowv = jax.jit(lambda x: w8a8_pre_t(*lnq_pallas_t(x, lw, lb, eps=1e-5), w))

    def run_one(name, f):
        out = f(x)
        float(jnp.sum(out))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = f(x)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / ITERS)
        print(f"{name:10s} {min(ts) * 1e3:7.3f} ms", flush=True)

    run_one("col[M,1]", col)
    run_one("rowv[1,M]", rowv)
    run_one("col_b", col)


if __name__ == "__main__":
    main()
