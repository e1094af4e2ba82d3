"""Prototype: single-pass Pallas layernorm vs XLA layernorm (slope-timed).

The trace shows 25 convert_reduce_fusion ops at ~0.19 ms each (~4.7 ms/step,
23% of the bench step) — XLA runs LN stats as a separate bandwidth-bound
pass.  A Pallas kernel reads the block once in VMEM, computes stats, and
writes the normalized output: ~40 MB traffic vs ~3 passes.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_tpu.ops.nn import layernorm

B, S, H = 256, 50, 768
EPS = 1e-5


def _ln_kernel(x_ref, w_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)          # [rows, H]
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + EPS)
    y = y * w_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def ln_pallas(x, w, b, *, rows_per_step=1600):
    orig_shape = x.shape
    h = x.shape[-1]
    x2 = x.reshape(-1, h)
    n = x2.shape[0]
    rp = min(rows_per_step, n)
    n_pad = -(-n // rp) * rp
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    xspec = pl.BlockSpec((rp, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ln_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, h), x.dtype),
        grid=(n_pad // rp,),
        in_specs=[xspec, wspec, wspec],
        out_specs=xspec,
    )(x2, w, b)
    return out[:n].reshape(orig_shape)


def slope(step, args, ds=2, dd=50):
    def make(depth):
        @jax.jit
        def run(x, w, b):
            for _ in range(depth):
                x = step(x, w, b) + jnp.bfloat16(0.001) * x
            return jnp.max(x.astype(jnp.float32))
        return run
    rs, rd = make(ds), make(dd)
    np.asarray(rs(*args)); np.asarray(rd(*args))
    def best(r):
        ts = []
        for _ in range(7):
            t0 = time.perf_counter(); np.asarray(r(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(rd) - best(rs)) / (dd - ds) * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, H)), jnp.bfloat16)
    w = jnp.asarray(1 + rng.standard_normal(H) * 0.01, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(H) * 0.01, jnp.bfloat16)

    ref = np.asarray(jax.jit(lambda x, w, b: layernorm(x, w, b, EPS))(x, w, b),
                     np.float32)
    for rp in (800, 1600, 3200):
        got = np.asarray(jax.jit(functools.partial(ln_pallas, rows_per_step=rp))(x, w, b), np.float32)
        rel = np.abs(got - ref).max()
        ms = slope(functools.partial(ln_pallas, rows_per_step=rp), (x, w, b))
        print(f"pallas rp={rp:5d}: {ms:.4f} ms  maxabs={rel:.2e}", flush=True)
    ms = slope(lambda x, w, b: layernorm(x, w, b, EPS), (x, w, b))
    print(f"xla          : {ms:.4f} ms", flush=True)


if __name__ == "__main__":
    main()
