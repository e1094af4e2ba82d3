"""Prototype: fused MLP half-layer Pallas kernel vs XLA, slope-timed in-run.

Kernel = LN2 + up-proj + gelu + down-proj + residual over [B, S, H] bf16,
grid over image groups, weights VMEM-resident (constant index_map).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_tpu.ops.nn import gelu_quick, layernorm

B, S, H, F = 256, 50, 768, 3072
EPS = 1e-5


def _kernel(x_ref, lnw_ref, lnb_ref, up_ref, upb_ref, dn_ref, dnb_ref, o_ref):
    g = x_ref.shape[0]
    rows = g * x_ref.shape[1]
    x = x_ref[:].reshape(rows, H)
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + EPS)
    xn = (xn * lnw_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)).astype(x.dtype)
    h = jax.lax.dot_general(xn, up_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + upb_ref[:].astype(jnp.float32)
    h = (h * (1.0 / (1.0 + jnp.exp(-1.702 * h)))).astype(x.dtype)
    y = jax.lax.dot_general(h, dn_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + dnb_ref[:].astype(jnp.float32)
    o_ref[:] = (x32 + y).astype(o_ref.dtype).reshape(*x_ref.shape)


def mlp_pallas(x, lnw, lnb, up, upb, dn, dnb, *, g=8):
    b, s, h = x.shape
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((g, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // g,),
        in_specs=[xspec, full((h,)), full((h,)), full((h, F)), full((F,)),
                  full((F, h)), full((h,))],
        out_specs=xspec,
    )(x, lnw, lnb, up, upb, dn, dnb)


def mlp_xla(x, lnw, lnb, up, upb, dn, dnb):
    hh = layernorm(x, lnw, lnb, EPS)
    hh = jnp.einsum("bsh,hf->bsf", hh, up,
                    preferred_element_type=jnp.float32).astype(x.dtype) + upb
    hh = gelu_quick(hh)
    hh = jnp.einsum("bsf,fh->bsh", hh, dn,
                    preferred_element_type=jnp.float32).astype(x.dtype) + dnb
    return x + hh


def slope(step, args, ds=2, dd=26):
    def make(depth):
        @jax.jit
        def run(x, *w):
            for _ in range(depth):
                x = step(x, *w)
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
    x = jnp.asarray(rng.standard_normal((B, S, H)) * 0.1, jnp.bfloat16)
    lnw = jnp.asarray(1 + rng.standard_normal(H) * 0.01, jnp.bfloat16)
    lnb = jnp.asarray(rng.standard_normal(H) * 0.01, jnp.bfloat16)
    up = jnp.asarray(rng.standard_normal((H, F)) * 0.03, jnp.bfloat16)
    upb = jnp.asarray(rng.standard_normal(F) * 0.01, jnp.bfloat16)
    dn = jnp.asarray(rng.standard_normal((F, H)) * 0.03, jnp.bfloat16)
    dnb = jnp.asarray(rng.standard_normal(H) * 0.01, jnp.bfloat16)
    args = (x, lnw, lnb, up, upb, dn, dnb)

    ref = np.asarray(jax.jit(mlp_xla)(*args), np.float32)
    for g in (4, 8, 16):
        try:
            got = np.asarray(jax.jit(functools.partial(mlp_pallas, g=g))(*args), np.float32)
            rel = np.abs(got - ref).max() / np.abs(ref).max()
            ms = slope(functools.partial(mlp_pallas, g=g), args)
            print(f"pallas g={g:2d}: {ms:.3f} ms/layer  maxrel={rel:.2e}", flush=True)
        except Exception as e:
            print(f"pallas g={g}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
    print(f"xla       : {slope(mlp_xla, args):.3f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
