"""Re-race the whole-MLP kernel against a pure-XLA W8A8 MLP chain (round 5).

bench_int8.py's xla_w8a8 arm runs quant + int8 dot + epilogue at 0.183 ms
for the up shape — XLA's int8 GEMM emitter is ~1.6x faster than the
in-kernel Mosaic dot (588 vs ~370 TOP/s at [19200,768]x[768,3072]).  The
staged path loses to the fused kernel on HBM round-trips, but an ALL-XLA
chain (LN -> quant -> dot -> rescale+bias+gelu -> quant -> dot -> rescale +
bias + residual, everything jnp so XLA fuses epilogues into the GEMMs) was
last raced at the model level in round 1, before the tanh gelu and the
epilogue lessons.  Slope-timed at the bench shape.

Run: python scripts/proto_mlp_xla.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.ops.actquant_pallas import mlp_lnq_pallas, lnq_pallas
from clip_tpu.utils import enable_compile_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
S, H, N4 = 50, 768, 3072
EPS = 1e-5
DEPTHS = (2, 14)
ITERS = 8


def slope(fn, x0, name):
    def chain(d):
        def f(x):
            for _ in range(d):
                x = fn(x)
            return x
        return jax.jit(f)

    fns = {d: chain(d) for d in DEPTHS}
    for d in DEPTHS:
        float(jnp.sum(fns[d](x0)))
    ts = {}
    for d in DEPTHS:
        best = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fns[d](x0)
            float(jnp.sum(out))
            best.append((time.perf_counter() - t0) / ITERS)
        ts[d] = min(best)
    per = (ts[DEPTHS[1]] - ts[DEPTHS[0]]) / (DEPTHS[1] - DEPTHS[0])
    print(f"{name:22s} {per * 1e3:7.4f} ms/layer", flush=True)
    return per


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={BATCH}", flush=True)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (BATCH, S, H)), jnp.bfloat16))
    lw = jnp.asarray(rng.normal(1, 0.1, (H,)), jnp.bfloat16)
    lb = jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.bfloat16)
    uw = jnp.asarray(rng.integers(-127, 128, (N4, H)), jnp.int8)
    uws = jnp.asarray(rng.uniform(1e-3, 2e-3, (N4,)), jnp.float32)
    ub = jnp.asarray(rng.normal(0, 0.02, (N4,)), jnp.float32)
    dw = jnp.asarray(rng.integers(-127, 128, (H, N4)), jnp.int8)
    dws = jnp.asarray(rng.uniform(1e-3, 2e-3, (H,)), jnp.float32)
    db = jnp.asarray(rng.normal(0, 0.02, (H,)), jnp.bfloat16)

    def fused(x):
        b, s, h = x.shape
        return mlp_lnq_pallas(
            x.reshape(b * s, h), lw, lb, uw, uws, ub, dw, dws, db,
            eps=EPS, act="gelu_quick", residual=True).reshape(b, s, h)

    def _q(y):
        amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
        sx = amax / 127.0 + 1e-12
        return jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8), sx

    def xla_chain(x):
        b, s, h = x.shape
        xv = x.reshape(b * s, h).astype(jnp.float32)
        mu = jnp.mean(xv, axis=1, keepdims=True)
        ms = jnp.mean(xv * xv, axis=1, keepdims=True)
        var = jnp.maximum(ms - mu * mu, 0.0)
        y = (xv - mu) * jax.lax.rsqrt(var + EPS)
        y = y * lw.astype(jnp.float32) + lb.astype(jnp.float32)
        c1, s1 = _q(y)
        acc = jax.lax.dot_general(c1, uw, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y2 = acc.astype(jnp.float32) * s1 * uws + ub
        y2 = y2 * (0.5 + 0.5 * jnp.tanh(0.851 * y2))
        c2, s2 = _q(y2)
        acc2 = jax.lax.dot_general(c2, dw, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        t = (acc2.astype(jnp.float32) * s2 * dws).astype(x.dtype)
        t = t + db.astype(x.dtype)
        return x + t.reshape(b, s, h)

    def hybrid(x):
        # Pallas LN+quant producer (one VMEM pass), XLA dots + fused epilogues
        b, s, h = x.shape
        c1, s1 = lnq_pallas(x.reshape(b * s, h), lw, lb, eps=EPS)
        acc = jax.lax.dot_general(c1, uw, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y2 = acc.astype(jnp.float32) * s1 * uws + ub
        y2 = y2 * (0.5 + 0.5 * jnp.tanh(0.851 * y2))
        c2, s2 = _q(y2)
        acc2 = jax.lax.dot_general(c2, dw, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        t = (acc2.astype(jnp.float32) * s2 * dws).astype(x.dtype)
        t = t + db.astype(x.dtype)
        return x + t.reshape(b, s, h)

    slope(fused, x0, "fused mlp_lnq_pallas")
    slope(xla_chain, x0, "all-XLA chain")
    slope(hybrid, x0, "lnq + XLA dots")


if __name__ == "__main__":
    main()
