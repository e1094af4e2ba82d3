"""TP performance story (round-5 VERDICT item #6): what does the tensor-
parallel route cost per layer on one chip, versus the single-shard route?

Under ``tp_axis`` the whole-block kernels still run (transformer.attention
routes the PRE-BIAS kernel variant and psums before bias+residual, the
Megatron pattern), so the only on-chip delta vs the single-shard route is
the epilogue: the in-kernel bias+residual fold is OFF and the stream takes
two XLA passes over [rows, H] after the psum.  This script slope-times, at
the B/32 bench shape:

  attn resid      attn_block_pallas(residual=True)       single-shard route
  attn tp-epi     attn_block_pallas(ob=None) + psum-less bias+residual (XLA)
  mlp  resid      mlp_lnq_pallas(residual=True)
  mlp  tp-epi     mlp_lnq_pallas(dnb=None) + bias+residual (XLA)

The psum itself is a no-op on one shard (its cost on a real pod is ICI
collective time, not measurable here); the tp-epi arms measure everything
else the TP route pays.  Run: python scripts/bench_tp_epilogue.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.ops.attention_pallas import attn_block_pallas
from clip_tpu.ops.actquant_pallas import mlp_lnq_pallas
from clip_tpu.utils import enable_compile_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
S, H, NH, N4 = 50, 768, 12, 3072
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
    print(f"{name:12s} {per * 1e3:7.4f} ms/layer", flush=True)
    return per


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={BATCH}", flush=True)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (BATCH, S, H)), jnp.bfloat16))
    lw = jnp.asarray(rng.normal(1, 0.1, (H,)), jnp.bfloat16)
    lb = jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.bfloat16)
    qw = jnp.asarray(rng.integers(-127, 128, (3 * H, H)), jnp.int8)
    qws = jnp.asarray(rng.uniform(1e-3, 2e-3, (3 * H,)), jnp.float32)
    qb = jnp.asarray(rng.normal(0, 0.02, (3 * H,)), jnp.float32)
    ow = jnp.asarray(rng.integers(-127, 128, (H, H)), jnp.int8)
    ows = jnp.asarray(rng.uniform(1e-3, 2e-3, (H,)), jnp.float32)
    ob = jnp.asarray(rng.normal(0, 0.02, (H,)), jnp.bfloat16)
    uw = jnp.asarray(rng.integers(-127, 128, (N4, H)), jnp.int8)
    uws = jnp.asarray(rng.uniform(1e-3, 2e-3, (N4,)), jnp.float32)
    ub = jnp.asarray(rng.normal(0, 0.02, (N4,)), jnp.float32)
    dw = jnp.asarray(rng.integers(-127, 128, (H, N4)), jnp.int8)
    dws = jnp.asarray(rng.uniform(1e-3, 2e-3, (H,)), jnp.float32)
    db = jnp.asarray(rng.normal(0, 0.02, (H,)), jnp.bfloat16)
    scale = (H // NH) ** -0.5

    def attn_resid(x):
        return attn_block_pallas(
            x, lw, lb, qw, qws, qb, ow, ows, ob, n_head=NH, scale=scale,
            eps=EPS, residual=True)

    def attn_tp(x):
        proj = attn_block_pallas(
            x, lw, lb, qw, qws, qb, ow, ows, n_head=NH, scale=scale, eps=EPS)
        # on a pod: proj = jax.lax.psum(proj, tp_axis) here (ICI time)
        return x + (proj + ob.astype(proj.dtype))

    def mlp_resid(x):
        b, s, h = x.shape
        return mlp_lnq_pallas(
            x.reshape(b * s, h), lw, lb, uw, uws, ub, dw, dws, db,
            eps=EPS, act="gelu_quick", residual=True).reshape(b, s, h)

    def mlp_tp(x):
        b, s, h = x.shape
        proj = mlp_lnq_pallas(
            x.reshape(b * s, h), lw, lb, uw, uws, ub, dw, dws,
            eps=EPS, act="gelu_quick").reshape(b, s, h)
        return x + (proj + db.astype(proj.dtype))

    ar = slope(attn_resid, x0, "attn resid")
    at = slope(attn_tp, x0, "attn tp-epi")
    mr = slope(mlp_resid, x0, "mlp resid")
    mt = slope(mlp_tp, x0, "mlp tp-epi")
    tot = (at + mt) - (ar + mr)
    print(f"\nTP epilogue penalty: {tot * 1e3:+.4f} ms/layer "
          f"({tot * 12 * 1e3:+.2f} ms/step at 12 layers, "
          f"{100 * tot * 12 / ((ar + mr) * 12):+.1f}% of layer time)")


if __name__ == "__main__":
    main()
