"""Whole-LAYER kernel race: one pallas_call per transformer layer vs the
two-kernel (attention block + MLP block) production path.

Slope-timed (depth-D1 vs depth-D2 residual chains inside one jit each, per
docs/PERF_NOTES "axon relay" rules): the delta divides out dispatch and
readback.  Correctness: layer_block_pallas vs the two-kernel chain at
tolerance (the fused program may defer the mid-residual's bf16 rounding, so
bit-equality is NOT expected — see the kernel's module comment).

Run: python scripts/proto_layer_kernel.py [b] [s] [h] [nh] [f] [causal]
Defaults: ViT-B/32 bench shapes (384, 50, 768, 12, 3072).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from clip_tpu.ops.actquant_pallas import mlp_lnq_pallas
from clip_tpu.ops.attention_pallas import (
    attn_block_pallas, layer_block_fusable, layer_block_pallas)
from clip_tpu.ops.qtensor import to_w8tensor
from clip_tpu.utils import enable_compile_cache

B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
S = int(sys.argv[2]) if len(sys.argv) > 2 else 50
H = int(sys.argv[3]) if len(sys.argv) > 3 else 768
NH = int(sys.argv[4]) if len(sys.argv) > 4 else 12
F = int(sys.argv[5]) if len(sys.argv) > 5 else 3072
CAUSAL = len(sys.argv) > 6 and sys.argv[6] == "causal"
D1, D2 = 2, 12
ITERS = 20


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={B} S={S} H={H} NH={NH} F={F}"
          f" causal={CAUSAL}", flush=True)
    if not layer_block_fusable(H, 3 * H, H, F, B, S):
        print("layer_block_fusable: GATED OFF at this geometry", flush=True)
    rng = np.random.default_rng(0)
    mk = lambda *shape: jnp.asarray(rng.normal(0, 0.05, shape), jnp.float32)
    qw = to_w8tensor(mk(3 * H, H))
    ow = to_w8tensor(mk(H, H))
    up = to_w8tensor(mk(F, H))
    dn = to_w8tensor(mk(H, F))
    l1w, l1b, l2w, l2b = mk(H) + 1, mk(H), mk(H) + 1, mk(H)
    qb, ob, ub, db = mk(3 * H), mk(H), mk(F), mk(H)
    x = jnp.asarray(rng.normal(0, 1, (B, S, H)), jnp.bfloat16)
    scale = (H // NH) ** -0.5
    kw = dict(n_head=NH, scale=scale, eps=1e-5, causal=CAUSAL)

    def two_kernel_layer(x):
        xm = attn_block_pallas(x, l1w, l1b, qw.c8, qw.ws, qb, ow.c8, ow.ws,
                               ob, residual=True, **kw)
        return mlp_lnq_pallas(
            xm.reshape(B * S, H), l2w, l2b, up.c8, up.ws, ub, dn.c8, dn.ws,
            db, eps=1e-5, act="gelu_quick", residual=True).reshape(B, S, H)

    def one_kernel_layer(x):
        return layer_block_pallas(
            x, l1w, l1b, qw.c8, qw.ws, qb, ow.c8, ow.ws, ob,
            l2w, l2b, up.c8, up.ws, ub, dn.c8, dn.ws, db,
            act="gelu_quick", **kw)

    # correctness first (tolerance — see module docstring)
    a = np.asarray(two_kernel_layer(x), np.float32)
    bv = np.asarray(one_kernel_layer(x), np.float32)
    d = np.abs(a - bv).max()
    cos = (a.ravel() @ bv.ravel()) / (np.linalg.norm(a) * np.linalg.norm(bv))
    print(f"one-vs-two kernel: max|d|={d:.4g} cos={cos:.6f}", flush=True)
    assert cos > 0.9999, cos

    def chain(layer_fn, depth):
        @jax.jit
        def run(x):
            for _ in range(depth):
                x = layer_fn(x)
            return jnp.sum(x.astype(jnp.float32))
        return run

    def timeit(fn, x):
        float(fn(x))  # compile + sync
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                r = fn(x)
            float(r)
            ts.append((time.perf_counter() - t0) / ITERS)
        return min(ts)

    for name, layer_fn in (("two-kernel", two_kernel_layer),
                           ("one-kernel", one_kernel_layer)):
        t1 = timeit(chain(layer_fn, D1), x)
        t2 = timeit(chain(layer_fn, D2), x)
        per_layer = (t2 - t1) / (D2 - D1)
        print(f"{name}: depth{D1} {t1 * 1e3:.2f} ms  depth{D2} {t2 * 1e3:.2f} ms"
              f"  -> {per_layer * 1e3:.3f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
