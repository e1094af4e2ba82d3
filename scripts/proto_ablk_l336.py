"""Probe: the whole-attention-block kernel at ViT-L/14-336 geometry
(round-5 VERDICT item #1b).

Round 4 gated attn_block off at rt=584 (L/14-336: S=577 pad-once to 584,
bb=1) because the residency model said 27.1 MB — but that model deliberately
OVERESTIMATES and the geometry was never actually compiled or raced.  This
probe forces the production route (transformer.attention with
attn_block_fusable patched True) and slope-times it against the round-4
staged path at the real L/14-336 shapes.

Run: python scripts/proto_ablk_l336.py [B] [S] [H] [NH]
     default 8 584 1024 16
"""

from __future__ import annotations

import sys
import time
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.models import transformer
from clip_tpu.ops.qtensor import to_w8tensor
from clip_tpu.utils import enable_compile_cache

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 584
H = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
NH = int(sys.argv[4]) if len(sys.argv) > 4 else 16
EPS = 1e-5
DEPTHS = (2, 14)
ITERS = 8


def main():
    enable_compile_cache()
    from clip_tpu.ops.attention_pallas import (
        _ablk_resid, _flat_block_b, attn_block_fusable)
    bb = _flat_block_b(B, S, 3 * H)
    print(f"backend={jax.default_backend()} B={B} S={S} H={H} NH={NH} "
          f"bb={bb} resid-model={_ablk_resid((bb or 1) * S, H, 3 * H, H) / 2**20:.1f} MB "
          f"gate={attn_block_fusable(H, 3 * H, H, B, S)}", flush=True)
    rng = np.random.default_rng(0)

    def mk(shape, sd=0.05):
        return jnp.asarray(rng.normal(0, sd, shape), jnp.float32)

    lp = dict(
        ln1_w=mk(H) + 1, ln1_b=mk(H),
        qkv_w=to_w8tensor(mk((3 * H, H))), qkv_b=mk(3 * H),
        o_w=to_w8tensor(mk((H, H))), o_b=mk(H),
    )
    x0 = jax.device_put(jnp.asarray(rng.normal(0, 1, (B, S, H)), jnp.bfloat16))

    def layer(x, ablk):
        return transformer.attention(
            x, lp, n_head=NH, causal=False, compute_dtype=jnp.bfloat16,
            attn_impl="pallas", ln=(lp["ln1_w"], lp["ln1_b"], EPS),
            lnq_fuse=True, attn_block=ablk, add_residual=True,
            valid_len=577)

    real_gate = transformer.attn_block_fusable

    # compile check + numerics first.  attn_block=True now routes to the
    # PHASED stream kernel at this geometry (the monolithic was verified
    # REJECTED by Mosaic at rt=584 earlier in round 5).
    ya = np.asarray(jax.jit(lambda x: layer(x, False))(x0), np.float32)
    try:
        yb = np.asarray(jax.jit(lambda x: layer(x, True))(x0), np.float32)
    except Exception as e:
        print(f"ablk-stream@584 REJECTED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return
    cos = (ya.ravel() * yb.ravel()).sum() / (
        np.linalg.norm(ya) * np.linalg.norm(yb))
    print(f"ablk@584 compiles; vs staged cos {cos:.6f} "
          f"maxrel {np.abs(ya - yb).max() / np.abs(ya).max():.2e}", flush=True)

    def chain(ablk, d):
        def f(x):
            for _ in range(d):
                x = layer(x, ablk)
            return x
        return jax.jit(f)

    def slope(name, ablk):
        fns = {d: chain(ablk, d) for d in DEPTHS}
        for d in DEPTHS:
            float(jnp.sum(fns[d](x0)))
        ts = {}
        for d in DEPTHS:
            best = []
            for _ in range(4):
                t0 = time.perf_counter()
                acc = [jnp.sum(fns[d](x0)) for _ in range(ITERS)]
                jax.block_until_ready(acc)
                best.append((time.perf_counter() - t0) / ITERS)
            ts[d] = min(best)
        per_layer = (ts[DEPTHS[1]] - ts[DEPTHS[0]]) / (DEPTHS[1] - DEPTHS[0])
        print(f"{name:7s} depth{DEPTHS[0]} {ts[DEPTHS[0]]*1e3:7.3f}  "
              f"depth{DEPTHS[1]} {ts[DEPTHS[1]]*1e3:7.3f}  "
              f"-> {per_layer*1e3:7.4f} ms/layer", flush=True)
        return per_layer

    tp = slope("staged", False)
    ta = slope("ablk", True)
    slope("stagedb", False)
    print(f"attn-block-stream@L/14-336 speedup: {tp / ta:.3f}x", flush=True)


if __name__ == "__main__":
    main()
