"""Prototype race: weight-STREAMED whole-MLP kernel at ViT-H/14 width
(round-5 VERDICT item #1).

At H=1280/4H=5120 the resident-weight whole-MLP kernel is gated off (13.1 MB
of int8 weights leave no usable row block), so H/14 pays the staged chain:
lnq_pallas -> gemm_gq_pallas -> w8a8_pre, which round-trips the [rows, 4H]
int8 codes through HBM.  ``mlp_lnq_stream_pallas`` streams both weight
matrices through VMEM in column chunks (two-phase grid, full-row requant
scale staged in VMEM scratch) and is bit-identical to the staged chain.

Arms (dispatch-pipelined, independent pre-staged inputs, in-run):

  staged        lnq_pallas -> gemm_gq_pallas -> w8a8_pre  (production H/14)
  stream[br,c]  the streamed kernel at several (block_rows, n_chunks)

Run: python scripts/proto_mlp_stream.py [rows] [H] [br:c ...]
     default geometry 8448x1280 (H/14 B=32 x S_pad=264).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.ops.actquant_pallas import (
    gemm_gq_pallas, lnq_pallas, mlp_lnq_stream_pallas, w8a8_pre,
    _mlp_stream_plan)
from clip_tpu.ops.qtensor import W8Tensor
from clip_tpu.utils import enable_compile_cache

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8448   # H/14: B=32 x 264
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
CONFIGS = [tuple(int(v) for v in a.split(":")) for a in sys.argv[3:]] or \
    [(128, 4), (128, 8), (256, 8), (64, 4), (256, 4)]
ITERS = 30
EPS = 1e-5


def timeit(name, fn, inputs):
    outs = [fn(*x) if isinstance(x, tuple) else fn(x) for x in inputs[:2]]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        acc = []
        for i in range(ITERS):
            x = inputs[i % len(inputs)]
            r = fn(*x) if isinstance(x, tuple) else fn(x)
            acc.append(jnp.max(jnp.abs(r)))
        jax.block_until_ready(acc)
        ts.append((time.perf_counter() - t0) / ITERS)
    ms = min(ts) * 1e3
    print(f"{name:16s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    enable_compile_cache()
    f = 4 * H
    print(f"backend={jax.default_backend()} rows={ROWS} H={H} 4H={f} "
          f"weights={(2 * f * H) / 2**20:.1f} MB  "
          f"auto plan={_mlp_stream_plan(ROWS, H, f)}", flush=True)
    rng = np.random.default_rng(0)

    def mkw(nn, kk):
        wf = rng.normal(0, 0.02, (nn, kk)).astype(np.float32)
        ws = (np.abs(wf).max(axis=1) / 127.0 + 1e-12).astype(np.float32)
        c8 = np.clip(np.round(wf / ws[:, None]), -127, 127).astype(np.int8)
        return (jax.device_put(jnp.asarray(c8)), jax.device_put(jnp.asarray(ws)))

    up8, upws = mkw(f, H)
    dn8, dnws = mkw(H, f)
    dn_w = W8Tensor(c8=dn8, ws=dnws, qtype="w8")
    upb = jax.device_put(jnp.asarray(rng.normal(0, 0.05, f), jnp.float32))
    dnb = jax.device_put(jnp.asarray(rng.normal(0, 0.05, H), jnp.float32))
    lnw = jax.device_put(jnp.asarray(rng.normal(1, 0.05, H), jnp.float32))
    lnb = jax.device_put(jnp.asarray(rng.normal(0, 0.05, H), jnp.float32))

    xs = [jax.device_put(jnp.asarray(
        rng.normal(0, 1, (ROWS, H)), jnp.bfloat16)) for _ in range(4)]

    @jax.jit
    def staged(x):
        c, s = lnq_pallas(x, lnw, lnb, eps=EPS)
        c2, s2 = gemm_gq_pallas(c, s, up8, upws, upb, act="gelu_quick")
        h = w8a8_pre(c2, s2, dn_w, jnp.bfloat16)
        return x + (h + dnb.astype(jnp.bfloat16))

    def stream(br, c):
        return jax.jit(functools.partial(
            mlp_lnq_stream_pallas, eps=EPS, act="gelu_quick", residual=True,
            block_rows=br, n_chunks=c))

    # numerics: streamed must be BIT-identical to staged
    ya = np.asarray(staged(xs[0]), np.float32)
    ok_cfgs = []
    for br, c in CONFIGS:
        try:
            fn = stream(br, c)
            yb = np.asarray(
                fn(xs[0], lnw, lnb, up8, upws, upb, dn8, dnws, dnb), np.float32)
        except Exception as e:
            print(f"stream[{br},{c}] REJECTED: {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
            continue
        tag = "bit-equal" if np.array_equal(ya, yb) else \
            f"MISMATCH maxd={np.abs(ya - yb).max():.2e}"
        print(f"stream[{br},{c}] numerics: {tag}", flush=True)
        ok_cfgs.append((br, c, fn))

    print("--- timing (dispatch-pipelined, min of 4 rounds) ---", flush=True)
    timeit("staged", staged, xs)
    for br, c, fn in ok_cfgs:
        timeit(f"stream[{br},{c}]",
               lambda x, fn=fn: fn(x, lnw, lnb, up8, upws, upb, dn8, dnws, dnb),
               xs)
    timeit("staged(again)", staged, xs)  # drift check


if __name__ == "__main__":
    main()
