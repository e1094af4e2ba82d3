"""Prototype: fused Pallas layernorm->int8-quantize feeding the int8 MXU.

W8A8 (round 3) quantizes activations per-row at the XLA level: each GEMM's
operand chain is |x| -> row amax (a separate bandwidth-bound reduce pass over
the bf16 activation) -> scale/round/clip (fused into the GEMM operand read).
Every transformer GEMM input is produced by LN, attention or gelu — all
bandwidth-bound ops that already read the full activation.  This prototype
fuses LN + amax + quantize into ONE Pallas pass that emits int8 codes (half
the write bytes of bf16) and per-row scales, so the separate amax pass
disappears; the consumer dot takes pre-quantized codes.

Race (slope-timed, independent pre-staged inputs, max-reduce consumers per
the round-3 harness rules — chained-GEMM timing buries deltas):

  xla     layernorm (ops.nn) + w8a8_matmul  (production pair)
  lnq     Pallas fused LN->q kernel + pre-quantized int8 dot
  ln_only layernorm alone (attributes the LN share)

Numerics: lnq must match xla to ~1 int8 code (same amax math in f32; round
ties can differ).  Run: python scripts/proto_lnq_kernel.py [rows] [H] [N]
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

from clip_tpu.ops.linear import w8a8_matmul
from clip_tpu.ops.nn import layernorm
from clip_tpu.ops.qtensor import W8Tensor
from clip_tpu.utils import enable_compile_cache

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 22400   # B=448 x S=50
H = int(sys.argv[2]) if len(sys.argv) > 2 else 768
N = int(sys.argv[3]) if len(sys.argv) > 3 else 2304       # qkv width
EPS = 1e-5
ITERS = 30


from clip_tpu.ops.actquant_pallas import actq_pallas, lnq_pallas, w8a8_pre


def lnq_prod(x, w, b):
    return lnq_pallas(x, w, b, eps=EPS)


def gq_prod(x):
    return actq_pallas(x, act="gelu_quick")


def slope_time(name, fn, inputs):
    """min-of-slope timing: each call consumes a DIFFERENT pre-staged input
    so nothing chains, each result is max-reduced (fuses into the epilogue)."""
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
    print(f"{name:8s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} rows={ROWS} H={H} N={N}", flush=True)
    rng = np.random.default_rng(0)
    lw = jax.device_put(jnp.asarray(rng.normal(1.0, 0.1, H), jnp.float32))
    lb = jax.device_put(jnp.asarray(rng.normal(0.0, 0.1, H), jnp.float32))
    wf = rng.normal(0, 0.02, (N, H)).astype(np.float32)
    ws = (np.abs(wf).max(axis=1) / 127.0 + 1e-12).astype(np.float32)
    w8 = W8Tensor(
        c8=jax.device_put(jnp.asarray(np.clip(np.round(wf / ws[:, None]), -127, 127), jnp.int8)),
        ws=jax.device_put(jnp.asarray(ws)), qtype="w8")
    xs = [jax.device_put(jnp.asarray(rng.normal(0, 1, (ROWS, H)), jnp.bfloat16))
          for _ in range(4)]

    def path_xla(x):
        return w8a8_matmul(layernorm(x, lw, lb, EPS), w8, compute_dtype=jnp.bfloat16)

    def path_lnq(x):
        codes, sx = lnq_prod(x, lw, lb)
        return w8a8_pre(codes, sx, w8)

    # numerics first: same quantization math -> near-identical outputs
    ya = np.asarray(jax.jit(path_xla)(xs[0]), np.float32)
    yb = np.asarray(jax.jit(path_lnq)(xs[0]), np.float32)
    denom = np.abs(ya).max() or 1.0
    rel = np.abs(ya - yb).max() / denom
    print(f"max rel diff lnq vs xla: {rel:.2e}", flush=True)
    assert rel < 5e-2, "fused LN->q numerics diverge"

    t_x = slope_time("xla", jax.jit(path_xla), xs)
    t_q = slope_time("lnq", jax.jit(path_lnq), xs)
    slope_time("ln_only", jax.jit(lambda x: layernorm(x, lw, lb, EPS)), xs)
    print(f"lnq speedup vs xla pair: {t_x / t_q:.3f}x", flush=True)

    # -- gelu->quant at the down-proj shape: [rows, 4H] is the model's
    # largest activation, so this is where int8 staging pays most
    from clip_tpu.ops.nn import gelu_quick

    f = 4 * H
    wdf = rng.normal(0, 0.02, (H, f)).astype(np.float32)
    wds = (np.abs(wdf).max(axis=1) / 127.0 + 1e-12).astype(np.float32)
    wd8 = W8Tensor(
        c8=jax.device_put(jnp.asarray(
            np.clip(np.round(wdf / wds[:, None]), -127, 127), jnp.int8)),
        ws=jax.device_put(jnp.asarray(wds)), qtype="w8")
    gs = [jax.device_put(jnp.asarray(rng.normal(0, 1, (ROWS, f)), jnp.bfloat16))
          for _ in range(4)]

    def path_xla_g(x):
        return w8a8_matmul(gelu_quick(x), wd8, compute_dtype=jnp.bfloat16)

    def path_gq(x):
        codes, sx = gq_prod(x)
        return w8a8_pre(codes, sx, wd8)

    ya = np.asarray(jax.jit(path_xla_g)(gs[0]), np.float32)
    yb = np.asarray(jax.jit(path_gq)(gs[0]), np.float32)
    rel = np.abs(ya - yb).max() / (np.abs(ya).max() or 1.0)
    print(f"max rel diff gq vs xla_g: {rel:.2e}", flush=True)
    assert rel < 5e-2, "fused gelu->q numerics diverge"

    t_xg = slope_time("xla_g", jax.jit(path_xla_g), gs)
    t_gq = slope_time("gq", jax.jit(path_gq), gs)
    slope_time("gelu", jax.jit(gelu_quick), gs)
    print(f"gq speedup vs xla pair: {t_xg / t_gq:.3f}x", flush=True)


if __name__ == "__main__":
    main()
