"""Prototype: Pallas int8 GEMM with a fused bias+gelu->int8-requant epilogue.

Round 3's fused producers stop at the GEMM boundary: the up-projection runs
as an XLA int8 dot that writes its [rows, 4H] output to HBM in bf16, and
``actq_pallas`` reads all of it back to gelu+quantize it for the down
projection.  That bf16 round-trip of the model's LARGEST activation is pure
bandwidth (~0.3 ms write + ~0.3 ms read per layer at B/32 B=448) — the trace
shows the gelu->quant producer running at its bandwidth floor.

This prototype moves the GEMM itself into Pallas so the epilogue (rescale +
bias + gelu + row-amax + int8 quantize) happens while the output tile is
still in VMEM: HBM sees int8 codes only, the bf16 intermediate never exists.
The open question is whether a Mosaic int8 dot reaches XLA's int8-GEMM rate
at M=22k (the bf16 Pallas dot measured 82 vs 188 TF/s at this M in round 1 —
if int8 has the same gap, the bandwidth saving drowns).

Race (slope-timed, independent pre-staged inputs, max-reduce consumers):

  prod    w8a8_pre (XLA int8 dot) + bias -> actq_pallas -> down w8a8_pre
  fused   gemm_gq (this kernel)                          -> down w8a8_pre
  up_prod / up_fused   the producer half alone (attribution)

Run: python scripts/proto_gemm_gq_kernel.py [rows] [H] [block_rows...]
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

from clip_tpu.ops.actquant_pallas import actq_pallas, w8a8_pre
from clip_tpu.ops.qtensor import W8Tensor
from clip_tpu.utils import enable_compile_cache

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 22400   # B=448 x S=50
H = int(sys.argv[2]) if len(sys.argv) > 2 else 768
BLOCKS = [int(a) for a in sys.argv[3:]] or [128, 256, 512]
ITERS = 30


def _gelu(y, act):
    if act == "gelu_quick":
        return y * jax.lax.logistic(1.702 * y)
    if act == "gelu_tanh":
        c = 0.7978845608028654
        return 0.5 * y * (1.0 + jnp.tanh(c * (y + 0.044715 * y * y * y)))
    return y


@functools.partial(jax.jit, static_argnames=("act", "block_rows", "interpret"))
def gemm_gq(codes, sx, w8, ws, bias, *, act="gelu_quick", block_rows=256,
            interpret=False):
    """codes [M,K] int8, sx [M,1] f32  @  w8 [N,K] int8 (scales ws [N]) + bias
    -> gelu -> per-row int8 requant -> (codes [M,N] int8, scales [M,1] f32).

    Weights stay VMEM-resident across the whole M grid (int8 [N,K] is 2.4 MB
    at CLIP-B shapes); each grid step dots one row block on the int8 MXU and
    quantizes it before it ever leaves VMEM.
    """
    m, k = codes.shape
    n = w8.shape[0]
    br = block_rows
    mp = -(-m // br) * br
    xp = jnp.pad(codes, ((0, mp - m), (0, 0)))
    sp = jnp.pad(sx, ((0, mp - m), (0, 0)))
    ws2 = ws.reshape(1, n)
    b2 = bias.reshape(1, n)

    def kernel(x_ref, sx_ref, w_ref, ws_ref, b_ref, o_ref, s_ref):
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx_ref[:] * ws_ref[0, :] + b_ref[0, :]
        y = _gelu(y, act)
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        s = amax / 127.0 + 1e-12
        o_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
        s_ref[:] = s

    out, scales = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((mp, n), jnp.int8),
                   jax.ShapeDtypeStruct((mp, 1), jnp.float32)),
        grid=(mp // br,),
        in_specs=[
            pl.BlockSpec((br, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, sp, w8, ws2, b2)
    return out[:m], scales[:m]


def slope_time(name, fn, inputs):
    outs = [fn(*x) for x in inputs[:2]]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        acc = []
        for i in range(ITERS):
            r = fn(*inputs[i % len(inputs)])
            r = r[0] if isinstance(r, tuple) else r
            acc.append(jnp.max(jnp.abs(r)))
        jax.block_until_ready(acc)
        ts.append((time.perf_counter() - t0) / ITERS)
    ms = min(ts) * 1e3
    print(f"{name:10s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    enable_compile_cache()
    f = 4 * H
    print(f"backend={jax.default_backend()} rows={ROWS} H={H} 4H={f}", flush=True)
    rng = np.random.default_rng(0)

    def mkw(nn, kk):
        wf = rng.normal(0, 0.02, (nn, kk)).astype(np.float32)
        ws = (np.abs(wf).max(axis=1) / 127.0 + 1e-12).astype(np.float32)
        c8 = np.clip(np.round(wf / ws[:, None]), -127, 127).astype(np.int8)
        return (jax.device_put(jnp.asarray(c8)), jax.device_put(jnp.asarray(ws)))

    up8, upws = mkw(f, H)
    dn8, dnws = mkw(H, f)
    up_w = W8Tensor(c8=up8, ws=upws, qtype="w8")
    dn_w = W8Tensor(c8=dn8, ws=dnws, qtype="w8")
    bias = jax.device_put(jnp.asarray(rng.normal(0, 0.05, f), jnp.float32))

    # pre-quantized int8 inputs (what lnq_pallas hands the up projection)
    xs = []
    for _ in range(4):
        xf = rng.normal(0, 1, (ROWS, H)).astype(np.float32)
        amax = np.abs(xf).max(axis=1, keepdims=True)
        s = amax / 127.0 + 1e-12
        c = np.clip(np.round(xf / s), -127, 127).astype(np.int8)
        xs.append((jax.device_put(jnp.asarray(c)), jax.device_put(jnp.asarray(s, dtype=jnp.float32))))

    def up_prod(c, s):
        y = w8a8_pre(c, s, up_w, jnp.bfloat16) + bias.astype(jnp.bfloat16)
        return actq_pallas(y, act="gelu_quick")

    def full_prod(c, s):
        c2, s2 = up_prod(c, s)
        return w8a8_pre(c2, s2, dn_w, jnp.bfloat16)

    fused_fns = {}
    for br in BLOCKS:
        fused_fns[br] = functools.partial(gemm_gq, w8=up8, ws=upws, bias=bias,
                                          block_rows=br)

    def full_fused(c, s, br):
        c2, s2 = fused_fns[br](c, s)
        return w8a8_pre(c2, s2, dn_w, jnp.bfloat16)

    # numerics: fused vs production through the down GEMM
    ya = np.asarray(jax.jit(full_prod)(*xs[0]), np.float32)
    for br in BLOCKS[:1]:
        yb = np.asarray(jax.jit(functools.partial(full_fused, br=br))(*xs[0]),
                        np.float32)
        rel = np.abs(ya - yb).max() / (np.abs(ya).max() or 1.0)
        print(f"max rel diff fused(br={br}) vs prod: {rel:.2e}", flush=True)
        assert rel < 5e-2, "fused gemm epilogue numerics diverge"

    t_up_prod = slope_time("up_prod", jax.jit(up_prod), xs)
    for br in BLOCKS:
        slope_time(f"up_fuse{br}", jax.jit(functools.partial(fused_fns[br])), xs)
    t_prod = slope_time("prod", jax.jit(full_prod), xs)
    for br in BLOCKS:
        t_f = slope_time(f"fused{br}", jax.jit(functools.partial(full_fused, br=br)), xs)
        print(f"  full-chain speedup br={br}: {t_prod / t_f:.3f}x", flush=True)


if __name__ == "__main__":
    main()
