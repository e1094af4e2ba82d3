"""Prototype: the WHOLE MLP in one Pallas kernel (VERDICT r3 item #1).

The round-3 production path already keeps the [rows, 4H] bf16 up-output in
VMEM (``gemm_gq_pallas`` fuses bias+gelu+requant into the up-GEMM) — but it
still writes the int8 codes of that largest activation to HBM for
``w8a8_pre`` to read straight back for the down-GEMM.  At B/32 B=384 that is
2 x 19200 x 3072 int8 bytes/layer (~118 MB/step over 12 layers) of pure
round-trip.  This prototype K-blocks nothing: at H <= 1024 BOTH weight
matrices fit VMEM-resident (int8 [4H,H] + [H,4H] = 4.7 MB at H=768,
8.4 MB at H=1024), so one row-grid kernel runs

    (ln ->) quant -> int8 up-dot -> rescale+bias -> gelu -> row requant
          -> int8 down-dot -> rescale -> bf16 out

and the 4H intermediate never exists outside VMEM in ANY dtype.

Race arms (slope-timed, independent pre-staged inputs, in-run):

  prod    lnq_pallas -> gemm_gq_pallas -> w8a8_pre   (round-3 default)
  mlp2    lnq_pallas -> fused up+gelu+rq+down kernel (codes in, bf16 out)
  mlp3    ONE kernel: LN inside too (raw bf16 residual in, bf16 out)

Run: python scripts/proto_mlp_fused_kernel.py [rows] [H] [block_rows...]
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

from clip_tpu.ops.actquant_pallas import gemm_gq_pallas, lnq_pallas, w8a8_pre
from clip_tpu.ops.qtensor import W8Tensor
from clip_tpu.utils import enable_compile_cache

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 19200   # B=384 x S=50
H = int(sys.argv[2]) if len(sys.argv) > 2 else 768
BLOCKS = [int(a) for a in sys.argv[3:]] or [64, 128, 192, 256]
ITERS = 30
EPS = 1e-5


def _gelu(y, act):
    if act == "gelu_quick":
        return y * jax.lax.logistic(1.702 * y)
    c = 0.7978845608028654
    return 0.5 * y * (1.0 + jnp.tanh(c * (y + 0.044715 * y * y * y)))


def _qrows(y):
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    s = amax / 127.0 + 1e-12
    return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8), s


@functools.partial(jax.jit, static_argnames=("act", "block_rows", "interpret"))
def mlp2(codes, sx, up8, upws, upb, dn8, dnws, *, act="gelu_quick",
         block_rows=256, interpret=False):
    """Pre-quantized codes in -> down-GEMM bf16 out; both weights resident."""
    m, k = codes.shape
    n = up8.shape[0]
    br = block_rows
    upws2, upb2, dnws2 = upws.reshape(1, n), upb.reshape(1, n), dnws.reshape(1, k)

    def kernel(x_ref, sx_ref, uw_ref, uws_ref, ub_ref, dw_ref, dws_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[:], uw_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx_ref[:] * uws_ref[0, :] + ub_ref[0, :]
        y = _gelu(y, act)
        c2, s2 = _qrows(y)
        acc2 = jax.lax.dot_general(
            c2, dw_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = (acc2.astype(jnp.float32) * s2 * dws_ref[0, :]).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.bfloat16),
        grid=(pl.cdiv(m, br),),
        in_specs=[
            pl.BlockSpec((br, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(codes, sx, up8, upws2, upb2, dn8, dnws2)


@functools.partial(jax.jit, static_argnames=("act", "block_rows", "interpret"))
def mlp3(x, lnw, lnb, up8, upws, upb, dn8, dnws, *, act="gelu_quick",
         block_rows=256, interpret=False):
    """Raw bf16 residual in -> LN -> quant -> up -> gelu -> rq -> down out."""
    m, k = x.shape
    n = up8.shape[0]
    br = block_rows
    lnw2, lnb2 = lnw.reshape(1, k), lnb.reshape(1, k)
    upws2, upb2, dnws2 = upws.reshape(1, n), upb.reshape(1, n), dnws.reshape(1, k)

    def kernel(x_ref, lw_ref, lb_ref, uw_ref, uws_ref, ub_ref, dw_ref,
               dws_ref, o_ref):
        xv = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xv, axis=1, keepdims=True)
        ms = jnp.mean(xv * xv, axis=1, keepdims=True)
        var = jnp.maximum(ms - mu * mu, 0.0)
        y = (xv - mu) * jax.lax.rsqrt(var + EPS)
        y = y * lw_ref[0, :].astype(jnp.float32) + lb_ref[0, :].astype(jnp.float32)
        c1, s1 = _qrows(y)
        acc = jax.lax.dot_general(
            c1, uw_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * s1 * uws_ref[0, :] + ub_ref[0, :]
        y = _gelu(y, act)
        c2, s2 = _qrows(y)
        acc2 = jax.lax.dot_general(
            c2, dw_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = (acc2.astype(jnp.float32) * s2 * dws_ref[0, :]).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.bfloat16),
        grid=(pl.cdiv(m, br),),
        in_specs=[
            pl.BlockSpec((br, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, lnw2, lnb2, up8, upws2, upb2, dn8, dnws2)


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
    print(f"{name:12s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    enable_compile_cache()
    f = 4 * H
    vmem_w = (f * H * 2) / 2**20
    print(f"backend={jax.default_backend()} rows={ROWS} H={H} 4H={f} "
          f"resident weights={vmem_w:.1f} MB", flush=True)
    rng = np.random.default_rng(0)

    def mkw(nn, kk):
        wf = rng.normal(0, 0.02, (nn, kk)).astype(np.float32)
        ws = (np.abs(wf).max(axis=1) / 127.0 + 1e-12).astype(np.float32)
        c8 = np.clip(np.round(wf / ws[:, None]), -127, 127).astype(np.int8)
        return (jax.device_put(jnp.asarray(c8)),
                jax.device_put(jnp.asarray(ws)))

    up8, upws = mkw(f, H)
    dn8, dnws = mkw(H, f)
    up_w = W8Tensor(c8=up8, ws=upws, qtype="w8")
    dn_w = W8Tensor(c8=dn8, ws=dnws, qtype="w8")
    upb = jax.device_put(jnp.asarray(rng.normal(0, 0.05, f), jnp.float32))
    lnw = jax.device_put(jnp.asarray(rng.normal(1, 0.05, H), jnp.float32))
    lnb = jax.device_put(jnp.asarray(rng.normal(0, 0.05, H), jnp.float32))

    xs = [jax.device_put(jnp.asarray(
        rng.normal(0, 1, (ROWS, H)), jnp.bfloat16)) for _ in range(4)]

    def prod(x):
        c, s = lnq_pallas(x, lnw, lnb, eps=EPS)
        c2, s2 = gemm_gq_pallas(c, s, up8, upws, upb, act="gelu_quick")
        return w8a8_pre(c2, s2, dn_w, jnp.bfloat16)

    def m2(x, br):
        c, s = lnq_pallas(x, lnw, lnb, eps=EPS)
        return mlp2(c, s, up8, upws, upb, dn8, dnws, block_rows=br)

    def m3(x, br):
        return mlp3(x, lnw, lnb, up8, upws, upb, dn8, dnws, block_rows=br)

    # numerics first (same math, same order -> tight agreement expected)
    ya = np.asarray(jax.jit(prod)(xs[0]), np.float32)
    for br in BLOCKS[:1]:
        for nm, fn in (("mlp2", m2), ("mlp3", m3)):
            try:
                yb = np.asarray(jax.jit(functools.partial(fn, br=br))(xs[0]),
                                np.float32)
            except Exception as e:
                print(f"{nm}[{br}] REJECTED: {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                continue
            rel = np.abs(ya - yb).max() / (np.abs(ya).max() or 1.0)
            print(f"max rel diff {nm}(br={br}) vs prod: {rel:.2e}", flush=True)

    t_prod = slope_time("prod", jax.jit(prod), [(x,) for x in xs])
    for br in BLOCKS:
        for nm, fn in (("mlp2", m2), ("mlp3", m3)):
            try:
                t = slope_time(f"{nm}[{br}]",
                               jax.jit(functools.partial(fn, br=br)),
                               [(x,) for x in xs])
                print(f"  {nm}[{br}] speedup: {t_prod / t:.3f}x", flush=True)
            except Exception as e:
                print(f"{nm}[{br}] FAILED: {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
    slope_time("prod_b", jax.jit(prod), [(x,) for x in xs])  # drift check


if __name__ == "__main__":
    main()
