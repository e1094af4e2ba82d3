"""Differential ablation of the whole-MLP kernel (round 5).

Clones ``_mlp_half`` with toggleable pieces (TIMING ONLY) and slope-times
each variant at the production B/32 bench shape (br=256, 768x3072):

  full          production kernel
  no_ln         skip LN
  no_gelu       skip the gelu (y passes through)
  no_requant    skip the mid requant (cast f32 -> int8 directly)
  no_rescale    skip both acc rescales (cast int32 -> f32/bf16)
  gemms_only    LN+quant + two GEMMs, no gelu/requant/rescale
  recip_mul     full math but every /scale is *reciprocal (strength-reduced)
  gelu_bf16     gelu computed in bf16 instead of f32

Run: python scripts/ablate_mlp_kernel.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.utils import enable_compile_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
S, H, N4 = 50, 768, 3072
EPS = 1e-5
DEPTHS = (2, 14)
ITERS = 8
BR = int(os.environ.get("ABL_BR", "256"))


def _half(x, lw, lb, uw, uws, ub, dw, dws, db, *, mode, cdt=jnp.bfloat16):
    if mode.startswith("dots_only"):
        c1 = x.astype(jnp.int8)
        if mode == "dots_only_kmaj":
            # K-major weights: contract dim0 of the [K, N] layout
            acc = jax.lax.dot_general(c1, uw[:].T, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            c2 = acc.astype(jnp.int8)
            acc2 = jax.lax.dot_general(c2, dw[:].T, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
        elif mode == "dots_only_nsplit":
            # split the up dot into 4 N-chunks (separate MXU issues)
            accs = []
            for j in range(4):
                accs.append(jax.lax.dot_general(
                    c1, uw[j * (N4 // 4):(j + 1) * (N4 // 4), :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32))
            acc = jnp.concatenate(accs, axis=1)
            c2 = acc.astype(jnp.int8)
            acc2 = jax.lax.dot_general(c2, dw[:], (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.int32)
        elif mode == "dots_only_bf16":
            # both dots in bf16 (235 TF/s class) instead of int8
            acc = jax.lax.dot_general(
                c1.astype(jnp.bfloat16), uw[:].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            c2 = acc.astype(jnp.bfloat16)
            acc2 = jax.lax.dot_general(
                c2, dw[:].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc = jax.lax.dot_general(c1, uw[:], (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            c2 = acc.astype(jnp.int8)
            acc2 = jax.lax.dot_general(c2, dw[:], (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.int32)
        return x.astype(cdt) + acc2.astype(cdt)
    def _seg_quant(y, nseg):
        w = y.shape[1] // nseg
        segs = [y[:, j * w:(j + 1) * w] for j in range(nseg)]
        amax = jnp.max(jnp.abs(segs[0]), axis=1, keepdims=True)
        for sg in segs[1:]:
            amax = jnp.maximum(amax, jnp.max(jnp.abs(sg), axis=1, keepdims=True))
        sx = amax / 127.0 + 1e-12
        c = jnp.concatenate(
            [jnp.clip(jnp.round(sg / sx), -127, 127).astype(jnp.int8)
             for sg in segs], axis=1)
        return c, sx

    xv = x.astype(jnp.float32)
    if mode != "no_ln":
        mu = jnp.mean(xv, axis=1, keepdims=True)
        ms = jnp.mean(xv * xv, axis=1, keepdims=True)
        var = jnp.maximum(ms - mu * mu, 0.0)
        y = (xv - mu) * jax.lax.rsqrt(var + EPS)
        y = y * lw[0, :].astype(jnp.float32) + lb[0, :].astype(jnp.float32)
    else:
        y = xv
    if mode in ("q1_seg", "q12_seg"):
        c1, s1 = _seg_quant(y, 6)
    else:
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        if mode == "recip_mul":
            r1 = 127.0 / (amax + 1e-12)
            c1 = jnp.clip(jnp.round(y * r1), -127, 127).astype(jnp.int8)
            s1 = 1.0 / r1
        else:
            s1 = amax / 127.0 + 1e-12
            c1 = jnp.clip(jnp.round(y / s1), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(c1, uw[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    if mode in ("no_rescale", "gemms_only"):
        y2 = acc.astype(jnp.float32)
    else:
        y2 = acc.astype(jnp.float32) * s1 * uws[0, :] + ub[0, :]
    if mode == "gelu_bf16":
        yb = y2.astype(jnp.bfloat16)
        t17 = jnp.asarray(1.702, jnp.bfloat16)
        y2 = (yb / (1 + jnp.exp(-t17 * yb))).astype(jnp.float32)
    elif mode == "gelu_sq":
        y2 = y2 * (0.25 * y2)  # multiply stand-in: isolates the logistic
    elif mode == "gelu_expdiv":
        y2 = y2 / (1.0 + jnp.exp(-1.702 * y2))
    elif mode == "gelu_tanh_form":
        y2 = y2 * (0.5 + 0.5 * jnp.tanh(0.851 * y2))
    elif mode == "gelu_erf":
        y2 = y2 * (0.5 + 0.5 * jax.lax.erf(y2 * np.float32(0.7071067811865475)))
    elif mode not in ("no_gelu", "gemms_only"):
        y2 = y2 * jax.lax.logistic(1.702 * y2)

    if mode in ("no_requant", "gemms_only"):
        c2 = y2.astype(jnp.int8)
        s2 = jnp.ones((x.shape[0], 1), jnp.float32)
    elif mode in ("q2_seg", "q12_seg"):
        c2, s2 = _seg_quant(y2, 24)
    else:
        amax2 = jnp.max(jnp.abs(y2), axis=1, keepdims=True)
        if mode == "recip_mul":
            r2 = 127.0 / (amax2 + 1e-12)
            c2 = jnp.clip(jnp.round(y2 * r2), -127, 127).astype(jnp.int8)
            s2 = 1.0 / r2
        else:
            s2 = amax2 / 127.0 + 1e-12
            c2 = jnp.clip(jnp.round(y2 / s2), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(c2, dw[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)
    if mode in ("no_rescale", "gemms_only"):
        t = acc2.astype(cdt)
    else:
        t = (acc2.astype(jnp.float32) * s2 * dws[0, :]).astype(cdt)
    t = t + db[0, :].astype(cdt)
    return x.astype(cdt) + t


def make_op(mode):
    def kernel(x_ref, lw, lb, uw, uws, ub, dw, dws, db, o_ref):
        o_ref[:] = _half(x_ref[:], lw, lb, uw, uws, ub, dw, dws, db,
                         mode=mode, cdt=o_ref.dtype)

    def op(x, lw, lb, uw, uws, ub, dw, dws, db):
        b, s, h = x.shape
        m = b * s
        x2 = x.reshape(m, h)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, h), jnp.bfloat16),
            grid=(pl.cdiv(m, BR),),
            in_specs=[
                pl.BlockSpec((BR, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N4, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N4), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N4), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, N4), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, h), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x2, lw, lb, uw, uws, ub, dw, dws, db)
        return out.reshape(b, s, h)

    return op


def slope(op, args, name):
    x0 = args[0]
    rest = args[1:]

    def chain(d):
        def f(x):
            for _ in range(d):
                x = op(x, *rest)
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
    print(f"backend={jax.default_backend()} B={BATCH} br={BR}", flush=True)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (BATCH, S, H)), jnp.bfloat16))
    lw = jnp.asarray(rng.normal(1, 0.1, (1, H)), jnp.bfloat16)
    lb = jnp.asarray(rng.normal(0, 0.1, (1, H)), jnp.bfloat16)
    uw = jnp.asarray(rng.integers(-127, 128, (N4, H)), jnp.int8)
    uws = jnp.asarray(rng.uniform(1e-3, 2e-3, (1, N4)), jnp.float32)
    ub = jnp.asarray(rng.normal(0, 0.02, (1, N4)), jnp.float32)
    dw = jnp.asarray(rng.integers(-127, 128, (H, N4)), jnp.int8)
    dws = jnp.asarray(rng.uniform(1e-3, 2e-3, (1, H)), jnp.float32)
    db = jnp.asarray(rng.normal(0, 0.02, (1, H)), jnp.bfloat16)
    args = (x0, lw, lb, uw, uws, ub, dw, dws, db)

    base = slope(make_op("full"), args, "full")
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else (
        "no_ln", "no_gelu", "no_requant", "no_rescale",
        "gemms_only", "recip_mul", "gelu_bf16")
    for mode in modes:
        t = slope(make_op(mode), args, mode)
        print(f"             delta vs full: {(base - t) * 1e3:+7.4f} ms",
              flush=True)


if __name__ == "__main__":
    main()
