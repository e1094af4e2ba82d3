"""Linear layers over dense or block-quantized weights.

``qmatmul(x, w)`` computes ``x @ w.T`` where ``w`` is a dense ``[N, K]`` array
or a :class:`~clip_tpu.ops.qtensor.QTensor`.  This replaces ggml_mul_mat — the
reference's hot op, which fuses dequantization into its CPU SIMD dot kernels
(/root/reference/clip.cpp: 18 call sites) — with either:

* ``backend="xla"`` — dequantize-then-dot.  Correctness oracle; XLA fuses the
  dequant elementwise chain but materializes the dense weight tile.
* ``backend="pallas"`` — fused in-kernel dequant + MXU matmul (see
  ``qmatmul_pallas.py``); HBM reads stay packed, which is the bandwidth win.

* ``backend="auto"`` (default) — pallas on TPU for latency-bound shapes
  (few rows), XLA for throughput-bound ones, measured on v5e: the fused
  kernel is 2-3x faster than dequantize-then-dot below ~2k rows and XLA's
  large-M GEMM wins above.

The active backend is a module-level default so models stay backend-agnostic.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .qtensor import QTensor, W8Tensor, dequant

_DEFAULT_BACKEND = "auto"
_PALLAS_MAX_ROWS = 2048


def quant_rows(x: jnp.ndarray):
    """Per-row symmetric int8 quantization at the XLA level: ``[M, K]`` ->
    (codes int8, scales f32 ``[M, 1]``).  amax/127 math identical to the
    Pallas producers (``ops.actquant_pallas``) so every path agrees.  XLA
    fuses the scale/round/clip into the producer chain (e.g. layernorm);
    the amax is one extra reduce pass over the activation."""
    x2 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    sx = amax / 127.0 + 1e-12
    codes = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)
    return codes, sx


def w8a8_matmul(x: jnp.ndarray, w: W8Tensor, compute_dtype=None) -> jnp.ndarray:
    """``x [..., K] @ (w.c8 * w.ws).T`` on the int8 MXU.

    Activations are dynamically quantized per ROW (amax/127 symmetric) right
    before the dot and the int32 accumulator is rescaled by ``sx * ws`` in
    f32 — the whole pipeline measures 1.5x faster than the bf16 dot at CLIP
    MLP shapes (0.214 vs 0.325 ms at [12800,768]x[768,3072], int8 dot alone
    2.5x; scripts/bench_int8.py — this re-races and REFUTES the round-1
    'W8A8 loses at the XLA level' note, whose chain-style harness charged a
    full-output HBM read to every variant).  Accumulation: |K·127·127| <=
    3072*16129 < 2^31, no overflow at CLIP widths.

    Semantics anchor: the reference also runs quantized matmuls with 8-bit
    activations (ggml_vec_dot_q4_0_q8_0, SURVEY §2.1) — per-row scales here
    instead of per-32-block because the MXU contracts all of K in one pass.
    """
    compute_dtype = compute_dtype or x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    x8, sx = quant_rows(x.reshape(m, k))
    acc = jax.lax.dot_general(
        x8, w.c8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * w.ws[None, :]
    return y.astype(compute_dtype).reshape(*lead, w.c8.shape[0])


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    if name not in ("xla", "pallas", "auto"):
        raise ValueError(f"unknown qmatmul backend {name!r}")
    _DEFAULT_BACKEND = name


def _resolve(backend: str, x, w) -> str:
    if backend != "auto":
        return backend
    if jax.default_backend() != "tpu" or not isinstance(w, QTensor) or w.q.ndim != 2:
        return "xla"
    # q5 formats stay on the fused kernel at ANY row count: their XLA
    # bit-plane dequant is catastrophic inside lax.scan over stacked layer
    # weights (ViT-H/14 q5_1 B=32: 1962 ms/step vs 243 via the kernel vs
    # 106 unrolled — the unpack chain won't fuse across the scan's
    # dynamic-slice; scripts/bench_q5_rows.py + round-3 in-model probe).
    # Isolated GEMMs tell the opposite story (XLA 101 TF/s at 22k rows),
    # so this is a scan-shape rule, not a GEMM rule.
    if w.is_packed5:
        return "pallas"
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return "pallas" if rows <= _PALLAS_MAX_ROWS else "xla"


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


def qmatmul(
    x: jnp.ndarray,
    w: Any,
    *,
    backend: str | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """``x [..., K] @ w[N, K].T -> [..., N]``.

    ``compute_dtype`` controls the dtype weights are dequantized to / the dot
    runs in (defaults to ``x.dtype``); accumulation is always float32.
    """
    requested = backend or _DEFAULT_BACKEND
    backend = _resolve(requested, x, w)
    compute_dtype = compute_dtype or x.dtype

    if isinstance(w, W8Tensor):
        # hybrid routing: a small-row GEMM is weight-bandwidth bound, and the
        # packed source (when kept, see qtensor.to_w8tensor) moves ~1.8x
        # fewer bytes through the fused Pallas dequant kernel than the int8
        # codes (7.5 vs 12.4 us/GEMM at M=1, [3072,768], slope-timed).
        # Explicit backend='xla' (the pjit fallback — Pallas custom calls
        # are not pjit-partitionable) keeps the int8 path.
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if (w.qt is not None and rows <= _PALLAS_MAX_ROWS
                and requested != "xla" and jax.default_backend() == "tpu"):
            from .qmatmul_pallas import qmatmul_pallas

            return qmatmul_pallas(x, w.qt, compute_dtype=compute_dtype)
        return w8a8_matmul(x, w, compute_dtype)
    if isinstance(w, QTensor):
        if backend == "pallas":
            from .qmatmul_pallas import qmatmul_pallas

            return qmatmul_pallas(x, w, compute_dtype=compute_dtype)
        wd = dequant(w, dtype=compute_dtype)
    else:
        wd = w.astype(compute_dtype)

    y = jnp.matmul(
        x.astype(compute_dtype), wd.T, preferred_element_type=jnp.float32
    )
    return y.astype(compute_dtype)


def linear(x, w, b=None, **kw):
    y = qmatmul(x, w, **kw)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
