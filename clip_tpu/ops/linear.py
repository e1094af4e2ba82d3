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

from .qtensor import QTensor, dequant

_DEFAULT_BACKEND = "auto"
_PALLAS_MAX_ROWS = 2048


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
    backend = _resolve(backend or _DEFAULT_BACKEND, x, w)
    compute_dtype = compute_dtype or x.dtype

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
