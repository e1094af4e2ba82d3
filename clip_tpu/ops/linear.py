"""Linear layers over dense or block-quantized weights.

``qmatmul(x, w)`` computes ``x @ w.T`` where ``w`` is a dense ``[N, K]`` array
or a :class:`~clip_tpu.ops.qtensor.QTensor`.  This replaces ggml_mul_mat — the
reference's hot op, which fuses dequantization into its CPU SIMD dot kernels
(/root/reference/clip.cpp: 18 call sites) — with either:

* ``backend="xla"`` — dequantize-then-dot.  Correctness oracle; XLA fuses the
  dequant elementwise chain but materializes the dense weight tile.
* ``backend="pallas"`` — fused in-kernel dequant + MXU matmul (see
  ``qmatmul_pallas.py``); HBM reads stay packed, which is the bandwidth win.

The active backend is a module-level default so models stay backend-agnostic.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .qtensor import QTensor, dequant

_DEFAULT_BACKEND = "xla"


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown qmatmul backend {name!r}")
    _DEFAULT_BACKEND = name


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
    backend = backend or _DEFAULT_BACKEND
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
