"""Device-resident block-quantized tensors.

A :class:`QTensor` keeps weight-only quantized parameters packed in HBM in a
TPU-friendly layout and dequantizes on demand — either via XLA ops (oracle /
fallback) or inside a fused Pallas matmul kernel (see ``qmatmul.py``).

Device layouts (all blocks are 32 elements along the last / contraction axis,
matching the GGUF on-disk blocking):

* q4_0 / q4_1 — ``q``: uint8 ``[..., K/2]``; byte ``j`` packs element ``2j``
  in its low nibble and ``2j+1`` in its high nibble (sequential order — we
  repack from ggml's j/j+16 interleave at load time so in-kernel unpacking
  needs no lane shuffles).
* q5_0 / q5_1 — ``q``: the 4 LOW bits nibble-packed exactly like q4
  (uint8 ``[..., K/2]``) plus ``hb``: the high bit as a little-endian bit
  plane (uint8 ``[..., K/8]``, bit ``e % 8`` of byte ``e // 8``).  5.625
  bits/element of HBM traffic instead of the 8 a byte-aligned layout costs —
  the bandwidth win that motivates 5-bit formats (ggml packs the same two
  planes per block, clip.cpp q5 block layout / SURVEY §2 #3).
* q8_0 — ``q``: int8 ``[..., K]``.

``d`` (scale) and ``m`` (min, only q4_1/q5_1) are float32 ``[..., K/32]``;
they are fp16 values upcast exactly, so dequantization is bit-identical to the
numpy oracle in ``clip_tpu.quant.formats``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import QK, GGMLType
from ..quant import block_fields

__all__ = ["QTensor", "W8Tensor", "from_ggml_blocks", "dequant", "dequant_np",
           "take_rows", "to_w8tensor"]

_ZERO_POINT = {
    GGMLType.Q4_0: 8,
    GGMLType.Q4_1: 0,
    GGMLType.Q5_0: 16,
    GGMLType.Q5_1: 0,
    GGMLType.Q8_0: 0,
}


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Block-quantized tensor; logical shape is ``d.shape[:-1] + (K,)``."""

    q: Any                 # packed codes, see module docstring
    d: Any                 # float32 scales [..., K/32]
    m: Any                 # float32 mins [..., K/32] or None
    qtype: GGMLType        # static
    hb: Any = None         # high-bit plane uint8 [..., K/8] (q5 only)

    def tree_flatten(self):
        return (self.q, self.d, self.m, self.hb), self.qtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, d, m, hb = children
        return cls(q=q, d=d, m=m, qtype=aux, hb=hb)

    @property
    def shape(self) -> tuple[int, ...]:
        lead = tuple(self.d.shape[:-1])
        return lead + (self.d.shape[-1] * QK,)

    @property
    def is_packed4(self) -> bool:
        return self.qtype in (GGMLType.Q4_0, GGMLType.Q4_1)

    @property
    def is_packed5(self) -> bool:
        return self.qtype in (GGMLType.Q5_0, GGMLType.Q5_1)

    @property
    def zero_point(self) -> int:
        return _ZERO_POINT[self.qtype]

    @property
    def nbytes(self) -> int:
        n = self.q.size * self.q.dtype.itemsize + self.d.size * self.d.dtype.itemsize
        if self.m is not None:
            n += self.m.size * self.m.dtype.itemsize
        if self.hb is not None:
            n += self.hb.size * self.hb.dtype.itemsize
        return n


@jax.tree_util.register_pytree_node_class
@dataclass
class W8Tensor:
    """Per-channel int8 weight for the int8-MXU activation-quantized path.

    ``c8``: int8 codes ``[..., N, K]``; ``ws``: float32 per-output-channel
    scales ``[..., N]`` — ``W ≈ c8 * ws[..., None]``.  Derived from a block-
    quantized :class:`QTensor` at load time (:func:`to_w8tensor`); consumed by
    ``ops.linear.w8a8_matmul``, which quantizes activations per-row to int8
    and runs the dot on the int8 MXU (~2.5x the bf16 dot rate on v6e-class
    chips; scripts/bench_int8.py).  This is the TPU analogue of ggml's own
    quantized-activation dots (``ggml_vec_dot_q4_0_q8_0`` — the reference
    ALSO quantizes activations to 8 bits for every quantized matmul;
    SURVEY.md §2.1), with per-channel/per-row scales instead of per-32-block
    because the MXU contracts the whole K axis in one pass.

    ``qtype`` records the source format for reporting only.

    ``qt`` (optional) keeps the SOURCE block-quantized tensor alongside the
    int8 codes — the hybrid layout: throughput GEMMs run the int8 MXU on
    ``c8`` while small-row (latency) GEMMs read the packed source through
    the fused Pallas dequant kernel, which moves ~1.8x fewer weight bytes
    (q4: 0.5625 vs 1 B/elt; slope-measured 7.5 vs 12.4 us/GEMM at M=1 on
    [3072,768]).  Total HBM cost stays below a dense bf16 copy.
    """

    c8: Any                # int8 codes [..., N, K]
    ws: Any                # float32 per-channel scales [..., N]
    qtype: GGMLType        # static: source format tag
    qt: Any = None         # optional packed source QTensor (hybrid routing)

    def tree_flatten(self):
        return (self.c8, self.ws, self.qt), self.qtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        c8, ws, qt = children
        return cls(c8=c8, ws=ws, qtype=aux, qt=qt)

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self.c8.shape)

    @property
    def nbytes(self) -> int:
        n = self.c8.size + self.ws.size * self.ws.dtype.itemsize
        if self.qt is not None:
            n += self.qt.nbytes
        return n


def dequant_np(qt: QTensor) -> np.ndarray:
    """Host-side (numpy) dequantization — used for one-time load transforms
    where pulling the weights through the accelerator would be wasteful.
    Mirrors :func:`dequant` exactly."""
    q = np.asarray(qt.q)
    if qt.is_packed4 or qt.is_packed5:
        lo = q & np.uint8(0x0F)
        hi = q >> np.uint8(4)
        q = np.stack([lo, hi], axis=-1).reshape(*q.shape[:-1], q.shape[-1] * 2)
    if qt.is_packed5:
        k = q.shape[-1]
        plane = np.repeat(np.asarray(qt.hb), 8, axis=-1).astype(np.int32)
        bit = (plane >> (np.arange(k, dtype=np.int32) % 8)) & 1
        q = q.astype(np.int32) | (bit << 4)
    codes = q.astype(np.float32)
    if qt.zero_point:
        codes = codes - float(qt.zero_point)
    k = codes.shape[-1]
    blocks = codes.reshape(*codes.shape[:-1], k // QK, QK)
    w = blocks * np.asarray(qt.d)[..., None]
    if qt.m is not None:
        w = w + np.asarray(qt.m)[..., None]
    return w.reshape(*codes.shape[:-1], k).astype(np.float32)


def to_w8tensor(qt, keep_source: bool = False) -> W8Tensor:
    """Re-quantize a weight to per-channel int8 (host-side).

    Accepts a block-quantized :class:`QTensor` (the TPU default for quantized
    checkpoints) or a dense ``[..., N, K]`` array (opt-in ``act_quant=True``
    for f16/f32 checkpoints — trades ~1e-3 relative weight error for the int8
    MXU's ~2.5x dot rate).  The per-channel scale is ``amax_K |W| / 127``;
    for block formats the extra error vs the source format is bounded by the
    channel's cross-block dynamic range and measures ~1e-3 relative on CLIP
    weights (tests/test_w8a8.py) — an order below q4_0's own quantization
    error.

    ``keep_source=True`` (QTensor inputs only) attaches the packed source
    for hybrid routing: small-row GEMMs take the fused Pallas dequant kernel
    (fewer weight bytes), throughput GEMMs the int8 MXU."""
    if isinstance(qt, QTensor):
        w, qtype = dequant_np(qt), qt.qtype
        src = qt if keep_source else None
    else:
        w = np.asarray(jax.device_get(qt), dtype=np.float32)
        qtype = GGMLType.F16
        src = None
    ws = np.abs(w).max(axis=-1) / 127.0
    ws = np.maximum(ws, 1e-12)
    c8 = np.clip(np.rint(w / ws[..., None]), -127, 127).astype(np.int8)
    return W8Tensor(c8=c8, ws=ws.astype(np.float32), qtype=qtype, qt=src)


def from_ggml_blocks(
    packed: np.ndarray, shape: tuple[int, ...], qtype: GGMLType
) -> QTensor:
    """Convert a GGUF packed block buffer (host numpy) to device layout.

    ``shape`` is the logical row-major shape; its last axis is the blocked
    (contraction) axis and must be a multiple of 32.
    """
    qtype = GGMLType(qtype)
    f = block_fields(packed, qtype)
    k = shape[-1]
    if k % QK:
        raise ValueError(f"last axis {k} not a multiple of {QK}")
    lead = shape[:-1]
    nb_per_row = k // QK

    codes = f.q.reshape(*lead, k)  # element order
    hb = None
    if qtype in (GGMLType.Q4_0, GGMLType.Q4_1):
        pairs = codes.reshape(*lead, k // 2, 2).astype(np.uint8)
        q = (pairs[..., 0] | (pairs[..., 1] << 4)).astype(np.uint8)
    elif qtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        lo = (codes & 0x0F).astype(np.uint8)
        pairs = lo.reshape(*lead, k // 2, 2)
        q = (pairs[..., 0] | (pairs[..., 1] << 4)).astype(np.uint8)
        bits = (codes >> 4).astype(np.uint8)          # the 5th bit, 0/1
        hb = np.packbits(bits, axis=-1, bitorder="little")  # [..., K/8]
    else:
        q = codes.astype(np.int8)

    d = f.d.astype(np.float32).reshape(*lead, nb_per_row)
    m = None
    if f.m is not None:
        m = f.m.astype(np.float32).reshape(*lead, nb_per_row)
    return QTensor(q=q, d=d, m=m, qtype=qtype, hb=hb)


def unpack_codes(qt: QTensor) -> jnp.ndarray:
    """Return integer codes in element order, shape ``[..., K]`` (XLA ops)."""
    q = qt.q
    if qt.is_packed4 or qt.is_packed5:
        lo = q & np.uint8(0x0F)
        hi = q >> np.uint8(4)
        q = jnp.stack([lo, hi], axis=-1).reshape(*q.shape[:-1], q.shape[-1] * 2)
    if qt.is_packed5:
        k = q.shape[-1]
        plane = jnp.repeat(qt.hb, 8, axis=-1).astype(jnp.int32)
        shifts = (jnp.arange(k, dtype=jnp.int32) % 8)[
            (None,) * (q.ndim - 1) + (slice(None),)]
        bit = (plane >> shifts) & 1
        q = q.astype(jnp.int32) | (bit << 4)
    return q


def take_rows(qt_or_arr, ids, dtype=jnp.float32) -> jnp.ndarray:
    """Embedding gather: select rows by id, dequantizing only the gathered
    rows when the table is quantized (replaces ggml_get_rows on a possibly
    quantized token-embedding table, /root/reference/clip.cpp:1059)."""
    if not isinstance(qt_or_arr, QTensor):
        return jnp.take(qt_or_arr, ids, axis=0, mode="clip").astype(dtype)
    qt = qt_or_arr
    sub = QTensor(
        q=jnp.take(qt.q, ids, axis=0, mode="clip"),
        d=jnp.take(qt.d, ids, axis=0, mode="clip"),
        m=None if qt.m is None else jnp.take(qt.m, ids, axis=0, mode="clip"),
        qtype=qt.qtype,
        hb=None if qt.hb is None else jnp.take(qt.hb, ids, axis=0, mode="clip"),
    )
    return dequant(sub, dtype=dtype)


def dequant(qt: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize to a dense array (XLA path; numerically identical to the
    numpy oracle when ``dtype`` is float32)."""
    codes = unpack_codes(qt).astype(jnp.float32)
    if qt.zero_point:
        codes = codes - float(qt.zero_point)
    k = codes.shape[-1]
    blocks = codes.reshape(*codes.shape[:-1], k // QK, QK)
    w = blocks * qt.d[..., None]
    if qt.m is not None:
        w = w + qt.m[..., None]
    return w.reshape(*codes.shape[:-1], k).astype(dtype)
