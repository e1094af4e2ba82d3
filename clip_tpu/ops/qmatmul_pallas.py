"""Fused dequantize + matmul Pallas kernel.

Computes ``y = x @ W.T`` with W a block-quantized :class:`QTensor`, keeping
the packed codes in HBM/VMEM and dequantizing inside the kernel right before
the MXU dot — the TPU equivalent of ggml's fused dequant-dot ``ggml_mul_mat``
CPU kernels (the reference's hot op; see SURVEY.md §2.1).  HBM weight traffic
stays at the quantized width (4.5 bits/element for q4_0 vs 16 for bf16),
which is the whole win for small-batch/latency serving.

Nibble handling (q4_0/q4_1): the device layout packs *adjacent* elements
``(2t, 2t+1)`` into one byte.  Rather than interleaving lanes in-kernel (a
shuffle Mosaic handles poorly), the matmul is split over even/odd element
streams::

    y = x[:, 0::2] @ W[:, 0::2].T  +  x[:, 1::2] @ W[:, 1::2].T

``W_even`` is the low nibbles, ``W_odd`` the high nibbles — both direct bit
ops on the packed tile with no data movement; the deinterleave falls on the
small activation tensor and is done once, outside the kernel, by XLA.
Each 32-element quantization block maps to 16 contiguous even + 16 contiguous
odd elements, so per-block scales broadcast with a plain reshape.

q5_0/q5_1 use the same even/odd nibble split for their low 4 bits plus a
little-endian high-bit plane ([N, K/8]) expanded in-kernel (see
``_kernel_packed5``) — 5.625 bits/element of HBM weight traffic.  q8_0
stores byte-aligned int8 codes and uses a single unsplit dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf.constants import QK, GGMLType
from .qtensor import QTensor

__all__ = ["qmatmul_pallas"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _codes_to(q, dtype):
    """Mosaic can't cast u8 directly to bf16; hop through int32."""
    return q.astype(jnp.int32).astype(dtype)


def _expand_scales(s, reps: int, bn: int, kq: int):
    """[BN, K/Q] -> [BN, K/Q * reps]: repeat each column ``reps`` times.

    Lane-dim element repeats are shuffles Mosaic won't lower, so the expansion
    is expressed as a matmul with a 0/1 matrix built from iota compares — it
    runs on the MXU and costs ~3% of the main dot's FLOPs.
    """
    kw = kq * reps
    rows = jax.lax.broadcasted_iota(jnp.int32, (kq, kw), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (kq, kw), 1)
    expand = (cols // reps == rows).astype(jnp.float32)
    return jax.lax.dot_general(
        s, expand, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel_packed4(x_even_ref, x_odd_ref, q_ref, d_ref, m_ref, o_ref, *, zero_point, has_min):
    """One (BM, BN) output tile; full K in VMEM.

    x_even/x_odd: [BM, K/2]; q: [BN, K/2] packed bytes; d/m: [BN, K/32].
    """
    q = q_ref[:]
    bn, kh = q.shape
    dtype = x_even_ref.dtype

    d = d_ref[:].astype(jnp.float32)
    d16 = _expand_scales(d, 16, bn, d.shape[1]).astype(dtype)

    # bit ops in int32: Mosaic lacks sub-word shift lowerings
    qi = q.astype(jnp.int32)
    lo = (qi & 0x0F).astype(dtype)
    hi = (qi >> 4).astype(dtype)
    if zero_point:
        lo = lo - jnp.asarray(zero_point, dtype)
        hi = hi - jnp.asarray(zero_point, dtype)
    w_even = lo * d16
    w_odd = hi * d16
    if has_min:
        m16 = _expand_scales(m_ref[:].astype(jnp.float32), 16, bn, d.shape[1]).astype(dtype)
        w_even = w_even + m16
        w_odd = w_odd + m16

    contract = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(x_even_ref[:], w_even, contract,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(x_odd_ref[:], w_odd, contract,
                                    preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _kernel_packed5(x_even_ref, x_odd_ref, q_ref, hb_ref, d_ref, m_ref, o_ref,
                    *, zero_point, has_min):
    """q5 tile: nibble-packed low bits [BN, K/2] + high-bit plane [BN, K/8].

    The plane is expanded to the even/odd element streams with the same
    MXU-matmul repeat used for scales (each byte covers 4 even + 4 odd
    elements), then the per-element bit is selected by a lane-cyclic shift:
    even element t sits at bit 2*(t%4) of plane byte t//4, odd at 2*(t%4)+1.
    """
    q = q_ref[:]
    bn, kh = q.shape
    dtype = x_even_ref.dtype

    d = d_ref[:].astype(jnp.float32)
    d16 = _expand_scales(d, 16, bn, d.shape[1]).astype(dtype)

    qi = q.astype(jnp.int32)
    lo = qi & 0x0F
    hi = qi >> 4

    # u8 -> i32 -> f32 (Mosaic lacks a direct u8->f32 cast), expand, back
    plane = _expand_scales(
        hb_ref[:].astype(jnp.int32).astype(jnp.float32), 4, bn, hb_ref.shape[1])
    plane = plane.astype(jnp.int32)                     # [BN, K/2], exact <=255
    tpos = jax.lax.broadcasted_iota(jnp.int32, (bn, kh), 1) % 4
    bit_even = (plane >> (2 * tpos)) & 1
    bit_odd = (plane >> (2 * tpos + 1)) & 1

    w_even = (lo | (bit_even << 4)).astype(dtype)
    w_odd = (hi | (bit_odd << 4)).astype(dtype)
    if zero_point:
        w_even = w_even - jnp.asarray(zero_point, dtype)
        w_odd = w_odd - jnp.asarray(zero_point, dtype)
    w_even = w_even * d16
    w_odd = w_odd * d16
    if has_min:
        m16 = _expand_scales(m_ref[:].astype(jnp.float32), 16, bn, d.shape[1]).astype(dtype)
        w_even = w_even + m16
        w_odd = w_odd + m16

    contract = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(x_even_ref[:], w_even, contract,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(x_odd_ref[:], w_odd, contract,
                                    preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _kernel_bytes(x_ref, q_ref, d_ref, m_ref, o_ref, *, zero_point, has_min):
    """Byte-aligned codes: q [BN, K] uint8/int8, d/m [BN, K/32]."""
    q = q_ref[:]
    bn, k = q.shape
    dtype = x_ref.dtype
    d = d_ref[:].astype(jnp.float32)
    d32 = _expand_scales(d, QK, bn, d.shape[1]).astype(dtype)
    w = _codes_to(q, dtype)
    if zero_point:
        w = w - jnp.asarray(zero_point, dtype)
    w = w * d32
    if has_min:
        m32 = _expand_scales(m_ref[:].astype(jnp.float32), QK, bn, d.shape[1]).astype(dtype)
        w = w + m32
    contract = (((1,), (1,)), ((), ()))
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w, contract, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret", "block_m", "block_n"))
def qmatmul_pallas(
    x: jnp.ndarray,
    w: QTensor,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    block_m: int = 256,
    block_n: int = 256,
) -> jnp.ndarray:
    """``x [..., K] @ dequant(w)[N, K].T -> [..., N]`` fused on the MXU."""
    if w.q.ndim != 2:
        raise ValueError("qmatmul_pallas expects a 2-D weight (no layer axis)")
    n, _ = w.shape[0], w.shape[1]
    k = w.shape[1]

    lead = x.shape[:-1]
    m = 1
    for dim in lead:
        m *= dim
    x2 = x.reshape(m, k).astype(compute_dtype)

    bm = min(block_m, _round_up(m, 8))
    bn = min(block_n, _round_up(n, 128))
    mp = _round_up(m, bm)
    np_ = _round_up(n, bn)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))

    q, d, mmin, hb = w.q, w.d, w.m, w.hb
    if np_ != n:
        q = jnp.pad(q, ((0, np_ - n), (0, 0)))
        d = jnp.pad(d, ((0, np_ - n), (0, 0)))
        if mmin is not None:
            mmin = jnp.pad(mmin, ((0, np_ - n), (0, 0)))
        if hb is not None:
            hb = jnp.pad(hb, ((0, np_ - n), (0, 0)))
    has_min = mmin is not None
    if mmin is None:
        mmin = d  # placeholder operand (ignored by the kernel)

    grid = (mp // bm, np_ // bn)
    kb = k // QK

    out_shape = jax.ShapeDtypeStruct((mp, np_), compute_dtype)
    d_spec = pl.BlockSpec((bn, kb), lambda i, j: (j, 0), memory_space=pltpu.VMEM)

    if w.is_packed4:
        xe = x2.reshape(mp, k // 2, 2)
        x_even = xe[:, :, 0]
        x_odd = xe[:, :, 1]
        kernel = functools.partial(
            _kernel_packed4, zero_point=w.zero_point, has_min=has_min
        )
        y = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, k // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                d_spec,
                d_spec,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k * np_,
                bytes_accessed=mp * k + np_ * k // 2 + mp * np_ * 2,
                transcendentals=0,
            ),
        )(x_even, x_odd, q, d, mmin)
    elif w.is_packed5:
        xe = x2.reshape(mp, k // 2, 2)
        x_even = xe[:, :, 0]
        x_odd = xe[:, :, 1]
        kernel = functools.partial(
            _kernel_packed5, zero_point=w.zero_point, has_min=has_min
        )
        hb_spec = pl.BlockSpec((bn, k // 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
        y = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, k // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                hb_spec,
                d_spec,
                d_spec,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k * np_,
                bytes_accessed=mp * k + np_ * (k // 2 + k // 8) + mp * np_ * 2,
                transcendentals=0,
            ),
        )(x_even, x_odd, q, hb, d, mmin)
    else:
        kernel = functools.partial(
            _kernel_bytes, zero_point=w.zero_point, has_min=has_min
        )
        y = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                d_spec,
                d_spec,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k * np_,
                bytes_accessed=mp * k + np_ * k + mp * np_ * 2,
                transcendentals=0,
            ),
        )(x2, q, d, mmin)

    y = y[:m, :n]
    return y.reshape(*lead, n)
