"""Fused activation->int8-quantize Pallas kernels for the W8A8 path.

``ops.linear.w8a8_matmul`` quantizes each GEMM's activation per-row at the
XLA level: |x| -> row amax (a separate bandwidth-bound reduce pass over the
bf16 activation) -> scale/round/clip fused into the GEMM operand read.  But
every transformer GEMM input is *produced* by layernorm or gelu — bandwidth-
bound ops that already stream the full activation through the VPU.  These
kernels fuse producer + amax + quantize into ONE VMEM pass that emits int8
codes (half the write bytes of bf16) and per-row f32 scales; the consuming
dot (:func:`w8a8_pre`) takes pre-quantized codes, so the separate amax pass
and the bf16 round-trip disappear.

This is the TPU analogue of ggml's quantize-then-dot activation pipeline
(``ggml_compute_forward_mul_mat`` quantizes the src1 activation to q8 rows
before its ``ggml_vec_dot_q4_0_q8_0`` inner loops — SURVEY §2.1); here the
quantize rides the producer's existing VMEM residency instead of being its
own pass.

Used by ``models.transformer`` when ``lnq_fuse`` is on (weights already
converted to :class:`~clip_tpu.ops.qtensor.W8Tensor`); numerics match the
unfused ``layernorm/gelu + w8a8_matmul`` pair to reduction-order rounding
(same f32 math, same amax scaling — tests/test_actquant_fusion.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qtensor import W8Tensor

__all__ = ["lnq_pallas", "actq_pallas", "gemm_gq_pallas", "w8a8_pre",
           "fusable_width", "mlp_gq_pallas", "mlp_lnq_pallas", "mlp_fusable",
           "mlp_lnq_stream_pallas", "mlp_stream_fusable"]

_SQRT_2_OVER_PI = 0.7978845608028654
# VMEM row-block budget (elements).  The kernel's resident set per block is
# ~7 bytes/element (bf16 in + f32 compute copy + int8 out); 1.23M elements
# keeps it ~8.5 MB, inside the 16 MB scoped-VMEM limit (2.46M at width 3072
# measured 19.1M and was rejected by Mosaic's stack allocator).
_ROW_BUDGET = 1_228_800


def fusable_width(h: int) -> bool:
    """Lane-dim constraint: the kernels stream [rows, h] blocks whose last
    axis must tile the 128-wide vector registers."""
    return h % 128 == 0


def _block_rows(rows: int, h: int, budget: int) -> int:
    br = max(8, (budget // h) // 8 * 8)
    rp = -(-rows // 8) * 8
    return min(br, rp)


def _quantize_rows(y):
    """Per-row symmetric int8: amax/127 scale (identical math to
    ops.linear.w8a8_matmul so fused and unfused paths agree)."""
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    sx = amax / 127.0 + 1e-12
    codes = jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8)
    return codes, sx


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def lnq_pallas(x, w, b, *, eps: float, block_rows: int | None = None,
               interpret: bool = False):
    """Layernorm + per-row dynamic int8 quant in one VMEM pass.

    ``x [rows, H]`` -> (codes int8 [rows, H], scales f32 [rows, 1]).
    LN math matches ``ops.nn.layernorm`` (one-pass f32 moments, clamped
    variance); quant math matches ``w8a8_matmul``.
    """
    rows, h = x.shape
    br = block_rows or _block_rows(rows, h, _ROW_BUDGET)
    w2 = w.reshape(1, h)
    b2 = b.reshape(1, h)

    def kernel(x_ref, w_ref, b_ref, o_ref, s_ref):
        xv = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xv, axis=1, keepdims=True)
        ms = jnp.mean(xv * xv, axis=1, keepdims=True)
        var = jnp.maximum(ms - mu * mu, 0.0)
        y = (xv - mu) * jax.lax.rsqrt(var + eps)
        y = y * w_ref[0, :].astype(jnp.float32) + b_ref[0, :].astype(jnp.float32)
        codes, sx = _quantize_rows(y)
        o_ref[:] = codes
        s_ref[:] = sx

    # ragged grid: Mosaic masks the tail block's stores itself, so the rows
    # need not divide br — no XLA-level pad of the input nor slice of the
    # outputs (at B/32 B=448 those pads were 24 ops / ~6.1 ms of compiler-
    # estimated time in the unrolled program)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, h), jnp.int8),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32)),
        grid=(pl.cdiv(rows, br),),
        in_specs=[
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, w2, b2)


@functools.partial(
    jax.jit, static_argnames=("act", "block_rows", "interpret"))
def actq_pallas(x, *, act: str = "gelu_quick", block_rows: int | None = None,
                interpret: bool = False):
    """Elementwise activation + per-row dynamic int8 quant in one VMEM pass.

    ``act``: 'gelu_quick' (x*sigmoid(1.702x), ggml_gelu_quick), 'gelu_tanh'
    (ggml_gelu) or 'none'.  The down-projection input is the model's largest
    activation ([rows, 4H]), so int8 staging pays most there: half the write
    bytes and no separate amax pass.
    """
    if act not in ("gelu_quick", "gelu_tanh", "none"):
        raise ValueError(f"unknown act {act!r}")
    rows, h = x.shape
    br = block_rows or _block_rows(rows, h, _ROW_BUDGET)

    def kernel(x_ref, o_ref, s_ref):
        y = x_ref[:].astype(jnp.float32)
        if act == "gelu_quick":
            y = y * (0.5 + 0.5 * jnp.tanh(0.851 * y))  # = logistic(1.702y): tanh lowers cheaper (ablate_mlp_kernel.py)
        elif act == "gelu_tanh":
            y = 0.5 * y * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (y + 0.044715 * y * y * y)))
        codes, sx = _quantize_rows(y)
        o_ref[:] = codes
        s_ref[:] = sx

    # ragged grid (see lnq_pallas): Mosaic masks the tail block itself
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, h), jnp.int8),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32)),
        grid=(pl.cdiv(rows, br),),
        in_specs=[pl.BlockSpec((br, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((br, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x)


def _gemm_block_rows(rows: int, n: int, k: int) -> int:
    """Row block for gemm_gq: the weight [N, K] int8 is VMEM-resident across
    the whole grid, and each block carries ~11 B/element of [br, N] state
    (int32 acc + f32 epilogue copy + int8 out, double-buffered edges).  Budget
    the pair against a ~13 MB scoped-VMEM target."""
    budget = 13 * 1024 * 1024 - n * k
    br = max(8, (budget // (11 * n)) // 8 * 8)
    rp = -(-rows // 8) * 8
    return min(br, 256, rp)


@functools.partial(
    jax.jit, static_argnames=("act", "block_rows", "interpret"))
def gemm_gq_pallas(codes, sx, w8, ws, bias, *, act: str = "gelu_quick",
                   block_rows: int | None = None, interpret: bool = False):
    """int8 GEMM with the gelu->int8-requant epilogue fused in VMEM.

    ``codes [M, K] int8`` (per-row scales ``sx [M, 1]`` f32, as produced by
    :func:`lnq_pallas`) @ ``w8 [N, K] int8`` (per-channel scales ``ws [N]``)
    + ``bias [N]`` -> gelu -> per-row symmetric int8 -> (codes ``[M, N]``
    int8, scales ``[M, 1]`` f32).

    This is the up-projection + :func:`actq_pallas` pair in ONE kernel: the
    [M, 4H] bf16 intermediate — the model's largest activation — never
    touches HBM (the unfused pair writes it after the dot and reads it all
    back to quantize; ~0.6 ms/layer of pure bandwidth at B/32 B=448).  The
    Mosaic int8 dot itself matches XLA's at these shapes
    (scripts/proto_int8_gemm_rate.py: 2.617 vs 2.616 ms at [22400,768]x
    [768,3072]), so the round-trip saving is kept.  Epilogue math is f32
    end-to-end — slightly MORE precise than the unfused pair, whose
    intermediate rounds through bf16 (tests/test_actquant_fusion.py bounds
    the agreement).  Accumulation int32: |K*127*127| < 2^31 at CLIP widths.
    """
    if act not in ("gelu_quick", "gelu_tanh", "none"):
        raise ValueError(f"unknown act {act!r}")
    m, k = codes.shape
    n = w8.shape[0]
    br = block_rows or _gemm_block_rows(m, n, k)
    ws2 = ws.reshape(1, n)
    b2 = bias.reshape(1, n)

    def kernel(x_ref, sx_ref, w_ref, ws_ref, b_ref, o_ref, s_ref):
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx_ref[:] * ws_ref[0, :] + b_ref[0, :]
        if act == "gelu_quick":
            y = y * (0.5 + 0.5 * jnp.tanh(0.851 * y))  # = logistic(1.702y): tanh lowers cheaper (ablate_mlp_kernel.py)
        elif act == "gelu_tanh":
            y = 0.5 * y * (1.0 + jnp.tanh(
                _SQRT_2_OVER_PI * (y + 0.044715 * y * y * y)))
        codes_b, sx_b = _quantize_rows(y)
        o_ref[:] = codes_b
        s_ref[:] = sx_b

    # ragged grid (see lnq_pallas): the tail block reads garbage rows past
    # the array end (int8 — no NaN risk) and its stores are masked, so the
    # XLA pad of codes+scales and the slice of the outputs disappear
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((m, n), jnp.int8),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)),
        grid=(pl.cdiv(m, br),),
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
    )(codes, sx, w8, ws2, b2)


# ---------------------------------------------------------------------------
# Whole-MLP fusion: up-GEMM -> gelu -> row requant -> down-GEMM in ONE kernel.
#
# gemm_gq_pallas keeps the [rows, 4H] bf16 up-output in VMEM but still writes
# its int8 codes to HBM for w8a8_pre to read straight back (the model's
# largest activation: 2 x M x 4H bytes/layer of pure round-trip).  At
# H <= 1024 BOTH weight matrices fit VMEM-resident (int8 [4H,H] + [H,4H] =
# 4.7 MB at H=768, 8.4 MB at H=1024), so one row-grid kernel runs the whole
# MLP and the intermediate never exists outside VMEM in any dtype.  Measured
# (scripts/proto_mlp_fused_kernel.py, slope-timed in-run): bit-identical to
# the gemm_gq + w8a8_pre pair, ~5% faster isolated at B/32 shapes.
# Reference anchor: the fused dequant-dot philosophy of ggml_mul_mat over
# the reference MLP chain (/root/reference/clip.cpp:1104-1142).
# ---------------------------------------------------------------------------

# Calibrated on hardware, not first-principles: Mosaic reuses the int32 acc
# for the f32 epilogue (elementwise, same shape), so a naive all-live sum
# wildly overestimates.  Measured (scripts/proto_mlp_fused_kernel.py):
# br=256 compiles AND is the fastest block at both H=768 (weights 4.7 MB)
# and H=1024 (8.4 MB); H=1280 (13.1 MB resident) leaves no usable block.
_MLP_MAX_WEIGHT_BYTES = 9 * 1024 * 1024 + 512 * 1024


def _mlp_block_rows(rows: int, n: int, k: int, with_ln: bool) -> "int | None":
    if 2 * n * k > _MLP_MAX_WEIGHT_BYTES:
        return None
    rp = -(-rows // 8) * 8
    return min(256, rp)


def mlp_fusable(h: int, n4h: int) -> bool:
    """True iff the whole-MLP kernel can run at this width (both weights
    VMEM-resident with a usable row block)."""
    return (fusable_width(h) and fusable_width(n4h)
            and _mlp_block_rows(8, n4h, h, True) is not None)


def _mlp_body(x32, sx, uw_ref, uws_ref, ub_ref, dw_ref, dws_ref, act):
    """Shared math: int8 codes (+row scales) -> up dot -> rescale+bias ->
    gelu -> row requant -> down dot -> f32 rescale.  Same ops in the same
    order as gemm_gq_pallas + w8a8_pre, so outputs are bit-identical."""
    acc = jax.lax.dot_general(
        x32, uw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * uws_ref[0, :] + ub_ref[0, :]
    if act == "gelu_quick":
        y = y * (0.5 + 0.5 * jnp.tanh(0.851 * y))  # = logistic(1.702y): tanh lowers cheaper (ablate_mlp_kernel.py)
    elif act == "gelu_tanh":
        y = 0.5 * y * (1.0 + jnp.tanh(
            _SQRT_2_OVER_PI * (y + 0.044715 * y * y * y)))
    c2, s2 = _quantize_rows(y)
    acc2 = jax.lax.dot_general(
        c2, dw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc2.astype(jnp.float32) * s2 * dws_ref[0, :]


@functools.partial(
    jax.jit, static_argnames=("act", "block_rows", "interpret", "out_dtype"))
def mlp_gq_pallas(codes, sx, up8, upws, upb, dn8, dnws, *,
                  act: str = "gelu_quick", block_rows: int | None = None,
                  interpret: bool = False, out_dtype=jnp.bfloat16):
    """Pre-quantized codes in -> whole MLP -> out (down bias NOT added:
    under tensor parallelism the psum comes first, like w8a8_pre callers)."""
    if act not in ("gelu_quick", "gelu_tanh", "none"):
        raise ValueError(f"unknown act {act!r}")
    m, k = codes.shape
    n = up8.shape[0]
    br = block_rows or _mlp_block_rows(m, n, k, with_ln=False)
    if br is None:
        raise ValueError(f"mlp_gq_pallas: width {n}x{k} exceeds VMEM budget")
    upws2, upb2, dnws2 = upws.reshape(1, n), upb.reshape(1, n), dnws.reshape(1, k)

    def kernel(x_ref, sx_ref, uw_ref, uws_ref, ub_ref, dw_ref, dws_ref, o_ref):
        o_ref[:] = _mlp_body(
            x_ref[:], sx_ref[:], uw_ref, uws_ref, ub_ref, dw_ref, dws_ref,
            act).astype(o_ref.dtype)

    # ragged grid (see lnq_pallas): tail-block stores are masked by Mosaic
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, k), out_dtype),
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


def _mlp_half(x, lw_ref, lb_ref, uw_ref, uws_ref, ub_ref, dw_ref, dws_ref,
              db_ref, *, eps, act, cdt, residual):
    """The whole-MLP math over one row block ``x [rt, H]``: LN -> int8 row
    quant -> up GEMM -> gelu -> requant -> down GEMM (-> +bias -> +residual).
    Shared by the MLP kernel and the whole-layer kernel."""
    xv = x.astype(jnp.float32)
    mu = jnp.mean(xv, axis=1, keepdims=True)
    ms = jnp.mean(xv * xv, axis=1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    y = (xv - mu) * jax.lax.rsqrt(var + eps)
    y = y * lw_ref[0, :].astype(jnp.float32) + lb_ref[0, :].astype(jnp.float32)
    c1, s1 = _quantize_rows(y)
    t = _mlp_body(
        c1, s1, uw_ref, uws_ref, ub_ref, dw_ref, dws_ref, act).astype(cdt)
    if db_ref is not None:
        # same dtype, same add order as the XLA ops this replaces:
        # x + (mlp_out_cdt + bias_cdt)
        t = t + db_ref[0, :].astype(cdt)
        if residual:
            t = x.astype(cdt) + t
    return t


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "block_rows", "interpret", "out_dtype",
                     "residual"))
def mlp_lnq_pallas(x, lnw, lnb, up8, upws, upb, dn8, dnws, dnb=None, *,
                   eps: float, act: str = "gelu_quick",
                   block_rows: int | None = None,
                   interpret: bool = False, out_dtype=jnp.bfloat16,
                   residual: bool = False):
    """Raw bf16 residual in -> LN -> quant -> whole MLP -> bf16 out.  One
    kernel replaces the lnq_pallas + gemm_gq_pallas + w8a8_pre chain: the
    LN'd codes and the 4H intermediate both stay in VMEM.

    With ``dnb`` (the down bias) the epilogue adds it in-kernel, and with
    ``residual=True`` the kernel emits ``x + mlp(ln(x))`` directly — the two
    trailing XLA passes over the [rows, H] residual stream disappear (x is
    already VMEM-resident from the LN read).  Without ``dnb`` the output is
    pre-bias, for tensor parallelism where the psum must come first."""
    if act not in ("gelu_quick", "gelu_tanh", "none"):
        raise ValueError(f"unknown act {act!r}")
    if residual and dnb is None:
        raise ValueError("residual=True requires dnb")
    m, k = x.shape
    n = up8.shape[0]
    br = block_rows or _mlp_block_rows(m, n, k, with_ln=True)
    if br is None:
        raise ValueError(f"mlp_lnq_pallas: width {n}x{k} exceeds VMEM budget")
    lnw2, lnb2 = lnw.reshape(1, k), lnb.reshape(1, k)
    upws2, upb2, dnws2 = upws.reshape(1, n), upb.reshape(1, n), dnws.reshape(1, k)

    def body(x_ref, lw_ref, lb_ref, uw_ref, uws_ref, ub_ref, dw_ref,
             dws_ref, db_ref, o_ref):
        o_ref[:] = _mlp_half(
            x_ref[:], lw_ref, lb_ref, uw_ref, uws_ref, ub_ref, dw_ref,
            dws_ref, db_ref, eps=eps, act=act, cdt=o_ref.dtype,
            residual=residual)

    if dnb is None:
        def kernel(x_ref, lw, lb, uw, uws, ub, dw, dws, o_ref):
            body(x_ref, lw, lb, uw, uws, ub, dw, dws, None, o_ref)
    else:
        kernel = body
    in_specs = [
        pl.BlockSpec((br, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, lnw2, lnb2, up8, upws2, upb2, dn8, dnws2]
    if dnb is not None:
        in_specs.append(
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM))
        operands.append(dnb.reshape(1, k))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, k), out_dtype),
        grid=(pl.cdiv(m, br),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Weight-STREAMED whole-MLP kernel: the widths the resident-weight kernel
# cannot serve (ViT-H/14's 1280x5120 = 13.1 MB of int8 weights) run the same
# fused MLP with the two weight matrices streamed through VMEM in column
# chunks instead of resident.  Two-phase grid per row block:
#
#   phase 1 (j = 0..c-1):   up-GEMM chunk j -> rescale+bias -> gelu -> store
#                           into a [br, 4H] f32 VMEM scratch; running row amax
#   phase 2 (j = c..2c-1):  quantize scratch chunk (j-c) with the FULL-row
#                           scale -> int8 down-GEMM chunk -> int32 accumulate
#
# Because the requant scale is the full-row amax (known after phase 1) and
# int32 chunk-dot accumulation is exact, the output is BIT-IDENTICAL to
# mlp_lnq_pallas / the staged chain — the streaming is invisible to numerics
# (tests/test_actquant_fusion.py asserts array_equal).  Mosaic double-buffers
# the chunk fetches across grid steps, so phase-1 compute overlaps phase-1
# weight DMA; x and the output block ride along at a constant index (fetched/
# flushed once per row block).  Reference anchor: same role as the resident
# kernel — /root/reference/clip.cpp:1119-1142's MLP chain fused per ggml's
# quantize-then-dot pipeline.
# ---------------------------------------------------------------------------

def _mlp_stream_plan(rows: int, k: int, n: int) -> "tuple[int, int] | None":
    """(block_rows, n_chunks) for the streamed MLP, or None if the geometry
    has no 128-aligned chunking.  Budget: br*(5k + 4n) scratch + 4 chunk
    buffers (double-buffered up+down) + bf16 x/out blocks <= ~13 MB."""
    if k % 128 != 0 or n % 128 != 0:
        return None
    budget = 13 * 1024 * 1024
    # prefer LARGE row blocks over fewer chunks: the isolated race at
    # 1280x5120 puts (256,8) ~25% ahead of (128,4) — full row blocks keep
    # the MXU dots tall, while extra chunks only shorten the (pipelined)
    # weight DMAs (scripts/proto_mlp_stream.py)
    for br in (256, 128, 64, 32, 16, 8):
        for c in (4, 8, 16, 2, 32):
            if n % c or (n // c) % 128:
                continue
            nc = n // c
            chunks = 4 * nc * k
            scratch = br * (5 * k + 4 * n + 12)
            xo = 2 * br * k * 2 * 2
            if chunks + scratch + xo <= budget:
                rp = -(-rows // 8) * 8
                return min(br, rp), c
    return None


def mlp_stream_fusable(h: int, n4h: int) -> bool:
    """True iff the streamed whole-MLP kernel can run at this width."""
    return (fusable_width(h) and fusable_width(n4h)
            and _mlp_stream_plan(8, h, n4h) is not None)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "block_rows", "n_chunks", "interpret",
                     "out_dtype", "residual", "exact"))
def mlp_lnq_stream_pallas(x, lnw, lnb, up8, upws, upb, dn8, dnws, dnb=None, *,
                          eps: float, act: str = "gelu_quick",
                          block_rows: int | None = None,
                          n_chunks: int | None = None,
                          interpret: bool = False, out_dtype=jnp.bfloat16,
                          residual: bool = False, exact: bool = True):
    """Weight-streamed variant of :func:`mlp_lnq_pallas` — same contract,
    same numerics (bit-identical), for widths whose weights exceed the
    resident-kernel VMEM budget.  ``dnb``/``residual`` as in the resident
    kernel (pre-bias output when ``dnb`` is None, for TP psum-first).

    ``exact=False`` switches to SINGLE-phase streaming: each 4H chunk is
    requantized with its OWN per-row scale and fed straight to its down-GEMM
    chunk (grid c instead of 2c; no [br, 4H] f32 staging scratch).  Not
    bit-identical to the resident kernel — per-chunk scales are FINER-grained
    than the full-row scale, so the int8 staging error is smaller-or-equal —
    but cheaper on VMEM traffic."""
    if act not in ("gelu_quick", "gelu_tanh", "none"):
        raise ValueError(f"unknown act {act!r}")
    if residual and dnb is None:
        raise ValueError("residual=True requires dnb")
    m, k = x.shape
    n = up8.shape[0]
    plan = _mlp_stream_plan(m, k, n)
    if plan is None:
        raise ValueError(f"mlp_lnq_stream_pallas: no chunk plan for {k}x{n}")
    br = block_rows or plan[0]
    c = n_chunks or plan[1]
    if n % c or (n // c) % 128:
        raise ValueError(f"n_chunks {c} must 128-align {n}")
    nc = n // c
    lnw2, lnb2 = lnw.reshape(1, k), lnb.reshape(1, k)
    upws2, upb2, dnws2 = upws.reshape(1, n), upb.reshape(1, n), dnws.reshape(1, k)

    def _ln_codes(x_ref, lw_ref, lb_ref, c1_ref, s1_ref):
        xv = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xv, axis=1, keepdims=True)
        ms = jnp.mean(xv * xv, axis=1, keepdims=True)
        var = jnp.maximum(ms - mu * mu, 0.0)
        y = (xv - mu) * jax.lax.rsqrt(var + eps)
        y = (y * lw_ref[0, :].astype(jnp.float32)
             + lb_ref[0, :].astype(jnp.float32))
        codes, sx = _quantize_rows(y)
        c1_ref[:] = codes
        s1_ref[:] = sx

    def _up_chunk(c1_ref, s1_ref, uw_ref, uws_ref, ub_ref):
        # up-GEMM chunk: [br, k] int8 x [nc, k] int8 -> [br, nc]
        acc = jax.lax.dot_general(
            c1_ref[:], uw_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * s1_ref[:] * uws_ref[0, :]
             + ub_ref[0, :])
        if act == "gelu_quick":
            y = y * (0.5 + 0.5 * jnp.tanh(0.851 * y))  # = logistic(1.702y): tanh lowers cheaper (ablate_mlp_kernel.py)
        elif act == "gelu_tanh":
            y = 0.5 * y * (1.0 + jnp.tanh(
                _SQRT_2_OVER_PI * (y + 0.044715 * y * y * y)))
        return y

    def _emit_acc(j, last, acc_f32, x_ref, db_ref, o_ref):
        @pl.when(j == last)
        def _():
            t = acc_f32.astype(o_ref.dtype)
            if db_ref is not None:
                t = t + db_ref[0, :].astype(o_ref.dtype)
                if residual:
                    t = x_ref[:].astype(o_ref.dtype) + t
            o_ref[:] = t

    def body(x_ref, lw_ref, lb_ref, uw_ref, uws_ref, ub_ref, dw_ref, dws_ref,
             db_ref, o_ref, c1_ref, s1_ref, y_ref, am_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _ln():
            _ln_codes(x_ref, lw_ref, lb_ref, c1_ref, s1_ref)

        @pl.when(j < c)
        def _up():
            y = _up_chunk(c1_ref, s1_ref, uw_ref, uws_ref, ub_ref)
            y_ref[:, pl.dslice(j * nc, nc)] = y
            cur = jnp.max(jnp.abs(y), axis=1, keepdims=True)
            am_ref[:] = jnp.where(j == 0, cur, jnp.maximum(am_ref[:], cur))

        @pl.when(j >= c)
        def _down():
            cc = j - c
            sx2 = am_ref[:] / 127.0 + 1e-12       # full-row scale, like
            y = y_ref[:, pl.dslice(cc * nc, nc)]  # _quantize_rows
            c2 = jnp.clip(jnp.round(y / sx2), -127, 127).astype(jnp.int8)
            d = jax.lax.dot_general(
                c2, dw_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_ref[:] = jnp.where(j == c, d, acc_ref[:] + d)

        @pl.when(j == 2 * c - 1)
        def _emit():
            sx2 = am_ref[:] / 127.0 + 1e-12
            t = acc_ref[:].astype(jnp.float32) * sx2 * dws_ref[0, :]
            _emit_acc(j, 2 * c - 1, t, x_ref, db_ref, o_ref)

    def body_1phase(x_ref, lw_ref, lb_ref, uw_ref, uws_ref, ub_ref, dw_ref,
                    dws_ref, db_ref, o_ref, c1_ref, s1_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _ln():
            _ln_codes(x_ref, lw_ref, lb_ref, c1_ref, s1_ref)

        y = _up_chunk(c1_ref, s1_ref, uw_ref, uws_ref, ub_ref)
        c2, sx2 = _quantize_rows(y)               # per-CHUNK row scales
        d = jax.lax.dot_general(
            c2, dw_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        part = d.astype(jnp.float32) * sx2 * dws_ref[0, :]
        acc_ref[:] = jnp.where(j == 0, part, acc_ref[:] + part)
        _emit_acc(j, c - 1, acc_ref[:], x_ref, db_ref, o_ref)

    base = body if exact else body_1phase
    if dnb is None:
        def kernel(x_ref, lw, lb, uw, uws, ub, dw, dws, o_ref, *scr):
            base(x_ref, lw, lb, uw, uws, ub, dw, dws, None, o_ref, *scr)
    else:
        kernel = base

    rep = lambda i, j: (0, 0)
    if exact:
        up_idx = lambda i, j: (jnp.minimum(j, c - 1), 0)   # hold in phase 2
        upc_idx = lambda i, j: (0, jnp.minimum(j, c - 1))
        dn_idx = lambda i, j: (0, jnp.maximum(j - c, 0))   # hold in phase 1
        grid = (pl.cdiv(m, br), 2 * c)
        scratch = [
            pltpu.VMEM((br, k), jnp.int8),      # LN'd codes
            pltpu.VMEM((br, 1), jnp.float32),   # LN quant scales
            pltpu.VMEM((br, n), jnp.float32),   # gelu(up) staging
            pltpu.VMEM((br, 1), jnp.float32),   # running row amax
            pltpu.VMEM((br, k), jnp.int32),     # down-GEMM accumulator
        ]
    else:
        up_idx = lambda i, j: (j, 0)
        upc_idx = lambda i, j: (0, j)
        dn_idx = lambda i, j: (0, j)
        grid = (pl.cdiv(m, br), c)
        scratch = [
            pltpu.VMEM((br, k), jnp.int8),      # LN'd codes
            pltpu.VMEM((br, 1), jnp.float32),   # LN quant scales
            pltpu.VMEM((br, k), jnp.float32),   # f32 partial-sum accumulator
        ]
    in_specs = [
        pl.BlockSpec((br, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), rep, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), rep, memory_space=pltpu.VMEM),
        pl.BlockSpec((nc, k), up_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc), upc_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc), upc_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, nc), dn_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), rep, memory_space=pltpu.VMEM),
    ]
    operands = [x, lnw2, lnb2, up8, upws2, upb2, dn8, dnws2]
    if dnb is not None:
        in_specs.append(pl.BlockSpec((1, k), rep, memory_space=pltpu.VMEM))
        operands.append(dnb.reshape(1, k))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, k), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, k), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)


def w8a8_pre(codes, sx, w: W8Tensor, compute_dtype=jnp.bfloat16):
    """The int8 dot + f32 rescale half of ``w8a8_matmul`` over PRE-quantized
    codes: ``codes [M, K] int8 @ w.c8 [N, K].T -> [M, N]`` rescaled by
    ``sx * w.ws``.  Accumulation int32 (|K*127*127| < 2^31 at CLIP widths)."""
    acc = jax.lax.dot_general(
        codes, w.c8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * w.ws[None, :]
    return y.astype(compute_dtype)
