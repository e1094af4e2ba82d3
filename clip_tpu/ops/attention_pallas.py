"""Fused multi-head attention Pallas kernel for short sequences.

CLIP sequences are tiny (77 text tokens, 50-577 vision patches) so the whole
per-image attention — scores, mask, f32 softmax, value mix — fits in VMEM.
XLA's einsum formulation instead materializes transposed Q/K/V copies and the
f32 [B, H, S, S] score tensor in HBM, which measures ~45% of ViT-B/32's
runtime despite being ~1% of its FLOPs.  This kernel reads Q/K/V once, keeps
every intermediate in VMEM, and writes only the mixed output.

Layout: Q/K/V stay in their natural [B, S, H] projection layout (no
[B, H, S, D] transpose); heads are static slices along the last axis and are
processed by an unrolled loop of small MXU dots inside each grid step.  The
grid runs over image groups of ``block_b``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flat_eligible", "mha_pallas", "mha_pallas_qkv",
           "mha_pallas_qkv_i8", "attn_block_pallas", "attn_block_fusable",
           "attn_block_stream_pallas", "attn_block_stream_fusable",
           "layer_block_pallas", "layer_block_fusable"]

NEG_INF = -1e9

# Softmax without the row-max subtract: the subtracted max is only a
# numerical-range guard, and a static clip gives the same guarantee without
# the cross-lane max reduce (measured 0.067 ms/layer at the B/32 bench shape,
# scripts/ablate_attn_kernel.py round 5).  Safety of the +-80 bound:
#   * no overflow: exp(80) * rt < 1.2e37 < f32 max for any rt <= 2e5;
#   * no 0/0 rows: exp(-80) = 1.8e-35 is a NORMAL f32 (not flushed to zero
#     on TPU), so even a row whose scores all clip low still normalizes;
#   * masked entries stay EXACTLY 0: the clip applies BEFORE the additive
#     -1e9 mask, so masked logits still reach exp as -1e9 -> 0.0 — the
#     pad-once bit-identity of real rows (models/vision.py) is preserved.
# Mathematically exp(s)/sum(exp(s)) == exp(s-m)/sum(exp(s-m)); results
# differ from the subtracted form only in f32 rounding (~1e-7 relative)
# unless true scores leave +-80, which post-LN CLIP attention never
# approaches (typical logits are O(30); ggml's reference softmax at
# /root/reference/clip.cpp:1172-1177 subtracts the max for the same range
# guard, not for value).  SOFTMAX_EXACT_MAX restores the subtracted form.
SOFTMAX_EXACT_MAX = False
_SM_BOUND = 80.0


def _softmax_rows(scores, bias):
    """Masked row softmax shared by every attention kernel (bias is the
    additive 0/-1e9 mask; see SOFTMAX_EXACT_MAX note above)."""
    if SOFTMAX_EXACT_MAX:
        scores = scores + bias
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores)
    else:
        p = jnp.exp(jnp.clip(scores, -_SM_BOUND, _SM_BOUND) + bias)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _quant_heads(outs):
    """Per-head requant of the attention mix: elementwise max of per-head
    row amaxes (== the full-row amax EXACTLY, max is associative) then
    per-head divide/round/clip, concatenated as int8.  Bit-identical values
    to concat-then-quantize, but the 768-lane reduce becomes 64-lane
    reduces and the concat moves to int8 (half the bytes): +0.087 ms/layer
    at the B/32 bench shape (scripts/ablate_attn_kernel.py req_perhead_div).
    Returns (codes [rt, n*dh] int8, scales [rt, 1] f32)."""
    amax = jnp.max(jnp.abs(outs[0]), axis=1, keepdims=True)
    for o in outs[1:]:
        amax = jnp.maximum(amax, jnp.max(jnp.abs(o), axis=1, keepdims=True))
    sx = amax / 127.0 + 1e-12
    codes = jnp.concatenate(
        [jnp.clip(jnp.round(o / sx), -127, 127).astype(jnp.int8)
         for o in outs], axis=1)
    return codes, sx


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, n_head, seq_len, causal, scale):
    """One grid step = ``bb`` images.  The bb images are stacked along the
    row axis so each head runs ONE [bb*S, D] x [D, bb*S] MXU dot instead of
    bb tiny ones; cross-image score blocks are masked to -inf (block-diagonal
    attention).  The (bb-1)x wasted MACs are noise — attention is ~1% of the
    model's FLOPs — while MXU utilization goes from ~15% to full tiles."""
    bb = q_ref.shape[0]
    s_pad = q_ref.shape[1]
    h = q_ref.shape[2]
    dh = h // n_head
    rows_total = bb * s_pad

    rows = jax.lax.broadcasted_iota(jnp.int32, (rows_total, rows_total), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows_total, rows_total), 1)
    invalid = (rows // s_pad) != (cols // s_pad)          # cross-image
    invalid = jnp.logical_or(invalid, cols % s_pad >= seq_len)  # key padding
    if causal:
        invalid = jnp.logical_or(invalid, cols % s_pad > rows % s_pad)
    bias = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    contract_t = (((1,), (1,)), ((), ()))  # X [M,D] x Y [N,D] -> X @ Y.T
    contract_n = (((1,), (0,)), ((), ()))  # X [M,N] x Y [N,D] -> X @ Y

    for hd in range(n_head):
        sl = slice(hd * dh, (hd + 1) * dh)
        qh = q_ref[:, :, sl].reshape(rows_total, dh) * jnp.asarray(scale, q_ref.dtype)
        kh = k_ref[:, :, sl].reshape(rows_total, dh)
        vh = v_ref[:, :, sl].reshape(rows_total, dh)
        scores = jax.lax.dot_general(
            qh, kh, contract_t, preferred_element_type=jnp.float32
        )
        p = _softmax_rows(scores, bias)
        out = jax.lax.dot_general(
            p.astype(q_ref.dtype), vh, contract_n, preferred_element_type=jnp.float32
        )
        o_ref[:, :, sl] = out.astype(o_ref.dtype).reshape(bb, s_pad, dh)


def _qkv_kernel(qkv_ref, o_ref, *, n_head, seq_len, causal, scale):
    """Same block-diagonal attention as _mha_kernel, but reading the fused
    [bb, S, 3H] QKV projection directly: Q/K/V become 128-aligned lane
    slices in VMEM, so the XLA-level split/scale/pad passes (3x ~20 MB HBM
    round-trips per layer at ViT-B/32 B=256) disappear."""
    bb = qkv_ref.shape[0]
    s_pad = qkv_ref.shape[1]
    h = qkv_ref.shape[2] // 3
    dh = h // n_head
    rows_total = bb * s_pad

    rows = jax.lax.broadcasted_iota(jnp.int32, (rows_total, rows_total), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows_total, rows_total), 1)
    invalid = (rows // s_pad) != (cols // s_pad)
    invalid = jnp.logical_or(invalid, cols % s_pad >= seq_len)
    if causal:
        invalid = jnp.logical_or(invalid, cols % s_pad > rows % s_pad)
    bias = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    contract_t = (((1,), (1,)), ((), ()))
    contract_n = (((1,), (0,)), ((), ()))

    for hd in range(n_head):
        qs = slice(hd * dh, (hd + 1) * dh)
        ks = slice(h + hd * dh, h + (hd + 1) * dh)
        vs = slice(2 * h + hd * dh, 2 * h + (hd + 1) * dh)
        qh = qkv_ref[:, :, qs].reshape(rows_total, dh) * jnp.asarray(scale, qkv_ref.dtype)
        kh = qkv_ref[:, :, ks].reshape(rows_total, dh)
        vh = qkv_ref[:, :, vs].reshape(rows_total, dh)
        scores = jax.lax.dot_general(
            qh, kh, contract_t, preferred_element_type=jnp.float32
        )
        p = _softmax_rows(scores, bias)
        out = jax.lax.dot_general(
            p.astype(qkv_ref.dtype), vh, contract_n, preferred_element_type=jnp.float32
        )
        o_ref[:, :, hd * dh:(hd + 1) * dh] = out.astype(o_ref.dtype).reshape(
            bb, s_pad, dh)


def _qkv_kernel_flat(qkv_ref, o_ref, *s_ref_opt, n_head, seq_len, causal,
                     scale, valid_len, quant_out=False):
    """Pad-free variant: rows are ``bb`` whole images flattened to
    ``[bb*S, 3H]`` (chosen so the row count is sublane-aligned), so the HBM
    pad pass the 3-D layout needs (S -> S_pad rewrite of the full activation
    every layer, ~1.1 ms/step at ViT-B/32 B=256) disappears, and the output
    is produced in the flat 2-D layout the residual add wants (no relayout
    copy).  ``valid_len < seq_len`` masks trailing pad KEYS within each
    image (the pad-once-at-embedding vision path).

    ``quant_out``: int8 epilogue for the W8A8 o-projection — per-row amax +
    quantize of the mixed output happens here in VMEM (same math as
    ``w8a8_matmul``'s operand quant), so the o-GEMM's separate amax pass and
    the bf16 write/read of the attention output disappear; ``o_ref`` holds
    int8 codes and ``s_ref_opt[0]`` the f32 row scales."""
    rt = qkv_ref.shape[0]
    h = qkv_ref.shape[1] // 3
    dh = h // n_head

    rows = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    invalid = (rows // seq_len) != (cols // seq_len)      # cross-image
    if valid_len < seq_len:
        invalid = jnp.logical_or(invalid, cols % seq_len >= valid_len)
    if causal:
        invalid = jnp.logical_or(invalid, cols % seq_len > rows % seq_len)
    bias = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    contract_t = (((1,), (1,)), ((), ()))
    contract_n = (((1,), (0,)), ((), ()))
    outs = []
    for hd in range(n_head):
        qs = slice(hd * dh, (hd + 1) * dh)
        ks = slice(h + hd * dh, h + (hd + 1) * dh)
        vs = slice(2 * h + hd * dh, 2 * h + (hd + 1) * dh)
        qh = qkv_ref[:, qs] * jnp.asarray(scale, qkv_ref.dtype)
        kh = qkv_ref[:, ks]
        vh = qkv_ref[:, vs]
        scores = jax.lax.dot_general(
            qh, kh, contract_t, preferred_element_type=jnp.float32
        )
        p = _softmax_rows(scores, bias)
        out = jax.lax.dot_general(
            p.astype(qkv_ref.dtype), vh, contract_n, preferred_element_type=jnp.float32
        )
        if quant_out:
            outs.append(out)
        else:
            o_ref[:, qs] = out.astype(o_ref.dtype)
    if quant_out:
        codes, sx = _quant_heads(outs)
        o_ref[:] = codes
        s_ref_opt[0][:] = sx


def _qkv_kernel_flat_i8(qkv_ref, s_ref, o_ref, *s_ref_opt, n_head, seq_len,
                        causal, scale, valid_len, quant_out=False):
    """Flat kernel over an int8-quantized qkv projection (codes [rt, 3H] +
    per-row f32 scales [rt, 1], as emitted by ``gemm_gq_pallas(act='none')``).

    The score dot runs on the INT8 MXU with exact int32 accumulation — the
    per-row scales factor out of the contraction entirely, so the rescale is
    a rank-1 outer product folded into the bias add.  Reads half the bytes of
    the bf16 kernel and moves its dominant dot to the 2.5x int8 MXU rate:
    1.22x end-to-end on the kernel at ViT-B/32 shapes
    (scripts/proto_attn_int8.py; the all-int8 V-mix variant measured SLOWER —
    the p requant doesn't pay for itself at d_head=64 — so V dequantizes to
    bf16 in VMEM).  Numerics: the int32 score accumulation is exact where the
    bf16 kernel rounds, so agreement with the bf16 kernel is bf16-grade
    (cos 0.9999 per call); the int8 staging error itself belongs to the
    producing GEMM's epilogue, not this kernel."""
    rt = qkv_ref.shape[0]
    h = qkv_ref.shape[1] // 3
    dh = h // n_head

    rows = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    invalid = (rows // seq_len) != (cols // seq_len)      # cross-image
    if valid_len < seq_len:
        invalid = jnp.logical_or(invalid, cols % seq_len >= valid_len)
    if causal:
        invalid = jnp.logical_or(invalid, cols % seq_len > rows % seq_len)
    bias = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    ct = (((1,), (1,)), ((), ()))
    cn = (((1,), (0,)), ((), ()))
    sx = s_ref[:]                                         # [rt, 1] f32
    srow = sx * jnp.float32(scale)                        # Q-side scale
    scol = sx.reshape(1, rt)                              # K-side scale

    outs = []
    for hd in range(n_head):
        qs = slice(hd * dh, (hd + 1) * dh)
        ks = slice(h + hd * dh, h + (hd + 1) * dh)
        vs = slice(2 * h + hd * dh, 2 * h + (hd + 1) * dh)
        acc = jax.lax.dot_general(
            qkv_ref[:, qs], qkv_ref[:, ks], ct,
            preferred_element_type=jnp.int32)
        scores = acc.astype(jnp.float32) * srow * scol
        p = _softmax_rows(scores, bias)
        vh = (qkv_ref[:, vs].astype(jnp.float32) * sx).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh, cn, preferred_element_type=jnp.float32)
        if quant_out:
            outs.append(out)
        else:
            o_ref[:, qs] = out.astype(o_ref.dtype)
    if quant_out:
        codes, sp = _quant_heads(outs)
        o_ref[:] = codes
        s_ref_opt[0][:] = sp


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "causal", "scale", "interpret", "valid_len",
                     "quant_out", "out_dtype"),
)
def mha_pallas_qkv_i8(
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    *,
    n_head: int,
    scale: float,
    causal: bool = False,
    interpret: bool = False,
    valid_len: "int | None" = None,
    quant_out: bool = False,
    out_dtype=jnp.bfloat16,
):
    """Fused MHA over an int8-staged projection ``codes [B, S, 3H]`` +
    per-row scales ``[B, S, 1]`` -> ``[B, S, H]`` (or int8 codes + scales
    with ``quant_out``).  Flat path only — callers gate on
    :func:`flat_eligible` with the same (b, s, 3h, quant_out) arguments."""
    b, s, h3 = codes.shape
    h = h3 // 3
    vl = s if valid_len is None else valid_len

    bb = _flat_block_b(b, s, h3, quant_out)
    if bb is None:
        raise ValueError(
            "mha_pallas_qkv_i8 requires the flat path: gate on flat_eligible")
    rt = bb * s
    b_pad = -(-b // bb) * bb
    c2 = codes.reshape(b * s, h3)
    s2 = scales.reshape(b * s, 1)
    if b_pad != b:
        c2 = jnp.pad(c2, ((0, (b_pad - b) * s), (0, 0)))
        s2 = jnp.pad(s2, ((0, (b_pad - b) * s), (0, 0)))
    kernel = functools.partial(
        _qkv_kernel_flat_i8, n_head=n_head, seq_len=s, causal=causal,
        scale=scale, valid_len=vl, quant_out=quant_out,
    )
    if quant_out:
        out_shape = (jax.ShapeDtypeStruct((b_pad * s, h), jnp.int8),
                     jax.ShapeDtypeStruct((b_pad * s, 1), jnp.float32))
        out_specs = (
            pl.BlockSpec((rt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
    else:
        out_shape = jax.ShapeDtypeStruct((b_pad * s, h), out_dtype)
        out_specs = pl.BlockSpec((rt, h), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((rt, h3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * s * rt * h,
            bytes_accessed=5 * b_pad * s * h,
            transcendentals=b_pad * n_head * s * rt,
        ),
    )(c2, s2)
    if quant_out:
        oc, osc = out
        return (oc[: b * s].reshape(b, s, h),
                osc[: b * s].reshape(b, s, 1))
    return out[: b * s].reshape(b, s, h)


# ---------------------------------------------------------------------------
# Whole-attention-block kernel: LN -> row quant -> int8 qkv GEMM -> per-head
# block-diagonal attention -> row quant -> int8 o GEMM, in ONE VMEM pass.
#
# The round-4 production path ran lnq_pallas + an XLA int8 qkv GEMM + the
# flat attention kernel + an XLA int8 o GEMM: the [rows, 3H] bf16 projection
# (176 MB/layer at B/32 B=384) is written and read back between the GEMM and
# the kernel.  Splitting the qkv GEMM into its own Pallas call lost (the
# codes round-trip replaced the bf16 one — see the attn_i8 negative result);
# fusing EVERYTHING wins: HBM sees only x bf16 in and the o-projected output
# out.  Slope-timed 1.12x on the attention half at B/32 shapes
# (scripts/proto_attnblock.py: 0.735 vs 0.82 ms/layer, depth-2 vs depth-14
# residual chains).  Numerics: identical int8 staging to the staged path;
# the only reassociation is the qkv bias added in f32 before the bf16 cast
# (cos 0.9999 vs production per layer).
# ---------------------------------------------------------------------------

# Residency model (OVERESTIMATES — Mosaic reuses same-shape buffers; the
# budget below is calibrated against observed compile outcomes, not 16 MB):
# weights (int8 [3H,H] + [H_out,H_loc]) + per-block activations
# rt*(7h + 6*3h + 5h_loc + 6o_out) + 8*rt^2 for the score/prob tiles.
# Measured: B/32 rt=200 -> 7.8 MB compiles (+4.4% in-model); L/14 rt=264
# h=1024 -> 13.8 MB compiles (perf-neutral); H/14 rt=264 h=1280 -> 18.4 MB
# compiles AND slope-wins 1.14x (proto_attnblock 32 264 1280 16); L/14-336
# rt=584 -> 27.1 MB is gated off (unraced — Mosaic may reject the 584-row
# score tiles with the resident weights).
_ABLK_BUDGET = 19 * 1024 * 1024


def _ablk_resid(rt: int, h: int, qkv_width: int, o_out: int) -> int:
    h_loc = qkv_width // 3
    weights = qkv_width * h + o_out * h_loc
    return weights + rt * (7 * h + 6 * qkv_width + 5 * h_loc + 6 * o_out) \
        + 8 * rt * rt


def attn_block_fusable(h: int, qkv_width: int, o_out: int,
                       b: int = 8, s: int = 8) -> bool:
    """True iff the whole-attention-block kernel fits this geometry: both
    projection weights VMEM-resident plus the row block's activation set
    (pass the real (b, s) — the block row count rt drives the score tiles)."""
    h_loc = qkv_width // 3
    if h % 128 != 0 or h_loc % 128 != 0:
        return False
    bb = _flat_block_b(b, s, qkv_width)
    if bb is None:
        return False
    return _ablk_resid(bb * s, h, qkv_width, o_out) <= _ABLK_BUDGET


def _attn_half(x, lw_ref, lb_ref, qw_ref, qws_ref, qb_ref, ow_ref, ows_ref,
               ob_ref, *, n_head, seq_len, causal, scale, valid_len, eps,
               cdt, residual):
    """The whole-attention-block math over one row block ``x [rt, H]``:
    LN -> int8 row quant -> int8 qkv GEMM -> block-diagonal per-head
    attention -> row requant -> int8 o GEMM (-> +bias -> +residual).
    Shared by the attention-block kernel and the whole-layer kernel."""
    rt = x.shape[0]
    h3 = qw_ref.shape[0]
    hl = h3 // 3
    dh = hl // n_head

    # LN + per-row int8 quant (identical math to actquant_pallas.lnq_pallas)
    xv = x.astype(jnp.float32)
    mu = jnp.mean(xv, axis=1, keepdims=True)
    ms = jnp.mean(xv * xv, axis=1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    y = (xv - mu) * jax.lax.rsqrt(var + eps)
    y = y * lw_ref[0, :].astype(jnp.float32) + lb_ref[0, :].astype(jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    s1 = amax / 127.0 + 1e-12
    c1 = jnp.clip(jnp.round(y / s1), -127, 127).astype(jnp.int8)

    # int8 qkv projection (exact int32 accumulation), rescale + bias in f32.
    # Internal activation dtype follows the block's compute dtype (cdt):
    # bf16 in production; f32 compute (tests, CPU parity) stays f32 so the
    # kernel tracks the staged path at its precision, not a fixed bf16.
    acc = jax.lax.dot_general(
        c1, qw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * s1 * qws_ref[0, :]
           + qb_ref[0, :]).astype(cdt)

    rows = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    invalid = (rows // seq_len) != (cols // seq_len)
    if valid_len < seq_len:
        invalid = jnp.logical_or(invalid, cols % seq_len >= valid_len)
    if causal:
        invalid = jnp.logical_or(invalid, cols % seq_len > rows % seq_len)
    bias = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

    ct = (((1,), (1,)), ((), ()))
    cn = (((1,), (0,)), ((), ()))
    outs = []
    for hd in range(n_head):
        qs = slice(hd * dh, (hd + 1) * dh)
        ks = slice(hl + hd * dh, hl + (hd + 1) * dh)
        vs = slice(2 * hl + hd * dh, 2 * hl + (hd + 1) * dh)
        qh = qkv[:, qs] * jnp.asarray(scale, qkv.dtype)
        scores = jax.lax.dot_general(
            qh, qkv[:, ks], ct, preferred_element_type=jnp.float32)
        p = _softmax_rows(scores, bias)
        outs.append(jax.lax.dot_general(
            p.astype(cdt), qkv[:, vs], cn,
            preferred_element_type=jnp.float32))

    c2, s2 = _quant_heads(outs)                      # [rt, hl] int8
    acc2 = jax.lax.dot_general(
        c2, ow_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    t = (acc2.astype(jnp.float32) * s2 * ows_ref[0, :]).astype(cdt)
    if ob_ref is not None:
        # o bias + residual stream folded into the epilogue: the block's two
        # trailing XLA passes over [rows, H] (proj+bias, x+proj) disappear —
        # x is already VMEM-resident from the LN read.  Same dtype, same add
        # order as the XLA ops they replace: x + (proj_cdt + bias_cdt).
        t = t + ob_ref[0, :].astype(cdt)
        if residual:
            t = x.astype(cdt) + t
    return t


def _attn_block_kernel(x_ref, lw_ref, lb_ref, qw_ref, qws_ref, qb_ref,
                       ow_ref, ows_ref, ob_ref, o_ref, *, n_head, seq_len,
                       causal, scale, valid_len, eps, residual):
    o_ref[:] = _attn_half(
        x_ref[:], lw_ref, lb_ref, qw_ref, qws_ref, qb_ref, ow_ref, ows_ref,
        ob_ref, n_head=n_head, seq_len=seq_len, causal=causal, scale=scale,
        valid_len=valid_len, eps=eps, cdt=o_ref.dtype, residual=residual)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "causal", "scale", "eps", "interpret",
                     "valid_len", "out_dtype", "residual"),
)
def attn_block_pallas(
    x: jnp.ndarray,
    lnw, lnb, qw8, qws, qb, ow8, ows,
    ob=None,
    *,
    n_head: int,
    scale: float,
    eps: float,
    causal: bool = False,
    interpret: bool = False,
    valid_len: "int | None" = None,
    out_dtype=jnp.bfloat16,
    residual: bool = False,
):
    """Whole attention block over the RAW residual ``x [B, S, H]`` ->
    o-projection output ``[B, S, H_out]``.

    With ``ob`` (the o bias) the epilogue adds it in-kernel, and with
    ``residual=True`` (requires H_out == H and ``ob``) the kernel emits
    ``x + attn(x)`` directly — the residual stream never takes the two
    separate XLA passes (bias add, residual add).  Without ``ob`` the output
    is pre-bias, for tensor parallelism where the psum must come first
    (like ``w8a8_pre``).

    ``qw8 [3H_loc, H]``/``qws``/``qb`` and ``ow8 [H_out, H_loc]``/``ows`` are
    the int8 per-channel projection weights (this shard's, under TP).
    Callers gate on :func:`flat_eligible`(b, s, 3*H_loc) AND
    :func:`attn_block_fusable`."""
    b, s, h = x.shape
    h3 = qw8.shape[0]
    h_out = ow8.shape[0]
    if residual and (ob is None or h_out != h):
        raise ValueError("residual=True requires ob and H_out == H")
    vl = s if valid_len is None else valid_len

    bb = _flat_block_b(b, s, h3)
    if bb is None:
        raise ValueError(
            "attn_block_pallas requires the flat path: gate on flat_eligible")
    rt = bb * s
    b_pad = -(-b // bb) * bb
    x2 = x.reshape(b * s, h)
    if b_pad != b:
        # zero pad rows: LN of a zero row is finite (rsqrt(eps)), stores of
        # the pad block rows are sliced away below
        x2 = jnp.pad(x2, ((0, (b_pad - b) * s), (0, 0)))
    base = functools.partial(
        _attn_block_kernel, n_head=n_head, seq_len=s, causal=causal,
        scale=scale, valid_len=vl, eps=eps, residual=residual)
    if ob is None:
        def kernel(x_ref, lw, lb, qw, qws_r, qb_r, ow, ows_r, o_ref):
            base(x_ref, lw, lb, qw, qws_r, qb_r, ow, ows_r, None, o_ref)
    else:
        kernel = base
    in_specs = [
        pl.BlockSpec((rt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h3, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h_out, h3 // 3), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x2, lnw.reshape(1, h), lnb.reshape(1, h), qw8,
                qws.reshape(1, h3), qb.reshape(1, h3), ow8,
                ows.reshape(1, h_out)]
    if ob is not None:
        in_specs.append(pl.BlockSpec((1, h_out), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(ob.reshape(1, h_out))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad * s, h_out), out_dtype),
        grid=(b_pad // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rt, h_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s * (h * h3 + h_out * (h3 // 3))
            + 4 * b_pad * s * rt * (h3 // 3),
            bytes_accessed=2 * b_pad * s * (h + h_out),
            transcendentals=b_pad * n_head * s * rt,
        ),
    )(*operands)
    return out[: b * s].reshape(b, s, h_out)


# ---------------------------------------------------------------------------
# PHASED/streamed whole-attention-block kernel: the geometries whose monolithic
# residency Mosaic rejects (ViT-L/14-336: rt=584 -> compile failure, verified
# round 5) run the same fused block as a two-phase grid per row block:
#
#   phase Q (j = 0..cq-1):   LN + row quant once, then the int8 qkv GEMM
#                            streamed in [ncq, H] weight chunks into a
#                            [rt, 3H] bf16 VMEM scratch
#   phase HO (j = cq..end):  per HEAD-GROUP: block-diagonal attention off the
#                            scratch -> per-group row quant -> int8 o-GEMM
#                            chunk (contracting this group's columns) ->
#                            f32 accumulate; emit at the last group
#
# Numerics: same class as attn_block_pallas vs the staged route (qkv bias in
# f32 before the bf16 cast), plus the o-GEMM's activation quant is per
# head-GROUP instead of per full row — finer-grained, tolerance-gated
# (tests/test_attention_pallas.py).  The [rt, 3H] projection still never
# exists in HBM, which is the point: at L/14-336 B=32 that round trip is
# ~115 MB/layer of the staged path.
# ---------------------------------------------------------------------------


def _ablk_stream_plan(rt: int, h: int, qkv_width: int,
                      o_out: int, dh: int) -> "tuple[int, int] | None":
    """(cq, hg) — qkv chunk count and heads per HO step — or None.

    VMEM model: x + c1 + qkv scratch (bf16) + f32 accumulator + score/prob
    transients + double-buffered weight chunks + out block <= ~14 MB."""
    hl = qkv_width // 3
    n_head = hl // dh
    for cq in (3, 4, 6, 8, 2):
        if qkv_width % cq or (qkv_width // cq) % 128:
            continue
        ncq = qkv_width // cq
        for hg in (4, 2, 8, 16, 1):
            if n_head % hg or (hg * dh) % 128:
                continue
            resident = (
                rt * h * 2 * 2          # x block (double-buffered)
                + rt * h                # c1 int8
                + rt * qkv_width * 2    # qkv scratch bf16
                + rt * o_out * 4        # f32 accumulator
                + 2 * rt * rt * 4       # scores + probs transient
                + 2 * ncq * h           # qkv weight chunk (db)
                + 2 * o_out * hg * dh   # o weight chunk (db)
                + 2 * rt * o_out * 2    # out block (db)
            )
            if resident <= 14 * 1024 * 1024:
                return cq, hg
    return None


def attn_block_stream_fusable(h: int, qkv_width: int, o_out: int,
                              b: int = 8, s: int = 8,
                              n_head: int | None = None) -> bool:
    """True iff the phased attention-block kernel can run this geometry."""
    h_loc = qkv_width // 3
    if h % 128 != 0 or h_loc % 128 != 0:
        return False
    if n_head is None:
        return False
    bb = _flat_block_b(b, s, qkv_width)
    if bb is None:
        return False
    return _ablk_stream_plan(bb * s, h, qkv_width, o_out,
                             h_loc // n_head) is not None


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "causal", "scale", "eps", "interpret",
                     "valid_len", "out_dtype", "residual", "cq", "hg"),
)
def attn_block_stream_pallas(
    x: jnp.ndarray,
    lnw, lnb, qw8, qws, qb, ow8, ows,
    ob=None,
    *,
    n_head: int,
    scale: float,
    eps: float,
    causal: bool = False,
    interpret: bool = False,
    valid_len: "int | None" = None,
    out_dtype=jnp.bfloat16,
    residual: bool = False,
    cq: int | None = None,
    hg: int | None = None,
):
    """Phased variant of :func:`attn_block_pallas` — same contract — for
    geometries the monolithic kernel cannot compile (rt-scaled residency)."""
    b, s, h = x.shape
    h3 = qw8.shape[0]
    hl = h3 // 3
    h_out = ow8.shape[0]
    dh = hl // n_head
    if residual and (ob is None or h_out != h):
        raise ValueError("residual=True requires ob and H_out == H")
    vl = s if valid_len is None else valid_len

    bb = _flat_block_b(b, s, h3)
    if bb is None:
        raise ValueError("attn_block_stream_pallas requires the flat path")
    rt = bb * s
    plan = _ablk_stream_plan(rt, h, h3, h_out, dh)
    if plan is None:
        raise ValueError(f"no stream plan for rt={rt} h={h} h3={h3}")
    cq = cq or plan[0]
    hg = hg or plan[1]
    if h3 % cq or (h3 // cq) % 128 or n_head % hg or (hg * dh) % 128:
        raise ValueError(f"bad chunking cq={cq} hg={hg}")
    ncq = h3 // cq
    ch = n_head // hg
    nco = hg * dh
    b_pad = -(-b // bb) * bb
    x2 = x.reshape(b * s, h)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, (b_pad - b) * s), (0, 0)))

    def body(x_ref, lw_ref, lb_ref, qw_ref, qws_ref, qb_ref, ow_ref, ows_ref,
             db_ref, o_ref, c1_ref, s1_ref, qkv_ref, acc_ref):
        j = pl.program_id(1)
        cdt = qkv_ref.dtype

        @pl.when(j == 0)
        def _ln():
            xv = x_ref[:].astype(jnp.float32)
            mu = jnp.mean(xv, axis=1, keepdims=True)
            ms = jnp.mean(xv * xv, axis=1, keepdims=True)
            var = jnp.maximum(ms - mu * mu, 0.0)
            y = (xv - mu) * jax.lax.rsqrt(var + eps)
            y = (y * lw_ref[0, :].astype(jnp.float32)
                 + lb_ref[0, :].astype(jnp.float32))
            amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
            s1 = amax / 127.0 + 1e-12
            c1_ref[:] = jnp.clip(jnp.round(y / s1), -127, 127).astype(jnp.int8)
            s1_ref[:] = s1

        @pl.when(j < cq)
        def _qkv():
            a = jax.lax.dot_general(
                c1_ref[:], qw_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            qkv_ref[:, pl.dslice(j * ncq, ncq)] = (
                a.astype(jnp.float32) * s1_ref[:] * qws_ref[0, :]
                + qb_ref[0, :]).astype(cdt)

        @pl.when(j >= cq)
        def _ho():
            cc = j - cq
            rows = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
            invalid = (rows // s) != (cols // s)
            if vl < s:
                invalid = jnp.logical_or(invalid, cols % s >= vl)
            if causal:
                invalid = jnp.logical_or(invalid, cols % s > rows % s)
            bias = jnp.where(invalid, NEG_INF, 0.0).astype(jnp.float32)

            ct = (((1,), (1,)), ((), ()))
            cn = (((1,), (0,)), ((), ()))
            outs = []
            for t in range(hg):
                off = (cc * hg + t) * dh
                qh = qkv_ref[:, pl.dslice(off, dh)] * jnp.asarray(scale, cdt)
                kh = qkv_ref[:, pl.dslice(hl + off, dh)]
                vh = qkv_ref[:, pl.dslice(2 * hl + off, dh)]
                scores = jax.lax.dot_general(
                    qh, kh, ct, preferred_element_type=jnp.float32)
                p = _softmax_rows(scores, bias)
                outs.append(jax.lax.dot_general(
                    p.astype(cdt), vh, cn, preferred_element_type=jnp.float32))
            c2, s2 = _quant_heads(outs)               # per head-GROUP scale
            d = jax.lax.dot_general(
                c2, ow_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = d.astype(jnp.float32) * s2 * ows_ref[0, :]
            acc_ref[:] = jnp.where(cc == 0, part, acc_ref[:] + part)

            @pl.when(j == cq + ch - 1)
            def _emit():
                tt = acc_ref[:].astype(o_ref.dtype)
                if db_ref is not None:
                    tt = tt + db_ref[0, :].astype(o_ref.dtype)
                    if residual:
                        tt = x_ref[:].astype(o_ref.dtype) + tt
                o_ref[:] = tt

    if ob is None:
        def kernel(x_ref, lw, lb, qw, qws_r, qb_r, ow, ows_r, o_ref, *scr):
            body(x_ref, lw, lb, qw, qws_r, qb_r, ow, ows_r, None, o_ref, *scr)
    else:
        kernel = body

    rep = lambda i, j: (0, 0)
    in_specs = [
        pl.BlockSpec((rt, h), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), rep, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), rep, memory_space=pltpu.VMEM),
        # qkv weight chunk: holds at the last chunk during phase HO
        pl.BlockSpec((ncq, h), lambda i, j: (jnp.minimum(j, cq - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ncq), lambda i, j: (0, jnp.minimum(j, cq - 1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ncq), lambda i, j: (0, jnp.minimum(j, cq - 1)),
                     memory_space=pltpu.VMEM),
        # o weight chunk: holds at chunk 0 during phase Q
        pl.BlockSpec((h_out, nco), lambda i, j: (0, jnp.maximum(j - cq, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_out), rep, memory_space=pltpu.VMEM),
    ]
    operands = [x2, lnw.reshape(1, h), lnb.reshape(1, h), qw8,
                qws.reshape(1, h3), qb.reshape(1, h3), ow8,
                ows.reshape(1, h_out)]
    if ob is not None:
        in_specs.append(pl.BlockSpec((1, h_out), rep,
                                     memory_space=pltpu.VMEM))
        operands.append(ob.reshape(1, h_out))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad * s, h_out), out_dtype),
        grid=(b_pad // bb, cq + ch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rt, h_out), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rt, h), jnp.int8),        # LN'd codes
            pltpu.VMEM((rt, 1), jnp.float32),     # LN quant scales
            pltpu.VMEM((rt, h3), out_dtype),      # qkv staging (cdt follows
                                                  # the block's compute dtype)
            pltpu.VMEM((rt, h_out), jnp.float32),  # o-GEMM accumulator
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s * (h * h3 + h_out * hl)
            + 4 * b_pad * s * rt * hl,
            bytes_accessed=2 * b_pad * s * (h + h_out),
            transcendentals=b_pad * n_head * s * rt,
        ),
    )(*operands)
    return out[: b * s].reshape(b, s, h_out)


# ---------------------------------------------------------------------------
# Whole-LAYER kernel: attention block + MLP block in ONE pallas_call.
# The two-kernel layer still writes the mid-layer residual (x + attn) to HBM
# for the MLP kernel to read straight back (2 x rows x H bytes/layer), and
# pays two custom-call boundaries per layer — the boundary cost is what made
# the int8-consuming attention route lose in-model (see attn_i8 notes).  At
# widths where ALL FOUR int8 weight matrices fit VMEM alongside the row
# block's activation set, one kernel runs the entire transformer layer:
# HBM sees x in, layer(x) out.  Numerics: same ops at the same precision as
# the two-kernel path, but the compiler may DEFER the mid-residual's bf16
# rounding inside the fused program (the two-kernel path's store forces it),
# so x_mid can drift by 1 bf16 ulp and the MLP requant by +-1 code — the
# same drift class as attn_block-vs-staged (cos > 0.9999, tolerance-gated).
# ---------------------------------------------------------------------------

# Calibrated on compile outcomes like _ABLK_BUDGET: the layer kernel holds
# the attention residency plus the MLP weights (12*H^2 int8 at 4H MLPs) and
# the [rt, 4H] int32/f32 intermediates.
_LAYER_BUDGET = 26 * 1024 * 1024


def _layer_resid(rt: int, h: int, qkv_width: int, o_out: int,
                 n4h: int) -> int:
    return (_ablk_resid(rt, h, qkv_width, o_out)
            + 2 * n4h * h + rt * 10 * n4h)


def layer_block_fusable(h: int, qkv_width: int, o_out: int, n4h: int,
                        b: int = 8, s: int = 8) -> bool:
    """True iff the whole-layer kernel fits this geometry (single-shard
    only: both residuals are folded in, so TP's psums can't intervene)."""
    if not attn_block_fusable(h, qkv_width, o_out, b, s):
        return False
    if o_out != h or qkv_width != 3 * h:
        return False
    bb = _flat_block_b(b, s, qkv_width)
    return _layer_resid(bb * s, h, qkv_width, o_out, n4h) <= _LAYER_BUDGET


def _layer_kernel(x_ref, l1w, l1b, qw, qws, qb, ow, ows, ob,
                  l2w, l2b, uw, uws, ub, dw, dws, db, o_ref, *,
                  n_head, seq_len, causal, scale, valid_len, eps, act):
    from .actquant_pallas import _mlp_half

    cdt = o_ref.dtype
    x_mid = _attn_half(
        x_ref[:], l1w, l1b, qw, qws, qb, ow, ows, ob,
        n_head=n_head, seq_len=seq_len, causal=causal, scale=scale,
        valid_len=valid_len, eps=eps, cdt=cdt, residual=True)
    o_ref[:] = _mlp_half(
        x_mid, l2w, l2b, uw, uws, ub, dw, dws, db,
        eps=eps, act=act, cdt=cdt, residual=True)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "causal", "scale", "eps", "act", "interpret",
                     "valid_len", "out_dtype"),
)
def layer_block_pallas(
    x: jnp.ndarray,
    l1w, l1b, qw8, qws, qb, ow8, ows, ob,
    l2w, l2b, up8, upws, upb, dn8, dnws, dnb,
    *,
    n_head: int,
    scale: float,
    eps: float,
    act: str = "gelu_quick",
    causal: bool = False,
    interpret: bool = False,
    valid_len: "int | None" = None,
    out_dtype=jnp.bfloat16,
):
    """One full transformer layer over the RAW residual ``x [B, S, H]`` ->
    ``x + attn(ln1(x)) + mlp(ln2(x + attn(ln1(x)))) [B, S, H]`` in a single
    VMEM pass (both residuals and biases folded in).  Single-shard only —
    callers gate on :func:`layer_block_fusable`."""
    if act not in ("gelu_quick", "gelu_tanh", "none"):
        raise ValueError(f"unknown act {act!r}")
    b, s, h = x.shape
    h3 = qw8.shape[0]
    n4h = up8.shape[0]
    vl = s if valid_len is None else valid_len

    bb = _flat_block_b(b, s, h3)
    if bb is None:
        raise ValueError(
            "layer_block_pallas requires the flat path: gate on flat_eligible")
    rt = bb * s
    b_pad = -(-b // bb) * bb
    x2 = x.reshape(b * s, h)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, (b_pad - b) * s), (0, 0)))
    kernel = functools.partial(
        _layer_kernel, n_head=n_head, seq_len=s, causal=causal,
        scale=scale, valid_len=vl, eps=eps, act=act)

    def col(i):
        return (i, 0)

    def rep(i):
        return (0, 0)

    in_specs = [pl.BlockSpec((rt, h), col, memory_space=pltpu.VMEM)] + [
        pl.BlockSpec(spec, rep, memory_space=pltpu.VMEM)
        for spec in (
            (1, h), (1, h),                    # ln1
            (h3, h), (1, h3), (1, h3),         # qkv w/ws/b
            (h, h), (1, h), (1, h),            # o w/ws/b
            (1, h), (1, h),                    # ln2
            (n4h, h), (1, n4h), (1, n4h),      # up w/ws/b
            (h, n4h), (1, h), (1, h),          # down w/ws/b
        )
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad * s, h), out_dtype),
        grid=(b_pad // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rt, h), col, memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s * (h * h3 + h * h + 2 * h * n4h)
            + 4 * b_pad * s * rt * h,
            bytes_accessed=4 * b_pad * s * h,
            transcendentals=b_pad * s * (n_head * rt + n4h),
        ),
    )(x2, l1w.reshape(1, h), l1b.reshape(1, h), qw8, qws.reshape(1, h3),
      qb.reshape(1, h3), ow8, ows.reshape(1, h), ob.reshape(1, h),
      l2w.reshape(1, h), l2b.reshape(1, h), up8, upws.reshape(1, n4h),
      upb.reshape(1, n4h), dn8, dnws.reshape(1, h), dnb.reshape(1, h))
    return out[: b * s].reshape(b, s, h)


_FLAT_MAX_ROWS = 448    # multi-image blocks: bounds block-diagonal waste
_FLAT_MIN_ROWS = 128    # below this the MXU runs partial tiles
_FLAT_MAX_S1 = 640      # single-image blocks: bounded by VMEM only
_FLAT_VMEM_BUDGET = 12 * 2**20  # of the 16 MB scoped-VMEM limit


def _flat_block_b(b: int, s: int, h3: int | None = None,
                  quant_out: bool = False) -> "int | None":
    """Images per grid step for the flat kernel, or None if ineligible.

    The row count bb*S must be a multiple of 8 (f32 sublane; measured on
    v6e: 8-alignment suffices for bf16 too — 200 rows beat 16-aligned 400
    in-model).  Multi-image blocks are capped at 448 rows: cross-image score
    work grows with bb (block-diagonal waste), so use the smallest aligned
    bb that still fills MXU tiles.  Single-image blocks (S already
    8-aligned, bb=1) carry NO waste, so they are bounded only by VMEM —
    checked against ``h3`` (= 3*hidden) when provided (ViT-L/14-336's
    S=584 rides this).  ``quant_out`` charges the int8 epilogue's extra
    residency (the f32 concat of all head outputs + codes) so the quantizing
    variant gates off where it would blow the scoped-VMEM limit instead of
    failing at compile time (seen: L/14-336 S=584 h=1024).
    """
    g = 2 if s % 2 == 0 else 1
    g = 4 if s % 4 == 0 else g
    g = 8 if s % 8 == 0 else g
    base = 8 // g
    bb = base * max(1, -(-_FLAT_MIN_ROWS // (base * s)))
    if bb * s > _FLAT_MAX_ROWS:
        if base == 1 and s <= _FLAT_MAX_S1 and h3 is not None:
            # qkv block + out block + scores + probs, all resident at once
            h = h3 // 3
            vmem = s * h3 * 2 + s * h * 2 + 2 * s * s * 4
            if quant_out:
                # per-head f32 outs AND their concat are both live at the
                # epilogue, plus the int8 codes
                vmem += 2 * s * h * 4 + s * h
            if vmem > _FLAT_VMEM_BUDGET:
                return None
            bb = 1
        else:
            return None
    return min(bb, b) if (min(bb, b) * s) % 8 == 0 else None


def flat_eligible(b: int, s: int, h3: int | None = None,
                  quant_out: bool = False) -> bool:
    """Public contract: True iff ``mha_pallas_qkv`` will take the flat
    pad-free path for a [b, s, 3H] input.  Callers that shape their
    producers for the kernel's operand layout (models.transformer's 2-D qkv
    projection) MUST use this — not a reimplementation — so the two can
    never desynchronize.  Pass ``h3`` (= 3*hidden) to enable the
    single-image long-sequence path (its VMEM check needs the width), and
    ``quant_out=True`` when asking for the int8 epilogue (stricter VMEM
    bound)."""
    return _flat_block_b(b, s, h3, quant_out) is not None


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "causal", "scale", "interpret", "block_b",
                     "valid_len", "quant_out"),
)
def mha_pallas_qkv(
    qkv: jnp.ndarray,
    *,
    n_head: int,
    scale: float,
    causal: bool = False,
    interpret: bool = False,
    block_b: int = 8,
    valid_len: "int | None" = None,
    quant_out: bool = False,
):
    """Fused MHA over the fused projection ``qkv [B, S, 3H]`` -> ``[B, S, H]``.

    ``scale`` multiplies the Q slice in-kernel (the reference scales Q before
    QK^T, clip.cpp:1082).  Short sequences (bb*S rows fit one VMEM score
    tile) take the pad-free flat path; longer ones the padded 3-D path.
    ``valid_len``: true sequence length when the input was padded once at
    embedding time (vision pad-once path) — trailing keys are masked.

    ``quant_out`` (flat path only — callers gate on :func:`flat_eligible`):
    returns ``(codes int8 [B, S, H], scales f32 [B, S, 1])`` with the
    output per-row int8-quantized in the kernel epilogue, ready for the
    W8A8 o-projection (``actquant_pallas.w8a8_pre``)."""
    b, s, h3 = qkv.shape
    h = h3 // 3
    vl = s if valid_len is None else valid_len

    bb_flat = _flat_block_b(b, s, h3, quant_out)
    if bb_flat is not None:
        rt = bb_flat * s
        b_pad = -(-b // bb_flat) * bb_flat
        q2 = qkv.reshape(b * s, h3)
        if b_pad != b:
            q2 = jnp.pad(q2, ((0, (b_pad - b) * s), (0, 0)))
        kernel = functools.partial(
            _qkv_kernel_flat, n_head=n_head, seq_len=s, causal=causal,
            scale=scale, valid_len=vl, quant_out=quant_out,
        )
        if quant_out:
            out_shape = (jax.ShapeDtypeStruct((b_pad * s, h), jnp.int8),
                         jax.ShapeDtypeStruct((b_pad * s, 1), jnp.float32))
            out_specs = (
                pl.BlockSpec((rt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )
        else:
            out_shape = jax.ShapeDtypeStruct((b_pad * s, h), qkv.dtype)
            out_specs = pl.BlockSpec((rt, h), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(b_pad // bb_flat,),
            in_specs=[pl.BlockSpec((rt, h3), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=out_specs,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * b_pad * s * rt * h,
                bytes_accessed=8 * b_pad * s * h,
                transcendentals=b_pad * n_head * s * rt,
            ),
        )(q2)
        if quant_out:
            codes, scales = out
            return (codes[: b * s].reshape(b, s, h),
                    scales[: b * s].reshape(b, s, 1))
        return out[: b * s].reshape(b, s, h)
    if quant_out:
        raise ValueError(
            "quant_out requires the flat path: gate on flat_eligible(b, s, 3h)")

    # sublane tile is 8 for f32, 16 for bf16/f16: pad S so Mosaic never
    # re-pads/relayouts internally
    sm = 8 if qkv.dtype.itemsize >= 4 else 16
    s_pad = max(-(-s // sm) * sm, sm)
    bb = min(block_b if block_b else 1, b)
    bb = max(1, min(bb, 256 // s_pad if s_pad <= 256 else 1))
    b_pad = -(-b // bb) * bb

    qkv_p = jnp.pad(qkv, ((0, b_pad - b), (0, s_pad - s), (0, 0)))
    kernel = functools.partial(
        _qkv_kernel, n_head=n_head, seq_len=vl, causal=causal, scale=scale
    )
    in_spec = pl.BlockSpec((bb, s_pad, h3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, s_pad, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, h), qkv.dtype),
        grid=(b_pad // bb,),
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * s_pad * s_pad * h,
            bytes_accessed=8 * b_pad * s_pad * h,
            transcendentals=b_pad * n_head * s_pad * s_pad,
        ),
    )(qkv_p)
    return out[:b, :s, :]


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "causal", "scale", "interpret", "block_b"),
)
def mha_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    n_head: int,
    scale: float,
    causal: bool = False,
    interpret: bool = False,
    block_b: int = 8,
) -> jnp.ndarray:
    """Fused MHA over ``q/k/v [B, S, H]`` -> ``[B, S, H]``.

    ``scale`` multiplies Q (the reference scales Q before QK^T,
    clip.cpp:1082).  Padded key positions are masked via ``seq_len`` = S, so
    callers should pass unpadded S and let the kernel pad internally.
    """
    b, s, h = q.shape
    sm = 8 if q.dtype.itemsize >= 4 else 16
    s_pad = max(-(-s // sm) * sm, sm)
    # group enough images per step for ~128-256 stacked rows (full MXU tiles)
    bb = min(block_b if block_b else 1, b)
    bb = max(1, min(bb, 256 // s_pad if s_pad <= 256 else 1))
    b_pad = -(-b // bb) * bb

    def pad(x):
        return jnp.pad(x, ((0, b_pad - b), (0, s_pad - s), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)

    kernel = functools.partial(
        _mha_kernel, n_head=n_head, seq_len=s, causal=causal, scale=scale
    )
    spec = pl.BlockSpec((bb, s_pad, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, h), q.dtype),
        grid=(b_pad // bb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * s_pad * s_pad * h,
            bytes_accessed=4 * b_pad * s_pad * h * 2,
            transcendentals=b_pad * n_head * s_pad * s_pad,
        ),
    )(qp, kp, vp)
    return out[:b, :s, :]
