"""Shared CLIP transformer block, run as a single ``lax.scan`` over stacked
layer parameters.

Numerics mirror the reference graphs (text: /root/reference/clip.cpp:1064-1143,
vision: :1342-1423): pre-LN -> MHA (Q pre-scaled by 1/sqrt(d_head)) -> residual
-> pre-LN -> MLP (tanh-gelu or quick-gelu) -> residual.  Attention softmax runs
in float32.  TPU-first choices: scan over the stacked layer axis instead of a
Python loop, weights consumed through ``qmatmul`` so quantized checkpoints
never materialize dense weights in HBM, and a fused VMEM attention kernel
(``ops.attention_pallas``) as the default on TPU — slope-measured ~2x faster
than the XLA einsum path at ViT-B/32 shapes (B=256, S=50: 0.28 vs 0.54
ms/layer) because scores/softmax never round-trip HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.actquant_pallas import (
    fusable_width, gemm_gq_pallas, lnq_pallas, mlp_fusable, mlp_gq_pallas,
    mlp_lnq_pallas, mlp_lnq_stream_pallas, mlp_stream_fusable, w8a8_pre)
from ..ops.attention_pallas import (
    attn_block_fusable, attn_block_pallas, attn_block_stream_fusable,
    attn_block_stream_pallas, flat_eligible, mha_pallas_qkv,
    mha_pallas_qkv_i8)
from ..ops.linear import linear, quant_rows
from ..ops.nn import gelu_quick, gelu_tanh, layernorm, softmax
from ..ops.qtensor import W8Tensor

NEG_INF = -1e9  # large finite value: keeps bf16/f32 softmax NaN-free
VALID_ATTN_IMPLS = ("auto", "pallas", "xla")


def _causal_bias(seq_len: int) -> jnp.ndarray:
    """[1, 1, S, S] additive mask (ggml_diag_mask_inf, clip.cpp:1101)."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    return jnp.where(j <= i, 0.0, NEG_INF)[None, None, :, :].astype(jnp.float32)


def resolve_attn_impl(attn_impl: str) -> str:
    """'auto' picks the fused Pallas kernel on TPU, the XLA einsum path
    elsewhere (explicit 'pallas' off-TPU runs the kernel in interpret mode —
    slow, but lets the CPU test mesh exercise the exact multi-chip graph)."""
    if attn_impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if attn_impl not in VALID_ATTN_IMPLS:
        raise ValueError(
            f"unknown attn_impl {attn_impl!r}: use {'|'.join(VALID_ATTN_IMPLS)}")
    return attn_impl


def attention(
    x, lp, *, n_head: int, causal: bool = False,
    compute_dtype=jnp.float32, attn_impl: str = "auto",
    qmm_backend: str | None = None, tp_axis: str | None = None,
    valid_len: int | None = None, ln=None, lnq_fuse: bool = False,
    attn_i8: bool = False, attn_block: bool = True,
    add_residual: bool = False,
):
    """Multi-head self-attention over ``x [B, S, H]``.

    ``add_residual=True`` returns ``x + attn(x)`` instead of the projection
    alone (requires ``ln`` — x must be the raw residual stream): on the
    whole-attention-block kernel route the add happens in the kernel's
    epilogue (the residual stream is already VMEM-resident there), deleting
    two XLA passes over [rows, H] per layer; other routes add at the XLA
    level, so callers get one contract everywhere.

    Q/K/V use one fused [3H, H] projection (see models.params): a single wide
    GEMM instead of three narrow ones — the narrow-N case leaves most of the
    128x128 MXU idle.

    ``ln=(w, b, eps)`` means ``x`` is the RAW residual stream and this
    function applies the pre-LN itself — which lets the fused Pallas
    LN->int8-quant kernel (``ops.actquant_pallas``) feed the W8A8 qkv
    projection directly when ``lnq_fuse`` is on, skipping the separate
    amax pass and the bf16 round-trip of the normalized activation.

    Under tensor parallelism (``tp_axis`` set, inside ``jax.shard_map``) the
    fused projection holds this shard's heads in local [q; k; v] layout (see
    ``parallel.mesh.permute_qkv_params``); attention runs on ``n_head /
    n_shards`` local heads and the row-parallel output projection is
    psum-reduced before the (replicated) bias is added — the Megatron pattern,
    one collective per attention.
    """
    b, s, h = x.shape
    d_head = h // n_head
    scale = 1.0 / (d_head ** 0.5)
    if add_residual and ln is None:
        raise ValueError("add_residual=True requires ln (raw residual input)")
    x_res = x

    def fin(proj):
        return x_res + proj if add_residual else proj

    impl = resolve_attn_impl(attn_impl)
    fused_lnq = (
        ln is not None and lnq_fuse
        and isinstance(lp["qkv_w"], W8Tensor) and fusable_width(h)
    )
    if ln is not None and not fused_lnq:
        x = layernorm(x, ln[0], ln[1], ln[2])
    # eligibility must be judged at the width the kernel actually sees: under
    # tensor parallelism (inside shard_map) lp holds this shard's [3H/n, H]
    # projection, and mha_pallas_qkv decides its path from that local width —
    # using the global 3*h here could silently desync the two
    qkv_width = lp["qkv_w"].shape[0]
    if fused_lnq:
        interp = jax.default_backend() != "tpu"
        # whole-attention-block kernel: LN + quant + int8 qkv GEMM + per-head
        # attention + requant + int8 o GEMM in ONE VMEM pass — the [rows, 3H]
        # projection never exists in HBM (176 MB/layer at B/32 B=384 written
        # and read back on the staged path).  Slope-timed 1.12x on the
        # attention half (scripts/proto_attnblock.py); weights-resident gate
        # falls back to the staged path at ViT-H/14 width.
        ablk_resident = (
            attn_block and impl == "pallas"
            and isinstance(lp["o_w"], W8Tensor)
            and flat_eligible(b, s, qkv_width)
            and attn_block_fusable(h, qkv_width, lp["o_w"].shape[0], b, s))
        # PHASED fallback for geometries whose monolithic residency Mosaic
        # rejects (L/14-336's rt=584): same fused block, qkv GEMM streamed
        # into a VMEM scratch, per-head-group o-GEMM accumulation
        # (ops.attention_pallas.attn_block_stream_pallas)
        ablk_stream = (
            not ablk_resident
            and attn_block and impl == "pallas"
            and isinstance(lp["o_w"], W8Tensor)
            and flat_eligible(b, s, qkv_width)
            and attn_block_stream_fusable(h, qkv_width, lp["o_w"].shape[0],
                                          b, s, n_head=qkv_width // 3 // (h // n_head)))
        if ablk_stream:
            n_head_loc = qkv_width // 3 // (h // n_head)
            if add_residual and tp_axis is None:
                return attn_block_stream_pallas(
                    x, ln[0], ln[1], lp["qkv_w"].c8, lp["qkv_w"].ws,
                    lp["qkv_b"], lp["o_w"].c8, lp["o_w"].ws, lp["o_b"],
                    n_head=n_head_loc, scale=scale, eps=float(ln[2]),
                    causal=causal, interpret=interp, valid_len=valid_len,
                    out_dtype=compute_dtype, residual=True)
            proj = attn_block_stream_pallas(
                x, ln[0], ln[1], lp["qkv_w"].c8, lp["qkv_w"].ws,
                lp["qkv_b"], lp["o_w"].c8, lp["o_w"].ws,
                n_head=n_head_loc, scale=scale, eps=float(ln[2]),
                causal=causal, interpret=interp, valid_len=valid_len,
                out_dtype=compute_dtype)
            if tp_axis is not None:
                proj = jax.lax.psum(proj, tp_axis)
            return fin(proj + lp["o_b"].astype(proj.dtype))
        if ablk_resident:
            if add_residual and tp_axis is None:
                # bias + residual folded into the kernel epilogue; under TP
                # the psum must come before both, so this stays single-shard
                return attn_block_pallas(
                    x, ln[0], ln[1], lp["qkv_w"].c8, lp["qkv_w"].ws,
                    lp["qkv_b"], lp["o_w"].c8, lp["o_w"].ws, lp["o_b"],
                    n_head=qkv_width // 3 // (h // n_head),
                    scale=scale, eps=float(ln[2]), causal=causal,
                    interpret=interp, valid_len=valid_len,
                    out_dtype=compute_dtype, residual=True)
            proj = attn_block_pallas(
                x, ln[0], ln[1], lp["qkv_w"].c8, lp["qkv_w"].ws,
                lp["qkv_b"], lp["o_w"].c8, lp["o_w"].ws,
                n_head=qkv_width // 3 // (h // n_head),
                scale=scale, eps=float(ln[2]), causal=causal,
                interpret=interp, valid_len=valid_len,
                out_dtype=compute_dtype)
            if tp_axis is not None:
                proj = jax.lax.psum(proj, tp_axis)
            return fin(proj + lp["o_b"].astype(proj.dtype))
        # one VMEM pass: LN + per-row amax + int8 quantize, straight into the
        # int8 MXU dot (w8a8_matmul's shape logic already runs every GEMM as
        # a 2-D dot, so this changes only operand production, not layout)
        codes, sx = lnq_pallas(
            x.reshape(b * s, h), ln[0], ln[1], eps=float(ln[2]),
            interpret=interp)
        # int8 attention route (OFF by default — measured negative): the qkv
        # GEMM emits int8 codes + row scales (gemm_gq epilogue, act='none')
        # and the flat kernel consumes them directly — exact-int32 score dot
        # with a rank-1 rescale, half the read bytes.  The isolated kernel
        # races 1.22x (scripts/proto_attn_int8.py) but IN-MODEL both
        # integrations LOSE at B/32 B=384 (22.43/23.50 vs 22.04 ms for
        # gemm_gq-qkv / xlaq-variant vs default) and L/14 (175.0 vs 169.8):
        # the Pallas custom-call boundary at the qkv GEMM costs more than
        # the kernel saves, and the isolated 1.22x was dispatch-dominated
        # (single-call timing, not slope).  Kept selectable for re-racing on
        # other hardware.
        if attn_i8 and impl == "pallas" and flat_eligible(b, s, qkv_width):
            h_loc = qkv_width // 3
            if attn_i8 == "xlaq":
                # variant under measurement: keep the XLA int8 qkv GEMM (its
                # epilogue fuses with the rescale+bias) and quantize its
                # output with an XLA-level row pass feeding the kernel
                qkv = w8a8_pre(codes, sx, lp["qkv_w"], compute_dtype)
                qkv = qkv + lp["qkv_b"].astype(qkv.dtype)
                qc, qsx = quant_rows(qkv)
            else:
                qc, qsx = gemm_gq_pallas(
                    codes, sx, lp["qkv_w"].c8, lp["qkv_w"].ws, lp["qkv_b"],
                    act="none", interpret=interp)
            quant_o = (
                isinstance(lp["o_w"], W8Tensor) and fusable_width(h_loc)
                and flat_eligible(b, s, qkv_width, quant_out=True)
            )
            n_head_loc = h_loc // (h // n_head)
            if quant_o:
                oc, osx = mha_pallas_qkv_i8(
                    qc.reshape(b, s, -1), qsx.reshape(b, s, 1),
                    n_head=n_head_loc, scale=scale, causal=causal,
                    interpret=interp, valid_len=valid_len, quant_out=True)
                proj = w8a8_pre(
                    oc.reshape(b * s, h_loc), osx.reshape(b * s, 1),
                    lp["o_w"], compute_dtype).reshape(b, s, -1)
            else:
                out = mha_pallas_qkv_i8(
                    qc.reshape(b, s, -1), qsx.reshape(b, s, 1),
                    n_head=n_head_loc, scale=scale, causal=causal,
                    interpret=interp, valid_len=valid_len,
                    out_dtype=compute_dtype)
                proj = linear(out, lp["o_w"], None,
                              compute_dtype=compute_dtype,
                              backend=qmm_backend)
            if tp_axis is not None:
                proj = jax.lax.psum(proj, tp_axis)
            return fin(proj + lp["o_b"].astype(proj.dtype))
        qkv = w8a8_pre(codes, sx, lp["qkv_w"], compute_dtype)
        qkv = (qkv + lp["qkv_b"].astype(qkv.dtype)).reshape(b, s, -1)
    elif impl == "pallas" and flat_eligible(b, s, qkv_width):
        # 2-D GEMM for the projection feeding the FLAT kernel: a rank-3 dot
        # gets XLA's conv emitter whose {2,0,1} output layout forces a full
        # relayout copy (~0.4 ms/layer at B/32 B=448) before the custom
        # call's required {2,1,0} operand; the 2-D dot's output is already
        # bitcast-compatible (bit-identical, +5% end-to-end).  The padded
        # kernel path (S=197/257...) must NOT do this — there the pad
        # rewrites the tensor anyway and losing the conv emitter costs
        # 15-20% (measured at B/16 and L/14).
        qkv = linear(x.reshape(b * s, h), lp["qkv_w"], lp["qkv_b"],
                     compute_dtype=compute_dtype, backend=qmm_backend)
        qkv = qkv.reshape(b, s, qkv.shape[-1])
    else:
        qkv = linear(x, lp["qkv_w"], lp["qkv_b"], compute_dtype=compute_dtype,
                     backend=qmm_backend)
    h_loc = qkv.shape[-1] // 3
    n_head_loc = h_loc // d_head

    # int8 attention epilogue: when the o-projection runs W8A8, the flat
    # kernel quantizes its output in VMEM (codes + row scales) so the
    # o-GEMM's separate amax pass and the bf16 round-trip of the attention
    # output disappear — the last unfused GEMM-input pipeline in the block
    quant_o = (
        lnq_fuse and impl == "pallas"
        and isinstance(lp["o_w"], W8Tensor) and fusable_width(h_loc)
        and flat_eligible(b, s, qkv.shape[-1], quant_out=True)
    )
    if quant_o:
        codes, sx = mha_pallas_qkv(
            qkv, n_head=n_head_loc, scale=scale, causal=causal,
            interpret=jax.default_backend() != "tpu",
            valid_len=valid_len, quant_out=True,
        )
        proj = w8a8_pre(
            codes.reshape(b * s, h_loc), sx.reshape(b * s, 1),
            lp["o_w"], compute_dtype).reshape(b, s, -1)
        if tp_axis is not None:
            proj = jax.lax.psum(proj, tp_axis)
        return fin(proj + lp["o_b"].astype(proj.dtype))

    if impl == "pallas":
        # fused qkv goes straight into the kernel: no split/scale/pad passes
        out = mha_pallas_qkv(
            qkv, n_head=n_head_loc, scale=scale, causal=causal,
            interpret=jax.default_backend() != "tpu",
            valid_len=valid_len,
        )
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = (q * jnp.asarray(scale, compute_dtype)).reshape(b, s, n_head_loc, d_head)
        kh = k.reshape(b, s, n_head_loc, d_head)
        vh = v.reshape(b, s, n_head_loc, d_head)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, kh, preferred_element_type=jnp.float32)
        if causal:
            scores = scores + _causal_bias(s)
        if valid_len is not None and valid_len < s:
            # pad-once path: mask trailing pad KEYS exactly like the kernel
            kp = jnp.where(jnp.arange(s) >= valid_len, NEG_INF, 0.0)
            scores = scores + kp[None, None, None, :].astype(jnp.float32)
        attn = softmax(scores.astype(jnp.float32), axis=-1).astype(compute_dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh, preferred_element_type=jnp.float32)
        out = out.astype(compute_dtype).reshape(b, s, h_loc)

    proj = linear(out, lp["o_w"], None if tp_axis else lp["o_b"],
                  compute_dtype=compute_dtype, backend=qmm_backend)
    if tp_axis is not None:
        proj = jax.lax.psum(proj, tp_axis) + lp["o_b"].astype(proj.dtype)
    return fin(proj)


def block(x, lp, *, n_head, eps, use_gelu, causal=False,
          compute_dtype=jnp.float32, attn_impl="auto",
          qmm_backend=None, tp_axis=None, valid_len=None,
          lnq_fuse=False, up_gq=False, mlp_full=True, attn_i8=False,
          attn_block=True, mlp_stream=False):
    x = attention(x, lp, n_head=n_head, causal=causal,
                  compute_dtype=compute_dtype, attn_impl=attn_impl,
                  qmm_backend=qmm_backend, tp_axis=tp_axis,
                  valid_len=valid_len,
                  ln=(lp["ln1_w"], lp["ln1_b"], eps), lnq_fuse=lnq_fuse,
                  attn_i8=attn_i8, attn_block=attn_block,
                  add_residual=True)

    fuse_mlp = (
        lnq_fuse
        and isinstance(lp["up_w"], W8Tensor)
        and isinstance(lp["down_w"], W8Tensor)
        and fusable_width(x.shape[-1])
        and fusable_width(lp["up_w"].shape[0])
    )
    act = "gelu_tanh" if use_gelu else "gelu_quick"
    # whole-MLP fusion (resident): at widths where both int8 weight matrices fit VMEM
    # (H <= 1024), ONE kernel runs LN/quant -> up-GEMM -> gelu -> requant ->
    # down-GEMM so neither the LN'd codes nor the [rows, 4H] intermediate
    # (the model's largest activation) ever leave VMEM.  Bit-identical to
    # the staged chain (same ops, same order); fall back where the resident
    # weights exceed the budget (ViT-H/14's 1280x5120).
    full = mlp_full and fuse_mlp and mlp_fusable(
        x.shape[-1], lp["up_w"].shape[0])
    # weight-STREAMED whole-MLP kernel: widths past the resident budget
    # (ViT-H/14's 1280x5120) can run the same fused MLP with the weights
    # streamed through VMEM in column chunks — bit-identical to the resident
    # kernel (full-row requant scale staged in scratch; int32 chunk
    # accumulation is exact).  MEASURED NEGATIVE in-model at H/14 B=32 on
    # this chip (round 5): 53.2/52.7 vs 50.6 ms for two-phase (256,8) /
    # single-phase per-chunk-scale variants vs the staged chain — the XLA
    # int8 GEMMs pipeline across layers while the streamed grid serializes
    # LN -> up chunks -> down chunks per row block.  OFF by default; kept
    # selectable for re-racing on other hardware (scripts/proto_mlp_stream.py)
    stream = (not full and mlp_full and mlp_stream and fuse_mlp
              and mlp_stream_fusable(x.shape[-1], lp["up_w"].shape[0]))
    if stream:
        bb, ss, hh = x.shape
        interp = jax.default_backend() != "tpu"
        if tp_axis is None:
            return mlp_lnq_stream_pallas(
                x.reshape(bb * ss, hh), lp["ln2_w"], lp["ln2_b"],
                lp["up_w"].c8, lp["up_w"].ws, lp["up_b"],
                lp["down_w"].c8, lp["down_w"].ws, lp["down_b"],
                eps=float(eps), act=act, interpret=interp,
                out_dtype=compute_dtype, residual=True).reshape(bb, ss, -1)
        h = mlp_lnq_stream_pallas(
            x.reshape(bb * ss, hh), lp["ln2_w"], lp["ln2_b"],
            lp["up_w"].c8, lp["up_w"].ws, lp["up_b"],
            lp["down_w"].c8, lp["down_w"].ws,
            eps=float(eps), act=act, interpret=interp,
            out_dtype=compute_dtype)
        h = h.reshape(bb, ss, -1)
        h = jax.lax.psum(h, tp_axis)
        h = h + lp["down_b"].astype(h.dtype)
        return x + h
    if full:
        bb, ss, hh = x.shape
        interp = jax.default_backend() != "tpu"
        if tp_axis is None:
            # down bias + residual folded into the kernel epilogue — the
            # layer is now exactly two Pallas calls joined by the residual
            # stream, with no XLA elementwise passes between them
            return mlp_lnq_pallas(
                x.reshape(bb * ss, hh), lp["ln2_w"], lp["ln2_b"],
                lp["up_w"].c8, lp["up_w"].ws, lp["up_b"],
                lp["down_w"].c8, lp["down_w"].ws, lp["down_b"],
                eps=float(eps), act=act, interpret=interp,
                out_dtype=compute_dtype, residual=True).reshape(bb, ss, -1)
        h = mlp_lnq_pallas(
            x.reshape(bb * ss, hh), lp["ln2_w"], lp["ln2_b"],
            lp["up_w"].c8, lp["up_w"].ws, lp["up_b"],
            lp["down_w"].c8, lp["down_w"].ws,
            eps=float(eps), act=act, interpret=interp,
            out_dtype=compute_dtype)
        h = h.reshape(bb, ss, -1)
    elif fuse_mlp:
        # LN2 + quant in one pass -> int8 up-GEMM with the gelu + requant
        # epilogue fused in VMEM (the [rows, 4H] up output is the model's
        # largest activation; the unfused pair round-trips it through HBM in
        # bf16 just to quantize it) -> int8 down-GEMM
        bb, ss, hh = x.shape
        interp = jax.default_backend() != "tpu"
        codes, sx = lnq_pallas(
            x.reshape(bb * ss, hh), lp["ln2_w"], lp["ln2_b"],
            eps=float(eps), interpret=interp)
        codes, sx = gemm_gq_pallas(
            codes, sx, lp["up_w"].c8, lp["up_w"].ws, lp["up_b"],
            act=act, interpret=interp)
        h = w8a8_pre(codes, sx, lp["down_w"], compute_dtype)
        h = h.reshape(bb, ss, -1)
    elif (
        up_gq
        and isinstance(lp["up_w"], W8Tensor)
        and isinstance(lp["down_w"], W8Tensor)
        and fusable_width(x.shape[-1])
        and fusable_width(lp["up_w"].shape[0])
    ):
        # wide-tower variant (lnq producers off per the width rule): LN and
        # the activation quant stay at the XLA level — XLA fuses residual +
        # LN + amax + quantize into one HBM pass, which is exactly what the
        # Pallas LN producer broke at H >= 1024 — but the up GEMM still runs
        # gemm_gq_pallas, so the [rows, 4H] bf16 up output (the model's
        # largest activation, 4096/5120 wide here) never round-trips HBM
        bb, ss, hh = x.shape
        interp = jax.default_backend() != "tpu"
        h = layernorm(x, lp["ln2_w"], lp["ln2_b"], eps)
        codes, sx = quant_rows(h.reshape(bb * ss, hh))
        if mlp_full and mlp_fusable(hh, lp["up_w"].shape[0]):
            h = mlp_gq_pallas(
                codes, sx, lp["up_w"].c8, lp["up_w"].ws, lp["up_b"],
                lp["down_w"].c8, lp["down_w"].ws,
                act=act, interpret=interp, out_dtype=compute_dtype)
        else:
            codes, sx = gemm_gq_pallas(
                codes, sx, lp["up_w"].c8, lp["up_w"].ws, lp["up_b"],
                act=act, interpret=interp)
            h = w8a8_pre(codes, sx, lp["down_w"], compute_dtype)
        h = h.reshape(bb, ss, -1)
    else:
        h = layernorm(x, lp["ln2_w"], lp["ln2_b"], eps)
        h = linear(h, lp["up_w"], lp["up_b"], compute_dtype=compute_dtype,
                   backend=qmm_backend)
        h = gelu_tanh(h) if use_gelu else gelu_quick(h)
        h = linear(h, lp["down_w"], None, compute_dtype=compute_dtype,
                   backend=qmm_backend)
    # row-parallel down-projection: partial sums reduced before the bias
    if tp_axis is not None:
        h = jax.lax.psum(h, tp_axis)
    h = h + lp["down_b"].astype(h.dtype)
    return x + h


def run_blocks(x, layers, *, n_head, eps, use_gelu, causal=False,
               compute_dtype=jnp.float32, attn_impl="auto", unroll=False,
               qmm_backend=None, tp_axis=None, valid_len=None,
               lnq_fuse=False, up_gq=False, mlp_full=True, attn_i8=False,
               attn_block=True, mlp_stream=False):
    """Run the transformer stack; ``layers`` leaves carry a leading L axis.

    ``unroll=True`` emits a Python loop instead of ``lax.scan``: each layer's
    weights become distinct HBM buffers, letting XLA prefetch/pipe across
    layer boundaries instead of dynamic-slicing the stacked arrays every
    iteration.  Costs compile time, can win on wall-clock.
    """
    f = partial(
        block, n_head=n_head, eps=eps, use_gelu=use_gelu, causal=causal,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
        qmm_backend=qmm_backend, tp_axis=tp_axis, valid_len=valid_len,
        lnq_fuse=lnq_fuse, up_gq=up_gq, mlp_full=mlp_full, attn_i8=attn_i8,
        attn_block=attn_block, mlp_stream=mlp_stream,
    )

    if unroll:
        n_layer = jax.tree.leaves(layers)[0].shape[0]
        for i in range(n_layer):
            x = f(x, jax.tree.map(lambda a: a[i], layers))
        return x

    def step(carry, lp):
        return f(carry, lp), None

    out, _ = jax.lax.scan(step, x, layers)
    return out
