"""CLIP vision tower.

Mirrors clip_image_batch_encode's graph (/root/reference/clip.cpp:1247-1523):
conv patch embedding, class-token concat, learned position embeddings, pre-LN,
n_layer unmasked blocks, CLS pooling (row 0), post-LN, visual projection,
optional L2 normalization.

TPU-first: the stride-p conv over non-overlapping patches is expressed as a
reshape + one big matmul (im2col is free for stride == kernel), which lands
directly on the MXU instead of going through a conv lowering; inputs are NHWC
float32 straight from preprocessing (no NCHW repack — the reference's
NHWC→NCHW loop at clip.cpp:1285-1307 exists only because ggml's conv wants
NCHW).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention_pallas import flat_eligible
from ..ops.nn import l2_normalize, layernorm
from ..ops.linear import qmatmul
from ..ops.qtensor import QTensor, W8Tensor, dequant, take_rows
from .config import VisionConfig
from .transformer import run_blocks


def patch_embed(pixels: jnp.ndarray, w4: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Patch embedding as ONE multi-axis dot_general straight off the NHWC
    layout: contract (p1, p2, c) of the reshaped pixels against the conv
    kernel [hidden, c, p1, p2] — no explicit im2col transpose (XLA folds the
    reorder into the GEMM's operand pipeline; bit-identical to
    patchify+matmul, ~1% faster end-to-end at ViT-B/32 B=448)."""
    b, h, w, c = pixels.shape
    gh, gw = h // patch, w // patch
    x6 = pixels.reshape(b, gh, patch, gw, patch, c)
    y = jax.lax.dot_general(
        x6, w4, (((2, 4, 5), (2, 3, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(pixels.dtype).reshape(b, gh * gw, w4.shape[0])


def encode_image(
    params: dict,
    cfg: VisionConfig,
    pixels: jnp.ndarray,        # [B, S, S, 3] float32 NHWC, normalized
    *,
    use_gelu: bool,
    normalize: bool = True,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
    unroll: bool = False,
    qmm_backend: str | None = None,
    tp_axis: str | None = None,
    lnq_fuse: bool = False,
    up_gq: bool = False,
    mlp_full: bool = True,
    attn_i8: bool = False,
    attn_block: bool = True,
    mlp_stream: bool = False,
) -> jnp.ndarray:
    b = pixels.shape[0]
    p = cfg.patch_size
    hdim = cfg.hidden_size

    w_patch = params["patch_embd"]  # [hidden, 3, p, p], f16 in checkpoints
    if isinstance(w_patch, QTensor):  # quantizers only touch 2-D, but be safe
        w_patch = dequant(w_patch, dtype=compute_dtype)

    x = patch_embed(pixels.astype(compute_dtype),
                    w_patch.astype(compute_dtype), p)  # [B, N, hidden]

    cls = params["class_embd"].astype(compute_dtype)
    cls = jnp.broadcast_to(cls[None, None, :], (b, 1, hdim))
    x = jnp.concatenate([cls, x], axis=1)  # [B, N+1, hidden]

    pos = take_rows(params["pos_embd"], jnp.arange(cfg.num_positions), dtype=compute_dtype)
    x = x + pos[None, :, :]

    x = layernorm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.eps)

    # Pad-once: sequences the flat attention kernel can't take natively
    # (S=197/257... — see ops.attention_pallas.flat_eligible) are padded to
    # an 8-multiple HERE and the whole stack runs at the padded length with
    # pad KEYS masked in attention (valid_len).  Real rows are bit-identical
    # (masked logits underflow to exactly 0 in the softmax); pad-row outputs
    # are garbage but CLS pooling reads row 0.  This kills the per-layer
    # S re-pad and unlocks the flat kernel + 2-D qkv projection for ViT-B/16
    # and ViT-L/14 shapes.
    s_real = x.shape[1]
    valid_len = None
    d_head = cfg.hidden_size // cfg.n_head
    # d_head gate (measured): 64-wide head lane-slices run well in the flat
    # kernel (B/16 +13%, L/14 +9%); 80-wide (ViT-H/14) straddles the 128
    # lane registers and LOSES 10% on the bf16 DEQUANT path — there H/14
    # keeps the padded kernel.  Under W8A8 the gate flips: every GEMM is
    # already a 2-D int8 dot (no conv-emitter layout to lose), and the flat
    # kernel beats the padded one 561 vs 522 img/s at H/14 B=32
    # (scripts/bench_h14.py round 3) — so W8Tensor weights take the flat
    # pad-once path regardless of d_head.  Padding S=577 merely to align
    # the padded kernel also measured slightly worse; pad-once applies only
    # when it unlocks the flat path.
    h3 = 3 * cfg.hidden_size
    is_w8 = isinstance(params["layers"]["qkv_w"], W8Tensor)
    if not flat_eligible(b, s_real, h3) and (d_head % 64 == 0 or is_w8):
        sp = -(-s_real // 8) * 8
        if sp != s_real and flat_eligible(b, sp, h3):
            x = jnp.pad(x, ((0, 0), (0, sp - s_real), (0, 0)))
            valid_len = s_real

    x = run_blocks(
        x,
        params["layers"],
        n_head=cfg.n_head,
        eps=cfg.eps,
        use_gelu=use_gelu,
        causal=False,
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
        unroll=unroll,
        qmm_backend=qmm_backend,
        tp_axis=tp_axis,
        valid_len=valid_len,
        lnq_fuse=lnq_fuse,
        up_gq=up_gq,
        mlp_full=mlp_full,
        attn_i8=attn_i8,
        attn_block=attn_block,
        mlp_stream=mlp_stream,
    )

    pooled = x[:, 0, :]  # CLS (clip.cpp:1426-1430)
    pooled = layernorm(pooled, params["post_ln_w"], params["post_ln_b"], cfg.eps)
    out = qmatmul(pooled, params["proj"], compute_dtype=compute_dtype,
                  backend=qmm_backend)
    if normalize:
        out = l2_normalize(out)
    return out
