"""CLIP text tower.

Mirrors clip_text_encode's graph (/root/reference/clip.cpp:1016-1233): token +
position embeddings, n_layer causal-masked blocks, final LN, EOT pooling (the
*last* token index — the reference always pools position N-1, not the argmax
of the EOS id), text projection, optional in-graph L2 normalization.

TPU-first: inputs are padded to the fixed ``num_positions`` context so every
batch shape compiles once; ``lengths`` carries each sequence's true length for
EOT pooling.  Padding tokens sit *after* the pooled position and are causally
masked, so they cannot affect the output (verified in tests).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.nn import l2_normalize, layernorm
from ..ops.linear import qmatmul
from ..ops.qtensor import take_rows
from .config import TextConfig
from .transformer import _causal_bias as causal_mask  # re-export (back-compat)
from .transformer import run_blocks


def encode_text(
    params: dict,
    cfg: TextConfig,
    token_ids: jnp.ndarray,     # [B, S] int32, padded
    lengths: jnp.ndarray,       # [B] int32, true lengths (incl. BOS/EOS)
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
    b, s = token_ids.shape

    # Pad the context ONCE to a 16-multiple (77 -> 80) and run the whole
    # tower at the padded length: the pad rows sit after every real token,
    # so causal masking removes them from every real query exactly
    # (exp(-1e9) underflows to 0.0 — real-row outputs are bit-identical),
    # and EOT pooling indexes by true length.  This makes the sequence
    # flat-attention-kernel eligible (smaller block-diagonal waste than the
    # padded 3-D kernel path: +10% text throughput) and removes the
    # per-layer S re-pad.
    sp = -(-s // 16) * 16
    if sp != s:
        token_ids = jnp.pad(token_ids, ((0, 0), (0, sp - s)))

    x = take_rows(params["tok_embd"], token_ids, dtype=compute_dtype)
    pos = take_rows(params["pos_embd"], jnp.arange(s), dtype=compute_dtype)
    if sp != s:
        pos = jnp.pad(pos, ((0, sp - s), (0, 0)))
    x = x + pos[None, :, :]

    x = run_blocks(
        x,
        params["layers"],
        n_head=cfg.n_head,
        eps=cfg.eps,
        use_gelu=use_gelu,
        causal=True,
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
        unroll=unroll,
        qmm_backend=qmm_backend,
        tp_axis=tp_axis,
        lnq_fuse=lnq_fuse,
        up_gq=up_gq,
        mlp_full=mlp_full,
        attn_i8=attn_i8,
        attn_block=attn_block,
        mlp_stream=mlp_stream,
    )

    x = layernorm(x, params["post_ln_w"], params["post_ln_b"], cfg.eps)

    # EOT pooling: last real token (clip.cpp:1154-1155)
    pooled = jnp.take_along_axis(
        x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]

    out = qmatmul(pooled, params["proj"], compute_dtype=compute_dtype,
                  backend=qmm_backend)
    if normalize:
        out = l2_normalize(out)
    return out
