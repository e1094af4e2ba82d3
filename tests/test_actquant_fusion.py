"""Fused Pallas LN/gelu->int8-quant kernels (ops.actquant_pallas).

The fused producers must agree with the unfused ``layernorm/gelu +
w8a8_matmul`` pair exactly (same f32 math, same amax scaling) and must be
gated off transparently wherever they don't apply (dense weights, widths
that don't tile the 128-lane registers, lnq_fuse off).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_tpu.models import transformer
from clip_tpu.ops.actquant_pallas import (
    actq_pallas, fusable_width, lnq_pallas, w8a8_pre,
)
from clip_tpu.ops.linear import w8a8_matmul
from clip_tpu.ops.nn import gelu_quick, gelu_tanh, layernorm
from clip_tpu.ops.qtensor import W8Tensor, to_w8tensor

INTERP = jax.default_backend() != "tpu"
EPS = 1e-5


def _quant_rows_ref(y):
    amax = np.abs(y).max(axis=1, keepdims=True)
    sx = amax / 127.0 + 1e-12
    codes = np.clip(np.round(y / sx), -127, 127).astype(np.int8)
    return codes, sx.astype(np.float32)


def test_lnq_matches_unfused(rng):
    rows, h = 100, 256  # rows deliberately not a block multiple
    x = jnp.asarray(rng.normal(0, 1.5, (rows, h)), jnp.float32)
    w = jnp.asarray(rng.normal(1, 0.1, h), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, h), jnp.float32)
    codes, sx = lnq_pallas(x, w, b, eps=EPS, block_rows=32, interpret=INTERP)
    assert codes.shape == (rows, h) and sx.shape == (rows, 1)
    y_ref = np.asarray(layernorm(x, w, b, EPS), np.float32)
    c_ref, s_ref = _quant_rows_ref(y_ref)
    np.testing.assert_allclose(np.asarray(sx), s_ref, rtol=1e-6)
    # rounding ties may flip a code by 1; all else identical
    assert np.abs(np.asarray(codes, np.int32) - c_ref.astype(np.int32)).max() <= 1


@pytest.mark.parametrize("act,ref_fn", [
    ("gelu_quick", gelu_quick),
    ("gelu_tanh", gelu_tanh),
    ("none", lambda x: x),
])
def test_actq_matches_unfused(rng, act, ref_fn):
    rows, h = 70, 384
    x = jnp.asarray(rng.normal(0, 2.0, (rows, h)), jnp.float32)
    codes, sx = actq_pallas(x, act=act, block_rows=16, interpret=INTERP)
    y_ref = np.asarray(ref_fn(x), np.float32)
    c_ref, s_ref = _quant_rows_ref(y_ref)
    np.testing.assert_allclose(np.asarray(sx), s_ref, rtol=1e-6)
    assert np.abs(np.asarray(codes, np.int32) - c_ref.astype(np.int32)).max() <= 1


def test_w8a8_pre_equals_w8a8_matmul(rng):
    """Pre-quantized codes through w8a8_pre == w8a8_matmul end to end."""
    m, k, n = 48, 256, 128
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    w8 = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (n, k)), jnp.float32))
    codes, sx = actq_pallas(x, act="none", block_rows=16, interpret=INTERP)
    out = w8a8_pre(codes, sx, w8, compute_dtype=jnp.float32)
    ref = w8a8_matmul(x, w8, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def _layer_params(rng, h, f):
    def mk(shape, s=0.05):
        return jnp.asarray(rng.normal(0, s, shape), jnp.float32)
    return dict(
        ln1_w=mk(h) + 1, ln1_b=mk(h), ln2_w=mk(h) + 1, ln2_b=mk(h),
        qkv_w=mk((3 * h, h)), qkv_b=mk(3 * h),
        o_w=mk((h, h)), o_b=mk(h),
        up_w=mk((f, h)), up_b=mk(f),
        down_w=mk((h, f)), down_b=mk(h),
    )


@pytest.mark.parametrize("act", ["gelu_quick", "gelu_tanh", "none"])
def test_gemm_gq_matches_unfused(rng, act):
    """gemm_gq_pallas (int8 GEMM + bias + gelu + requant in one kernel) must
    agree with the unfused chain (w8a8_pre + bias + actq_pallas) to <=1
    rounding tie per code and ~1e-6 relative on scales — the fused epilogue
    computes the same f32 math on the same int32 accumulator."""
    from clip_tpu.ops.actquant_pallas import gemm_gq_pallas

    m, k, n = 100, 256, 512  # m deliberately not a block multiple
    xf = rng.normal(0, 1, (m, k)).astype(np.float32)
    amax = np.abs(xf).max(axis=1, keepdims=True)
    s = amax / 127.0 + 1e-12
    codes = jnp.asarray(np.clip(np.round(xf / s), -127, 127), jnp.int8)
    sx = jnp.asarray(s, jnp.float32)
    w = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (n, k)), jnp.float32))
    bias = jnp.asarray(rng.normal(0, 0.05, n), jnp.float32)

    cf, sf = gemm_gq_pallas(codes, sx, w.c8, w.ws, bias, act=act,
                            block_rows=32, interpret=INTERP)
    assert cf.shape == (m, n) and sf.shape == (m, 1)

    h = w8a8_pre(codes, sx, w, jnp.float32) + bias
    ref_fn = {"gelu_quick": gelu_quick, "gelu_tanh": gelu_tanh,
              "none": lambda y: y}[act]
    c_ref, s_ref = _quant_rows_ref(np.asarray(ref_fn(h), np.float32))
    np.testing.assert_allclose(np.asarray(sf), s_ref, rtol=1e-5)
    assert np.abs(np.asarray(cf, np.int32) - c_ref.astype(np.int32)).max() <= 1


def test_ragged_blocking_invariance(rng):
    """The kernels run a ragged grid (Mosaic masks the tail block's stores;
    no XLA-level pad/slice — at B/32 B=448 those pads were 24 ops of the
    unrolled program).  Row math is per-row, so results must be BIT-equal
    across any block_rows choice, dividing or not."""
    from clip_tpu.ops.actquant_pallas import gemm_gq_pallas

    rows, h, n = 104, 256, 512
    x = jnp.asarray(rng.normal(0, 1.5, (rows, h)), jnp.float32)
    w = jnp.asarray(rng.normal(1, 0.1, h), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, h), jnp.float32)
    c1, s1 = lnq_pallas(x, w, b, eps=EPS, block_rows=48, interpret=INTERP)
    c2, s2 = lnq_pallas(x, w, b, eps=EPS, block_rows=104, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    wq = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (n, h)), jnp.float32))
    bias = jnp.asarray(rng.normal(0, 0.05, n), jnp.float32)
    g1, t1 = gemm_gq_pallas(c1, s1, wq.c8, wq.ws, bias, block_rows=48,
                            interpret=INTERP)
    g2, t2 = gemm_gq_pallas(c1, s1, wq.c8, wq.ws, bias, block_rows=104,
                            interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    a1, u1 = actq_pallas(x, block_rows=48, interpret=INTERP)
    a2, u2 = actq_pallas(x, block_rows=104, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


@pytest.mark.parametrize("use_gelu", [False, True])
def test_block_fused_matches_unfused(rng, use_gelu):
    """Full transformer block: lnq_fuse must not change W8A8 numerics beyond
    int8 rounding ties.  The fused up-GEMM (gemm_gq_pallas) rescales its int32
    accumulator in-kernel while the unfused pair rescales in XLA — legitimate
    f32 reassociation at the ~1e-7 level that can flip a quantization ROUND
    TIE by one code; a flipped code perturbs the block output by about
    s_row * |W_col| ~ 3e-3 at these unit-variance shapes.  Bound accordingly
    (the per-op agreement is pinned code-exact by the tests above)."""
    h, f = 256, 1024
    lp = _layer_params(rng, h, f)
    for k in ("qkv_w", "o_w", "up_w", "down_w"):
        lp[k] = to_w8tensor(lp[k])
    x = jnp.asarray(rng.normal(0, 1, (2, 10, h)), jnp.float32)
    kw = dict(n_head=4, eps=EPS, use_gelu=use_gelu,
              compute_dtype=jnp.float32, attn_impl="xla")
    ref = transformer.block(x, lp, lnq_fuse=False, **kw)
    out = transformer.block(x, lp, lnq_fuse=True, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-2, atol=1e-2)


def test_block_up_gq_matches_unfused(rng):
    """Wide-tower variant (lnq producers off, up_gq on): the MLP's up GEMM
    runs gemm_gq_pallas off an XLA-level row quant.  Must agree with the
    plain W8A8 block within int8 tie bounds, and gate itself off bit-exactly
    for dense weights."""
    h, f = 256, 1024
    lp = _layer_params(rng, h, f)
    for k in ("qkv_w", "o_w", "up_w", "down_w"):
        lp[k] = to_w8tensor(lp[k])
    x = jnp.asarray(rng.normal(0, 1, (2, 10, h)), jnp.float32)
    kw = dict(n_head=4, eps=EPS, use_gelu=True,
              compute_dtype=jnp.float32, attn_impl="xla")
    ref = transformer.block(x, lp, **kw)
    out = transformer.block(x, lp, up_gq=True, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-2, atol=1e-2)

    # dense weights: up_gq must be ignored (identical unfused path)
    lpd = _layer_params(np.random.default_rng(1), h, f)
    a = transformer.block(x, lpd, up_gq=True, **kw)
    b = transformer.block(x, lpd, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_fused_gates_off_dense_and_narrow(rng):
    """Dense weights, or widths that don't tile the 128-lane registers,
    must take the identical unfused path (bit-exact)."""
    # dense weights: W8Tensor check gates fusion off
    h, f = 256, 1024
    lp = _layer_params(rng, h, f)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, h)), jnp.float32)
    kw = dict(n_head=4, eps=EPS, use_gelu=False,
              compute_dtype=jnp.float32, attn_impl="xla")
    a = transformer.block(x, lp, lnq_fuse=True, **kw)
    b = transformer.block(x, lp, lnq_fuse=False, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # narrow width (H=64): fusable_width gates off even with W8 weights
    assert not fusable_width(64)
    h, f = 64, 256
    lp = _layer_params(rng, h, f)
    for k in ("qkv_w", "o_w", "up_w", "down_w"):
        lp[k] = to_w8tensor(lp[k])
    x = jnp.asarray(rng.normal(0, 1, (2, 8, h)), jnp.float32)
    kw["n_head"] = 2
    a = transformer.block(x, lp, lnq_fuse=True, **kw)
    b = transformer.block(x, lp, lnq_fuse=False, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mlp_kernels_match_staged_chain(rng):
    """Whole-MLP kernels (mlp_lnq_pallas / mlp_gq_pallas) vs the staged
    lnq -> gemm_gq -> w8a8_pre chain: same ops in the same order, so outputs
    must be BIT-equal (the int8 dots accumulate exactly in int32; the f32
    epilogues are identical expressions)."""
    from clip_tpu.ops.actquant_pallas import (
        gemm_gq_pallas, mlp_gq_pallas, mlp_lnq_pallas)

    h, f, rows = 128, 512, 52  # rows deliberately not a block multiple
    x = jnp.asarray(rng.normal(0, 1, (rows, h)), jnp.bfloat16)
    lnw = jnp.asarray(rng.normal(1, 0.05, h), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    up = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (f, h)), jnp.float32))
    dn = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (h, f)), jnp.float32))
    upb = jnp.asarray(rng.normal(0, 0.05, f), jnp.float32)

    for act in ("gelu_quick", "gelu_tanh"):
        c, s = lnq_pallas(x, lnw, lnb, eps=EPS, interpret=INTERP)
        c2, s2 = gemm_gq_pallas(c, s, up.c8, up.ws, upb, act=act,
                                interpret=INTERP)
        ref = w8a8_pre(c2, s2, dn, jnp.float32)

        got = mlp_lnq_pallas(x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws,
                             eps=EPS, act=act, interpret=INTERP,
                             out_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        got2 = mlp_gq_pallas(c, s, up.c8, up.ws, upb, dn.c8, dn.ws,
                             act=act, interpret=INTERP, out_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref))


def test_mlp_blocking_invariance(rng):
    """Ragged grids + per-row math: whole-MLP outputs must be bit-equal
    across any block_rows choice, dividing or not."""
    from clip_tpu.ops.actquant_pallas import mlp_lnq_pallas

    h, f, rows = 128, 512, 104
    x = jnp.asarray(rng.normal(0, 1, (rows, h)), jnp.bfloat16)
    lnw = jnp.asarray(rng.normal(1, 0.05, h), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    up = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (f, h)), jnp.float32))
    dn = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (h, f)), jnp.float32))
    upb = jnp.asarray(rng.normal(0, 0.05, f), jnp.float32)

    outs = [
        np.asarray(mlp_lnq_pallas(
            x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws, eps=EPS,
            block_rows=br, interpret=INTERP, out_dtype=jnp.float32))
        for br in (48, 104)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])


def test_block_mlp_full_matches_staged(rng):
    """transformer.block with mlp_full on vs off (both lnq_fuse) must be
    bit-equal — the whole-MLP kernel is a fusion, not an approximation.
    ViT-H/14-width MLPs (resident weights past the VMEM budget) must fall
    back to the staged chain transparently."""
    from clip_tpu.ops.actquant_pallas import mlp_fusable

    h, f = 128, 512
    lp = _layer_params(rng, h, f)
    for k in ("qkv_w", "o_w", "up_w", "down_w"):
        lp[k] = to_w8tensor(lp[k])
    assert mlp_fusable(h, f)
    # bf16 (production) is bit-equal; at f32 the fused kernel's residual
    # epilogue may FMA-contract the final mul+add (no rounding barrier at
    # the no-op astype), so 1-ulp drift is legal there
    for dt, exact in ((jnp.bfloat16, True), (jnp.float32, False)):
        x = jnp.asarray(rng.normal(0, 1, (2, 10, h)), dt)
        kw = dict(n_head=4, eps=EPS, use_gelu=False,
                  compute_dtype=dt, attn_impl="xla", lnq_fuse=True)
        a = np.asarray(transformer.block(x, lp, mlp_full=True, **kw), np.float32)
        b = np.asarray(transformer.block(x, lp, mlp_full=False, **kw), np.float32)
        if exact:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    # the production fallback boundary: H/14's 1280x5120 exceeds the budget
    assert not mlp_fusable(1280, 5120)
    assert mlp_fusable(768, 3072) and mlp_fusable(1024, 4096)


@pytest.mark.parametrize("mode", ["plain", "causal", "valid_len"])
def test_attn_i8_route_matches_bf16_route(rng, mode):
    """The int8-consuming attention route (qkv GEMM emits int8 codes via the
    gemm_gq epilogue; the kernel's score dot runs exact-int32 with a rank-1
    rescale) must track the bf16 route within int8-staging error: the ONLY
    new approximation is the per-row quantization of the qkv projection, so
    block outputs agree to ~1e-2 abs / cos>0.9999 at unit-variance shapes —
    in every mask mode (vision pad-once valid_len, text causal)."""
    h, f, nh = 128, 512, 2
    lp = _layer_params(rng, h, f)
    for k in ("qkv_w", "o_w", "up_w", "down_w"):
        lp[k] = to_w8tensor(lp[k])
    x = jnp.asarray(rng.normal(0, 1, (4, 8, h)), jnp.float32)
    kw = dict(n_head=nh, eps=EPS, use_gelu=False, compute_dtype=jnp.float32,
              attn_impl="pallas", lnq_fuse=True,
              causal=mode == "causal",
              valid_len=6 if mode == "valid_len" else None)
    a = np.asarray(transformer.block(x, lp, attn_i8=True, **kw))
    b = np.asarray(transformer.block(x, lp, attn_i8=False, **kw))
    np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2)
    cos = (a.ravel() * b.ravel()).sum() / (
        np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9999, cos


@pytest.mark.parametrize("mode", ["plain", "causal", "valid_len"])
def test_attn_block_route_matches_staged(rng, mode):
    """The whole-attention-block kernel (LN + quant + int8 qkv GEMM +
    attention + requant + int8 o GEMM in one pass) must track the staged
    path within int8-staging noise in every mask mode; its int8 staging is
    identical to the staged path's, the only reassociation being the qkv
    bias added in f32 before the bf16 cast (cos > 0.9999)."""
    from clip_tpu.ops.attention_pallas import attn_block_fusable

    h, f, nh = 128, 512, 2
    assert attn_block_fusable(h, 3 * h, h)
    lp = _layer_params(rng, h, f)
    for k in ("qkv_w", "o_w", "up_w", "down_w"):
        lp[k] = to_w8tensor(lp[k])
    x = jnp.asarray(rng.normal(0, 1, (4, 8, h)), jnp.float32)
    kw = dict(n_head=nh, eps=EPS, use_gelu=False, compute_dtype=jnp.float32,
              attn_impl="pallas", lnq_fuse=True,
              causal=mode == "causal",
              valid_len=6 if mode == "valid_len" else None)
    a = np.asarray(transformer.block(x, lp, attn_block=True, **kw))
    b = np.asarray(transformer.block(x, lp, attn_block=False, **kw))
    np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2)
    cos = (a.ravel() * b.ravel()).sum() / (
        np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9999, cos


def _w128_q4_gguf(tmp_path):
    """A 128-wide q4_0 checkpoint — the smallest width the fusion gate
    (128-lane tiling) accepts."""
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    from clip_tpu.convert import convert_hf_clip
    from clip_tpu.quantize import quantize_model
    from hf_fixtures import tiny_vocab_tokens

    text_cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, layer_norm_eps=1e-5,
        hidden_act="quick_gelu", eos_token_id=98, bos_token_id=97)
    vision_cfg = CLIPVisionConfig(
        hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        layer_norm_eps=1e-5, hidden_act="quick_gelu")
    cfg = CLIPConfig.from_text_vision_configs(
        text_cfg, vision_cfg, projection_dim=32)
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    src = str(tmp_path / "w128.gguf")
    convert_hf_clip(model, tiny_vocab_tokens(), src, use_f32=True, name="w128")
    qp = str(tmp_path / "w128.q4_0.gguf")
    quantize_model(src, qp, "q4_0", verbose=False)
    return qp


def test_engine_lnq_fuse(tmp_path, rng):
    """Engine-level: a 128-wide model (fusion engages) must produce
    embeddings in lockstep with the unfused W8A8 path; the tiny 64-wide
    fixture must fall back transparently."""
    from clip_tpu.engine import ClipEngine

    qp = _w128_q4_gguf(tmp_path)
    base = ClipEngine(qp, verbosity=0, act_quant=True, lnq_fuse=False)
    fused = ClipEngine(qp, verbosity=0, act_quant=True, lnq_fuse=True)
    assert fused.lnq_fuse and not base.lnq_fuse
    assert isinstance(fused.params["text"]["layers"]["qkv_w"], W8Tensor)

    texts = ["tok1 tok2", "tok2 tok3 tok4"]
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    t0 = base.encode_text(texts, normalize=True)
    t1 = fused.encode_text(texts, normalize=True)
    i0 = base.encode_image(img, normalize=True)
    i1 = fused.encode_image(img, normalize=True)
    # CPU runs both paths in f32 (near-identical); on TPU the real kernels
    # run bf16 and rounding-tie codes drift a little further (observed
    # 0.99928 on the forced-text arm)
    bound = 0.999 if jax.default_backend() == "tpu" else 0.9999
    assert (t0 * t1).sum(1).min() > bound, (t0 * t1).sum(1)
    assert float(i0 @ i1) > bound
    base.close(); fused.close()

    # lnq_fuse without act_quant is inert
    plain = ClipEngine(qp, verbosity=0, act_quant=False, lnq_fuse=True)
    assert not plain.lnq_fuse
    plain.close()


def test_vision_w8_flat_gate_d_head_not_64(rng):
    """W8Tensor weights unlock the pad-once flat path even when d_head is
    not a 64-multiple (the round-3 H/14 win): per-image outputs must match
    a batch shape that takes the flat kernel without padding."""
    import functools

    from clip_tpu.models.config import VisionConfig
    from clip_tpu.models.vision import encode_image
    from clip_tpu.ops.attention_pallas import flat_eligible

    h, f, p, img = 96, 384, 17, 68  # S = (68/17)^2 + 1 = 17, d_head = 48
    cfg = VisionConfig(
        image_size=img, patch_size=p, hidden_size=h, n_intermediate=f,
        projection_dim=32, n_head=2, n_layer=2, eps=1e-5)
    s = (img // p) ** 2 + 1
    assert not flat_eligible(2, s, 3 * h)   # b=2: gate must fire
    assert flat_eligible(8, s, 3 * h)       # b=8: flat without padding

    def mk(shape, sd=0.05):
        return jnp.asarray(rng.normal(0, sd, shape), jnp.float32)
    L = 2
    layers = dict(
        ln1_w=mk((L, h)) + 1, ln1_b=mk((L, h)),
        ln2_w=mk((L, h)) + 1, ln2_b=mk((L, h)),
        qkv_b=mk((L, 3 * h)), o_b=mk((L, h)),
        up_b=mk((L, f)), down_b=mk((L, h)),
    )
    for name, shape in (("qkv_w", (L, 3 * h, h)), ("o_w", (L, h, h)),
                        ("up_w", (L, f, h)), ("down_w", (L, h, f))):
        layers[name] = to_w8tensor(np.asarray(mk(shape)))
    params = dict(
        patch_embd=mk((h, 3, p, p)), class_embd=mk(h),
        pos_embd=mk((s, h)), pre_ln_w=mk(h) + 1, pre_ln_b=mk(h),
        post_ln_w=mk(h) + 1, post_ln_b=mk(h), proj=mk((32, h)),
        layers=layers,
    )
    enc = functools.partial(
        encode_image, params, cfg, use_gelu=False, normalize=True,
        compute_dtype=jnp.float32, attn_impl="pallas")
    px = jnp.asarray(rng.normal(0, 1, (8, img, img, 3)), jnp.float32)
    out2 = enc(pixels=px[:2])   # padded-once flat path (new W8 gate)
    out8 = enc(pixels=px)       # flat path, no padding
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(out8[:2]), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_data,n_model", [(4, 2), (2, 4)])
def test_lnq_fuse_shard_map_tp(tmp_path, rng, n_data, n_model):
    """Fused LN/gelu->quant under shard_map tensor parallelism: the lnq
    kernel sees replicated activations (global amax — same codes as
    single-device); the gelu kernel quantizes each shard's LOCAL up-output
    with its own amax, matching w8a8's TP semantics.  Embeddings must agree
    with the single-device fused path at quantization tolerance."""
    if len(jax.devices()) < n_data * n_model:
        pytest.skip("needs 8 devices")
    from clip_tpu.engine import ClipEngine
    from clip_tpu.parallel import make_mesh

    qp = _w128_q4_gguf(tmp_path)
    base = ClipEngine(qp, verbosity=0, act_quant=True, lnq_fuse=True)
    eng = ClipEngine(qp, mesh=make_mesh(n_data, n_model), verbosity=0,
                     act_quant=True, lnq_fuse=True)
    assert eng._spmd and eng.lnq_fuse

    pixels = rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    out = eng.encode_image(pixels, normalize=True, preprocessed=True)
    ref = base.encode_image(pixels, normalize=True, preprocessed=True)
    cos = np.sum(out * ref, axis=-1)
    assert cos.min() > 0.999, f"min cos {cos.min()}"

    out_t = eng.encode_text(["tok1 tok2", "tok2", "tok3 tok4", "tok1"])
    ref_t = base.encode_text(["tok1 tok2", "tok2", "tok3 tok4", "tok1"])
    cos_t = np.sum(out_t * ref_t, axis=-1)
    assert cos_t.min() > 0.999, f"min cos {cos_t.min()}"
    base.close(); eng.close()


def test_attention_quant_epilogue_matches_unfused(rng):
    """Flat attention kernel with the int8 output epilogue (quant_out) must
    match the unfused pallas-attention + w8a8 o-projection to rounding
    tolerance (same per-row amax quant math, fused into the kernel)."""
    from clip_tpu.ops.attention_pallas import flat_eligible

    h, f = 256, 1024
    b, s = 2, 16  # flat-eligible: 32 rows, 8-aligned
    assert flat_eligible(b, s, 3 * h)
    lp = _layer_params(rng, h, f)
    for k in ("qkv_w", "o_w", "up_w", "down_w"):
        lp[k] = to_w8tensor(lp[k])
    x = jnp.asarray(rng.normal(0, 1, (b, s, h)), jnp.float32)
    kw = dict(n_head=4, eps=EPS, use_gelu=False,
              compute_dtype=jnp.float32, attn_impl="pallas")
    # attn_i8=False isolates the epilogue under test: the int8 attention
    # route adds qkv-staging error gated by its own test above
    ref = transformer.block(x, lp, lnq_fuse=False, attn_i8=False, **kw)
    out = transformer.block(x, lp, lnq_fuse=True, attn_i8=False, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-3, atol=3e-3)

    # non-flat shape (s=10 -> 20 rows, not 8-aligned): quant_o must gate off
    # and the fused-MLP-only path still matches
    b2, s2 = 2, 10
    assert not flat_eligible(b2, s2, 3 * h)
    x2 = jnp.asarray(rng.normal(0, 1, (b2, s2, h)), jnp.float32)
    ref2 = transformer.block(x2, lp, lnq_fuse=False, attn_i8=False, **kw)
    out2 = transformer.block(x2, lp, lnq_fuse=True, attn_i8=False, **kw)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref2), rtol=3e-3, atol=3e-3)


def test_mlp_residual_epilogue_bitmatch(rng):
    """mlp_lnq_pallas with the down-bias + residual epilogue must BIT-match
    the separate XLA adds it replaces (same dtype, same add order:
    x + (out_cdt + bias_cdt)), ragged tail included."""
    from clip_tpu.ops.actquant_pallas import mlp_lnq_pallas

    h, f, rows = 128, 512, 52  # ragged: not a block multiple
    x = jnp.asarray(rng.normal(0, 1, (rows, h)), jnp.bfloat16)
    lnw = jnp.asarray(rng.normal(1, 0.05, h), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    up = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (f, h)), jnp.float32))
    dn = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (h, f)), jnp.float32))
    upb = jnp.asarray(rng.normal(0, 0.05, f), jnp.float32)
    dnb = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)

    # bf16 (the production compute dtype) must BIT-match: the astype forces a
    # rounding barrier before the adds.  At f32 the astype is a no-op and XLA
    # may contract the epilogue's mul+add into an FMA, so 1-ulp drift is legal.
    for dt, exact in ((jnp.bfloat16, True), (jnp.float32, False)):
        pre = mlp_lnq_pallas(x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws,
                             eps=EPS, interpret=INTERP, out_dtype=dt)
        ref = x.astype(dt) + (pre + dnb.astype(dt))
        got = mlp_lnq_pallas(x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws,
                             dnb, eps=EPS, interpret=INTERP, out_dtype=dt,
                             residual=True)
        if exact:
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="residual"):
        mlp_lnq_pallas(x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws,
                       eps=EPS, interpret=INTERP, residual=True)


@pytest.mark.parametrize("mode", ["plain", "causal", "valid_len"])
def test_attn_block_residual_epilogue_bitmatch(rng, mode):
    """attn_block_pallas with the o-bias + residual epilogue must BIT-match
    the separate XLA adds it replaces in every mask mode."""
    from clip_tpu.ops.attention_pallas import attn_block_pallas

    h, nh, b, s = 128, 2, 3, 8  # b*s not a block multiple of bb*s
    x = jnp.asarray(rng.normal(0, 1, (b, s, h)), jnp.bfloat16)
    lnw = jnp.asarray(rng.normal(1, 0.05, h), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    qw = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (3 * h, h)), jnp.float32))
    ow = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (h, h)), jnp.float32))
    qb = jnp.asarray(rng.normal(0, 0.05, 3 * h), jnp.float32)
    ob = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    kw = dict(n_head=nh, scale=0.125, eps=EPS,
              causal=mode == "causal",
              valid_len=6 if mode == "valid_len" else None,
              interpret=INTERP)

    # bf16 must BIT-match (rounding barrier at the astype); f32 tolerates
    # 1-ulp FMA contraction of the epilogue mul+add (see the MLP test)
    for dt, exact in ((jnp.bfloat16, True), (jnp.float32, False)):
        pre = attn_block_pallas(x, lnw, lnb, qw.c8, qw.ws, qb, ow.c8, ow.ws,
                                out_dtype=dt, **kw)
        ref = x.astype(dt) + (pre + ob.astype(dt))
        got = attn_block_pallas(x, lnw, lnb, qw.c8, qw.ws, qb, ow.c8, ow.ws,
                                ob, out_dtype=dt, residual=True, **kw)
        if exact:
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="residual"):
        attn_block_pallas(x, lnw, lnb, qw.c8, qw.ws, qb, ow.c8, ow.ws,
                          out_dtype=jnp.bfloat16, residual=True, **kw)


@pytest.mark.parametrize("mode", ["plain", "causal"])
def test_layer_block_kernel_matches_two_kernel_chain(rng, mode):
    """Whole-layer kernel (attention block + MLP in ONE pallas_call) vs the
    production two-kernel chain.  Measured NEGATIVE in-model on v5e (slope
    1.379 vs 1.333 ms/layer at B/32 shapes, 0.832 vs 0.783 at text shapes —
    scripts/proto_layer_kernel.py): the saved mid-residual round-trip does
    not pay for the lost inter-kernel pipelining.  The op stays for
    re-racing on other hardware; on the real chip it is bit-equal, in
    interpret/CPU the fused program may defer the mid-residual's bf16
    rounding, so this gates at tolerance."""
    from clip_tpu.ops.attention_pallas import (
        attn_block_pallas, layer_block_fusable, layer_block_pallas)
    from clip_tpu.ops.actquant_pallas import mlp_lnq_pallas

    h, f, nh, b, s = 128, 512, 2, 3, 8
    assert layer_block_fusable(h, 3 * h, h, f, b, s)
    assert not layer_block_fusable(1280, 3 * 1280, 1280, 5120, 32, 264)
    x = jnp.asarray(rng.normal(0, 1, (b, s, h)), jnp.bfloat16)
    mk = lambda *sh: jnp.asarray(rng.normal(0, 0.05, sh), jnp.float32)
    l1w, l1b, l2w, l2b = mk(h) + 1, mk(h), mk(h) + 1, mk(h)
    qw, ow = to_w8tensor(mk(3 * h, h)), to_w8tensor(mk(h, h))
    up, dn = to_w8tensor(mk(f, h)), to_w8tensor(mk(h, f))
    qb, ob, ub, db = mk(3 * h), mk(h), mk(f), mk(h)
    kw = dict(n_head=nh, scale=0.125, eps=EPS, causal=mode == "causal",
              interpret=INTERP)

    xm = attn_block_pallas(x, l1w, l1b, qw.c8, qw.ws, qb, ow.c8, ow.ws, ob,
                           residual=True, **kw)
    ref = np.asarray(mlp_lnq_pallas(
        xm.reshape(b * s, h), l2w, l2b, up.c8, up.ws, ub, dn.c8, dn.ws, db,
        eps=EPS, act="gelu_quick", interpret=INTERP,
        residual=True), np.float32).reshape(b, s, h)
    got = np.asarray(layer_block_pallas(
        x, l1w, l1b, qw.c8, qw.ws, qb, ow.c8, ow.ws, ob,
        l2w, l2b, up.c8, up.ws, ub, dn.c8, dn.ws, db,
        act="gelu_quick", **kw), np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.9999, cos


def test_mlp_stream_matches_resident_bitwise(rng):
    """The weight-STREAMED whole-MLP kernel must be BIT-equal to the resident
    kernel (full-row requant scale staged in scratch; int32 chunk-dot
    accumulation is exact) — and therefore to the staged chain at the
    precision the resident kernel matches it."""
    from clip_tpu.ops.actquant_pallas import (
        mlp_lnq_pallas, mlp_lnq_stream_pallas, mlp_stream_fusable)

    h, f, rows = 128, 512, 52  # ragged rows
    assert mlp_stream_fusable(h, f)
    x = jnp.asarray(rng.normal(0, 1, (rows, h)), jnp.bfloat16)
    lnw = jnp.asarray(rng.normal(1, 0.05, h), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    up = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (f, h)), jnp.float32))
    dn = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (h, f)), jnp.float32))
    upb = jnp.asarray(rng.normal(0, 0.05, f), jnp.float32)
    dnb = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)

    # bf16 (production): bit-equal.  f32: the no-op astype lets the emit
    # epilogue FMA-contract differently between the two kernels — 1-ulp
    # drift tolerated (same class as test_block_mlp_full_matches_staged).
    for act in ("gelu_quick", "gelu_tanh"):
        for kw in (dict(), dict(dnb=dnb, residual=True)):
            for dt, exact_cmp in ((jnp.bfloat16, True), (jnp.float32, False)):
                ref = np.asarray(mlp_lnq_pallas(
                    x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws,
                    eps=EPS, act=act, interpret=INTERP, out_dtype=dt,
                    **kw), np.float32)
                got = np.asarray(mlp_lnq_stream_pallas(
                    x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws,
                    eps=EPS, act=act, interpret=INTERP, out_dtype=dt,
                    **kw), np.float32)
                if exact_cmp:
                    np.testing.assert_array_equal(got, ref)
                else:
                    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    # single-phase variant (exact=False): per-chunk scales — finer-grained
    # staging, tolerance-gated; with one chunk it degenerates to the exact
    # full-row scale and must be bit-equal
    one = np.asarray(mlp_lnq_stream_pallas(
        x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws, eps=EPS,
        interpret=INTERP, out_dtype=jnp.bfloat16, exact=False, n_chunks=1),
        np.float32)
    ref = np.asarray(mlp_lnq_pallas(
        x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws, eps=EPS,
        interpret=INTERP, out_dtype=jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(one, ref)
    four = np.asarray(mlp_lnq_stream_pallas(
        x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws, eps=EPS,
        interpret=INTERP, out_dtype=jnp.bfloat16, exact=False, n_chunks=4),
        np.float32)
    cos = (four.ravel() * ref.ravel()).sum() / (
        np.linalg.norm(four) * np.linalg.norm(ref) + 1e-30)
    assert cos > 0.9999, cos


def test_mlp_stream_blocking_invariance(rng):
    """Streamed whole-MLP outputs must be bit-equal across every
    (block_rows, n_chunks) choice — the full-row scale makes the chunking
    invisible to numerics."""
    from clip_tpu.ops.actquant_pallas import mlp_lnq_stream_pallas

    h, f, rows = 128, 512, 104
    x = jnp.asarray(rng.normal(0, 1, (rows, h)), jnp.bfloat16)
    lnw = jnp.asarray(rng.normal(1, 0.05, h), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    up = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (f, h)), jnp.float32))
    dn = to_w8tensor(jnp.asarray(rng.normal(0, 0.05, (h, f)), jnp.float32))
    upb = jnp.asarray(rng.normal(0, 0.05, f), jnp.float32)

    outs = [
        np.asarray(mlp_lnq_stream_pallas(
            x, lnw, lnb, up.c8, up.ws, upb, dn.c8, dn.ws, eps=EPS,
            block_rows=br, n_chunks=c, interpret=INTERP,
            out_dtype=jnp.float32))
        for br, c in ((48, 2), (104, 4), (32, 1))
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_block_mlp_stream_route(rng):
    """transformer.block must route H/14-class widths (resident budget
    exceeded) to the streamed kernel when mlp_stream is on, and the result
    must be bit-equal to the same block with the kernel disabled (staged
    chain) at bf16 — the stream kernel is a fusion, not an approximation."""
    from clip_tpu.ops.actquant_pallas import mlp_fusable, mlp_stream_fusable

    # production boundary: H/14 is stream-servable, nothing is left behind
    assert not mlp_fusable(1280, 5120)
    assert mlp_stream_fusable(1280, 5120)

    h, f = 128, 512
    lp = _layer_params(rng, h, f)
    for k in ("qkv_w", "o_w", "up_w", "down_w"):
        lp[k] = to_w8tensor(lp[k])
    x = jnp.asarray(rng.normal(0, 1, (2, 10, h)), jnp.bfloat16)
    kw = dict(n_head=4, eps=EPS, use_gelu=False,
              compute_dtype=jnp.bfloat16, attn_impl="xla", lnq_fuse=True,
              mlp_full=True)
    # force the resident kernel off so the router must pick the stream path
    import clip_tpu.models.transformer as tmod
    real = tmod.mlp_fusable
    tmod.mlp_fusable = lambda *a: False
    try:
        a = np.asarray(transformer.block(x, lp, mlp_stream=True, **kw),
                       np.float32)
        b = np.asarray(transformer.block(x, lp, mlp_stream=False, **kw),
                       np.float32)
    finally:
        tmod.mlp_fusable = real
    np.testing.assert_array_equal(a, b)
