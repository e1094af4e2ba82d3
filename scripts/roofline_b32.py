"""Roofline decomposition of the ViT-B/32 step (round-5 VERDICT item #2).

Splits the ~19 ms B=384 step into measured per-component costs (in-run,
slope-timed where applicable) and compares each against its theoretical
floor on this chip (measured rates: int8 MXU ~1830 TOP/s, bf16 ~260 TF/s,
HBM effective ~0.45 TB/s — docs/PERF_NOTES.md):

  attn_block kernel   slope over depth-2/14 chains at [19200, 768]
  mlp kernel          same
  full model          bench.py protocol step
  scaffolding         full - 12x(attn + mlp)  (patch embed, pos, pre/post
                      LN, pooling, projection, dispatch)

Run: python scripts/roofline_b32.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.engine import _convert_layers_to_w8
from clip_tpu.gguf import GGUFReader
from clip_tpu.models.config import ClipConfig
from clip_tpu.models.params import load_params
from clip_tpu.models.vision import encode_image
from clip_tpu.models import transformer
from clip_tpu.utils import enable_compile_cache
from clip_tpu.synth import make_synthetic_gguf

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
DEPTHS = (2, 14)
ITERS = 8
FULL_ITERS = 40
EPS = 1e-5

# measured chip rates (PERF_NOTES "Hardware note" + trace bandwidth)
INT8_TOPS = 1830e12
BF16_FLOPS = 260e12
HBM_BPS = 0.45e12


def slope(layer_fn, x0, name):
    def chain(d):
        def f(x):
            for _ in range(d):
                x = layer_fn(x)
            return x
        return jax.jit(f)

    fns = {d: chain(d) for d in DEPTHS}
    for d in DEPTHS:
        float(jnp.sum(fns[d](x0)))
    ts = {}
    for d in DEPTHS:
        best = []
        for _ in range(4):
            t0 = time.perf_counter()
            acc = [jnp.sum(fns[d](x0)) for _ in range(ITERS)]
            jax.block_until_ready(acc)
            best.append((time.perf_counter() - t0) / ITERS)
        ts[d] = min(best)
    per = (ts[DEPTHS[1]] - ts[DEPTHS[0]]) / (DEPTHS[1] - DEPTHS[0])
    print(f"{name:12s} {per * 1e3:7.4f} ms/layer", flush=True)
    return per


def measure_rtt():
    """Pure relay sync cost: readback of an already-materialized scalar.

    The axon relay charges ~25 ms per synchronous device->host round trip
    (measured round 5); any loop that forces once per ITERS inherits
    RTT/ITERS of phantom per-iter cost.  Measure it so the full-step number
    can amortize it away (slope estimates cancel it by construction)."""
    x = jax.device_put(jnp.ones((8, 8), jnp.float32))
    s = jnp.sum(x)
    float(s)
    ts = []
    for _ in range(5):
        s = jnp.sum(x) + 0.0
        t0 = time.perf_counter()
        float(s)
        ts.append(time.perf_counter() - t0)
    # s was dispatched just before the timer: the force pays one full RTT
    rtt = min(ts)
    print(f"relay sync RTT ~{rtt * 1e3:.1f} ms (amortized over "
          f"{FULL_ITERS} full-step iters)", flush=True)
    return rtt


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={BATCH}", flush=True)
    rtt = measure_rtt()
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    path = os.path.join(cache, "bench_vit-b-32_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, "ViT-B/32", ftype="q4_0", towers="vision")
    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    pw8 = _convert_layers_to_w8(
        load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16))
    params = jax.device_put(pw8["vision"])
    lp0 = jax.tree.map(lambda a: a[0], params["layers"])

    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    S, H = 50, cfg.vision.hidden_size
    n4h = cfg.vision.n_intermediate
    nh = cfg.vision.n_head
    rows = BATCH * S

    pixels = jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, size, size, 3)), jnp.bfloat16))
    x0 = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (BATCH, S, H)), jnp.bfloat16))

    # full model step
    fn = jax.jit(lambda p, px: encode_image(
        p, cfg.vision, px, use_gelu=cfg.use_gelu, normalize=True,
        compute_dtype=jnp.bfloat16, lnq_fuse=True))
    float(jnp.sum(fn(params, pixels)))
    best = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(FULL_ITERS):
            out = fn(params, pixels)
        float(jnp.sum(out))
        best.append((time.perf_counter() - t0) / FULL_ITERS)
    full = min(best) - rtt / FULL_ITERS
    print(f"full step    {full * 1e3:7.3f} ms  ({BATCH / full:.0f} img/s) "
          f"[RTT-corrected]", flush=True)

    def attn_layer(x):
        return transformer.attention(
            x, lp0, n_head=nh, causal=False, compute_dtype=jnp.bfloat16,
            attn_impl="pallas", ln=(lp0["ln1_w"], lp0["ln1_b"], EPS),
            lnq_fuse=True, add_residual=True)

    def mlp_layer(x):
        b, s, h = x.shape
        from clip_tpu.ops.actquant_pallas import mlp_lnq_pallas
        return mlp_lnq_pallas(
            x.reshape(b * s, h), lp0["ln2_w"], lp0["ln2_b"],
            lp0["up_w"].c8, lp0["up_w"].ws, lp0["up_b"],
            lp0["down_w"].c8, lp0["down_w"].ws, lp0["down_b"],
            eps=EPS, act="gelu_quick", residual=True).reshape(b, s, h)

    ta = slope(attn_layer, x0, "attn_block")
    tm = slope(mlp_layer, x0, "mlp_block")
    n_layer = cfg.vision.n_layer
    scaf = full - n_layer * (ta + tm)
    print(f"scaffolding  {scaf * 1e3:7.3f} ms "
          f"(= full - {n_layer}x(attn+mlp))", flush=True)

    # ---- theoretical floors per layer ----
    b_elt = 2  # bf16
    attn_gemm_int8 = rows * H * (3 * H) * 2 + rows * H * H * 2
    mlp_gemm_int8 = rows * H * n4h * 2 * 2
    attn_bf16 = 4 * rows * (4 * S) * H        # bb=4 block-diag score+mix
    attn_hbm = 2 * rows * H * b_elt + (3 * H * H + H * H)
    mlp_hbm = 2 * rows * H * b_elt + (2 * n4h * H)
    exp_per_layer = rows * 4 * S * nh          # block-diag waste included
    gelu_per_layer = rows * n4h

    def ms(x):
        return x * 1e3

    print("\n-- theoretical per-layer floors (ms) --")
    print(f"attn int8 GEMMs {ms(attn_gemm_int8 / INT8_TOPS):7.4f}   "
          f"attn bf16 score/mix {ms(attn_bf16 / BF16_FLOPS):7.4f}   "
          f"attn HBM {ms(attn_hbm / HBM_BPS):7.4f}")
    print(f"mlp  int8 GEMMs {ms(mlp_gemm_int8 / INT8_TOPS):7.4f}   "
          f"mlp HBM {ms(mlp_hbm / HBM_BPS):7.4f}")
    print(f"transcendentals/layer: exp {exp_per_layer / 1e6:.1f}M "
          f"(4x block-diag waste) + gelu-logistic {gelu_per_layer / 1e6:.1f}M")
    print(f"\nmeasured attn {ms(ta):.3f} vs floor "
          f"{ms(max(attn_gemm_int8 / INT8_TOPS + attn_bf16 / BF16_FLOPS, attn_hbm / HBM_BPS)):.3f}; "
          f"mlp {ms(tm):.3f} vs floor "
          f"{ms(max(mlp_gemm_int8 / INT8_TOPS, mlp_hbm / HBM_BPS)):.3f}")


if __name__ == "__main__":
    main()
