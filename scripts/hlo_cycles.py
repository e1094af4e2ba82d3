"""Mine the TPU compiler's per-op estimated_cycles from optimized HLO.

Round-2's step-breakdown methodology, committed as a tool: jit the
production vision-encode program (W8A8 default, scan config), compile it
for the attached TPU, and aggregate the backend's ``estimated_cycles``
annotations by fusion kind — the compiler's own attribution of where the
step goes, with no tracer overhead.  This is how the 12x qkv relayout
copies (round 2) were found.

Run: python scripts/hlo_cycles.py [--batch 448] [--variant ViT-B/32]
     [--dense] [--no-w8] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CYCLES = re.compile(r'"estimated_cycles":\s*"?(\d+)"?')
_NAME = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=")


def classify(name: str, line: str) -> str:
    """Bucket an HLO op by what it is doing (names follow XLA conventions)."""
    if "custom-call" in line:
        if "mosaic" in line or "tpu_custom_call" in line:
            return "pallas kernel"
        return "custom-call"
    for tag in ("convolution", "dot", "fusion", "copy", "pad", "transpose",
                "reduce", "convert", "broadcast", "reshape", "bitcast",
                "all-reduce", "dynamic-slice", "scatter", "iota", "select",
                "concatenate", "slice"):
        if re.search(rf"= [\w\[\],{{}}<>\s]* {tag}", line) or f" {tag}(" in line:
            base = tag
            break
    else:
        base = "other"
    # fusion kinds carry the real meaning: pull the fused computation name
    m = re.search(r"calls=%?([\w.\-]+)", line)
    if base == "fusion" and m:
        stem = re.sub(r"[\d.]+$", "", m.group(1))
        return f"fusion:{stem}"
    stem = re.sub(r"[\d.]+$", "", name)
    return f"{base}:{stem}" if base in ("copy", "pad", "custom-call") else base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=448)
    ap.add_argument("--variant", default="ViT-B/32")
    ap.add_argument("--ftype", default="q4_0")
    ap.add_argument("--no-w8", action="store_true",
                    help="bf16 dequant path instead of W8A8")
    ap.add_argument("--dense", action="store_true", help="dense bf16 weights")
    ap.add_argument("--unroll", action="store_true")
    ap.add_argument("--no-lnq", action="store_true",
                    help="disable the fused LN/gelu->quant producers")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--clock-ghz", type=float, default=0.94,
                    help="chip clock for the ms column (v6e-class ~0.94)")
    ap.add_argument("--dump", default=None, help="also write HLO text here")
    args = ap.parse_args()

    from clip_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_tpu.engine import _convert_layers_to_w8
    from clip_tpu.gguf import GGUFReader
    from clip_tpu.models.config import ClipConfig
    from clip_tpu.models.params import load_params
    from clip_tpu.models.vision import encode_image
    from clip_tpu.synth import make_synthetic_gguf

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    tag = args.variant.replace("/", "-").replace("ViT", "vit").lower()
    path = os.path.join(cache, f"bench_{tag}_{args.ftype}_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, args.variant, ftype=args.ftype, towers="vision")

    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    params = load_params(reader, cfg, keep_quantized=not args.dense,
                         dtype=jnp.bfloat16)
    if not (args.no_w8 or args.dense):
        params = _convert_layers_to_w8(params)
    params = jax.device_put(params["vision"])

    fn = functools.partial(encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu,
                           normalize=True, compute_dtype=jnp.bfloat16,
                           unroll=args.unroll,
                           lnq_fuse=not (args.no_lnq or args.no_w8 or args.dense)
                           and jax.default_backend() == "tpu")
    px = jnp.zeros((args.batch, cfg.vision.image_size, cfg.vision.image_size, 3),
                   jnp.bfloat16)
    print(f"compiling {args.variant} B={args.batch} "
          f"({'dense' if args.dense else 'bf16-dequant' if args.no_w8 else 'W8A8'}, "
          f"{'unroll' if args.unroll else 'scan'}) on {jax.default_backend()} ...",
          flush=True)
    hlo = jax.jit(fn).lower(params, pixels=px).compile().as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    by_kind: dict[str, int] = collections.defaultdict(int)
    counts: dict[str, int] = collections.defaultdict(int)
    total = 0
    for line in hlo.splitlines():
        m = _CYCLES.search(line)
        if not m:
            continue
        cyc = int(m.group(1))
        nm = _NAME.match(line)
        kind = classify(nm.group(1) if nm else "?", line)
        by_kind[kind] += cyc
        counts[kind] += 1
        total += cyc
    if total == 0:
        print("no estimated_cycles annotations found (CPU backend? "
              "pass-through HLO?) — dump with --dump and inspect", flush=True)
        return

    # NOTE: scan bodies are annotated once but execute n_layer times; the
    # while-loop op itself carries the full trip-count estimate when the
    # backend provides one.  Treat per-kind shares as attribution, compare
    # absolute ms only under --unroll.
    ms_total = total / (args.clock_ghz * 1e9) * 1e3
    print(f"\ntotal estimated: {total:,} cycles ≈ {ms_total:.2f} ms "
          f"@ {args.clock_ghz} GHz")
    print(f"{'kind':<44} {'cycles':>14} {'%':>6} {'count':>6} {'~ms':>8}")
    for kind, cyc in sorted(by_kind.items(), key=lambda kv: -kv[1])[: args.top]:
        ms = cyc / (args.clock_ghz * 1e9) * 1e3
        print(f"{kind:<44} {cyc:>14,} {100*cyc/total:>5.1f} "
              f"{counts[kind]:>6} {ms:>8.3f}")


if __name__ == "__main__":
    main()
