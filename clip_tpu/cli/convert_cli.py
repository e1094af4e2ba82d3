"""``convert``: HF Transformers CLIP checkpoint directory -> GGUF.

Mirrors the reference converter CLI
(/root/reference/models/convert_hf_to_gguf.py:63-76): --model-dir, --use-f32,
--text-only/--vision-only, --image-mean/--image-std overrides, --output-dir.
"""

from __future__ import annotations

import argparse
import sys

from ..convert import convert_hf_dir


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="clip-tpu-convert", description=__doc__)
    p.add_argument("-m", "--model-dir", required=True,
                   help="HF model directory (config.json + vocab.json + weights)")
    p.add_argument("--use-f32", action="store_true", help="store weights as f32 instead of f16")
    p.add_argument("--text-only", action="store_true")
    p.add_argument("--vision-only", action="store_true")
    p.add_argument("--image-mean", nargs=3, type=float)
    p.add_argument("--image-std", nargs=3, type=float)
    p.add_argument("-o", "--output-dir", default=None)
    args = p.parse_args(argv)

    if args.text_only and args.vision_only:
        p.error("--text-only and --vision-only are mutually exclusive")

    out = convert_hf_dir(
        args.model_dir,
        args.output_dir,
        text_only=args.text_only,
        vision_only=args.vision_only,
        use_f32=args.use_f32,
        image_mean=args.image_mean,
        image_std=args.image_std,
    )
    print(f"Done. Output file: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
