"""``quantize``: rewrite a GGUF checkpoint with block-quantized weights.

Mirrors /root/reference/models/quantize.cpp: positional input/output paths and
a type argument (integer codes 2=q4_0, 3=q4_1, 6=q5_0, 7=q5_1, 8=q8_0, or the
type name).
"""

from __future__ import annotations

import argparse
import sys

from ..quantize import quantize_model


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="clip-tpu-quantize", description=__doc__)
    p.add_argument("input", help="input GGUF (f32 or f16)")
    p.add_argument("output", help="output GGUF path")
    p.add_argument(
        "type",
        help="target type: 2|q4_0, 3|q4_1, 6|q5_0, 7|q5_1, 8|q8_0",
    )
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args(argv)

    itype = int(args.type) if args.type.isdigit() else args.type
    report = quantize_model(args.input, args.output, itype, verbose=not args.quiet)
    if args.quiet:
        print(report.summary())  # verbose mode already printed it
    print(f"done in {report.elapsed_s:.2f}s -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
