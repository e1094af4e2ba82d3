"""``extract``: write raw (unnormalized) embeddings to .npy files.

Mirrors /root/reference/examples/extract.cpp: each --text / --image input
produces ``<input>.npy`` (texts are slug-named); normalize=false (:49,74) so
the vectors are directly comparable against HF outputs.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

from ..engine import ClipEngine
from .common import base_parser


def _slug(text: str, max_len: int = 64) -> str:
    return re.sub(r"[^A-Za-z0-9._-]+", "_", text)[:max_len].strip("_") or "text"


def main(argv=None) -> int:
    p = base_parser("clip-tpu-extract", __doc__)
    p.add_argument("-o", "--output-dir", default=".", help="directory for .npy files")
    args = p.parse_args(argv)
    if not args.text and not args.image:
        p.error("at least one --text or --image is required")

    engine = ClipEngine(args.model, verbosity=args.verbosity,
                        use_mesh=args.use_mesh, act_quant=args.act_quant,
                        lnq_fuse=args.lnq_fuse)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.text:
        vecs = engine.encode_text(list(args.text), normalize=False)
        for text, vec in zip(args.text, vecs):
            out = os.path.join(args.output_dir, _slug(text) + ".npy")
            np.save(out, vec)
            print(f"saved text embedding: {out}")

    if args.image:
        vecs = engine.encode_image(list(args.image), normalize=False)
        for path, vec in zip(args.image, vecs):
            base = os.path.splitext(os.path.basename(path))[0]
            out = os.path.join(args.output_dir, base + ".npy")
            np.save(out, vec)
            print(f"saved image embedding: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
