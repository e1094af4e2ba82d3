"""``simple``: the minimal end-to-end pipeline demo.

Mirrors /root/reference/examples/simple.c — tokenize, preprocess, encode both
modalities explicitly, then score — exercising each public API step in turn.
"""

from __future__ import annotations

import sys

from ..engine import ClipEngine, similarity_score
from .common import base_parser


def main(argv=None) -> int:
    p = base_parser("clip-tpu-simple", __doc__)
    args = p.parse_args(argv)
    if len(args.text) != 1 or len(args.image) != 1:
        p.error("exactly one --text and one --image are required")

    engine = ClipEngine(args.model, verbosity=args.verbosity,
                        use_mesh=args.use_mesh, act_quant=args.act_quant,
                        lnq_fuse=args.lnq_fuse)

    tokens = engine.tokenize(args.text[0])
    print(f"tokens: {tokens}")

    txt_vec = engine.encode_text(tokens, normalize=True)
    img = engine.load_image(args.image[0])
    pixels = engine.preprocess([img])
    img_vec = engine.encode_image(pixels, normalize=True)[0]

    print(f"similarity = {similarity_score(txt_vec, img_vec):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
