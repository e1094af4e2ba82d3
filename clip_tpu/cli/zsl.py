"""``zsl``: zero-shot image labeling.

Mirrors /root/reference/examples/zsl.cpp: >= 2 --text labels, one --image;
prints labels with sorted softmax scores (HF zero-shot-pipeline parity:
unnormalized embeddings, /root/reference/clip.cpp:1624-1659).
"""

from __future__ import annotations

import sys

from ..engine import ClipEngine
from .common import base_parser


def main(argv=None) -> int:
    p = base_parser("clip-tpu-zsl", __doc__)
    p.add_argument("--templates", default=None,
                   help="prompt-template ensembling: 'basic', 'openai', or a "
                        "custom template containing {}. Default: none "
                        "(reference/HF-pipeline parity)")
    args = p.parse_args(argv)
    if len(args.text) < 2 or len(args.image) != 1:
        p.error("at least two --text labels and exactly one --image are required")

    engine = ClipEngine(args.model, verbosity=args.verbosity,
                        use_mesh=args.use_mesh, act_quant=args.act_quant,
                        lnq_fuse=args.lnq_fuse)
    scores, indices = engine.zero_shot_label_image(
        args.image[0], args.text, templates=args.templates)
    for s, i in zip(scores, indices):
        print(f"{args.text[int(i)]}: {float(s):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
