"""``main``: one text vs one image similarity with stage timings.

Mirrors /root/reference/examples/main.cpp (model-load / image-load /
similarity wall-clock printfs at :49-55).
"""

from __future__ import annotations

import sys
import time

from ..engine import ClipEngine
from .common import base_parser


def main(argv=None) -> int:
    p = base_parser("clip-tpu-main", __doc__)
    args = p.parse_args(argv)
    if len(args.text) != 1 or len(args.image) != 1:
        p.error("exactly one --text and one --image are required")

    t0 = time.perf_counter()
    engine = ClipEngine(args.model, verbosity=args.verbosity,
                        use_mesh=args.use_mesh, act_quant=args.act_quant,
                        lnq_fuse=args.lnq_fuse)
    t_load = time.perf_counter() - t0

    t0 = time.perf_counter()
    img = engine.load_image(args.image[0])
    t_img = time.perf_counter() - t0

    t0 = time.perf_counter()
    score = engine.compare_text_and_image(args.text[0], img)
    t_sim = time.perf_counter() - t0

    print(f"similarity score = {score:.4f}")
    print(f"model load: {t_load*1000:.2f} ms")
    print(f"image load: {t_img*1000:.2f} ms")
    print(f"similarity (tokenize+preprocess+encode x2, incl. compile): {t_sim*1000:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
