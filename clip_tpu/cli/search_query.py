"""``search``: query a built image index with text or an image.

Mirrors /root/reference/examples/image-search/search.cpp: loads the persisted
index, checks it was built with the same model (paths-file line 1,
search.cpp:94-103), encodes the query, prints top-k (cosine distance, path).
"""

from __future__ import annotations

import sys

from ..engine import ClipEngine
from ..index import EmbeddingIndex
from .common import base_parser


def main(argv=None) -> int:
    p = base_parser("clip-tpu-search", __doc__)
    p.add_argument("--index", default="images", help="index prefix to load")
    p.add_argument("-k", "--top-k", type=int, default=5)
    args = p.parse_args(argv)
    if bool(args.text) == bool(args.image):
        p.error("provide exactly one of --text or --image as the query")

    index = EmbeddingIndex.load(args.index)
    if index.model_path and index.model_path != args.model:
        print(
            f"warning: index was built with model {index.model_path!r}, "
            f"querying with {args.model!r}",
            file=sys.stderr,
        )

    engine = ClipEngine(args.model, verbosity=args.verbosity,
                        use_mesh=args.use_mesh, act_quant=args.act_quant,
                        lnq_fuse=args.lnq_fuse)
    if args.text:
        query = engine.encode_text(args.text[0], normalize=True)
    else:
        query = engine.encode_image(args.image[0], normalize=True)

    for dist, path in index.search(query, k=args.top_k):
        print(f"{dist:.4f}  {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
