"""``search-build``: index a directory tree of images for semantic search.

Mirrors /root/reference/examples/image-search/build.cpp: recursive walk,
batched preprocess+encode (normalized embeddings), persisted index keyed to
the model path.  usearch HNSW is replaced by an exact on-device top-k
(see clip_tpu.index).
"""

from __future__ import annotations

import sys
import time

from ..engine import ClipEngine
from ..index import EmbeddingIndex
from .common import base_parser, get_dir_keyed_files, prefetch_preprocessed


def main(argv=None) -> int:
    p = base_parser("clip-tpu-search-build", __doc__, needs_text=False, needs_image=False)
    p.add_argument("dirs", nargs="+", help="director(ies) of images to index")
    p.add_argument("--index", default="images", help="output index prefix")
    p.add_argument("--max-files-per-dir", type=int, default=0)
    args = p.parse_args(argv)

    engine = ClipEngine(args.model, verbosity=args.verbosity,
                        use_mesh=args.use_mesh, act_quant=args.act_quant,
                        lnq_fuse=args.lnq_fuse)
    index = EmbeddingIndex(engine.projection_dim, model_path=args.model)

    all_paths: list[str] = []
    for d in args.dirs:
        for _, files in get_dir_keyed_files(d, args.max_files_per_dir).items():
            all_paths.extend(files)
    print(f"indexing {len(all_paths)} images ...")

    t0 = time.perf_counter()
    bs = max(args.batch_size, 1)
    done = 0
    chunks = [all_paths[i:i + bs] for i in range(0, len(all_paths), bs)]
    for kept, pixels in prefetch_preprocessed(engine, chunks, n_workers=args.threads):
        vecs = engine.encode_image(pixels, normalize=True)
        index.add(vecs, kept)
        done += len(kept)
        print(f"  {done}/{len(all_paths)}", end="\r", flush=True)

    embd_path, paths_path = index.save(args.index)
    dt = time.perf_counter() - t0
    print(f"\nindexed {len(index)} images in {dt:.1f}s "
          f"({len(index)/max(dt,1e-9):.1f} img/s) -> {embd_path}, {paths_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
