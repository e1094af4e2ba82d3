"""Shared CLI plumbing: argument schema, class-keyed directory walker, image
extension filter.

Replaces the reference's app helpers (/root/reference/examples/common-clip.{h,cpp}):
``app_params`` + parser (common-clip.cpp:143-167), the recursive class-keyed
directory walker with a per-directory cap (:24-108), and the image-extension
filter (:110-141).  The reference's dependency-free .npy writer (:217-262) is
covered by ``numpy.save``.
"""

from __future__ import annotations

import argparse
import os
from collections import OrderedDict

IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".gif", ".tga", ".psd", ".pic", ".ppm", ".pgm"}


def is_image_file(name: str) -> bool:
    return os.path.splitext(name)[1].lower() in IMAGE_EXTENSIONS


def base_parser(prog: str, description: str, *, needs_text: bool = True,
                needs_image: bool = True) -> argparse.ArgumentParser:
    """Common flags, mirroring the reference CLI surface (-m/-t/--text/--image/-v)."""
    p = argparse.ArgumentParser(prog=prog, description=description)
    p.add_argument("-m", "--model", required=True, help="path to a GGUF model file")
    p.add_argument(
        "-t", "--threads", type=int, default=min(4, os.cpu_count() or 1),
        help="host threads for image preprocessing (device compute is XLA-managed)",
    )
    if needs_text:
        p.add_argument("--text", action="append", default=[], help="text input (repeatable)")
    if needs_image:
        p.add_argument("--image", action="append", default=[], help="image file (repeatable)")
    p.add_argument("-v", "--verbose", type=int, default=1, dest="verbosity",
                   help="verbosity 0-3")
    p.add_argument("-b", "--batch-size", type=int, default=4,
                   help="encode batch size")
    p.add_argument("--use-mesh", action="store_true",
                   help="use ALL local accelerator chips as a (data, model) "
                        "mesh (default: single chip); batches are "
                        "data-sharded and weights tensor-sharded via "
                        "jax.shard_map")
    p.add_argument("--no-act-quant", dest="act_quant", action="store_false",
                   default=None,
                   help="disable int8 activation-quantized compute for "
                        "quantized checkpoints (W8A8 is the TPU default: "
                        "~12%% faster; disable for exact dequant-path "
                        "numerics)")
    p.add_argument("--act-quant", dest="act_quant", action="store_true",
                   help="force int8 activation-quantized compute, including "
                        "for DENSE f16/f32 checkpoints (~1e-3 relative "
                        "weight error for the int8 MXU's dot rate)")
    p.add_argument("--no-lnq-fuse", dest="lnq_fuse", action="store_false",
                   default=None,
                   help="disable the fused Pallas LN/gelu->int8-quant "
                        "producers (on by default with W8A8 on TPU, +8.5%%; "
                        "disable to isolate the unfused W8A8 path)")
    return p


def get_dir_keyed_files(root: str, max_files_per_dir: int = 0) -> "OrderedDict[str, list[str]]":
    """Walk ``root`` recursively; return {relative-dir-key: [image files]}.

    Directory names key the classes (ImageNet-style dataset layout used by the
    benchmark and the image-search indexer).  ``max_files_per_dir`` == 0 means
    no cap.
    """
    out: "OrderedDict[str, list[str]]" = OrderedDict()
    root = os.path.normpath(root)
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        files = sorted(f for f in filenames if is_image_file(f))
        if not files:
            continue
        if max_files_per_dir > 0:
            files = files[:max_files_per_dir]
        key = os.path.relpath(dirpath, root)
        if key == ".":
            key = os.path.basename(root)
        out[key] = [os.path.join(dirpath, f) for f in files]
    return out


def prefetch_preprocessed(engine, path_chunks, n_workers: int = 4, skipped=None):
    """Yield ``(paths, pixels)`` per chunk with the NEXT chunk's load +
    preprocess overlapped with the caller's device work (one-step-ahead
    double buffering — the TPU-side analogue of the reference's pthread
    preprocessing, clip.cpp:963-1008, which overlaps nothing).

    Unreadable files are skipped (like an stbi decode failure in the
    reference); pass a list as ``skipped`` to collect their paths so callers
    can report the count (accuracy denominators shrink when files drop).
    """
    import sys
    from concurrent.futures import ThreadPoolExecutor

    def load(chunk):
        imgs, kept = [], []
        for path in chunk:
            try:
                imgs.append(engine.load_image(path))
                kept.append(path)
            except Exception as e:  # unreadable image: skip like stbi failure
                print(f"skipping {path}: {e}", file=sys.stderr)
                if skipped is not None:
                    skipped.append(path)
        if not imgs:
            return kept, None
        return kept, engine.preprocess(imgs, n_workers=n_workers)

    with ThreadPoolExecutor(1) as ex:
        fut = None
        for chunk in path_chunks:
            nxt = ex.submit(load, list(chunk))
            if fut is not None:
                kept, px = fut.result()
                if px is not None:
                    yield kept, px
            fut = nxt
        if fut is not None:
            kept, px = fut.result()
            if px is not None:
                yield kept, px
