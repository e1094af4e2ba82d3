"""``benchmark``: ImageNet-style zero-shot classification benchmark.

Mirrors the reference protocol (/root/reference/tests/benchmark.cpp):

* dataset = directory of class-named subdirectories of images;
* each class *name* is encoded as text (normalized, no prompt templates —
  tests/README.md:15);
* images are batch-encoded (normalized); per image, similarities against all
  labels go through softmax_with_sorting; acc@1/acc@5 tracked per class;
* per class, only ``floor(n/batch) * batch`` images are scored (the reference
  drops the remainder, benchmark.cpp:103) unless ``--all-images`` is given;
* output: markdown table of per-class and macro-averaged acc@1/acc@5 plus
  ms/text and ms/image timings.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..engine import ClipEngine, softmax_with_sorting
from .common import base_parser, get_dir_keyed_files, prefetch_preprocessed


def main(argv=None) -> int:
    p = base_parser("clip-tpu-benchmark", __doc__, needs_text=False, needs_image=False)
    p.add_argument("dataset", nargs="?", default=None,
                   help="directory of class-named image directories")
    p.add_argument("--prepare-imagenet", metavar="DIR", default=None,
                   help="download + prepare the ImageNet-1k validation set "
                        "into DIR (requires network; ~7 GB), then benchmark "
                        "it — the one-command equivalent of the reference's "
                        "tests/prepare_imagenet1k.py + benchmark run")
    p.add_argument("-o", "--output", default=None, help="write results to file")
    p.add_argument("--all-images", action="store_true",
                   help="score remainder images too (reference drops them)")
    p.add_argument("--templates", default=None,
                   help="prompt-template ensembling: 'basic' (7 prompts), "
                        "'openai' (the 80 CLIP-paper prompts), or a custom "
                        "template containing {}. Default: none "
                        "(reference-protocol parity)")
    args = p.parse_args(argv)

    if args.prepare_imagenet:
        from ..datasets.imagenet import prepare_imagenet1k

        args.dataset = prepare_imagenet1k(args.prepare_imagenet, verbose=True)
    if args.dataset is None:
        p.error("a dataset directory (or --prepare-imagenet DIR) is required")

    fout = open(args.output, "w") if args.output else sys.stdout
    try:
        return _run(args, fout)
    finally:
        if fout is not sys.stdout:
            fout.close()


def _run(args, fout) -> int:
    classes = get_dir_keyed_files(args.dataset)
    n_labels = len(classes)
    fout.write(f"benchmark: {n_labels} directories found in {args.dataset}\n\n")
    if n_labels == 0:
        return 1

    engine = ClipEngine(args.model, verbosity=args.verbosity,
                        use_mesh=args.use_mesh, act_quant=args.act_quant,
                        lnq_fuse=args.lnq_fuse)
    labels = list(classes.keys())

    t0 = time.perf_counter()
    txt_vecs = engine.encode_class_names(labels, templates=args.templates)
    text_ms = (time.perf_counter() - t0) * 1000.0

    fout.write("| class name           | acc@1  | acc@5  |\n")
    fout.write("| -------------------- | ------ | ------ |\n")

    bs = max(args.batch_size, 1)
    total_acc1 = total_acc5 = 0.0
    n_total = 0
    skipped: list = []
    t0 = time.perf_counter()
    for label_idx, label in enumerate(labels):
        files = classes[label]
        if not args.all_images:
            files = files[: (len(files) // bs) * bs]
        n_items = n_acc1 = n_acc5 = 0
        chunks = [files[i:i + bs] for i in range(0, len(files), bs)]
        for _, pixels in prefetch_preprocessed(
            engine, chunks, n_workers=args.threads, skipped=skipped
        ):
            vecs = engine.encode_image(pixels, normalize=True)
            sims = vecs @ txt_vecs.T  # [b, n_labels]
            for row in sims:
                _, indices = softmax_with_sorting(row)
                top5 = indices[:5].tolist()
                if top5 and top5[0] == label_idx:
                    n_acc1 += 1
                if label_idx in top5:
                    n_acc5 += 1
                n_items += 1
                n_total += 1
        if n_items:
            acc1, acc5 = n_acc1 / n_items, n_acc5 / n_items
        else:
            acc1 = acc5 = 0.0
        total_acc1 += acc1
        total_acc5 += acc5
        fout.write(f"| {label:<20} | {acc1:2.4f} | {acc5:2.4f} |\n")
    image_ms = (time.perf_counter() - t0) * 1000.0

    fout.write(f"| {'total':<20} | {total_acc1/n_labels:2.4f} | {total_acc5/n_labels:2.4f} |\n\n")
    fout.write("# Timings\n")
    fout.write(f"- {n_labels} texts encoded in {text_ms:8.2f} ms "
               f"({text_ms/n_labels:8.2f} ms per text)\n")
    if n_total:
        fout.write(f"- {n_total} images encoded in {image_ms:8.2f} ms "
                   f"({image_ms/n_total:8.2f} ms per image)\n")
    if skipped:
        # surfaced in the report because skipped files shrink the per-class
        # accuracy denominator (the reference instead aborts on decode failure)
        fout.write(f"- WARNING: {len(skipped)} unreadable image(s) skipped; "
                   f"accuracy denominators exclude them\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
