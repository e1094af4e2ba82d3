"""ImageNet-1k zero-shot benchmark dataset preparation.

Covers the reference's ``tests/prepare_imagenet1k.py``: fetch the ILSVRC2012
validation tars and the LAION CLIP_benchmark class names, apply the protocol
fixes (class names containing "/" become "or"; duplicate classes 744
"missiles"/n04356056 and 837 "sunglasses"/n04008634 are dropped), and reshape
into the benchmark layout ``dataset/<classname>/*.JPEG``.

Downloads go through urllib (no wget/torchvision dependency) and every input
can be supplied pre-downloaded for air-gapped environments — the driver host
here has zero egress, so the downloads are gated and the reshape logic is
fully testable offline.
"""

from __future__ import annotations

import json
import os
import shutil
import tarfile
import urllib.request
from pathlib import Path

DEVKIT_FILENAME = "ILSVRC2012_devkit_t12.tar.gz"
IMG_VAL_FILENAME = "ILSVRC2012_img_val.tar"
CLASSNAMES_FILENAME = "classnames.json"
CLASSTEMPLATES_FILENAME = "class_templates.json"
PROCESSED_DIR_NAME = "dataset"

IMAGENET_URL = "https://image-net.org/data/ILSVRC/2012/"
LAION_BASE = (
    "https://raw.githubusercontent.com/LAION-AI/CLIP_benchmark/main/"
    "clip_benchmark/datasets/"
)

#: wnids of the duplicate classes removed by the protocol (indices 744, 837).
SKIP_WNIDS = ("n04356056", "n04008634")
SKIP_INDICES = (744, 837)


def _fetch(url: str, dest: Path, verbose: bool) -> None:
    if dest.exists():
        return
    if verbose:
        print(f"downloading {url} -> {dest}")
    # atomic: an interrupted multi-GB download must not leave a truncated
    # file that a rerun mistakes for complete (same pattern as hub.py)
    part = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url) as resp, open(part, "wb") as f:
        shutil.copyfileobj(resp, f)
    os.replace(part, dest)


def fix_classnames(classnames: list[str]) -> list[str]:
    """Apply the protocol's name fixes: '/' -> 'or', drop duplicates."""
    return [
        c.replace("/", "or")
        for i, c in enumerate(classnames)
        if i not in SKIP_INDICES
    ]


def download_metadata(path: Path, verbose: bool = False) -> None:
    path.mkdir(parents=True, exist_ok=True)
    # fetch to a raw name, rewrite to the final name atomically: dying
    # between fetch and rewrite must not leave the unprocessed multi-dataset
    # JSON under the processed filename
    def _fetch_and_process(dest: Path, url: str, process) -> None:
        if dest.exists():
            return
        raw = dest.with_suffix(".raw.json")
        try:
            _fetch(url, raw, verbose)
            data = process(json.loads(raw.read_text()))
            tmp = dest.with_suffix(".tmp")
            tmp.write_text(json.dumps(data, indent=2))
            os.replace(tmp, dest)
        finally:
            # never leave a raw file behind: a stale one would be reused by
            # the exists() check on retries even after an upstream fix
            raw.unlink(missing_ok=True)

    _fetch_and_process(
        path / CLASSTEMPLATES_FILENAME,
        LAION_BASE + "en_zeroshot_classification_templates.json",
        lambda j: j["imagenet1k"])
    _fetch_and_process(
        path / CLASSNAMES_FILENAME,
        LAION_BASE + "en_classnames.json",
        lambda j: fix_classnames(j["imagenet1k"]))


def download_dataset(path: Path, verbose: bool = False) -> None:
    path.mkdir(parents=True, exist_ok=True)
    _fetch(IMAGENET_URL + DEVKIT_FILENAME, path / DEVKIT_FILENAME, verbose)
    _fetch(IMAGENET_URL + IMG_VAL_FILENAME, path / IMG_VAL_FILENAME, verbose)
    download_metadata(path, verbose)


def _val_wnids_from_devkit(path: Path) -> list[str]:
    """Per-image wnid labels for the 50k val images, from the devkit's
    ground-truth ids + meta (sorted by ILSVRC2012_ID like torchvision does)."""
    import scipy.io as sio

    with tarfile.open(path / DEVKIT_FILENAME, "r:gz") as tf:
        meta_f = tf.extractfile("ILSVRC2012_devkit_t12/data/meta.mat")
        meta = sio.loadmat(meta_f, squeeze_me=True)["synsets"]
        gt_f = tf.extractfile(
            "ILSVRC2012_devkit_t12/data/ILSVRC2012_validation_ground_truth.txt"
        )
        gt = [int(line) for line in gt_f.read().decode().split()]
    id_to_wnid = {int(row["ILSVRC2012_ID"]): str(row["WNID"]) for row in meta}
    return [id_to_wnid[i] for i in gt]


def sorted_class_wnids(path: Path) -> list[str]:
    """The 1000 wnids in torchvision's class order (sorted by wnid)."""
    wnids = sorted(set(_val_wnids_from_devkit(path)))
    if len(wnids) != 1000:
        raise RuntimeError(f"expected 1000 classes, found {len(wnids)}")
    return wnids


def parse_dataset(path: Path, verbose: bool = False) -> Path:
    """Unpack the val tar into ``dataset/<classname>/`` (protocol layout)."""
    path = Path(path)
    classes = json.loads((path / CLASSNAMES_FILENAME).read_text())
    out_dir = path / PROCESSED_DIR_NAME
    if out_dir.exists() and all((out_dir / c).exists() for c in classes):
        return out_dir
    out_dir.mkdir(exist_ok=True)

    val_wnids = _val_wnids_from_devkit(path)
    wnids = sorted(set(val_wnids))

    # class-index -> final class name (skipping the duplicate wnids)
    wnid_to_name: dict[str, str] = {}
    cls_index = 0
    for wnid in wnids:
        if wnid in SKIP_WNIDS:
            continue
        wnid_to_name[wnid] = classes[cls_index]
        cls_index += 1

    for name in wnid_to_name.values():
        (out_dir / name).mkdir(exist_ok=True)

    with tarfile.open(path / IMG_VAL_FILENAME) as tf:
        members = sorted(
            (m for m in tf.getmembers() if m.isfile()), key=lambda m: m.name
        )
        if len(members) != len(val_wnids):
            raise RuntimeError(
                f"val tar has {len(members)} files, devkit lists {len(val_wnids)}"
            )
        for member, wnid in zip(members, val_wnids):
            name = wnid_to_name.get(wnid)
            if name is None:
                continue  # dropped duplicate class
            src = tf.extractfile(member)
            dst = out_dir / name / os.path.basename(member.name)
            with open(dst, "wb") as f:
                shutil.copyfileobj(src, f)
            if verbose:
                print(f"  {member.name} -> {dst}")
    return out_dir


def prepare_imagenet1k(save_path: str, verbose: bool = False, download: bool = True) -> str:
    """Full pipeline; returns the benchmark-ready dataset directory."""
    path = Path(save_path).absolute()
    if download:
        download_dataset(path, verbose)
    else:
        download_metadata(path, verbose) if not (path / CLASSNAMES_FILENAME).exists() else None
    out = parse_dataset(path, verbose)
    if verbose:
        print(f"Dataset is ready at {out}")
    return str(out)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--save-path", required=True)
    p.add_argument("--no-download", action="store_true",
                   help="use pre-downloaded tars/metadata in save-path")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    prepare_imagenet1k(args.save_path, verbose=args.verbose, download=not args.no_download)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
