"""``models``: list/download GGUF CLIP checkpoints from the HF Hub.

Replaces the reference's ``clip-cpp-models`` console script
(/root/reference/examples/python_bindings/pyproject.toml scripts +
file_download.py CLI behavior).
"""

from __future__ import annotations

import argparse
import sys

from .. import hub


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="clip-tpu-models", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("known", help="print known GGUF CLIP repos")

    p_ls = sub.add_parser("list", help="list .gguf files in a repo")
    p_ls.add_argument("repo_id")

    p_dl = sub.add_parser("download", help="download a .gguf (smallest by default)")
    p_dl.add_argument("repo_id")
    p_dl.add_argument("-f", "--file-name", default=None)
    p_dl.add_argument("--cache-dir", default=hub.DEFAULT_CACHE_DIR)
    p_dl.add_argument("--force", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "known":
        for r in hub.KNOWN_REPOS:
            print(r)
        return 0
    if args.cmd == "list":
        info = hub.model_info(args.repo_id)
        for f in info.gguf_files:
            size = f"{f.size/2**20:9.1f} MB" if f.size else "       ?"
            print(f"{size}  {f.rfilename}")
        return 0
    if args.cmd == "download":
        path = hub.model_download(
            args.repo_id, args.file_name, cache_dir=args.cache_dir, force=args.force
        )
        print(path)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
