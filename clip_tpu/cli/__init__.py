"""clip_tpu command-line apps.

One multiplexer (``python -m clip_tpu.cli <command>``) covering every CLI the
reference ships (SURVEY.md §2 #16-21, #23; models/quantize.cpp; converter):

========== ==========================================================
main        one text vs one image similarity (+ timings)
simple      minimal explicit pipeline demo
zsl         zero-shot labeling with >= 2 labels
extract     embeddings -> .npy files
quantize    f16/f32 GGUF -> q4_0/q4_1/q5_0/q5_1/q8_0
convert     HF checkpoint directory -> GGUF
search-build / search   semantic image search index / query
benchmark   ImageNet-style zero-shot accuracy + throughput
models      HF Hub GGUF listing/downloading
serve       continuous-batching embedding server
========== ==========================================================
"""

from __future__ import annotations

import sys

_COMMANDS = {
    "main": ("clip_tpu.cli.main", "one text vs one image similarity"),
    "simple": ("clip_tpu.cli.simple", "minimal pipeline demo"),
    "zsl": ("clip_tpu.cli.zsl", "zero-shot image labeling"),
    "extract": ("clip_tpu.cli.extract", "write embeddings to .npy"),
    "quantize": ("clip_tpu.cli.quantize_cli", "quantize a GGUF checkpoint"),
    "convert": ("clip_tpu.cli.convert_cli", "convert an HF checkpoint to GGUF"),
    "search-build": ("clip_tpu.cli.search_build", "build an image-search index"),
    "search": ("clip_tpu.cli.search_query", "query an image-search index"),
    "benchmark": ("clip_tpu.cli.benchmark", "zero-shot benchmark"),
    "models": ("clip_tpu.cli.models_cli", "HF Hub model download"),
    "serve": ("clip_tpu.cli.serve", "continuous-batching embedding server"),
}


def dispatch(argv=None) -> int:
    import importlib
    import os

    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m clip_tpu.cli <command> [args]\n\ncommands:")
        for name, (_, desc) in _COMMANDS.items():
            print(f"  {name:<14} {desc}")
        return 0
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}; try --help", file=sys.stderr)
        return 2
    mod = importlib.import_module(_COMMANDS[cmd][0])
    try:
        return mod.main(argv[1:])
    except (ValueError, FileNotFoundError, IsADirectoryError) as e:
        # expected user errors (bad model file, bad flag value, missing path):
        # one clean line, no traceback — mirrors the reference CLIs' behavior.
        # CLIP_TPU_DEBUG=1 re-raises so internal bugs that also raise
        # ValueError (shape errors etc.) keep their traceback.
        if os.environ.get("CLIP_TPU_DEBUG"):
            raise
        print(f"error: {e}", file=sys.stderr)
        return 1


def run() -> None:
    """console_scripts entry point."""
    raise SystemExit(dispatch())
