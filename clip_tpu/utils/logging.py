"""Verbosity-gated structured logging.

Mirrors the reference's integer-verbosity printf convention
(/root/reference/clip.cpp:345-376: 0 = silent, 1 = info, 2 = hparams detail,
3 = per-tensor debug) with a real logger underneath.
"""

from __future__ import annotations

import logging
import sys

_logger = logging.getLogger("clip_tpu")
if not _logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("%(name)s: %(message)s"))
    _logger.addHandler(h)
    _logger.setLevel(logging.INFO)


def log(verbosity: int, level: int, msg: str, *args) -> None:
    """Emit ``msg`` if the configured ``verbosity`` is >= ``level``."""
    if verbosity >= level:
        _logger.info(msg, *args)
