"""Drop-in compatibility class for clip.cpp's Python bindings.

The reference ships a ctypes ``Clip`` class
(/root/reference/examples/python_bindings/clip_cpp/clip.py:216-424); here the
same call surface wraps :class:`~clip_tpu.engine.ClipEngine` (no shared
libraries involved — the engine *is* Python/JAX).  Existing ``clip_cpp`` user
code should work after ``from clip_tpu.compat import Clip``.

Accepts a local GGUF path, a directory containing one, or an HF repo id
(downloaded via clip_tpu.hub, smallest .gguf by default, like the original).
``n_threads`` arguments are honored for host-side preprocessing; device
compute threading is XLA-managed.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Union

from .engine import ClipEngine, similarity_score, softmax_with_sorting
from .hub import (
    RepositoryFileNameNotFoundError,
    RepositoryNotFoundError,
    model_download,
)

__all__ = [
    "Clip",
    "RepositoryNotFoundError",
    "RepositoryFileNameNotFoundError",
]


def _dataclass_dict(obj) -> Dict[str, Any]:
    if obj is None:
        return {}
    return {k: getattr(obj, k) for k in obj.__dataclass_fields__}


class Clip:
    def __init__(
        self,
        model_path_or_repo_id: str,
        model_file: str | None = None,
        revision: str = "main",
        verbosity: int = 0,
        **engine_kwargs,
    ):
        path = self._resolve(model_path_or_repo_id, model_file, revision)
        self._engine = ClipEngine(path, verbosity=verbosity, **engine_kwargs)

    @staticmethod
    def _resolve(spec: str, model_file: str | None, revision: str) -> str:
        if os.path.isfile(spec):
            return spec
        if os.path.isdir(spec):
            ggufs = sorted(
                (os.path.join(spec, f) for f in os.listdir(spec) if f.endswith(".gguf")),
                key=os.path.getsize,
            )
            if model_file is not None:
                cand = os.path.join(spec, model_file)
                if not os.path.isfile(cand):
                    raise RepositoryFileNameNotFoundError(model_file)
                return cand
            if not ggufs:
                raise RepositoryFileNameNotFoundError(f"no .gguf files in {spec}")
            return ggufs[0]
        return model_download(spec, model_file, revision=revision)

    @property
    def engine(self) -> ClipEngine:
        return self._engine

    @property
    def vision_config(self) -> Dict[str, Any]:
        return _dataclass_dict(self._engine.config.vision)

    @property
    def text_config(self) -> Dict[str, Any]:
        return _dataclass_dict(self._engine.config.text)

    def tokenize(self, text: str) -> List[int]:
        return self._engine.tokenize(text)

    def encode_text(
        self,
        tokens: Union[str, List[int]],
        n_threads: int = os.cpu_count() or 1,
        normalize: bool = True,
    ) -> List[float]:
        return self._engine.encode_text(tokens, normalize=normalize).tolist()

    def load_preprocess_encode_image(
        self,
        image_path: str,
        n_threads: int = os.cpu_count() or 1,
        normalize: bool = True,
    ) -> List[float]:
        return self._engine.encode_image(image_path, normalize=normalize).tolist()

    def calculate_similarity(self, text_vec, image_vec) -> float:
        return similarity_score(text_vec, image_vec)

    def compare_text_and_image(
        self, text: str, image_path: str, n_threads: int = os.cpu_count() or 1
    ) -> float:
        return self._engine.compare_text_and_image(text, image_path)

    def zero_shot_label_image(
        self,
        image_path: str,
        labels: List[str],
        n_threads: int = os.cpu_count() or 1,
    ):
        scores, indices = self._engine.zero_shot_label_image(image_path, labels)
        return scores.tolist(), indices.tolist()


# parity aliases with the original exception names
softmax_with_sorting = softmax_with_sorting
