"""Embedding index for semantic image search.

Replaces the reference's usearch HNSW index
(/root/reference/examples/image-search/build.cpp:80,141) with a TPU-native
brute-force top-k: at CLIP-search scale (<= millions of vectors) a single
batched matmul + ``lax.top_k`` on the device is exact, faster than an ANN
graph walk on CPU, and trivially shardable over the data axis.

Persistence mirrors the reference's two-file convention
(build.cpp:190-197, search.cpp:94-103): ``<prefix>.embd.npy`` holds the
embedding matrix; ``<prefix>.paths`` is a text file whose FIRST line is the
model path (compatibility check) followed by one image path per line.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["EmbeddingIndex"]


class EmbeddingIndex:
    def __init__(self, dim: int, model_path: str = ""):
        self.dim = int(dim)
        self.model_path = model_path
        self._vecs: list[np.ndarray] = []
        self.paths: list[str] = []
        self._matrix: np.ndarray | None = None
        self._device_matrix = None

    def __len__(self) -> int:
        return len(self.paths)

    def add(self, vecs: np.ndarray, paths: list[str]) -> None:
        vecs = np.asarray(vecs, np.float32).reshape(-1, self.dim)
        if vecs.shape[0] != len(paths):
            raise ValueError(f"{vecs.shape[0]} vectors but {len(paths)} paths")
        self._vecs.append(vecs)
        self.paths.extend(paths)
        self._matrix = None
        self._device_matrix = None

    @property
    def matrix(self) -> np.ndarray:
        if self._matrix is None:
            if self._vecs:
                self._matrix = np.concatenate(self._vecs, axis=0)
            else:
                self._matrix = np.zeros((0, self.dim), np.float32)
        return self._matrix

    # -- persistence -----------------------------------------------------------

    def save(self, prefix: str) -> tuple[str, str]:
        os.makedirs(os.path.dirname(os.path.abspath(prefix)) or ".", exist_ok=True)
        embd_path = prefix + ".embd.npy"
        paths_path = prefix + ".paths"
        np.save(embd_path, self.matrix)
        with open(paths_path, "w", encoding="utf-8") as f:
            f.write(self.model_path + "\n")
            for p in self.paths:
                f.write(p + "\n")
        return embd_path, paths_path

    @classmethod
    def load(cls, prefix: str) -> "EmbeddingIndex":
        mat = np.load(prefix + ".embd.npy")
        with open(prefix + ".paths", encoding="utf-8") as f:
            lines = f.read().splitlines()
        idx = cls(dim=mat.shape[1] if mat.ndim == 2 else 0, model_path=lines[0])
        if mat.size:
            idx.add(mat, lines[1:])
        return idx

    # -- search ----------------------------------------------------------------

    def search(self, query: np.ndarray, k: int = 5) -> list[tuple[float, str]]:
        """Exact top-k by cosine distance (1 - cos), ascending — the same
        ordering usearch's cos_gt metric produces in the reference CLI."""
        import jax
        import jax.numpy as jnp

        if len(self) == 0:
            return []
        k = min(k, len(self))
        if self._device_matrix is None:
            m = self.matrix
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            self._device_matrix = jax.device_put(m / norms)
        q = np.asarray(query, np.float32).reshape(self.dim)
        qn = np.linalg.norm(q)
        if qn > 0:
            q = q / qn
        sims = jnp.matmul(self._device_matrix, jax.device_put(q))
        top_sims, top_idx = jax.lax.top_k(sims, k)
        top_sims = np.asarray(top_sims, np.float32)
        top_idx = np.asarray(top_idx)
        return [(float(1.0 - s), self.paths[int(i)]) for s, i in zip(top_sims, top_idx)]
