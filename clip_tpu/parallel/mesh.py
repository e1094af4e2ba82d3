"""Device mesh + sharding rules for multi-chip / multi-host inference.

The reference is single-process CPU; its only parallelism is a pthread pool
(SURVEY.md §2.2).  Here scaling is first-class: a 2-D ``(data, model)``
:class:`jax.sharding.Mesh` over ICI/DCN, with

* **data parallelism** — the encode batch is sharded over ``data``;
* **tensor parallelism** — attention QKV / MLP-up weights are sharded over
  output features ("column parallel"), attention-out / MLP-down weights over
  input features ("row parallel"), so XLA SPMD inserts one reduce-scatter /
  all-gather pair per block and overlaps it with compute.

Quantized weights shard cleanly because the 32-element quantization blocks
live along the contraction (K) axis: a K-shard of ``K/n_model`` elements is a
whole number of blocks whenever ``K % (32 * n_model) == 0`` (checked at
sharding time), and the packed-nibble (K/2) and scale (K/32) arrays divide by
the same factor.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.qtensor import QTensor

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh.  Defaults to all visible devices on the
    data axis (pure DP) — the right default for CLIP-scale models, where a
    single chip fits even ViT-H comfortably."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# Column-parallel (shard output features) / row-parallel (shard contraction).
_COL_PARALLEL = {"qkv_w", "up_w"}
_ROW_PARALLEL = {"o_w", "down_w"}
_COL_BIAS = {"qkv_b", "up_b"}


def _leaf_spec(path: tuple[str, ...], leaf: Any, n_model: int) -> P:
    """PartitionSpec for a parameter leaf, keyed by its pytree path."""
    name = path[-1]
    in_layers = "layers" in path
    if n_model > 1 and in_layers:
        if name in _COL_PARALLEL:
            return P(None, MODEL_AXIS, None)       # [L, N, K*] shard N
        if name in _ROW_PARALLEL:
            return P(None, None, MODEL_AXIS)       # [L, N, K*] shard K
        if name in _COL_BIAS:
            return P(None, MODEL_AXIS)             # [L, N]
    return P()  # replicate embeddings, norms, projections, biases


def param_specs(params: Any, n_model: int) -> Any:
    """PartitionSpec pytree matching ``params`` (QTensor-aware: children of a
    QTensor share the parent's spec since N/K axes align across q/d/m)."""

    def walk(node: Any, path: tuple[str, ...]) -> Any:
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, QTensor):
            spec = _leaf_spec(path, node, n_model)
            mspec = None if node.m is None else spec
            return QTensor(q=spec, d=spec, m=mspec, qtype=node.qtype)
        return _leaf_spec(path, node, n_model)

    return walk(params, ())


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put the parameter pytree with TP/replication shardings."""
    n_model = mesh.shape[MODEL_AXIS]
    specs = param_specs(params, n_model)
    return _shard_tree(params, specs, mesh)


def _divisible(arr, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(arr.shape, spec):
        if axis is not None and dim % mesh.shape[axis] != 0:
            return False
    return True


def _put(arr, spec: P, mesh: Mesh):
    """device_put with a replication fallback when a dimension doesn't divide
    the mesh axis (e.g. tiny test models, or K/32 scale columns narrower than
    the model axis)."""
    if arr is None:
        return None
    if not _divisible(arr, spec, mesh):
        spec = P()
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _shard_tree(params, specs, mesh):
    if isinstance(params, dict):
        return {k: _shard_tree(params[k], specs[k], mesh) for k in params}
    if isinstance(params, QTensor):
        # all-or-nothing: q/d/m must shard consistently or dequant misaligns
        ok = _divisible(params.q, specs.q, mesh) and _divisible(params.d, specs.d, mesh)
        if params.m is not None:
            ok = ok and _divisible(params.m, specs.m, mesh)
        qs, ds, ms = (specs.q, specs.d, specs.m) if ok else (P(), P(), P())
        return QTensor(
            q=_put(params.q, qs, mesh),
            d=_put(params.d, ds, mesh),
            m=None if params.m is None else _put(params.m, ms, mesh),
            qtype=params.qtype,
        )
    return _put(params, specs, mesh)


def shard_batch(x, mesh: Mesh):
    """Shard a host array's leading (batch) axis over the data axis."""
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
