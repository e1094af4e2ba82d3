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

from ..ops.qtensor import QTensor, W8Tensor

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
            hspec = None if node.hb is None else spec
            return QTensor(q=spec, d=spec, m=mspec, qtype=node.qtype, hb=hspec)
        if isinstance(node, W8Tensor):
            # c8 [L, N, K] shards like a dense weight; ws [L, N] drops the
            # K entry (sharded-K leaves the per-channel scales replicated);
            # the hybrid's packed source shards exactly like a bare QTensor
            spec = _leaf_spec(path, node, n_model)
            wspec = P(*tuple(spec)[:2]) if len(tuple(spec)) >= 2 else P()
            qtspec = None if node.qt is None else walk(node.qt, path)
            return W8Tensor(c8=spec, ws=wspec, qtype=node.qtype, qt=qtspec)
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
        # all-or-nothing: q/d/m/hb must shard consistently or dequant misaligns
        ok = _divisible(params.q, specs.q, mesh) and _divisible(params.d, specs.d, mesh)
        if params.m is not None:
            ok = ok and _divisible(params.m, specs.m, mesh)
        if params.hb is not None:
            ok = ok and _divisible(params.hb, specs.hb, mesh)
        qs, ds, ms, hs = (
            (specs.q, specs.d, specs.m, specs.hb) if ok else (P(), P(), P(), P())
        )
        return QTensor(
            q=_put(params.q, qs, mesh),
            d=_put(params.d, ds, mesh),
            m=None if params.m is None else _put(params.m, ms, mesh),
            qtype=params.qtype,
            hb=None if params.hb is None else _put(params.hb, hs, mesh),
        )
    if isinstance(params, W8Tensor):
        ok = (_divisible(params.c8, specs.c8, mesh)
              and _divisible(params.ws, specs.ws, mesh))
        cs, ws_ = (specs.c8, specs.ws) if ok else (P(), P())
        return W8Tensor(
            c8=_put(params.c8, cs, mesh),
            ws=_put(params.ws, ws_, mesh), qtype=params.qtype,
            qt=None if params.qt is None else _shard_tree(
                params.qt, specs.qt, mesh))
    return _put(params, specs, mesh)


def shard_batch(x, mesh: Mesh):
    """Shard a host array's leading (batch) axis over the data axis."""
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


# -- shard_map (per-shard SPMD) support ---------------------------------------
#
# pjit/SPMD cannot partition Pallas custom calls, so the mesh path would lose
# the fused attention/qmatmul kernels (the single-chip perf wins).  Under
# ``jax.shard_map`` every shard runs ordinary single-device code — Pallas
# included — with explicit collectives (one psum per attention-out / MLP-down
# row-parallel projection, the Megatron inference pattern).


def qkv_head_permutation(h: int, n_model: int) -> np.ndarray:
    """Row permutation of the fused [3H, K] QKV weight so that a contiguous
    N-shard holds exactly this shard's heads in local ``[q; k; v]`` layout.

    Global layout is ``[Q(0..H); K(0..H); V(0..H)]`` (head-major inside each).
    Contiguous sharding of that layout splits mid-projection (e.g. 2 shards:
    shard 0 = all of Q + half of K — useless).  After permutation, shard ``i``
    holds ``[Q_i; K_i; V_i]`` where ``_i`` is its contiguous slice of heads.
    """
    hl = h // n_model
    idx = []
    for i in range(n_model):
        for t in range(3):
            idx.extend(range(t * h + i * hl, t * h + (i + 1) * hl))
    return np.asarray(idx, dtype=np.int64)


def _permute_rows(w, idx):
    """Permute the N (output-feature) axis of a layer-stacked weight
    ([L, N, ...] — axis 1) or bias ([L, N])."""
    if isinstance(w, QTensor):
        return QTensor(
            q=np.asarray(w.q)[:, idx],
            d=np.asarray(w.d)[:, idx],
            m=None if w.m is None else np.asarray(w.m)[:, idx],
            qtype=w.qtype,
            hb=None if w.hb is None else np.asarray(w.hb)[:, idx],
        )
    if isinstance(w, W8Tensor):
        return W8Tensor(c8=np.asarray(w.c8)[:, idx], ws=np.asarray(w.ws)[:, idx],
                        qtype=w.qtype,
                        qt=None if w.qt is None else _permute_rows(w.qt, idx))
    return np.asarray(w)[:, idx]


def permute_qkv_params(params: Any, n_model: int) -> Any:
    """Apply :func:`qkv_head_permutation` to every tower's fused QKV weight
    and bias (host-side, before sharding).  Only valid together with the
    shard_map TP path — the permuted layout is consumed by
    ``models.transformer.attention`` with ``tp_axis`` set."""
    if n_model <= 1:
        return params
    out = dict(params)
    for tower in ("text", "vision"):
        if tower not in out or "layers" not in out[tower]:
            continue
        layers = dict(out[tower]["layers"])
        h3 = layers["qkv_w"].shape[1]
        idx = qkv_head_permutation(h3 // 3, n_model)
        layers["qkv_w"] = _permute_rows(layers["qkv_w"], idx)
        layers["qkv_b"] = _permute_rows(layers["qkv_b"], idx)
        t = dict(out[tower])
        t["layers"] = layers
        out[tower] = t
    return out


def spmd_compatible(params: Any, mesh: Mesh, n_heads: dict) -> bool:
    """True if every TP-sharded leaf divides the model axis exactly (no
    replication fallback possible — shard_map in_specs are strict) and each
    tower's head count divides the model axis (head-aligned QKV shards).

    ``n_heads`` maps tower name -> attention head count.
    """
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if n_model == 1:
        return True
    for tower, nh in n_heads.items():
        if tower in params and nh % n_model != 0:
            return False

    specs = param_specs(params, n_model)

    def ok(node, spec) -> bool:
        if isinstance(node, dict):
            return all(ok(node[k], spec[k]) for k in node)
        if isinstance(node, QTensor):
            good = _divisible(node.q, spec.q, mesh) and _divisible(node.d, spec.d, mesh)
            if node.m is not None:
                good = good and _divisible(node.m, spec.m, mesh)
            if node.hb is not None:
                good = good and _divisible(node.hb, spec.hb, mesh)
            return good
        if isinstance(node, W8Tensor):
            good = (_divisible(node.c8, spec.c8, mesh)
                    and _divisible(node.ws, spec.ws, mesh))
            if node.qt is not None:
                good = good and ok(node.qt, spec.qt)
            return good
        if node is None:
            return True
        return _divisible(node, spec, mesh)

    return ok(params, specs)
