"""ClipEngine: the user-facing inference engine.

Covers the reference's public C ABI (/root/reference/clip.h:42-109) — load,
hparams, tokenize, image load/preprocess, text/image/batch encode, compare,
similarity, softmax-with-sorting, zero-shot labeling — as one Python class.
The reference's ctypes binding layer (examples/python_bindings) is therefore
unnecessary: the engine *is* Python/JAX.

TPU-first mechanics:

* every tower is jitted once per (batch-bucket, normalize) pair; batches are
  padded up to power-of-two buckets so arbitrary request sizes never trigger
  recompiles;
* text is always padded to the model's full context (77) with post-EOT
  padding hidden by the causal mask — one compiled shape for all lengths;
* unlike the reference, the engine is stateless across calls and safe to use
  from multiple threads (the reference's static scratch buffers make a
  clip_ctx non-reentrant, /root/reference/clip.cpp:1048-1049);
* with a multi-device mesh, weights are tensor-sharded and batches are
  data-sharded at ingestion (see clip_tpu.parallel).
"""

from __future__ import annotations

import functools
import numbers
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .gguf import GGUFReader
from .gguf import constants as C
from .models.config import ClipConfig
from .models.params import load_params
from .models.text import encode_text
from .models.transformer import VALID_ATTN_IMPLS
from .models.vision import encode_image
from .parallel import mesh as pmesh
from .preprocess import load_image, preprocess_batch
from .tokenizer import ClipTokenizer
from .utils import enable_compile_cache, log

_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + _BUCKETS[-1] - 1) // _BUCKETS[-1]) * _BUCKETS[-1]


def softmax_with_sorting(scores: Sequence[float]) -> tuple[np.ndarray, np.ndarray]:
    """Softmax (with the reference's +1e-9 regularizer,
    /root/reference/clip.cpp:1591-1622) then sort descending.
    Returns (sorted_probs, original_indices)."""
    arr = np.asarray(scores, dtype=np.float64)
    e = np.exp(arr) + 1e-9
    probs = e / e.sum()
    order = np.argsort(-probs, kind="stable")
    return probs[order].astype(np.float32), order.astype(np.int32)


def similarity_score(v1: np.ndarray, v2: np.ndarray) -> float:
    """Plain dot product (/root/reference/clip.cpp:1525-1532)."""
    return float(np.dot(np.asarray(v1, np.float32), np.asarray(v2, np.float32)))


_W8_LAYER_WEIGHTS = ("qkv_w", "o_w", "up_w", "down_w")


def _convert_layers_to_w8(params: dict, include_dense: bool = False) -> dict:
    """Re-quantize each tower's stacked 2-D transformer weights (QTensor
    [L, N, K]) to per-channel int8 (host-side, one-time).  Embeddings, norms
    and the output projections stay in their source format — their matmuls
    are gather/small-M shaped, where the fused q4 path is already optimal.

    ``include_dense`` additionally converts DENSE (f16/f32-sourced) layer
    weights — the opt-in explicit ``act_quant=True`` mode for unquantized
    checkpoints, off by default so f16 numerics never change silently."""
    from .ops.qtensor import QTensor, to_w8tensor

    out = dict(params)
    for tower in ("text", "vision"):
        if tower not in out or "layers" not in out[tower]:
            continue
        layers = dict(out[tower]["layers"])
        for name in _W8_LAYER_WEIGHTS:
            w = layers.get(name)
            if isinstance(w, QTensor) or (
                include_dense and w is not None and not isinstance(w, QTensor)):
                # keep_source: the packed blocks ride along for hybrid
                # routing (small-row GEMMs take the fused dequant kernel —
                # ~1.8x fewer weight bytes; ops/linear.qmatmul)
                layers[name] = to_w8tensor(w, keep_source=True)
        t = dict(out[tower])
        t["layers"] = layers
        out[tower] = t
    return out


class _LayoutAwareJit:
    """Single-chip TPU tower dispatch: AOT-compile once per batch shape with
    AUTO layouts on the batch args, then stage every batch directly in the
    probed (tiled) device format.

    Why: the jitted vision program otherwise opens with a full relayout copy
    of the pixel batch from the default {3,2,1,0} layout into the patch-embed
    dot's preferred one (`copy.6 bf16[448,224,224,3]`, the single largest
    copy in the B=448 program — ~2.3M estimated cycles).  device_put into
    the probed format moves that rearrangement to transfer time, which the
    serving pipeline overlaps via prefetch: 26.12 vs 26.59-26.74 ms/step
    in-window, bit-identical (scripts/bench_pixel_layout.py).

    Same number of compiles as plain jit (the AOT probe IS the compile).
    Self-protecting against relayout-program dishonesty: staging runs
    through a jitted identity with ``out_shardings`` (``device_put(x, fmt)``
    silently commits the wrong layout through the compile-cache relay), and
    if THAT identity cannot produce the AUTO-probed layout (observed:
    requested (1,3,2,0), got (0,3,1,2) — process-state dependent), layout
    staging is abandoned for this shape and the plain-jit default-layout
    path is used.  Round 3's repin-to-actual alternative is gone: through
    the relay the repinned executable still rejects the staged arrays at
    runtime, and one layout-mismatched execution POISONS the process's TPU
    client (every subsequent compile fails INVALID_ARGUMENT — round-5
    finding, ViT-L/14 B=192).  Falls back to jax.jit if the layout API ever
    refuses (non-TPU quirk)."""

    def __init__(self, fn):
        self._fn = fn
        self._cache: dict = {}

    @staticmethod
    def _same_layouts(a, b) -> bool:
        return all(
            tuple(x.layout.major_to_minor) == tuple(y.layout.major_to_minor)
            and tuple(map(tuple, x.layout.tiling)) == tuple(map(tuple, y.layout.tiling))
            for x, y in zip(a, b)
        )

    def __call__(self, params, *batch):
        key = tuple((b.shape, np.dtype(b.dtype).str) for b in batch)
        entry = self._cache.get(key)
        if entry is None:
            try:
                from jax.experimental.layout import Format, Layout

                specs = [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in batch]
                compiled = jax.jit(
                    self._fn,
                    in_shardings=(None, *([Format(Layout.AUTO)] * len(batch))),
                ).lower(params, *specs).compile()
                fmts = tuple(compiled.input_formats[0][1:])
                stager = jax.jit(lambda *bs: bs, out_shardings=fmts)
                staged = stager(*batch)
                actual = tuple(s.format for s in staged)
                if not self._same_layouts(actual, fmts):
                    # The stager refused the probed layout.  Round 3's repin
                    # (recompile pinned to `actual`) no longer survives the
                    # relay: the repinned executable ALSO rejects the staged
                    # arrays at runtime (observed ViT-L/14 B=192 round 5),
                    # and one such failed execution POISONS the process's TPU
                    # client — every later compile returns INVALID_ARGUMENT.
                    # So on any staging disagreement, give up on layout
                    # staging entirely (default layouts, plain jit): the
                    # relayout copy costs ~2% where staging works; a poisoned
                    # engine costs everything.
                    entry = (jax.jit(self._fn), None)
                else:
                    entry = (compiled, stager)
            except Exception:  # pragma: no cover - defensive fallback
                entry = (jax.jit(self._fn), None)
            self._cache[key] = entry
        compiled, stager = entry
        if stager is None:
            return compiled(params, *batch)
        return compiled(params, *stager(*batch))


def aot_layout_staged(fn, params, *batch):
    """One-shot form of :class:`_LayoutAwareJit` for benchmark loops:
    AOT-compile ``fn(params, *batch)`` with AUTO layouts on the batch args,
    stage the batch arrays into the program's preferred formats ONCE (with
    the same self-correcting re-pin), and return ``(compiled, staged)`` so
    the timing loop calls ``compiled(params, *staged)`` with no per-call
    staging dispatch."""
    from jax.experimental.layout import Format, Layout

    specs = [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in batch]
    compiled = jax.jit(
        fn, in_shardings=(None, *([Format(Layout.AUTO)] * len(batch))),
    ).lower(params, *specs).compile()
    fmts = tuple(compiled.input_formats[0][1:])
    staged = jax.jit(lambda *bs: bs, out_shardings=fmts)(*batch)
    actual = tuple(s.format for s in staged)
    if not _LayoutAwareJit._same_layouts(actual, fmts):
        # staging disagreement: do NOT repin-and-run (a layout-mismatched
        # execution poisons the process's TPU client through the relay —
        # see _LayoutAwareJit) — fall back to default layouts outright
        compiled = jax.jit(fn).lower(params, *specs).compile()
        staged = tuple(jax.device_put(b) for b in batch)
    return compiled, staged


class ClipEngine:
    """Load a GGUF CLIP checkpoint and serve text/image embeddings."""

    def __init__(
        self,
        model_path: str,
        *,
        compute_dtype: str | None = None,
        keep_quantized: bool = True,
        mesh: "jax.sharding.Mesh | None" = None,
        use_mesh: bool = False,
        use_shard_map: bool | None = None,
        attn_impl: str = "auto",
        unroll: bool = False,
        act_quant: bool | None = None,
        lnq_fuse: bool | None = None,
        verbosity: int = 1,
    ):
        enable_compile_cache()
        self.model_path = str(model_path)
        self.verbosity = verbosity
        self.reader = GGUFReader(self.model_path)
        self.config = ClipConfig.from_gguf(self.reader)

        if compute_dtype is None:
            compute_dtype = "float32" if jax.default_backend() == "cpu" else "bfloat16"
        self.compute_dtype = jnp.dtype(compute_dtype)

        ft = C.FTYPE_TO_NAME.get(self.config.ftype, "?")
        log(verbosity, 1, "model: %s (%s)", self.config.name or self.model_path, ft)
        log(verbosity, 1, "description: %s", self.config.description)
        log(verbosity, 1, "text_encoder: %d  vision_encoder: %d  use_gelu: %d",
            self.config.has_text, self.config.has_vision, self.config.use_gelu)
        if verbosity >= 2:
            for tower, cfg in (("text", self.config.text), ("vision", self.config.vision)):
                if cfg is not None:
                    log(verbosity, 2, "%s hparams: %s", tower, cfg)

        params = load_params(
            self.reader, self.config, keep_quantized=keep_quantized,
            dtype=self.compute_dtype,
        )

        # int8-MXU activation-quantized compute (W8A8): re-quantize the 2-D
        # transformer weights to per-channel int8 at load and run their
        # matmuls with dynamically int8-quantized activations — 1.5x faster
        # than the bf16 dequant-dot at throughput shapes on v6e-class chips
        # (ops/linear.w8a8_matmul).  Mirrors the reference's own quantized-
        # activation dots (ggml_vec_dot_q4_0_q8_0).  Auto: on for quantized
        # checkpoints on TPU; off on CPU (slow int8 emulation, and the CPU
        # test suite pins exact q4 dequant numerics).
        explicit = act_quant is True  # user opt-in: also int8-ize dense f16
        if act_quant is None:
            act_quant = jax.default_backend() == "tpu" and keep_quantized
        self.act_quant = bool(act_quant)
        if self.act_quant:
            params = _convert_layers_to_w8(params, include_dense=explicit)

        # Fused Pallas LN/gelu->int8-quant feeding the int8 GEMMs
        # (ops.actquant_pallas): the producer pass emits codes + scales
        # directly, so w8a8's separate amax pass and the bf16 round-trip of
        # each GEMM input disappear.  History: before the gemm_gq epilogue
        # (fused int8-GEMM + gelu->requant) landed, producers LOST 7-12% at
        # hidden >= 1024; with the up-GEMM's [rows, 4H] output kept in VMEM
        # the fused path now wins at every vision width (in-window A/Bs,
        # scripts/bench_w8a8_model.py: L/14 1009 vs 983 unfused img/s, H/14
        # 54.40 vs 55.30 ms, L/14-336 66.91 vs 73.53 ms).  The TEXT tower is
        # the exception: its short-S flat blocks don't amortize the LN
        # producer boundary (18.2k -> 14.8k texts/s) — it instead takes the
        # up_gq split below.  Auto: vision towers when W8A8 runs real TPU
        # kernels; explicit lnq_fuse=True forces it on everywhere; CPU keeps
        # the XLA-exact path (interpret kernels are test-only).
        if lnq_fuse is None:
            lnq_fuse = self.act_quant and jax.default_backend() == "tpu"
        self.lnq_fuse = bool(lnq_fuse) and self.act_quant
        # up_gq: XLA-level LN + row quant (one fused HBM pass) feeding the
        # gemm_gq up-GEMM — the MLP's wide intermediate still never leaves
        # VMEM but the producer boundary disappears.  Measured on the text
        # tower: 14.00 -> 13.22 ms at B=256 (18,281 -> 19,364 texts/s,
        # scripts/bench_text.py in-window).  Engaged wherever W8A8 runs TPU
        # kernels and the lnq producers are off for the tower.
        self.up_gq = self.act_quant and jax.default_backend() == "tpu"

        self.mesh = mesh
        if mesh is None and use_mesh and len(jax.devices()) > 1:
            self.mesh = pmesh.make_mesh()

        # Execution path under a mesh.  Preferred: jax.shard_map — every chip
        # runs ordinary single-device code (fused Pallas kernels included)
        # with explicit Megatron-style collectives.  Fallback: pjit SPMD,
        # which cannot partition Pallas custom calls, so both the attention
        # kernel and the fused qmatmul must be forced to their XLA paths.
        self._spmd = False
        self._tp_axis = None
        self._qmm_backend: str | None = None
        self._n_model = 1
        if self.mesh is not None:
            if pmesh.MODEL_AXIS in self.mesh.axis_names:
                self._n_model = self.mesh.shape[pmesh.MODEL_AXIS]
            n_heads = {}
            if self.config.text is not None:
                n_heads["text"] = self.config.text.n_head
            if self.config.vision is not None:
                n_heads["vision"] = self.config.vision.n_head
            compat = (
                pmesh.DATA_AXIS in self.mesh.axis_names
                and pmesh.spmd_compatible(params, self.mesh, n_heads)
            )
            if use_shard_map is None:
                self._spmd = compat
            elif use_shard_map:
                if not compat:
                    raise ValueError(
                        "use_shard_map=True but the model cannot be "
                        "head/block-aligned on this mesh (head count or a "
                        "weight dim does not divide the model axis)")
                self._spmd = True
            if self._spmd:
                self._tp_axis = (
                    pmesh.MODEL_AXIS if self._n_model > 1 else None
                )
                params = pmesh.permute_qkv_params(params, self._n_model)
            else:
                # pjit cannot partition Pallas custom calls: any 'auto' route
                # into the fused qmatmul would crash (or silently gather) on
                # real multi-chip hardware; same for the fused LN->quant and
                # the gemm_gq up-GEMM
                self._qmm_backend = "xla"
                self.lnq_fuse = False
                self.up_gq = False
            params = pmesh.shard_params(params, self.mesh)
        else:
            params = jax.device_put(params)
        self.params = params

        self.tokenizer: ClipTokenizer | None = None
        if self.config.has_text:
            tokens = self.reader.kv[C.KEY_TOKENS]
            # the reference hardcodes BOS/EOS 49406/49407 (clip.cpp:637,671)
            # == n_vocab-2 / n_vocab-1 for the CLIP vocab; derive from size so
            # reduced-vocab checkpoints stay in range
            n = len(tokens)
            self.tokenizer = ClipTokenizer(
                tokens, bos_id=min(49406, n - 2), eos_id=min(49407, n - 1)
            )

        # Attention impl under a mesh: the shard_map path runs the Pallas
        # kernel per-shard ('auto' keeps its single-chip meaning); the pjit
        # fallback cannot partition Pallas custom calls, so it forces XLA.
        if attn_impl not in VALID_ATTN_IMPLS:
            raise ValueError(
                f"unknown attn_impl {attn_impl!r}: use {'|'.join(VALID_ATTN_IMPLS)}")
        if self.mesh is not None and not self._spmd:
            if attn_impl == "pallas":
                raise ValueError(
                    "attn_impl='pallas' cannot run under a device mesh "
                    "without shard_map (Pallas custom calls are not "
                    "pjit-partitionable); use attn_impl='auto' or 'xla'")
            if attn_impl == "auto":
                attn_impl = "xla"
        self.attn_impl = attn_impl
        # unroll=True trades ~45s extra compile per tower shape for a slightly
        # faster steady state (bench.py uses it); scan is the latency default.
        self.unroll = unroll

        # data-sharded batches must divide the mesh's data axis
        self._batch_multiple = 1
        if self.mesh is not None and "data" in self.mesh.axis_names:
            self._batch_multiple = self.mesh.shape["data"]
            # collective encodes build the global batch from per-host rows
            # (rows * nproc must divide n_data); a non-dividing config would
            # only explode at serve time inside make_array_from_process_local_
            # data — fail fast here with the actual numbers instead
            nproc = jax.process_count()
            if nproc > 1 and self._batch_multiple % nproc != 0:
                raise ValueError(
                    f"mesh data axis ({self._batch_multiple}) must be divisible "
                    f"by the process count ({nproc}) for multi-host collective "
                    f"encodes; reshape the mesh (e.g. data={nproc * (self._batch_multiple // nproc or 1)})")

        self._jit_cache: dict = {}

    def _bucket(self, n: int) -> int:
        m = self._batch_multiple
        b = _bucket(n)
        return b if b % m == 0 else ((b + m - 1) // m) * m

    @property
    def _upgq_active(self) -> bool:
        """XLA-quant + fused up-GEMM split, used only when the lnq producers
        are off (measured: text 14.00 -> 13.22 ms at B=256,
        scripts/bench_text.py).  History: round 3 resolved lnq vs up_gq PER
        TOWER (text lost 18% on the LN producer boundary); the round-4
        whole-MLP kernel removed that boundary and full lnq now wins both
        towers (text 12.41 ms lnq_mlp vs 13.25 round-3 up_gq at B=256 ->
        20.6k texts/s; scripts/bench_text.py, bench_w8a8_model.py), so the
        per-tower decision collapsed to the two engine flags."""
        return self.up_gq and not self.lnq_fuse

    # -- hparams (clip_get_text_hparams / clip_get_vision_hparams) ----------

    @property
    def text_hparams(self):
        return self.config.text

    @property
    def vision_hparams(self):
        return self.config.vision

    @property
    def projection_dim(self) -> int:
        cfg = self.config.vision or self.config.text
        return cfg.projection_dim

    @property
    def image_size(self) -> int:
        return self.config.vision.image_size

    # -- tokenize / preprocess ----------------------------------------------

    def tokenize(self, text: str) -> list[int]:
        if self.tokenizer is None:
            raise RuntimeError("this checkpoint has no text encoder")
        return self.tokenizer.encode(text, max_len=self.config.text.num_positions)

    def load_image(self, path: str) -> np.ndarray:
        return load_image(path)

    def preprocess(self, images, n_workers: int = 4) -> np.ndarray:
        """uint8 RGB image(s) -> normalized float32 NHWC batch.

        Uses the native C++ pipeline (thread pool, GIL-free) when available,
        else the vectorized numpy path; both are PIL/reference-parity.
        """
        if self.config.vision is None:
            raise RuntimeError("this checkpoint has no vision encoder")
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        imgs = []
        for im in images:
            im = np.asarray(im)
            if im.ndim == 2:
                im = np.stack([im] * 3, axis=-1)
            if im.shape[-1] == 4:
                im = im[..., :3]
            imgs.append(im)
        size = self.config.vision.image_size
        mean = np.asarray(self.config.image_mean)
        std = np.asarray(self.config.image_std)
        if all(im.dtype == np.uint8 for im in imgs):
            from . import native

            if native.available():
                try:
                    return native.preprocess_batch_native(
                        imgs, size, mean, std, n_threads=n_workers
                    )
                except RuntimeError:
                    pass  # e.g. image smaller than the crop: numpy path decides
        return preprocess_batch(imgs, size, mean, std, n_workers=n_workers)

    # -- jitted tower entry points -------------------------------------------

    def _wrap(self, local_fn, tower: str, *batch_specs):
        """jit ``local_fn(params, *batch)``; on the shard_map path, map it
        over the mesh so each shard runs the full single-chip code (Pallas
        kernels included) on its (data-shard, model-shard) slice."""
        if not self._spmd:
            if jax.default_backend() == "tpu":
                return _LayoutAwareJit(local_fn)
            return jax.jit(local_fn)
        from jax.sharding import PartitionSpec as P

        pspec = pmesh.param_specs(self.params[tower], self._n_model)
        return jax.jit(jax.shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(pspec, *batch_specs),
            out_specs=P(pmesh.DATA_AXIS, None),
            check_vma=False,  # Pallas calls carry no replication rule
        ))

    def _batch_spec(self, ndim: int):
        from jax.sharding import PartitionSpec as P

        return P(pmesh.DATA_AXIS, *([None] * (ndim - 1)))

    def _text_fn(self, normalize: bool):
        key = ("text", normalize)
        if key not in self._jit_cache:
            cfg = self.config

            def fn(params, ids, lengths):
                return encode_text(
                    params, cfg.text, ids, lengths,
                    use_gelu=cfg.use_gelu, normalize=normalize,
                    compute_dtype=self.compute_dtype,
                    attn_impl=self.attn_impl,
                    unroll=self.unroll,
                    qmm_backend=self._qmm_backend,
                    tp_axis=self._tp_axis,
                    lnq_fuse=self.lnq_fuse,
                    up_gq=self._upgq_active,
                )

            self._jit_cache[key] = self._wrap(
                fn, "text", self._batch_spec(2), self._batch_spec(1))
        return self._jit_cache[key]

    def _vision_fn(self, normalize: bool):
        key = ("vision", normalize)
        if key not in self._jit_cache:
            cfg = self.config

            def fn(params, pixels):
                return encode_image(
                    params, cfg.vision, pixels,
                    use_gelu=cfg.use_gelu, normalize=normalize,
                    compute_dtype=self.compute_dtype,
                    attn_impl=self.attn_impl,
                    unroll=self.unroll,
                    qmm_backend=self._qmm_backend,
                    tp_axis=self._tp_axis,
                    lnq_fuse=self.lnq_fuse,
                    up_gq=self._upgq_active,
                )

            self._jit_cache[key] = self._wrap(fn, "vision", self._batch_spec(4))
        return self._jit_cache[key]

    def _vision_raw_fn(self, normalize: bool, in_h: int, in_w: int):
        """Fused on-device preprocess + encode for uint8 batches of one
        geometry: the host ships uint8 (4x less transfer) and bicubic runs on
        the MXU (see clip_tpu.ops.device_preprocess)."""
        key = ("vision_raw", normalize, in_h, in_w)
        if key not in self._jit_cache:
            from .ops.device_preprocess import make_device_preprocess

            cfg = self.config
            prep = make_device_preprocess(
                in_h, in_w, cfg.vision.image_size,
                np.asarray(self.config.image_mean), np.asarray(self.config.image_std),
            )

            def fn(params, imgs_u8):
                return encode_image(
                    params, cfg.vision, prep(imgs_u8),
                    use_gelu=cfg.use_gelu, normalize=normalize,
                    compute_dtype=self.compute_dtype,
                    attn_impl=self.attn_impl,
                    unroll=self.unroll,
                    qmm_backend=self._qmm_backend,
                    tp_axis=self._tp_axis,
                    lnq_fuse=self.lnq_fuse,
                    up_gq=self._upgq_active,
                )

            self._jit_cache[key] = self._wrap(fn, "vision", self._batch_spec(4))
        return self._jit_cache[key]

    # -- encoding -------------------------------------------------------------

    def encode_text(self, texts, *, normalize: bool = True) -> np.ndarray:
        """Encode one string / token list or a batch of them.

        Returns [D] for a single input, [B, D] for a batch.
        """
        single = isinstance(texts, str) or (
            isinstance(texts, (list, tuple)) and texts
            and isinstance(texts[0], numbers.Integral)
        )
        if single:
            texts = [texts]
        if len(texts) > _BUCKETS[-1]:
            parts = [
                self.encode_text(list(texts[i:i + _BUCKETS[-1]]), normalize=normalize)
                for i in range(0, len(texts), _BUCKETS[-1])
            ]
            return np.concatenate(parts, axis=0)
        n_pos = self.config.text.num_positions
        ids_list = [
            self.tokenize(t) if isinstance(t, str) else list(t) for t in texts
        ]
        b = len(ids_list)
        bb = self._bucket(b)
        ids = np.full((bb, n_pos), self.tokenizer.eos_id, np.int32)
        lengths = np.ones(bb, np.int32)
        for i, t in enumerate(ids_list):
            padded, n = self.tokenizer.pad(t, n_pos)
            ids[i] = padded
            lengths[i] = n
        ids_d, len_d = self._put_batch(ids), self._put_batch(lengths)
        out = self._text_fn(normalize)(self.params["text"], ids_d, len_d)
        out = np.asarray(out[:b], dtype=np.float32)
        return out[0] if single else out

    def encode_image(
        self,
        images,
        *,
        normalize: bool = True,
        preprocessed: bool | None = None,
        device_preprocess: bool = True,
    ) -> np.ndarray:
        """Encode image(s): file path(s), uint8 arrays, or preprocessed float
        NHWC batches.  Returns [D] or [B, D].

        uint8 batches whose images share one geometry take the fused
        on-device preprocess+encode path (``device_preprocess=False`` forces
        the host bicubic, e.g. to keep results byte-stable across backends).
        """
        single = isinstance(images, (str, np.ndarray)) and (
            isinstance(images, str) or images.ndim == 3
        )
        if single:
            images = [images]
        # bound memory and jit-shape growth: very large requests run as
        # max-bucket chunks (the indexer/benchmark protocol batch loop,
        # generalized to every entry point)
        n_in = images.shape[0] if isinstance(images, np.ndarray) else len(images)
        if n_in > _BUCKETS[-1]:
            parts = [
                self.encode_image(
                    images[i:i + _BUCKETS[-1]], normalize=normalize,
                    preprocessed=preprocessed, device_preprocess=device_preprocess)
                for i in range(0, n_in, _BUCKETS[-1])
            ]
            return np.concatenate(parts, axis=0)
        if isinstance(images, np.ndarray) and images.ndim == 4 and images.dtype != np.uint8:
            pixels = np.asarray(images, np.float32)
        else:
            arrs = [self.load_image(im) if isinstance(im, str) else im for im in images]
            if preprocessed or (arrs and arrs[0].dtype != np.uint8):
                pixels = np.stack([np.asarray(a, np.float32) for a in arrs])
            elif (
                device_preprocess
                and arrs
                and all(a.ndim == 3 and a.shape == arrs[0].shape for a in arrs)
            ):
                return self._encode_image_raw(
                    np.stack(arrs), normalize=normalize, single=single
                )
            else:
                pixels = self.preprocess(arrs)
        b = pixels.shape[0]
        bb = self._bucket(b)
        if bb != b:
            pad = np.repeat(pixels[-1:], bb - b, axis=0)
            pixels = np.concatenate([pixels, pad], axis=0)
        # stage pixels in the compute dtype on the HOST: bf16 halves the
        # host->device transfer and the model's first-op cast becomes a
        # no-op — bit-identical (same rounding, just earlier)
        if pixels.dtype != np.dtype(self.compute_dtype):
            pixels = pixels.astype(self.compute_dtype)
        out = self._vision_fn(normalize)(self.params["vision"], self._put_batch(pixels))
        out = np.asarray(out[:b], dtype=np.float32)
        return out[0] if single else out

    def _encode_image_raw(self, imgs_u8: np.ndarray, *, normalize: bool, single: bool) -> np.ndarray:
        b, h, w, _ = imgs_u8.shape
        bb = self._bucket(b)
        if bb != b:
            pad = np.repeat(imgs_u8[-1:], bb - b, axis=0)
            imgs_u8 = np.concatenate([imgs_u8, pad], axis=0)
        fn = self._vision_raw_fn(normalize, h, w)
        out = fn(self.params["vision"], self._put_batch(imgs_u8))
        out = np.asarray(out[:b], dtype=np.float32)
        return out[0] if single else out

    def _put_batch(self, x: np.ndarray):
        if self.mesh is not None:
            return pmesh.shard_batch(jnp.asarray(x), self.mesh)
        # single-chip: hand the HOST array straight to the tower wrapper —
        # _LayoutAwareJit device_puts it into the compiled program's
        # preferred layout in one hop (committing a default-layout copy
        # here would force a second, device-to-device relayout)
        return x

    # -- multi-host collective encode -----------------------------------------
    #
    # Multi-controller SPMD: every process calls these with the SAME local
    # batch shape in the same order (the serving tick protocol guarantees
    # that); each host contributes its rows of the global data-sharded batch
    # and gets its own rows back.  Requires a mesh whose data axis is
    # process-major (make_mesh default over jax.devices()).

    def _collective_rows(self, local_b: int) -> int:
        """Per-host padded row count: deterministic given local_b, so every
        process computes the same global shape.  Bucketed through the
        power-of-two ladder so serving hits a bounded set of compiled
        programs, then rounded to this host's share of the data axis (the
        global batch rows*nproc must divide n_data — computing the global
        bucket first and flooring by nproc breaks for non-power-of-two host
        counts)."""
        import jax

        nproc = jax.process_count()
        m = max(1, self._batch_multiple // nproc)
        rows = _bucket(max(local_b, 1))
        return rows if rows % m == 0 else ((rows + m - 1) // m) * m

    def _encode_collective(self, fn, tower: str, arrays: "list[np.ndarray]", local_b: int):
        import jax
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        nproc = jax.process_count()
        rows = self._collective_rows(local_b)
        garrs = []
        for arr in arrays:
            if arr.shape[0] != rows:
                pad = np.zeros((rows - arr.shape[0],) + arr.shape[1:], arr.dtype)
                arr = np.concatenate([arr, pad], axis=0) if arr.shape[0] else pad
            spec = P(pmesh.DATA_AXIS, *([None] * (arr.ndim - 1)))
            garrs.append(jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, spec), arr,
                (rows * nproc,) + arr.shape[1:]))
        out = fn(self.params[tower], *garrs)
        emb = np.asarray(multihost_utils.process_allgather(out, tiled=True))
        start = jax.process_index() * rows
        return emb[start:start + local_b].astype(np.float32)

    def encode_image_collective(self, local_pixels: np.ndarray, *,
                                normalize: bool = True) -> np.ndarray:
        """Collective multi-host encode of this host's preprocessed float32
        NHWC rows.  ALL processes must call with the same row count."""
        if self.mesh is None:
            raise RuntimeError("collective encode requires a device mesh")
        local_pixels = np.asarray(local_pixels, np.float32)
        # same host-side compute-dtype staging as the single-host path:
        # bit-identical, halves the pixel transfer per distributed tick
        if local_pixels.dtype != np.dtype(self.compute_dtype):
            local_pixels = local_pixels.astype(self.compute_dtype)
        b = local_pixels.shape[0]
        return self._encode_collective(
            self._vision_fn(normalize), "vision", [local_pixels], b)

    def encode_text_collective(self, texts, *, normalize: bool = True) -> np.ndarray:
        """Collective multi-host encode of this host's texts (strings or
        token-id lists).  ALL processes must call with the same count."""
        if self.mesh is None:
            raise RuntimeError("collective encode requires a device mesh")
        n_pos = self.config.text.num_positions
        b = len(texts)
        ids = np.full((b, n_pos), self.tokenizer.eos_id, np.int32)
        lengths = np.ones(b, np.int32)
        for i, t in enumerate(texts):
            toks = self.tokenize(t) if isinstance(t, str) else list(t)
            ids[i], lengths[i] = self.tokenizer.pad(toks, n_pos)
        return self._encode_collective(
            self._text_fn(normalize), "text", [ids, lengths], b)

    def encode_class_names(self, names, *, templates=None) -> np.ndarray:
        """Class-name text embeddings for zero-shot classification.

        ``templates=None`` reproduces the reference protocol exactly (raw
        class names, /root/reference/tests/benchmark.cpp:65-74).  Otherwise
        each class is encoded through every template ('a photo of a {}.',
        ...), per-prompt embeddings are L2-normalized, averaged, and the
        ensemble is re-normalized — the CLIP-paper recipe the reference
        admits it lacks (tests/README.md:15).  Returns normalized [C, D].
        """
        from .templates import resolve_templates

        names = list(names)
        tpl = resolve_templates(templates)
        if tpl is None:
            return self.encode_text(names, normalize=True)
        prompts = [t.format(n) for n in names for t in tpl]
        # encode_text chunks at the max bucket internally, so ImageNet-scale
        # ensembles (1000 classes x 80 templates) never become one giant jit
        vecs = self.encode_text(prompts, normalize=True)
        vecs = vecs.reshape(len(names), len(tpl), -1).mean(axis=1)
        vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
        return vecs.astype(np.float32)

    # -- high-level utilities (clip.h parity) ---------------------------------

    def compare_text_and_image(self, text: str, image) -> float:
        """End-to-end similarity with normalized embeddings
        (/root/reference/clip.cpp:1534-1571)."""
        tvec = self.encode_text(text, normalize=True)
        ivec = self.encode_image(image, normalize=True)
        return similarity_score(tvec, ivec)

    def zero_shot_label_image(
        self, image, labels: Sequence[str], *, templates=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """HF-pipeline-parity zero-shot labeling: *unnormalized* embeddings,
        softmax over raw dot products (/root/reference/clip.cpp:1624-1659).
        With ``templates``, labels are prompt-ensembled (normalized, scaled
        by 100 like CLIP's logit scale so the softmax stays meaningful).
        Returns (sorted_scores, indices into labels)."""
        if len(labels) < 2:
            raise ValueError("zero-shot labeling needs at least 2 labels")
        if templates is None:
            ivec = self.encode_image(image, normalize=False)
            tvecs = self.encode_text(list(labels), normalize=False)
            sims = tvecs @ ivec
        else:
            ivec = self.encode_image(image, normalize=True)
            tvecs = self.encode_class_names(labels, templates=templates)
            sims = 100.0 * (tvecs @ ivec)
        return softmax_with_sorting(sims)

    def close(self) -> None:
        self.reader.close()
