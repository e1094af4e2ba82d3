"""Multi-host continuous batching: N hosts feed one global device mesh.

Each host runs its own HTTP ingestion (clip_tpu.cli.serve) and enqueues
requests locally.  Multi-controller SPMD requires every process to execute
the same program in the same order, so batching is driven by a synchronized
tick loop:

1. every tick, each host drains up to ``max_local`` pending requests per
   lane (text/image x normalize) and allgathers the per-lane counts
   (a tiny host collective over DCN);
2. for each lane with any request anywhere, all hosts agree on the padded
   per-host row count (deterministic bucket of the global max) and run ONE
   collective encode over the global mesh
   (:meth:`~clip_tpu.engine.ClipEngine.encode_*_collective`) — hosts with
   fewer (or zero) requests contribute dummy rows;
3. each host resolves its own requests' futures from its rows.

The reference has no serving story at all (SURVEY §2.2); single-host serving
is ``ContinuousBatcher``.  API-compatible with it so the HTTP handler works
unchanged.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


@dataclass
class _LaneStats:
    n_requests: int = 0
    n_batches: int = 0
    batch_sizes: list = field(default_factory=list)


_LANES = (
    ("text", True), ("text", False), ("image", True), ("image", False),
)


class MultiHostBatcher:
    """Tick-synchronized batcher over a multi-process mesh engine.

    All JAX collectives run on the single driver thread (multihost
    collectives from concurrent threads would deadlock); HTTP handler
    threads only enqueue.
    """

    def __init__(self, engine, max_local: int = 64, tick_ms: float = 10.0,
                 on_stop=None):
        import jax

        if engine.mesh is None:
            raise ValueError("MultiHostBatcher requires an engine with a mesh")
        self.engine = engine
        self.max_local = max_local
        self.tick = tick_ms / 1000.0
        self._on_stop = on_stop  # called on EVERY host once any host stops
        self._queues = {lane: queue.Queue() for lane in _LANES}
        self._stats = {lane: _LaneStats() for lane in _LANES}
        self._stop = threading.Event()
        self._closed = False
        # makes the closed-check + enqueue atomic vs the shutdown drain: a
        # handler thread that passes the check has already enqueued by the
        # time the driver flips _closed and does its final sweep, so no
        # Future can slip in after the sweep and hang its client
        self._submit_lock = threading.Lock()
        self._nproc = jax.process_count()
        self._driver = threading.Thread(target=self._run, name="mh-batcher", daemon=True)
        self._driver.start()

    # -- ContinuousBatcher-compatible API ------------------------------------

    def _submit(self, lane, payload) -> Future:
        fut: Future = Future()
        # single-tower checkpoints: fail fast here — raising inside the
        # collective section would tear the whole cluster down
        mod = lane[0]
        cfg = self.engine.config
        if (mod == "text" and not cfg.has_text) or (
                mod == "image" and not cfg.has_vision):
            fut.set_exception(RuntimeError(
                f"this checkpoint has no {mod} encoder"))
            return fut
        with self._submit_lock:
            if self._closed:
                fut.set_exception(RuntimeError("server shutting down"))
                return fut
            self._queues[lane].put((payload, fut))
        return fut

    def submit_text(self, text, normalize: bool = True) -> Future:
        return self._submit(("text", bool(normalize)), text)

    def submit_image(self, image, normalize: bool = True) -> Future:
        return self._submit(("image", bool(normalize)), image)

    def encode_text(self, text, normalize: bool = True, timeout: float | None = 60.0):
        return self.submit_text(text, normalize).result(timeout)

    def encode_image(self, image, normalize: bool = True, timeout: float | None = 60.0):
        return self.submit_image(image, normalize).result(timeout)

    @property
    def stats(self) -> dict:
        out: dict = {}
        for (mod, norm), st in self._stats.items():
            key = f"{mod}_{'norm' if norm else 'raw'}"
            out[key] = {
                "requests": st.n_requests,
                "batches": st.n_batches,
                "mean_batch": float(np.mean(st.batch_sizes)) if st.batch_sizes else 0.0,
            }
        return out

    def close(self) -> None:
        self._stop.set()
        self._driver.join(timeout=60)
        # belt-and-braces: if the driver died without its shutdown drain
        # (unexpected exception outside the per-lane try), fail anything left
        with self._submit_lock:
            self._closed = True
        for lane in _LANES:
            while True:
                rest = self._drain(lane)
                if not rest:
                    break
                for _, fut in rest:
                    if not fut.done():
                        fut.set_exception(RuntimeError("server shutting down"))

    def __enter__(self) -> "MultiHostBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- driver ---------------------------------------------------------------

    def _drain(self, lane) -> list:
        items = []
        q = self._queues[lane]
        while len(items) < self.max_local:
            try:
                items.append(q.get_nowait())
            except queue.Empty:
                break
        return items

    def _validate(self, lane, items) -> tuple[list, "np.ndarray | None"]:
        """Host-local pre-validation BEFORE the count allgather.

        A per-host exception raised after counts are exchanged but before the
        collective runs would desynchronize the SPMD tick protocol (this host
        skips the collective while every other host enters it) and hang the
        cluster — so anything that can fail on one host's payload (type
        checks, tokenization inputs, image preprocessing) happens here;
        offending requests get their exception and are dropped from the tick.
        Returns (good_items, preprocessed_pixels_or_None).
        """
        mod, _ = lane
        if mod == "text":
            good = []
            for t, fut in items:
                ok = isinstance(t, str) or (
                    isinstance(t, (list, tuple))
                    and all(isinstance(x, (int, np.integer)) for x in t)
                )
                if ok:
                    good.append((t, fut))
                else:
                    fut.set_exception(TypeError(
                        f"text payload must be str or token-id list, got {type(t)}"))
            return good, None
        good, pixel_rows = [], []
        for im, fut in items:
            try:
                pixel_rows.append(self.engine.preprocess([np.asarray(im)]))
            except Exception as e:
                fut.set_exception(e)
                continue
            good.append((im, fut))
        pixels = np.concatenate(pixel_rows, axis=0) if pixel_rows else None
        return good, pixels

    def _run(self) -> None:
        import sys
        import time

        from jax.experimental import multihost_utils

        eng = self.engine
        while True:
            pending = {}
            pixels_by_lane = {}
            for lane in _LANES:
                pending[lane], pixels_by_lane[lane] = self._validate(
                    lane, self._drain(lane))
            counts = np.asarray(
                [len(pending[lane]) for lane in _LANES]
                + [1 if self._stop.is_set() else 0],
                np.int32,
            )
            all_counts = np.asarray(multihost_utils.process_allgather(counts))
            gmax = all_counts.max(axis=0)

            for li, lane in enumerate(_LANES):
                if gmax[li] == 0:
                    continue
                mod, norm = lane
                items = pending[lane]
                # every host pads to the global per-host max so the SPMD
                # programs see identical shapes (dummy rows are discarded)
                n_rows = int(gmax[li])
                try:
                    if mod == "text":
                        payloads = [t for t, _ in items]
                        payloads += [""] * (n_rows - len(payloads))
                        vecs = eng.encode_text_collective(payloads, normalize=norm)
                    else:
                        size = eng.image_size
                        pixels = pixels_by_lane[lane]
                        if pixels is None:
                            pixels = np.zeros((0, size, size, 3), np.float32)
                        if pixels.shape[0] < n_rows:
                            pad = np.zeros((n_rows - pixels.shape[0], size, size, 3),
                                           np.float32)
                            pixels = np.concatenate([pixels, pad], axis=0)
                        vecs = eng.encode_image_collective(pixels, normalize=norm)
                    for (_, fut), v in zip(items, vecs):
                        fut.set_result(np.asarray(v))
                except Exception as e:
                    # a failure INSIDE the collective is systemic (every host
                    # runs the same program); tear the cluster down rather
                    # than tick on with desynchronized state
                    print(f"multihost batcher: collective failed ({e!r}); "
                          f"stopping cluster", file=sys.stderr, flush=True)
                    self._stop.set()
                    for _, fut in items:
                        if not fut.done():
                            fut.set_exception(e)
                st = self._stats[lane]
                st.n_batches += 1
                st.n_requests += len(items)
                st.batch_sizes.append(len(items))
                if len(st.batch_sizes) > 10000:   # bound /stats memory
                    st.batch_sizes = st.batch_sizes[-1000:]

            if gmax[-1]:  # any host shutting down: all hosts leave together
                self._stop.set()
                with self._submit_lock:
                    self._closed = True  # submits past this point fail fast
                for lane in _LANES:
                    while True:  # fail EVERY pending future, not one drain's worth
                        rest = self._drain(lane)
                        if not rest:
                            break
                        for _, fut in rest:
                            fut.set_exception(RuntimeError("server shutting down"))
                if self._on_stop is not None:
                    self._on_stop()
                return
            if gmax[:-1].max() == 0:
                time.sleep(self.tick)