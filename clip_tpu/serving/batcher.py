"""Continuous batching of encode requests.

The reference processes fixed batches synchronously in each CLI
(/root/reference/examples/image-search/build.cpp batch=4 loop).  For serving,
this module keeps the chip saturated instead: requests from any number of
client threads are queued, a collector thread groups whatever is waiting
(up to ``max_batch``, waiting at most ``max_wait_ms`` to accumulate), pads to
the engine's compiled bucket shapes, runs one device step, and resolves
per-request futures.  Text and image requests ride separate lanes since they
hit different compiled programs.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


@dataclass
class BatcherStats:
    n_requests: int = 0
    n_batches: int = 0
    batch_sizes: list[int] = field(default_factory=list)

    @property
    def mean_batch(self) -> float:
        return float(np.mean(self.batch_sizes)) if self.batch_sizes else 0.0


@dataclass
class _Request:
    payload: object
    normalize: bool
    future: Future


class _Lane:
    """One modality lane: queue + collector thread."""

    def __init__(self, name: str, encode_fn, max_batch: int, max_wait_ms: float):
        self.name = name
        self.encode_fn = encode_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.q: "queue.Queue[_Request | None]" = queue.Queue()
        self.stats = BatcherStats()
        self._thread = threading.Thread(target=self._run, name=f"batcher-{name}", daemon=True)
        self._thread.start()

    def submit(self, payload, normalize: bool) -> Future:
        fut: Future = Future()
        self.q.put(_Request(payload, normalize, fut))
        return fut

    def stop(self) -> None:
        self.q.put(None)
        self._thread.join(timeout=5)

    def _collect(self) -> list[_Request] | None:
        first = self.q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self.q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                self.q.put(None)  # re-post sentinel for shutdown
                break
            batch.append(item)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            # split by normalize flag (different compiled programs)
            for norm in (True, False):
                group = [r for r in batch if r.normalize == norm]
                if not group:
                    continue
                try:
                    vecs = self.encode_fn([r.payload for r in group], normalize=norm)
                    for r, v in zip(group, vecs):
                        r.future.set_result(np.asarray(v))
                except Exception as e:  # propagate to all waiters
                    for r in group:
                        if not r.future.done():
                            r.future.set_exception(e)
                self.stats.n_batches += 1
                self.stats.n_requests += len(group)
                self.stats.batch_sizes.append(len(group))
                if len(self.stats.batch_sizes) > 10000:  # bound /stats memory
                    self.stats.batch_sizes = self.stats.batch_sizes[-1000:]


class ContinuousBatcher:
    """Queue-and-batch front end over a :class:`~clip_tpu.engine.ClipEngine`."""

    def __init__(self, engine, max_batch: int = 64, max_wait_ms: float = 5.0,
                 device_preprocess: bool = False):
        # device_preprocess=False: serving clients send arbitrary image
        # geometries, and the fused uint8 device path jit-compiles per
        # geometry — an unbounded compile surface.  Host preprocessing maps
        # everything onto the per-bucket programs that --warmup precompiles.
        self.engine = engine
        self._lanes: dict[str, _Lane] = {}
        if engine.config.has_text:
            self._lanes["text"] = _Lane(
                "text",
                lambda payloads, normalize: engine.encode_text(payloads, normalize=normalize),
                max_batch,
                max_wait_ms,
            )
        if engine.config.has_vision:
            self._lanes["image"] = _Lane(
                "image",
                lambda payloads, normalize: engine.encode_image(
                    payloads, normalize=normalize,
                    device_preprocess=device_preprocess),
                max_batch,
                max_wait_ms,
            )

    def submit_text(self, text: str, normalize: bool = True) -> Future:
        return self._lanes["text"].submit(text, normalize)

    def submit_image(self, image, normalize: bool = True) -> Future:
        return self._lanes["image"].submit(image, normalize)

    def encode_text(self, text: str, normalize: bool = True, timeout: float | None = 60.0):
        return self.submit_text(text, normalize).result(timeout)

    def encode_image(self, image, normalize: bool = True, timeout: float | None = 60.0):
        return self.submit_image(image, normalize).result(timeout)

    @property
    def stats(self) -> dict:
        return {
            name: {
                "requests": lane.stats.n_requests,
                "batches": lane.stats.n_batches,
                "mean_batch": lane.stats.mean_batch,
            }
            for name, lane in self._lanes.items()
        }

    def close(self) -> None:
        for lane in self._lanes.values():
            lane.stop()

    def __enter__(self) -> "ContinuousBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
