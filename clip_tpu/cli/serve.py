"""``serve``: HTTP embedding server with continuous batching.

Endpoints (JSON):
  POST /v1/embed/text   {"texts": ["...", ...], "normalize": true}
  POST /v1/embed/image  {"images_b64": ["<base64 file bytes>", ...], "normalize": true}
  POST /v1/zsl          {"image_b64": "...", "labels": ["...", ...]}
  GET  /healthz, GET /stats

Concurrent requests from many clients are merged into device batches by
clip_tpu.serving.ContinuousBatcher, keeping the chip saturated.

Multi-host mode (``--distributed``): every host of a jax.distributed cluster
runs this server on its own port; requests ingested anywhere are encoded
collectively over the ONE global (data, model) mesh via
clip_tpu.serving.MultiHostBatcher (each host feeds its slice of the global
batch).  Shutting any host down stops the whole cluster cleanly.
"""

from __future__ import annotations

import base64
import io
import json
import sys
import threading
from collections import OrderedDict
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..engine import ClipEngine, softmax_with_sorting
from ..serving import ContinuousBatcher, MultiHostBatcher
from ..templates import resolve_templates
from .common import base_parser


class _Server(ThreadingHTTPServer):
    # the stdlib default backlog of 5 RSTs bursts of concurrent clients
    request_queue_size = 128


def _decode_image(b64: str) -> np.ndarray:
    from PIL import Image

    raw = base64.b64decode(b64)
    with Image.open(io.BytesIO(raw)) as im:
        return np.asarray(im.convert("RGB"))


class ZslLabelCache:
    """Label-set embedding cache for ``/v1/zsl``.

    Without it, N labels cost a fresh text encode on EVERY request — a
    zero-shot classifier serves one fixed label set for millions of images,
    so the text side should be paid once per label set, not per request.
    Embeddings are computed through the *batcher* (handler threads must not
    touch the engine directly: in --distributed mode only the tick driver may
    issue collectives), keyed by (labels, templates), LRU-bounded.  In-flight
    computes are shared via a Future so a burst of identical first requests
    encodes once.
    """

    def __init__(self, batcher, maxsize: int = 128, timeout_s: float = 600.0):
        self._batcher = batcher
        self._maxsize = maxsize
        self._timeout = timeout_s
        self._lock = threading.Lock()
        self._cache: "OrderedDict[tuple, Future]" = OrderedDict()

    def get(self, labels, tpl) -> np.ndarray:
        """Normalized-or-raw label matrix [C, D] (raw when tpl is None,
        matching ClipEngine.zero_shot_label_image's reference-parity default;
        ensembled+normalized otherwise)."""
        key = (tuple(labels), tpl)
        owner = False
        with self._lock:
            fut = self._cache.get(key)
            if fut is not None:
                self._cache.move_to_end(key)
            else:
                fut = Future()
                owner = True
                self._cache[key] = fut
                while len(self._cache) > self._maxsize:
                    self._cache.popitem(last=False)
        if owner:
            try:
                fut.set_result(self._compute(labels, tpl))
            except Exception as e:  # noqa: BLE001 — propagate to all waiters
                with self._lock:
                    if self._cache.get(key) is fut:
                        del self._cache[key]  # don't cache failures
                fut.set_exception(e)
        return fut.result(self._timeout)

    def _compute(self, labels, tpl) -> np.ndarray:
        if tpl is None:
            futs = [self._batcher.submit_text(t, False) for t in labels]
            return np.stack([np.asarray(f.result(self._timeout)) for f in futs])
        prompts = [t.format(n) for n in labels for t in tpl]
        futs = [self._batcher.submit_text(p, True) for p in prompts]
        vecs = np.stack([np.asarray(f.result(self._timeout)) for f in futs])
        vecs = vecs.reshape(len(labels), len(tpl), -1).mean(axis=1)
        vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
        return vecs.astype(np.float32)


def make_handler(engine: ClipEngine, batcher, timeout_s: float = 600.0,
                 shutdown_cb=None, label_cache: "ZslLabelCache | None" = None):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            try:
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionResetError):
                # client hung up (load-test teardown, impatient caller) —
                # the request was served; don't spam a traceback per socket
                pass

        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": engine.config.name})
            elif self.path == "/stats":
                self._send(200, batcher.stats)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/embed/text":
                    norm = bool(req.get("normalize", True))
                    futs = [batcher.submit_text(t, norm) for t in req["texts"]]
                    vecs = [f.result(timeout_s).tolist() for f in futs]
                    self._send(200, {"embeddings": vecs})
                elif self.path == "/v1/embed/image":
                    norm = bool(req.get("normalize", True))
                    imgs = [_decode_image(b) for b in req["images_b64"]]
                    futs = [batcher.submit_image(im, norm) for im in imgs]
                    vecs = [f.result(timeout_s).tolist() for f in futs]
                    self._send(200, {"embeddings": vecs})
                elif self.path == "/shutdown" and shutdown_cb is not None:
                    self._send(200, {"status": "shutting down"})
                    shutdown_cb()
                elif self.path == "/v1/zsl":
                    img = _decode_image(req["image_b64"])
                    labels = req["labels"]
                    if len(labels) < 2:
                        raise ValueError("zsl needs at least 2 labels")
                    # 'templates': null (reference parity: raw labels,
                    # unnormalized scores), a named set ('basic'/'openai'),
                    # one template string, or a list — engine.zero_shot_
                    # label_image semantics over HTTP
                    tpl = resolve_templates(req.get("templates"))
                    cache = label_cache or ZslLabelCache(batcher,
                                                         timeout_s=timeout_s)
                    tvecs = cache.get(labels, tpl)
                    ivec = batcher.submit_image(
                        img, tpl is not None).result(timeout_s)
                    sims = tvecs @ ivec
                    if tpl is not None:
                        sims = 100.0 * sims  # CLIP logit scale (normalized)
                    scores, idx = softmax_with_sorting(sims)
                    self._send(200, {
                        "labels": [labels[int(i)] for i in idx],
                        "scores": [float(s) for s in scores],
                    })
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:
                print(f"request error on {self.path}: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
                try:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client gave up; the server-side log line above remains

    return Handler


def _warmup(engine: ClipEngine, max_batch: int) -> None:
    """Precompile every (bucket, normalize) program a request could hit:
    powers of two up to max_batch plus the bucket max_batch itself rounds to
    (non-power-of-two --max-batch), for both normalize variants (/v1/zsl
    uses normalize=False)."""
    import time as _time

    size = engine.image_size if engine.config.has_vision else 0
    buckets = []
    b = 1
    while b <= max_batch:
        buckets.append(b)
        b *= 2
    top = engine._bucket(max_batch)
    if top not in buckets:
        buckets.append(top)
    for b in buckets:
        t0 = _time.perf_counter()
        for normalize in (True, False):
            if engine.config.has_vision:
                engine.encode_image(np.zeros((b, size, size, 3), np.float32),
                                    normalize=normalize)
            if engine.config.has_text:
                engine.encode_text(["warmup"] * b, normalize=normalize)
        print(f"warmup: bucket {b} compiled in {_time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)


def _warmup_distributed(engine: ClipEngine, max_local: int) -> None:
    """Collective warmup: every host runs the same bucket ladder in the same
    order (single-host encode_* cannot feed a cross-process mesh)."""
    import time as _time

    b = 1
    buckets = []
    while b <= max_local:
        buckets.append(b)
        b *= 2
    if max_local not in buckets:
        # non-power-of-two --max-batch: also warm the top shape the
        # collective bucketing rounds a full tick to
        buckets.append(max_local)
    size = engine.image_size if engine.config.has_vision else 0
    for b in buckets:
        t0 = _time.perf_counter()
        for normalize in (True, False):
            if engine.config.has_vision:
                engine.encode_image_collective(
                    np.zeros((b, size, size, 3), np.float32), normalize=normalize)
            if engine.config.has_text:
                engine.encode_text_collective(["warmup"] * b, normalize=normalize)
        print(f"warmup: local bucket {b} compiled in {_time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)


def main(argv=None) -> int:
    p = base_parser("clip-tpu-serve", __doc__, needs_text=False, needs_image=False)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8090)
    p.add_argument("--request-timeout", type=float, default=600.0,
                   help="seconds a request waits for its batch result "
                        "(first request on a cold process includes XLA compile)")
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--unroll", action="store_true",
                   help="unroll the layer stack: slower first compile, "
                        "slightly faster steady-state throughput")
    p.add_argument("--dense-weights", action="store_true",
                   help="dequantize weights to the compute dtype at load "
                        "(throughput mode: ~8%% faster steady state than "
                        "quantized-in-HBM, at 4x the weight memory)")
    p.add_argument("--device-preprocess", action="store_true",
                   help="fused uint8 on-device preprocessing (compiles per "
                        "input geometry — only for fixed-size clients)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile every batch bucket up to --max-batch at "
                        "startup so no request ever waits on XLA")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host serving: join a jax.distributed cluster "
                        "(see --coordinator/--num-processes/--process-id or "
                        "the JAX_* env vars) and batch requests over the "
                        "global mesh")
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port (distributed mode)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--allow-shutdown", action="store_true",
                   help="enable POST /shutdown (stops every host of a "
                        "distributed cluster together)")
    args = p.parse_args(argv)

    import threading

    mesh = None
    if args.distributed:
        from ..parallel import distributed, make_mesh

        distributed.initialize(args.coordinator, args.num_processes, args.process_id)
        mesh = make_mesh()

    engine = ClipEngine(args.model, verbosity=args.verbosity, unroll=args.unroll,
                        mesh=mesh, use_mesh=args.use_mesh and not args.distributed,
                        keep_quantized=not args.dense_weights,
                        act_quant=args.act_quant,
                        lnq_fuse=args.lnq_fuse)

    server_holder: list = []
    server_ready = threading.Event()

    def stop_all():
        # shut the HTTP loop down off-thread (shutdown() from a handler
        # thread deadlocks serve_forever); wait for the server to exist —
        # another host's stop can propagate through the tick loop before
        # this host has finished binding
        def _do():
            if server_ready.wait(timeout=600) and server_holder:
                server_holder[0].shutdown()
        threading.Thread(target=_do, daemon=True).start()

    if args.distributed:
        if args.device_preprocess:
            print("warning: --device-preprocess is not supported in "
                  "--distributed mode (the multi-host batcher host-"
                  "preprocesses so every rank sees one compiled geometry); "
                  "ignoring", file=sys.stderr)
        if args.warmup:
            # BEFORE the batcher: its tick loop issues collectives from the
            # driver thread, and two threads doing collectives deadlock
            _warmup_distributed(engine, args.max_batch)
        batcher = MultiHostBatcher(engine, max_local=args.max_batch,
                                   tick_ms=args.max_wait_ms, on_stop=stop_all)

        def request_shutdown():
            batcher._stop.set()  # the tick loop broadcasts it to every host
    else:
        batcher = ContinuousBatcher(engine, max_batch=args.max_batch,
                                    max_wait_ms=args.max_wait_ms,
                                    device_preprocess=args.device_preprocess)
        request_shutdown = stop_all

    with batcher:
        # bind before warmup: fail fast on a busy port instead of after
        # minutes of compilation
        server = _Server((args.host, args.port), make_handler(
            engine, batcher, args.request_timeout,
            shutdown_cb=request_shutdown if args.allow_shutdown else None,
            label_cache=ZslLabelCache(batcher, timeout_s=args.request_timeout)))
        server_holder.append(server)
        server_ready.set()
        if args.warmup and not args.distributed:
            if args.device_preprocess:
                print("warning: --warmup cannot precompile the "
                      "--device-preprocess image path (it compiles per "
                      "client image geometry); only text and the host-"
                      "preprocess fallback are warmed", file=sys.stderr)
            _warmup(engine, args.max_batch)
        print(f"serving {args.model} on http://{args.host}:{args.port}", file=sys.stderr)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            if args.distributed:
                batcher._stop.set()
        finally:
            server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
