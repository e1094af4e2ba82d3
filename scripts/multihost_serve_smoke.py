"""Two-host HTTP serving smoke test on CPU (real jax.distributed).

Validates the full multi-host serving path end to end: two `clip-tpu-serve
--distributed` processes (2 virtual CPU devices each) join one jax.distributed
cluster, each serves HTTP on its own port, concurrent requests ingested on
BOTH hosts are co-batched over the one global mesh by MultiHostBatcher, and
every response must match a single-process engine bit-for-bit (CPU f32).
A single POST /shutdown to one host must stop the whole cluster.

Run:  python scripts/multihost_serve_smoke.py
      python scripts/multihost_serve_smoke.py --nproc 3   (3 hosts: pins the
          non-power-of-two collective row bucketing in engine._collective_rows)
"""

from __future__ import annotations

import base64
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

DEFAULT_NPROC = 2
MODEL = os.path.join(_REPO, ".cache", "entry_vit-b-32_q4_0_both.gguf")

TEXTS_BY_RANK = [
    ["a photo of an apple", "the red cat", "w0 s1 w2"],
    ["apple photo", "dog"],
    ["a third host speaks", "w9"],
]


def rank_main(rank: int, nproc: int, coord_port: int, http_port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from clip_tpu.cli import serve

    sys.exit(serve.main([
        "-m", MODEL, "--host", "127.0.0.1", "--port", str(http_port),
        "--distributed", "--coordinator", f"127.0.0.1:{coord_port}",
        "--num-processes", str(nproc), "--process-id", str(rank),
        "--allow-shutdown", "--max-wait-ms", "20", "-v", "0",
    ]))


def _post(port: int, path: str, obj) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def _wait_healthy(port: int, deadline: float) -> None:
    while time.monotonic() < deadline:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=2
            ) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(0.5)
    raise TimeoutError(f"rank on port {port} never became healthy")


def _free_ports(n: int) -> list[int]:
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def _make_images(tmpdir: str) -> list[str]:
    """Two deterministic PNGs; returns base64 file bytes."""
    import numpy as np
    from PIL import Image

    out = []
    for i in range(2):
        h, w = 240 + 8 * i, 300
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack([
            (xx * 255 // (w - 1)).astype(np.uint8),
            (yy * 255 // (h - 1)).astype(np.uint8),
            ((xx + yy * (i + 1)) % 256).astype(np.uint8),
        ], axis=-1)
        p = os.path.join(tmpdir, f"serve_img_{i}.png")
        Image.fromarray(arr).save(p)
        with open(p, "rb") as f:
            out.append(base64.b64encode(f.read()).decode())
    return out


def _single_process_reference(texts, image_b64s):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from clip_tpu.cli.serve import _decode_image
    from clip_tpu.engine import ClipEngine

    eng = ClipEngine(MODEL, verbosity=0)
    txt = eng.encode_text(texts, normalize=True)
    imgs = [_decode_image(b) for b in image_b64s]
    img = eng.encode_image(eng.preprocess(imgs), normalize=True, preprocessed=True)
    eng.close()
    return np.asarray(txt), np.asarray(img)


def main() -> int:
    nproc = (int(sys.argv[sys.argv.index("--nproc") + 1])
             if "--nproc" in sys.argv else DEFAULT_NPROC)
    if "--rank" in sys.argv:
        i = sys.argv.index
        rank_main(int(sys.argv[i("--rank") + 1]), nproc,
                  int(sys.argv[i("--port") + 1]),
                  int(sys.argv[i("--http") + 1]))
        return 0

    if not os.path.exists(MODEL):
        os.makedirs(os.path.dirname(MODEL), exist_ok=True)
        from clip_tpu.synth import make_synthetic_gguf
        make_synthetic_gguf(MODEL, "ViT-B/32", ftype="q4_0", towers="both")

    import tempfile

    import numpy as np

    coord_port, *http_ports = _free_ports(1 + nproc)
    tmpdir = tempfile.mkdtemp(prefix="mh_serve_")
    image_b64s = _make_images(tmpdir)

    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__),
                          "--rank", str(r), "--nproc", str(nproc),
                          "--port", str(coord_port),
                          "--http", str(http_ports[r])])
        for r in range(nproc)
    ]
    try:
        deadline = time.monotonic() + 240
        for p in http_ports:
            _wait_healthy(p, deadline)

        # concurrent requests to BOTH hosts: text on each, images on rank 1
        results: dict = {}
        errors: list = []

        def ask(key, port, path, obj):
            try:
                results[key] = _post(port, path, obj)
            except Exception as e:
                errors.append((key, e))

        threads = [
            threading.Thread(target=ask, args=(
                f"t{r}", http_ports[r], "/v1/embed/text",
                {"texts": TEXTS_BY_RANK[r]}))
            for r in range(nproc)
        ] + [
            threading.Thread(target=ask, args=(
                "i1", http_ports[1], "/v1/embed/image", {"images_b64": image_b64s})),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        if errors:
            raise RuntimeError(f"request errors: {errors}")

        all_texts = [t for r in range(nproc) for t in TEXTS_BY_RANK[r]]
        got_txt = np.asarray(
            [v for r in range(nproc) for v in results[f"t{r}"]["embeddings"]],
            np.float32)
        got_img = np.asarray(results["i1"]["embeddings"], np.float32)

        ref_txt, ref_img = _single_process_reference(all_texts, image_b64s)
        dt = float(np.abs(got_txt - ref_txt).max())
        di = float(np.abs(got_img - ref_img).max())
        print(f"text maxdiff {dt:.2e}, image maxdiff {di:.2e}")
        if dt > 5e-5 or di > 5e-5:
            print("FAILED: multi-host serving diverges from single-process",
                  file=sys.stderr)
            return 1

        # one shutdown stops the whole cluster
        _post(http_ports[0], "/shutdown", {})
        codes = [p.wait(timeout=60) for p in procs]
        if any(codes):
            print(f"FAILED: nonzero exit codes {codes}", file=sys.stderr)
            return 1
        print("multihost_serve_smoke: OK")
        return 0
    except Exception:
        for p in procs:
            if p.poll() is None:
                p.kill()
        raise


if __name__ == "__main__":
    sys.exit(main())
