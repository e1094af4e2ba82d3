"""Two-process multi-host smoke test on CPU.

Validates the real ``jax.distributed`` path (coordinator handshake, global
device view, cross-process collective, per-host batch slicing) that the
virtual 8-device single-process mesh in tests/ cannot exercise.

Run:  python scripts/multihost_cpu_smoke.py              (launches all ranks)
      python scripts/multihost_cpu_smoke.py --nproc 3    (3 hosts: uneven data
          axis — pins the non-power-of-two collective row bucketing)
      python scripts/multihost_cpu_smoke.py --rank N ... (one rank, internal)
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

DEFAULT_NPROC = 2
MODEL = os.path.join(_REPO, ".cache", "entry_vit-b-32_q4_0_both.gguf")


def rank_main(rank: int, nproc: int, port: int, out_path: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clip_tpu.parallel import distributed

    distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=rank)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == nproc * 2, n_global  # 2 local devices per process

    mesh = Mesh(np.array(jax.devices()).reshape(n_global), ("data",))
    g_rows = 4 * nproc
    sl = distributed.host_local_batch_slice(g_rows)
    assert sl == slice(rank * 4, rank * 4 + 4), sl

    # global array from per-host shards + a cross-process collective
    local = np.full((4, 16), float(rank + 1), np.float32)
    sharding = NamedSharding(mesh, P("data"))
    garr = jax.make_array_from_process_local_data(sharding, local, (g_rows, 16))

    @jax.jit
    def total(x):
        return jnp.sum(x)

    out = float(total(garr))
    expected = sum(4 * 16 * (r + 1.0) for r in range(nproc))
    assert out == expected, (out, expected)

    # full sharded vision encode across processes: every host loads the same
    # checkpoint, weights are sharded over the global mesh, each host feeds
    # its slice of the global pixel batch
    import functools

    from clip_tpu.gguf import GGUFReader
    from clip_tpu.models.config import ClipConfig
    from clip_tpu.models.params import load_params
    from clip_tpu.models.vision import encode_image
    from clip_tpu.parallel import make_mesh, shard_params

    # the launcher creates the checkpoint before spawning ranks (no race)
    reader = GGUFReader(MODEL)
    cfg = ClipConfig.from_gguf(reader)
    # 2-way DP x nproc-way TP with the model axis spanning ALL processes
    # (device grid transposed), so attention/MLP weight shards live on
    # different hosts and XLA inserts cross-process collectives inside the
    # towers — the hardest layout to get right.  (nproc=3: TP=3 divides the
    # vision tower's 12 heads; only vision is encoded here.)
    grid = np.array(jax.devices()).reshape(nproc, 2).T
    gmesh = Mesh(grid, ("data", "model"))
    params = shard_params(
        load_params(reader, cfg, keep_quantized=True, dtype=jnp.float32), gmesh)

    rng = np.random.default_rng(0)
    gpix = rng.normal(size=(8, 224, 224, 3)).astype(np.float32)  # global batch
    px_shard = NamedSharding(gmesh, P("data"))
    # with TP spanning processes, every host addresses a model-shard of every
    # data shard, so each host supplies the full batch (the API slices out
    # the locally-addressable pieces)
    pixels = jax.make_array_from_process_local_data(px_shard, gpix, (8, 224, 224, 3))

    fn = jax.jit(functools.partial(
        encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu, normalize=True))
    from jax.experimental import multihost_utils

    out_g = fn(params["vision"], pixels=pixels)   # sharded global [8, D]
    emb = np.asarray(multihost_utils.process_allgather(out_g, tiled=True))
    if rank == 0:
        with open(out_path, "wb") as f:  # per-run path from the launcher
            np.save(f, emb)
    print(f"rank {rank}: process_count={jax.process_count()} "
          f"devices={n_global} global_sum={out} encode={emb.shape} OK", flush=True)


def _single_process_reference() -> "np.ndarray":
    import jax

    jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from clip_tpu.gguf import GGUFReader
    from clip_tpu.models.config import ClipConfig
    from clip_tpu.models.params import load_params
    from clip_tpu.models.vision import encode_image

    reader = GGUFReader(MODEL)
    cfg = ClipConfig.from_gguf(reader)
    params = load_params(reader, cfg, keep_quantized=True, dtype=np.float32)["vision"]
    gpix = np.random.default_rng(0).normal(size=(8, 224, 224, 3)).astype(np.float32)
    fn = jax.jit(functools.partial(
        encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu, normalize=True))
    return np.asarray(fn(params, pixels=gpix))


def main() -> int:
    nproc = (int(sys.argv[sys.argv.index("--nproc") + 1])
             if "--nproc" in sys.argv else DEFAULT_NPROC)
    if "--rank" in sys.argv:
        rank_main(int(sys.argv[sys.argv.index("--rank") + 1]), nproc,
                  int(sys.argv[sys.argv.index("--port") + 1]),
                  sys.argv[sys.argv.index("--out") + 1])
        return 0

    if not os.path.exists(MODEL):
        os.makedirs(os.path.dirname(MODEL), exist_ok=True)
        from clip_tpu.synth import make_synthetic_gguf
        make_synthetic_gguf(MODEL, "ViT-B/32", ftype="q4_0", towers="both")

    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    # per-run result file: a fixed /tmp path could race with a stale or
    # concurrent run
    import tempfile
    fd, out_path = tempfile.mkstemp(suffix=".npy", prefix="multihost_emb_")
    os.close(fd)

    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__),
                          "--rank", str(r), "--nproc", str(nproc),
                          "--port", str(port), "--out", out_path])
        for r in range(nproc)
    ]
    try:
        codes = [p.wait(timeout=300) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        os.unlink(out_path)
        print("FAILED: rank hang (coordinator handshake or collective stall)",
              file=sys.stderr)
        return 1
    if any(codes):
        os.unlink(out_path)
        print(f"FAILED: exit codes {codes}", file=sys.stderr)
        return 1

    import numpy as np
    mh = np.load(out_path)
    os.unlink(out_path)
    ref = _single_process_reference()
    maxdiff = float(np.abs(mh - ref).max())
    print(f"multihost vs single-process maxdiff: {maxdiff:.2e}")
    if maxdiff > 5e-6:
        print("FAILED: multi-host encode diverges from single-process",
              file=sys.stderr)
        return 1
    print("multihost_cpu_smoke: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
