"""Measure the shard_map execution path's overhead on a 1-device mesh.

The multi-chip design claim is that `jax.shard_map` keeps the fused Pallas
kernels (vs pjit's XLA fallback); this quantifies the wrapper's own cost on
whatever hardware is present: same model, same batch, plain engine vs a
1-device (data=1, model=1) mesh engine — collectives are no-ops, so any
delta is pure shard_map overhead.

Run: python scripts/bench_shardmap_overhead.py [batch]

Caveat: through the axon relay the engine-level loop is host->device
transfer-dominated; the measured delta is still like-for-like, but for a
compute-bound number time the jitted fns with device-resident inputs
(measured on real TPU: -0.2% at B=256 — see PERF_NOTES).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 448

    from clip_tpu.engine import ClipEngine
    from clip_tpu.parallel import make_mesh
    from clip_tpu.synth import make_synthetic_gguf

    path = os.path.join(_REPO, ".cache", "bench_vit-b-32_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, "ViT-B/32", ftype="q4_0", towers="vision")

    rng = np.random.default_rng(0)
    px = rng.normal(size=(batch, 224, 224, 3)).astype(np.float32)

    import jax

    # scan config: unroll+shard_map compiles pathologically slowly through
    # the axon relay (observed >590 s / relay wedge); scan compiles in <60 s
    # and the overhead conclusion is the same
    plain = ClipEngine(path, verbosity=0)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    spmd = ClipEngine(path, mesh=mesh, verbosity=0)
    assert spmd._spmd, "1-device mesh must take the shard_map path"

    a = plain.encode_image(px[:8], normalize=True, preprocessed=True)
    b = spmd.encode_image(px[:8], normalize=True, preprocessed=True)
    print(f"maxdiff plain vs shard_map: {np.abs(a - b).max():.2e}")

    def rt(eng):
        t0 = time.perf_counter()
        for _ in range(8):
            eng.encode_image(px, normalize=True, preprocessed=True)
        return (time.perf_counter() - t0) / 8

    rt(plain), rt(spmd)  # warm
    ra, rb = [], []
    for _ in range(6):
        ra.append(rt(plain))
        rb.append(rt(spmd))
    ma, mb = statistics.median(ra), statistics.median(rb)
    print(f"plain engine   : {ma*1e3:7.2f} ms -> {batch/ma:6.0f} img/s")
    print(f"shard_map mesh : {mb*1e3:7.2f} ms -> {batch/mb:6.0f} img/s "
          f"(overhead {(mb/ma-1)*100:+.1f}%)")
    plain.close()
    spmd.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
