"""Multi-host initialization.

The reference is strictly single-process (SURVEY.md §2.2: pthreads only).
Here multi-host runs use JAX's distributed runtime: every host calls
:func:`initialize` early, then builds the global ``(data, model)`` mesh over
``jax.devices()`` — pjit/XLA SPMD handle cross-host collectives over ICI
within a slice and DCN across slices; per-host input pipelines feed each
host's shard of the global batch (``host_local_batch_slice``).
"""

from __future__ import annotations

import os


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Call once per host before any JAX computation.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) and to JAX's automatic cluster
    detection on TPU pods (GCE metadata), where calling with no arguments is
    enough.
    """
    import jax

    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    n = num_processes if num_processes is not None else os.environ.get("JAX_NUM_PROCESSES")
    if n is not None:
        kwargs["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def host_local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch (data-parallel feeding)."""
    import jax

    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
