"""Multi-host end-to-end smokes as CI tests.

Each runs entirely in subprocesses (the launchers force the CPU backend and
spawn real ``jax.distributed`` ranks), so this file is backend-agnostic and
safe in TPU test mode.
"""

import os
import subprocess
import sys

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _run(script: str) -> None:
    r = subprocess.run(
        [sys.executable, os.path.join(_SCRIPTS, script)],
        capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"


def test_multihost_serve_smoke():
    """2 `serve --distributed` ranks over one global mesh: concurrent HTTP
    requests on both hosts co-batched collectively, responses matching a
    single-process engine, cluster-wide /shutdown."""
    _run("multihost_serve_smoke.py")


def test_multihost_encode_smoke():
    """2 jax.distributed ranks, DP x TP with the model axis spanning
    processes; sharded q4_0 encode vs single-process."""
    _run("multihost_cpu_smoke.py")
