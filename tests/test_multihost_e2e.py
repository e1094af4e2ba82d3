"""Multi-host end-to-end smokes as CI tests.

Each runs entirely in subprocesses (the launchers force the CPU backend and
spawn real ``jax.distributed`` ranks), so this file is backend-agnostic and
safe in TPU test mode.
"""

import os
import signal
import subprocess
import sys

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _run(script: str, *args: str) -> None:
    # own session/process group: on timeout, kill the WHOLE group so the
    # launcher's jax.distributed rank subprocesses can't leak as orphans
    # (subprocess.run's timeout only kills the launcher)
    p = subprocess.Popen(
        [sys.executable, os.path.join(_SCRIPTS, script), *args],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True,
    )
    try:
        out, err = p.communicate(timeout=540)
    except subprocess.TimeoutExpired:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        out, err = p.communicate()
        raise AssertionError(f"{script} timed out:\n{out}\n{err}")
    assert p.returncode == 0, f"{script} failed:\n{out}\n{err}"


def test_multihost_serve_smoke():
    """2 `serve --distributed` ranks over one global mesh: concurrent HTTP
    requests on both hosts co-batched collectively, responses matching a
    single-process engine, cluster-wide /shutdown."""
    _run("multihost_serve_smoke.py")


def test_multihost_encode_smoke():
    """2 jax.distributed ranks, DP x TP with the model axis spanning
    processes; sharded q4_0 encode vs single-process."""
    _run("multihost_cpu_smoke.py")


def test_multihost_serve_smoke_3proc():
    """3 serve --distributed ranks: a non-power-of-two host count exercises
    the collective row bucketing (engine._collective_rows) whose original
    bug only appeared when nproc does not divide the bucket ladder."""
    _run("multihost_serve_smoke.py", "--nproc", "3")


def test_multihost_encode_smoke_3proc():
    """3 jax.distributed ranks, DP=2 x TP=3 spanning processes (TP=3 divides
    the vision tower's 12 heads): uneven-host sharded encode bit-matches
    single-process."""
    _run("multihost_cpu_smoke.py", "--nproc", "3")
