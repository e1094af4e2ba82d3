"""Continuous-batcher tests: correctness under concurrency, batching
effectiveness, stats, shutdown."""

import concurrent.futures
import threading

import jax
import numpy as np

from conftest import NORM_ATOL, ON_TPU, TOL
import pytest

from clip_tpu import ClipEngine
from clip_tpu.serving import ContinuousBatcher

from hf_fixtures import tiny_gguf

APPLE = "/root/reference/tests/red_apple.jpg"


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path, _ = tiny_gguf(tmp_path_factory.mktemp("serv"), use_f32=True)
    return ClipEngine(path, verbosity=0)


def test_single_requests_match_engine(engine):
    with ContinuousBatcher(engine, max_batch=8, max_wait_ms=2) as b:
        v = b.encode_text("tok1 tok2")
        ref = engine.encode_text("tok1 tok2")
        np.testing.assert_allclose(v, ref, **TOL)

        img = engine.load_image(APPLE)
        vi = b.encode_image(img)
        refi = engine.encode_image(img)
        np.testing.assert_allclose(vi, refi, **TOL)


def test_concurrent_requests_are_batched(engine):
    with ContinuousBatcher(engine, max_batch=16, max_wait_ms=50) as b:
        start = threading.Barrier(9)

        def worker(i):
            start.wait()
            return b.encode_text(f"tok{i}")

        with concurrent.futures.ThreadPoolExecutor(9) as ex:
            # one extra slot for the barrier release
            futs = [ex.submit(worker, i) for i in range(8)]
            start.wait()
            outs = [f.result(60) for f in futs]

        refs = [engine.encode_text(f"tok{i}") for i in range(8)]
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(o, r, **TOL)
        stats = b.stats["text"]
        assert stats["requests"] == 8
        assert stats["batches"] < 8, f"no batching happened: {stats}"


def test_mixed_normalize_flags(engine):
    with ContinuousBatcher(engine, max_batch=8, max_wait_ms=20) as b:
        f1 = b.submit_text("tok1", normalize=True)
        f2 = b.submit_text("tok1", normalize=False)
        v1, v2 = f1.result(60), f2.result(60)
        assert abs(np.linalg.norm(v1) - 1.0) < NORM_ATOL
        assert abs(np.linalg.norm(v2) - 1.0) > 1e-3


def test_error_propagation(engine):
    with ContinuousBatcher(engine, max_batch=4, max_wait_ms=2) as b:
        fut = b.submit_image("/nonexistent/path.jpg")
        with pytest.raises(Exception):
            fut.result(30)
        # lane survives the error
        v = b.encode_text("tok1")
        assert v.shape == (32,)
