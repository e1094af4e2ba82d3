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


def test_multihost_batcher_single_process(tmp_path_factory, rng):
    """MultiHostBatcher's tick protocol (count allgather, bucket agreement,
    dummy-row padding, future resolution) on a single-process mesh; the real
    2-process HTTP path is scripts/multihost_serve_smoke.py."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device platform")
    from clip_tpu.parallel import make_mesh
    from clip_tpu.serving import MultiHostBatcher

    path, _ = tiny_gguf(tmp_path_factory.mktemp("mh"), use_f32=True)
    eng = ClipEngine(path, mesh=make_mesh(), verbosity=0)
    base = ClipEngine(path, verbosity=0)
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    with MultiHostBatcher(eng, max_local=8, tick_ms=5) as b:
        futs = [b.submit_text(t) for t in ("tok1", "tok2 tok1", "tok2")]
        fimg = b.submit_image(img)
        fraw = b.submit_text("tok1", normalize=False)
        got = np.stack([f.result(60) for f in futs])
        ref = base.encode_text(["tok1", "tok2 tok1", "tok2"])
        np.testing.assert_allclose(got, ref, **TOL)
        np.testing.assert_allclose(fimg.result(60), base.encode_image(img), **TOL)
        np.testing.assert_allclose(
            fraw.result(60), base.encode_text("tok1", normalize=False), **TOL)
        assert b.stats["text_norm"]["requests"] == 3
    base.close(); eng.close()


def test_multihost_batcher_bad_payload_is_host_local(tmp_path_factory, rng):
    """A malformed request must fail ITS OWN future before the tick's count
    allgather — never desynchronize the collective protocol (a post-count
    exception on one host would hang every other host in the collective)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device platform")
    from clip_tpu.parallel import make_mesh
    from clip_tpu.serving import MultiHostBatcher

    path, _ = tiny_gguf(tmp_path_factory.mktemp("mhbad"), use_f32=True)
    eng = ClipEngine(path, mesh=make_mesh(), verbosity=0)
    base = ClipEngine(path, verbosity=0)
    with MultiHostBatcher(eng, max_local=8, tick_ms=5) as b:
        bad = b.submit_text(123)                   # not a str / id list
        bad_img = b.submit_image("not an image")   # preprocess will raise
        good = b.submit_text("tok1")
        with pytest.raises(TypeError):
            bad.result(60)
        with pytest.raises(Exception):
            bad_img.result(60)
        # the cluster is still alive and serving
        np.testing.assert_allclose(
            good.result(60), base.encode_text("tok1"), **TOL)
        after = b.submit_text("tok2")
        np.testing.assert_allclose(
            after.result(60), base.encode_text("tok2"), **TOL)
    base.close(); eng.close()


# -- /v1/zsl over HTTP: label-set caching + templates -------------------------


@pytest.fixture()
def http_server(engine):
    """Real HTTP server on a free port over a ContinuousBatcher."""
    import http.client
    import json as _json
    import threading

    from clip_tpu.cli.serve import ZslLabelCache, _Server, make_handler

    with ContinuousBatcher(engine, max_batch=8, max_wait_ms=2) as b:
        cache = ZslLabelCache(b, timeout_s=60.0)
        server = _Server(("127.0.0.1", 0), make_handler(
            engine, b, 60.0, label_cache=cache))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()

        def post(path, obj):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", path, _json.dumps(obj),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            out = _json.loads(r.read())
            conn.close()
            return r.status, out

        try:
            yield post, b
        finally:
            server.shutdown()
            server.socket.close()


def _apple_b64():
    import base64

    with open(APPLE, "rb") as f:
        return base64.b64encode(f.read()).decode()


def test_zsl_endpoint_matches_engine_and_caches(engine, http_server):
    post, batcher = http_server
    labels = ["tok1 tok2", "tok2", "tok1"]
    b64 = _apple_b64()

    status, out = post("/v1/zsl", {"image_b64": b64, "labels": labels})
    assert status == 200
    # reference through the same data path as serving (host preprocess; the
    # engine's one-shot API would take the on-device-preprocess route, whose
    # bicubic differs at the last ulp — enough to flip a random-weight argsort)
    from clip_tpu.engine import softmax_with_sorting

    ivec = engine.encode_image(
        engine.preprocess([engine.load_image(APPLE)]),
        normalize=False, preprocessed=True)[0]
    tvecs = engine.encode_text(labels, normalize=False)
    ref_scores, ref_idx = softmax_with_sorting(tvecs @ ivec)
    assert out["labels"] == [labels[int(i)] for i in ref_idx]
    np.testing.assert_allclose(out["scores"], ref_scores, atol=1e-4)

    # label embeddings must be served from the cache: the text lane's request
    # count must NOT grow on repeat ZSL calls (only one more image encode)
    txt_before = batcher.stats["text"]["requests"]
    status, out2 = post("/v1/zsl", {"image_b64": b64, "labels": labels})
    assert status == 200 and out2["labels"] == out["labels"]
    assert batcher.stats["text"]["requests"] == txt_before


def test_zsl_endpoint_templates(engine, http_server):
    post, batcher = http_server
    labels = ["tok1 tok2", "tok2"]
    tpl = "a photo of a {}."
    status, out = post("/v1/zsl", {
        "image_b64": _apple_b64(), "labels": labels, "templates": tpl})
    assert status == 200
    from clip_tpu.engine import softmax_with_sorting

    ivec = engine.encode_image(
        engine.preprocess([engine.load_image(APPLE)]),
        normalize=True, preprocessed=True)[0]
    tvecs = engine.encode_class_names(labels, templates=tpl)
    ref_scores, ref_idx = softmax_with_sorting(100.0 * (tvecs @ ivec))
    assert out["labels"] == [labels[int(i)] for i in ref_idx]
    np.testing.assert_allclose(out["scores"], ref_scores, atol=1e-4)

    # distinct template spec = distinct cache entry; repeat hits the cache
    txt_before = batcher.stats["text"]["requests"]
    post("/v1/zsl", {"image_b64": _apple_b64(), "labels": labels,
                     "templates": tpl})
    assert batcher.stats["text"]["requests"] == txt_before


def test_zsl_endpoint_rejects_bad_requests(http_server):
    post, _ = http_server
    status, out = post("/v1/zsl", {"image_b64": _apple_b64(),
                                   "labels": ["only-one"]})
    assert status == 400 and "2 labels" in out["error"]
    status, out = post("/v1/zsl", {"image_b64": _apple_b64(),
                                   "labels": ["a", "b"],
                                   "templates": "no placeholder"})
    assert status == 400
