"""Engine API tests: the clip.h-equivalent surface end-to-end on a tiny
checkpoint, including ZSL semantics, bucketing, and thread safety."""

import concurrent.futures

import jax
import numpy as np
import pytest

from clip_tpu import ClipEngine, similarity_score, softmax_with_sorting

from hf_fixtures import tiny_gguf

FIXTURE_APPLE = "/root/reference/tests/red_apple.jpg"
FIXTURE_WHITE = "/root/reference/tests/white.jpg"


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine")
    path, _ = tiny_gguf(tmp, use_f32=True)
    return ClipEngine(path, verbosity=0)


def test_hparams(engine):
    assert engine.text_hparams.num_positions == 16
    assert engine.vision_hparams.image_size == 28
    assert engine.projection_dim == 32


def test_tokenize_truncates_to_context(engine):
    ids = engine.tokenize("tok1 " * 100)
    assert len(ids) <= 16


from conftest import NORM_ATOL, ON_TPU, TOL


def test_encode_text_single_vs_batch(engine):
    single = engine.encode_text("tok1 tok2")
    batch = engine.encode_text(["tok1 tok2", "tok3"])
    assert single.shape == (32,)
    assert batch.shape == (2, 32)
    np.testing.assert_allclose(batch[0], single, **TOL)


def test_encode_text_token_ids_input(engine):
    ids = engine.tokenize("tok1 tok2")
    np.testing.assert_allclose(
        engine.encode_text(ids), engine.encode_text("tok1 tok2"), **TOL
    )


def test_bucketing_invariance(engine):
    """Padding a batch of 3 to bucket 4 must not change results."""
    texts = ["tok1", "tok2", "tok3"]
    b3 = engine.encode_text(texts)
    b1 = np.stack([engine.encode_text(t) for t in texts])
    np.testing.assert_allclose(b3, b1, **TOL)


def test_encode_image_paths_and_arrays(engine, rng):
    v1 = engine.encode_image(FIXTURE_APPLE)
    assert v1.shape == (32,)
    arr = engine.load_image(FIXTURE_APPLE)
    v2 = engine.encode_image(arr)
    np.testing.assert_allclose(v1, v2, **TOL)
    batch = engine.encode_image([FIXTURE_APPLE, FIXTURE_WHITE])
    assert batch.shape == (2, 32)
    np.testing.assert_allclose(batch[0], v1, **TOL)
    # different images -> different embeddings
    assert np.abs(batch[0] - batch[1]).max() > 1e-4


def test_normalized_outputs(engine):
    v = engine.encode_text("tok1", normalize=True)
    assert abs(np.linalg.norm(v) - 1.0) < NORM_ATOL
    v = engine.encode_image(FIXTURE_APPLE, normalize=True)
    assert abs(np.linalg.norm(v) - 1.0) < NORM_ATOL


def test_compare_text_and_image(engine):
    score = engine.compare_text_and_image("tok1 tok2", FIXTURE_APPLE)
    assert -1.0 <= score <= 1.0


def test_zero_shot_label_image(engine):
    scores, idx = engine.zero_shot_label_image(FIXTURE_APPLE, ["tok1", "tok2", "tok3"])
    assert scores.shape == (3,) and idx.shape == (3,)
    assert np.all(np.diff(scores) <= 0)  # sorted descending
    assert abs(scores.sum() - 1.0) < 1e-5
    assert set(idx.tolist()) == {0, 1, 2}
    with pytest.raises(ValueError):
        engine.zero_shot_label_image(FIXTURE_APPLE, ["only-one"])


def test_softmax_with_sorting_matches_reference_semantics():
    scores, idx = softmax_with_sorting([1.0, 3.0, 2.0])
    e = np.exp([1.0, 3.0, 2.0]) + 1e-9
    p = e / e.sum()
    np.testing.assert_allclose(scores, np.sort(p)[::-1], rtol=1e-6)
    assert idx.tolist() == [1, 2, 0]


def test_similarity_score_is_dot():
    assert similarity_score([1, 0, 2], [3, 1, 1]) == pytest.approx(5.0)


def test_thread_safety(engine):
    """The reference's clip_ctx is not reentrant; the engine must be."""
    def work(i):
        return engine.encode_text(f"tok{i % 5}")

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(work, range(8)))
    base = [engine.encode_text(f"tok{i % 5}") for i in range(8)]
    for a, b in zip(outs, base):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_encode_class_names_templates(engine):
    from clip_tpu.templates import resolve_templates

    names = ["cat", "dog"]
    plain = engine.encode_class_names(names)
    ens = engine.encode_class_names(names, templates="basic")
    assert ens.shape == plain.shape
    # ensembled embeddings are L2-normalized
    assert np.allclose(np.linalg.norm(ens, axis=-1), 1.0, atol=1e-5)
    # plain path == reference protocol (raw class names, normalized)
    assert np.allclose(plain, engine.encode_text(names, normalize=True), atol=1e-6)
    # custom single template
    one = engine.encode_class_names(names, templates="a photo of a {}.")
    assert one.shape == plain.shape
    # bad templates rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        resolve_templates("no placeholder here")


def test_zsl_with_templates(engine, rng):
    img = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    scores, idx = engine.zero_shot_label_image(img, ["a", "b", "c"], templates="basic")
    assert len(scores) == 3 and abs(float(scores.sum()) - 1.0) < 1e-3
    assert sorted(idx.tolist()) == [0, 1, 2]


def test_encode_text_numpy_token_ids(engine):
    ids = engine.tokenize("hello world")
    a = engine.encode_text(ids)
    b = engine.encode_text(list(np.asarray(ids, np.int32)))  # numpy ints
    np.testing.assert_array_equal(a, b)


def test_encode_determinism(engine, rng):
    """SURVEY §5: determinism checks take the role of the reference's
    sanitizers — identical inputs must produce bitwise-identical outputs."""
    img = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
    a1 = engine.encode_image([img])
    a2 = engine.encode_image([img])
    np.testing.assert_array_equal(a1, a2)
    t1 = engine.encode_text(["determinism check"])
    t2 = engine.encode_text(["determinism check"])
    np.testing.assert_array_equal(t1, t2)


def test_large_batch_chunks(engine, rng):
    """Requests beyond the largest bucket are processed in chunks, not as one
    giant jit shape."""
    import clip_tpu.engine as E
    old = E._BUCKETS
    E._BUCKETS = (1, 2, 4)  # shrink so the chunk path triggers cheaply
    try:
        texts = [f"t{i}" for i in range(11)]
        out = engine.encode_text(texts)
        assert out.shape[0] == 11
        ref = np.concatenate([engine.encode_text(texts[:4]),
                              engine.encode_text(texts[4:8]),
                              engine.encode_text(texts[8:])])
        np.testing.assert_allclose(out, ref, atol=1e-6)
        imgs = [(rng.random((40, 50, 3)) * 255).astype(np.uint8)] * 5
        iout = engine.encode_image(imgs)
        assert iout.shape[0] == 5
    finally:
        E._BUCKETS = old
