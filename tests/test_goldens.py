"""Committed end-to-end goldens (role of the reference's red_apple.jpg +
known sanity value — see scripts/make_goldens.py).

These fail if ANY numeric behavior drifts — tokenizer ids, host bicubic
preprocessing, or the full quantized encode — even when the drift is
self-consistent and would pass every round-trip/parity test.
"""

import os

import numpy as np
import pytest

from conftest import ON_TPU

from clip_tpu.engine import ClipEngine
from clip_tpu.synth import make_synthetic_gguf

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".cache")


@pytest.fixture(scope="module")
def goldens():
    return np.load(os.path.join(FIXDIR, "goldens.npz"))


@pytest.fixture(scope="module")
def golden_engine():
    ckpt = os.path.join(_CACHE, "golden_vit-b-32_q4_0_both.gguf")
    if not os.path.exists(ckpt):
        make_synthetic_gguf(ckpt, "ViT-B/32", ftype="q4_0", towers="both")
    eng = ClipEngine(ckpt, compute_dtype="float32", verbosity=0)
    yield eng
    eng.close()


def test_tokenizer_quirk_battery_frozen(goldens, golden_engine):
    from make_goldens_strings import QUIRK_STRINGS

    for i, s in enumerate(QUIRK_STRINGS):
        ids = golden_engine.tokenize(s)
        np.testing.assert_array_equal(
            np.asarray(ids, np.int32), goldens[f"tok_{i}"],
            err_msg=f"tokenizer drifted on quirk string {i}: {s!r}")


def test_preprocess_pixels_frozen(goldens, golden_engine):
    img = golden_engine.load_image(os.path.join(FIXDIR, "golden_a.png"))
    pixels = golden_engine.preprocess([img])
    # the host bicubic path is pure numpy/C++ — bit-stable across backends
    np.testing.assert_allclose(pixels[0], goldens["pixels_a"], atol=2e-6)


def test_embeddings_frozen(goldens, golden_engine):
    from make_goldens_strings import QUIRK_STRINGS

    paths = [os.path.join(FIXDIR, f"golden_{n}.png") for n in ("a", "b")]
    pixels = golden_engine.preprocess([golden_engine.load_image(p) for p in paths])
    img = golden_engine.encode_image(pixels, normalize=True, preprocessed=True)
    txt = golden_engine.encode_text(QUIRK_STRINGS, normalize=True)

    g_img, g_txt = goldens["img_emb"], goldens["txt_emb"]
    if ON_TPU:
        # TPU f32 dots run as bf16 MXU passes: gate on cosine, not bits
        assert (img * g_img).sum(1).min() >= 0.999
        assert (txt * g_txt).sum(1).min() >= 0.999
    else:
        np.testing.assert_allclose(img, g_img, atol=2e-4)
        np.testing.assert_allclose(txt, g_txt, atol=2e-4)
        # and the similarity sanity value, like the reference README's 0.6746
        assert (img * g_img).sum(1).min() >= 0.99999


def test_repeated_golden_run_determinism(golden_engine):
    """SURVEY §5 sanitizer analogue (the donation/aliasing audit).

    The reference needs TSan because clip_ctx hides mutable scratch state
    (clip.cpp:1048-1049); our engine is functional, and this test is the
    audit that keeps it so: a SECOND engine instance over the same
    checkpoint must reproduce the first's outputs bit-for-bit, and
    re-running an encode on the same instance must not perturb earlier
    results (would fail if any jit donated/aliased the params pytree or a
    kernel wrote through an input buffer).
    """
    from make_goldens_strings import QUIRK_STRINGS

    paths = [os.path.join(FIXDIR, f"golden_{n}.png") for n in ("a", "b")]
    pixels = golden_engine.preprocess([golden_engine.load_image(p) for p in paths])

    img1 = golden_engine.encode_image(pixels, normalize=True, preprocessed=True)
    txt1 = golden_engine.encode_text(QUIRK_STRINGS[:4], normalize=True)
    # same-instance repeat: bitwise equal
    np.testing.assert_array_equal(
        img1, golden_engine.encode_image(pixels, normalize=True, preprocessed=True))
    np.testing.assert_array_equal(
        txt1, golden_engine.encode_text(QUIRK_STRINGS[:4], normalize=True))

    # fresh-instance repeat over the same file: bitwise equal (no hidden
    # state survives in the checkpoint or process)
    eng2 = ClipEngine(golden_engine.model_path, compute_dtype="float32", verbosity=0)
    try:
        np.testing.assert_array_equal(
            img1, eng2.encode_image(pixels, normalize=True, preprocessed=True))
        np.testing.assert_array_equal(
            txt1, eng2.encode_text(QUIRK_STRINGS[:4], normalize=True))
    finally:
        eng2.close()


def test_no_buffer_donation_in_package():
    """Static aliasing audit: buffer donation on a params pytree would let
    XLA overwrite the weights of one encode with the activations of the
    next — we never donate.  Guard the invariant textually so a future
    'optimization' has to delete this test to land."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "clip_tpu"
    hits = []
    for py in pkg.rglob("*.py"):
        text = py.read_text()
        if "donate_argnums" in text or "donate_argnames" in text:
            hits.append(str(py))
    assert not hits, f"buffer donation introduced in {hits}; audit aliasing first"
