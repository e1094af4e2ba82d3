"""Native C++ preprocessing vs the numpy reference implementation."""

import numpy as np
import pytest

from clip_tpu import native
from clip_tpu.preprocess import load_image, preprocess, preprocess_batch

APPLE = "/root/reference/tests/red_apple.jpg"
MEAN = np.array([0.48145466, 0.4578275, 0.40821073])
STD = np.array([0.26862954, 0.26130258, 0.27577711])

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ unavailable")


def test_single_matches_numpy(rng):
    img = rng.integers(0, 256, (123, 177, 3), dtype=np.uint8)
    ref = preprocess(img, 64, MEAN, STD)
    out = native.preprocess_native(img, 64, MEAN, STD)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_real_image_matches_numpy():
    img = load_image(APPLE)
    ref = preprocess(img, 224, MEAN, STD)
    out = native.preprocess_native(img, 224, MEAN, STD)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_batch_mixed_sizes(rng):
    imgs = [
        rng.integers(0, 256, (100, 80, 3), dtype=np.uint8),
        rng.integers(0, 256, (64, 200, 3), dtype=np.uint8),
        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
    ]
    ref = preprocess_batch(imgs, 48, MEAN, STD)
    out = native.preprocess_batch_native(imgs, 48, MEAN, STD, n_threads=3)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_error_on_bad_shape():
    with pytest.raises(ValueError):
        native.preprocess_native(np.zeros((4, 4), np.uint8), 2, MEAN, STD)
