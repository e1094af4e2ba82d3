"""On-device preprocessing: must match the host (PIL-parity) pipeline and
plug into the fused encode path."""

import numpy as np
import pytest

from clip_tpu import ClipEngine
from clip_tpu.ops.device_preprocess import device_preprocess
from clip_tpu.preprocess import load_image, preprocess_batch

from hf_fixtures import tiny_gguf

APPLE = "/root/reference/tests/red_apple.jpg"

MEAN = np.array([0.48145466, 0.4578275, 0.40821073])
STD = np.array([0.26862954, 0.26130258, 0.27577711])


def test_device_matches_host(rng):
    imgs = rng.integers(0, 256, (3, 97, 131, 3), dtype=np.uint8)
    host = preprocess_batch(list(imgs), 64, MEAN, STD)
    dev = np.asarray(device_preprocess(imgs, 64, MEAN, STD))
    assert dev.shape == host.shape == (3, 64, 64, 3)
    # host computes the resample in float64; device in float32 on the MXU
    np.testing.assert_allclose(dev, host, atol=5e-4)


def test_device_real_image():
    img = load_image(APPLE)
    host = preprocess_batch([img], 224, MEAN, STD)
    dev = np.asarray(device_preprocess(img[None], 224, MEAN, STD))
    np.testing.assert_allclose(dev, host, atol=5e-4)


def test_engine_fused_raw_path_matches_host_path(tmp_path_factory, rng):
    path, _ = tiny_gguf(tmp_path_factory.mktemp("devprep"), use_f32=True)
    engine = ClipEngine(path, verbosity=0)
    imgs = [rng.integers(0, 256, (50, 60, 3), dtype=np.uint8) for _ in range(2)]
    fused = engine.encode_image(imgs, device_preprocess=True)
    host = engine.encode_image(imgs, device_preprocess=False)
    np.testing.assert_allclose(fused, host, atol=2e-4)
    # mixed sizes fall back to the host path
    mixed = imgs + [rng.integers(0, 256, (40, 70, 3), dtype=np.uint8)]
    out = engine.encode_image(mixed)
    assert out.shape == (3, 32)
