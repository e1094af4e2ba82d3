"""Preprocessing parity tests: resampling matrices vs PIL BICUBIC, crop and
normalization semantics, and the reference's resize-dimension rounding."""

import numpy as np
import pytest
from PIL import Image

from clip_tpu.preprocess import (
    bicubic_filter,
    load_image,
    preprocess,
    preprocess_batch,
    resample_matrix,
    resize_bicubic,
    resize_dims,
)

FIXTURE = "/root/reference/tests/red_apple.jpg"


def test_bicubic_filter_values():
    assert bicubic_filter(np.array(0.0)) == 1.0
    assert bicubic_filter(np.array(1.0)) == 0.0
    assert bicubic_filter(np.array(2.0)) == 0.0
    assert bicubic_filter(np.array(-0.5)) == bicubic_filter(np.array(0.5))
    # interpolating kernel: integer shifts are exact
    assert abs(bicubic_filter(np.array(1.5))) > 0


def test_resample_matrix_rows_sum_to_one():
    for in_size, out_size in [(500, 224), (224, 224), (100, 300), (37, 224)]:
        m = resample_matrix(in_size, out_size)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_resize_matches_pil_float_mode():
    """PIL mode-F resize uses the identical coefficient windows with no
    uint8 rounding between passes, so on smooth in-gamut data (where the
    reference's inter-pass clamp never binds) agreement should be ~1e-4."""
    yy, xx = np.mgrid[0:123, 0:177]
    img = (128 + 60 * np.sin(xx / 11.0) * np.cos(yy / 7.0)).astype(np.float32)
    out = resize_bicubic(img[..., None], 96, 64)[..., 0]
    ref = np.asarray(
        Image.fromarray(img, mode="F").resize((96, 64), Image.BICUBIC)
    )
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_resize_clamps_each_pass_like_reference(rng):
    """Random data overshoots; the reference clamps each pass to [0,255]
    (clip.cpp:867,897) so the output must stay in range even where an
    unclamped resample would not."""
    img = rng.uniform(0, 255, (123, 177)).astype(np.float32)
    out = resize_bicubic(img[..., None], 96, 64)[..., 0]
    assert out.min() >= 0.0 and out.max() <= 255.0
    ref = np.asarray(Image.fromarray(img, mode="F").resize((96, 64), Image.BICUBIC))
    # identical outside overshoot pixels
    close = np.isclose(out, ref, atol=2e-3)
    assert close.mean() > 0.995


def test_resize_matches_pil_uint8(rng):
    """uint8 path: PIL rounds to uint8 between/after passes, we keep float32
    like the reference -> allow ~1.5 LSB."""
    img = rng.integers(0, 256, (160, 240, 3), dtype=np.uint8)
    out = resize_bicubic(img, 112, 112)
    ref = np.asarray(Image.fromarray(img).resize((112, 112), Image.BICUBIC)).astype(
        np.float32
    )
    assert np.abs(out - ref).max() <= 1.5


def test_resize_dims_reference_rounding():
    # clip.cpp:819-821: scale = min/image_size; dims = int(n/scale + 0.5)
    assert resize_dims(640, 480, 224) == (299, 224)
    assert resize_dims(480, 640, 224) == (224, 299)
    assert resize_dims(224, 224, 224) == (224, 224)
    assert resize_dims(1000, 1000, 336) == (336, 336)


def test_constant_image_invariant():
    img = np.full((100, 150, 3), 127, np.uint8)
    mean = np.array([0.5, 0.5, 0.5])
    std = np.array([0.25, 0.25, 0.25])
    out = preprocess(img, 64, mean, std)
    np.testing.assert_allclose(out, (127 / 255.0 - 0.5) / 0.25, atol=1e-5)
    assert out.shape == (64, 64, 3)


def test_preprocess_fixture_shapes_and_range():
    img = load_image(FIXTURE)
    assert img.dtype == np.uint8 and img.shape[-1] == 3
    mean = np.array([0.48145466, 0.4578275, 0.40821073])
    std = np.array([0.26862954, 0.26130258, 0.27577711])
    out = preprocess(img, 224, mean, std)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32
    # normalized pixel range for in-gamut values
    assert out.min() > -3.0 and out.max() < 3.0


def test_batch_matches_single():
    img = load_image(FIXTURE)
    mean = np.array([0.5, 0.5, 0.5])
    std = np.array([0.5, 0.5, 0.5])
    single = preprocess(img, 96, mean, std)
    batch = preprocess_batch([img, img, img], 96, mean, std, n_workers=3)
    assert batch.shape == (3, 96, 96, 3)
    np.testing.assert_array_equal(batch[0], single)
    np.testing.assert_array_equal(batch[2], single)


def test_grayscale_and_rgba_handled():
    gray = np.random.default_rng(0).integers(0, 255, (50, 60), dtype=np.uint8)
    rgba = np.random.default_rng(0).integers(0, 255, (50, 60, 4), dtype=np.uint8)
    mean = std = np.array([0.5, 0.5, 0.5])
    assert preprocess(gray, 32, mean, std).shape == (32, 32, 3)
    assert preprocess(rgba, 32, mean, std).shape == (32, 32, 3)
