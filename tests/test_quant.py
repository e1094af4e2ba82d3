"""Quantization format tests: layout, roundtrip error bounds, golden vectors."""

import numpy as np
import pytest

from clip_tpu.gguf.constants import GGML_TYPE_SIZES, GGMLType
from clip_tpu.quant import QK, QUANT_TYPES, block_fields, dequantize, quantize, quantize_with_hist

# Worst-case reconstruction error per element is half a quantization step;
# steps are amax/8 (q4_0), range/15 (q4_1), amax/16 (q5_0), range/31 (q5_1),
# amax/127 (q8_0) — plus fp16 rounding of the scale.
_MAX_REL_ERR = {
    GGMLType.Q4_0: 0.20,
    GGMLType.Q4_1: 0.07,
    GGMLType.Q5_0: 0.10,
    GGMLType.Q5_1: 0.035,
    GGMLType.Q8_0: 0.006,
}


@pytest.mark.parametrize("qtype", QUANT_TYPES)
def test_block_sizes(qtype):
    block_bytes, block_elems = GGML_TYPE_SIZES[qtype]
    assert block_elems == QK
    x = np.random.default_rng(1).normal(size=4 * QK).astype(np.float32)
    packed = quantize(x, qtype)
    assert packed.shape == (4, block_bytes)
    assert packed.dtype == np.uint8


@pytest.mark.parametrize("qtype", QUANT_TYPES)
def test_roundtrip_error(qtype, rng):
    x = rng.normal(size=64 * QK).astype(np.float32)
    y = dequantize(quantize(x, qtype), qtype)
    scale = np.abs(x.reshape(-1, QK)).max(axis=1, keepdims=True)
    err = np.abs(y.reshape(-1, QK) - x.reshape(-1, QK)) / scale
    assert err.max() <= _MAX_REL_ERR[qtype], f"{qtype}: {err.max()}"


@pytest.mark.parametrize("qtype", QUANT_TYPES)
def test_double_roundtrip_is_fixed_point(qtype, rng):
    """Quantizing a dequantized array must be (almost) lossless."""
    x = rng.normal(size=16 * QK).astype(np.float32)
    y = dequantize(quantize(x, qtype), qtype)
    z = dequantize(quantize(y, qtype), qtype)
    np.testing.assert_allclose(z, y, rtol=0, atol=np.abs(y).max() * 0.02)


def test_q8_0_exact_small_ints():
    """Integer grids within int8 range must roundtrip exactly."""
    x = np.tile(np.arange(-16, 16, dtype=np.float32), 4)
    y = dequantize(quantize(x, GGMLType.Q8_0), GGMLType.Q8_0)
    # step is amax/127 = 16/127 ~ 0.126; error bounded by half a step
    np.testing.assert_allclose(y, x, atol=0.07)


def test_q4_0_golden_layout():
    """Hand-checkable vector: block of [-8d .. +7d] must hit exact codes."""
    d = 0.5
    x = (np.arange(32, dtype=np.float32) - 8) * d  # max |x| at +23*d? no:
    # construct so the signed absmax is x[0] = -8d -> d_stored = -8d/-8 = d
    x = np.concatenate([[-8 * d], np.linspace(-3, 3, 31)]).astype(np.float32)
    packed = quantize(x, GGMLType.Q4_0)
    f = block_fields(packed, GGMLType.Q4_0)
    assert f.d[0] == np.float16(d)
    assert f.zero_point == 8
    assert f.q[0, 0] == 0  # (-8d)/d + 8 = 0
    y = dequantize(packed, GGMLType.Q4_0)
    assert y[0] == -8 * d


def test_q5_high_bit_packing():
    """Values requiring the 5th bit must survive the qh round trip."""
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, QK).astype(np.float32)
    x[0] = -1.6  # force signed absmax
    for qtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        f = block_fields(quantize(x, qtype), qtype)
        assert (f.q >= 16).any(), "expected some codes above 15"
        assert f.q.max() <= 31


def test_nibble_interleave_order():
    """Element j is in byte j's low nibble; element j+16 in its high nibble."""
    x = np.zeros(QK, np.float32)
    x[0] = -8.0   # signed absmax -> d = 1, code = 0
    x[16] = 7.0   # code = 15
    packed = quantize(x, GGMLType.Q4_0)
    qs = packed[0, 2:]
    assert qs[0] & 0x0F == 0
    assert qs[0] >> 4 == 15
    # all other elements are 0.0 -> code 8
    assert qs[1] & 0x0F == 8


def test_zero_block():
    x = np.zeros(QK, np.float32)
    for qtype in QUANT_TYPES:
        y = dequantize(quantize(x, qtype), qtype)
        np.testing.assert_array_equal(y, x)


def test_hist_totals(rng):
    x = rng.normal(size=8 * QK).astype(np.float32)
    for qtype in QUANT_TYPES:
        _, hist = quantize_with_hist(x, qtype)
        assert hist.sum() == x.size
