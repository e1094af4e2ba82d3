"""GGUF container round-trip tests: writer output must be re-readable and
byte-layout assumptions (alignment, reversed dims, typed KVs) must hold."""

import numpy as np
import pytest

from clip_tpu.gguf import GGMLType, GGUFReader, GGUFWriter, ggml_nbytes
from clip_tpu.gguf.constants import GGUF_DEFAULT_ALIGNMENT
from clip_tpu.quant import quantize


def _write_sample(path, alignment=GGUF_DEFAULT_ALIGNMENT):
    w = GGUFWriter(str(path), alignment=alignment)
    w.add_bool("clip.has_text_encoder", True)
    w.add_bool("clip.has_vision_encoder", False)
    w.add_uint32("general.file_type", 1)
    w.add_string("general.description", "unit-test model")
    w.add_float32("clip.text.attention.layer_norm_epsilon", 1e-5)
    w.add_array_str("tokenizer.ggml.tokens", ["a</w>", "b</w>", "<|endoftext|>"])
    w.add_array_f32("clip.vision.image_mean", [0.48, 0.45, 0.40])
    rng = np.random.default_rng(0)
    t_f32 = rng.normal(size=(7, 64)).astype(np.float32)
    t_f16 = rng.normal(size=(3, 32)).astype(np.float16)
    t_q = rng.normal(size=(4, 64)).astype(np.float32)
    w.add_tensor("w.f32", t_f32)
    w.add_tensor("w.f16", t_f16)
    w.add_quantized_tensor("w.q4", t_q.shape, GGMLType.Q4_0, quantize(t_q, GGMLType.Q4_0))
    w.write()
    return t_f32, t_f16, t_q


def test_roundtrip(tmp_path):
    path = tmp_path / "m.gguf"
    t_f32, t_f16, t_q = _write_sample(path)
    with GGUFReader(path) as r:
        assert r.kv["clip.has_text_encoder"] is True
        assert r.kv["clip.has_vision_encoder"] is False
        assert r.kv["general.file_type"] == 1
        assert r.kv["general.description"] == "unit-test model"
        assert r.kv["clip.text.attention.layer_norm_epsilon"] == pytest.approx(1e-5)
        assert r.kv["tokenizer.ggml.tokens"] == ["a</w>", "b</w>", "<|endoftext|>"]
        np.testing.assert_allclose(
            r.kv["clip.vision.image_mean"], [0.48, 0.45, 0.40], rtol=1e-6
        )

        np.testing.assert_array_equal(r.tensor_data("w.f32"), t_f32)
        np.testing.assert_array_equal(r.tensor_data("w.f16"), t_f16)
        assert r.tensors["w.f32"].shape == (7, 64)
        assert r.tensors["w.f32"].shape_gguf == (64, 7)
        deq = r.tensor_as_float("w.q4")
        assert deq.shape == (4, 64)
        # q4_0 max relative error bound
        scale = np.abs(t_q.reshape(-1, 32)).max(axis=1, keepdims=True)
        assert (np.abs(deq.reshape(-1, 32) - t_q.reshape(-1, 32)) / scale).max() < 0.2


def test_alignment(tmp_path):
    path = tmp_path / "m.gguf"
    _write_sample(path)
    with GGUFReader(path) as r:
        assert r.data_offset % r.alignment == 0
        for info in r.tensors.values():
            assert info.offset % r.alignment == 0


def test_nbytes():
    assert ggml_nbytes((64, 7), GGMLType.F32) == 64 * 7 * 4
    assert ggml_nbytes((64, 7), GGMLType.F16) == 64 * 7 * 2
    assert ggml_nbytes((64, 4), GGMLType.Q4_0) == 64 * 4 // 32 * 18
    assert ggml_nbytes((64, 4), GGMLType.Q8_0) == 64 * 4 // 32 * 34
    with pytest.raises(ValueError):
        ggml_nbytes((33, 4), GGMLType.Q4_0)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a GGUF"):
        GGUFReader(p)


def test_copy_kv(tmp_path):
    src = tmp_path / "src.gguf"
    _write_sample(src)
    dst = tmp_path / "dst.gguf"
    with GGUFReader(src) as r:
        w = GGUFWriter(str(dst))
        w.copy_kv_from(r)
        w.add_uint32("general.quantization_version", 2)
        w.write()
    with GGUFReader(dst) as r2:
        assert r2.kv["general.description"] == "unit-test model"
        assert r2.kv["general.quantization_version"] == 2
        assert r2.kv["tokenizer.ggml.tokens"] == ["a</w>", "b</w>", "<|endoftext|>"]


def test_reader_rejects_truncated_file(tmp_path):
    import pytest
    from clip_tpu.gguf import GGUFReader
    from clip_tpu.synth import make_synthetic_gguf

    full = tmp_path / "full.gguf"
    make_synthetic_gguf(str(full), "ViT-B/32", ftype="f16", towers="text")
    data = full.read_bytes()
    trunc = tmp_path / "trunc.gguf"
    trunc.write_bytes(data[: len(data) // 50])
    with pytest.raises(ValueError, match="truncated or corrupt"):
        GGUFReader(str(trunc))


def test_writer_records_nondefault_alignment(tmp_path):
    import numpy as np
    from clip_tpu.gguf import GGUFReader
    from clip_tpu.gguf.writer import GGUFWriter

    path = tmp_path / "a64.gguf"
    w = GGUFWriter(str(path), alignment=64)
    w.add_string("general.name", "t")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    w.add_tensor("a", a)
    w.write()
    r = GGUFReader(str(path))
    assert r.alignment == 64
    np.testing.assert_array_equal(r.tensor_data("a"), a)


def test_header_version_fixtures():
    """Committed binary fixtures pin all three container versions forever.

    v1 (uint32 lengths/counts/dims — the published mys/ggml_clip-* era),
    v2 and v3 (uint64) must parse to identical logical content.  Regenerate
    with scripts/make_gguf_fixtures.py — bytes must not change.
    """
    import os
    import sys

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        from make_gguf_fixtures import build, fixture_kvs, fixture_tensors
    finally:
        sys.path.pop(0)

    for version in (1, 2, 3):
        path = os.path.join(fixdir, f"header_v{version}.gguf")
        # the committed bytes are exactly what the generator produces
        with open(path, "rb") as f:
            assert f.read() == build(version), f"fixture v{version} drifted"
        with GGUFReader(path) as r:
            assert r.version == version
            assert r.kv["general.name"] == "header-fixture"
            assert r.kv["fixture.u32"] == 7
            assert r.kv["fixture.flag"] is True
            assert r.kv["fixture.strings"] == ["alpha", "bb"]
            np.testing.assert_allclose(r.kv["fixture.floats"], [1.5, -2.0, 0.25])
            for name, arr in fixture_tensors():
                got = r.tensor_data(name)
                assert got.dtype == arr.dtype
                np.testing.assert_array_equal(got, arr)


def test_reader_rejects_future_version(tmp_path):
    path = tmp_path / "v9.gguf"
    import struct

    path.write_bytes(b"GGUF" + struct.pack("<IQQ", 9, 0, 0))
    with pytest.raises(ValueError, match="not supported"):
        GGUFReader(str(path))


def test_reader_survives_fuzzed_input(tmp_path):
    """Corrupt GGUF bytes must produce a clean ValueError (or parse, for
    benign flips) — never a crash, hang, or unbounded allocation.  Role of
    the reference's sanitizer builds for its loader (SURVEY §5)."""
    import os

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    data = bytearray(open(os.path.join(fixdir, "header_v3.gguf"), "rb").read())

    rng = np.random.default_rng(0)
    cases = []
    for cut in (5, 9, 13, 25, 60, 120, len(data) - 7):  # truncations
        cases.append(bytes(data[:cut]))
    for _ in range(60):  # random byte flips
        mut = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        cases.append(bytes(mut))

    for i, blob in enumerate(cases):
        p = tmp_path / f"fuzz_{i}.gguf"
        p.write_bytes(blob)
        try:
            with GGUFReader(str(p)) as r:
                for name in r.tensors:
                    r.tensor_data(name)
        except ValueError:
            pass  # the expected clean rejection
