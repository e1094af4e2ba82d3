"""Offline control-flow test for scripts/real_data_drill.py.

The drill's network steps (Hub download, ImageNet prep) are mocked with
synthetic checkpoints and a tiny class-keyed image tree; everything else —
GGUF inspection, the reference-protocol benchmark runs on both checkpoints,
top-1 parsing, and the gate verdict — runs for real, so the one command a
networked host will run is exercised end to end here.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


@pytest.fixture(scope="module")
def drill():
    spec = importlib.util.spec_from_file_location(
        "real_data_drill", os.path.join(_SCRIPTS, "real_data_drill.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fake_world(tmp_path_factory):
    """Synthetic 'hub' checkpoints + a 2-class image tree."""
    from PIL import Image

    from clip_tpu.quantize import quantize_model
    from hf_fixtures import tiny_gguf

    tmp = tmp_path_factory.mktemp("drill")
    ref_path, _ = tiny_gguf(tmp, use_f32=True)
    q_path = str(tmp / "tiny.q4_0.gguf")
    quantize_model(ref_path, q_path, "q4_0", verbose=False)

    data = tmp / "dataset"
    rng = np.random.default_rng(0)
    for cls in ("tok1", "tok2"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return {"q4_0": q_path, "ref": str(ref_path), "dataset": str(data),
            "workdir": str(tmp / "work")}


def test_drill_end_to_end_with_mocked_network(drill, fake_world, monkeypatch,
                                              capsys):
    calls = {}

    def fake_download(repo, quant_file, ref_file, cache_dir):
        calls["download"] = (repo, cache_dir)
        return fake_world["q4_0"], fake_world["ref"]

    def fake_prepare(workdir):
        raise AssertionError("dataset given: ImageNet prep must be skipped")

    monkeypatch.setattr(drill, "download_models", fake_download)
    monkeypatch.setattr(drill, "prepare_dataset", fake_prepare)

    rc = drill.main(["--workdir", fake_world["workdir"],
                     "--dataset", fake_world["dataset"]])
    out = capsys.readouterr().out
    verdict = json.loads(out.strip().splitlines()[-1])
    assert calls["download"][0] == "mys/ggml_clip-vit-base-patch32"
    assert verdict["gate"] == "imagenet_top1_delta"
    assert verdict["threshold_pt"] == 0.5
    assert (rc == 0) == verdict["pass"]
    # both benchmark reports were produced and parseable
    for name in ("bench_q4_0.md", "bench_ref.md"):
        assert drill.parse_top1(os.path.join(fake_world["workdir"], name)) >= 0.0
    # inspection output includes real GGUF metadata for both files
    assert out.count('"gguf_version"') == 2
    assert '"ftype": "q4_0"' in out


def test_gate_verdict_boundaries(drill):
    assert drill.gate_verdict(0.601, 0.600)["pass"]          # 0.1 pt
    assert drill.gate_verdict(0.600, 0.605)["pass"]          # 0.5 pt exactly
    assert not drill.gate_verdict(0.580, 0.600)["pass"]      # 2.0 pt
    v = drill.gate_verdict(0.5951, 0.6001)
    assert v["delta_pt"] == 0.5 and v["pass"]


def test_parse_top1_rejects_malformed(drill, tmp_path):
    p = tmp_path / "r.md"
    p.write_text("no table here\n")
    with pytest.raises(SystemExit):
        drill.parse_top1(str(p))

def test_measure_reference_assembles_build_and_run(drill, tmp_path):
    """Offline: the build-and-measure step's command plan and parsing, with
    an injected runner standing in for git/cmake/the benchmark binary."""
    workdir = str(tmp_path / "w")
    os.makedirs(workdir)
    src = os.path.join(workdir, "clip.cpp")
    cmds = []

    def fake_run(cmd, **kw):
        cmds.append(cmd)
        if cmd[0] == "git" and cmd[1] == "clone":
            tgt = cmd[-1]
            os.makedirs(tgt, exist_ok=True)
            open(os.path.join(tgt, "CMakeLists.txt"), "w").write("x")
        elif cmd[:2] == ["cmake", "--build"]:
            bdir = cmd[2]
            os.makedirs(os.path.join(bdir, "bin"), exist_ok=True)
            open(os.path.join(bdir, "bin", "benchmark"), "w").write("x")
        elif cmd[0].endswith("benchmark"):
            with open(cmd[4], "w") as f:
                f.write("# Timings\n"
                        "- 2 texts encoded in 100.00 ms (50.00 ms per text)\n"
                        "- 6 images encoded in  300.00 ms ( 50.00 ms per image)\n")

    ref = drill.measure_reference(workdir, "/m.gguf", "/data", ref_src=src,
                                  ggml_commit="deadbeef", run=fake_run)
    assert ref["ms_per_image"] == 50.0
    assert abs(ref["img_per_s"] - 20.0) < 1e-9
    joined = [" ".join(c) for c in cmds]
    assert any("clone" in c and c.endswith(src) for c in joined)
    assert any("checkout deadbeef" in c for c in joined)
    assert any("-DCLIP_BUILD_TESTS=ON" in c for c in joined)
    assert any(c.endswith("benchmark -j") for c in joined)
    # the benchmark invocation: model, dataset, n_per_dir, report
    bench = next(c for c in cmds if c[0].endswith("bin/benchmark"))
    assert bench[1:4] == ["/m.gguf", "/data", "0"]


def test_write_measured_baseline_verdict(drill, tmp_path):
    baseline = {"metric": "x", "published": {}, "configs": []}
    bl = tmp_path / "BASELINE.json"
    bl.write_text(json.dumps(baseline))
    ref = {"ms_per_image": 50.0, "img_per_s": 20.0, "report": "r.md"}
    v = drill.write_measured_baseline(str(tmp_path), ref, ours_ms=0.05)
    assert v["gate"] == "throughput_10x" and v["pass"] and v["speedup"] == 1000.0
    data = json.loads(bl.read_text())
    assert data["published"]["clip_cpp_ms_per_image"] == 50.0
    # a slow result fails the 10x gate
    v2 = drill.write_measured_baseline(str(tmp_path), ref, ours_ms=10.0)
    assert not v2["pass"]


def test_parse_ms_per_image(drill, tmp_path):
    p = tmp_path / "r.md"
    p.write_text("- 24 images encoded in  1200.00 ms (   50.00 ms per image)\n")
    assert drill.parse_ms_per_image(str(p)) == 50.0
    p.write_text("nothing\n")
    with pytest.raises(SystemExit):
        drill.parse_ms_per_image(str(p))
