"""CLI integration tests on a tiny checkpoint: every command of the
multiplexer that can run offline."""

import json
import os

import numpy as np
import pytest

from clip_tpu.cli import dispatch

from hf_fixtures import tiny_gguf

APPLE = "/root/reference/tests/red_apple.jpg"
WHITE = "/root/reference/tests/white.jpg"


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    path, _ = tiny_gguf(tmp, use_f32=True)
    return path


def test_help(capsys):
    assert dispatch(["--help"]) == 0
    out = capsys.readouterr().out
    for cmd in ("main", "zsl", "extract", "quantize", "search-build", "benchmark"):
        assert cmd in out


def test_unknown_command():
    assert dispatch(["nope"]) == 2


def test_main(model_path, capsys):
    rc = dispatch(["main", "-m", model_path, "--text", "tok1 tok2", "--image", APPLE, "-v", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "similarity score" in out
    assert "model load" in out


def test_simple(model_path, capsys):
    rc = dispatch(["simple", "-m", model_path, "--text", "tok1", "--image", APPLE, "-v", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tokens:" in out and "similarity =" in out


def test_zsl(model_path, capsys):
    rc = dispatch(["zsl", "-m", model_path, "--text", "tok1", "--text", "tok2",
                   "--image", APPLE, "-v", "0"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if ":" in l]
    assert len(lines) == 2
    scores = [float(l.split(": ")[1]) for l in lines]
    assert abs(sum(scores) - 1.0) < 1e-4
    assert scores[0] >= scores[1]


def test_extract(model_path, tmp_path, capsys):
    rc = dispatch(["extract", "-m", model_path, "--text", "tok1",
                   "--image", APPLE, "-o", str(tmp_path), "-v", "0"])
    assert rc == 0
    txt = np.load(tmp_path / "tok1.npy")
    img = np.load(tmp_path / "red_apple.npy")
    assert txt.shape == (32,) and img.shape == (32,)
    # unnormalized embeddings
    assert abs(np.linalg.norm(txt) - 1.0) > 1e-3


def test_quantize_cli(model_path, tmp_path, capsys):
    out = str(tmp_path / "q.gguf")
    rc = dispatch(["quantize", model_path, out, "q4_0", "-q"])
    assert rc == 0
    assert os.path.getsize(out) < os.path.getsize(model_path)
    # integer code spelling too
    rc = dispatch(["quantize", model_path, str(tmp_path / "q8.gguf"), "8", "-q"])
    assert rc == 0


def test_search_build_and_query(model_path, tmp_path, capsys):
    imgdir = tmp_path / "imgs" / "fruit"
    imgdir.mkdir(parents=True)
    for name, src in [("apple.jpg", APPLE), ("white.jpg", WHITE)]:
        (imgdir / name).write_bytes(open(src, "rb").read())
    prefix = str(tmp_path / "idx")
    rc = dispatch(["search-build", "-m", model_path, str(tmp_path / "imgs"),
                   "--index", prefix, "-v", "0", "-b", "2"])
    assert rc == 0
    capsys.readouterr()
    rc = dispatch(["search", "-m", model_path, "--index", prefix,
                   "--image", APPLE, "-k", "2", "-v", "0"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    dist0, path0 = out[0].split(maxsplit=1)
    # the indexed copy of the query image must be the nearest hit
    assert path0.endswith("apple.jpg")
    assert float(dist0) < 1e-3


def test_benchmark_cli(model_path, tmp_path, capsys):
    for cls, src in [("apples", APPLE), ("whites", WHITE)]:
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(2):
            (d / f"{i}.jpg").write_bytes(open(src, "rb").read())
    out_file = str(tmp_path / "bench.md")
    rc = dispatch(["benchmark", "-m", model_path, str(tmp_path / "data"),
                   "-o", out_file, "-b", "2", "-v", "0"])
    assert rc == 0
    content = open(out_file).read()
    assert "| class name" in content and "| total" in content
    assert "ms per image" in content


def test_models_known(capsys):
    assert dispatch(["models", "known"]) == 0
    assert "ggml_clip-vit-base-patch32" in capsys.readouterr().out
