"""clip_cpp-compatible binding class + hub downloader logic (mocked HTTP)."""

import io
import json
import urllib.request

import numpy as np
import pytest

from clip_tpu import hub
from clip_tpu.compat import Clip, RepositoryFileNameNotFoundError

from hf_fixtures import tiny_gguf

APPLE = "/root/reference/tests/red_apple.jpg"


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path, _ = tiny_gguf(tmp_path_factory.mktemp("compat"), use_f32=True)
    return path


def test_clip_class_surface(model_path):
    clip = Clip(model_path, verbosity=0)
    assert clip.text_config["hidden_size"] == 64
    assert clip.vision_config["image_size"] == 28

    tokens = clip.tokenize("tok1 tok2")
    assert isinstance(tokens, list) and all(isinstance(t, int) for t in tokens)

    tvec = clip.encode_text(tokens)
    ivec = clip.load_preprocess_encode_image(APPLE)
    assert len(tvec) == len(ivec) == 32

    score = clip.calculate_similarity(tvec, ivec)
    score2 = clip.compare_text_and_image("tok1 tok2", APPLE)
    assert score == pytest.approx(score2, abs=1e-5)

    scores, idx = clip.zero_shot_label_image(APPLE, ["tok1", "tok2"])
    assert len(scores) == 2 and sorted(idx) == [0, 1]


def test_clip_from_directory(model_path, tmp_path):
    import shutil

    d = tmp_path / "models"
    d.mkdir()
    shutil.copy(model_path, d / "m.gguf")
    clip = Clip(str(d), verbosity=0)
    assert clip.text_config["hidden_size"] == 64
    with pytest.raises(RepositoryFileNameNotFoundError):
        Clip(str(d), model_file="missing.gguf")


def _mock_urlopen(payload: dict):
    class Resp(io.BytesIO):
        headers = {"Content-Length": "0"}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def opener(req, *a, **k):
        return Resp(json.dumps(payload).encode())

    return opener


def test_hub_model_info_and_selection(monkeypatch):
    payload = {
        "modelId": "mys/ggml_clip-vit-base-patch32",
        "sha": "abc123def456",
        "siblings": [
            {"rfilename": "README.md", "size": 10},
            {"rfilename": "model-f16.gguf", "size": 300},
            {"rfilename": "model-q4_0.gguf", "size": 90},
            {"rfilename": "model-q8_0.gguf", "size": 160},
        ],
    }
    monkeypatch.setattr(urllib.request, "urlopen", _mock_urlopen(payload))
    info = hub.model_info("mys/ggml_clip-vit-base-patch32")
    assert [f.rfilename for f in info.gguf_files] == [
        "model-f16.gguf", "model-q4_0.gguf", "model-q8_0.gguf",
    ]
    # smallest by default (the q4_0), explicit name honored, missing rejected
    assert hub.select_gguf(info).rfilename == "model-q4_0.gguf"
    assert hub.select_gguf(info, "model-f16.gguf").rfilename == "model-f16.gguf"
    with pytest.raises(hub.RepositoryFileNameNotFoundError):
        hub.select_gguf(info, "nope.gguf")


def test_hub_404(monkeypatch):
    def opener(req, *a, **k):
        raise urllib.error.HTTPError(req.full_url, 404, "nf", {}, None)

    import urllib.error

    monkeypatch.setattr(urllib.request, "urlopen", opener)
    with pytest.raises(hub.RepositoryNotFoundError):
        hub.model_info("nope/nope")
