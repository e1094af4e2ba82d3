"""Hugging Face Hub model downloader (stdlib-only: urllib, no dependencies).

Replaces the reference bindings' downloader
(/root/reference/examples/python_bindings/clip_cpp/file_download.py): query
repo metadata from the HF API, list the repo's ``.gguf`` files, download (with
a progress bar and local caching) — defaulting to the *smallest* .gguf in the
repo, like ``Clip.from_pretrained``
(/root/reference/examples/python_bindings/clip_cpp/clip.py:260-309).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

HF_ENDPOINT = os.environ.get("HF_ENDPOINT", "https://huggingface.co")
DEFAULT_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "clip_tpu"
)

KNOWN_REPOS = [
    # GGUF CLIP checkpoints published for the reference implementation
    "mys/ggml_clip-vit-base-patch32",
    "mys/ggml_clip-vit-large-patch14",
    "mys/ggml_CLIP-ViT-B-32-laion2B-s34B-b79K",
    "mys/ggml_CLIP-ViT-L-14-laion2B-s32B-b82K",
    "mys/ggml_CLIP-ViT-H-14-laion2B-s32B-b79K",
]


class RepositoryNotFoundError(Exception):
    pass


class RepositoryFileNameNotFoundError(Exception):
    pass


@dataclass
class RepoFile:
    rfilename: str
    size: int | None = None


@dataclass
class ModelInfo:
    model_id: str
    sha: str | None = None
    tags: list[str] = field(default_factory=list)
    siblings: list[RepoFile] = field(default_factory=list)

    @property
    def gguf_files(self) -> list[RepoFile]:
        return [f for f in self.siblings if f.rfilename.endswith(".gguf")]


def _api_get(url: str) -> dict:
    req = urllib.request.Request(url, headers={"User-Agent": "clip-tpu/0.1"})
    try:
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        if e.code == 404:
            raise RepositoryNotFoundError(url) from e
        raise


def model_info(repo_id: str, files_metadata: bool = True,
               revision: str | None = None) -> ModelInfo:
    url = f"{HF_ENDPOINT}/api/models/{repo_id}"
    if revision and revision != "main":
        url += f"/revision/{urllib.parse.quote(revision, safe='')}"
    if files_metadata:
        url += "?blobs=true"
    data = _api_get(url)
    return ModelInfo(
        model_id=data.get("modelId", repo_id),
        sha=data.get("sha"),
        tags=data.get("tags", []),
        siblings=[
            RepoFile(rfilename=s.get("rfilename", ""), size=s.get("size"))
            for s in data.get("siblings", [])
        ],
    )


def select_gguf(info: ModelInfo, file_name: str | None = None) -> RepoFile:
    """Pick a .gguf: the named file, else the smallest (lowest bit-width)."""
    files = info.gguf_files
    if not files:
        raise RepositoryFileNameNotFoundError(
            f"no .gguf files in {info.model_id}"
        )
    if file_name is not None:
        for f in files:
            if f.rfilename == file_name:
                return f
        raise RepositoryFileNameNotFoundError(
            f"{file_name!r} not in {[f.rfilename for f in files]}"
        )
    with_size = [f for f in files if f.size is not None]
    if with_size:
        return min(with_size, key=lambda f: f.size)
    return files[0]


def _progress(count: int, total: int) -> None:
    if total <= 0 or not sys.stderr.isatty():
        return
    width = 40
    frac = min(count / total, 1.0)
    bar = "=" * int(frac * width)
    sys.stderr.write(f"\r[{bar:<{width}}] {frac*100:5.1f}% of {total/2**20:.1f} MB")
    if frac >= 1.0:
        sys.stderr.write("\n")
    sys.stderr.flush()


def model_download(
    repo_id: str,
    file_name: str | None = None,
    cache_dir: str = DEFAULT_CACHE_DIR,
    revision: str = "main",
    force: bool = False,
) -> str:
    """Download a model file, returning the local path (cached by
    repo/revision-sha, so distinct revisions never collide)."""
    info = model_info(repo_id, revision=revision)
    chosen = select_gguf(info, file_name)
    subdir = repo_id.replace("/", "--")
    if info.sha:
        subdir = f"{subdir}--{info.sha[:12]}"
    elif revision != "main":
        subdir = f"{subdir}--{revision.replace('/', '-')}"
    local_dir = os.path.join(cache_dir, subdir)
    os.makedirs(local_dir, exist_ok=True)
    local_path = os.path.join(local_dir, chosen.rfilename)
    if os.path.exists(local_path) and not force:
        return local_path

    url = f"{HF_ENDPOINT}/{repo_id}/resolve/{revision}/{chosen.rfilename}"
    req = urllib.request.Request(url, headers={"User-Agent": "clip-tpu/0.1"})
    tmp_path = local_path + ".part"
    with urllib.request.urlopen(req) as resp, open(tmp_path, "wb") as out:
        total = int(resp.headers.get("Content-Length", 0))
        count = 0
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
            count += len(chunk)
            _progress(count, total)
    os.replace(tmp_path, local_path)
    return local_path
