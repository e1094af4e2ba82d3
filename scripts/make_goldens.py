"""Generate the committed golden fixtures (tests/fixtures/golden_*).

Role of the reference's fixture image + known sanity value
(/root/reference/tests/red_apple.jpg used by examples/simple.c:9; the 0.6746
cos-distance in examples/image-search/README.md:51): freeze end-to-end numeric
behavior so a regression that stays *self-consistent* (and therefore passes
every round-trip/parity test) still fails CI.

Artifacts (all deterministic; regenerate only to intentionally re-baseline):

* ``golden_a.png`` / ``golden_b.png`` — procedural images (no copying of the
  reference's JPEGs), PNG so decoding is bit-exact everywhere;
* ``goldens.npz`` —
  - tokenizer ids for a quirk battery of strings (synthetic vocab),
  - the preprocessed-pixel tensor for image A (host bicubic path),
  - CPU-f32 image/text embeddings from the deterministic synthetic q4_0
    ViT-B/32 checkpoint (seed 0).
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
FIXDIR = os.path.join(_REPO, "tests", "fixtures")

sys.path.insert(0, os.path.join(_REPO, "tests"))
from make_goldens_strings import QUIRK_STRINGS  # noqa: E402


def make_images() -> list[str]:
    paths = []
    # image A: smooth bicubic-sensitive gradients, non-square (resize+crop)
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 127.5 + 127.5 * np.sin(2 * np.pi * (xx / 61.0 + yy / 97.0))
    g = 127.5 + 127.5 * np.cos(2 * np.pi * (xx / 37.0 - yy / 53.0))
    b = (xx * 255.0 / (w - 1) + yy * 255.0 / (h - 1)) / 2.0
    a = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    # image B: hard edges + a deterministic noise field (LCG, no RNG dep)
    h2 = w2 = 224
    yy2, xx2 = np.mgrid[0:h2, 0:w2]
    seq = (1103515245 * (yy2 * w2 + xx2 + 12345) + 12345) % (1 << 31)
    noise = (seq % 256).astype(np.uint8)
    blocks = (((xx2 // 28) + (yy2 // 28)) % 2 * 255).astype(np.uint8)
    bimg = np.stack([blocks, noise, 255 - blocks], axis=-1)
    for name, arr in (("golden_a.png", a), ("golden_b.png", bimg)):
        p = os.path.join(FIXDIR, name)
        Image.fromarray(arr).save(p, optimize=False)
        paths.append(p)
    return paths


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    img_paths = make_images()

    from clip_tpu.engine import ClipEngine
    from clip_tpu.synth import make_synthetic_gguf

    ckpt = os.path.join(_REPO, ".cache", "golden_vit-b-32_q4_0_both.gguf")
    if not os.path.exists(ckpt):
        make_synthetic_gguf(ckpt, "ViT-B/32", ftype="q4_0", towers="both")

    eng = ClipEngine(ckpt, compute_dtype="float32", verbosity=0)

    token_ids = [np.asarray(eng.tokenize(s), np.int32) for s in QUIRK_STRINGS]
    pixels = eng.preprocess([eng.load_image(p) for p in img_paths])
    img_emb = eng.encode_image(pixels, normalize=True, preprocessed=True)
    txt_emb = eng.encode_text(QUIRK_STRINGS, normalize=True)

    out = {
        "pixels_a": pixels[0].astype(np.float32),
        "img_emb": img_emb.astype(np.float32),
        "txt_emb": txt_emb.astype(np.float32),
    }
    for i, ids in enumerate(token_ids):
        out[f"tok_{i}"] = ids
    np.savez(os.path.join(FIXDIR, "goldens.npz"), **out)
    print("goldens written:",
          {k: (v.shape if hasattr(v, "shape") else v) for k, v in out.items()})
    eng.close()


if __name__ == "__main__":
    main()
