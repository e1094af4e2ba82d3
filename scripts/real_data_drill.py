"""One-command real-data drill: the BASELINE quality gate, end to end.

The reference's quality gate is "q4_0 ImageNet-1k zero-shot top-1 within
0.5 pt of f16" (/root/reference/tests/benchmark.cpp:91-163 + BASELINE.md).
This environment has zero egress, so the gate cannot RUN here — this script
makes it turnkey for any networked host:

  1. download the published GGUF checkpoints from the HF Hub
     (mys/ggml_clip-vit-base-patch32 by default, q4_0 + f16 — the repos the
     reference's python bindings pull, examples/python_bindings/clip_cpp/
     clip.py:260-309);
  2. parse + report each GGUF header (exercises the v1/v2/v3 reader on real
     files) and run a quick two-tower encode sanity check;
  3. [--hf-check] cross-check embeddings against HF transformers on the same
     weights (cosine >= 0.99 end-to-end across the quantization);
  4. download + prepare the ImageNet-1k validation set (~7 GB,
     datasets/imagenet.py — the reference's tests/prepare_imagenet1k.py);
  5. run the reference-protocol benchmark (cli/benchmark.py) for BOTH
     checkpoints and emit the gate verdict as one JSON line:
       {"gate": "imagenet_top1_delta", "q4_0": ..., "f16": ...,
        "delta_pt": ..., "threshold_pt": 0.5, "pass": true/false}

Run:  python scripts/real_data_drill.py --workdir /data/drill
      python scripts/real_data_drill.py --repo mys/ggml_clip-vit-large-patch14 \
          --quant-file <q4_0.gguf> --ref-file <f16.gguf>

Control flow is unit-tested offline with mocked network steps
(tests/test_real_data_drill.py).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

THRESHOLD_PT = 0.5


def download_models(repo: str, quant_file: str | None, ref_file: str | None,
                    cache_dir: str) -> tuple[str, str]:
    """Fetch (quantized, reference-precision) GGUF paths from the Hub."""
    from clip_tpu.hub import model_download, model_info

    info = model_info(repo)
    names = [f.rfilename for f in info.gguf_files]
    if quant_file is None:
        quant_file = next((n for n in names if "q4_0" in n), None)
    if ref_file is None:
        ref_file = next(
            (n for n in names if "f16" in n or "fp16" in n),
            next((n for n in names if "f32" in n), None))
    if not quant_file or not ref_file:
        raise SystemExit(
            f"could not pick q4_0/f16 files from {repo}: {names} "
            f"(use --quant-file/--ref-file)")
    qp = model_download(repo, quant_file, cache_dir=cache_dir)
    rp = model_download(repo, ref_file, cache_dir=cache_dir)
    return qp, rp


def inspect_checkpoint(path: str) -> dict:
    """Parse the GGUF header and run a tiny two-tower encode."""
    import numpy as np

    from clip_tpu.engine import ClipEngine
    from clip_tpu.gguf import GGUFReader
    from clip_tpu.gguf import constants as C

    reader = GGUFReader(path)
    meta = {
        "path": path,
        "gguf_version": reader.version,
        "n_tensors": len(reader.tensors),
        "ftype": C.FTYPE_TO_NAME.get(
            reader.kv.get(C.KEY_FTYPE, -1), "?"),
    }
    reader.close()
    eng = ClipEngine(path, verbosity=0)
    img = np.zeros((eng.image_size, eng.image_size, 3), np.uint8)
    vec_i = eng.encode_image(img, normalize=True)
    vec_t = eng.encode_text("a photo of a cat", normalize=True)
    meta["embed_dim"] = int(vec_i.shape[-1])
    meta["sanity_sim"] = float(vec_i @ vec_t)
    eng.close()
    return meta


def hf_crosscheck(gguf_path: str, hf_repo: str) -> float:
    """Min cosine vs HF transformers on one image + one text (requires the
    transformers weights; network)."""
    import numpy as np
    import torch
    from transformers import CLIPModel, CLIPProcessor

    from clip_tpu.engine import ClipEngine
    from PIL import Image

    model = CLIPModel.from_pretrained(hf_repo)
    proc = CLIPProcessor.from_pretrained(hf_repo)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (480, 640, 3)).astype("uint8"))
    text = "a photo of a red apple on a table"
    with torch.no_grad():
        hf_i = model.get_image_features(
            **{k: v for k, v in proc(images=img, return_tensors="pt").items()})
        hf_t = model.get_text_features(
            **{k: v for k, v in proc(text=[text], return_tensors="pt").items()})
    hf_i = (hf_i / hf_i.norm(dim=-1, keepdim=True)).numpy()[0]
    hf_t = (hf_t / hf_t.norm(dim=-1, keepdim=True)).numpy()[0]

    eng = ClipEngine(gguf_path, verbosity=0)
    our_i = eng.encode_image(np.asarray(img), normalize=True,
                             device_preprocess=False)
    our_t = eng.encode_text(text, normalize=True)
    eng.close()
    return float(min(our_i @ hf_i, our_t @ hf_t))


def prepare_dataset(workdir: str) -> str:
    from clip_tpu.datasets.imagenet import prepare_imagenet1k

    return prepare_imagenet1k(os.path.join(workdir, "imagenet1k"), verbose=True)


def run_benchmark(model_path: str, dataset: str, out_path: str,
                  templates: str | None = None,
                  act_quant: bool | None = None) -> float:
    """Reference-protocol benchmark; returns mean top-1 over classes."""
    from clip_tpu.cli import benchmark

    argv = ["-m", model_path, dataset, "-o", out_path]
    if templates:
        argv += ["--templates", templates]
    if act_quant is False:
        argv += ["--no-act-quant"]
    rc = benchmark.main(argv)
    if rc != 0:
        raise SystemExit(f"benchmark failed (rc={rc}) for {model_path}")
    return parse_top1(out_path)


def parse_top1(report_path: str) -> float:
    with open(report_path) as f:
        for line in f:
            m = re.match(r"\|\s*total\s*\|\s*([0-9.]+)\s*\|", line)
            if m:
                return float(m.group(1))
    raise SystemExit(f"no total row in {report_path}")


def gate_verdict(top1_q: float, top1_ref: float,
                 threshold_pt: float = THRESHOLD_PT) -> dict:
    # compare the rounded delta so float noise at the exact boundary
    # (|0.600-0.605|*100 = 0.50000000000000004) cannot flip the verdict
    delta_pt = round(abs(top1_q - top1_ref) * 100.0, 4)
    return {
        "gate": "imagenet_top1_delta",
        "q4_0": round(top1_q, 6),
        "f16": round(top1_ref, 6),
        "delta_pt": delta_pt,
        "threshold_pt": threshold_pt,
        "pass": bool(delta_pt <= threshold_pt),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=os.path.expanduser("~/.cache/clip_tpu/drill"))
    p.add_argument("--repo", default="mys/ggml_clip-vit-base-patch32")
    p.add_argument("--quant-file", default=None)
    p.add_argument("--ref-file", default=None)
    p.add_argument("--hf-check", metavar="HF_REPO", default=None,
                   help="also cross-check vs HF transformers weights "
                        "(e.g. openai/clip-vit-base-patch32)")
    p.add_argument("--templates", default=None,
                   help="prompt ensembling for the benchmark (default: "
                        "reference-protocol raw class names)")
    p.add_argument("--dataset", default=None,
                   help="existing class-keyed image directory (skips the "
                        "ImageNet download)")
    p.add_argument("--no-act-quant", dest="act_quant", action="store_false",
                   default=None,
                   help="gate the pure dequant path instead of the engine's "
                        "TPU-default W8A8 (int8 activation) compute — the "
                        "default gates what production actually serves")
    args = p.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    print(f"[1/5] downloading checkpoints from {args.repo} ...", flush=True)
    qp, rp = download_models(args.repo, args.quant_file, args.ref_file,
                             cache_dir=os.path.join(args.workdir, "models"))

    print("[2/5] inspecting checkpoints ...", flush=True)
    for path in (qp, rp):
        meta = inspect_checkpoint(path)
        print(f"    {json.dumps(meta)}", flush=True)

    if args.hf_check:
        print(f"[3/5] HF transformers cross-check vs {args.hf_check} ...", flush=True)
        cos = hf_crosscheck(rp, args.hf_check)
        print(f"    min cosine vs HF: {cos:.5f}", flush=True)
        if cos < 0.99:
            print("FAILED: reference-precision checkpoint diverges from HF",
                  file=sys.stderr)
            return 1
    else:
        print("[3/5] HF cross-check skipped (pass --hf-check to enable)")

    print("[4/5] preparing ImageNet-1k validation set ...", flush=True)
    dataset = args.dataset or prepare_dataset(args.workdir)

    print("[5/5] running the reference-protocol benchmark on both ...", flush=True)
    top1_q = run_benchmark(qp, dataset, os.path.join(args.workdir, "bench_q4_0.md"),
                           templates=args.templates, act_quant=args.act_quant)
    top1_r = run_benchmark(rp, dataset, os.path.join(args.workdir, "bench_ref.md"),
                           templates=args.templates, act_quant=args.act_quant)

    verdict = gate_verdict(top1_q, top1_r)
    print(json.dumps(verdict))
    return 0 if verdict["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
