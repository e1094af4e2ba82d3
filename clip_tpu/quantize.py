"""Model quantizer: rewrite an f16/f32 GGUF checkpoint with block-quantized
weights.

Replaces clip_model_quantize (/root/reference/clip.cpp:1661-1844) and the
quantize CLI (/root/reference/models/quantize.cpp).  Parity: only 2-D tensors
whose name matches ``.*weight`` are quantized; all KVs are copied;
``general.file_type`` and ``general.quantization_version`` are updated; a
16-bin code histogram and the size reduction are reported.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

import numpy as np

from .gguf import GGMLType, GGUFReader, GGUFWriter
from .gguf.constants import FTYPE_TO_GGML, GGML_TO_FTYPE, GGML_QNT_VERSION
from .gguf import constants as C
from .quant import quantize_with_hist

_QUANTIZE_NAME_RE = re.compile(r".*weight")


@dataclass
class QuantizeReport:
    in_path: str
    out_path: str
    qtype: GGMLType
    total_size_org: int = 0
    total_size_new: int = 0
    hist: np.ndarray = field(default_factory=lambda: np.zeros(16, np.int64))
    n_quantized: int = 0
    n_kept: int = 0
    elapsed_s: float = 0.0

    def summary(self) -> str:
        mb = 1024.0 * 1024.0
        total = max(int(self.hist.sum()), 1)
        hist_str = " ".join(f"{h / total:5.3f}" for h in self.hist)
        return (
            f"original size  = {self.total_size_org / mb:8.2f} MB\n"
            f"quantized size = {self.total_size_new / mb:8.2f} MB\n"
            f"tensors: {self.n_quantized} quantized ({self.qtype.name.lower()}), "
            f"{self.n_kept} kept\n"
            f"hist: {hist_str}"
        )


def quantize_model(
    in_path: str,
    out_path: str,
    itype: int | str | GGMLType,
    verbose: bool = True,
) -> QuantizeReport:
    """Quantize every 2-D ``.*weight`` tensor to the requested type.

    ``itype`` accepts the reference's integer codes (2/3/6/7/8,
    /root/reference/clip.cpp:1665-1684), type names ("q4_0", ...) or a
    :class:`GGMLType`.
    """
    if isinstance(itype, str):
        qtype = FTYPE_TO_GGML[C.NAME_TO_FTYPE[itype]]
    elif isinstance(itype, GGMLType):
        qtype = itype
    else:
        qtype = FTYPE_TO_GGML[int(itype)]
    if qtype not in GGML_TO_FTYPE or qtype in (GGMLType.F32, GGMLType.F16):
        raise ValueError(f"invalid quantization target {itype!r}")

    t0 = time.time()
    report = QuantizeReport(in_path=in_path, out_path=out_path, qtype=qtype)

    with GGUFReader(in_path) as r:
        w = GGUFWriter(out_path, alignment=r.alignment)
        w.copy_kv_from(r, skip=(C.KEY_FTYPE, C.KEY_QNT_VERSION))
        w.add_uint32(C.KEY_FTYPE, GGML_TO_FTYPE[qtype])
        w.add_uint32(C.KEY_QNT_VERSION, GGML_QNT_VERSION)

        for info in r.tensor_order:
            do_quant = (
                bool(_QUANTIZE_NAME_RE.fullmatch(info.name))
                and len(info.shape_gguf) == 2
                and info.ggml_type in (GGMLType.F32, GGMLType.F16)
                and info.shape_gguf[0] % 32 == 0
            )
            if do_quant:
                f32 = r.tensor_as_float(info.name)
                packed, hist = quantize_with_hist(f32, qtype)
                w.add_quantized_tensor(info.name, info.shape, qtype, packed)
                report.hist += hist
                report.n_quantized += 1
                new_size = packed.nbytes
            else:
                w.add_raw_tensor(
                    info.name, info.shape_gguf, info.ggml_type, bytes(r.tensor_bytes(info.name))
                )
                report.n_kept += 1
                new_size = info.nbytes
            report.total_size_org += info.nbytes
            report.total_size_new += new_size
            if verbose:
                print(
                    f"{info.name}: n_dims = {len(info.shape_gguf)} | quantize={int(do_quant)} "
                    f"| size = {info.nbytes / 2**20:.3f} MB -> {new_size / 2**20:.3f} MB"
                )
        w.write()

    report.elapsed_s = time.time() - t0
    if verbose:
        print(report.summary())
    return report
