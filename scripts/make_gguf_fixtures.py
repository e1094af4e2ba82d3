"""Generate the tiny checked-in GGUF header fixtures (tests/fixtures/).

One file per container version with identical logical content, so the
version-specific wire formats are pinned forever:

* v1 — uint32 string lengths / array counts / tensor+kv counts / tensor dims
  (the format of the published ``mys/ggml_clip-*`` era checkpoints);
* v2 — all of those widened to uint64;
* v3 — same layout as v2 (v3 added big-endian support upstream; files here
  are little-endian like every published CLIP checkpoint).

Deterministic output: rerunning this script reproduces the committed bytes.
"""

from __future__ import annotations

import os
import struct

import numpy as np

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")

ALIGN = 32
# GGUFValueType wire ids
U32, F32, BOOL, STRING, ARRAY = 4, 6, 7, 8, 9
GGML_F32, GGML_F16 = 0, 1


def fixture_tensors() -> list[tuple[str, np.ndarray]]:
    """Logical content shared by all three fixtures (numpy row-major shapes)."""
    w = np.arange(6, dtype=np.float32).reshape(2, 3) * 0.5 - 1.0
    h = np.asarray([1.0, -2.5, 0.125, 3.0], dtype=np.float16)
    return [("w", w), ("h", h)]


def fixture_kvs() -> list[tuple[str, int, object]]:
    return [
        ("general.name", STRING, "header-fixture"),
        ("fixture.u32", U32, 7),
        ("fixture.flag", BOOL, True),
        ("fixture.strings", ARRAY, (STRING, ["alpha", "bb"])),
        ("fixture.floats", ARRAY, (F32, [1.5, -2.0, 0.25])),
    ]


def build(version: int) -> bytes:
    lenfmt = "<I" if version == 1 else "<Q"

    def pstr(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack(lenfmt, len(b)) + b

    def pval(vtype: int, value) -> bytes:
        if vtype == BOOL:
            return struct.pack("<B", 1 if value else 0)
        if vtype == STRING:
            return pstr(value)
        if vtype == ARRAY:
            et, items = value
            out = [struct.pack("<I", et), struct.pack(lenfmt, len(items))]
            out += [pval(et, it) for it in items]
            return b"".join(out)
        if vtype == U32:
            return struct.pack("<I", value)
        if vtype == F32:
            return struct.pack("<f", value)
        raise AssertionError(vtype)

    tensors = fixture_tensors()
    kvs = fixture_kvs()

    out = [b"GGUF", struct.pack("<I", version),
           struct.pack(lenfmt, len(tensors)), struct.pack(lenfmt, len(kvs))]
    for key, vtype, value in kvs:
        out.append(pstr(key))
        out.append(struct.pack("<I", vtype))
        out.append(pval(vtype, value))

    offset = 0
    blobs = []
    for name, arr in tensors:
        shape_gguf = tuple(reversed(arr.shape))  # ne[0] = contiguous
        out.append(pstr(name))
        out.append(struct.pack("<I", len(shape_gguf)))
        for d in shape_gguf:
            out.append(struct.pack(lenfmt, d))
        gt = GGML_F32 if arr.dtype == np.float32 else GGML_F16
        offset = (offset + ALIGN - 1) // ALIGN * ALIGN
        out.append(struct.pack("<IQ", gt, offset))
        blobs.append((offset, arr.tobytes()))
        offset += arr.nbytes

    meta = b"".join(out)
    meta += b"\x00" * (-len(meta) % ALIGN)
    data = bytearray(offset)
    for off, payload in blobs:
        data[off:off + len(payload)] = payload
    return meta + bytes(data)


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    for version in (1, 2, 3):
        path = os.path.join(FIXDIR, f"header_v{version}.gguf")
        with open(path, "wb") as f:
            f.write(build(version))
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
