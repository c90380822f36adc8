"""First-party safetensors reader/writer (pure Python).

The reference depends on the Rust ``safetensors`` crate for its checkpoint
interchange format (reference train.py:18,441; inference.py:13,66). The
format itself is trivial — an 8-byte little-endian header length, a JSON
header mapping tensor names to {dtype, shape, data_offsets}, then raw
little-endian tensor bytes — so the framework carries its own implementation
(SURVEY.md §2 native-deps table calls for exactly this) and uses the library
only as a cross-check in tests.

Reading is zero-copy per tensor via numpy views over a single mmap-able
buffer.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Optional

import numpy as np

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U64": np.uint64, "U32": np.uint32, "U16": np.uint16, "U8": np.uint8,
    "BOOL": np.bool_,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}
# bfloat16 round-trips as raw uint16 payload with the BF16 tag
_BF16 = "BF16"


def save_file(tensors: Dict[str, np.ndarray], path: str) -> None:
    header = {}
    payload = bytearray()
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype == np.dtype("V2") or str(arr.dtype) == "bfloat16":
            dt = _BF16
            raw = arr.view(np.uint16).tobytes()
        else:
            if arr.dtype not in _DTYPE_NAMES:
                raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
            dt = _DTYPE_NAMES[arr.dtype]
            raw = arr.tobytes()
        start = len(payload)
        payload += raw
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [start, len(payload)],
        }
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # pad header to 8-byte alignment (the reference implementation does)
    pad = (8 - len(hjson) % 8) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        f.write(bytes(payload))


def load_file(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = f.read()
    (hlen,) = struct.unpack_from("<Q", data, 0)
    header = json.loads(data[8 : 8 + hlen].decode("utf-8"))
    base = 8 + hlen
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        buf = data[base + start : base + end]
        shape = tuple(meta["shape"])
        if meta["dtype"] == _BF16:
            try:
                import jax.numpy as jnp

                arr = np.frombuffer(buf, np.uint16).reshape(shape)
                out[name] = np.asarray(arr).view(jnp.bfloat16.dtype)  # type: ignore
            except Exception:
                out[name] = np.frombuffer(buf, np.uint16).reshape(shape)
        else:
            dt = _DTYPES.get(meta["dtype"])
            if dt is None:
                raise ValueError(f"unsupported dtype {meta['dtype']} in {path}")
            out[name] = np.frombuffer(buf, dt).reshape(shape)
    return out
