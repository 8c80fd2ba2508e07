"""Minimal safetensors reader/writer (pure numpy, no deps).

Format: 8-byte LE header length, JSON header {name: {dtype, shape, data_offsets}},
raw little-endian tensor data.  Mirrors the reference's minimal parser
(acestep_ggml/cpp/safetensors.h:11-31) with ranged/lazy reads via memmap.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "BF16": np.dtype("<u2"),   # stored raw; view via bf16_to_f32
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("<i1"),
    "U8": np.dtype("<u1"),
    "BOOL": np.dtype("<u1"),
}

_NP_TO_ST = {
    np.dtype("float64"): "F64",
    np.dtype("float32"): "F32",
    np.dtype("float16"): "F16",
    np.dtype("int64"): "I64",
    np.dtype("int32"): "I32",
    np.dtype("int16"): "I16",
    np.dtype("int8"): "I8",
    np.dtype("uint8"): "U8",
    np.dtype("bool"): "BOOL",
}


def bf16_to_f32(x: np.ndarray) -> np.ndarray:
    return (x.astype(np.uint32) << 16).view(np.float32)


def f32_to_bf16_raw(x: np.ndarray) -> np.ndarray:
    """f32 -> raw uint16 bf16 bits with round-to-nearest-even."""
    bits = x.astype("<f4").view(np.uint32)
    rounding = 0x7FFF + ((bits >> 16) & 1)
    return ((bits + rounding) >> 16).astype("<u2")


class SafetensorsFile:
    """Lazy reader over a memmapped safetensors file."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            (header_len,) = struct.unpack("<Q", f.read(8))
            self.header = json.loads(f.read(header_len))
        self.metadata = self.header.pop("__metadata__", {})
        self._data_offset = 8 + header_len
        self._mm = np.memmap(path, mode="r", dtype=np.uint8)

    def keys(self):
        return self.header.keys()

    def info(self, name: str) -> Tuple[str, Tuple[int, ...]]:
        e = self.header[name]
        return e["dtype"], tuple(e["shape"])

    def tensor(self, name: str, as_f32: bool = False) -> np.ndarray:
        e = self.header[name]
        dt = _DTYPES[e["dtype"]]
        start = self._data_offset + e["data_offsets"][0]
        end = self._data_offset + e["data_offsets"][1]
        arr = np.frombuffer(self._mm[start:end], dtype=dt).reshape(e["shape"])
        if as_f32:
            if e["dtype"] == "BF16":
                return bf16_to_f32(arr)
            return arr.astype(np.float32)
        return arr

    def items(self, as_f32: bool = False) -> Iterator[Tuple[str, np.ndarray]]:
        for name in self.header:
            yield name, self.tensor(name, as_f32=as_f32)


def save_safetensors(
    path: str,
    tensors: Dict[str, np.ndarray],
    metadata: Optional[Dict[str, str]] = None,
    dtype_map: Optional[Dict[str, str]] = None,
) -> None:
    """``dtype_map`` overrides the declared dtype per tensor name (e.g. raw-bits
    uint16 arrays that are really BF16)."""
    header: Dict[str, dict] = {}
    if metadata:
        header["__metadata__"] = metadata
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if dtype_map and name in dtype_map:
            st_dtype = dtype_map[name]
        elif arr.dtype == np.dtype("float16"):
            st_dtype = "F16"
        elif arr.dtype in _NP_TO_ST:
            st_dtype = _NP_TO_ST[arr.dtype]
        else:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        raw = arr.tobytes()
        header[name] = {
            "dtype": st_dtype,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        offset += len(raw)
        blobs.append(raw)
    hjson = json.dumps(header).encode()
    pad = (-len(hjson)) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
