"""EMRecord: a minimal mmap-friendly record corpus (LMDB replacement).

The reference stores its training corpora in LMDB (reference:
empose/data/datasets.py:19-62, scripts/preprocess_amass_3dpw.py:170-189);
LMDB is not part of this framework's dependency set, so sequences live in a
single flat file designed for zero-copy windowed reads:

    [magic 'EMR1'][uint64 index_offset][record payloads ...][JSON index]

Every array field of every record is a contiguous little-endian blob whose
(offset, dtype, shape) triple is in the footer index, so a reader can map any
temporal window of any field without touching the rest of the file. A C++
reader (native/emr_reader.cpp, loaded via ctypes) provides batched
window-gather for the training input pipeline; this module is the pure-Python
reference implementation and writer.
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Dict, List, Optional

import numpy as np

MAGIC = b"EMR1"


class EMRWriter:
    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "wb")
        self.f.write(MAGIC)
        self.f.write(struct.pack("<Q", 0))  # index offset placeholder
        self.index: List[Dict] = []

    def add_record(self, meta: Dict, fields: Dict[str, np.ndarray]) -> None:
        """:param meta: JSON-safe metadata (id, gender, n_frames, ...)."""
        entry = {"meta": dict(meta), "fields": {}}
        for name, arr in fields.items():
            arr = np.ascontiguousarray(arr)
            if arr.dtype == np.float64:
                arr = arr.astype(np.float32)
            offset = self.f.tell()
            self.f.write(arr.tobytes())
            entry["fields"][name] = [offset, str(arr.dtype), list(arr.shape)]
        self.index.append(entry)

    def close(self) -> None:
        index_offset = self.f.tell()
        self.f.write(json.dumps(self.index).encode("utf-8"))
        self.f.seek(len(MAGIC))
        self.f.write(struct.pack("<Q", index_offset))
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class EMRReader:
    """mmap-backed reader; windowed field reads are zero-copy views."""

    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "rb")
        self.mm = mmap.mmap(self.f.fileno(), 0, access=mmap.ACCESS_READ)
        assert self.mm[:4] == MAGIC, f"Not an EMR file: {path}"
        (index_offset,) = struct.unpack("<Q", self.mm[4:12])
        self.index = json.loads(self.mm[index_offset:].decode("utf-8"))

    def __len__(self) -> int:
        return len(self.index)

    def meta(self, i: int) -> Dict:
        return self.index[i]["meta"]

    def read(self, i: int, field: str, start: Optional[int] = None, end: Optional[int] = None) -> np.ndarray:
        offset, dtype, shape = self.index[i]["fields"][field]
        dtype = np.dtype(dtype)
        arr = np.frombuffer(self.mm, dtype=dtype, count=int(np.prod(shape)), offset=offset).reshape(shape)
        if start is not None or end is not None:
            arr = arr[start:end]
        return arr

    def fields(self, i: int) -> List[str]:
        return list(self.index[i]["fields"].keys())

    def close(self) -> None:
        self.mm.close()
        self.f.close()


# ---------------------------------------------------------------------------
# Native (C++) batched window gather — see native/emr_reader.cpp
# ---------------------------------------------------------------------------

import ctypes
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_NATIVE_LIB = os.path.join(_NATIVE_DIR, "libemr_reader.so")
_lib = None


def _load_native():
    """Load (building on demand) the native reader; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_NATIVE_LIB):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_NATIVE_LIB)
    except OSError:
        return None
    lib.emr_mmap_open.restype = ctypes.c_void_p
    lib.emr_mmap_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.emr_mmap_close.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.emr_gather_windows.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int32]
    lib.emr_gather_fixed.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p]
    _lib = lib
    return lib


class NativeEMRBatcher:
    """Multithreaded batched window gather straight from the mmap'd corpus.

    Falls back to the pure-Python EMRReader path when the native library
    cannot be built/loaded (``self.native`` tells which path is active).
    """

    def __init__(self, reader: EMRReader, n_threads: int = 0):
        self.reader = reader
        self.n_threads = n_threads
        self.lib = _load_native()
        self.base = None
        if self.lib is not None:
            size = ctypes.c_uint64()
            self.base = self.lib.emr_mmap_open(reader.path.encode(), ctypes.byref(size))
            self._size = size.value
        self.native = self.base is not None

    def close(self):
        if self.native:
            self.lib.emr_mmap_close(self.base, self._size)
            self.base = None
            self.native = False

    def _field_info(self, i: int, field: str):
        offset, dtype, shape = self.reader.index[i]["fields"][field]
        return offset, np.dtype(dtype), shape

    def gather_windows(self, field: str, indices, starts, n_frames, pad_frames: int) -> np.ndarray:
        """Gather per-record temporal windows into a (B, pad_frames, ...) batch."""
        indices = list(indices)
        b = len(indices)
        off0, dtype, shape = self._field_info(indices[0], field)
        row_shape = tuple(shape[1:])
        row_bytes = int(np.prod(row_shape)) * dtype.itemsize if row_shape else dtype.itemsize
        out = np.empty((b, pad_frames) + row_shape, dtype=dtype)

        if not self.native:
            out[:] = 0
            for k, i in enumerate(indices):
                arr = self.reader.read(i, field, int(starts[k]), int(starts[k]) + int(n_frames[k]))
                out[k, : arr.shape[0]] = arr
            return out

        offsets = np.asarray([self._field_info(i, field)[0] for i in indices], np.uint64)
        starts_a = np.asarray(starts, np.int64)
        frames_a = np.asarray(n_frames, np.int64)
        self.lib.emr_gather_windows(
            ctypes.c_void_p(self.base),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            starts_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            frames_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            b, row_bytes, pad_frames,
            out.ctypes.data_as(ctypes.c_void_p), self.n_threads)
        return out

    def gather_fixed(self, field: str, indices) -> np.ndarray:
        indices = list(indices)
        b = len(indices)
        _, dtype, shape = self._field_info(indices[0], field)
        out = np.empty((b,) + tuple(shape), dtype=dtype)
        if not self.native:
            for k, i in enumerate(indices):
                out[k] = self.reader.read(i, field)
            return out
        offsets = np.asarray([self._field_info(i, field)[0] for i in indices], np.uint64)
        blob_bytes = int(np.prod(shape)) * dtype.itemsize
        self.lib.emr_gather_fixed(
            ctypes.c_void_p(self.base),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            b, blob_bytes, out.ctypes.data_as(ctypes.c_void_p))
        return out
