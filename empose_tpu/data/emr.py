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
