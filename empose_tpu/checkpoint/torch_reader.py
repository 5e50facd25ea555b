"""Dependency-free reader for torch ``.pth`` checkpoints -> numpy dicts.

The 8 released EM-POSE checkpoints are torch ``model.pth`` dicts written by
``torch.save`` (reference: train.py:195-205, loaded at eval/helpers.py:131-137).
This reader parses both torch serialization formats without importing torch:

  * zipfile format (torch >= 1.6 default): ``archive/data.pkl`` pickled with
    persistent-id references to raw little-endian storage blobs under
    ``archive/data/<key>``;
  * legacy format: a stream of pickles followed by storage payloads.

Tensors are materialized as numpy arrays (strided views are copied to
contiguous). Only data is reconstructed — no code execution beyond the
whitelisted rebuild shims.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

_DTYPE_MAP = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": np.uint16,  # converted to f32 on rebuild
}


class _Storage:
    def __init__(self, dtype: np.dtype, data: bytes, is_bf16: bool = False):
        self.dtype = dtype
        self.data = data
        self.is_bf16 = is_bf16

    def as_array(self) -> np.ndarray:
        arr = np.frombuffer(self.data, dtype=self.dtype)
        if self.is_bf16:
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        return arr


def _rebuild_tensor(storage: _Storage, storage_offset: int, size, stride) -> np.ndarray:
    flat = storage.as_array()
    if not size:
        return flat[storage_offset].copy()
    itemsize = flat.dtype.itemsize
    byte_strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        flat[storage_offset:], shape=tuple(size), strides=byte_strides)
    return np.ascontiguousarray(view)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    return _rebuild_tensor(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _StorageTag:
    """Marker for torch storage-type globals found during unpickling."""

    def __init__(self, name: str):
        self.name = name


class _Unpickler(pickle.Unpickler):
    def __init__(self, file: BinaryIO, load_storage):
        super().__init__(file, encoding="latin1")
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if name in _DTYPE_MAP and module.startswith("torch"):
            return _StorageTag(name)
        if module == "torch._utils":
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_tensor":
                return _rebuild_tensor
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name == "Size":
            return tuple
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *a: None
        if module in ("collections", "builtins", "__builtin__", "numpy",
                      "numpy.core.multiarray", "numpy._core.multiarray"):
            return super().find_class(module, name)
        if module.startswith("torch"):
            # Any other torch global (device, dtype, ...) -> inert placeholder.
            return lambda *a, **k: None
        raise pickle.UnpicklingError(f"Global '{module}.{name}' is not allowed")

    def persistent_load(self, pid):
        # zip format: ('storage', type, key, location, numel)
        # legacy:     ('storage', type, root_key, location, numel, view_metadata)
        assert isinstance(pid, tuple) and pid[0] == "storage", f"Unexpected pid {pid!r}"
        storage_tag, key, location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_tag.name if isinstance(storage_tag, _StorageTag) else str(storage_tag)
        return self._load_storage(name, str(key), int(numel))


def _load_zip(path: str) -> Any:
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    prefix = names[0].split("/")[0]

    def load_storage(type_name: str, key: str, numel: int) -> _Storage:
        dtype = np.dtype(_DTYPE_MAP[type_name])
        data = zf.read(f"{prefix}/data/{key}")
        return _Storage(dtype, data, is_bf16=(type_name == "BFloat16Storage"))

    with zf.open(f"{prefix}/data.pkl") as f:
        return _Unpickler(io.BytesIO(f.read()), load_storage).load()


def _load_legacy(path: str) -> Any:
    """Legacy (pre-1.6) torch.save format: pickles + trailing storage blobs."""
    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != 0x1950A86A20F9469CFC6C:
            raise ValueError("Not a legacy torch file")
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info

        # Pass 1: unpickle with dummy zero storages, recording (type, numel)
        # per key; the tensor tree shape is discovered and the storage payload
        # section begins right after the main pickle.
        pending: Dict[str, tuple] = {}

        def load_dummy(type_name: str, key: str, numel: int) -> _Storage:
            pending[key] = (type_name, numel)
            dtype = np.dtype(_DTYPE_MAP[type_name])
            return _Storage(dtype, b"\0" * (numel * dtype.itemsize),
                            is_bf16=(type_name == "BFloat16Storage"))

        _Unpickler(f, load_dummy).load()

        # Read the real storage payloads.
        storages: Dict[str, _Storage] = {}
        storage_keys = pickle.load(f)
        for key in storage_keys:
            type_name, numel = pending[str(key)]
            dtype = np.dtype(_DTYPE_MAP[type_name])
            (n,) = struct.unpack("<q", f.read(8))
            data = f.read(n * dtype.itemsize)
            storages[str(key)] = _Storage(dtype, data, is_bf16=(type_name == "BFloat16Storage"))

    # Pass 2: re-parse with the real storages bound.
    with open(path, "rb") as f2:
        pickle.load(f2)
        pickle.load(f2)
        pickle.load(f2)
        return _Unpickler(f2, lambda t, k, n: storages[k]).load()


def load_torch_checkpoint(path: str) -> Any:
    """Load a .pth file into plain Python containers with numpy leaves."""
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    return _load_legacy(path)


def load_state_dict(path: str, state_key: str = "model_state_dict") -> Dict[str, np.ndarray]:
    """Load the model state dict from a reference checkpoint
    (reference eval/helpers.py:131-137)."""
    ckpt = load_torch_checkpoint(path)
    if isinstance(ckpt, dict) and state_key in ckpt:
        ckpt = ckpt[state_key]
    return {k: np.asarray(v) for k, v in ckpt.items() if isinstance(v, np.ndarray)}
