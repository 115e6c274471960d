"""Torch-free reader (and torch-compatible writer) for `.pt` tensor dicts.

The reference's datasets are dicts of tensors serialized with torch.save
(ref README.md:33-44, general_dataset.py:64). A torch.save archive is a zip
containing `<root>/data.pkl` (a pickle whose tensors are persistent-ID
references) plus one raw little-endian buffer per storage under
`<root>/data/<key>`. This module parses that format directly into numpy —
no torch import on the load path — so the TPU pipeline carries zero torch
dependency. Unknown/legacy formats fall back to torch when it is installed.

Supported storage dtypes include bfloat16 via ml_dtypes (jax's dtype
registry), which numpy alone lacks.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

try:  # bfloat16/fp8 support piggybacks on jax's ml_dtypes
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": _BFLOAT16,
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)


class _LazyStorage:
    def __init__(self, dtype: np.dtype, data: bytes):
        self.array = np.frombuffer(data, dtype=dtype)


def _contiguous_strides(size):
    out, acc = [], 1
    for s in reversed(size):
        out.append(acc)
        acc *= s
    return tuple(reversed(out))


def _rebuild_tensor(storage: _LazyStorage, storage_offset, size, stride, *unused):
    base = storage.array
    size = tuple(size)
    stride = tuple(stride)
    if not size:
        return base[storage_offset].copy()
    if stride == _contiguous_strides(size):
        # zero-copy: reshape the storage buffer directly (the buffer is
        # owned by this load, so aliasing is safe)
        n = int(np.prod(size))
        return base[storage_offset : storage_offset + n].reshape(size)
    itemsize = base.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        base[storage_offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
        writeable=False,
    )
    return np.ascontiguousarray(view)


def _rebuild_from_type_v2(func, tensor_type, args, state):
    return func(*args)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _OrderedDictShim(dict):
    """Stand-in for collections.OrderedDict in torch pickles. A real
    subclass (not plain dict) because torch state_dicts BUILD the dict
    with a `_metadata` attribute state — pickle's load_build does
    `inst.__dict__.update(state)`, which plain dict instances lack."""


class _TorchFreeUnpickler(pickle.Unpickler):
    """Resolves the torch globals a torch.save pickle references onto local
    numpy-producing equivalents, and storages onto zip members."""

    def __init__(self, file, read_record):
        super().__init__(file)
        self._read_record = read_record

    def find_class(self, module: str, name: str):
        if module.startswith("torch"):
            if name in _STORAGE_DTYPES:
                return _StorageType(name)
            if name == "_rebuild_tensor_v2" or name == "_rebuild_tensor":
                return _rebuild_tensor
            if name == "_rebuild_from_type_v2":
                return _rebuild_from_type_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
            if name == "Tensor":
                return lambda *a, **k: None
            raise pickle.UnpicklingError(f"unsupported torch global {module}.{name}")
        if module == "collections" and name == "OrderedDict":
            return _OrderedDictShim
        if module in ("numpy", "numpy.core.multiarray", "numpy._core.multiarray"):
            import importlib

            return getattr(importlib.import_module(module), name)
        raise pickle.UnpicklingError(f"refusing to load global {module}.{name}")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        assert kind == "storage", f"unknown persistent id {pid!r}"
        if isinstance(storage_type, _StorageType):
            dtype = storage_type.dtype
            if dtype is None:
                raise pickle.UnpicklingError(f"dtype for {storage_type.name} unavailable")
        else:  # UntypedStorage path: numel is bytes
            dtype = np.dtype("u1")
        return _LazyStorage(dtype, self._read_record(key))


def _native_bulk_read(path: str, zf: "zipfile.ZipFile", root: str):
    """Read every stored `data/<key>` payload in one parallel native call
    (gelslim_depth_tpu/native/ptloader.cpp). Returns {member_name: buffer}
    or None when the native library or format is unavailable."""
    import ctypes

    from gelslim_depth_tpu.native import load_library

    lib = load_library("ptloader")
    if lib is None:
        return None
    infos = [
        i for i in zf.infolist()
        if i.filename.startswith(f"{root}data/") and i.file_size > 0
    ]
    if not infos or any(i.compress_type != zipfile.ZIP_STORED for i in infos):
        return None
    n = len(infos)
    offsets = (ctypes.c_uint64 * n)(*[i.header_offset for i in infos])
    sizes = (ctypes.c_uint64 * n)(*[i.file_size for i in infos])
    bufs = [np.empty(i.file_size, np.uint8) for i in infos]
    dsts = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
    )
    rc = lib.ptl_read_many(path.encode(), offsets, sizes, dsts, n, 0)
    if rc != 0:
        return None
    return {i.filename: b for i, b in zip(infos, bufs)}


def load_pt(path: str, *, native: bool = True) -> Dict[str, Any]:
    """Load a torch.save zip archive into a dict of numpy arrays.

    native=True (default) bulk-reads all tensor payloads through the C++
    parallel reader when available, falling back transparently."""
    try:
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
            root = pkl_name[: -len("data.pkl")]
            bulk = _native_bulk_read(path, zf, root) if native else None

            def read_record(key: str) -> bytes:
                if bulk is not None:
                    member = f"{root}data/{key}"
                    if member in bulk:
                        return bulk[member]
                return zf.read(f"{root}data/{key}")

            with zf.open(pkl_name) as f:
                return _TorchFreeUnpickler(io.BytesIO(f.read()), read_record).load()
    except (zipfile.BadZipFile, StopIteration, pickle.UnpicklingError, KeyError) as e:
        # legacy torch formats or exotic globals: delegate to torch if present
        try:
            import torch
        except ImportError:
            raise RuntimeError(f"cannot parse {path} torch-free ({e}) and torch unavailable")
        data = torch.load(path, map_location="cpu", weights_only=False)
        return {
            k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in data.items()
        } if isinstance(data, dict) else data


def save_pt(obj: Dict[str, Any], path: str) -> None:
    """Save a dict of arrays as a torch-loadable `.pt`.

    Uses torch when available (bit-identical to reference tooling output).
    Without torch, writes the same zip layout with a hand-built pickle so
    torch consumers can still `torch.load` the file.
    """
    try:
        import torch

        def to_tensor(v):
            if not isinstance(v, np.ndarray):
                return v
            a = np.ascontiguousarray(v)
            if not a.flags.writeable:  # torch rejects non-writable views
                a = a.copy()
            if _BFLOAT16 is not None and a.dtype == _BFLOAT16:
                # torch.from_numpy does not know ml_dtypes; reinterpret bits
                return torch.from_numpy(a.view(np.uint16).copy()).view(torch.bfloat16)
            return torch.from_numpy(a)

        torch.save({k: to_tensor(v) for k, v in obj.items()}, path)
        return
    except ImportError:
        pass
    _save_pt_torchfree(obj, path)


# --- torch-free writer -------------------------------------------------------

_NP_TO_STORAGE = {
    np.dtype("float32"): ("FloatStorage", "torch"),
    np.dtype("float64"): ("DoubleStorage", "torch"),
    np.dtype("float16"): ("HalfStorage", "torch"),
    np.dtype("int64"): ("LongStorage", "torch"),
    np.dtype("int32"): ("IntStorage", "torch"),
    np.dtype("int16"): ("ShortStorage", "torch"),
    np.dtype("int8"): ("CharStorage", "torch"),
    np.dtype("uint8"): ("ByteStorage", "torch"),
    np.dtype("bool"): ("BoolStorage", "torch"),
}
if _BFLOAT16 is not None:  # the reader supports bf16; keep writes symmetric
    _NP_TO_STORAGE[_BFLOAT16] = ("BFloat16Storage", "torch")


def _save_pt_torchfree(obj: Dict[str, Any], path: str) -> None:
    """Emit torch.save's zip layout (data.pkl + data/<n> buffers) with a
    manually assembled pickle stream referencing torch globals by name."""
    storages = []  # (key, bytes)

    out = io.BytesIO()
    out.write(b"\x80\x02")  # protocol 2

    def w_str(s: str):
        b = s.encode()
        out.write(b"X" + struct.pack("<I", len(b)) + b)  # SHORT_BINUNICODE-ish (BINUNICODE)

    def w_global(module, name):
        out.write(f"c{module}\n{name}\n".encode())

    def w_int(i: int):
        out.write(b"J" + struct.pack("<i", i))

    def w_tuple(n_marker=True):
        out.write(b"t")

    out.write(b"}")  # empty dict
    out.write(b"(")  # mark for SETITEMS
    for k, v in obj.items():
        v = np.ascontiguousarray(v)
        if v.dtype not in _NP_TO_STORAGE:
            raise ValueError(f"unsupported dtype {v.dtype} for torch-free save")
        storage_name, storage_mod = _NP_TO_STORAGE[v.dtype]
        key = str(len(storages))
        storages.append((key, v.tobytes()))
        w_str(k)
        # _rebuild_tensor_v2(storage_pid, 0, shape, stride, False, OrderedDict())
        w_global("torch._utils", "_rebuild_tensor_v2")
        out.write(b"(")
        # persistent id tuple: ('storage', StorageType, key, 'cpu', numel) via BINPERSID
        out.write(b"(")
        w_str("storage")
        w_global(storage_mod, storage_name)
        w_str(key)
        w_str("cpu")
        w_int(v.size)
        out.write(b"t")
        out.write(b"Q")  # BINPERSID
        w_int(0)
        out.write(b"(")
        for s in v.shape:
            w_int(s)
        out.write(b"t")
        out.write(b"(")
        stride = [st // v.dtype.itemsize for st in v.strides]
        for s in stride:
            w_int(s)
        out.write(b"t")
        out.write(b"\x89")  # NEWFALSE (requires_grad)
        w_global("collections", "OrderedDict")
        out.write(b")R")  # empty tuple + REDUCE -> OrderedDict()
        out.write(b"t")  # close args tuple
        out.write(b"R")  # REDUCE _rebuild_tensor_v2(*args)
    out.write(b"u")  # SETITEMS
    out.write(b".")  # STOP

    root = os.path.splitext(os.path.basename(path))[0] or "archive"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{root}/data.pkl", out.getvalue())
        for key, buf in storages:
            zf.writestr(f"{root}/data/{key}", buf)
        zf.writestr(f"{root}/version", "3\n")
