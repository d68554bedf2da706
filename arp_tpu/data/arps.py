"""ARPS shard format: writer, converter, and reader (native C++ or pure-python).

The framework's native data path (see arp_tpu/native/arps.cpp).  HDF5 demo
files convert once into per-key .arps shards; the training loader then reads
batches through the C++ thread pool (GIL-free parallel zlib) with a
pure-python zlib fallback when the shared library isn't built.

Build the native reader with ``sh arp_tpu/native/build.sh`` (auto-attempted
on first use).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import zlib
from typing import Optional

import numpy as np

_DTYPES = {0: np.uint8, 1: np.int32, 2: np.int64, 3: np.float32}
_DTYPE_CODES = {np.dtype(np.uint8): 0, np.dtype(np.int32): 1, np.dtype(np.int64): 2, np.dtype(np.float32): 3}

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.join(os.path.dirname(__file__), "..", "native")
    so_path = os.path.abspath(os.path.join(here, "libarps.so"))
    if not os.path.exists(so_path):
        try:
            subprocess.run(["sh", os.path.join(here, "build.sh")], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.arps_open.restype = ctypes.c_void_p
    lib.arps_open.argtypes = [ctypes.c_char_p]
    lib.arps_close.argtypes = [ctypes.c_void_p]
    lib.arps_count.restype = ctypes.c_uint64
    lib.arps_count.argtypes = [ctypes.c_void_p]
    lib.arps_record_bytes.restype = ctypes.c_uint64
    lib.arps_record_bytes.argtypes = [ctypes.c_void_p]
    lib.arps_ndim.restype = ctypes.c_uint32
    lib.arps_ndim.argtypes = [ctypes.c_void_p]
    lib.arps_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.arps_dtype.restype = ctypes.c_uint32
    lib.arps_dtype.argtypes = [ctypes.c_void_p]
    lib.arps_read_batch.restype = ctypes.c_int
    lib.arps_read_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.pil_resize_batch.restype = None
    lib.pil_resize_batch.argtypes = [
        u8p, u8p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32,
        ctypes.c_int32,
    ]
    _LIB = lib
    return _LIB


def write_arps(path: str, data: np.ndarray, compress: bool = True, level: int = 1) -> None:
    """Write (N, ...) array as an ARPS shard (record = data[i])."""
    data = np.ascontiguousarray(data)
    code = _DTYPE_CODES[data.dtype]
    n = data.shape[0]
    record_shape = data.shape[1:]
    payloads = []
    for i in range(n):
        raw = data[i].tobytes()
        if compress:
            comp = zlib.compress(raw, level)
            payloads.append(comp if len(comp) < len(raw) else raw)
        else:
            payloads.append(raw)
    offsets = np.zeros(n + 1, np.uint64)
    for i, p in enumerate(payloads):
        offsets[i + 1] = offsets[i] + len(p)
    with open(path, "wb") as f:
        f.write(b"ARPS")
        f.write(struct.pack("<II", 1, len(record_shape)))
        f.write(struct.pack(f"<{len(record_shape)}Q", *record_shape))
        f.write(struct.pack("<IQ", code, n))
        f.write(offsets.tobytes())
        for p in payloads:
            f.write(p)


class ArpsReader:
    """Batch record reader; native (GIL-free parallel zlib) when available."""

    def __init__(self, path: str, num_threads: int = 8, force_python: bool = False):
        self.path = path
        self.num_threads = num_threads
        self._handle = None
        self._lib = None if force_python else _native_lib()
        if self._lib is not None:
            self._handle = self._lib.arps_open(path.encode())
            if not self._handle:
                raise IOError(f"native open failed for {path}")
            ndim = self._lib.arps_ndim(self._handle)
            shape = (ctypes.c_uint64 * ndim)()
            self._lib.arps_shape(self._handle, shape)
            self.record_shape = tuple(int(s) for s in shape)
            self.dtype = np.dtype(_DTYPES[self._lib.arps_dtype(self._handle)])
            self.count = int(self._lib.arps_count(self._handle))
        else:
            self._open_python()

    def _open_python(self):
        with open(self.path, "rb") as f:
            assert f.read(4) == b"ARPS"
            version, ndim = struct.unpack("<II", f.read(8))
            assert version == 1
            self.record_shape = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
            code, n = struct.unpack("<IQ", f.read(12))
            self.dtype = np.dtype(_DTYPES[code])
            self.count = n
            self._py_offsets = np.frombuffer(f.read(8 * (n + 1)), np.uint64)
            self._py_data_start = f.tell()
        self._record_bytes = int(np.prod(self.record_shape)) * self.dtype.itemsize

    def read_batch(self, indices) -> np.ndarray:
        indices = np.asarray(indices, np.uint64)
        n = len(indices)
        out = np.empty((n,) + self.record_shape, self.dtype)
        if self._handle is not None:
            idx_arr = indices.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
            buf = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            rc = self._lib.arps_read_batch(self._handle, idx_arr, n, buf, self.num_threads)
            if rc != 0:
                raise IOError(f"arps_read_batch failed rc={rc}")
            return out
        with open(self.path, "rb") as f:
            for i, idx in enumerate(indices):
                begin = int(self._py_offsets[idx])
                end = int(self._py_offsets[idx + 1])
                f.seek(self._py_data_start + begin)
                payload = f.read(end - begin)
                raw = payload if len(payload) == self._record_bytes else zlib.decompress(payload)
                out[i] = np.frombuffer(raw, self.dtype).reshape(self.record_shape)
        return out

    def close(self):
        if self._handle is not None:
            self._lib.arps_close(self._handle)
            self._handle = None

    def __len__(self):
        return self.count

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def convert_hdf5(hdf5_path: str, out_dir: str, keys=None, compress: bool = True) -> dict:
    """Convert HDF5 demo datasets to per-key ARPS shards."""
    import h5py

    os.makedirs(out_dir, exist_ok=True)
    written = {}
    with h5py.File(hdf5_path, "r") as g:
        for key in keys or list(g.keys()):
            data = np.asarray(g[key])
            if data.dtype == np.bool_:
                data = data.astype(np.uint8)
            if data.dtype not in _DTYPE_CODES:
                data = data.astype(np.float32)
            path = os.path.join(out_dir, f"{key}.arps")
            # atomic publish: write under a per-process temp name then rename,
            # so a concurrent host (per-host sharding) or a crashed conversion
            # can never expose a truncated shard to the existence check in
            # ProcgenDataset._init_arps
            tmp = f"{path}.tmp.{os.getpid()}"
            write_arps(tmp, data, compress=compress)
            os.replace(tmp, path)
            written[key] = path
    return written
