"""ctypes bindings for the native TFRecord reader (native/tfrec.cc).

The shared library is built on first use with g++ (no pybind11 in the
toolchain; plain C ABI + ctypes). The build/dlopen happens lazily in
``get_lib()`` — importing this module always succeeds; callers that want
a fallback must call ``get_lib()`` eagerly and catch the failure, then
fall back to the pure-Python codec (mmdgan_tpu/data/tfrecord.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "tfrec.cc")

_lib = None
_lock = threading.Lock()


def _so_path() -> str:
    """Build-output path keyed on the SOURCE HASH, not mtime: the library
    is compiled with -march=native, so a binary from another machine (or a
    stale one next to a touched-but-identical source) must never be
    dlopen'd — a content-addressed filename makes reuse exact."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_REPO_ROOT, "native", f"libtfrec-{digest}.so")


def _build(so: str) -> str:
    os.makedirs(os.path.dirname(so), exist_ok=True)
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)  # atomic under concurrent builders
    return so


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _so_path()
        if not os.path.isfile(so):
            _build(so)
        lib = ctypes.CDLL(so)
        lib.tfrec_open.restype = ctypes.c_void_p
        lib.tfrec_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.tfrec_close.argtypes = [ctypes.c_void_p]
        lib.tfrec_read_batch.restype = ctypes.c_int
        lib.tfrec_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.tfrec_writer_open.restype = ctypes.c_void_p
        lib.tfrec_writer_open.argtypes = [ctypes.c_char_p]
        lib.tfrec_write_batch.restype = ctypes.c_int64
        lib.tfrec_write_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tfrec_writer_close.restype = ctypes.c_int
        lib.tfrec_writer_close.argtypes = [ctypes.c_void_p]
        lib.tfrec_crc32c.restype = ctypes.c_uint32
        lib.tfrec_crc32c.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.tfrec_masked_crc32c.restype = ctypes.c_uint32
        lib.tfrec_masked_crc32c.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib._so_path = so
        _lib = lib
        return lib


class NativeReader:
    """Bulk reader: fills caller batch buffers in one C call."""

    def __init__(self, path: str, verify_crc: bool = False):
        self.lib = get_lib()
        self.handle = self.lib.tfrec_open(path.encode(), int(verify_crc))
        if not self.handle:
            raise IOError(f"tfrec_open failed for {path}")
        self.path = path

    def read_batch(
        self, batch: int, x_capacity: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (x [n, x_capacity] uint8, x_lens [n] int64, y [n] int32);
        n < batch at EOF."""
        x = np.empty((batch, x_capacity), np.uint8)
        lens = np.empty(batch, np.int64)
        y = np.empty(batch, np.int32)
        n = self.lib.tfrec_read_batch(
            self.handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            x_capacity,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            batch,
        )
        if n < 0:
            raise IOError(f"native tfrecord parse error in {self.path}")
        return x[:n], lens[:n], y[:n]

    def close(self):
        if self.handle:
            self.lib.tfrec_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeRecordIterator:
    """Record-level iterator compatible with TFRecordReader: yields the
    re-serialized example payload? No — for pipeline use we yield a dict
    shortcut via ``examples()``; for raw iteration we read frames in bulk
    and yield (x_bytes, y) tuples re-wrapped by the pipeline decode.

    To keep the pipeline interface simple (it expects serialized example
    bytes), this iterator instead exposes decoded examples directly via
    the ``decoded`` attribute protocol used by ReadTFRecords.
    """

    # initial per-record buffer; grows geometrically when a record exceeds
    # it (the oversized record is dropped from the truncated read and the
    # file is re-read from the start with the larger capacity — records in
    # one dataset are near-constant size, so this happens at most once).
    DEFAULT_CAPACITY = 64 << 10
    BULK = 256

    def __init__(self, path: str, verify_crc: bool = False, capacity: Optional[int] = None):
        self.path = path
        self.verify_crc = verify_crc
        self.capacity = capacity or self.DEFAULT_CAPACITY

    def __iter__(self):
        # yields decoded dicts {'x': bytes, 'y': ndarray} — ReadTFRecords
        # detects dicts and skips its Python proto parse.
        yielded = 0
        while True:  # restart loop when capacity grows
            reader = NativeReader(self.path, self.verify_crc)
            try:
                # skip records already yielded before a capacity restart
                to_skip = yielded
                while to_skip > 0:
                    x, lens, y = reader.read_batch(
                        min(self.BULK, to_skip), self.capacity)
                    if len(x) == 0:
                        return
                    to_skip -= len(x)
                restart = False
                while True:
                    x, lens, y = reader.read_batch(self.BULK, self.capacity)
                    if len(x) == 0:
                        return
                    max_len = int(lens.max())
                    if max_len > self.capacity:
                        while self.capacity < max_len:
                            self.capacity *= 2
                        restart = True
                        break
                    # adapt the buffer down toward the actual record size
                    # (a too-large capacity wastes allocation bandwidth)
                    self.capacity = max(2 * max_len, 4096)
                    for i in range(len(x)):
                        out = {"x": x[i, : int(lens[i])].tobytes()}
                        if y[i] >= 0:
                            out["y"] = np.asarray([y[i]], np.int64)
                        yield out
                        yielded += 1
                if not restart:
                    return
            finally:
                reader.close()


class NativeWriter:
    """Bulk writer: n examples per C call, byte-identical to the Python
    ``TFRecordWriter.write_example({'x': ..., 'y': [...]})`` encoding
    (cross-checked in tests against both the Python writer and
    TensorFlow's reader)."""

    def __init__(self, path: str):
        self.lib = get_lib()
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.handle = self.lib.tfrec_writer_open(path.encode())
        if not self.handle:
            raise IOError(f"tfrec_writer_open failed for {path}")
        self.path = path

    def write_batch(self, x: np.ndarray, y: Optional[np.ndarray] = None):
        """x: [n, bytes_per_record] uint8 (each row one image's raw
        bytes); y: optional [n] int64 labels."""
        x = np.ascontiguousarray(x, np.uint8)
        assert x.ndim == 2, "x must be [n, bytes_per_record]"
        y_ptr = None
        if y is not None:
            y = np.ascontiguousarray(y, np.int64).ravel()
            assert len(y) == len(x)
            y_ptr = y.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        n = self.lib.tfrec_write_batch(
            self.handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            x.shape[1], x.shape[0], y_ptr)
        if n != len(x):
            raise IOError(f"native tfrecord write error in {self.path}")

    def close(self):
        if self.handle:
            rc = self.lib.tfrec_writer_close(self.handle)
            self.handle = None
            if rc != 0:
                raise IOError(f"close failed for {self.path}")

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def crc32c_native(data: bytes) -> int:
    lib = get_lib()
    arr = np.frombuffer(data, np.uint8)
    if len(arr) == 0:
        arr = np.zeros(1, np.uint8)[:0]
        return lib.tfrec_crc32c(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 0)
    return lib.tfrec_crc32c(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr))
