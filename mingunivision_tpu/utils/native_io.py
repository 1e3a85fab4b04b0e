"""ctypes bindings for the native IO runtime (native/mingio.cpp).

Auto-builds `libmingio.so` on first use (make -C native); every entry point has
a pure-python/numpy fallback, so the package works without a toolchain.

Surface:
  - SafetensorsFile: mmap'd shard with parallel tensor materialization and
    parallel (out,in)->(in,out) transpose — the fast path for loading 16B-class
    checkpoints into our pytree layout.
  - normalize_images_chw: multithreaded uint8 HWC -> normalized fp32 CHW.
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmingio.so")
_lock = threading.Lock()
_lib = None
_build_failed = False

_ST_DTYPES = {
    "F32": (np.float32, 4),
    "F16": (np.float16, 2),
    "BF16": (np.uint16, 2),  # view; converted by callers
    "I64": (np.int64, 8),
    "I32": (np.int32, 4),
    "I8": (np.int8, 1),
    "U8": (np.uint8, 1),
    "BOOL": (np.bool_, 1),
}


def load_native() -> Optional[ctypes.CDLL]:
    """Build (once) and load libmingio.so; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True, timeout=120
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        # A stale v1 build artifact (prebuilt .so predating the PrefetchQueue
        # API) would crash callers with AttributeError — rebuild it, or fall
        # back to the pure-Python paths if the rebuild doesn't help.
        if not hasattr(lib, "mingio_version") or lib.mingio_version() < 2:
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s", "-B"], check=True, capture_output=True, timeout=120
                )
                lib = ctypes.CDLL(_LIB_PATH)
            except Exception:
                lib = None
            if lib is None or not hasattr(lib, "mingio_version") or lib.mingio_version() < 2:
                _build_failed = True
                return None
        lib.st_open.restype = ctypes.c_void_p
        lib.st_open.argtypes = [ctypes.c_char_p]
        lib.st_size.restype = ctypes.c_uint64
        lib.st_size.argtypes = [ctypes.c_void_p]
        lib.st_close.argtypes = [ctypes.c_void_p]
        lib.st_read_blocks.restype = ctypes.c_int
        lib.st_read_blocks.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_int]
        lib.st_read_transpose2d.restype = ctypes.c_int
        lib.st_read_transpose2d.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_uint32,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.img_normalize_chw.restype = ctypes.c_int
        lib.img_normalize_chw.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


class SafetensorsFile:
    """mmap'd safetensors shard with native parallel reads."""

    def __init__(self, path: str, num_threads: int = 0):
        self.path = path
        self.num_threads = num_threads
        self._lib = load_native()
        with open(path, "rb") as f:
            (header_len,) = struct.unpack("<Q", f.read(8))
            self.header: Dict = json.loads(f.read(header_len))
        self._data_offset = 8 + header_len
        self.header.pop("__metadata__", None)
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.st_open(path.encode())

    def keys(self):
        return list(self.header.keys())

    def info(self, name: str) -> Tuple[np.dtype, Tuple[int, ...], int, int]:
        meta = self.header[name]
        dt, isz = _ST_DTYPES[meta["dtype"]]
        lo, hi = meta["data_offsets"]
        return np.dtype(dt), tuple(meta["shape"]), self._data_offset + lo, hi - lo

    def read(self, name: str) -> np.ndarray:
        """Materialize a tensor (parallel block copy via native lib)."""
        dt, shape, off, nbytes = self.info(name)
        out = np.empty(shape, dt)
        if self._handle:
            rc = self._lib.st_read_blocks(
                self._handle, off, nbytes, out.ctypes.data_as(ctypes.c_void_p), self.num_threads
            )
            if rc == 0:
                return self._maybe_bf16(name, out)
        with open(self.path, "rb") as f:  # fallback
            f.seek(off)
            out = np.frombuffer(f.read(nbytes), dt).reshape(shape).copy()
        return self._maybe_bf16(name, out)

    def read_transposed2d(self, name: str) -> np.ndarray:
        """(out, in) weight -> (in, out), transposed in parallel at read time."""
        dt, shape, off, nbytes = self.info(name)
        assert len(shape) == 2, f"{name} is not 2-D"
        rows, cols = shape
        out = np.empty((cols, rows), dt)
        if self._handle:
            rc = self._lib.st_read_transpose2d(
                self._handle, off, rows, cols, dt.itemsize, out.ctypes.data_as(ctypes.c_void_p), self.num_threads
            )
            if rc == 0:
                return self._maybe_bf16(name, out)
        return self._maybe_bf16(name, np.ascontiguousarray(self.read(name).T))

    def _maybe_bf16(self, name: str, arr: np.ndarray) -> np.ndarray:
        if self.header[name]["dtype"] == "BF16":
            import ml_dtypes

            return arr.view(ml_dtypes.bfloat16)
        return arr

    def close(self):
        if self._handle and self._lib:
            self._lib.st_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def normalize_images_chw(batch_hwc: np.ndarray, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), num_threads: int = 0) -> np.ndarray:
    """uint8 (B, H, W, 3) -> fp32 (B, 3, H, W), normalized; native when built."""
    batch_hwc = np.ascontiguousarray(batch_hwc, np.uint8)
    B, H, W, C = batch_hwc.shape
    assert C == 3
    lib = load_native()
    if lib is not None:
        out = np.empty((B, 3, H, W), np.float32)
        m = np.asarray(mean, np.float32)
        s = np.asarray(std, np.float32)
        rc = lib.img_normalize_chw(
            batch_hwc.ctypes.data_as(ctypes.c_void_p),
            B,
            H,
            W,
            m.ctypes.data_as(ctypes.c_void_p),
            s.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            num_threads,
        )
        if rc == 0:
            return out
    x = batch_hwc.astype(np.float32) / 255.0
    x = (x - np.asarray(mean)) / np.asarray(std)
    return np.transpose(x, (0, 3, 1, 2)).astype(np.float32)


class PrefetchQueue:
    """Background-threaded image normalize pipeline (native worker threads).

    `submit(batch_hwc)` copies the uint8 batch into the native queue and
    returns a ticket; workers convert to normalized fp32 CHW off the Python
    thread; `get()` pops a completed batch (ticket, array). Python-level
    fallback (no native lib): synchronous conversion.
    """

    def __init__(self, num_threads: int = 0, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
        self._lib = load_native()
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self._next_ticket = 0
        self._shapes = {}
        if self._lib is not None:
            self._lib.pq_create.restype = ctypes.c_void_p
            self._lib.pq_create.argtypes = [ctypes.c_int]
            self._lib.pq_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
                ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            self._lib.pq_pop.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_void_p, ctypes.c_uint64,
            ]
            self._lib.pq_destroy.argtypes = [ctypes.c_void_p]
            self._q = self._lib.pq_create(num_threads)
            self._fallback = None
        else:  # pure-python fallback
            self._q = None
            self._fallback = []

    def submit(self, batch_hwc: np.ndarray) -> int:
        batch_hwc = np.ascontiguousarray(batch_hwc, np.uint8)
        assert batch_hwc.ndim == 4 and batch_hwc.shape[-1] == 3, batch_hwc.shape
        t = self._next_ticket
        self._next_ticket += 1
        b, h, w, _ = batch_hwc.shape
        self._shapes[t] = (b, h, w)
        if self._q is None:
            out = ((batch_hwc.astype(np.float32) / 255.0 - self.mean) / self.std).transpose(0, 3, 1, 2)
            self._fallback.append((t, np.ascontiguousarray(out)))
            return t
        rc = self._lib.pq_submit(
            self._q, t, batch_hwc.ctypes.data_as(ctypes.c_void_p), b, h, w,
            self.mean.ctypes.data_as(ctypes.c_void_p), self.std.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError(f"pq_submit failed rc={rc}")
        return t

    def get(self, block: bool = True):
        """-> (ticket, (B, 3, H, W) fp32 array) or None when idle/empty."""
        if self._q is None:
            return self._fallback.pop(0) if self._fallback else None
        # capacity: largest outstanding shape
        if not self._shapes:
            return None
        cap = max(b * 3 * h * w for b, h, w in self._shapes.values())
        dest = np.empty((cap,), np.float32)
        t = ctypes.c_uint64()
        b = ctypes.c_uint64()
        h = ctypes.c_uint64()
        w = ctypes.c_uint64()
        rc = self._lib.pq_pop(
            self._q, 1 if block else 0, ctypes.byref(t), ctypes.byref(b), ctypes.byref(h),
            ctypes.byref(w), dest.ctypes.data_as(ctypes.c_void_p), cap,
        )
        if rc <= 0:
            return None
        ticket = int(t.value)
        self._shapes.pop(ticket, None)
        shape = (int(b.value), 3, int(h.value), int(w.value))
        n = shape[0] * 3 * shape[2] * shape[3]
        return ticket, dest[:n].reshape(shape).copy()

    def close(self):
        if self._q is not None and self._lib is not None:
            self._lib.pq_destroy(self._q)
            self._q = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
