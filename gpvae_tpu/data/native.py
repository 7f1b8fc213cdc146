"""ctypes binding for the C++ data-pipeline runtime (native/data_pipeline.cc).

Loads ``libgpvae_native.so`` (building it on first use when a compiler is
available) and exposes the fused binarize, batch-gather, ragged-pack, and
prefetching-assembler entry points.  Every function has a numpy fallback so
the framework works without the native build; ``HAVE_NATIVE`` says which
path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libgpvae_native.so")

_lib = None
_lock = threading.Lock()


def _try_build() -> bool:
    script = os.path.join(_NATIVE_DIR, "build.sh")
    if not os.path.exists(script):
        return False
    try:
        subprocess.run(
            ["sh", script], check=True, capture_output=True, timeout=300
        )
        return os.path.exists(_SO_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _try_build():
            _lib = False
            return _lib
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib = False
            return _lib
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        lib.gpvae_binarize_u8.argtypes = [
            c_u8p, c_f32p, ctypes.c_int64, ctypes.c_float
        ]
        lib.gpvae_binarize_f32.argtypes = [
            c_f32p, c_f32p, ctypes.c_int64, ctypes.c_float
        ]
        lib.gpvae_gather_batch.argtypes = [
            c_f32p, c_i64p, c_f32p, ctypes.c_int64, ctypes.c_int64
        ]
        lib.gpvae_pack_ragged.argtypes = [
            c_f32p, c_f32p, c_u8p, c_i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.gpvae_prefetcher_create.argtypes = [
            c_f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ]
        lib.gpvae_prefetcher_create.restype = ctypes.c_void_p
        lib.gpvae_prefetcher_next.argtypes = [ctypes.c_void_p, c_f32p]
        lib.gpvae_prefetcher_next.restype = ctypes.c_int
        lib.gpvae_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def have_native() -> bool:
    return bool(_load())


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def binarize(frames: np.ndarray, threshold: float = 0.498) -> np.ndarray:
    """uint8 or float frames -> float32 {0,1} (fused normalize+threshold;
    reference src/Models/DataHandler.py:68-78)."""
    lib = _load()
    flat = np.ascontiguousarray(frames)
    out = np.empty(flat.shape, np.float32)
    if lib and flat.dtype == np.uint8:
        lib.gpvae_binarize_u8(
            _ptr(flat, ctypes.c_uint8), _ptr(out, ctypes.c_float),
            flat.size, threshold,
        )
        return out
    if lib and flat.dtype == np.float32:
        lib.gpvae_binarize_f32(
            _ptr(flat, ctypes.c_float), _ptr(out, ctypes.c_float),
            flat.size, threshold,
        )
        return out
    # numpy fallback
    as_float = (
        flat.astype(np.float32) / 255.0 if flat.dtype == np.uint8
        else flat.astype(np.float32)
    )
    return (as_float >= threshold).astype(np.float32)


def gather_batch(data: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[b] = data[idx[b]] (batch assembly gather)."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if not lib:
        return data[idx].copy()
    item_size = int(np.prod(data.shape[1:]))
    out = np.empty((len(idx),) + data.shape[1:], np.float32)
    lib.gpvae_gather_batch(
        _ptr(data, ctypes.c_float), _ptr(idx, ctypes.c_int64),
        _ptr(out, ctypes.c_float), len(idx), item_size,
    )
    return out


def pack_ragged(x_sentinel: np.ndarray):
    """Sentinel(-1) array [N, T, D] -> (x_clean, mask, lengths)
    (the reference SyntheticDataHandler ragged pipeline, :129-156)."""
    lib = _load()
    x = np.ascontiguousarray(x_sentinel, dtype=np.float32)
    n, t, d = x.shape
    if not lib:
        mask = x[..., 0] > -1.0
        x_clean = np.where(mask[..., None], x, 0.0).astype(np.float32)
        return x_clean, mask, mask.sum(-1).astype(np.int32)
    x_clean = np.empty_like(x)
    mask_u8 = np.empty((n, t), np.uint8)
    lengths = np.empty((n,), np.int32)
    lib.gpvae_pack_ragged(
        _ptr(x, ctypes.c_float), _ptr(x_clean, ctypes.c_float),
        _ptr(mask_u8, ctypes.c_uint8), _ptr(lengths, ctypes.c_int32),
        n, t, d,
    )
    return x_clean, mask_u8.astype(bool), lengths


class NativePrefetcher:
    """Background-thread batch assembler over a float32 array [N, ...]:
    shuffle-on-wrap + gather run ahead of the training loop (the overlap the
    reference's synchronous feed_dict loop lacks, SURVEY.md §3.1)."""

    def __init__(self, data: np.ndarray, batch_size: int, *, seed: int = 0,
                 shuffle: bool = True, depth: int = 2):
        lib = _load()
        if not lib:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        # keep a reference: the C++ side borrows this buffer
        self._data = np.ascontiguousarray(data, dtype=np.float32)
        if not (0 < batch_size <= self._data.shape[0]):
            raise ValueError(
                f"batch_size={batch_size} must be in "
                f"[1, {self._data.shape[0]}] (dataset size)"
            )
        self.batch_size = batch_size
        self._item_shape = self._data.shape[1:]
        self._handle = lib.gpvae_prefetcher_create(
            _ptr(self._data, ctypes.c_float), self._data.shape[0],
            int(np.prod(self._item_shape)), batch_size, seed,
            int(shuffle), depth,
        )
        if not self._handle:
            raise RuntimeError("gpvae_prefetcher_create rejected arguments")

    def __next__(self) -> np.ndarray:
        if not self._handle:
            raise StopIteration
        out = np.empty((self.batch_size,) + self._item_shape, np.float32)
        ok = self._lib.gpvae_prefetcher_next(
            self._handle, _ptr(out, ctypes.c_float)
        )
        if not ok:  # prefetcher stopped (closed concurrently)
            raise StopIteration
        return out

    def __iter__(self):
        return self

    def close(self):
        if self._handle:
            self._lib.gpvae_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
