"""ctypes bindings for the native host runtime (``native/mmmm_native.cpp``).

Auto-builds the shared library on first use (g++ + libzstd are part of the
image). All entry points degrade gracefully: ``is_available()`` gates usage so
pure-Python fallbacks keep working where the toolchain is absent.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libmmmm_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    _src = _NATIVE_DIR / "mmmm_native.cpp"
    if not _LIB_PATH.exists() or (
        _src.exists() and _src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    ):
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mmmm_zstd_decompress.restype = ctypes.c_longlong
    lib.mmmm_zstd_decompress.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t]
    lib.mmmm_zstd_compress.restype = ctypes.c_longlong
    lib.mmmm_zstd_compress.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
    lib.mmmm_resize_trilinear_u8f32.restype = None
    lib.mmmm_resize_trilinear_u8f32.argtypes = [ctypes.c_void_p] + [ctypes.c_int64] * 4 + [ctypes.c_void_p] + [ctypes.c_int64] * 3
    lib.mmmm_prefetcher_create.restype = ctypes.c_void_p
    lib.mmmm_prefetcher_create.argtypes = [ctypes.c_int]
    lib.mmmm_prefetcher_submit.restype = ctypes.c_int64
    lib.mmmm_prefetcher_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mmmm_prefetcher_wait.restype = ctypes.c_longlong
    lib.mmmm_prefetcher_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_size_t]
    lib.mmmm_prefetcher_destroy.restype = None
    lib.mmmm_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def zstd_decompress(data: bytes) -> bytes:
    lib = _load()
    n = lib.mmmm_zstd_decompress(data, len(data), None, 0)
    if n < 0:
        raise ValueError("invalid zstd frame")
    out = ctypes.create_string_buffer(n)
    got = lib.mmmm_zstd_decompress(data, len(data), out, n)
    if got != n:
        raise ValueError("zstd decompression failed")
    return out.raw


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    lib = _load()
    cap = lib.mmmm_zstd_compress(data, len(data), None, 0, level)
    out = ctypes.create_string_buffer(cap)
    n = lib.mmmm_zstd_compress(data, len(data), out, cap, level)
    if n < 0:
        raise ValueError("zstd compression failed")
    return out.raw[:n]


def resize_trilinear_u8(volume: np.ndarray, shape: tuple[int, int, int]) -> np.ndarray:
    """(C, D, H, W) uint8 -> (C, d, h, w) float32 in [0, 1], half-pixel linear."""
    lib = _load()
    volume = np.ascontiguousarray(volume, np.uint8)
    c, d0, h0, w0 = volume.shape
    d, h, w = shape
    out = np.empty((c, d, h, w), np.float32)
    lib.mmmm_resize_trilinear_u8f32(
        volume.ctypes.data, c, d0, h0, w0, out.ctypes.data, d, h, w
    )
    return out


class NativePrefetcher:
    """Background file reader+decompressor; returns raw bytes per path."""

    def __init__(self, n_threads: int = 2):
        self.lib = _load()
        self.handle = self.lib.mmmm_prefetcher_create(n_threads)

    def submit(self, path: str | Path) -> int:
        return self.lib.mmmm_prefetcher_submit(self.handle, str(path).encode())

    def wait(self, job_id: int) -> bytes:
        n = self.lib.mmmm_prefetcher_wait(self.handle, job_id, None, 0)
        if n < 0:
            raise IOError(f"prefetch job {job_id} failed")
        out = ctypes.create_string_buffer(n)
        self.lib.mmmm_prefetcher_wait(self.handle, job_id, out, n)
        return out.raw

    def close(self):
        if self.handle:
            self.lib.mmmm_prefetcher_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
