"""Python binding for the native out-of-core window loader.

``native/window_loader.cc`` memory-maps a float32 (T, p) series file and
assembles shuffled window minibatches in C++ — the host-side data-runtime
path for series too long to live in HBM.  Bound via ctypes (no pybind11 in
this image); builds on demand with g++ if the shared library is missing.

For in-memory series the pure-JAX path (``data.windows``) is the right tool;
this loader exists for the out-of-core regime and as the native IO layer a
production deployment feeds from.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _LIB_DIR / "libwindow_loader.so"
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    src = _LIB_DIR / "window_loader.cc"
    if not src.exists():
        raise FileNotFoundError(f"native source missing: {src}")
    subprocess.run(
        ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o",
         str(_LIB_PATH), str(src)],
        check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = _LIB_DIR / "window_loader.cc"
    # Rebuild when missing OR stale: a .so from an older source revision can
    # have a different ABI (wl_num_windows gained a flag) and would load
    # silently with wrong behavior.
    if not _LIB_PATH.exists() or (src.exists() and
                                  src.stat().st_mtime > _LIB_PATH.stat().st_mtime):
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.wl_open.restype = ctypes.c_void_p
    lib.wl_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
    lib.wl_open_inline.restype = ctypes.c_void_p
    lib.wl_open_inline.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.wl_num_windows.restype = ctypes.c_int64
    lib.wl_num_windows.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.wl_fill_batch.restype = ctypes.c_int
    lib.wl_fill_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    lib.wl_fill_shifted_batch.restype = ctypes.c_int
    lib.wl_fill_shifted_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_int64,
                                          ctypes.c_void_p, ctypes.c_void_p]
    lib.wl_standardize.restype = ctypes.c_int
    lib.wl_standardize.argtypes = [ctypes.c_void_p]
    lib.wl_close.restype = None
    lib.wl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeWindowLoader:
    """Sliding-window batches from a file-backed (or in-memory) series.

    Usage:
        with NativeWindowLoader.from_file("series.f32", t, p) as loader:
            batch = loader.sample_batch(rng, batch_size=256, context=20)
    """

    def __init__(self, handle: int, t: int, p: int,
                 keepalive: Optional[np.ndarray] = None):
        self._lib = _load()
        self._h = handle
        self.t = t
        self.p = p
        self._keepalive = keepalive   # pins the inline buffer

    # ---------------- constructors ----------------

    @classmethod
    def from_file(cls, path: str, t: int, p: int) -> "NativeWindowLoader":
        """Memory-map a raw float32 (t, p) row-major file (zero-copy)."""
        h = _load().wl_open(str(path).encode(), t, p)
        if not h:
            raise OSError(f"wl_open failed for {path} (t={t}, p={p})")
        return cls(h, t, p)

    @classmethod
    def from_array(cls, series: np.ndarray) -> "NativeWindowLoader":
        """Wrap an in-memory float32 (t, p) array without copying."""
        arr = np.ascontiguousarray(series, dtype=np.float32)
        h = _load().wl_open_inline(arr.ctypes.data, arr.shape[0], arr.shape[1])
        if not h:
            raise ValueError("wl_open_inline failed")
        return cls(h, arr.shape[0], arr.shape[1], keepalive=arr)

    # ---------------- API ----------------

    def num_windows(self, context: int, shifted: bool = False) -> int:
        """T - context + 1 plain windows (``sliding_windows``), or
        T - context shifted input/target pairs (``arrange_input``)."""
        return int(self._lib.wl_num_windows(self._h, context, int(shifted)))

    def standardize(self) -> None:
        """Per-variable (x - mean) / std over time: one streaming Welford
        pass stores O(p) stats that the fill paths apply on the fly."""
        rc = self._lib.wl_standardize(self._h)
        if rc != 0:
            raise RuntimeError(f"wl_standardize failed ({rc})")

    def gather(self, idx: np.ndarray, context: int) -> np.ndarray:
        """Windows at explicit start indices.  Returns (n, context, p)."""
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        out = np.empty((len(idx), context, self.p), np.float32)
        rc = self._lib.wl_fill_batch(self._h, idx.ctypes.data, len(idx),
                                     context, out.ctypes.data)
        if rc != 0:
            raise IndexError(f"wl_fill_batch failed ({rc}); valid starts are "
                             f"[0, {self.num_windows(context)})")
        return out

    def gather_shifted(self, idx: np.ndarray,
                       context: int) -> Tuple[np.ndarray, np.ndarray]:
        """(inputs, one-step-shifted targets) — the arrange_input contract."""
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        inputs = np.empty((len(idx), context, self.p), np.float32)
        targets = np.empty_like(inputs)
        rc = self._lib.wl_fill_shifted_batch(
            self._h, idx.ctypes.data, len(idx), context,
            inputs.ctypes.data, targets.ctypes.data)
        if rc != 0:
            raise IndexError(f"wl_fill_shifted_batch failed ({rc})")
        return inputs, targets

    def sample_batch(self, rng: np.random.Generator, batch_size: int,
                     context: int) -> np.ndarray:
        """Uniform with-replacement minibatch over all T - context + 1 plain
        windows (host-side analogue of ``data.windows.sample_batch``)."""
        idx = rng.integers(0, self.num_windows(context), batch_size,
                           dtype=np.int64)
        return self.gather(idx, context)

    def close(self) -> None:
        if self._h:
            self._lib.wl_close(self._h)
            self._h = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
