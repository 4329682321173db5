"""ctypes bindings for the native C++ data loader (native/dataloader.cpp).

Drop-in accelerations for the hot host paths of the data pipeline:
* ``NativeFeatureReader`` — mmap'd shard reads with threaded padded-batch
  gather (replaces per-item numpy slicing + python-loop padding)
* ``concat_slices`` — same-speaker timbre-mel assembly in one native call

Falls back transparently to the numpy implementation when the shared
library is missing and can rebuild it on demand with ``make`` (gated by
``MEGATTS2_TPU_BUILD_NATIVE=1``).
"""
from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmegatts2_dataloader.so"))

_lib: Optional[ctypes.CDLL] = None


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(build_if_missing: Optional[bool] = None) -> Optional[ctypes.CDLL]:
    """Load (and optionally build) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if build_if_missing is None:
        build_if_missing = os.environ.get("MEGATTS2_TPU_BUILD_NATIVE", "1") == "1"
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mtl_open_shard.restype = ctypes.c_void_p
    lib.mtl_open_shard.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.mtl_close_shard.argtypes = [ctypes.c_void_p]
    lib.mtl_fill_batch.restype = ctypes.c_int32
    lib.mtl_fill_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.mtl_concat_slices.restype = ctypes.c_int32
    lib.mtl_concat_slices.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.mtl_version.restype = ctypes.c_int32
    lib.mtl_ring_create.restype = ctypes.c_void_p
    lib.mtl_ring_create.argtypes = [ctypes.c_int32, ctypes.c_int64]
    lib.mtl_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.mtl_ring_submit.restype = ctypes.c_int32
    lib.mtl_ring_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.mtl_ring_wait.restype = ctypes.POINTER(ctypes.c_float)
    lib.mtl_ring_wait.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.mtl_ring_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    _lib = lib
    return lib


class NativeFeatureReader:
    """Shard reader backed by the C++ mmap/thread-pool loader; API-compatible
    superset of ``features.FeatureReader``."""

    def __init__(self):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError(
                "native dataloader unavailable (build with `make -C native`)"
            )
        self._handles: Dict[str, int] = {}
        self._meta: Dict[str, dict] = {}

    def _get(self, path: str) -> int:
        if path not in self._handles:
            with open(path + ".json") as f:
                meta = json.load(f)
            dtype = 1 if meta["dtype"] == "float16" else 0
            h = self._lib.mtl_open_shard(
                path.encode(), meta["frames"], meta["dim"], dtype
            )
            if not h:
                raise OSError(f"mtl_open_shard failed for {path}")
            self._handles[path] = h
            self._meta[path] = meta
        return self._handles[path]

    def read(self, path: str, offset: int, num_frames: int) -> np.ndarray:
        return self.read_batch(path, [offset], [num_frames], num_frames)[0]

    def read_batch(
        self,
        path: str,
        offsets: Sequence[int],
        lens: Sequence[int],
        pad_to: int,
    ) -> np.ndarray:
        """Padded batch gather: (N, pad_to, dim) float32, zero-padded."""
        h = self._get(path)
        dim = self._meta[path]["dim"]
        n = len(offsets)
        out = np.empty((n, pad_to, dim), np.float32)
        rc = self._lib.mtl_fill_batch(
            h,
            np.ascontiguousarray(offsets, np.int64),
            np.ascontiguousarray(lens, np.int32),
            n, pad_to, out,
        )
        if rc != 0:
            raise ValueError(f"mtl_fill_batch error {rc}")
        return out

    def concat_slices(
        self,
        path: str,
        offsets: Sequence[int],
        lens: Sequence[int],
        cap: int,
    ) -> np.ndarray:
        """Concatenate slices (timbre-mel assembly), truncated to cap frames."""
        h = self._get(path)
        dim = self._meta[path]["dim"]
        out = np.empty((cap, dim), np.float32)
        written = self._lib.mtl_concat_slices(
            h,
            np.ascontiguousarray(offsets, np.int64),
            np.ascontiguousarray(lens, np.int32),
            len(offsets), cap, out,
        )
        if written < 0:
            raise ValueError(f"mtl_concat_slices error {written}")
        return out[:written]

    # ---- async prefetch ring ------------------------------------------
    def ring_create(self, slots: int, max_floats: int) -> "BatchRing":
        """A bounded ring of native batch buffers: ``submit`` starts a
        padded-batch gather on the C++ worker pool and returns immediately;
        the caller overlaps other host work (timbre assembly, collation)
        and ``wait``s only when it needs the array."""
        return BatchRing(self, slots, max_floats)

    def close(self):
        for h in self._handles.values():
            self._lib.mtl_close_shard(h)
        self._handles.clear()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class BatchRing:
    """ctypes handle for the native async prefetch ring (dataloader.cpp
    ``mtl_ring_*``).  Typical use inside a batch builder::

        t = ring.submit(path, offsets, lens, pad_to)   # async fill starts
        ...assemble the rest of the batch on the host...
        mel = ring.wait(t, n, pad_to)                  # blocks only if slow
        ring.release(t)
    """

    def __init__(self, reader: NativeFeatureReader, slots: int, max_floats: int):
        self._reader = reader
        self._lib = reader._lib
        self._h = self._lib.mtl_ring_create(slots, max_floats)
        if not self._h:
            raise RuntimeError("mtl_ring_create failed")
        self.max_floats = max_floats

    def submit(self, path: str, offsets: Sequence[int], lens: Sequence[int],
               pad_to: int) -> int:
        shard = self._reader._get(path)
        self._dim = self._reader._meta[path]["dim"]
        t = self._lib.mtl_ring_submit(
            self._h, shard,
            np.ascontiguousarray(offsets, np.int64),
            np.ascontiguousarray(lens, np.int32),
            len(offsets), pad_to,
        )
        if t == -2:
            raise ValueError("mtl_ring_submit: bad slice or buffer too small")
        return t  # -1 = all slots busy (caller falls back or waits)

    def wait(self, ticket: int, n: int, pad_to: int) -> np.ndarray:
        """→ (n, pad_to, dim) float32 COPY of the slot buffer (the slot can
        be released immediately after)."""
        ptr = self._lib.mtl_ring_wait(self._h, ticket)
        if not ptr:
            raise ValueError(f"mtl_ring_wait: bad ticket {ticket}")
        flat = np.ctypeslib.as_array(ptr, shape=(n * pad_to * self._dim,))
        return flat.reshape(n, pad_to, self._dim).copy()

    def release(self, ticket: int) -> None:
        self._lib.mtl_ring_release(self._h, ticket)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.mtl_ring_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
