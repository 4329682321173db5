"""Minimal HDF5 read/write via ctypes on the system libhdf5.

Exists for ONE interop seam: the reference stores mel features with
lhotse's ``NumpyHdf5Writer`` (``/root/reference/prepare_ds.py:211-217``)
— one float32 dataset per cut, keyed by the cut's ``storage_key`` — and
users migrating a reference-prepared dataset need those read without
h5py (absent from this image).  The system ``libhdf5_serial`` is binary
-compatible with what h5py writes, so a ~100-line ctypes binding gives
exact-format reads; the writer half exists so the converter's tests can
create real HDF5 fixtures in CI.

h5py, when importable, is preferred automatically (contextual edge cases
like virtual datasets are its problem, not ours).
"""
from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional, Sequence

import numpy as np

try:  # prefer h5py when present
    import h5py  # type: ignore

    _HAS_H5PY = True
except Exception:  # pragma: no cover - image has no h5py
    _HAS_H5PY = False

_HID = ctypes.c_int64  # hid_t (64-bit since HDF5 1.10)
_HSIZE = ctypes.c_uint64
_H5F_ACC_RDONLY = 0x0
_H5F_ACC_TRUNC = 0x2
_H5P_DEFAULT = _HID(0)
_H5S_ALL = _HID(0)

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    names = []
    for short in ("hdf5_serial", "hdf5"):
        found = ctypes.util.find_library(short)
        if found:
            names.append(found)
    names += ["libhdf5_serial.so.103", "libhdf5_serial.so.100",
              "libhdf5_serial.so", "libhdf5.so"]
    last_err: Optional[Exception] = None
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError as e:  # pragma: no cover - depends on image
            last_err = e
    else:  # pragma: no cover
        raise RuntimeError(
            f"no libhdf5 found (tried {names}); install h5py or libhdf5"
        ) from last_err

    lib.H5open.restype = ctypes.c_int
    lib.H5open()
    for fn, res, args in (
        ("H5Fopen", _HID, (ctypes.c_char_p, ctypes.c_uint, _HID)),
        ("H5Fcreate", _HID, (ctypes.c_char_p, ctypes.c_uint, _HID, _HID)),
        ("H5Fclose", ctypes.c_int, (_HID,)),
        ("H5Dopen2", _HID, (_HID, ctypes.c_char_p, _HID)),
        ("H5Dclose", ctypes.c_int, (_HID,)),
        ("H5Dget_space", _HID, (_HID,)),
        ("H5Sclose", ctypes.c_int, (_HID,)),
        ("H5Sget_simple_extent_ndims", ctypes.c_int, (_HID,)),
        ("H5Sget_simple_extent_dims", ctypes.c_int,
         (_HID, ctypes.POINTER(_HSIZE), ctypes.POINTER(_HSIZE))),
        ("H5Dread", ctypes.c_int,
         (_HID, _HID, _HID, _HID, _HID, ctypes.c_void_p)),
        ("H5Dwrite", ctypes.c_int,
         (_HID, _HID, _HID, _HID, _HID, ctypes.c_void_p)),
        ("H5Screate_simple", _HID,
         (ctypes.c_int, ctypes.POINTER(_HSIZE), ctypes.POINTER(_HSIZE))),
        ("H5Dcreate2", _HID,
         (_HID, ctypes.c_char_p, _HID, _HID, _HID, _HID, _HID)),
        ("H5Lexists", ctypes.c_int, (_HID, ctypes.c_char_p, _HID)),
    ):
        f = getattr(lib, fn)
        f.restype = res
        f.argtypes = list(args)
    _lib = lib
    return lib


def _native_float(lib) -> _HID:
    return _HID.in_dll(lib, "H5T_NATIVE_FLOAT_g")


def _f32le(lib) -> _HID:
    return _HID.in_dll(lib, "H5T_IEEE_F32LE_g")


class Hdf5Reader:
    """Read float datasets by key (lhotse storage_key) as float32 arrays.
    HDF5 converts the stored type to the requested memory type, so f64/f16
    -stored datasets read fine too."""

    def __init__(self, path: str):
        self.path = path
        if _HAS_H5PY:
            self._h5 = h5py.File(path, "r")
            return
        self._lib = _load_lib()
        self._fid = self._lib.H5Fopen(
            path.encode(), _H5F_ACC_RDONLY, _H5P_DEFAULT)
        if self._fid < 0:
            raise OSError(f"H5Fopen failed for {path}")

    def __contains__(self, key: str) -> bool:
        if _HAS_H5PY:
            return key in self._h5
        return self._lib.H5Lexists(self._fid, key.encode(), _H5P_DEFAULT) > 0

    def read(self, key: str) -> np.ndarray:
        if _HAS_H5PY:
            return np.asarray(self._h5[key], np.float32)
        lib = self._lib
        did = lib.H5Dopen2(self._fid, key.encode(), _H5P_DEFAULT)
        if did < 0:
            raise KeyError(f"{key!r} not in {self.path}")
        try:
            sid = lib.H5Dget_space(did)
            try:
                nd = lib.H5Sget_simple_extent_ndims(sid)
                dims = (_HSIZE * max(nd, 1))()
                lib.H5Sget_simple_extent_dims(sid, dims, None)
                shape = tuple(int(dims[i]) for i in range(nd))
            finally:
                lib.H5Sclose(sid)
            out = np.empty(shape, np.float32)
            rc = lib.H5Dread(
                did, _native_float(lib), _H5S_ALL, _H5S_ALL, _H5P_DEFAULT,
                out.ctypes.data_as(ctypes.c_void_p))
            if rc < 0:
                raise OSError(f"H5Dread failed for {key!r} in {self.path}")
            return out
        finally:
            lib.H5Dclose(did)

    def close(self) -> None:
        if _HAS_H5PY:
            self._h5.close()
        elif self._fid >= 0:
            self._lib.H5Fclose(self._fid)
            self._fid = -1

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class Hdf5Writer:
    """Create float32 datasets by key — the exact layout lhotse's
    NumpyHdf5Writer produces (root-group datasets, IEEE f32le).  Used by
    the converter tests to build real fixtures without h5py."""

    def __init__(self, path: str):
        self.path = path
        if _HAS_H5PY:
            self._h5 = h5py.File(path, "w")
            return
        self._lib = _load_lib()
        self._fid = self._lib.H5Fcreate(
            path.encode(), _H5F_ACC_TRUNC, _H5P_DEFAULT, _H5P_DEFAULT)
        if self._fid < 0:
            raise OSError(f"H5Fcreate failed for {path}")

    def add(self, key: str, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr, np.float32)
        if _HAS_H5PY:
            self._h5.create_dataset(key, data=arr)
            return
        lib = self._lib
        dims = (_HSIZE * arr.ndim)(*arr.shape)
        sid = lib.H5Screate_simple(arr.ndim, dims, None)
        did = lib.H5Dcreate2(
            self._fid, key.encode(), _f32le(lib), sid,
            _H5P_DEFAULT, _H5P_DEFAULT, _H5P_DEFAULT)
        try:
            if did < 0:
                raise OSError(f"H5Dcreate2 failed for {key!r}")
            rc = lib.H5Dwrite(
                did, _native_float(lib), _H5S_ALL, _H5S_ALL, _H5P_DEFAULT,
                arr.ctypes.data_as(ctypes.c_void_p))
            if rc < 0:
                raise OSError(f"H5Dwrite failed for {key!r}")
        finally:
            if did >= 0:
                lib.H5Dclose(did)
            lib.H5Sclose(sid)

    def close(self) -> None:
        if _HAS_H5PY:
            self._h5.close()
        elif self._fid >= 0:
            self._lib.H5Fclose(self._fid)
            self._fid = -1

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
