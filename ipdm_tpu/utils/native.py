"""ctypes bindings for libipdm_native.so (native/ directory).

Native runtime components (see native/ipdm_native.h): fast .npy IO, the
multi-threaded prefetching batch loader, and the CPU reference fan-beam
projector/SART pair used to cross-validate the JAX physics. Gracefully
degrades: `available()` is False when the library hasn't been built
(`make -C native`), and the callers fall back to the numpy paths.
"""

from __future__ import annotations

import ctypes as ct
import os
import os.path as osp
from typing import Sequence

import numpy as np

_LIB_PATH = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native", "libipdm_native.so")
_lib = None


class FanGeomC(ct.Structure):
    _fields_ = [("dso", ct.c_double), ("dsd", ct.c_double),
                ("nx", ct.c_int), ("ny", ct.c_int),
                ("dx", ct.c_double), ("dy", ct.c_double),
                ("offset_x", ct.c_double), ("offset_y", ct.c_double),
                ("nr", ct.c_int), ("dr", ct.c_double),
                ("offset_r", ct.c_double), ("na", ct.c_int),
                ("ta_dimx", ct.c_int), ("ta_dimy", ct.c_int)]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH):
        raise OSError(f"native library not built: {_LIB_PATH} "
                      f"(run `make -C native`)")
    lib = ct.CDLL(_LIB_PATH)
    f32p = ct.POINTER(ct.c_float)
    i64p = ct.POINTER(ct.c_int64)
    lib.npy_probe.argtypes = [ct.c_char_p, ct.c_char_p,
                              ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
                              i64p, ct.POINTER(ct.c_int), i64p]
    lib.npy_read_f32.argtypes = [ct.c_char_p, f32p, ct.c_int64]
    lib.loader_create.restype = ct.c_void_p
    lib.loader_create.argtypes = [ct.POINTER(ct.c_char_p), ct.c_int,
                                  ct.c_int64, ct.c_int64, i64p, ct.c_int64,
                                  ct.c_int, ct.c_int, ct.c_int]
    lib.loader_next.argtypes = [ct.c_void_p, f32p]
    lib.loader_destroy.argtypes = [ct.c_void_p]
    gp = ct.POINTER(FanGeomC)
    lib.make_area_lut.argtypes = [gp, f32p]
    lib.fp_project.argtypes = [gp, f32p, f32p, f32p, f32p, ct.c_int]
    lib.bp_project.argtypes = [gp, f32p, f32p, f32p, f32p, ct.c_int]
    lib.sart_reconstruct.argtypes = [gp, f32p, f32p, f32p, f32p, ct.c_int,
                                     ct.c_int, ct.c_int, ct.c_int]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def _f32(a: np.ndarray):
    return np.ascontiguousarray(a, np.float32)


def _geom_c(geom) -> FanGeomC:
    """FanBeamGeometry (ipdm_tpu.recon.geometry) → C struct."""
    return FanGeomC(dso=geom.dso, dsd=geom.dsd, nx=geom.nx, ny=geom.ny,
                    dx=geom.dx, dy=geom.dy, offset_x=geom.offset_x,
                    offset_y=geom.offset_y, nr=geom.nr, dr=geom.dr,
                    offset_r=geom.offset_r, na=geom.na,
                    ta_dimx=geom.ta_dimx, ta_dimy=geom.ta_dimy)


def npy_read(path: str, shape) -> np.ndarray:
    lib = _load()
    n = int(np.prod(shape))
    out = np.empty(n, np.float32)
    rc = lib.npy_read_f32(path.encode(), out.ctypes.data_as(
        ct.POINTER(ct.c_float)), n)
    if rc != 0:
        raise IOError(f"npy_read_f32({path}) failed: {rc}")
    return out.reshape(shape)


def area_lut_native(geom) -> np.ndarray:
    lib = _load()
    g = _geom_c(geom)
    out = np.empty((geom.ta_dimy, geom.ta_dimx), np.float32)
    lib.make_area_lut(ct.byref(g), out.ctypes.data_as(ct.POINTER(ct.c_float)))
    return out


def fp_project_native(x: np.ndarray, geom, lut: np.ndarray,
                      betas_deg: np.ndarray, n_threads: int = 0) -> np.ndarray:
    lib = _load()
    g = _geom_c(geom)
    x = _f32(x)
    lut = _f32(lut)
    betas = _f32(betas_deg)
    out = np.empty((geom.na, geom.nr), np.float32)
    n_threads = n_threads or (os.cpu_count() or 1)
    p = ct.POINTER(ct.c_float)
    lib.fp_project(ct.byref(g), lut.ctypes.data_as(p),
                   betas.ctypes.data_as(p), x.ctypes.data_as(p),
                   out.ctypes.data_as(p), n_threads)
    return out


def bp_project_native(proj: np.ndarray, geom, lut: np.ndarray,
                      betas_deg: np.ndarray, n_threads: int = 0) -> np.ndarray:
    lib = _load()
    g = _geom_c(geom)
    proj = _f32(proj)
    lut = _f32(lut)
    betas = _f32(betas_deg)
    out = np.empty((geom.ny, geom.nx), np.float32)
    n_threads = n_threads or (os.cpu_count() or 1)
    p = ct.POINTER(ct.c_float)
    lib.bp_project(ct.byref(g), lut.ctypes.data_as(p),
                   betas.ctypes.data_as(p), proj.ctypes.data_as(p),
                   out.ctypes.data_as(p), n_threads)
    return out


def sart_reconstruct_native(proj: np.ndarray, geom, lut: np.ndarray,
                            betas_deg: np.ndarray, nstart: int = 10,
                            ntv: int = 0, nsubsets: int = 40,
                            n_threads: int = 0) -> np.ndarray:
    lib = _load()
    g = _geom_c(geom)
    proj = _f32(proj)
    lut = _f32(lut)
    betas = _f32(betas_deg)
    out = np.empty((geom.ny, geom.nx), np.float32)
    n_threads = n_threads or (os.cpu_count() or 1)
    p = ct.POINTER(ct.c_float)
    lib.sart_reconstruct(ct.byref(g), lut.ctypes.data_as(p),
                         betas.ctypes.data_as(p), proj.ctypes.data_as(p),
                         out.ctypes.data_as(p), nstart, ntv, nsubsets,
                         n_threads)
    return out


class NativeLoader:
    """Prefetching batch loader over per-slice .npy files."""

    def __init__(self, paths: Sequence[str], H: int, W: int,
                 indices: Sequence[int], batch: int, n_threads: int = 2,
                 queue_depth: int = 4):
        lib = _load()
        self._lib = lib
        self.batch, self.H, self.W = batch, H, W
        arr = (ct.c_char_p * len(paths))(*[p.encode() for p in paths])
        idx = np.asarray(indices, np.int64)
        self._handle = lib.loader_create(
            arr, len(paths), H, W,
            idx.ctypes.data_as(ct.POINTER(ct.c_int64)), len(idx), batch,
            n_threads, queue_depth)
        self._buf = np.empty((batch, H, W), np.float32)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        n = self._lib.loader_next(self._handle, self._buf.ctypes.data_as(
            ct.POINTER(ct.c_float)))
        if n == 0:
            raise StopIteration
        return self._buf[:n].copy()

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
