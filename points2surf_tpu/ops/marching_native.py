"""ctypes loader/builder for the native marching-tetrahedra kernel.

Builds native/marching.cpp with g++ -O3 -fopenmp on first use (cached next
to the source); the python fallback in ops/marching_cubes.py is used when
no compiler is available. Outputs are interchangeable with the numpy
implementation (same decomposition and case table); the C++ kernel also
orients faces outward itself (per-face centroid gradient, the same rule
as the numpy path) — callers need no separate orientation pass.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None


def _build_and_load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.normpath(
            os.path.join(here, "..", "..", "native", "marching.cpp")
        )
        out_dir = os.path.join(os.path.dirname(src), "build")
        os.makedirs(out_dir, exist_ok=True)
        so_path = os.path.join(out_dir, "libmarching.so")
        if (
            not os.path.isfile(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(src)
        ):
            base = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                    "-std=c++17", src, "-o", so_path]
            # portable flag ladder: x86-64-v3 (AVX2-era, runs on any
            # 2015+ x86) -> plain -O3; -march=native would SIGILL when the
            # .so is built on newer hardware than it runs on
            last_err = None
            for extra in (["-march=x86-64-v3"], []):
                try:
                    subprocess.run(base[:2] + extra + base[2:], check=True,
                                   capture_output=True)
                    last_err = None
                    break
                except subprocess.CalledProcessError as e:
                    last_err = e
            if last_err is not None:
                raise last_err
        lib = ctypes.CDLL(so_path)
        lib.mt_extract.restype = ctypes.c_int
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mt_free.restype = None
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def marching_tetrahedra(vol: np.ndarray, level: float = 0.0):
    """Native isosurface extraction; same contract as the numpy version.
    Faces come back already oriented (the kernel applies the same
    gradient-vs-normal rule as marching_cubes._orient_faces)."""
    lib = _build_and_load()
    vol = np.ascontiguousarray(vol, np.float32)
    rx, ry, rz = vol.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.mt_extract(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rx, ry, rz, ctypes.c_float(level),
        ctypes.byref(verts_p), ctypes.byref(faces_p),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        raise MemoryError("mt_extract failed")
    if nv.value == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    try:
        verts = np.ctypeslib.as_array(verts_p, (nv.value, 3)).copy()
        faces = np.ctypeslib.as_array(faces_p, (nf.value, 3)).copy()
    finally:
        lib.mt_free(verts_p)
        lib.mt_free(faces_p)

    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts, faces[good]
