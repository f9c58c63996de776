"""ctypes bindings for the native C++ data-pipeline kernels.

Loads native/libposetpu.so (built by `make -C native`); every entry point
has a numpy fallback so the framework works without the native build — the
native path is the production data loader (SURVEY.md section 2.4: the
reference outsources all native work to external libs; here it's in-repo).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libposetpu.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # try building once if the toolchain is around
        makefile_dir = os.path.dirname(path)
        if os.path.exists(os.path.join(makefile_dir, "Makefile")):
            os.system(f"make -C {makefile_dir} >/dev/null 2>&1")
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.splat_frame.restype = ctypes.c_int
        lib.splat_frame.argtypes = [
            f32p, f32p, i32p, ctypes.c_int, f32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p, i32p, u8p, ctypes.c_int]
        lib.splat_batch.restype = None
        lib.splat_batch.argtypes = [
            f32p, f32p, i32p, ctypes.c_int, f32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p, i32p, u8p, ctypes.c_int]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def splat_frame_native(points, normals, regions, r, t, k, h, w,
                       num_threads: int = 4):
    """Native z-buffer splat. Inputs float32/int32 contiguous; returns dict
    matching data/synthetic.render_frame label outputs (minus rgb)."""
    lib = _load()
    m = len(points)
    depth = np.zeros(h * w, np.float32)
    coord = np.zeros(h * w * 3, np.float32)
    normal = np.zeros(h * w * 3, np.float32)
    region = np.zeros(h * w, np.int32)
    mask = np.zeros(h * w, np.uint8)
    lib.splat_frame(
        np.ascontiguousarray(points, np.float32),
        np.ascontiguousarray(normals, np.float32),
        np.ascontiguousarray(regions, np.int32), m,
        np.ascontiguousarray(r, np.float32).reshape(-1),
        np.ascontiguousarray(t, np.float32),
        np.ascontiguousarray(k, np.float32).reshape(-1),
        h, w, depth, coord, normal, region, mask, num_threads)
    return {
        "depth": depth.reshape(h, w),
        "coordinate": coord.reshape(h, w, 3),
        "normal": normal.reshape(h, w, 3),
        "region": region.reshape(h, w),
        "mask": mask.reshape(h, w).astype(bool),
    }
