"""ctypes binding for the native C++ SAH builder (csrc/bvh_builder.cpp).

Compiled on demand with g++ (-O3 -march=native) and cached next to the
source; falls back silently to the numpy builder when no toolchain is
available. This mirrors the reference's split: native code does the BVH
construction (tinybvh), the accelerator does traversal.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from physically_based_ray_tracer_tpu.bvh.types import BVHArrays

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_SO_PATH = os.path.join(_CSRC, "libbvh_builder.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    src = os.path.join(_CSRC, "bvh_builder.cpp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def get_lib():
    """Load (compiling if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or (
                os.path.getmtime(_SO_PATH)
                < os.path.getmtime(os.path.join(_CSRC, "bvh_builder.cpp"))):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.bvh_build.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.bvh_emit.restype = ctypes.c_int
        lib.bvh_emit.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        lib.bvh_free.restype = None
        lib.bvh_free.argtypes = []
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_bvh_native(triangles: np.ndarray, leaf_size: int = 4) -> BVHArrays | None:
    """Build via the C++ builder; None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tri = np.ascontiguousarray(np.asarray(triangles, np.float32).reshape(-1, 9))
    n_tris = tri.shape[0]
    n_nodes = ctypes.c_int64()
    n_prims = ctypes.c_int64()
    with _lock:
        rc = lib.bvh_build(
            tri.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n_tris), ctypes.c_int(leaf_size),
            ctypes.byref(n_nodes), ctypes.byref(n_prims))
        if rc != 0:
            return None
        nodes_box = np.empty((n_nodes.value, 12), np.float32)
        nodes_child = np.empty((n_nodes.value, 2), np.int32)
        tris_out = np.empty((n_prims.value, 9), np.float32)
        prim_index = np.empty((n_prims.value,), np.int32)
        rc = lib.bvh_emit(
            nodes_box.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nodes_child.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tris_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            prim_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        lib.bvh_free()
    if rc != 0:
        return None
    return BVHArrays.from_numpy(nodes_box, nodes_child, tris_out, prim_index)
