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
_SBVH_SO_PATH = os.path.join(_CSRC, "libsbvh_builder.so")
_lock = threading.Lock()
_lib = None
_tried = False
_sbvh_lib = None
_sbvh_tried = False


def _compile_one(src_name: str, so_path: str) -> bool:
    src = os.path.join(_CSRC, src_name)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def _compile() -> bool:
    return _compile_one("bvh_builder.cpp", _SO_PATH)


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


# ---------------------------------------------------------------------------
# SBVH (BuildHQ analogue): generic native build with spatial splits
# ---------------------------------------------------------------------------

def get_sbvh_lib():
    """Load (compiling if needed) the SBVH library; None when unavailable."""
    global _sbvh_lib, _sbvh_tried
    with _lock:
        if _sbvh_lib is not None or _sbvh_tried:
            return _sbvh_lib
        _sbvh_tried = True
        src = os.path.join(_CSRC, "sbvh_builder.cpp")
        if not os.path.exists(_SBVH_SO_PATH) or (
                os.path.getmtime(_SBVH_SO_PATH) < os.path.getmtime(src)):
            if not _compile_one("sbvh_builder.cpp", _SBVH_SO_PATH):
                return None
        try:
            lib = ctypes.CDLL(_SBVH_SO_PATH)
        except OSError:
            return None
        lib.sbvh_build.restype = ctypes.c_int
        lib.sbvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.sbvh_emit.restype = ctypes.c_int
        lib.sbvh_emit.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.sbvh_free.restype = None
        lib.sbvh_free.argtypes = []
        _sbvh_lib = lib
        return _sbvh_lib


def sbvh_available() -> bool:
    return get_sbvh_lib() is not None


def build_sbvh_generic(triangles: np.ndarray, leaf_size: int,
                       dense_mode: bool):
    """Spatial-split SBVH build (BuildHQ analogue, csrc/sbvh_builder.cpp).

    Returns (nodes_box (N,12) f32, children (N,2) i32, segments:
    list[np.ndarray of prim ids]) or None when the native toolchain is
    unavailable. children codes: >=0 internal node, INT32_MIN absent,
    other <0 leaf with segment = -(c+1). Leaf segments may reference the
    same primitive from sibling subtrees (spatial-split duplication).
    """
    lib = get_sbvh_lib()
    if lib is None:
        return None
    tri = np.ascontiguousarray(np.asarray(triangles, np.float32).reshape(-1, 9))
    n_nodes = ctypes.c_int64()
    n_segs = ctypes.c_int64()
    n_refs = ctypes.c_int64()
    with _lock:
        rc = lib.sbvh_build(
            tri.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(tri.shape[0]), ctypes.c_int(leaf_size),
            ctypes.c_int(1 if dense_mode else 0),
            ctypes.byref(n_nodes), ctypes.byref(n_segs), ctypes.byref(n_refs))
        if rc != 0:
            return None
        nodes_box = np.empty((n_nodes.value, 12), np.float32)
        children = np.empty((n_nodes.value, 2), np.int32)
        seg_off = np.empty((n_segs.value + 1,), np.int64)
        refs = np.empty((max(n_refs.value, 1),), np.int32)
        rc = lib.sbvh_emit(
            nodes_box.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            children.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            seg_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            refs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        lib.sbvh_free()
    if rc != 0:
        return None
    segments = [refs[seg_off[s]:seg_off[s + 1]].copy()
                for s in range(n_segs.value)]
    return nodes_box, children, segments
