"""ctypes bindings to libsimcore.so (the C++ physics/planner/renderer core).

Builds the shared library on first import if missing/stale (pybind11 is not
available in this image; the C ABI + ctypes keeps the binding dependency-free).
All batched entry points release the GIL for the duration of the C call, so
Python-side threading is never the bottleneck — parallelism lives in the C++
thread pool.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libsimcore.so")

_lib = None


def _build():
    subprocess.run(["make", "-C", _CSRC, "-s"], check=True)


def _stale() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for src in ("simcore.cpp", "math3d.h", "Makefile"):
        if os.path.getmtime(os.path.join(_CSRC, src)) > lib_mtime:
            return True
    return False


def get_lib() -> C.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        _build()
    lib = C.CDLL(_LIB_PATH)

    d = C.POINTER(C.c_double)
    f = C.POINTER(C.c_float)
    u8 = C.POINTER(C.c_uint8)
    i32 = C.POINTER(C.c_int32)
    vp = C.c_void_p

    sigs = {
        "sc_pool_create": ([C.c_int, C.c_int], vp),
        "sc_pool_destroy": ([vp], None),
        "sc_pool_threads": ([vp], C.c_int),
        "sc_env_clear": ([vp, C.c_int], None),
        "sc_env_seed": ([vp, C.c_int, C.c_uint64], None),
        "sc_env_set_dt": ([vp, C.c_int, C.c_double], None),
        "sc_art_create": ([vp, C.c_int, d], C.c_int),
        "sc_art_add_link": ([vp, C.c_int, C.c_int, C.c_int, C.c_int, d, d,
                             C.c_double, C.c_double, C.c_double, C.c_double,
                             C.c_double, C.c_double], C.c_int),
        "sc_link_add_shape": ([vp, C.c_int, C.c_int, C.c_int, C.c_int, d, d, d,
                               C.c_int, C.c_int], None),
        "sc_mesh_register": ([d, C.c_int, i32, C.c_int], C.c_int),
        "sc_mesh_stats": ([C.c_int, d, d], C.c_int),
        "sc_link_add_mesh": ([vp, C.c_int, C.c_int, C.c_int, C.c_int, d, d,
                              C.c_int, C.c_int], None),
        "sc_art_finish": ([vp, C.c_int, C.c_int], None),
        "sc_set_robot": ([vp, C.c_int, C.c_int, C.c_int, C.c_int], None),
        "sc_set_grasp_config": ([vp, C.c_int, C.c_int, C.c_int, C.c_int,
                                 C.c_double, C.c_double, C.c_int], None),
        "sc_get_grasped": ([vp, C.c_int], C.c_int),
        "sc_release_grasp": ([vp, C.c_int], None),
        "sc_art_dof": ([vp, C.c_int, C.c_int], C.c_int),
        "sc_art_links": ([vp, C.c_int, C.c_int], C.c_int),
        "sc_art_get_qpos": ([vp, C.c_int, C.c_int, d], None),
        "sc_art_set_qpos": ([vp, C.c_int, C.c_int, d], None),
        "sc_art_get_qvel": ([vp, C.c_int, C.c_int, d], None),
        "sc_art_get_qlimits": ([vp, C.c_int, C.c_int, d, d], None),
        "sc_art_set_root": ([vp, C.c_int, C.c_int, d], None),
        "sc_art_set_drive_target": ([vp, C.c_int, C.c_int, d], None),
        "sc_art_get_drive_target": ([vp, C.c_int, C.c_int, d], None),
        "sc_art_get_link_pose": ([vp, C.c_int, C.c_int, C.c_int, d], None),
        "sc_get_hand_pose": ([vp, C.c_int, d], None),
        "sc_get_part_aabb": ([vp, C.c_int, C.c_int, C.c_int, C.c_int, d, d], C.c_int),
        "sc_step_all": ([vp, u8, d, C.c_int, C.c_int, C.c_int], None),
        "sc_exec_ik_move": ([vp, u8, d, C.c_int, C.c_int, u8], None),
        "sc_exec_path_move": ([vp, u8, d, C.c_int, C.c_int, C.c_int, C.c_int, u8], None),
        "sc_gripper_toggle": ([vp, u8, C.c_int, C.c_int], None),
        "sc_release_target": ([vp, u8], None),
        "sc_ik": ([vp, C.c_int, d, d, d, C.c_int, C.c_double], C.c_int),
        "sc_link_jacobian": ([vp, C.c_int, C.c_int, C.c_int, d], None),
        "sc_render_all": ([vp, u8, d, C.c_int, C.c_int, C.c_double, f, f, f, f, i32], None),
        "sc_version": ([], C.c_int),
    }
    for name, (argtypes, restype) in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype
    _lib = lib
    return lib


def dptr(a: np.ndarray):
    assert a.dtype == np.float64 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(C.POINTER(C.c_double))


def fptr(a: np.ndarray):
    assert a.dtype == np.float32 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(C.POINTER(C.c_float))


def u8ptr(a):
    if a is None:
        return None
    assert a.dtype == np.uint8 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(C.POINTER(C.c_uint8))


def i32ptr(a: np.ndarray):
    assert a.dtype == np.int32 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(C.POINTER(C.c_int32))
