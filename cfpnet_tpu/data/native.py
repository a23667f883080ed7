"""ctypes bindings for the native host ToF kernel (native/tofsim.cpp).

Loads ``native/libtofsim.so`` if present (build with ``native/build.sh``);
callers fall back to the vectorized numpy path in ``tof_sim.py`` when the
library is missing or ``CFPNET_NATIVE_TOFSIM=0``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libtofsim.so")
    if not os.path.exists(cand):
        # one-shot build attempt (the .so is a build artifact, not in git)
        src = os.path.join(here, "native", "tofsim.cpp")
        if os.path.exists(src):
            import subprocess

            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", cand, src],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
    return cand if os.path.exists(cand) else None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CFPNET_NATIVE_TOFSIM", "1") == "0":
        return None
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.tof_get_hist.restype = ctypes.c_int
    lib.tof_get_hist.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        f32p, u8p,
    ]
    lib.tof_sample_uniform.restype = None
    lib.tof_sample_uniform.argtypes = [f32p, u8p, ctypes.c_int, ctypes.c_int, f32p]
    _LIB = lib
    return _LIB


def native_get_hist(
    depth: np.ndarray, geom, max_distance: float, bin_width: float, noise_floor: float
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(fh, mask) via the C++ kernel, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, np.float32)
    Z = geom.zone_num * geom.zone_num
    fh = np.empty((Z, 2), np.float32)
    mask = np.empty((Z,), np.uint8)
    rc = lib.tof_get_hist(
        depth, depth.shape[0], depth.shape[1],
        geom.sy_px, geom.sx_px, geom.zone_num, geom.patch_px_h, geom.patch_px_w,
        np.float32(max_distance), np.float32(bin_width), np.float32(noise_floor),
        fh, mask,
    )
    if rc != 0:
        return None
    return fh, mask.astype(bool)


def native_sample_uniform(fh: np.ndarray, mask: np.ndarray, nsamples: int):
    lib = get_lib()
    if lib is None:
        return None
    fh = np.ascontiguousarray(fh, np.float32)
    m = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.empty((fh.shape[0], nsamples), np.float32)
    lib.tof_sample_uniform(fh, m, fh.shape[0], nsamples, out)
    return out
