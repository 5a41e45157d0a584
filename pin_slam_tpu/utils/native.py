"""Loader/wrappers for the optional C++ host-kernel extension (native/).

Exposes the same signatures as the numpy implementations so call sites can do:

    from pin_slam_tpu.utils import native
    if native.available():
        verts, faces = native.marching_tetrahedra(...)

Build once with: ``cd native && python setup.py build_ext --inplace``.
The extension is host-runtime only — TPU compute stays in XLA.
"""

from __future__ import annotations

import glob
import importlib.util
import os
import sys
from typing import Optional, Tuple

import numpy as np

_mod = None
_tried = False


def _load():
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
    for pattern in ("pin_native*.so", os.path.join("build", "**", "pin_native*.so")):
        hits = glob.glob(os.path.join(root, pattern), recursive=True)
        if hits:
            spec = importlib.util.spec_from_file_location("pin_native", hits[0])
            mod = importlib.util.module_from_spec(spec)
            try:
                spec.loader.exec_module(mod)
                _mod = mod
                return _mod
            except Exception:
                return None
    return None


def available() -> bool:
    return _load() is not None


def marching_tetrahedra(sdf: np.ndarray, mask: Optional[np.ndarray] = None,
                        origin=(0.0, 0.0, 0.0), spacing: float = 1.0,
                        iso: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    mod = _load()
    assert mod is not None, "native extension not built"
    nx, ny, nz = sdf.shape
    sdf_flat = np.ascontiguousarray(sdf, dtype=np.float64).reshape(-1)
    mask_flat = (np.ascontiguousarray(mask, dtype=np.uint8).reshape(-1)
                 if mask is not None else None)
    vb, fb = mod.marching_tetrahedra(sdf_flat, nx, ny, nz, mask_flat,
                                     float(origin[0]), float(origin[1]),
                                     float(origin[2]), float(spacing), float(iso))
    verts = np.frombuffer(vb, dtype=np.float64).reshape(-1, 3).astype(np.float32)
    faces = np.frombuffer(fb, dtype=np.int64).reshape(-1, 3)
    return verts, faces


def nn_distances(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    mod = _load()
    assert mod is not None, "native extension not built"
    s = np.ascontiguousarray(src, dtype=np.float32).reshape(-1)
    d = np.ascontiguousarray(dst, dtype=np.float32).reshape(-1)
    out = mod.nn_distances(s, d)
    return np.frombuffer(out, dtype=np.float32).copy()
