"""Parity tests: C++ host kernels vs the numpy reference implementations.

Skipped when the extension isn't built (``cd native && python setup.py
build_ext --inplace``)."""

import time

import numpy as np
import pytest

from pin_slam_tpu.eval.mesh import sample_mesh_surface
from pin_slam_tpu.ops import marching_cubes as mcubes
from pin_slam_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native extension not built")


def sphere_grid(n=48, r=1.0, half=1.5):
    xs = np.linspace(-half, half, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    return (np.linalg.norm(g, axis=-1) - r), (-half, -half, -half), xs[1] - xs[0]


def chamfer(a, b):
    from scipy.spatial import cKDTree

    da, _ = cKDTree(b).query(a)
    db, _ = cKDTree(a).query(b)
    return 0.5 * (da.mean() + db.mean())


def test_marching_tetrahedra_parity():
    sdf, origin, spacing = sphere_grid()
    v_py, f_py = mcubes.marching_tetrahedra(sdf, origin=origin, spacing=spacing,
                                            use_native=False)
    v_c, f_c = mcubes.marching_tetrahedra(sdf, origin=origin, spacing=spacing,
                                          use_native=True)
    # same surface: identical vertex/face counts and near-zero chamfer
    assert abs(len(v_c) - len(v_py)) <= 2, (len(v_c), len(v_py))
    assert abs(len(f_c) - len(f_py)) <= 4
    assert chamfer(v_c, v_py) < 1e-5
    # geometric sanity
    radii = np.linalg.norm(v_c, axis=1)
    np.testing.assert_allclose(radii.mean(), 1.0, atol=0.01)


def test_marching_tetrahedra_mask_parity():
    sdf, origin, spacing = sphere_grid()
    mask = np.zeros(sdf.shape, dtype=bool)
    mask[:, :, : sdf.shape[2] // 2] = True
    v_py, _ = mcubes.marching_tetrahedra(sdf, mask, origin=origin, spacing=spacing,
                                         use_native=False)
    v_c, _ = mcubes.marching_tetrahedra(sdf, mask, origin=origin, spacing=spacing,
                                        use_native=True)
    assert abs(len(v_c) - len(v_py)) <= 2
    assert (v_c[:, 2] <= 0.05).all()


def test_nn_distances_parity(rng):
    src = rng.normal(size=(5000, 3)).astype(np.float32)
    dst = rng.normal(size=(8000, 3)).astype(np.float32)
    d_native = native.nn_distances(src, dst)
    from scipy.spatial import cKDTree

    d_ref, _ = cKDTree(dst).query(src)
    np.testing.assert_allclose(d_native, d_ref, rtol=1e-5, atol=1e-6)


def test_native_speedup():
    sdf, origin, spacing = sphere_grid(n=96)
    t0 = time.perf_counter()
    v_py, f_py = mcubes.marching_tetrahedra(sdf, origin=origin, spacing=spacing,
                                            use_native=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    v_c, f_c = mcubes.marching_tetrahedra(sdf, origin=origin, spacing=spacing,
                                          use_native=True)
    t_c = time.perf_counter() - t0
    assert len(v_c) == pytest.approx(len(v_py), abs=4)
    # the native path must actually be faster (the reason it exists)
    assert t_c < t_py, (t_c, t_py)
