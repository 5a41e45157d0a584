"""PCA normal estimation (ops/normals.py) and the tracker's
normal-consistency weight (ref utils/tracker.py:331-359)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pin_slam_tpu.ops.normals import estimate_normals, smallest_eigenvector3


def test_smallest_eigenvector_matches_numpy(rng):
    A = rng.standard_normal((64, 3, 3)).astype(np.float32)
    C = np.einsum("nij,nkj->nik", A, A)               # symmetric PSD batch
    vec, lam = smallest_eigenvector3(jnp.asarray(C))
    vec, lam = np.asarray(vec), np.asarray(lam)
    w, V = np.linalg.eigh(C)
    np.testing.assert_allclose(lam, w[:, 0], rtol=2e-3, atol=2e-3)
    # eigenvector up to sign
    dots = np.abs(np.einsum("ni,ni->n", vec, V[:, :, 0]))
    assert np.all(dots > 0.999), dots.min()


def test_plane_normals(rng):
    """Points on a tilted plane -> normals == plane normal, oriented toward
    the sensor at the origin."""
    n_true = np.asarray([0.3, -0.2, 0.93])
    n_true /= np.linalg.norm(n_true)
    u = np.cross(n_true, [0, 0, 1.0]); u /= np.linalg.norm(u)
    v = np.cross(n_true, u)
    # plane passes below the origin so the sensor sees its +n side
    center = -3.0 * n_true
    ab = rng.uniform(-4, 4, size=(2000, 2)).astype(np.float32)
    pts = (center + ab[:, :1] * u + ab[:, 1:] * v).astype(np.float32)

    nrm, ok = estimate_normals(jnp.asarray(pts), jnp.ones(2000, bool), cell=0.5)
    nrm, ok = np.asarray(nrm), np.asarray(ok)
    assert ok.mean() > 0.9
    dots = np.einsum("ni,i->n", nrm[ok], n_true)
    # oriented toward the origin: dot(n, origin - p) > 0 => n ~ +n_true here
    assert np.all(dots > 0.99), dots.min()


def test_sphere_normals_radial(rng):
    """Points on a sphere around the sensor -> normals point inward (toward
    the origin), i.e. along -p/|p|."""
    d = rng.standard_normal((3000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (5.0 * d).astype(np.float32)
    nrm, ok = estimate_normals(jnp.asarray(pts), jnp.ones(3000, bool), cell=0.4)
    nrm, ok = np.asarray(nrm), np.asarray(ok)
    assert ok.mean() > 0.8
    dots = np.einsum("ni,ni->n", nrm[ok], -d[ok])
    assert np.quantile(dots, 0.05) > 0.95


def test_isolated_points_invalid(rng):
    """Points with no neighbors must come back normal_valid=False."""
    pts = (rng.uniform(-1, 1, size=(20, 3)) * 100).astype(np.float32)
    nrm, ok = estimate_normals(jnp.asarray(pts), jnp.ones(20, bool), cell=0.3,
                               min_neighbors=4)
    assert not np.any(np.asarray(ok))
    assert np.all(np.isfinite(np.asarray(nrm)))


@pytest.mark.slow
def test_tracker_converges_with_normals():
    """track_frame with the normal-consistency weight still recovers a known
    perturbation (weights scale the residuals; the fixed point is unchanged)."""
    from scipy.spatial.transform import Rotation

    import jax.numpy as jnp

    from pin_slam_tpu.slam import tracker as trk
    from tests.test_mapping import build_and_train, ray_box_endpoints

    rng = np.random.default_rng(7)
    mc, mcfg, state, lm, params, offsets, travel, _ = build_and_train(
        rng, n_rays=8192, iters=300, bs=8192)
    tc = trk.TrackerConfig(reg_iter_n=40, mask_min_nn_count=6)

    rot_gt = Rotation.from_rotvec([0.01, 0.02, -0.015])
    t_gt = np.asarray([0.10, -0.08, 0.05])
    world_pts = ray_box_endpoints(rng, 2048)
    source = (rot_gt.as_matrix().T @ (world_pts - t_gt).T).T.astype(np.float32)

    nrm, ok = estimate_normals(jnp.asarray(source), jnp.ones(2048, bool), cell=0.5)
    assert float(jnp.mean(ok)) > 0.5   # box walls are planar

    res = trk.track_frame(
        lm, mc, tc, params.geo, 0.055, offsets,
        jnp.asarray(source), jnp.ones(2048, dtype=bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        source_normals=nrm, source_normal_valid=ok)

    assert bool(res.valid)
    R_est, t_est = np.asarray(res.R), np.asarray(res.t)
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(rot_gt.as_matrix().T @ R_est) - 1) / 2, -1, 1)))
    assert rot_err < 0.8, rot_err
    assert np.linalg.norm(t_est - t_gt) < 0.08
