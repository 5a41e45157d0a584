"""Ray sampler tests: sample geometry, label/weight conventions
(reference utils/data_sampler.py:20-192 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.ops.sampler import SamplerConfig, sample_rays


def make_batch(rng, n=64, sc=None):
    sc = sc or SamplerConfig()
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dist = rng.uniform(5, 50, size=(n, 1))
    pts = (dirs * dist).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    out = sample_rays(jax.random.PRNGKey(0), sc, jnp.asarray(pts), jnp.asarray(valid))
    return sc, pts, out


def test_shapes_and_order(rng):
    sc, pts, out = make_batch(rng)
    n = pts.shape[0]
    S = sc.ray_sample_count
    assert out.coord.shape == (n * S, 3)
    assert out.sdf_label.shape == (n * S,)
    # ray-major: first sample of each ray is the exact endpoint
    coord = np.asarray(out.coord).reshape(n, S, 3)
    np.testing.assert_allclose(coord[:, 0], pts, atol=1e-5)
    lab = np.asarray(out.sdf_label).reshape(n, S)
    np.testing.assert_allclose(lab[:, 0], 0.0, atol=1e-7)


def test_samples_lie_on_rays(rng):
    sc, pts, out = make_batch(rng)
    n, S = pts.shape[0], sc.ray_sample_count
    coord = np.asarray(out.coord).reshape(n, S, 3)
    dirs = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    for s in range(S):
        cross = np.cross(coord[:, s], dirs)
        np.testing.assert_allclose(np.linalg.norm(cross, axis=1), 0, atol=1e-3)


def test_label_sign_convention(rng):
    """Samples in FRONT of the surface (closer to sensor) get POSITIVE labels
    (projective distance, sign-flipped: ref utils/data_sampler.py:150,171)."""
    sc, pts, out = make_batch(rng)
    n, S = pts.shape[0], sc.ray_sample_count
    coord = np.asarray(out.coord).reshape(n, S, 3)
    lab = np.asarray(out.sdf_label).reshape(n, S)
    depth = np.linalg.norm(coord, axis=2)
    ray_depth = np.linalg.norm(pts, axis=1, keepdims=True)
    np.testing.assert_allclose(lab, ray_depth - depth, atol=1e-3)
    # free front block: positive labels; behind block: negative
    n_surf = 1 + sc.surface_sample_n
    assert (lab[:, n_surf:n_surf + sc.free_front_n] > 0).all()
    assert (lab[:, n_surf + sc.free_front_n:] < 0).all()


def test_weight_sign_flags_freespace(rng):
    sc, pts, out = make_batch(rng)
    n, S = pts.shape[0], sc.ray_sample_count
    w = np.asarray(out.weight).reshape(n, S)
    n_surf = 1 + sc.surface_sample_n
    assert (w[:, :n_surf] > 0).all()
    assert (w[:, n_surf:] < 0).all()
    # distance weighting in [0.6, 1.4] (ref utils/data_sampler.py:129)
    assert (np.abs(w) >= 0.55).all() and (np.abs(w) <= 1.45).all()


def test_free_samples_outside_surface_band(rng):
    sc, pts, out = make_batch(rng, n=128)
    n, S = pts.shape[0], sc.ray_sample_count
    lab = np.asarray(out.sdf_label).reshape(n, S)
    n_surf = 1 + sc.surface_sample_n
    # free-space samples stay sigma_ratio * range away from the surface
    assert (np.abs(lab[:, n_surf:]) >= 2.0 * sc.surface_sample_range_m - 1e-4).all()
    # behind samples bounded by free_sample_end_dist
    assert (np.abs(lab[:, n_surf + sc.free_front_n:]) <= sc.free_sample_end_dist_m + 1e-4).all()


def test_surface_samples_gaussian(rng):
    sc, pts, out = make_batch(rng, n=2048)
    n, S = pts.shape[0], sc.ray_sample_count
    lab = np.asarray(out.sdf_label).reshape(n, S)
    surf = lab[:, 1:1 + sc.surface_sample_n].ravel()
    assert abs(surf.mean()) < 0.01
    assert abs(surf.std() - sc.surface_sample_range_m) < 0.01


def test_valid_propagates(rng):
    sc = SamplerConfig()
    pts = np.zeros((8, 3), dtype=np.float32)
    pts[:4] = rng.uniform(5, 20, size=(4, 3))
    valid = np.arange(8) < 4
    out = sample_rays(jax.random.PRNGKey(0), sc, jnp.asarray(pts), jnp.asarray(valid))
    v = np.asarray(out.valid).reshape(8, sc.ray_sample_count)
    assert v[:4].all() and not v[4:].any()
    assert np.isfinite(np.asarray(out.coord)).all()  # padded zero rays don't NaN


def test_semantic_and_color_labels(rng):
    sc = SamplerConfig()
    n = 16
    pts = rng.uniform(5, 20, size=(n, 3)).astype(np.float32)
    sem = rng.integers(1, 20, size=n).astype(np.int32)
    col = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    out = sample_rays(jax.random.PRNGKey(0), sc, jnp.asarray(pts),
                      jnp.ones(n, dtype=bool), jnp.asarray(sem), jnp.asarray(col))
    S = sc.ray_sample_count
    n_surf = 1 + sc.surface_sample_n
    sem_out = np.asarray(out.sem_label).reshape(n, S)
    np.testing.assert_array_equal(sem_out[:, :n_surf], np.tile(sem[:, None], (1, n_surf)))
    np.testing.assert_array_equal(sem_out[:, n_surf:], 0)  # free space -> label 0
    col_out = np.asarray(out.color_label).reshape(n, S, 3)
    np.testing.assert_allclose(col_out[:, 0], col, atol=1e-6)
    np.testing.assert_allclose(col_out[:, n_surf:], 0.0, atol=0)
