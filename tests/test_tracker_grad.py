"""Analytic SDF gradient must match jax.grad exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.slam.tracker_grad import sdf_value_and_grad
from tests.test_neural_points import make_map, small_config


def _setup(rng, hidden_level=1):
    mc = small_config()
    pts = rng.uniform(-4, 4, size=(800, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    count = int(lm.count)
    feats = rng.normal(size=(count, mc.feature_dim)).astype(np.float32) * 0.3
    state = state._replace(geo_features=state.geo_features.at[:count].set(feats))
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, hidden_level, 1)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    q = rng.uniform(-3.5, 3.5, size=(128, 3)).astype(np.float32)
    return mc, lm, geo, offsets, q


def _ad_reference(lm, mc, geo, offsets, q, after_pgo=False):
    def f(p):
        knn = npts.knn_search(lm, mc, p, offsets)
        feat, _, w, _ = npts.interpolate_features(lm, mc, p, knn.lidx,
                                                  after_pgo=after_pgo)
        return jnp.sum(dec.sdf(geo, feat, 0.055))

    def fv(p):
        knn = npts.knn_search(lm, mc, p, offsets)
        feat, _, w, _ = npts.interpolate_features(lm, mc, p, knn.lidx,
                                                  after_pgo=after_pgo)
        return dec.sdf(geo, feat, 0.055)

    return np.asarray(fv(q)), np.asarray(jax.grad(f)(q))


def test_analytic_grad_matches_ad(rng):
    mc, lm, geo, offsets, q = _setup(rng)
    sdf_ref, grad_ref = _ad_reference(lm, mc, geo, offsets, jnp.asarray(q))
    sdf, grad, nn, _ = sdf_value_and_grad(lm, mc, geo, 0.055, offsets, jnp.asarray(q))
    ok = np.asarray(nn) > 0
    np.testing.assert_allclose(np.asarray(sdf)[ok], sdf_ref[ok], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad)[ok], grad_ref[ok], rtol=2e-4, atol=1e-5)


def test_analytic_grad_matches_ad_2layer(rng):
    mc, lm, geo, offsets, q = _setup(rng, hidden_level=2)
    sdf_ref, grad_ref = _ad_reference(lm, mc, geo, offsets, jnp.asarray(q))
    sdf, grad, nn, _ = sdf_value_and_grad(lm, mc, geo, 0.055, offsets, jnp.asarray(q))
    ok = np.asarray(nn) > 0
    np.testing.assert_allclose(np.asarray(sdf)[ok], sdf_ref[ok], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad)[ok], grad_ref[ok], rtol=2e-4, atol=1e-5)


def test_analytic_grad_after_pgo(rng):
    mc, lm, geo, offsets, q = _setup(rng)
    # non-trivial quaternions on the local map
    from scipy.spatial.transform import Rotation

    n = lm.orientations.shape[0]
    quats = Rotation.random(n, random_state=3).as_quat()  # xyzw
    wxyz = np.roll(quats, 1, axis=-1).astype(np.float32)
    lm = lm._replace(attr_rows=lm.attr_rows.at[:, npts.C_QUAT].set(jnp.asarray(wxyz)))
    sdf_ref, grad_ref = _ad_reference(lm, mc, geo, offsets, jnp.asarray(q),
                                      after_pgo=True)
    sdf, grad, nn, _ = sdf_value_and_grad(lm, mc, geo, 0.055, offsets, jnp.asarray(q),
                                       after_pgo=True)
    ok = np.asarray(nn) > 0
    np.testing.assert_allclose(np.asarray(sdf)[ok], sdf_ref[ok], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad)[ok], grad_ref[ok], rtol=5e-4, atol=2e-5)

def test_cached_path_matches_direct(rng):
    """CandCache probed at the query pose must reproduce sdf_value_and_grad
    exactly; probed at a slightly different pose it must still agree wherever
    the probed cell neighborhoods are unchanged (here: tiny offset)."""
    from pin_slam_tpu.slam.tracker_grad import (probe_candidates,
                                                sdf_value_and_grad_cached)

    mc, lm, geo, offsets, q = _setup(rng)
    q = jnp.asarray(q)
    sdf_d, grad_d, nn_d, _ = sdf_value_and_grad(lm, mc, geo, 0.055, offsets, q)

    cache = probe_candidates(lm, mc, q, offsets, keep=offsets.shape[0])
    sdf_c, grad_c, nn_c, _ = sdf_value_and_grad_cached(cache, lm, mc, geo, 0.055, q)
    np.testing.assert_array_equal(np.asarray(nn_c), np.asarray(nn_d))
    np.testing.assert_allclose(np.asarray(sdf_c), np.asarray(sdf_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_c), np.asarray(grad_d),
                               rtol=2e-4, atol=1e-5)

    # query at a pose 2 cm away from the probe pose (well inside the probe
    # margin): values must match a fresh direct query at the moved points
    q2 = q + jnp.asarray([0.02, -0.01, 0.015], jnp.float32)
    sdf_d2, grad_d2, nn_d2, _ = sdf_value_and_grad(lm, mc, geo, 0.055, offsets, q2)
    sdf_c2, grad_c2, nn_c2, _ = sdf_value_and_grad_cached(cache, lm, mc, geo, 0.055, q2)
    # neighborhoods only churn at cell boundaries, so the vast majority of
    # rows must agree exactly with a fresh probe (the rest differ by one
    # swapped boundary neighbor and are refreshed in-loop past probe_margin)
    close = np.isclose(np.asarray(sdf_c2), np.asarray(sdf_d2),
                       rtol=1e-5, atol=1e-6)
    assert close.mean() > 0.85, f"cell-boundary churn too high: {close.mean()}"
    gclose = np.isclose(np.asarray(grad_c2), np.asarray(grad_d2),
                        rtol=2e-4, atol=1e-4).all(axis=-1)
    assert gclose.mean() > 0.85, f"gradient churn too high: {gclose.mean()}"


def test_analytic_grad_matches_ad_weighted_first_false(rng):
    """Per-neighbor prediction blending (weighted_first=False — run_kitti's
    interpolation mode, r5 analytic path) must match jax.grad through the
    full per-neighbor decode + IDW blend, including the prediction std."""
    import dataclasses

    mc, lm, geo, offsets, q = _setup(rng)
    mc = dataclasses.replace(mc, weighted_first=False)
    q = jnp.asarray(q)

    def fv(p):
        knn = npts.knn_search(lm, mc, p, offsets)
        feat, _, w, _ = npts.interpolate_features(lm, mc, p, knn.lidx)
        return dec.blended_sdf(geo, feat, w, mc.weighted_first, 0.055)

    def f(p):
        return jnp.sum(fv(p)[0])

    sdf_ref = np.asarray(fv(q)[0])
    std_ref = np.asarray(fv(q)[1])
    grad_ref = np.asarray(jax.grad(f)(q))
    sdf, grad, nn, std = sdf_value_and_grad(lm, mc, geo, 0.055, offsets, q)
    ok = np.asarray(nn) > 0
    np.testing.assert_allclose(np.asarray(sdf)[ok], sdf_ref[ok],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad)[ok], grad_ref[ok],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std)[ok], std_ref[ok],
                               rtol=1e-4, atol=1e-5)


def test_cached_path_weighted_first_false(rng):
    """The candidate cache must reproduce the direct per-neighbor query
    (the cache is what makes run_kitti's odometry probe-once-per-margin)."""
    import dataclasses

    from pin_slam_tpu.slam.tracker_grad import (probe_candidates,
                                                sdf_value_and_grad_cached)

    mc, lm, geo, offsets, q = _setup(rng)
    mc = dataclasses.replace(mc, weighted_first=False)
    q = jnp.asarray(q)
    sdf_d, grad_d, nn_d, std_d = sdf_value_and_grad(lm, mc, geo, 0.055,
                                                    offsets, q)
    cache = probe_candidates(lm, mc, q, offsets, keep=offsets.shape[0])
    sdf_c, grad_c, nn_c, std_c = sdf_value_and_grad_cached(cache, lm, mc, geo,
                                                           0.055, q)
    np.testing.assert_array_equal(np.asarray(nn_c), np.asarray(nn_d))
    np.testing.assert_allclose(np.asarray(sdf_c), np.asarray(sdf_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_c), np.asarray(grad_d),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std_c), np.asarray(std_d),
                               rtol=1e-4, atol=1e-5)


def test_cache_top_m_prerank_matches_full(rng):
    """The default top-16 candidate pre-rank (r5 odometry cost fix) must give
    the same selected neighbors / sdf / grad as the full-K cache at the probe
    pose, with nn_count saturating at M."""
    from pin_slam_tpu.slam.tracker_grad import (probe_candidates,
                                                sdf_value_and_grad_cached)

    mc, lm, geo, offsets, q = _setup(rng)
    q = jnp.asarray(q)
    full = probe_candidates(lm, mc, q, offsets, keep=offsets.shape[0])
    top = probe_candidates(lm, mc, q, offsets)           # default keep=16
    assert top.lidx.shape[1] == 16
    s_f, g_f, n_f, _ = sdf_value_and_grad_cached(full, lm, mc, geo, 0.055, q)
    s_t, g_t, n_t, _ = sdf_value_and_grad_cached(top, lm, mc, geo, 0.055, q)
    np.testing.assert_allclose(np.asarray(s_t), np.asarray(s_f),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_f),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(n_t),
                                  np.minimum(np.asarray(n_f), 16))
