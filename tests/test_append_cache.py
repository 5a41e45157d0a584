"""Append-time kNN cache (ray-grouped probe, mapper.append_knn): the grouped
probe must reproduce the per-sample hash-probe kNN where their semantics
coincide, and the pool-cached training path built on it must match the legacy
fast path numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.slam import mapper as mp


def _small_map(rng, n=1500, voxel=0.3):
    mc = npts.MapConfig(
        capacity=1 << 12, local_capacity=1 << 11, hash_size=1 << 14,
        voxel_size=voxel, feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * voxel) ** 2, local_map_radius=50.0,
        travel_dist_window=250.0, weighted_first=True)
    pts = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((n,), bool),
                            jnp.int32(0), travel, downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    return mc, state, lm, offsets, travel


def test_append_knn_matches_hash_probe(rng):
    """With one sample per ray (every sample is its own probe group) the
    grouped append probe is EXACTLY the per-sample knn_search."""
    mc, state, lm, offsets, travel = _small_map(rng)

    q = rng.uniform(-5, 5, size=(512, 3)).astype(np.float32)
    gidx, w, vecb = mp.append_knn(lm, mc, offsets, jnp.asarray(q),
                                  ray_sample_count=1, near_count=1)
    knn = npts.knn_search(lm, mc, jnp.asarray(q), offsets)

    gid_hash = np.asarray(jnp.where(knn.lidx < mc.local_capacity,
                                    lm.indices[jnp.minimum(knn.lidx,
                                                           mc.local_capacity)], -1))
    gid_grp = np.asarray(gidx)
    for a, b in zip(gid_hash, gid_grp):
        assert set(a[a >= 0]) == set(b[b >= 0])

    # weights match interpolate_features' IDW weights (same candidate sets)
    _, _, w_ref, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), knn.lidx)
    np.testing.assert_allclose(np.sort(np.asarray(w), axis=1),
                               np.sort(np.asarray(w_ref), axis=1),
                               rtol=1e-5, atol=1e-6)


def test_append_knn_grouped_near_surface(rng):
    """Ray layout [endpoint, 2 surface, 1 front, 1 behind]: near-group samples
    rank within the endpoint's ball; offsets small vs the ball radius, so the
    kNN sets match the exact per-sample probe for nearly all samples (on a
    realistically voxel-DENSE surface — sparse maps make the sets knife-edge)."""
    voxel = 0.3
    gx, gy = np.meshgrid(np.arange(-5, 5, voxel), np.arange(-5, 5, voxel))
    surf = np.stack([gx.ravel(), gy.ravel(),
                     0.2 * np.sin(gx.ravel()) + 0.1 * gy.ravel()], 1)
    mc, state, lm, offsets, travel = _small_map(rng, n=len(surf))
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(surf.astype(np.float32)),
                            jnp.ones((len(surf),), bool), jnp.int32(0), travel,
                            downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)

    n_rays, Sn = 128, 5
    ex = rng.uniform(-4, 4, size=(n_rays, 2)).astype(np.float32)
    endpoints = np.column_stack(
        [ex, 0.2 * np.sin(ex[:, 0]) + 0.1 * ex[:, 1]]).astype(np.float32)
    rays = np.zeros((n_rays, Sn, 3), np.float32)
    rays[:, 0] = endpoints
    rays[:, 1] = endpoints + rng.normal(0, 0.1, (n_rays, 3))
    rays[:, 2] = endpoints + rng.normal(0, 0.1, (n_rays, 3))
    rays[:, 3] = endpoints + rng.uniform(2, 4, (n_rays, 1)) * np.array([1, 0, 0])
    rays[:, 4] = endpoints + rng.normal(0, 0.15, (n_rays, 3))  # behind
    coords = rays.reshape(-1, 3)

    gidx, w, vecb = mp.append_knn(lm, mc, offsets, jnp.asarray(coords),
                                  ray_sample_count=Sn, near_count=3)
    knn = npts.knn_search(lm, mc, jnp.asarray(coords), offsets)
    gid_ref = np.asarray(jnp.where(knn.lidx < mc.local_capacity,
                                   lm.indices[jnp.minimum(knn.lidx,
                                                          mc.local_capacity)], -1))
    gid_grp = np.asarray(gidx)

    # compare by SORTED squared distances (id-set equality is knife-edge: a
    # regular grid has exact distance ties whose argmin tie-breaks differ by
    # candidate enumeration order, with identical IDW numerics)
    pos = np.asarray(state.positions)

    def sorted_d2(gids, q):
        d = np.full(gids.shape, np.inf)
        ok = gids >= 0
        d[ok] = np.sum((pos[gids[ok]] - np.repeat(q, gids.shape[1], 0).reshape(
            gids.shape + (3,))[ok]) ** 2, axis=-1)
        return np.sort(d, axis=1)

    d_ref = sorted_d2(gid_ref, coords)
    d_grp = sorted_d2(gid_grp, coords)
    both = np.isfinite(d_ref) & np.isfinite(d_grp)
    close = np.isclose(d_ref, d_grp, rtol=2e-2, atol=1e-6) | ~both
    rows_close = close.all(axis=1)

    # the shared-ball guarantee: samples within ~half a voxel of the endpoint
    # see their full exact neighborhood (boundary misses can only start once
    # the sample's own ball outgrows the endpoint's); knn_search's
    # approx_max_k is itself approximate at near-ties, hence the tolerance
    off = np.linalg.norm(coords - np.repeat(endpoints, Sn, 0), axis=1)
    near_exact = rows_close[off <= 0.5 * 0.3]
    # the baseline itself (knn_search -> approx_max_k, recall ~0.95) misses
    # rim candidates a few percent of the time, bounding achievable agreement
    assert near_exact.mean() > 0.9, f"{near_exact.mean():.2%} of sub-half-voxel"

    # larger offsets may miss ball-rim candidates (bounded approximation: the
    # missed neighbor is >= ball_radius - offset away, i.e. low IDW weight);
    # the NEAREST neighbors must still match almost everywhere
    nearest_close = close[:, :3].all(axis=1)
    assert nearest_close.mean() > 0.9, f"{nearest_close.mean():.2%} nearest-3"

    # free samples (indices 3, 4) probe their OWN ball -> near-exact
    free_close = rows_close.reshape(n_rays, Sn)[:, 3:]
    assert free_close.mean() > 0.95, f"{free_close.mean():.2%} free rows"

    # behind_count=1: the behind sample shares the ENDPOINT ball instead of
    # probing its own (the surface points around the endpoint ARE its
    # neighborhood — points live on surfaces, not inside them); for small
    # behind offsets the sets must still agree, and the front free sample
    # (its own ball) must be unchanged
    gidx_b, w_b, vecb_b = mp.append_knn(lm, mc, offsets, jnp.asarray(coords),
                                        ray_sample_count=Sn, near_count=3,
                                        behind_count=1)
    d_b = sorted_d2(np.asarray(gidx_b), coords)
    close_b = (np.isclose(d_ref, d_b, rtol=2e-2, atol=1e-6)
               | ~(np.isfinite(d_ref) & np.isfinite(d_b))).reshape(n_rays, Sn, -1)
    # the disagreement concentrates in the low-IDW-weight rank-4..6 tail
    # (~24% weight mass); the dominant neighbors must agree
    assert close_b[:, 4, 0].mean() > 0.95, "behind nearest-1"
    assert close_b[:, 4, :3].all(axis=1).mean() > 0.85, "behind nearest-3"
    np.testing.assert_array_equal(np.asarray(gidx_b).reshape(n_rays, Sn, -1)[:, 3],
                                  gid_grp.reshape(n_rays, Sn, -1)[:, 3])


def test_cached_training_matches_fast_path(rng):
    """mapping_loop_cached driven by append_knn caches must reproduce the
    legacy fast path (which re-probes and recomputes geometry per frame) on a
    fresh, deformation-free pool."""
    mc, state, lm, offsets, travel = _small_map(rng)

    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=256,
        bs_new_sample=32, iters=4, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1,
        sdf_scale=0.055, loss_weight_on=True, ekional_loss_on=True,
        weight_e=0.5, gradient_decimation=8, num_grad_step=0.06,
        surface_sample_range=0.25, semantic_on=False, color_on=False,
        weight_s=1.0, weight_i=1.0)

    n = 1 << 11
    coords = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    labels = (rng.normal(size=n) * 0.1).astype(np.float32)

    gidx, w, vecb = mp.append_knn(lm, mc, offsets, jnp.asarray(coords),
                                  ray_sample_count=1, near_count=1)
    pool = mp.init_pool(mcfg, 1)
    pool = mp.pool_append(pool, mcfg, jnp.asarray(coords), jnp.asarray(coords),
                          jnp.asarray(labels), jnp.ones((n,), jnp.float32),
                          jnp.ones((n,), bool), jnp.int32(0),
                          jnp.zeros((n,), bool), knn_gidx=gidx, knn_w=w,
                          knn_vec=vecb)

    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)
    key = jax.random.PRNGKey(7)

    params_f = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                  geo=geo, sem=None, color=None)
    lm_f, p_f, _, hist_f = mp._mapping_loop_fast(
        lm, mc, params_f, mp.init_opt_state(mcfg, params_f), pool, mcfg,
        offsets, key, jnp.float32(1.0), jnp.asarray(False), jnp.asarray(False),
        num_iters=4)

    L = mc.local_capacity
    featsC = jnp.concatenate([lm.geo_features,
                              jnp.zeros((L + 1, 1), jnp.float32)], axis=1)
    params_c = mp.TrainableParams(features=featsC, color_features=None,
                                  geo=geo, sem=None, color=None)
    lm_c, p_c, _, hist_c = mp.mapping_loop_cached(
        lm, mc, params_c, mp.init_opt_state(mcfg, params_c), pool, mcfg, key,
        jnp.float32(1.0), jnp.asarray(False), num_iters=4, after_pgo=False)

    np.testing.assert_allclose(np.asarray(hist_c), np.asarray(hist_f),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p_c.features[:, :8]),
                               np.asarray(p_f.features), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lm_c.certainties),
                               np.asarray(lm_f.certainties), rtol=1e-3,
                               atol=1e-4)


def test_dedup_group_probe_bit_identical(rng):
    """In-budget voxel-dedup probing returns BIT-IDENTICAL results to the
    direct per-item probe (same candidate rows, exact distances, same
    tie-breaking) — dedup_group_probe is row-count dedup, not approximation."""
    mc, state, lm, offsets, travel = _small_map(rng)

    # heavy duplication: many samples land in the same voxels
    base = rng.uniform(-4, 4, size=(200, 3)).astype(np.float32)
    q = np.repeat(base, 6, axis=0) + rng.uniform(
        -0.05, 0.05, size=(1200, 3)).astype(np.float32)
    Sn = 5
    coords = q[:1200 - 1200 % Sn]

    ref = mp.append_knn(lm, mc, offsets, jnp.asarray(coords),
                        ray_sample_count=Sn, near_count=2)
    dd = mp.append_knn(lm, mc, offsets, jnp.asarray(coords),
                       ray_sample_count=Sn, near_count=2,
                       dedup_far_budget=coords.shape[0],  # ample budget
                       dedup_near_budget=coords.shape[0] // Sn)
    for a, b, name in zip(ref, dd, ("gidx", "w", "vec")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_dedup_group_probe_overflow_drops(rng):
    """Items in groups past the static budget come back all-invalid AND
    flagged in the returned drop mask (dropped supervision — never wrong
    neighbors; the mask lets the pipeline keep them out of the pool,
    ADVICE r4 #2)."""
    mc, state, lm, offsets, travel = _small_map(rng)
    q = rng.uniform(-5, 5, size=(256, 3)).astype(np.float32)  # ~all unique
    gidx, pos, valid, drop_mask = mp.dedup_group_probe(
        lm, mc, offsets, jnp.asarray(q), jnp.asarray(q)[:, None, :], 6,
        budget=16, n_g=4)
    g_ref, p_ref, v_ref = mp._probe_rank(lm, mc, offsets, jnp.asarray(q),
                                         jnp.asarray(q)[:, None, :], 6)
    dropped = ~np.asarray(valid).any(axis=(1, 2)) & np.asarray(
        v_ref).any(axis=(1, 2))
    kept = ~dropped
    # over-budget items dropped, in-budget items exact
    assert dropped.sum() > 100
    np.testing.assert_array_equal(np.asarray(gidx)[kept],
                                  np.asarray(g_ref)[kept])
    # the returned mask covers exactly the over-budget items: every item it
    # leaves unflagged is bit-exact vs the per-item probe
    dm = np.asarray(drop_mask)
    assert (dropped & ~dm).sum() == 0
    np.testing.assert_array_equal(np.asarray(gidx)[~dm],
                                  np.asarray(g_ref)[~dm])
