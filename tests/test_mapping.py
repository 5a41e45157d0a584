"""End-to-end mapping test: fit the implicit map to a synthetic room scene and
check the learned SDF against the analytic signed distance."""

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops.sampler import SamplerConfig, sample_rays
from pin_slam_tpu.slam import mapper as mp

HALF = 4.0  # box half-width


def ray_box_endpoints(rng, n):
    """Rays from the origin to the walls of the [-HALF, HALF]^3 box."""
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = (HALF / np.abs(d)).min(axis=1)
    return (d * tmax[:, None]).astype(np.float32)


def build_and_train(rng, n_rays=4096, iters=300, bs=4096):
    mc = npts.MapConfig(
        capacity=1 << 15, local_capacity=1 << 14, hash_size=1 << 18, voxel_size=0.3,
        feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=50.0,
        travel_dist_window=250.0)
    mcfg = mp.MapperConfig(
        pool_capacity=1 << 17, new_idx_capacity=1 << 15, bs=bs, bs_new_sample=512,
        iters=iters, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1, sdf_scale=0.055,
        loss_weight_on=False, ekional_loss_on=True, weight_e=0.5,
        gradient_decimation=10, num_grad_step=0.06, surface_sample_range=0.25,
        semantic_on=False, color_on=False, weight_s=1.0, weight_i=1.0)
    sc = SamplerConfig()
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    travel = jnp.zeros((64,), jnp.float32)

    pts = ray_box_endpoints(rng, n_rays)
    batch = sample_rays(jax.random.PRNGKey(0), sc, jnp.asarray(pts),
                        jnp.ones(n_rays, dtype=bool))

    state = npts.init_map_state(mc)
    surf_mask = batch.valid & (jnp.abs(batch.sdf_label) < sc.surface_sample_range_m * 0.5)
    state = npts.map_insert(state, mc, batch.coord, surf_mask, jnp.int32(0), travel,
                            downsample_table_size=1 << 18)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    assert int(lm.count) > 500

    pool = mp.init_pool(mcfg)
    pool = mp.pool_append(pool, mcfg, batch.coord, batch.coord, batch.sdf_label,
                          batch.weight, batch.valid, jnp.int32(0),
                          jnp.zeros_like(batch.valid))

    geo = dec.init_decoder(jax.random.PRNGKey(1), mc.feature_dim + 3, 64, 1, 1)
    params = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                geo=geo, sem=None, color=None)
    opt_state = mp.init_opt_state(mcfg, params)

    lm, params, opt_state, losses = mp.mapping_loop(
        lm, mc, params, opt_state, pool, mcfg, offsets,
        jax.random.PRNGKey(2), jnp.float32(1.0),
        jnp.zeros((), bool), jnp.zeros((), bool), num_iters=iters)
    lm = lm._replace(geo_features=params.features)
    return mc, mcfg, state, lm, params, offsets, travel, np.asarray(losses)


def query_sdf(mc, state, lm, params, offsets, travel, q):
    knn = npts.knn_search(lm, mc, jnp.asarray(q), offsets)
    feat, _, _, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), knn.lidx)
    return np.asarray(dec.sdf(params.geo, feat, 0.055)), np.asarray(knn.nn_count)


def test_mapping_learns_box_sdf(rng):
    mc, mcfg, state, lm, params, offsets, travel, losses = build_and_train(rng)

    # training loss decreased substantially
    assert losses[-1] < losses[0] * 0.6

    # near-surface queries: SDF ~ distance to the box wall (positive inside
    # the room = free space, negative beyond the wall)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = (HALF / np.abs(d)).min(axis=1)

    for offset, sign in [(-0.15, +1.0), (0.15, -1.0)]:
        q = (d * (tmax + offset)[:, None]).astype(np.float32)
        sdf, nn = query_sdf(mc, state, lm, params, offsets, travel, q)
        ok = nn >= 6
        assert ok.mean() > 0.7  # corners/edges of the box are sparsely observed
        # mean prediction has the right sign and roughly the right magnitude
        # (eikonal regularization slows early convergence; tolerances match the
        # 300-iter budget, cf. the reference's 600-iter first frame)
        m = sdf[ok].mean() * sign
        assert 0.04 < m < 0.3, (offset, m)
        # per-point sign agreement
        assert ((sdf[ok] * sign) > 0).mean() > 0.75


def test_certainty_grows_during_training(rng):
    mc, mcfg, state, lm, params, offsets, travel, _ = build_and_train(rng, iters=10)
    assert float(jnp.sum(lm.certainties)) > 100.0
    assert float(lm.certainties[mc.local_capacity]) == 0.0


def test_pool_filter_compacts(rng):
    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=256, bs_new_sample=64,
        iters=1, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1, sdf_scale=0.055,
        loss_weight_on=False, ekional_loss_on=False, weight_e=0.5,
        gradient_decimation=10, num_grad_step=0.06, surface_sample_range=0.25,
        semantic_on=False, color_on=False, weight_s=1.0, weight_i=1.0,
        window_radius=10.0)
    pool = mp.init_pool(mcfg)
    n = 1024
    near = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    far = rng.uniform(50, 60, size=(n, 3)).astype(np.float32)
    coords = np.vstack([near, far])
    pool = mp.pool_append(pool, mcfg, jnp.asarray(coords), jnp.asarray(coords),
                          jnp.zeros(2 * n), jnp.ones(2 * n), jnp.ones(2 * n, dtype=bool),
                          jnp.int32(0), jnp.zeros(2 * n, dtype=bool))
    assert int(pool.fill) == 2 * n
    pool = mp.pool_filter(pool, mcfg, jnp.zeros(3))
    assert int(pool.fill) == n
    kept = np.asarray(pool.coord[:n])
    assert (np.linalg.norm(kept, axis=1) < 10.0).all()


def test_pool_ring_overwrite(rng):
    mcfg = mp.MapperConfig(
        pool_capacity=256, new_idx_capacity=64, bs=64, bs_new_sample=16,
        iters=1, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1, sdf_scale=0.055,
        loss_weight_on=False, ekional_loss_on=False, weight_e=0.5,
        gradient_decimation=10, num_grad_step=0.06, surface_sample_range=0.25,
        semantic_on=False, color_on=False, weight_s=1.0, weight_i=1.0)
    pool = mp.init_pool(mcfg)
    for ts in range(3):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        pool = mp.pool_append(pool, mcfg, jnp.asarray(pts), jnp.asarray(pts),
                              jnp.zeros(200), jnp.ones(200), jnp.ones(200, dtype=bool),
                              jnp.int32(ts), jnp.zeros(200, dtype=bool))
    # dense-slice ring: a frame bucket never wraps — the head resets to 0 when
    # the bucket would cross the end, overwriting the oldest rows
    assert int(pool.fill) == 200
    ts_vals = np.asarray(pool.ts[: int(pool.fill)])
    assert (ts_vals == 2).all()  # frame 2 overwrote frames 0 and 1


def test_fast_path_matches_general():
    """The hoisted fast training path (_mapping_loop_fast) must produce the
    same trained features, decoder params, certainties and losses as the
    reference-shaped general path on identical inputs."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts

    rng = np.random.default_rng(3)
    mc = npts.MapConfig(
        capacity=1 << 12, local_capacity=1 << 11, hash_size=1 << 14,
        voxel_size=0.3, feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=50.0,
        travel_dist_window=250.0, weighted_first=True)
    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=256,
        bs_new_sample=32, iters=4, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1,
        sdf_scale=0.055, loss_weight_on=True, ekional_loss_on=True,
        weight_e=0.5, gradient_decimation=8, num_grad_step=0.06,
        surface_sample_range=0.25, semantic_on=False, color_on=False,
        weight_s=1.0, weight_i=1.0)

    pts = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((1500,), bool),
                            jnp.int32(0), travel, downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)

    pool = mp.init_pool(mcfg, 1)
    n = 1 << 11
    coords = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    labels = (rng.normal(size=n) * 0.1).astype(np.float32)
    pool = mp.pool_append(pool, mcfg, jnp.asarray(coords), jnp.asarray(coords),
                          jnp.asarray(labels),
                          jnp.ones((n,), jnp.float32), jnp.ones((n,), bool),
                          jnp.int32(0), jnp.zeros((n,), bool))

    params = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                geo=geo, sem=None, color=None)
    key = jax.random.PRNGKey(7)
    args = (params, mp.init_opt_state(mcfg, params), pool, mcfg, offsets, key,
            jnp.float32(1.0), jnp.asarray(False), jnp.asarray(False))

    lm_f, p_f, _, hist_f = mp._mapping_loop_fast(lm, mc, *args, num_iters=4)
    lm_g, p_g, _, hist_g = mp._mapping_loop_general(lm, mc, *args, num_iters=4)

    np.testing.assert_allclose(np.asarray(hist_f), np.asarray(hist_g),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p_f.features), np.asarray(p_g.features),
                               rtol=1e-4, atol=1e-6)
    for (Wf, bf), (Wg, bg) in list(zip(p_f.geo.hidden, p_g.geo.hidden)) + [
            (p_f.geo.out, p_g.geo.out)]:
        np.testing.assert_allclose(np.asarray(Wf), np.asarray(Wg), rtol=1e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(lm_f.certainties),
                               np.asarray(lm_g.certainties), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm_f.ts_update),
                               np.asarray(lm_g.ts_update))
