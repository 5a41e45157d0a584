"""Sharding tests on the 8-fake-device CPU mesh: the data-parallel query and
train step must produce the same numbers as the single-device path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.parallel import mesh as pmesh
from pin_slam_tpu.slam import mapper as mp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    mc = npts.MapConfig(
        capacity=1 << 13, local_capacity=1 << 12, hash_size=1 << 16, voxel_size=0.3,
        feature_dim=8, color_on=False, nn_k=6, max_valid_dist2=3.0 * (3 * 0.3) ** 2,
        local_map_radius=50.0, travel_dist_window=250.0, local_hash_size=1 << 16)
    pts = rng.uniform(-5, 5, size=(4096, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((4096,), bool),
                            jnp.int32(0), travel, downsample_table_size=1 << 16)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    count = int(lm.count)
    feats = rng.normal(size=(count, 8)).astype(np.float32) * 0.2
    lm = lm._replace(geo_features=lm.geo_features.at[:count].set(feats))
    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    q = rng.uniform(-4, 4, size=(1024, 3)).astype(np.float32)
    return mc, lm, geo, offsets, q


def test_sharded_query_matches_single_device(setup):
    mc, lm, geo, offsets, q = setup
    mesh = pmesh.make_mesh(8)
    query = pmesh.make_sharded_query(mesh, mc, offsets, 0.055)

    lm_r = pmesh.replicate_tree(mesh, lm)
    q_s = jax.device_put(jnp.asarray(q), pmesh.batch_sharded(mesh))
    sdf_sharded, nn_sharded = query(lm_r, geo, q_s)

    knn = npts.knn_search(lm, mc, jnp.asarray(q), offsets)
    feat, _, w, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), knn.lidx)
    sdf_single, _ = dec.blended_sdf(geo, feat, w, mc.weighted_first, 0.055)

    np.testing.assert_allclose(np.asarray(sdf_sharded), np.asarray(sdf_single),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nn_sharded), np.asarray(knn.nn_count))


def test_sharded_train_step_runs_and_reduces(setup):
    mc, lm, geo, offsets, q = setup
    mesh = pmesh.make_mesh(8)
    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=1024, bs_new_sample=0,
        iters=1, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1, sdf_scale=0.055,
        loss_weight_on=False, ekional_loss_on=False, weight_e=0.5,
        gradient_decimation=10, num_grad_step=0.06, surface_sample_range=0.25,
        semantic_on=False, color_on=False, weight_s=1.0, weight_i=1.0)
    step = pmesh.make_sharded_train_step(mesh, mc, mcfg, offsets)

    rng = np.random.default_rng(2)
    batch = pmesh.ShardedBatch(
        coord=jnp.asarray(q),
        sdf_label=jnp.asarray(rng.normal(size=(1024,)).astype(np.float32) * 0.1),
        weight=jnp.ones((1024,), jnp.float32),
        valid=jnp.ones((1024,), bool))
    params = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                geo=geo, sem=None, color=None)
    opt_state = mp.make_optimizer(mcfg).init(params)

    lm_r = pmesh.replicate_tree(mesh, lm)
    params_r = pmesh.replicate_tree(mesh, params)
    opt_r = pmesh.replicate_tree(mesh, opt_state)
    batch_s = pmesh.shard_batch(mesh, batch)

    losses = []
    for _ in range(5):
        params_r, opt_r, loss = step(lm_r, params_r, opt_r, batch_s)
        lm_r = lm_r._replace(geo_features=params_r.features)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # params stay replicated (single logical value)
    f = np.asarray(params_r.features)
    assert np.isfinite(f).all()

def test_sharded_mapping_loop_matches_single_device(rng):
    """The production cached mapping loop under shard_map DP (batch sharded,
    grads pmean'd) must train to near-identical params as an equivalent
    single-device run: with per-device batches stacked to the same TOTAL
    batch and the same per-device keys, the pmean'd gradient equals the
    mean-of-shards gradient, so the Adam trajectories agree to f32 tolerance."""
    import dataclasses

    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.parallel import mesh as pmesh
    from pin_slam_tpu.slam import mapper as mp

    n_dev = 4
    mc = npts.MapConfig(
        capacity=1 << 12, local_capacity=1 << 11, hash_size=1 << 14,
        voxel_size=0.3, feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=50.0,
        travel_dist_window=250.0)
    pts = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((1500,), bool),
                            jnp.int32(0), travel, downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))

    # eikonal OFF for exact agreement: its decimated stencil subset is the
    # first bs/decimation rows of each shard, which differs from the single-
    # device subset by construction (a documented DP semantics difference)
    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=256,
        bs_new_sample=32, iters=3, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1,
        sdf_scale=0.055, loss_weight_on=False, ekional_loss_on=False,
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
    L = mc.local_capacity
    featsC = jnp.concatenate([lm.geo_features,
                              jnp.zeros((L + 1, 1), jnp.float32)], axis=1)
    params = mp.TrainableParams(features=featsC, color_features=None,
                                geo=geo, sem=None, color=None)
    key = jax.random.PRNGKey(7)

    # DP run over 4 fake devices
    mesh = pmesh.make_mesh(n_dev)
    loop_dp = pmesh.make_sharded_mapping_loop(mesh, mc, mcfg, num_iters=3)
    lm_dp, p_dp, _, hist_dp = loop_dp(lm, params,
                                      mp.init_opt_state(mcfg, params), pool,
                                      key, jnp.float32(1.0), jnp.asarray(False))

    # single-device equivalent: same per-shard keys -> same total batch; the
    # reference loop samples with ONE key, so instead emulate the DP batch by
    # concatenating the per-device index draws
    import dataclasses as dc
    mcfg_shard = dc.replace(mcfg, bs=mcfg.bs // n_dev,
                            bs_new_sample=max(1, mcfg.bs_new_sample // n_dev))
    idx_parts = [
        mp._sample_batch_indices(jax.random.fold_in(key, d), pool, mcfg_shard,
                                 jnp.asarray(False), 3)
        for d in range(n_dev)]
    idx_all = jnp.concatenate(idx_parts, axis=1)        # (3, bs)

    # run the cached loop with the stitched batches by monkeypatching the
    # index sampler
    orig = mp._sample_batch_indices
    try:
        mp._sample_batch_indices = lambda *a, **k: idx_all
        lm_1, p_1, _, hist_1 = mp.mapping_loop_cached(
            lm, mc, params, mp.init_opt_state(mcfg, params), pool, mcfg,
            key, jnp.float32(1.0), jnp.asarray(False), num_iters=3,
            after_pgo=False)
    finally:
        mp._sample_batch_indices = orig

    # with all-valid equal-size shards, pmean of per-shard means == the
    # global mean exactly -> the Adam trajectories agree to f32 tolerance
    np.testing.assert_allclose(np.asarray(hist_dp), np.asarray(hist_1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_dp.features[:, :8]),
                               np.asarray(p_1.features[:, :8]),
                               rtol=1e-3, atol=2e-5)


def test_mesher_grid_query_sharded_matches(setup):
    """Mesher with dp_mesh: chunked grid queries ride the data axis and
    reproduce the single-device query exactly (VERDICT r3 next #7)."""
    mc, lm, geo, offsets, q = setup
    from pin_slam_tpu.slam.mesher import Mesher, MesherConfig

    mesh = pmesh.make_mesh(8)
    cfg = MesherConfig(mc_res_m=0.3, mesh_min_nn=6, min_cluster_vertices=0,
                       query_bucket=512)
    m_single = Mesher(cfg, mc, offsets)
    m_dp = Mesher(cfg, mc, offsets, dp_mesh=mesh)

    coords = np.asarray(q[:1000])          # non-multiple of bucket: pad path
    sdf1, nn1 = m_single.query_sdf_grid(lm, geo, 0.055, coords)
    sdf2, nn2 = m_dp.query_sdf_grid(lm, geo, 0.055, coords)
    np.testing.assert_allclose(sdf2, sdf1, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(nn2, nn1)
