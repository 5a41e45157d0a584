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