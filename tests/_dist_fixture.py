"""Shared deterministic fixture for the multi-process jax.distributed test:
both the parent (single-process, 8 fake devices) and the 2-process children
(4 fake devices each -> 8 global) build THIS map/pool and run THIS loop, so
their outputs are directly comparable.  Kept import-light: the child process
imports it after its own jax.distributed bring-up."""

import numpy as np


def run_mapping_step(mesh):
    """Build the fixture map/pool and run 2 DP training iterations over
    ``mesh``; returns (loss_hist ndarray, features ndarray)."""
    import jax
    import jax.numpy as jnp

    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.parallel import mesh as pmesh
    from pin_slam_tpu.slam import mapper as mp

    rng = np.random.default_rng(42)
    mc = npts.MapConfig(
        capacity=1 << 12, local_capacity=1 << 11, hash_size=1 << 14,
        voxel_size=0.3, feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=50.0,
        travel_dist_window=250.0)
    pts = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts),
                            jnp.ones((1500,), bool), jnp.int32(0), travel,
                            downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))

    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=256,
        bs_new_sample=32, iters=2, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1,
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

    loop = pmesh.make_sharded_mapping_loop(mesh, mc, mcfg, num_iters=2)
    _, p2, _, hist = loop(lm, params, mp.init_opt_state(mcfg, params), pool,
                          jax.random.PRNGKey(7), jnp.float32(1.0),
                          jnp.asarray(False))
    return np.asarray(hist), np.asarray(p2.features)
