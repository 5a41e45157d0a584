"""Dilated candidate table: the one-gather kNN probe must reproduce the
hash-probe kNN (knn_search) on collision-free maps, and the pool-cached
training path built on it must match the legacy fast path numerically."""

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
        travel_dist_window=250.0, weighted_first=True,
        dilated_hash_size=1 << 15)
    pts = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((n,), bool),
                            jnp.int32(0), travel, downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    return mc, state, lm, offsets, travel


def test_dilated_knn_matches_hash_probe(rng):
    mc, state, lm, offsets, travel = _small_map(rng)
    dil = npts.build_dilated(lm, mc, offsets, travel)

    q = rng.uniform(-5, 5, size=(512, 3)).astype(np.float32)
    res = npts.dilated_knn(dil, mc, jnp.asarray(q), jnp.float32(0.0), 6)
    knn = npts.knn_search(lm, mc, jnp.asarray(q), offsets)

    # same neighbor SETS (global ids), allowing distance-tie permutations
    gid_hash = np.asarray(jnp.where(knn.lidx < mc.local_capacity,
                                    lm.indices[jnp.minimum(knn.lidx,
                                                           mc.local_capacity)], -1))
    gid_dil = np.asarray(jnp.where(res.valid, res.gidx, -1))
    n_mismatch = 0
    for a, b in zip(gid_hash, gid_dil):
        if set(a[a >= 0]) != set(b[b >= 0]):
            n_mismatch += 1
    # identical on a collision-free table
    assert n_mismatch == 0, f"{n_mismatch}/512 rows differ"

    # distances are exact
    pos = np.asarray(state.positions)
    gd = np.asarray(res.dist2)
    vv = np.asarray(res.valid)
    for i in range(0, 512, 37):
        for j in range(6):
            if vv[i, j]:
                d2 = np.sum((pos[gid_dil[i, j]] - q[i]) ** 2)
                np.testing.assert_allclose(gd[i, j], d2, rtol=1e-4)


def test_dilated_incremental_matches_rebuild(rng):
    """Scattering one frame's inserts incrementally must yield the same table
    entries as a full rebuild (modulo rows untouched by either)."""
    mc, state, lm, offsets, travel = _small_map(rng)
    dil = npts.build_dilated(lm, mc, offsets, travel)

    # insert a few fresh points, update incrementally
    newpts = rng.uniform(-5, 5, size=(64, 3)).astype(np.float32)
    state2, aux = npts.map_insert(state, mc, jnp.asarray(newpts),
                                  jnp.ones((64,), bool), jnp.int32(1), travel,
                                  downsample_table_size=1 << 15, return_aux=True)
    pos, gidx, trav, placed = aux
    dil_inc = npts._dilated_scatter(dil, mc, offsets, pos, gidx, trav, None,
                                    placed)
    lm2 = npts.build_local_map(state2, mc, jnp.zeros(3), jnp.int32(1), travel)
    dil_full = npts.build_dilated(lm2, mc, offsets, travel)

    # every probe over the union must agree
    q = np.vstack([newpts + rng.normal(0, 0.05, (64, 3)).astype(np.float32),
                   rng.uniform(-5, 5, size=(256, 3)).astype(np.float32)])
    r1 = npts.dilated_knn(dil_inc, mc, jnp.asarray(q), jnp.float32(0.0), 6)
    r2 = npts.dilated_knn(dil_full, mc, jnp.asarray(q), jnp.float32(0.0), 6)
    g1 = np.asarray(jnp.where(r1.valid, r1.gidx, -1))
    g2 = np.asarray(jnp.where(r2.valid, r2.gidx, -1))
    for a, b in zip(g1, g2):
        assert set(a[a >= 0]) == set(b[b >= 0])


def test_cached_training_matches_fast_path(rng):
    """mapping_loop_cached driven by append_knn caches must reproduce the
    legacy fast path (which re-probes and recomputes geometry per frame) on a
    fresh, deformation-free pool."""
    mc, state, lm, offsets, travel = _small_map(rng)
    dil = npts.build_dilated(lm, mc, offsets, travel)

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

    gidx, w, vecb = mp.append_knn(dil, mc, offsets, jnp.asarray(coords),
                                  jnp.float32(0.0))
    pool = mp.init_pool(mcfg, 1)
    pool = mp.pool_append(pool, mcfg, jnp.asarray(coords), jnp.asarray(coords),
                          jnp.asarray(labels), jnp.ones((n,), jnp.float32),
                          jnp.ones((n,), bool), jnp.int32(0),
                          jnp.zeros((n,), bool), knn_gidx=gidx, knn_w=w,
                          knn_vec=vecb)

    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)
    key = jax.random.PRNGKey(7)

    # legacy fast path (re-probes the local hash per frame)
    params_f = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                  geo=geo, sem=None, color=None)
    lm_f, p_f, _, hist_f = mp._mapping_loop_fast(
        lm, mc, params_f, mp.init_opt_state(mcfg, params_f), pool, mcfg,
        offsets, key, jnp.float32(1.0), jnp.asarray(False), jnp.asarray(False),
        num_iters=4)

    # cached path (certainty channel appended as column F)
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
