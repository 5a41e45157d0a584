"""weighted_first=False TRAINING path in the cached production loop: decode
each neighbor with its own feature + offset vector, blend the k SDF
predictions by IDW (ref utils/config.py:89, model/neural_points.py:660-665).
The run_kitti profile ships this mode; previously the cached loop silently
trained weighted-first (PARITY known gap, now closed for the geo head)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.slam import mapper as mp


def _setup(rng, weighted_first):
    mc = npts.MapConfig(
        capacity=1 << 12, local_capacity=1 << 11, hash_size=1 << 14,
        voxel_size=0.3, feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=50.0,
        travel_dist_window=250.0, weighted_first=weighted_first)
    pts = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((1500,), bool),
                            jnp.int32(0), travel, downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))

    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=512,
        bs_new_sample=32, iters=3, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1,
        sdf_scale=0.055, loss_weight_on=False, ekional_loss_on=True,
        weight_e=0.5, gradient_decimation=8, num_grad_step=0.06,
        surface_sample_range=0.25, semantic_on=False, color_on=False,
        weight_s=1.0, weight_i=1.0, weighted_first=weighted_first)
    assert mcfg.pool_dim == (24 if weighted_first else 24 + 18)

    n = 1 << 11
    coords = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    labels = (rng.normal(size=n) * 0.1).astype(np.float32)
    out = mp.append_knn(lm, mc, offsets, jnp.asarray(coords),
                        ray_sample_count=1, near_count=1,
                        per_neighbor_vecs=not weighted_first)
    gidx, w, vecb = out[:3]
    nvec = out[3] if len(out) == 4 else None
    pool = mp.init_pool(mcfg, 1)
    pool = mp.pool_append(pool, mcfg, jnp.asarray(coords), jnp.asarray(coords),
                          jnp.asarray(labels), jnp.ones((n,), jnp.float32),
                          jnp.ones((n,), bool), jnp.int32(0),
                          jnp.zeros((n,), bool), knn_gidx=gidx, knn_w=w,
                          knn_vec=vecb, knn_nbr_vec=nvec)
    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)
    L = mc.local_capacity
    featsC = jnp.concatenate([0.05 * jax.random.normal(
        jax.random.PRNGKey(2), (L + 1, 8)), jnp.zeros((L + 1, 1))], axis=1)
    featsC = featsC.at[L].set(0.0)
    params = mp.TrainableParams(features=featsC, color_features=None,
                                geo=geo, sem=None, color=None)
    return mc, mcfg, lm, pool, offsets, params, coords


def test_per_neighbor_loss_matches_manual(rng):
    """First-iteration loss of the cached loop (weighted_first=False) must
    equal a hand-rolled per-neighbor decode from the same pool rows."""
    mc, mcfg, lm, pool, offsets, params, _ = _setup(rng, weighted_first=False)
    key = jax.random.PRNGKey(7)
    _, _, _, hist = mp.mapping_loop_cached(
        lm, mc, params, mp.init_opt_state(mcfg, params), pool, mcfg, key,
        jnp.float32(1.0), jnp.asarray(False), num_iters=1, after_pgo=False)

    # manual: same batch indices, same cached geometry
    idx = mp._sample_batch_indices(key, pool, mcfg, jnp.asarray(False), 1)[0]
    rows = pool.rows[idx]
    VD = mcfg.vec_dim
    gidx = rows[:, mp.P_KNN].astype(jnp.int32)
    rank = jnp.cumsum(lm.member_mask.astype(jnp.int32)) - 1
    local_of = jnp.where(lm.member_mask, jnp.minimum(rank, mc.local_capacity),
                         mc.local_capacity)
    lidx = local_of[jnp.where(gidx >= 0, jnp.minimum(gidx, mc.capacity),
                              mc.capacity)]
    valid_k = (gidx >= 0) & (lidx < mc.local_capacity)
    safe = jnp.where(valid_k, lidx, mc.local_capacity)
    w = jnp.where(valid_k, rows[:, mp.P_W], 0.0)
    nvec = rows[:, mp.P_VEC0 + VD:].reshape(-1, 6, VD)
    feats = params.features[safe][..., :8]
    sdf_k = dec.sdf(params.geo, jnp.concatenate([feats, nvec], -1),
                    mcfg.sdf_scale)
    pred = jnp.sum(sdf_k * w, axis=-1)
    in_pool = (idx < pool.fill) & (rows[:, mp.P_TS] >= 0.0)
    from pin_slam_tpu.ops import losses

    bce = losses.sdf_bce_loss(pred, rows[:, mp.P_LABEL], mcfg.sigma_sigmoid,
                              jnp.abs(rows[:, mp.P_WEIGHT]),
                              mcfg.loss_weight_on, valid=in_pool)
    # eikonal contributes too; compare only that the BCE part dominates and
    # the full loss is within the eikonal weight envelope of the manual BCE
    assert np.isfinite(float(hist[0]))
    assert abs(float(hist[0]) - float(bce)) < mcfg.weight_e * 2.0 + 0.05

    # and the two interpolation modes genuinely differ (nonlinear decoder)
    mc_w, mcfg_w, lm_w, pool_w, _, params_w, _ = _setup(
        np.random.default_rng(42), weighted_first=True)
    _, _, _, hist_w = mp.mapping_loop_cached(
        lm_w, mc_w, params_w, mp.init_opt_state(mcfg_w, params_w), pool_w,
        mcfg_w, key, jnp.float32(1.0), jnp.asarray(False), num_iters=1,
        after_pgo=False)
    assert abs(float(hist_w[0]) - float(hist[0])) > 1e-6


def test_per_neighbor_exact_bce_no_eik(rng):
    """With eikonal off the match must be exact (same floats)."""
    mc, mcfg, lm, pool, offsets, params, _ = _setup(rng, weighted_first=False)
    mcfg = dataclasses.replace(mcfg, ekional_loss_on=False)
    key = jax.random.PRNGKey(3)
    _, p2, _, hist = mp.mapping_loop_cached(
        lm, mc, params, mp.init_opt_state(mcfg, params), pool, mcfg, key,
        jnp.float32(1.0), jnp.asarray(False), num_iters=3, after_pgo=False)

    idx = mp._sample_batch_indices(key, pool, mcfg, jnp.asarray(False), 3)[0]
    rows = pool.rows[idx]
    VD = mcfg.vec_dim
    gidx = rows[:, mp.P_KNN].astype(jnp.int32)
    rank = jnp.cumsum(lm.member_mask.astype(jnp.int32)) - 1
    local_of = jnp.where(lm.member_mask, jnp.minimum(rank, mc.local_capacity),
                         mc.local_capacity)
    lidx = local_of[jnp.where(gidx >= 0, jnp.minimum(gidx, mc.capacity),
                              mc.capacity)]
    valid_k = (gidx >= 0) & (lidx < mc.local_capacity)
    safe = jnp.where(valid_k, lidx, mc.local_capacity)
    w = jnp.where(valid_k, rows[:, mp.P_W], 0.0)
    nvec = rows[:, mp.P_VEC0 + VD:].reshape(-1, 6, VD)
    feats = params.features[safe][..., :8]
    sdf_k = dec.sdf(params.geo, jnp.concatenate([feats, nvec], -1),
                    mcfg.sdf_scale)
    pred = jnp.sum(sdf_k * w, axis=-1)
    in_pool = (idx < pool.fill) & (rows[:, mp.P_TS] >= 0.0)
    from pin_slam_tpu.ops import losses

    bce = losses.sdf_bce_loss(pred, rows[:, mp.P_LABEL], mcfg.sigma_sigmoid,
                              jnp.abs(rows[:, mp.P_WEIGHT]),
                              mcfg.loss_weight_on, valid=in_pool)
    np.testing.assert_allclose(float(hist[0]), float(bce), rtol=1e-5)
    # training moves the loss down across the 3 iterations
    assert float(hist[-1]) < float(hist[0])
    assert np.isfinite(np.asarray(p2.features)).all()


def test_per_neighbor_sem_color_heads_exact(rng):
    """Per-neighbor sem/color heads under weighted_first=False (ref
    model/neural_points.py:660-665 applies to EVERY head): decode each
    neighbor with its own feature + offset vector, blend the k log-probs /
    colors by IDW.  Exact-float check of the cached loop's first-iteration
    loss against a hand-rolled reference (eikonal off)."""
    mc = npts.MapConfig(
        capacity=1 << 12, local_capacity=1 << 11, hash_size=1 << 14,
        voxel_size=0.3, feature_dim=8, color_on=True, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=50.0,
        travel_dist_window=250.0, weighted_first=False)
    pts = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts),
                            jnp.ones((1500,), bool), jnp.int32(0), travel,
                            downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    lm = lm._replace(color_features=0.05 * jax.random.normal(
        jax.random.PRNGKey(5), lm.color_features.shape))
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))

    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=512,
        bs_new_sample=32, iters=1, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1,
        sdf_scale=0.055, loss_weight_on=False, ekional_loss_on=False,
        weight_e=0.5, gradient_decimation=8, num_grad_step=0.06,
        surface_sample_range=0.25, semantic_on=True, color_on=True,
        weight_s=1.0, weight_i=1.0, weighted_first=False)

    n = 1 << 11
    coords = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    labels = (rng.normal(size=n) * 0.05).astype(np.float32)
    sem_lab = rng.integers(0, 20, size=n).astype(np.int32)
    col_lab = rng.uniform(0, 1, size=(n, 1)).astype(np.float32)
    out = mp.append_knn(lm, mc, offsets, jnp.asarray(coords),
                        ray_sample_count=1, near_count=1,
                        per_neighbor_vecs=True)
    gidx, w, vecb, nvec = out[:4]
    pool = mp.init_pool(mcfg, 1)
    pool = mp.pool_append(pool, mcfg, jnp.asarray(coords), jnp.asarray(coords),
                          jnp.asarray(labels), jnp.ones((n,), jnp.float32),
                          jnp.ones((n,), bool), jnp.int32(0),
                          jnp.zeros((n,), bool), jnp.asarray(sem_lab),
                          jnp.asarray(col_lab), gidx, w, vecb,
                          knn_nbr_vec=nvec)
    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)
    sem = dec.init_decoder(jax.random.PRNGKey(2), 11, 64, 1, 20)
    col = dec.init_decoder(jax.random.PRNGKey(3), 11, 64, 1, 1)
    L = mc.local_capacity
    featsC = jnp.concatenate([0.05 * jax.random.normal(
        jax.random.PRNGKey(4), (L + 1, 8)), jnp.zeros((L + 1, 1))], -1)
    featsC = featsC.at[L].set(0.0)
    params = mp.TrainableParams(features=featsC,
                                color_features=lm.color_features,
                                geo=geo, sem=sem, color=col)
    key = jax.random.PRNGKey(9)
    _, _, _, hist = mp.mapping_loop_cached(
        lm, mc, params, mp.init_opt_state(mcfg, params), pool, mcfg, key,
        jnp.float32(1.0), jnp.asarray(False), num_iters=1, after_pgo=False)

    # manual per-neighbor reference from the same pool rows
    idx = mp._sample_batch_indices(key, pool, mcfg, jnp.asarray(False), 1)[0]
    rows = pool.rows[idx]
    VD = mcfg.vec_dim
    gidx_b = rows[:, mp.P_KNN].astype(jnp.int32)
    rank = jnp.cumsum(lm.member_mask.astype(jnp.int32)) - 1
    local_of = jnp.where(lm.member_mask, jnp.minimum(rank, L), L)
    lidx = local_of[jnp.where(gidx_b >= 0, jnp.minimum(gidx_b, mc.capacity),
                              mc.capacity)]
    valid_k = (gidx_b >= 0) & (lidx < L)
    safe = jnp.where(valid_k, lidx, L)
    wk = jnp.where(valid_k, rows[:, mp.P_W], 0.0)
    nv = rows[:, mcfg.pool_dim - 6 * VD:].reshape(-1, 6, VD)
    feats = params.features[safe][..., :8]
    per_in = jnp.concatenate([feats, nv], -1)
    pred = jnp.sum(dec.sdf(params.geo, per_in, mcfg.sdf_scale) * wk, -1)
    in_pool = (idx < pool.fill) & (rows[:, mp.P_TS] >= 0.0)
    from pin_slam_tpu.ops import losses

    loss_ref = losses.sdf_bce_loss(pred, rows[:, mp.P_LABEL],
                                   mcfg.sigma_sigmoid,
                                   jnp.abs(rows[:, mp.P_WEIGHT]),
                                   mcfg.loss_weight_on, valid=in_pool)
    sem_k = dec.sem_label_prob(params.sem, per_in)           # (B,k,20)
    sem_logp = jnp.einsum("bk,bks->bs", wk, sem_k)
    slab = pool.sem_label[idx]
    sem_valid = in_pool & (slab > 0)
    loss_ref = loss_ref + mcfg.weight_s * losses.sem_nll_loss(
        sem_logp, slab, valid=sem_valid)
    cf = params.color_features[safe]
    col_k = dec.regress_color(params.color, jnp.concatenate([cf, nv], -1))
    col_pred = jnp.einsum("bk,bkc->bc", wk, col_k)
    surf = in_pool & (jnp.abs(rows[:, mp.P_LABEL]) < mcfg.surface_sample_range)
    loss_ref = loss_ref + mcfg.weight_i * losses.color_diff_loss(
        col_pred, pool.color_label[idx], jnp.abs(rows[:, mp.P_WEIGHT]),
        mcfg.loss_weight_on, valid=surf)
    np.testing.assert_allclose(float(hist[0]), float(loss_ref), rtol=1e-5)
