"""Spatially-sharded map (parallel/spatial.py): insert ownership, query
equivalence vs the single-device path, and gradient flow through the
candidate all_gather — on a 2x4 fake-device mesh (SURVEY.md section 2.4
item 2: shard points + hash slots across devices)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops import losses
from pin_slam_tpu.parallel import spatial as sp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _mc(**kw):
    base = dict(capacity=4096, local_capacity=4096, hash_size=1 << 16,
                voxel_size=0.3, feature_dim=8, color_on=False, nn_k=6,
                max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=1e5,
                travel_dist_window=1e8, local_hash_size=1 << 16)
    base.update(kw)
    return npts.MapConfig(**base)


def _grid_points(rng, n, voxel=0.3):
    """One point per voxel, jittered inside the voxel: no dedup ambiguity, so
    the sharded and single-device inserts keep exactly the same point set."""
    side = int(np.ceil(n ** (1 / 3)))
    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                     axis=-1).reshape(-1, 3)[:n]
    return ((cells + 0.2 + 0.6 * rng.random((n, 3))) * voxel).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    mc = _mc()
    mesh = sp.make_mesh2d(2, 4)
    smc = sp.shard_config(mc, 4)
    n = 1500
    pts = _grid_points(rng, n, mc.voxel_size)
    travel = jnp.zeros((64,), jnp.float32)
    valid = jnp.ones((n,), bool)

    # single-device map + "global view" local map
    state1 = npts.map_insert(npts.init_map_state(mc), mc, jnp.asarray(pts),
                             valid, jnp.int32(0), travel,
                             downsample_table_size=1 << 15)
    lm1 = npts.build_local_map(state1, mc, jnp.zeros(3), jnp.int32(0), travel)

    # sharded map
    sstate = sp.init_sharded_map(mesh, smc)
    insert = sp.make_sharded_insert(mesh, smc, downsample_table_size=1 << 15)
    sstate = insert(sstate, sp.put_replicated(mesh, jnp.asarray(pts)),
                    sp.put_replicated(mesh, valid),
                    sp.put_replicated(mesh, jnp.int32(0)),
                    sp.put_replicated(mesh, travel))

    offsets = npts.neighbor_offsets(2, 0.2)
    geo = dec.init_decoder(jax.random.PRNGKey(3), mc.feature_dim + 3, 32, 1, 1)
    # non-trivial features so the SDF comparison is meaningful
    feats = 0.1 * jax.random.normal(jax.random.PRNGKey(4),
                                    state1.geo_features.shape)
    active1 = (jnp.arange(mc.capacity + 1) < state1.count)[:, None]
    state1 = state1._replace(geo_features=jnp.where(active1, feats, 0.0))
    lm1 = npts.build_local_map(state1, mc, jnp.zeros(3), jnp.int32(0), travel)

    # mirror the same per-point features into the sharded map (match rows by
    # position via the shard's hash table)
    def fill_shard(shard_state):
        pos = shard_state.attr_rows[:, npts.C_POS]
        # nearest single-device row for each shard row (exact match by voxel)
        h = jnp.asarray(
            npts.spatial_hash(npts.grid_coords(pos, mc.voxel_size), mc.hash_size))
        gidx = state1.hash_table[h]
        src = state1.geo_features[gidx]
        active = (jnp.arange(shard_state.attr_rows.shape[0])
                  < shard_state.count)[:, None]
        return shard_state._replace(geo_features=jnp.where(active, src, 0.0))

    sstate_host = jax.device_get(sstate)
    filled = [fill_shard(jax.tree.map(lambda x, i=i: jnp.asarray(x[i]), sstate_host))
              for i in range(4)]
    sstate = jax.tree.map(
        lambda *xs: jax.device_put(jnp.stack(xs), sp._map_sharding(mesh)),
        *filled)

    queries = (pts[rng.choice(n, 512, replace=False)]
               + rng.normal(0, 0.15, (512, 3))).astype(np.float32)
    return dict(mc=mc, smc=smc, mesh=mesh, state1=state1, lm1=lm1,
                sstate=sstate, offsets=offsets, geo=geo,
                queries=queries, travel=travel)


def test_insert_counts_match(setup):
    total = int(jnp.sum(setup["sstate"].count))
    assert total == int(setup["state1"].count) == 1500


def test_insert_ownership(setup):
    """Every shard holds only points whose voxel it owns."""
    sstate = jax.device_get(setup["sstate"])
    smc = setup["smc"]
    for s in range(4):
        cnt = int(sstate.count[s])
        pos = np.asarray(sstate.attr_rows[s, :cnt, npts.C_POS])
        own = np.asarray(sp.shard_of(
            npts.grid_coords(jnp.asarray(pos), smc.voxel_size), 4))
        assert (own == s).all()


def test_query_matches_single_device(setup):
    mc, smc, mesh = setup["mc"], setup["smc"], setup["mesh"]
    offsets, geo = setup["offsets"], setup["geo"]
    q = jnp.asarray(setup["queries"])

    knn = npts.knn_search(setup["lm1"], mc, q, jnp.asarray(offsets))
    feat, _, w, _ = npts.interpolate_features(setup["lm1"], mc, q, knn.lidx)
    sdf1, _ = dec.blended_sdf(geo, feat, w, mc.weighted_first, 0.055)

    query = sp.make_spatial_query(mesh, smc, offsets, 0.055)
    sdf2, nn2 = query(setup["sstate"], sp.put_replicated(mesh, geo),
                      sp.put_data_sharded(mesh, q),
                      sp.put_replicated(mesh, jnp.float32(0.0)))

    np.testing.assert_allclose(np.asarray(sdf2), np.asarray(sdf1),
                               rtol=1e-4, atol=1e-5)
    # the sharded path counts candidates per shard with per-shard hash tables;
    # collision sets can differ slightly, but the neighbor counts must agree
    # for the overwhelming majority of queries
    nn1 = np.asarray(knn.nn_count)
    assert (np.asarray(nn2) == nn1).mean() > 0.97


def test_train_step_learns_and_matches_decoder_grads(setup):
    mc, smc, mesh = setup["mc"], setup["smc"], setup["mesh"]
    offsets, geo = setup["offsets"], setup["geo"]
    q = setup["queries"]
    B = q.shape[0]
    rng = np.random.default_rng(11)
    labels = rng.normal(0, 0.05, (B,)).astype(np.float32)

    batch = sp.SpatialBatch(
        coord=jnp.asarray(q), sdf_label=jnp.asarray(labels),
        weight=jnp.ones((B,), jnp.float32), valid=jnp.ones((B,), bool),
        travel_now=jnp.float32(0.0))
    batch = sp.shard_spatial_batch(mesh, batch)

    step, opt = sp.make_spatial_train_step(
        mesh, smc, offsets, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1,
        sdf_scale=0.055, loss_weight_on=False)

    tr = sp.SpatialTrainables(features=setup["sstate"].geo_features,
                              geo=sp.put_replicated(mesh, geo))
    opt_state = opt.init(tr)

    # reference loss/grad on the single-device path
    def loss1(geo_params, feats):
        lm = setup["lm1"]._replace(geo_features=feats)
        knn = npts.knn_search(lm, mc, jnp.asarray(q), jnp.asarray(offsets))
        f, _, w, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), knn.lidx)
        pred, _ = dec.blended_sdf(geo_params, f, w, mc.weighted_first, 0.055)
        return losses.sdf_bce_loss(pred, jnp.asarray(labels), 0.1)

    l1, (g1_geo, g1_feat) = jax.value_and_grad(loss1, argnums=(0, 1))(
        geo, setup["lm1"].geo_features)

    # exact feature-gradient routing: grad through the sharded query must
    # equal the single-device feature gradient, row-matched by position
    query = sp.make_spatial_query(mesh, smc, offsets, 0.055)
    geo_rep = sp.put_replicated(mesh, geo)
    q_sh = sp.put_data_sharded(mesh, jnp.asarray(q))

    def loss_sp(feats):
        sst = setup["sstate"]._replace(geo_features=feats)
        pred, _ = query(sst, geo_rep, q_sh, jnp.float32(0.0))
        return losses.sdf_bce_loss(pred, jnp.asarray(labels), 0.1)

    lsp, g2 = jax.value_and_grad(loss_sp)(setup["sstate"].geo_features)
    np.testing.assert_allclose(float(lsp), float(l1), rtol=1e-5)
    g2 = np.asarray(jax.device_get(g2))
    state1, mc1 = setup["state1"], setup["mc"]
    lm_g2l = npts.compute_global2local(setup["lm1"])
    g1f = np.asarray(g1_feat)
    sstate_h = jax.device_get(setup["sstate"])
    for s in range(4):
        cnt = int(sstate_h.count[s])
        pos = jnp.asarray(np.asarray(sstate_h.attr_rows[s, :cnt, npts.C_POS]))
        h = npts.spatial_hash(npts.grid_coords(pos, mc1.voxel_size), mc1.hash_size)
        gidx = np.asarray(state1.hash_table)[np.asarray(h)]
        lidx = lm_g2l[gidx]
        np.testing.assert_allclose(g2[s, :cnt], g1f[lidx], rtol=1e-4, atol=1e-7)

    losses_hist = []
    for _ in range(15):
        tr, opt_state, loss = step(setup["sstate"], tr, opt_state, batch)
        losses_hist.append(float(loss))

    # first-step loss equals the single-device loss; decoder grads follow
    np.testing.assert_allclose(losses_hist[0], float(l1), rtol=1e-4)
    assert losses_hist[-1] < losses_hist[0]
    assert np.isfinite(losses_hist).all()

    # feature updates land ONLY on active rows of each shard
    dfeat = np.asarray(jax.device_get(tr.features)) \
        - np.asarray(jax.device_get(setup["sstate"].geo_features))
    counts = np.asarray(jax.device_get(setup["sstate"].count))
    for s in range(4):
        assert np.abs(dfeat[s, int(counts[s]):-1]).max() == 0.0
