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


# ----------------------------------------------------------------------
# live SlamSystem backend (tpu: map_shards > 1): the sharded-global /
# replicated-local-window path must reproduce the single-device run
# ----------------------------------------------------------------------


def _structured_seq(root, rng, n_frames=5):
    """Tiny KITTI-format sequence over a structured world (ground + wall +
    boxes) with GT poses — deterministic inputs for the parity run."""
    import os

    from pin_slam_tpu.dataset import io as pio

    os.makedirs(f"{root}/velodyne", exist_ok=True)
    pts = [np.column_stack([rng.uniform(-5, 15, 9000),
                            rng.uniform(-6, 6, 9000),
                            -1.0 + 0.02 * rng.standard_normal(9000)])]
    for sign in (-5.0, 5.0):
        pts.append(np.column_stack([rng.uniform(-5, 15, 6000),
                                    sign + 0.03 * rng.standard_normal(6000),
                                    rng.uniform(-1.0, 1.5, 6000)]))
    for bx in (0.0, 4.0, 8.0):
        pts.append(np.column_stack([bx + rng.uniform(-0.7, 0.7, 2000),
                                    2.5 + rng.uniform(-0.7, 0.7, 2000),
                                    rng.uniform(-1.0, 1.0, 2000)]))
    world = np.concatenate(pts).astype(np.float32)
    poses = []
    for f in range(n_frames):
        T = np.eye(4)
        T[0, 3] = 0.4 * f
        poses.append(T)
        local = world - T[:3, 3]
        d = np.linalg.norm(local, axis=1)
        sub = local[(d > 1.0) & (d < 12.0)]
        # modest density: frame-0 insert survivors must stay BELOW the
        # insert bucket on both paths (truncation refills dropped voxels at
        # different Gaussian sample positions on later frames — a real but
        # benign asymmetry that would swamp the parity check)
        sub = sub[rng.choice(len(sub), 1200, replace=False)]
        raw = np.concatenate([sub, np.ones((len(sub), 1), np.float32)], 1)
        raw.astype(np.float32).tofile(f"{root}/velodyne/{f:06d}.bin")
    pio.write_kitti_poses(f"{root}/poses.txt", np.stack(poses))
    return n_frames


def _run_slam(root, n_frames, map_shards):
    from pin_slam_tpu.config import Config
    from pin_slam_tpu.slam.pipeline import SlamSystem

    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.pose_path = f"{root}/poses.txt"
    cfg.track_on = False            # GT-driven: isolates the map/train path
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 1.0, 12.0
    cfg.map_capacity = 1 << 13      # roomy: neither path may hit the
    cfg.local_map_capacity = 1 << 12  # whole-bucket room guard
    cfg.buffer_size = 1 << 16       # generous hash: keep collision sets equal
    cfg.pool_capacity = 1 << 17
    cfg.downsample_hash_size = 1 << 16
    cfg.frame_bucket = 1 << 11
    cfg.bs, cfg.iters = 256, 3
    cfg.map_shards = map_shards
    cfg._derive()
    system = SlamSystem(cfg)
    from pin_slam_tpu.dataset.slam_dataset import SLAMDataset

    for i in range(n_frames):
        system.process_frame(system.dataset.preprocess_frame(i))
    return system


@pytest.mark.slow
def test_live_backend_matches_single_device(tmp_path, rng):
    """map_shards=2 (sharded global SoA + hash, merged local window) inserts
    the same point set and trains the same features as the single-device
    path, up to scatter-order f32 reassociation and hash-collision ties."""
    root = str(tmp_path / "seq")
    n = _structured_seq(root, rng)

    s1 = _run_slam(root, n, map_shards=1)
    s2 = _run_slam(root, n, map_shards=2)

    c1 = s1._map_count()
    c2 = s2._map_count()
    # per-shard hash tables are half-size, so collision-dropped inserts can
    # differ by a hair — not more (measured: ~1.1% on this scene)
    assert abs(c1 - c2) <= max(3, 0.02 * c1), (c1, c2)

    pos1 = np.asarray(s1.state.positions[:c1])
    f1 = np.asarray(s1.state.geo_features[:c1])
    from pin_slam_tpu.parallel import spatial as sp

    pos2, _, f2, _, _, _ = sp.gather_state_dense(
        s2.state, s2._spatial.smc, s2._spatial.n_map)

    # match points across the two runs by exact position (same insert set,
    # different buffer order), then compare trained features
    def keyed(pos):
        q = np.round(pos * 1e4).astype(np.int64)
        return q[:, 0] * (1 << 40) + q[:, 1] * (1 << 20) + q[:, 2]

    k1, k2 = keyed(pos1), keyed(pos2)
    common, i1, i2 = np.intersect1d(k1, k2, return_indices=True)
    assert len(common) >= 0.99 * min(c1, c2)

    # write-back invariant (the core new machinery): every merged-local-map
    # member's trained feature row must land EXACTLY on its owning shard's
    # global row — no tolerance (verified-zero on this scene)
    cnt = int(s2.lm.count)
    idx2 = np.asarray(s2.lm.indices[:cnt])
    lmf2 = np.asarray(s2.lm.geo_features[:cnt])
    id2row = {int(g): i for i, g in enumerate(
        np.asarray(sp.gather_state_dense(
            s2.state, s2._spatial.smc, s2._spatial.n_map)[4]))}
    rows2 = np.array([id2row[int(g)] for g in idx2])
    np.testing.assert_array_equal(f2[rows2], lmf2)

    # functional sanity: the trained SDF fields must agree to the level
    # co-training chaos allows.  A single local-hash collision tie breaking
    # differently (merged row order != insertion order) perturbs a few
    # samples' kNN, and through the shared decoder the two runs' fields
    # drift like two nets trained on one differing example — so this is a
    # gross-corruption gate, not a bitwise one (the bitwise gates are the
    # insert-set and write-back checks above)
    from pin_slam_tpu.models import decoder as dec

    q = rng.uniform([-4, -5, -1], [14, 5, 1], size=(2048, 3)).astype(np.float32)

    def sdf_of(sys_):
        knn = npts.knn_search(sys_.lm, sys_.mc, jnp.asarray(q), sys_.offsets)
        feat, _, w, _ = npts.interpolate_features(sys_.lm, sys_.mc,
                                                  jnp.asarray(q), knn.lidx)
        s, _ = dec.blended_sdf(sys_.geo_params, feat, w,
                               sys_.mc.weighted_first, sys_.sdf_scale)
        nn = np.asarray(jnp.sum(knn.lidx < sys_.mc.local_capacity, axis=-1))
        return np.asarray(s), nn

    s1v, nn1 = sdf_of(s1)
    s2v, nn2 = sdf_of(s2)
    both = (nn1 >= 3) & (nn2 >= 3)
    assert both.sum() > 500
    diff = np.abs(s1v[both] - s2v[both])
    assert np.median(diff) < 0.05, np.median(diff)
    assert np.quantile(diff, 0.9) < 0.2, np.quantile(diff, 0.9)

    # merged local map mirrors the single-device one
    assert abs(int(s1.lm.count) - int(s2.lm.count)) <= max(3, 0.01 * c1)

    # finalize path: densify + artifacts run without error
    import os

    run_path = str(tmp_path / "out")
    s2.config.save_map = True
    s2.config.save_mesh = False
    s2.save_artifacts(run_path)
    assert os.path.exists(os.path.join(run_path, "map", "pin_map.npz"))


@pytest.mark.slow
def test_pgo_deformation_matches_single_device(tmp_path, rng):
    """Sharded PGO elastic deformation (VERDICT r4 next #5): after a forced
    pose-graph correction, the per-shard adjust + rehash + merged-window
    refresh must produce the same deformed point set as the single-device
    adjust_map/recreate_hash (positions exact up to f32 transform
    reassociation; membership modulo per-shard hash-collision ties)."""
    import jax.numpy as jnp

    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.parallel import spatial as sp

    root = str(tmp_path / "seq")
    n = _structured_seq(root, rng)
    s1 = _run_slam(root, n, map_shards=1)
    s2 = _run_slam(root, n, map_shards=2)

    # a bent trajectory correction: frame ts t moves by (0.02*t) m in x plus
    # a small yaw about the origin — exercises both R and t of adjust_map
    T = 1 << 16
    diff = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    for t in range(n):
        a = 0.003 * t
        diff[t, 0, 0] = diff[t, 1, 1] = np.cos(a)
        diff[t, 0, 1], diff[t, 1, 0] = -np.sin(a), np.sin(a)
        diff[t, 0, 3] = 0.02 * t
    diff_j = jnp.asarray(diff)

    st1 = npts.adjust_map(s1.state, s1.mc, diff_j)
    st1 = npts.recreate_hash(st1, s1.mc, jnp.int32(n - 1),
                             downsample_table_size=1 << 16)
    st2 = s2._spatial.adjust(s2.state, diff_j)
    st2 = s2._spatial.recreate(st2, jnp.int32(n - 1))

    c1 = int(st1.count)
    pos1 = np.asarray(st1.positions[:c1])
    pos2, _, _, _, _, c2 = sp.gather_state_dense(
        st2, s2._spatial.smc, s2._spatial.n_map)
    assert abs(c1 - c2) <= max(3, 0.02 * c1), (c1, c2)

    def keyed(pos):
        q = np.round(pos * 1e4).astype(np.int64)
        return q[:, 0] * (1 << 40) + q[:, 1] * (1 << 20) + q[:, 2]

    common = np.intersect1d(keyed(pos1), keyed(pos2))
    assert len(common) >= 0.99 * min(c1, c2)

    # the deformation actually moved the map (not a no-op test)
    pos1_before = np.asarray(s1.state.positions[:c1])
    assert np.abs(pos1 - pos1_before).max() > 0.01

    # merged window after deformation stays trainable-coherent: slms + merged
    # extract at the corrected pose agree on the member count
    origin = jnp.asarray(pos2.mean(axis=0).astype(np.float32))
    slms, lm2 = s2._spatial.extract(st2, origin, jnp.int32(n - 1), s2._travel)
    per_shard = int(np.asarray(slms.count).sum())
    assert int(lm2.count) == min(per_shard, lm2.indices.shape[0] - 1)


def test_pgo_on_with_map_shards_constructs(tmp_path, rng):
    """pgo_on=True + map_shards=2 is no longer rejected (the r4 v1
    restriction); BA under sharding still is."""
    import pytest as _pytest

    from pin_slam_tpu.config import Config
    from pin_slam_tpu.slam.pipeline import SlamSystem

    cfg = Config()
    cfg.pgo_on = True
    cfg.map_capacity = 1 << 12
    cfg.local_map_capacity = 1 << 11
    cfg.buffer_size = 1 << 14
    cfg.pool_capacity = 1 << 14
    cfg.downsample_hash_size = 1 << 14
    cfg.frame_bucket = 1 << 10
    cfg.source_bucket = 1 << 9
    cfg.map_shards = 2
    cfg._derive()
    SlamSystem(cfg)                      # must not raise

    cfg.ba_freq_frame = 20
    with _pytest.raises(ValueError, match="ba_freq_frame"):
        SlamSystem(cfg)
