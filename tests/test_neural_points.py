"""Unit tests for the neural point map: insert, local map, kNN query, IDW
interpolation — checked against brute-force numpy implementations of the
reference semantics (model/neural_points.py:205-674)."""

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.models import neural_points as npts


def small_config(**kw):
    defaults = dict(
        capacity=4096, local_capacity=1024, hash_size=1 << 16, voxel_size=0.3,
        feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * ((2 + 1) * 0.3) ** 2,
        local_map_radius=50.0, travel_dist_window=250.0,
    )
    defaults.update(kw)
    return npts.MapConfig(**defaults)


def make_map(mc, points, rng=None, cur_ts=0):
    """Insert a point cloud and build the local map around the origin."""
    state = npts.init_map_state(mc)
    n = points.shape[0]
    valid = jnp.ones((n,), dtype=bool)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.map_insert(state, mc, jnp.asarray(points), valid, jnp.int32(cur_ts), travel,
                            downsample_table_size=1 << 16)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(cur_ts), travel)
    return state, lm, travel


def test_insert_one_point_per_voxel(rng):
    mc = small_config()
    pts = rng.uniform(-5, 5, size=(800, 3)).astype(np.float32)
    state, lm, _ = make_map(mc, pts)
    count = int(state.count)
    kept = np.asarray(state.positions[:count])
    grid = np.floor(kept / mc.voxel_size).astype(np.int64)
    assert len({tuple(g) for g in grid}) == count
    # every input voxel is represented
    in_vox = {tuple(g) for g in np.floor(pts / mc.voxel_size).astype(np.int64)}
    assert count >= 0.97 * len(in_vox)  # tiny loss from hash collisions allowed
    # local map holds all of them (origin-centered, radius 50)
    assert int(lm.count) == count


def test_insert_is_idempotent_same_frame(rng):
    """Re-inserting the same cloud must not duplicate points
    (ref model/neural_points.py:221-231 update_mask semantics)."""
    mc = small_config()
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    state, _, travel = make_map(mc, pts)
    c1 = int(state.count)
    valid = jnp.ones((500,), dtype=bool)
    state2 = npts.map_insert(state, mc, jnp.asarray(pts), valid, jnp.int32(1), travel,
                             downsample_table_size=1 << 16)
    assert int(state2.count) == c1


def test_insert_respects_capacity(rng):
    mc = small_config(capacity=64)
    pts = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    state, _, _ = make_map(mc, pts)
    assert int(state.count) == 64
    assert np.isfinite(np.asarray(state.positions[:64])).all()
    # sentinel row intact
    assert float(state.positions[64, 0]) == 1e8


def test_local_map_radius_filter(rng):
    mc = small_config(local_map_radius=5.0)
    near = rng.uniform(-2, 2, size=(100, 3)).astype(np.float32)
    far = rng.uniform(20, 30, size=(100, 3)).astype(np.float32)
    state, lm, _ = make_map(mc, np.vstack([near, far]))
    count_local = int(lm.count)
    gpos = np.asarray(state.positions[: int(state.count)])
    expect = (np.linalg.norm(gpos, axis=1) < 5.0).sum()
    assert count_local == expect
    # member-mask/rank roundtrip (the rank of a member row in member_mask IS
    # its local row — assign_local_to_global relies on this)
    g2l = npts.compute_global2local(lm)
    lidx = np.asarray(lm.indices)
    for li in range(count_local):
        assert g2l[lidx[li]] == li


def brute_force_query(map_pts, map_feats, q, k, max_valid_dist2, offsets, voxel_size):
    """Reference query semantics: candidate set = points within the offset
    template's voxels; top-k by distance; IDW 1/(d2+eps)."""
    out_feat = np.zeros((q.shape[0], map_feats.shape[1] + 3), dtype=np.float64)
    nn_counts = np.zeros(q.shape[0], dtype=int)
    grid_map = {}
    for i, g in enumerate(np.floor(map_pts / voxel_size).astype(np.int64)):
        grid_map.setdefault(tuple(g), []).append(i)
    for n, p in enumerate(q):
        g0 = np.floor(p / voxel_size).astype(np.int64)
        cand = []
        for off in offsets:
            cand += grid_map.get(tuple(g0 + off), [])
        cand = np.asarray(sorted(set(cand)), dtype=int)
        if cand.size == 0:
            continue
        d2 = ((map_pts[cand] - p) ** 2).sum(1)
        ok = d2 <= max_valid_dist2
        cand, d2 = cand[ok], d2[ok]
        nn_counts[n] = cand.size
        if cand.size == 0:
            continue
        order = np.argsort(d2)[:k]
        cand, d2 = cand[order], d2[order]
        w = 1.0 / (d2 + 1e-15)
        w = w / w.sum()
        vec = p - map_pts[cand]
        fv = np.concatenate([map_feats[cand], vec], axis=1)
        out_feat[n] = (fv * w[:, None]).sum(0)
    return out_feat, nn_counts


def test_query_matches_bruteforce(rng):
    mc = small_config()
    pts = rng.uniform(-4, 4, size=(600, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    count = int(state.count)
    feats = rng.normal(size=(count, mc.feature_dim)).astype(np.float32) * 0.1

    # install non-trivial features in both global + local tables
    gfeat = np.zeros((mc.capacity + 1, mc.feature_dim), np.float32)
    gfeat[:count] = feats
    state = state._replace(geo_features=jnp.asarray(gfeat))
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)

    offsets = npts.neighbor_offsets(2, 0.2)
    q = rng.uniform(-3.5, 3.5, size=(64, 3)).astype(np.float32)
    res = npts.knn_search(lm, mc, jnp.asarray(q), jnp.asarray(offsets))
    geo, _, w, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), res.lidx)

    map_pts = np.asarray(state.positions[:count])
    expect_feat, expect_counts = brute_force_query(
        map_pts, feats, q, mc.nn_k, mc.max_valid_dist2, offsets, mc.voxel_size)

    got_counts = np.asarray(res.nn_count)
    # hash collisions can very rarely drop a candidate; demand near-exact agreement
    assert (got_counts == expect_counts).mean() >= 0.97
    match = got_counts == expect_counts
    np.testing.assert_allclose(np.asarray(geo)[match], expect_feat[match], rtol=2e-3, atol=2e-4)


def test_query_weights_normalized(rng):
    mc = small_config()
    pts = rng.uniform(-3, 3, size=(400, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    offsets = npts.neighbor_offsets(2, 0.2)
    q = rng.uniform(-2, 2, size=(32, 3)).astype(np.float32)
    res = npts.knn_search(lm, mc, jnp.asarray(q), jnp.asarray(offsets))
    _, _, w, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), res.lidx)
    w = np.asarray(w)
    has_nbr = np.asarray(res.nn_count) > 0
    np.testing.assert_allclose(w[has_nbr].sum(1), 1.0, atol=1e-5)
    # far-away query: zero weights
    qfar = jnp.asarray([[500.0, 500.0, 500.0]])
    resf = npts.knn_search(lm, mc, qfar, jnp.asarray(offsets))
    assert int(resf.nn_count[0]) == 0


def test_certainty_accumulation(rng):
    mc = small_config()
    pts = rng.uniform(-3, 3, size=(300, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    offsets = npts.neighbor_offsets(2, 0.2)
    q = np.asarray(state.positions[:32]) + 0.01  # query right at stored points
    res = npts.knn_search(lm, mc, jnp.asarray(q), jnp.asarray(offsets))
    _, _, w, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), res.lidx)
    lm2 = npts.accumulate_certainty(lm, mc, res.lidx, w, query_ts=jnp.full((32,), 3, jnp.int32))
    total = float(jnp.sum(lm2.certainties))
    # each valid query row contributes ~1 (normalized weights)
    assert abs(total - 32.0) < 1e-3
    assert int(lm2.ts_update.max()) == 3
    assert float(lm2.certainties[mc.local_capacity]) == 0.0  # sentinel untouched


def test_assign_local_to_global_roundtrip(rng):
    mc = small_config()
    pts = rng.uniform(-3, 3, size=(300, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    newf = jnp.asarray(rng.normal(size=lm.geo_features.shape).astype(np.float32))
    lm = lm._replace(geo_features=newf)
    count = int(state.count)  # read before the call: assign donates its input
    state2 = npts.assign_local_to_global(state, lm, mc)
    lidx = np.asarray(lm.indices[: int(lm.count)])
    np.testing.assert_allclose(np.asarray(state2.geo_features[lidx]),
                               np.asarray(newf[: int(lm.count)]), atol=0)
    # sentinel row stays zero
    np.testing.assert_allclose(np.asarray(state2.geo_features[mc.capacity]), 0.0)


def test_travel_dist_windowing(rng):
    """Old points outside the travel-distance window vanish from the local map
    and from time-filtered queries (ref model/neural_points.py:272-313,480-488)."""
    mc = small_config(travel_dist_window=10.0)
    state = npts.init_map_state(mc)
    travel = jnp.asarray(np.concatenate([[0.0, 1.0], np.linspace(2, 100, 62)]), dtype=jnp.float32)
    pts_old = rng.uniform(-3, 3, size=(100, 3)).astype(np.float32)
    valid = jnp.ones((100,), bool)
    state = npts.map_insert(state, mc, jnp.asarray(pts_old), valid, jnp.int32(0), travel,
                            downsample_table_size=1 << 16)
    # at ts=40 the travel dist is ~60 beyond ts=0 -> outside window
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(40), travel)
    assert int(lm.count) == 0
    lm0 = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(1), travel)
    assert int(lm0.count) == int(state.count)


def test_adjust_map_translates_points(rng):
    mc = small_config()
    pts = rng.uniform(-3, 3, size=(200, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    T = np.tile(np.eye(4, dtype=np.float32), (64, 1, 1))
    T[:, :3, 3] = [1.0, 2.0, 3.0]
    state2 = npts.adjust_map(state, mc, jnp.asarray(T))
    count = int(state.count)
    np.testing.assert_allclose(np.asarray(state2.positions[:count]),
                               np.asarray(state.positions[:count]) + [1, 2, 3], atol=1e-5)
    assert float(state2.positions[mc.capacity, 0]) == 1e8


def test_recreate_hash_query_still_works(rng):
    mc = small_config()
    pts = rng.uniform(-3, 3, size=(300, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    state2 = npts.recreate_hash(state, mc, jnp.int32(0), downsample_table_size=1 << 16)
    offsets = npts.neighbor_offsets(2, 0.2)
    q = np.asarray(state.positions[:16])
    r1 = npts.knn_search(lm, mc, jnp.asarray(q), jnp.asarray(offsets))
    r2 = npts.knn_search(lm, mc, jnp.asarray(q), jnp.asarray(offsets))
    np.testing.assert_array_equal(np.asarray(r1.nn_count), np.asarray(r2.nn_count))


def test_query_certainty(rng):
    mc = small_config()
    pts = rng.uniform(-3, 3, size=(200, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    lm = lm._replace(attr_rows=lm.attr_rows.at[: int(lm.count), npts.C_CERT].set(7.0))
    q = np.asarray(state.positions[:8])
    cert = npts.query_certainty(lm, mc, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(cert), 7.0, atol=1e-6)


def test_approx_max_k_exact_for_knn_shapes(rng):
    """knn_search selects top-6 via lax.approx_max_k (TPU PartialReduce, ~3x
    faster than lax.top_k at (B,33) measured on real hardware).  Guard that it
    is EXACT at every candidate width the templates produce, including
    adversarial orderings (sorted, reverse-sorted, heavy duplicates)."""
    import jax

    for width in (27, 33, 81, 128):
        base = rng.standard_normal((256, width)).astype(np.float32)
        cases = [base, np.sort(base, axis=1), -np.sort(base, axis=1),
                 np.round(base)]  # duplicates
        for d2 in cases:
            va, _ = jax.lax.approx_max_k(jnp.asarray(-d2), 6)
            vt, _ = jax.lax.top_k(jnp.asarray(-d2), 6)
            np.testing.assert_allclose(np.sort(np.asarray(va), axis=1),
                                       np.sort(np.asarray(vt), axis=1))
