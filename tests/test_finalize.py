"""End-of-run map finalization (ref pin_slam.py:360-361) + plot artifacts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import neural_points as npts


def _mc(cap=1 << 12, L=1 << 10):
    return npts.MapConfig(
        capacity=cap, local_capacity=L, hash_size=1 << 14, voxel_size=0.3,
        feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=50.0,
        travel_dist_window=30.0)


def test_finalize_map_merges_and_prunes():
    mc = _mc()
    rng = np.random.default_rng(0)
    travel = jnp.zeros((64,), jnp.float32).at[:].set(
        jnp.arange(64, dtype=jnp.float32) * 2.0)

    state = npts.init_map_state(mc)
    # pass 1 at ts=0: 500 points
    pts1 = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    state = npts.map_insert(state, mc, jnp.asarray(pts1),
                            jnp.ones((500,), bool), jnp.int32(0), travel,
                            downsample_table_size=1 << 14)
    n1 = int(state.count)
    assert n1 > 300

    # pass 2 at ts=40 (travel 80 >> window 30): revisit the same voxels ->
    # duplicates (the stale-slot overwrite path inserts them)
    jitter = rng.uniform(-0.05, 0.05, size=pts1.shape).astype(np.float32)
    state = npts.map_insert(state, mc, jnp.asarray(pts1 + jitter),
                            jnp.ones((500,), bool), jnp.int32(40), travel,
                            downsample_table_size=1 << 14)
    n2 = int(state.count)
    assert n2 > n1, "revisit should insert duplicate points"

    # give the recent pass some certainty; pass-1 points stay uncertain
    attr = state.attr_rows.at[n1:n2, npts.C_CERT].set(10.0)
    state = state._replace(attr_rows=attr)

    final = npts.finalize_map(state, mc, travel, jnp.int32(40),
                              prune_certainty_thre=2.0,
                              downsample_table_size=1 << 14)
    n3 = int(final.count)
    # duplicates merged (one per voxel, ts-closest to now) and inactive
    # low-certainty pass-1 points pruned -> map shrinks to ~pass-2 size
    assert n3 < n2
    assert n3 <= n1 + 10

    # survivors keep the most recent pass (ts_create == 40 dominates)
    ts_c = np.asarray(final.attr_rows[:n3, npts.C_TSC])
    assert (ts_c == 40).mean() > 0.9

    # compacted: all survivor rows are in [0, n3), hash points at them
    pos = np.asarray(final.positions[:n3])
    assert np.all(np.abs(pos) < 10.0)
    # a query through the rebuilt hash finds the survivors
    lm = npts.build_local_map(final, mc, jnp.zeros(3), jnp.int32(40), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    res = npts.knn_search(lm, mc, jnp.asarray(pos[:50]), offsets)
    assert int(jnp.sum(res.nn_count > 0)) == 50


def test_plot_artifacts(tmp_path):
    from pin_slam_tpu.eval.traj import plot_trajectories
    from pin_slam_tpu.slam.pgo import PoseGraphManager

    n = 30
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 10, n)
    poses[:, 1, 3] = np.sin(np.linspace(0, 3, n))
    plot_trajectories(str(tmp_path), poses, poses)
    assert (tmp_path / "traj_plot_2d.png").exists()
    assert (tmp_path / "traj_plot_3d.png").exists()

    pgm = PoseGraphManager()
    for i in range(n):
        pgm.add_frame_node(i, poses[i])
        if i > 0:
            pgm.add_odometry_factor(i, i - 1,
                                    np.linalg.inv(poses[i - 1]) @ poses[i])
    pgm.add_loop_factor(n - 1, 0, np.linalg.inv(poses[0]) @ poses[n - 1])
    pgm.plot_loops(str(tmp_path / "loop_plot.png"))
    assert (tmp_path / "loop_plot.png").exists()
