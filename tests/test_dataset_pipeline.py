"""Dataset pipeline units: intrinsic correction, adaptive range, deskew path,
constant-velocity bookkeeping, merged-cloud export."""

import os

import numpy as np

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset import io as pio
from pin_slam_tpu.dataset.slam_dataset import (SLAMDataset, intrinsic_correct,
                                               recover_point_ts)


def test_intrinsic_correct_preserves_range(rng):
    pts = rng.normal(size=(500, 4)).astype(np.float32) * 20
    out = intrinsic_correct(pts, 0.195)
    d_in = np.linalg.norm(pts[:, :3], axis=1)
    d_out = np.linalg.norm(out[:, :3], axis=1)
    np.testing.assert_allclose(d_out, d_in, rtol=1e-5)
    # vertical angle lifted by exactly 0.195 deg
    va_in = np.degrees(np.arcsin(pts[:, 2] / d_in))
    va_out = np.degrees(np.arcsin(np.clip(out[:, 2] / d_out, -1, 1)))
    np.testing.assert_allclose(va_out - va_in, 0.195, atol=1e-3)
    # zero-degree correction is identity
    np.testing.assert_array_equal(intrinsic_correct(pts, 0.0), pts)


def test_recover_point_ts():
    # points swept clockwise: yaw from +pi to -pi maps to ts 0..1
    ang = np.linspace(np.pi - 0.01, -np.pi + 0.01, 100)
    pts = np.stack([np.cos(ang), np.sin(ang), np.zeros(100)], axis=1)
    ts = recover_point_ts(pts)
    assert ts.min() >= 0 and ts.max() <= 1
    assert ts[0] < 0.01 and ts[-1] > 0.99


def make_mini_dataset(root, rng, n=4, adaptive=False):
    os.makedirs(f"{root}/velodyne", exist_ok=True)
    poses = []
    for f in range(n):
        pts = rng.uniform(-30, 30, size=(5000, 3)).astype(np.float32)
        raw = np.concatenate([pts, rng.uniform(0, 1, (5000, 1)).astype(np.float32)], 1)
        raw.tofile(f"{root}/velodyne/{f:06d}.bin")
        T = np.eye(4)
        T[0, 3] = f * 0.5
        poses.append(T)
    pio.write_kitti_poses(f"{root}/poses.txt", np.stack(poses))
    return n


def test_adaptive_range_crops(tmp_path, rng):
    root = str(tmp_path / "seq")
    make_mini_dataset(root, rng)
    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.max_range = 100.0
    cfg.adaptive_range_on = True
    cfg.frame_bucket = 1 << 13
    ds = SLAMDataset(cfg)
    fr = ds.preprocess_frame(0)
    pts = fr.points[fr.valid]
    # adaptive range caps at 2 * min(|x|,|y|) extents ~ 60
    assert np.linalg.norm(pts, axis=1).max() <= 61.0


def test_update_odom_pose_projects_rotation(rng):
    cfg = Config()
    ds = SLAMDataset(cfg)
    T = np.eye(4)
    T[:3, :3] *= 1.01  # non-orthonormal scale sneaking in
    T[0, 3] = 0.5
    ds.update_odom_pose(T)
    assert abs(np.linalg.det(ds.odom_poses[-1][:3, :3]) - 1.0) < 1e-9


def test_merged_point_cloud_export(tmp_path, rng):
    root = str(tmp_path / "seq")
    n = make_mini_dataset(root, rng)
    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.pose_path = f"{root}/poses.txt"
    ds = SLAMDataset(cfg)
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = i * 0.5
        ds.update_odom_pose(T)
    out = ds.write_merged_point_cloud(str(tmp_path / "run"), vox_down_m=0.5,
                                      frame_stride=1)
    pts, _, _ = pio.read_point_cloud(out)
    assert pts.shape[0] > 1000
    # merged cloud spans the union of the transformed frames
    assert pts[:, 0].max() > 25.0


def test_frame_voxel_downsample_in_pipeline(rng):
    """The default (non-random) preprocessing path voxel-downsamples the
    mapping cloud: at most one ray endpoint per vox_down_m cell reaches the
    pool (ref dataset/slam_dataset.py:282-287 -> utils/tools.py:409-442)."""
    import jax
    import jax.numpy as jnp

    from pin_slam_tpu.slam import mapper as mp
    from pin_slam_tpu.slam.pipeline import SlamSystem

    cfg = Config()
    cfg.pgo_on = False
    cfg.silence = True
    cfg.rand_downsample = False
    cfg.vox_down_m = 0.2
    cfg.map_capacity = 1 << 12
    cfg.local_map_capacity = 1 << 11
    cfg.buffer_size = 1 << 14
    cfg.pool_capacity = 1 << 14
    cfg.downsample_hash_size = 1 << 13
    cfg.frame_bucket = 1 << 10
    cfg.source_bucket = 1 << 9
    cfg._derive()
    system = SlamSystem(cfg)

    # a dense wall patch: many points per 0.2 m voxel
    n = 1 << 10
    pts = np.column_stack([
        np.full(n, 5.0) + rng.normal(0, 0.01, n),
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)]).astype(np.float32)
    state, lm, pool, _ = system._frame_update(
        system.state, system.lm, system.pool, jax.random.PRNGKey(0),
        jnp.asarray(pts), jnp.ones((n,), bool), jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.int32(0), system._travel, None, None,
        system.geo_params)

    rows = np.asarray(pool.rows)
    valid = (np.arange(rows.shape[0]) < int(pool.fill)) & (rows[:, mp.P_TS] >= 0)
    endpoints = rows[valid & (np.abs(rows[:, mp.P_LABEL]) < 1e-6)][:, :3]
    assert endpoints.shape[0] > 10
    keys = np.unique(np.floor(endpoints / cfg.vox_down_m).astype(np.int64), axis=0)
    assert keys.shape[0] == endpoints.shape[0], \
        "more than one endpoint per vox_down_m voxel reached the pool"
