"""RGB-D pipeline test: colored PLY frames -> color feature training +
photometric/consistency-weighted tracking (reference run_replica.yaml path)."""

import os

import numpy as np
import pytest

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset import io as pio
from pin_slam_tpu.slam.pipeline import SlamSystem


def world_color(pts):
    """Deterministic color field painted on the world geometry."""
    c = 0.5 + 0.5 * np.stack([np.sin(pts[:, 0] * 2.0),
                              np.cos(pts[:, 1] * 2.0),
                              np.sin(pts[:, 2] * 3.0)], axis=1)
    return c.astype(np.float32)


def make_rgbd_dataset(root, rng, n_frames=8):
    os.makedirs(f"{root}/rgbd_ply", exist_ok=True)
    # small colored room
    world = []
    for axis, sign in [(0, -3.0), (0, 3.0), (1, -3.0), (1, 3.0), (2, -1.5), (2, 1.5)]:
        n_w = 30000
        w = np.empty((n_w, 3))
        w[:, axis] = sign + 0.01 * rng.standard_normal(n_w)
        others = [a for a in range(3) if a != axis]
        w[:, others[0]] = rng.uniform(-3, 3, n_w)
        w[:, others[1]] = rng.uniform(-1.5 if others[1] == 2 else -3,
                                      1.5 if others[1] == 2 else 3, n_w)
        world.append(w)
    world = np.concatenate(world).astype(np.float32)
    colors = world_color(world)

    poses = []
    for f in range(n_frames):
        T = np.eye(4)
        T[0, 3] = 0.05 * f          # slow dolly
        poses.append(T)
        Tinv = np.linalg.inv(T)
        local = world @ Tinv[:3, :3].T + Tinv[:3, 3]
        d = np.linalg.norm(local, axis=1)
        keep = (d > 0.2) & (d < 8.0)
        sub = rng.choice(np.nonzero(keep)[0], 12000, replace=False)
        pio.write_ply(f"{root}/rgbd_ply/{f:06d}.ply", local[sub],
                      colors=colors[sub])
    pio.write_kitti_poses(f"{root}/poses.txt", np.stack(poses))
    return n_frames


@pytest.mark.slow
def test_rgbd_color_pipeline(tmp_path, rng):
    root = str(tmp_path / "rgbd_seq")
    n = make_rgbd_dataset(root, rng)

    cfg = Config()
    cfg.pc_path = f"{root}/rgbd_ply"
    cfg.pose_path = f"{root}/poses.txt"
    cfg.color_map_on = True
    cfg.color_on = True
    cfg.color_channel = 3
    cfg.min_range, cfg.max_range = 0.2, 8.0
    cfg.min_z, cfg.max_z = -5.0, 5.0
    cfg.voxel_size_m = 0.1
    cfg.surface_sample_range_m = 0.05
    cfg.sigma_sigmoid_m = 0.02
    cfg.photometric_loss_on = True
    cfg.bs, cfg.iters = 4096, 12
    cfg.reg_iter_n = 50
    cfg.eigenvalue_check = False
    cfg.source_vox_down_m = 0.15
    cfg.silence = True
    cfg.map_capacity = 1 << 17
    cfg.local_map_capacity = 1 << 16
    cfg.buffer_size = 1 << 20
    cfg.frame_bucket = 1 << 14
    cfg.source_bucket = 1 << 12
    cfg.downsample_hash_size = 1 << 18
    cfg.pool_capacity = 1 << 18
    cfg._derive()
    cfg.output_root = str(tmp_path / "out")

    system = SlamSystem(cfg)
    assert system.color_params is not None
    metrics = system.run()

    # tracking held through the sequence
    est = np.stack(system.dataset.odom_poses)
    gt = system.dataset.gt_poses[: len(est)]
    errs = np.linalg.norm(est[:, :3, 3] - gt[: len(est), :3, 3], axis=1)
    assert errs[-1] < 0.2, errs

    # color features were trained: regressed colors at wall points correlate
    # with the painted color field
    import jax.numpy as jnp

    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts

    count = min(int(system.state.count), 2048)
    pts = np.asarray(system.state.positions[:count])
    knn = npts.knn_search(system.lm, system.mc, jnp.asarray(pts), system.offsets)
    geo_feat, color_feat, w, _ = npts.interpolate_features(
        system.lm, system.mc, jnp.asarray(pts), knn.lidx, query_color=True)
    pred = np.asarray(dec.blended_head(dec.regress_color, system.color_params,
                                       color_feat, w, system.mc.weighted_first))
    target = world_color(pts)
    valid = np.asarray(knn.nn_count) >= 6
    err = np.abs(pred[valid] - target[valid]).mean()
    assert err < 0.2, f"color regression error {err:.3f}"