"""In-run visualization cadence (VERDICT r2 missing #2): mesh_freq_frame /
sdfslice_freq_frame must produce periodic headless artifacts during the run
(ref pin_slam.py:272-341), not only at save time."""

import os

import numpy as np

from pin_slam_tpu.config import Config
from pin_slam_tpu.slam.pipeline import SlamSystem


def test_periodic_mesh_and_slice_artifacts(tmp_path):
    rng = np.random.default_rng(5)
    root = str(tmp_path / "seq")
    os.makedirs(f"{root}/velodyne", exist_ok=True)
    n_frames = 5
    poses = []
    for f in range(n_frames):
        origin = np.array([0.3 * f, 0.0, 0.0])
        g = np.column_stack([rng.uniform(2, 10, 4000), rng.uniform(-5, 5, 4000),
                             np.full(4000, -1.5)])
        w = np.column_stack([np.full(4000, 12.0) + 0.02 * rng.standard_normal(4000),
                             rng.uniform(-5, 5, 4000),
                             rng.uniform(-1.5, 2.0, 4000)])
        pts = (np.concatenate([g, w]) - origin).astype(np.float32)
        np.concatenate([pts, np.zeros((pts.shape[0], 1), np.float32)],
                       axis=1).tofile(f"{root}/velodyne/{f:06d}.bin")
        T = np.eye(4)
        T[:3, 3] = origin
        poses.append(T)
    with open(f"{root}/poses.txt", "w") as fp:
        for T in poses:
            fp.write(" ".join(f"{v:.9f}" for v in T[:3, :].reshape(-1)) + "\n")

    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.pose_path = f"{root}/poses.txt"
    cfg.track_on = False
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 1.5, 20.0
    cfg.bs, cfg.iters = 2048, 5
    cfg.init_iter_ratio = 2
    cfg.o3d_vis_on = True            # the reference's per-frame vis gate
    cfg.mesh_freq_frame = 2
    cfg.sdfslice_freq_frame = 2
    cfg.mc_res_m = 0.4               # coarse grid keeps the test fast
    cfg.map_capacity = 1 << 15
    cfg.local_map_capacity = 1 << 14
    cfg.buffer_size = 1 << 18
    cfg.frame_bucket = 1 << 12
    cfg.source_bucket = 1 << 10
    cfg.downsample_hash_size = 1 << 16
    cfg.pool_capacity = 1 << 17
    cfg._derive()
    cfg.output_root = str(tmp_path / "out")
    cfg.name = "vis_run"

    system = SlamSystem(cfg)
    for i in range(n_frames):
        system.process_frame(system.dataset.preprocess_frame(i))

    vis_dir = os.path.join(cfg.output_root, "vis_run", "vis")
    meshes = sorted(os.listdir(vis_dir)) if os.path.isdir(vis_dir) else []
    assert any(f.startswith("mesh_") for f in meshes), meshes
    assert any(f.startswith("sdf_slice_") for f in meshes), meshes
    # frames 2 and 4 are mesh-due at freq 2
    assert "mesh_00002.ply" in meshes and "mesh_00004.ply" in meshes
    # the viewer refreshes alongside
    assert os.path.exists(os.path.join(cfg.output_root, "vis_run", "viewer.html"))
