"""Isolate the steady-drift gap (VERDICT r2 weak #2): is the ~1.3 mm/frame
bias in the TRACKER or in the TRAINED MAP?

Protocol: build the map with GT poses (track_on=False) over the square-loop
dataset, then re-register every frame's source cloud against the final
(converged, GT-consistent) map starting from a PERTURBED GT pose and measure
the converged pose error.  A precise tracker on a good map lands ~sub-mm;
a systematic offset here means the SDF zero-crossing is biased (map side).

Run (CPU): python experiments/tracker_bias.py [n_frames]
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp

from test_full_slam import make_square_dataset

from pin_slam_tpu.config import Config
from pin_slam_tpu.slam import tracker as trk
from pin_slam_tpu.slam.pipeline import SlamSystem


def main(n_frames=40):
    rng = np.random.default_rng(7)
    root = tempfile.mkdtemp(prefix="tb_seq_")
    n = make_square_dataset(root, rng)
    n_frames = min(n_frames, n)

    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.pose_path = f"{root}/poses.txt"
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.bs, cfg.iters = 8192, 15
    cfg.reg_iter_n = 100
    cfg.silence = True
    cfg.pgo_on = False
    cfg.track_on = False                 # GT-driven mapping
    cfg.map_capacity = 1 << 18
    cfg.local_map_capacity = 1 << 16
    cfg.buffer_size = 1 << 21
    cfg.frame_bucket = 1 << 14
    cfg.source_bucket = 1 << 12
    cfg.downsample_hash_size = 1 << 19
    cfg.pool_capacity = 1 << 19
    cfg._derive()
    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    frames = []
    for i in range(n_frames):
        f = system.dataset.preprocess_frame(i)
        frames.append(f)
        system.process_frame(f)
    print(f"GT map built: {int(system.state.count)} points", flush=True)

    # re-register each frame against the FINAL map from a perturbed GT pose
    rng2 = np.random.default_rng(1)
    errs, rots = [], []
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.ops.voxel import voxel_down_sample_mask

    for i in range(2, n_frames):
        gt = system.dataset.gt_poses[i]
        # perturb ~ the constant-velocity guess error scale
        dt = rng2.normal(0, 0.03, 3)
        ang = rng2.normal(0, np.radians(0.5), 3)
        from pin_slam_tpu.ops.transforms import so3_expmap

        R_p = np.asarray(so3_expmap(jnp.asarray(ang, jnp.float32)))
        init = gt.copy()
        init[:3, :3] = R_p @ gt[:3, :3]
        init[:3, 3] = gt[:3, 3] + dt

        lm = npts.build_local_map(system.state, system.mc,
                                  jnp.asarray(init[:3, 3].astype(np.float32)),
                                  jnp.int32(n_frames - 1), system._travel)
        pts = jnp.asarray(frames[i].points)
        vld = jnp.asarray(frames[i].valid)
        keep = voxel_down_sample_mask(pts, vld, cfg.source_vox_down_m,
                                      cfg.downsample_hash_size)
        idx = jnp.nonzero(keep, size=cfg.source_bucket, fill_value=0)[0]
        n_keep = jnp.sum(keep, dtype=jnp.int32)
        src_valid = jnp.arange(cfg.source_bucket) < n_keep
        src = pts[idx]
        origin = init[:3, 3].copy()
        res = trk.track_frame(
            lm, system.mc, system.tc, system.geo_params, system.sdf_scale,
            system.offsets, src, src_valid,
            jnp.asarray(init[:3, :3].astype(np.float32)),
            jnp.asarray((init[:3, 3] - origin).astype(np.float32)))
        T = np.eye(4)
        T[:3, :3] = np.asarray(res.R, np.float64)
        T[:3, 3] = np.asarray(res.t, np.float64) + origin
        e = T[:3, 3] - gt[:3, 3]
        errs.append(e)
        dR = T[:3, :3] @ gt[:3, :3].T
        rots.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        if not bool(res.valid):
            print(f"frame {i}: INVALID registration", flush=True)

    errs = np.asarray(errs)
    print(f"tracker-vs-GT-map over {len(errs)} frames:")
    print(f"  |t err| mean {np.linalg.norm(errs, axis=1).mean()*1000:.2f} mm, "
          f"p95 {np.percentile(np.linalg.norm(errs, axis=1), 95)*1000:.2f} mm")
    print(f"  bias vector mean [{errs[:,0].mean()*1000:.2f}, "
          f"{errs[:,1].mean()*1000:.2f}, {errs[:,2].mean()*1000:.2f}] mm")
    print(f"  rot err mean {np.mean(rots):.4f} deg")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
