"""Leading-edge map-bias probe for the seed-5 drift outlier (VERDICT r3 #4).

During a GT-driven (track_on=False) square-loop run, BEFORE each frame's map
update, register that frame's scan against the CURRENT map starting from the
EXACT GT pose and record the converged offset in the motion frame.  This is
precisely the bias an online tracker inherits at the leading edge (newly
observed surfaces trained for only a few iterations): if the per-frame
offsets match the online drift RATES per leg (seed5_drift.py), the outlier
is map-side zero-crossing bias, not a tracker defect.

Run (CPU): python experiments/seed5_bias.py [seed ...]
"""

import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from test_full_slam import make_square_dataset  # noqa: E402

from pin_slam_tpu.config import Config  # noqa: E402
from pin_slam_tpu.models import neural_points as npts  # noqa: E402
from pin_slam_tpu.ops.voxel import voxel_down_sample_mask  # noqa: E402
from pin_slam_tpu.slam import tracker as trk  # noqa: E402
from pin_slam_tpu.slam.pipeline import SlamSystem  # noqa: E402


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [5, 7]
    for seed in seeds:
        rng = np.random.default_rng(seed)
        root = tempfile.mkdtemp(prefix=f"sb{seed}_")
        n = make_square_dataset(root, rng)

        cfg = Config()
        cfg.pc_path = f"{root}/velodyne"
        cfg.pose_path = f"{root}/poses.txt"
        cfg.min_range, cfg.max_range = 2.0, 20.0
        cfg.bs, cfg.iters = 8192, 15
        cfg.reg_iter_n = 100
        cfg.silence = True
        cfg.pgo_on = False
        cfg.track_on = False            # GT-driven mapping: no pose feedback
        cfg.map_capacity = 1 << 18
        cfg.local_map_capacity = 1 << 16
        cfg.buffer_size = 1 << 21
        cfg.frame_bucket = 1 << 14
        cfg.source_bucket = 1 << 12
        cfg.downsample_hash_size = 1 << 19
        cfg.pool_capacity = 1 << 19
        cfg._derive()
        cfg.log_loss_per_frame = False
        system = SlamSystem(cfg)
        system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

        biases = []
        for i in range(n):
            frame = system.dataset.preprocess_frame(i)
            if i >= 2:
                gt = system.dataset.gt_poses[i]
                lm = npts.build_local_map(
                    system.state, system.mc,
                    jnp.asarray(gt[:3, 3].astype(np.float32)),
                    jnp.int32(i - 1), system._travel)
                pts = jnp.asarray(frame.points)
                vld = jnp.asarray(frame.valid)
                keep = voxel_down_sample_mask(pts, vld, cfg.source_vox_down_m,
                                              cfg.downsample_hash_size)
                idx = jnp.nonzero(keep, size=cfg.source_bucket, fill_value=0)[0]
                src_valid = jnp.arange(cfg.source_bucket) < jnp.sum(
                    keep, dtype=jnp.int32)
                origin = gt[:3, 3].copy()
                res = trk.track_frame(
                    lm, system.mc, system.tc, system.geo_params,
                    system.sdf_scale, system.offsets, pts[idx], src_valid,
                    jnp.asarray(gt[:3, :3].astype(np.float32)),
                    jnp.asarray(np.zeros(3, np.float32)))
                off_w = np.asarray(res.t, np.float64) + origin - gt[:3, 3]
                d = gt[:3, 3] - system.dataset.gt_poses[i - 1][:3, 3]
                nrm = np.linalg.norm(d)
                fwd = d / nrm if nrm > 1e-6 else np.array([1.0, 0, 0])
                lat = np.cross([0.0, 0, 1.0], fwd)
                biases.append((i, off_w @ fwd, off_w @ lat, off_w[2],
                               float(res.valid)))
            system.process_frame(frame)

        b = np.array(biases)
        print(f"seed {seed}: leading-edge registration bias vs GT "
              f"(mm, + = along motion):", flush=True)
        for a, z in [(2, 24), (25, 48), (49, 72), (73, 95)]:
            r = b[(b[:, 0] >= a) & (b[:, 0] <= z)]
            if not len(r):
                continue
            print(f"  frames {a:3d}-{z:3d}: along {r[:, 1].mean()*1e3:+6.2f} "
                  f"lat {r[:, 2].mean()*1e3:+6.2f} z {r[:, 3].mean()*1e3:+6.2f} "
                  f"valid {int(r[:, 4].sum())}/{len(r)}", flush=True)


if __name__ == "__main__":
    main()
