"""Reproduce the odometry nondeterminism on the synthetic square loop
(VERDICT round 1, weak #2): same scene, repeated runs, endpoint error +
per-frame divergence report.

Usage: python experiments/repro_flaky.py [n_repeats] [scene_seed ...]
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

# the environment pre-seeds jax_platforms=axon,cpu and IGNORES the env var;
# force CPU via the config API so this never grabs (or wedges) the TPU tunnel
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from test_full_slam import make_square_dataset  # noqa: E402

from pin_slam_tpu.config import Config  # noqa: E402
from pin_slam_tpu.slam.pipeline import SlamSystem  # noqa: E402


def run_once(root, n, tag=""):
    import dataclasses

    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.pose_path = f"{root}/poses.txt"
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.bs, cfg.iters = 8192, 15
    cfg.reg_iter_n = 100
    cfg.silence = True
    cfg.pgo_on = False
    cfg.map_capacity = 1 << 18
    cfg.local_map_capacity = 1 << 16
    cfg.buffer_size = 1 << 21
    cfg.frame_bucket = 1 << 14
    cfg.source_bucket = 1 << 12
    cfg.downsample_hash_size = 1 << 19
    cfg.pool_capacity = 1 << 19
    # accuracy-mitigation knob sweeps (ACCURACY.md r5)
    cfg.fresh_freespace_damp = float(os.environ.get("PIN_DAMP", "1.0"))
    cfg._derive()
    cfg.log_loss_per_frame = False

    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    errs = []
    infos = []
    for i in range(len(system.dataset)):
        frame = system.dataset.preprocess_frame(i)
        info = system.process_frame(frame)
        gt = system.dataset.gt_poses[i]
        est = system.dataset.odom_poses[-1]
        errs.append(np.linalg.norm(est[:3, 3] - gt[:3, 3]))
        infos.append(info)
    errs = np.array(errs)
    n_invalid = sum(1 for x in infos if x.get("reg_valid") is False)
    print(f"  {tag}: endpoint={errs[-1]:.3f} m  max={errs.max():.3f} "
          f"@f{errs.argmax()}  invalid_frames={n_invalid} "
          f"first>0.5m@f{int(np.argmax(errs > 0.5)) if (errs > 0.5).any() else -1}",
          flush=True)
    return errs, infos


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    seeds = [int(s) for s in sys.argv[2:]] or [7, 42]
    for seed in seeds:
        rng = np.random.default_rng(seed)
        root = tempfile.mkdtemp(prefix=f"square_{seed}_")
        n = make_square_dataset(root, rng)
        print(f"scene seed {seed} ({n} frames):", flush=True)
        for r in range(reps):
            run_once(root, n, tag=f"run{r}")


if __name__ == "__main__":
    main()
