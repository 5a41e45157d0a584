"""Root-cause the seed-5 square-loop drift outlier (VERDICT r3 next #4).

Per-frame instrumentation on scene seeds 5 vs 7: translation-error growth
decomposed into the GT motion frame (along-track / lateral / vertical),
registration residual, GN iterations, and the JtJ conditioning from the
tracker covariance — to separate (a) degenerate-geometry legs (eigenvalue
spread) from (b) a biased trained map (systematic along-track growth like
the r3 new-region bias) from (c) registration noise accumulation.

Run (CPU): python experiments/seed5_drift.py [seed ...]
"""

import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from test_full_slam import make_square_dataset  # noqa: E402

from pin_slam_tpu.config import Config  # noqa: E402
from pin_slam_tpu.slam.pipeline import SlamSystem  # noqa: E402


def run_instrumented(root, n, tag=""):
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
    cfg._derive()
    cfg.log_loss_per_frame = False

    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    rows = []
    for i in range(len(system.dataset)):
        frame = system.dataset.preprocess_frame(i)
        info = system.process_frame(frame)
        gt = system.dataset.gt_poses[i]
        est = system.dataset.odom_poses[-1]
        err_w = est[:3, 3] - gt[:3, 3]
        # decompose in the GT motion frame of this leg
        if i > 0:
            d = system.dataset.gt_poses[i][:3, 3] - system.dataset.gt_poses[i - 1][:3, 3]
            nrm = np.linalg.norm(d)
            fwd = d / nrm if nrm > 1e-6 else np.array([1.0, 0, 0])
        else:
            fwd = np.array([1.0, 0, 0])
        up = np.array([0.0, 0, 1.0])
        lat = np.cross(up, fwd)
        cov = system.last_reg_cov
        if cov is not None:
            ev = np.linalg.eigvalsh(cov[:3, :3])   # translation block
            cond = float(ev.max() / max(ev.min(), 1e-30))
        else:
            cond = 0.0
        rows.append((i, float(err_w @ fwd), float(err_w @ lat), float(err_w @ up),
                     info.get("reg_residual_cm", 0.0), info.get("reg_iters", 0),
                     cond))
    rows = np.array(rows)
    legs = [(1, 24), (25, 48), (49, 72), (73, 95)]
    print(f"  {tag}: endpoint={np.linalg.norm(rows[-1, 1:4]):.3f} m", flush=True)
    for a, b in legs:
        r = rows[a:b + 1]
        if not len(r):
            continue
        dfwd = (r[-1, 1] - r[0, 1]) / max(len(r) - 1, 1) * 1e3
        dlat = (r[-1, 2] - r[0, 2]) / max(len(r) - 1, 1) * 1e3
        print(f"    frames {a:3d}-{b:3d}: along {dfwd:+6.2f} mm/f  "
              f"lat {dlat:+6.2f} mm/f  |err|_end {np.linalg.norm(r[-1, 1:4]):.3f}  "
              f"res {r[:, 4].mean():5.2f} cm  iters {r[:, 5].mean():4.1f}  "
              f"cond(cov_t) med {np.median(r[:, 6]):8.1f} max {r[:, 6].max():8.1f}",
              flush=True)
    return rows


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [5, 7]
    for seed in seeds:
        rng = np.random.default_rng(seed)
        root = tempfile.mkdtemp(prefix=f"square_{seed}_")
        n = make_square_dataset(root, rng)
        print(f"scene seed {seed} ({n} frames):", flush=True)
        rows = run_instrumented(root, n, tag=f"seed{seed}")
        np.save(f"/tmp/seed{seed}_drift_rows.npy", rows)


if __name__ == "__main__":
    main()
