"""Square-loop drift on the CURRENT backend (TPU when attached) — the
accuracy gate for TPU-only code paths (the Pallas fused training kernels run
only on real hardware; the CPU suite exercises the XLA path).

Run: python experiments/tpu_drift.py [seed ...]
Env: PIN_SLAM_PALLAS=0 forces the XLA path for A/B comparison.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pin_slam_tpu.utils.platform import (enable_compilation_cache,
                                         set_matmul_precision)

enable_compilation_cache()
set_matmul_precision()

import jax  # noqa: E402

from test_full_slam import make_square_dataset  # noqa: E402

from pin_slam_tpu.config import Config  # noqa: E402
from pin_slam_tpu.slam.pipeline import SlamSystem  # noqa: E402


def run_seed(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    root = tempfile.mkdtemp(prefix=f"sq{seed}_")
    make_square_dataset(root, rng)

    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.pose_path = f"{root}/poses.txt"
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.bs, cfg.iters = 8192, 15
    cfg.silence = True
    cfg.pgo_on = False
    cfg.map_capacity = 1 << 18
    cfg.local_map_capacity = 1 << 16
    cfg.buffer_size = 1 << 21
    cfg.frame_bucket = 1 << 14
    cfg.source_bucket = 1 << 12
    cfg.downsample_hash_size = 1 << 19
    cfg.pool_capacity = 1 << 19
    if os.environ.get("PIN_SLAM_PALLAS", "1") == "0":
        cfg.use_pallas_train = False
    cfg._derive()

    cfg.output_root = tempfile.mkdtemp(prefix=f"sqout{seed}_")
    system = SlamSystem(cfg)
    import dataclasses
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)
    metrics = system.run()

    est = np.stack(system.dataset.odom_poses)
    gt = np.stack(system.dataset.gt_poses[: len(est)])
    end = float(np.linalg.norm(est[-1, :3, 3] - gt[-1, :3, 3]))
    ate = float(np.sqrt(np.mean(np.sum(
        (est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1))))
    return {"seed": seed, "endpoint_m": round(end, 4), "ate_m": round(ate, 4),
            "frames": len(est), "kernel": system._use_kernel,
            "ate_metric": metrics.get("ate_rmse_m")}


def main():
    seeds = [int(a) for a in sys.argv[1:]] or [7, 5]
    print("backend:", jax.default_backend(), flush=True)
    for s in seeds:
        print(run_seed(s), flush=True)


if __name__ == "__main__":
    main()
