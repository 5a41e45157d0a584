"""Batch CLI driver — the ``pin_slam.py`` equivalent (reference pin_slam.py:31-377).

Usage (positional args mirror the reference, pin_slam.py:34-45):

    python pin_slam.py <config.yaml> [dataset_name] [sequence] [seed]

or `pin-slam-tpu <config.yaml> ...` once installed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="pin-slam-tpu batch SLAM driver")
    ap.add_argument("config", help="YAML config profile")
    ap.add_argument("dataset_name", nargs="?", default="",
                    help="dataset name for path indexing (kitti, mulran, ...)")
    ap.add_argument("sequence", nargs="?", default="", help="sequence id, e.g. 00")
    ap.add_argument("seed", nargs="?", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None, help="limit frame count")
    ap.add_argument("--device", default=None, help="jax platform override (tpu/cpu)")
    args = ap.parse_args(argv)

    from pin_slam_tpu.config import Config

    cfg = Config().load(args.config)
    if args.seed is not None:
        cfg.seed = args.seed
    if args.dataset_name:
        from pin_slam_tpu.dataset.indexing import set_dataset_path

        set_dataset_path(cfg, args.dataset_name, args.sequence)
    if args.device:
        cfg.device = args.device

    import jax

    from pin_slam_tpu.utils.platform import (enable_compilation_cache,
                                             set_matmul_precision)

    if cfg.device and cfg.device != "tpu":
        jax.config.update("jax_platforms", cfg.device)
    enable_compilation_cache()
    set_matmul_precision()
    # multi-host bring-up (no-op unless a multi-process launch is configured
    # via PIN_SLAM_COORDINATOR/... or PIN_SLAM_DIST=1 — parallel/distributed.py)
    from pin_slam_tpu.parallel.distributed import initialize as dist_init

    if dist_init():
        print(f"[pin-slam-tpu] jax.distributed: process "
              f"{jax.process_index()}/{jax.process_count()}")

    from pin_slam_tpu.slam.pipeline import SlamSystem
    from pin_slam_tpu.utils.experiment import setup_experiment

    run_path = setup_experiment(cfg)
    print(f"[pin-slam-tpu] run dir: {run_path}")
    print(f"[pin-slam-tpu] platform: {jax.devices()[0].platform} "
          f"({len(jax.devices())} device(s))")

    t0 = time.time()
    system = SlamSystem(cfg)
    if len(system.dataset) == 0:
        print(f"[pin-slam-tpu] no frames found under {cfg.pc_path}", file=sys.stderr)
        return 2
    metrics = system.run(num_frames=args.frames)
    wall = time.time() - t0

    n = system.frame_id
    summary = {"frames": n, "wall_s": round(wall, 1),
               "frames_per_s": round(n / max(wall, 1e-9), 2), **metrics}
    print("[pin-slam-tpu] " + json.dumps(summary))
    with open(os.path.join(run_path, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
