"""fps-vs-capacity sweep (VERDICT r2 weak #4): run the bench pipeline at the
bench capacities AND at run_kitti.yaml-scale capacities (map 4M, local 262k,
frame 131k) so the 10 Hz claim is measured at the shapes the KITTI profile
actually ships.  Gather/scatter costs grow with table sizes; this records the
curve.

Run: python experiments/scale_sweep.py            (on the TPU)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import (enable_compilation_cache,
                                         set_matmul_precision)

enable_compilation_cache()
set_matmul_precision()

import dataclasses

import jax

from bench import lidar_scan, make_world, sensor_pose
from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.ops.voxel import pad_to
from pin_slam_tpu.slam.pipeline import SlamSystem

# warmup must cover EVERY per-frame code path's compile, incl. pool_filter at
# frame pool_filter_freq-1 (one in-window compile once inflated the kitti
# config 4x — measured 2129 ms/frame vs its true ~560 ms steady state)
N_WARM, N_BENCH = 12, 8

CONFIGS = [
    # (name, map_cap, local_cap, buffer, pool, frame_bucket, n_rays)
    ("bench", 1 << 18, 1 << 16, 1 << 21, 1 << 21, 1 << 15, 1 << 15),
    ("kitti", 1 << 22, 1 << 18, 1 << 23, 1 << 23, 1 << 17, 1 << 17),
]


def run_one(name, map_cap, local_cap, buffer, pool_cap, frame_bucket, n_rays):
    rng = np.random.default_rng(0)
    world = make_world(rng)
    cfg = Config()
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.map_capacity = map_cap
    cfg.local_map_capacity = local_cap
    cfg.buffer_size = buffer
    cfg.pool_capacity = pool_cap
    cfg.downsample_hash_size = max(1 << 19, buffer >> 2)
    cfg.frame_bucket = frame_bucket
    cfg._derive()
    cfg.log_loss_per_frame = False
    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    def make_frame(i):
        R, t = sensor_pose(i)
        pts = lidar_scan(rng, world, t, R, n_rays,
                         n_az=1800 if n_rays > (1 << 16) else 900,
                         n_el=128 if n_rays > (1 << 16) else 96)
        arr, valid = pad_to(pts, frame_bucket)
        return Frame(points=arr, valid=valid, colors=None, sem_labels=None,
                     point_ts=None, raw_count=pts.shape[0])

    frames = [make_frame(i) for i in range(N_WARM + N_BENCH)]
    times = []
    for i, f in enumerate(frames):
        t0 = time.perf_counter()
        system.process_frame(f)
        dt = time.perf_counter() - t0
        if i >= N_WARM:
            times.append(dt)
    fps = 1.0 / float(np.mean(times))
    out = {"config": name, "map_capacity": map_cap, "local_capacity": local_cap,
           "frame_bucket": frame_bucket, "n_rays": n_rays,
           "frames_per_s": round(fps, 3),
           "ms_per_frame": round(1e3 / fps, 1),
           "map_points": int(system.state.count),
           "local_points": int(system.lm.count)}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    results = [run_one(*c) for c in CONFIGS]
    ratio = results[0]["frames_per_s"] / max(results[-1]["frames_per_s"], 1e-9)
    print(json.dumps({"bench_over_kitti_fps_ratio": round(ratio, 2)}))
