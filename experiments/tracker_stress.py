"""Tracker under stressed motion (VERDICT r3 next #6): fast turns
(~5 deg/frame) with a constant-velocity initial guess that is WRONG through
the turn, so the GN/LM while_loop must actually iterate.

Records: GN iterations/frame and the chained odometry program cost at both
gentle (bench-like) and stressed motion.  Reference iteration budget:
/root/reference/utils/config.py:162-174 (reg_iter_n 50, term thresholds).

Run on the TPU: python experiments/tracker_stress.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import (enable_compilation_cache,
                                         set_matmul_precision)

enable_compilation_cache()
set_matmul_precision()

import jax
import jax.numpy as jnp

from bench import N_RAYS, lidar_scan, make_world
from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.ops.voxel import pad_to
from pin_slam_tpu.slam.pipeline import SlamSystem


def stressed_pose(i, n_gentle):
    """Gentle ramp for n_gentle frames, then a hard S-turn at 5 deg/frame."""
    yaw = 0.0
    x = np.zeros(3)
    step = 0.5
    for k in range(i):
        if k < n_gentle:
            dyaw = 0.004
        else:
            # alternate-direction hard turn: +5 deg/frame for 8 frames, then -5
            dyaw = np.deg2rad(5.0) * (1 if ((k - n_gentle) // 8) % 2 == 0 else -1)
        yaw += dyaw
        x += step * min(1.0, (k + 1) / 5.0) * np.array([np.cos(yaw), np.sin(yaw), 0.0])
    R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                  [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    return R, x


def main():
    rng = np.random.default_rng(0)
    world = make_world(rng)
    cfg = Config()
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.map_capacity = 1 << 18
    cfg.local_map_capacity = 1 << 16
    cfg.buffer_size = 1 << 21
    cfg.pool_capacity = 1 << 21
    cfg.downsample_hash_size = 1 << 19
    cfg.frame_bucket = 1 << 15
    cfg._derive()
    cfg.log_loss_per_frame = False
    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    N_GENTLE, N_STRESS = 12, 16

    def make_frame(i):
        R, t = stressed_pose(i, N_GENTLE)
        pts = lidar_scan(rng, world, t, R, N_RAYS)
        arr, valid = pad_to(pts, N_RAYS)
        return Frame(points=arr, valid=valid, colors=None, sem_labels=None,
                     point_ts=None, raw_count=pts.shape[0])

    frames = [make_frame(i) for i in range(N_GENTLE + N_STRESS)]

    iters_gentle, iters_stress = [], []
    wall_gentle, wall_stress = [], []
    valid_g, valid_s = 0, 0
    for i, frame in enumerate(frames):
        t0 = time.perf_counter()
        info = system.process_frame(frame)
        dt = time.perf_counter() - t0
        if i < 3:
            continue
        if i < N_GENTLE:
            iters_gentle.append(info.get("reg_iters", 0))
            wall_gentle.append(dt)
            valid_g += bool(info.get("reg_valid"))
        else:
            iters_stress.append(info.get("reg_iters", 0))
            wall_stress.append(dt)
            valid_s += bool(info.get("reg_valid"))

    print(f"gentle  : iters/frame {np.mean(iters_gentle):5.1f} "
          f"(max {max(iters_gentle)}), wall {np.mean(wall_gentle)*1e3:6.1f} ms, "
          f"valid {valid_g}/{len(iters_gentle)}", flush=True)
    print(f"stressed: iters/frame {np.mean(iters_stress):5.1f} "
          f"(max {max(iters_stress)}), wall {np.mean(wall_stress)*1e3:6.1f} ms, "
          f"valid {valid_s}/{len(iters_stress)}", flush=True)

    # chained odometry program cost at stressed motion: re-run track_frame on
    # the LAST stressed frame from the constant-velocity (wrong) guess
    frame = frames[-1]
    R_prev, t_prev = stressed_pose(len(frames) - 2, N_GENTLE)
    R_pp, t_pp = stressed_pose(len(frames) - 3, N_GENTLE)
    guess_R = R_prev @ (np.linalg.inv(R_pp) @ R_prev)       # const-velocity
    guess_t = t_prev + (t_prev - t_pp)
    origin = system.lm_origin64

    pts = jnp.asarray(frame.points)
    vld = jnp.asarray(frame.valid)
    args = (system.lm, system.geo_params, None, pts, vld, None,
            jnp.asarray(guess_R.astype(np.float32)),
            jnp.asarray((guess_t - origin).astype(np.float32)),
            jnp.asarray(system.cur_pose[:3, 3].astype(np.float32)),
            jnp.asarray(False))

    def fetch(out):
        return float(np.asarray(out[0]).ravel()[0])

    out = system._odometry(*args)
    fetch(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = system._odometry(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    packed = np.asarray(out[0])
    print(f"odometry program (stressed single call incl RTT): "
          f"{min(ts)*1e3:6.1f} ms, iters {int(packed[14])}, "
          f"valid {bool(packed[12] > 0.5)}", flush=True)


if __name__ == "__main__":
    main()
