"""Itemize the KITTI-profile odometry program (VERDICT r4 next #2c: the
"odometry + assign + slop" line had no breakdown; r5 found the whole line was
the tracker's weighted_first=False vjp fallback re-probing the hash each GN
iteration).  Measures, chained on the real device at run_kitti shapes:

  * the full track_frame program with a realistic constant-velocity-quality
    init error (5 cm + 0.3 deg) and with a poor init (0.5 m + 2 deg)
  * probe_candidates alone (the per-refresh cost)
  * one cached GN iteration's dense math alone

Run on the TPU: python experiments/profile_odometry.py
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

from bench import KITTI_N_RAYS, lidar_scan, make_world, sensor_pose
from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops.voxel import pad_to
from pin_slam_tpu.slam import tracker as trk
from pin_slam_tpu.slam import tracker_grad as tg
from pin_slam_tpu.slam.pipeline import SlamSystem
from pin_slam_tpu.dataset.slam_dataset import Frame


def fetch_ms(fn, *args, reps=4):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    rng = np.random.default_rng(0)
    world = make_world(rng)
    cfg = Config()
    cfg.load("config/lidar_slam/run_kitti.yaml")
    cfg.pc_path = cfg.pose_path = cfg.calib_path = ""
    cfg.kitti_correct = False
    cfg.o3d_vis_on = False
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.map_capacity = 1 << 22
    cfg.local_map_capacity = 1 << 18
    cfg.buffer_size = 1 << 23
    cfg.pool_capacity = 1 << 23
    cfg.downsample_hash_size = 1 << 21
    cfg.frame_bucket = KITTI_N_RAYS
    cfg.mapping_bucket = 1 << 16
    cfg.probe_dedup_budget = 0.625
    cfg._derive()
    cfg.log_loss_per_frame = False
    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    def make_frame(i):
        R, t = sensor_pose(i)
        pts = lidar_scan(rng, world, t, R, KITTI_N_RAYS, n_az=1800, n_el=128)
        arr, valid = pad_to(pts, cfg.frame_bucket)
        return Frame(points=arr, valid=valid, colors=None, sem_labels=None,
                     point_ts=None, raw_count=pts.shape[0])

    for i in range(8):
        system.process_frame(make_frame(i))
    print("warmup done", flush=True)

    mc, tc = system.mc, system.tc
    lm = system.lm
    geo = system.geo_params
    offsets = system.append_tmpl   # ProbeTemplate under the brick layout

    # source prep like the pipeline: next frame's raw points at pose 8
    frame = make_frame(8)
    R8, t8 = sensor_pose(8)
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)

    out = system._odometry(lm, geo, None, points, valid, None,
                           jnp.asarray(R8.astype(np.float32)),
                           jnp.asarray((t8 - system.lm_origin64).astype(np.float32)),
                           jnp.asarray(system.cur_pose[:3, 3].astype(np.float32)),
                           jnp.asarray(False))
    source, src_valid = out[5], out[6]
    jax.block_until_ready(source)
    B = source.shape[0]
    print(f"source bucket B={B}, K={offsets.cells.shape[0] if hasattr(offsets, 'cells') else offsets.shape[0]}", flush=True)

    def track(dr, dt_):
        a = np.radians(dr)
        Rz = np.asarray([[np.cos(a), -np.sin(a), 0],
                         [np.sin(a), np.cos(a), 0], [0, 0, 1]], np.float32)
        Ri = jnp.asarray(Rz @ R8.astype(np.float32))
        ti = jnp.asarray((t8 - system.lm_origin64).astype(np.float32)
                         + np.float32(dt_))
        def f():
            r = trk.track_frame(lm, mc, tc, geo, system.sdf_scale, offsets,
                                source, src_valid, Ri, ti)
            return r.t
        ms = fetch_ms(f)
        r = trk.track_frame(lm, mc, tc, geo, system.sdf_scale, offsets,
                            source, src_valid, Ri, ti)
        return ms, int(r.iterations), bool(r.valid)

    for name, dr, dt_ in [("good init (5cm, 0.3deg)", 0.3, 0.05),
                          ("poor init (0.5m, 2deg)", 2.0, 0.5)]:
        ms, iters, ok = track(dr, dt_)
        print(f"track_frame {name:<24} {ms:7.1f} ms  iters={iters} valid={ok}",
              flush=True)

    pts_world = source + jnp.asarray(
        (t8 - system.lm_origin64).astype(np.float32)) + lm.origin

    probe = jax.jit(lambda p: tg.probe_candidates(lm, mc, p, offsets).xs)
    print(f"probe_candidates (B x K rows)      "
          f"{fetch_ms(lambda: probe(pts_world)):7.1f} ms", flush=True)

    cache = tg.probe_candidates(lm, mc, pts_world, offsets)
    jax.block_until_ready(cache.xs)
    step = jax.jit(lambda p: tg.sdf_value_and_grad_cached(
        cache, lm, mc, geo, system.sdf_scale, p)[1])
    print(f"cached value+grad (one iteration)  "
          f"{fetch_ms(lambda: step(pts_world)):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
