"""Decompose the run_kitti-PROFILE bench pass (bench.py pass 3): where do
the ~430 ms/frame go?  Chained piece timings with forced value fetches
(slope method — see profile_r4.py) at the exact bench kitti configuration.

Run on the TPU: python experiments/profile_kitti.py
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

from bench import KITTI_N_RAYS, lidar_scan, make_world, run_pass, sensor_pose
from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.ops.sampler import sample_rays
from pin_slam_tpu.ops.voxel import pad_to
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.slam.pipeline import SlamSystem


def fetch_ms(fn, *args, reps=3):
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

    for i in range(13):
        t0 = time.perf_counter()
        system.process_frame(make_frame(i))
        print(f"frame {i}: {(time.perf_counter() - t0)*1e3:6.0f} ms", flush=True)

    mc, mcfg, sc = system.mc, system.mcfg, system.sc
    state, lm, pool = system.state, system.lm, system.pool
    frame = make_frame(13)
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)
    pose_R = jnp.asarray(system.cur_pose[:3, :3].astype(np.float32))
    pose_t = jnp.asarray(system.cur_pose[:3, 3].astype(np.float32))
    key = jax.random.PRNGKey(7)
    geo = system.geo_params
    jax.block_until_ready((points, lm.attr_rows))

    # full fused program (frame_update only, no training)
    def fu(i):
        st, lm2, pl, _ = system._frame_update(
            state, lm, pool, jax.random.fold_in(key, i), points, valid,
            pose_R, pose_t, jnp.int32(13), system._travel, None, None, geo)
        return lm2.count

    t1 = fetch_ms(lambda: fu(0))
    print(f"frame_update (single call incl RTT): {t1:7.1f} ms", flush=True)

    # training loop alone
    L = mc.local_capacity
    featsC = jnp.concatenate([lm.geo_features,
                              jnp.zeros((L + 1, 1), jnp.float32)], axis=1)
    params = mp.TrainableParams(features=featsC,
                                color_features=lm.color_features,
                                geo=geo, sem=None, color=None)
    opt = mp.init_opt_state(mcfg, params)
    one = jnp.ones((), bool)

    def loop(T):
        return lambda: mp.mapping_loop_cached(
            lm, mc, params, opt, pool, mcfg, key, jnp.float32(1.0), one,
            num_iters=T, use_kernel=system._use_kernel,
            unroll=5 if system._use_kernel else 1)

    tA = fetch_ms(loop(15))
    tB = fetch_ms(loop(45))
    per = (tB - tA) / 30.0
    print(f"mapping_loop_cached: per-iter {per:6.2f} ms; T=15 total {tA:6.1f} "
          f"(fixed {tA - 15 * per:6.1f})", flush=True)

    # sampling + compaction width sanity
    batch = jax.jit(lambda k: sample_rays(k, sc, points, valid, None, None))(key)
    print(f"sample width (pre-compaction): {batch.coord.shape[0]} rows; "
          f"mapping_bucket {cfg.mapping_bucket} x S={sc.ray_sample_count} = "
          f"{cfg.mapping_bucket * sc.ray_sample_count}", flush=True)

    # odometry program
    def od():
        out = system._odometry(
            lm, geo, None, points, valid, None, pose_R,
            jnp.zeros(3, jnp.float32), pose_t, jnp.asarray(False))
        return out[0]

    print(f"odometry (single call incl RTT): {fetch_ms(od):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
