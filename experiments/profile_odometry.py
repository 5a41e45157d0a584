"""Break down the 254 ms/frame odometry stage measured by bench.py.

Isolates, at the bench's exact shapes and at a steady-state map:
  - tunnel round trip (empty program, blocking fetch)
  - _odometry device time alone (block before + after)
  - _update_and_train device time alone
  - track_frame with fixed iteration counts (cost per GN iteration)
  - the probe refresh branch vs the cached path

Run: python experiments/profile_odometry.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp

from bench import make_world, sensor_pose, lidar_scan, N_RAYS
from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.ops.voxel import pad_to
from pin_slam_tpu.slam.pipeline import SlamSystem
from pin_slam_tpu.slam import tracker as trk


def timeit(fn, reps=7):
    fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def main():
    rng = np.random.default_rng(0)
    world = make_world(rng)

    cfg = Config()
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.map_capacity = 1 << 20
    cfg.local_map_capacity = 1 << 17
    cfg.buffer_size = 1 << 22
    cfg.pool_capacity = 1 << 21
    cfg.downsample_hash_size = 1 << 19
    cfg.frame_bucket = 1 << 15
    cfg._derive()
    cfg.log_loss_per_frame = False
    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    def make_frame(i):
        R, t = sensor_pose(i)
        pts = lidar_scan(rng, world, t, R, N_RAYS)
        arr, valid = pad_to(pts, N_RAYS)
        return Frame(points=arr, valid=valid, colors=None, sem_labels=None,
                     point_ts=None, raw_count=pts.shape[0])

    frames = [make_frame(i) for i in range(8)]
    for f in frames[:6]:
        system.process_frame(f)
    jax.block_until_ready(system.lm.attr_rows)

    # ---- fixed costs ----
    tiny = jnp.zeros((8,), jnp.float32)
    nop = jax.jit(lambda x: x + 1.0)
    print(f"round trip (nop+block)        {timeit(lambda: np.asarray(nop(tiny))):8.2f} ms")

    frame = frames[6]
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)
    jax.block_until_ready((points, valid))

    init_pose = system.dataset.initial_guess()
    origin64 = system.lm_origin64
    R_init = jnp.asarray(init_pose[:3, :3].astype(np.float32))
    t_init = jnp.asarray((init_pose[:3, 3] - origin64).astype(np.float32))
    ap = jnp.asarray(system.after_pgo)

    def odo():
        out = system._odometry(system.lm, system.geo_params, None,
                               points, valid, None, R_init, t_init, ap)
        jax.block_until_ready(out)
        return out

    print(f"_odometry (block both sides)  {timeit(odo):8.2f} ms")
    packed = np.asarray(odo()[0])
    print(f"   iterations ran: {packed[14]:.0f}  valid={packed[12]:.0f} "
          f"residual={packed[15]:.2f}cm")

    # fixed-iteration track_frame: cost per GN iteration
    src, src_valid = odo()[1], odo()[2]
    for n_it in (1, 2, 5, 10, 20, 50):
        tc_n = dataclasses.replace(system.tc, reg_iter_n=n_it,
                                   term_thre_deg=0.0, term_thre_m=0.0)

        def tf():
            res = trk.track_frame(system.lm, system.mc, tc_n, system.geo_params,
                                  system.sdf_scale, system.offsets, src, src_valid,
                                  R_init, t_init, after_pgo=ap)
            jax.block_until_ready(res)

        print(f"track_frame iters={n_it:<3}          {timeit(tf, reps=5):8.2f} ms")

    # update_and_train isolated
    key = jax.random.PRNGKey(0)
    pose_R = jnp.asarray(system.cur_pose[:3, :3].astype(np.float32))
    pose_t = jnp.asarray(system.cur_pose[:3, 3].astype(np.float32))

    def uat():
        out = system._update_and_train(
            system.state, system.lm, system.pool, key,
            (system.geo_params, None, None), system._travel,
            jnp.float32(system.dataset.travel_dist[-1]), points, valid,
            pose_R, pose_t, jnp.int32(system.frame_id), None, None,
            jnp.float32(1.0), jnp.asarray(True), ap)
        jax.block_until_ready(out)
        # restore donated buffers for next rep
        (system.state, system.lm, system.pool, _p, _o, system._travel, _h) = out

    print(f"_update_and_train             {timeit(uat, reps=5):8.2f} ms")


if __name__ == "__main__":
    main()
