"""Bisect the stage-2 _update_and_train: frame_update vs mapping_loop_cached
vs the full fused program, at bench shapes and steady state.

Run: python experiments/profile_uat3.py
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
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.models import neural_points as npts


def timeit(fn, reps=4):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)) * 1e3 - 24.0


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

    for i in range(6):
        system.process_frame(make_frame(i))
    jax.block_until_ready(system.lm.attr_rows)
    print("setup done", flush=True)

    mc, mcfg = system.mc, system.mcfg
    frame = make_frame(6)
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)
    pose_R = jnp.asarray(system.cur_pose[:3, :3].astype(np.float32))
    pose_t = jnp.asarray(system.cur_pose[:3, 3].astype(np.float32))
    key = jax.random.PRNGKey(7)
    jax.block_until_ready((points, valid))

    # (a) frame_update alone
    fu = system._frame_update

    def run_fu():
        out = fu(system.state, system.lm, system.pool, key, points, valid,
                 pose_R, pose_t, jnp.int32(system.frame_id), system._travel,
                 None, None, system.geo_params)
        jax.block_until_ready(out)
        return out

    print(f"frame_update (grouped probe)        {timeit(run_fu):8.2f} ms", flush=True)
    state2, lm2, pool2 = run_fu()

    # (b) mapping_loop_cached alone (local-table version)
    L = mc.local_capacity
    featsC = jnp.concatenate([lm2.geo_features, jnp.zeros((L + 1, 1), jnp.float32)], 1)
    params = mp.TrainableParams(features=featsC, color_features=None,
                                geo=system.geo_params, sem=None, color=None)
    opt_state = mp.init_opt_state(mcfg, params)
    jax.block_until_ready((params, opt_state))

    def run_ml(n):
        out = mp.mapping_loop_cached(lm2, mc, params, opt_state, pool2, mcfg,
                                     key, jnp.float32(1.0), jnp.asarray(True),
                                     num_iters=n, after_pgo=False)
        jax.block_until_ready(out)

    for n in (1, 15):
        print(f"mapping_loop_cached n={n:<3}           {timeit(lambda: run_ml(n)):8.2f} ms", flush=True)

    # eikonal off: isolates the stencil's share of the scan
    import dataclasses as _dc
    mcfg_ne = _dc.replace(mcfg, ekional_loss_on=False)

    def run_ml_ne(n):
        out = mp.mapping_loop_cached(lm2, mc, params, opt_state, pool2, mcfg_ne,
                                     key, jnp.float32(1.0), jnp.asarray(True),
                                     num_iters=n, after_pgo=False)
        jax.block_until_ready(out)

    for n in (1, 15):
        print(f"mapping_loop_cached NOEIK n={n:<3}     {timeit(lambda: run_ml_ne(n)):8.2f} ms", flush=True)

    # (c) assign_local_to_global
    def run_as():
        st = jax.tree.map(lambda x: x + 0 if hasattr(x, 'dtype') else x, state2)
        out = npts.assign_local_to_global(st, lm2, mc, system._travel)
        jax.block_until_ready(out)

    print(f"assign_local_to_global              {timeit(run_as):8.2f} ms", flush=True)

    # (d) the full fused program
    def run_uat():
        out = system._update_and_train(
            system.state, system.lm, system.pool, key,
            (system.geo_params, None, None), system._travel,
            system._stop_count, points, valid, pose_R, pose_t,
            jnp.asarray(True), jnp.float32(0.5),
            jnp.int32(system.frame_id), None, None,
            jnp.float32(1.0), False)
        jax.block_until_ready(out)
        (system.state, system.lm, system.pool, _p, _o,
         system._travel, system._stop_count, _h) = out

    print(f"update_and_train FULL               {timeit(run_uat):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
