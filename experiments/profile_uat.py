"""Sub-stage breakdown of _update_and_train (the real 247 ms of bench.py).

Measures, at steady-state bench shapes (each number includes a ~24 ms tunnel
round trip — compare against the nop line):
  sample_rays / map_insert / build_local_map / new_mask / pool_append /
  mapping_loop, and inside mapping_loop: the batched knn, the attr gather,
  the geometry pass, the scan body.

Run: python experiments/profile_uat.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from bench import make_world, sensor_pose, lidar_scan, N_RAYS
from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.ops.voxel import pad_to
from pin_slam_tpu.ops.sampler import sample_rays
from pin_slam_tpu.slam.pipeline import SlamSystem
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.models import decoder as dec


def timeit(fn, reps=5):
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
    cfg.use_brick_hash = False  # hand-rolled probes assume the legacy per-cell table
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

    mc, mcfg, sc = system.mc, system.mcfg, system.sc
    offsets = system.offsets
    state, lm, pool = system.state, system.lm, system.pool
    geo = system.geo_params
    travel = system._travel
    key = jax.random.PRNGKey(7)

    frame = make_frame(6)
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)
    pose_R = jnp.asarray(system.cur_pose[:3, :3].astype(np.float32))
    pose_t = jnp.asarray(system.cur_pose[:3, 3].astype(np.float32))
    fid = jnp.int32(system.frame_id)
    jax.block_until_ready((points, valid))

    tiny = jnp.zeros((8,), jnp.float32)
    nop = jax.jit(lambda x: x + 1.0)
    print(f"nop (round trip)              {timeit(lambda: np.asarray(nop(tiny))):8.2f} ms")

    # ---- frame_update pieces ----
    sr = jax.jit(lambda k: sample_rays(k, sc, points, valid, None, None))
    print(f"sample_rays                   {timeit(lambda: jax.block_until_ready(sr(key))):8.2f} ms")
    batch = sr(key)
    coord_world = batch.coord @ pose_R.T + pose_t
    Sn, n_surf_tot = sc.ray_sample_count, 1 + sc.surface_sample_n
    cw_surf = coord_world.reshape(-1, Sn, 3)[:, :n_surf_tot].reshape(-1, 3)
    vld_surf = batch.valid.reshape(-1, Sn)[:, :n_surf_tot].reshape(-1)
    jax.block_until_ready((cw_surf, vld_surf))
    print(f"  (samples {coord_world.shape[0]}, surf {cw_surf.shape[0]})")

    mi = partial(npts.map_insert, downsample_table_size=cfg.downsample_hash_size,
                 insert_bucket=min(cfg.frame_bucket, cw_surf.shape[0]))
    print(f"map_insert                    {timeit(lambda: jax.block_until_ready(mi(state, mc, cw_surf, vld_surf, fid, travel))):8.2f} ms")

    blm = lambda: jax.block_until_ready(npts.build_local_map(state, mc, pose_t, fid, travel))
    print(f"build_local_map               {timeit(blm):8.2f} ms")

    nm = jax.jit(lambda: mp.compute_new_sample_mask(lm, mc, mcfg, coord_world,
                                                    batch.sdf_label, batch.valid))
    print(f"compute_new_sample_mask       {timeit(lambda: jax.block_until_ready(nm())):8.2f} ms")

    pa = lambda: jax.block_until_ready(mp.pool_append(
        pool, mcfg, coord_world, batch.coord, batch.sdf_label, batch.weight,
        batch.valid, fid, jnp.zeros_like(batch.valid)))
    print(f"pool_append                   {timeit(pa):8.2f} ms")

    # ---- mapping_loop ----
    params = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                geo=geo, sem=None, color=None)
    opt_state = mp.init_opt_state(mcfg, params)

    def ml(n_iters):
        out = mp.mapping_loop(lm, mc, params, opt_state, pool, mcfg, offsets,
                              key, jnp.float32(1.0), jnp.asarray(True),
                              jnp.asarray(False), num_iters=n_iters)
        jax.block_until_ready(out)

    for n in (1, 5, 15):
        print(f"mapping_loop iters={n:<3}        {timeit(lambda: ml(n)):8.2f} ms")

    # ---- inside mapping_loop (fast path pieces) at T=15, B=16384 ----
    T, B = 15, mcfg.bs
    idx_all = jax.random.randint(key, (T, B), 0, jnp.maximum(pool.fill, 1))

    rows_fn = jax.jit(lambda idx: pool.rows[idx.reshape(-1)])
    print(f"pool row gather (T*B)         {timeit(lambda: jax.block_until_ready(rows_fn(idx_all))):8.2f} ms")
    rows = rows_fn(idx_all)
    coord = rows[:, :3]
    jax.block_until_ready(coord)

    knn_fn = jax.jit(lambda c: npts.knn_search(lm, mc, c, offsets))
    print(f"knn_search (T*B={T*B})      {timeit(lambda: jax.block_until_ready(knn_fn(coord))):8.2f} ms")
    knn = knn_fn(coord)
    jax.block_until_ready(knn)

    # knn components
    from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash
    K = offsets.shape[0]
    print(f"  (K template = {K})")

    @jax.jit
    def probe_only(c):
        grid = grid_coords(c, mc.voxel_size)
        cells = grid[:, None, :] + offsets[None, :, :]
        h = spatial_hash(cells, mc.local_hash_size)
        return lm.hash_rows[h]

    print(f"  hash probe gather (T*B,K)   {timeit(lambda: jax.block_until_ready(probe_only(coord))):8.2f} ms")

    rows_bk = probe_only(coord)
    jax.block_until_ready(rows_bk)

    @jax.jit
    def rank_only(c, rows_bk):
        nbr = rows_bk[..., :3]
        lidx = rows_bk[..., 3].astype(jnp.int32)
        d = nbr - c[:, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        valid_ = (lidx < mc.local_capacity) & (dist2 <= mc.max_valid_dist2)
        dist2 = jnp.where(valid_, dist2, npts._INVALID_DIST2)
        _, sel = jax.lax.approx_max_k(-dist2, mc.nn_k)
        return jnp.take_along_axis(jnp.where(valid_, lidx, mc.local_capacity), sel, axis=1)

    print(f"  dist2+topk (T*B,K)          {timeit(lambda: jax.block_until_ready(rank_only(coord, rows_bk))):8.2f} ms")

    attr_fn = jax.jit(lambda lidx: lm.attr_rows[jnp.where(lidx < mc.local_capacity, lidx, mc.local_capacity)])
    print(f"  attr gather (T*B,k)         {timeit(lambda: jax.block_until_ready(attr_fn(knn.lidx))):8.2f} ms")

    feat_fn = jax.jit(lambda lidx: lm.geo_features[jnp.where(lidx < mc.local_capacity, lidx, mc.local_capacity)])
    print(f"  feature gather (T*B,k)      {timeit(lambda: jax.block_until_ready(feat_fn(knn.lidx))):8.2f} ms")


if __name__ == "__main__":
    main()
