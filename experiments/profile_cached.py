"""Isolate the stage-2 regression: time append_knn, pool_append,
mapping_loop_cached, and their internals at bench shapes.

Run: python experiments/profile_cached.py
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


def timeit(fn, reps=5):
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
    print("setup done", flush=True)

    mc, mcfg, sc = system.mc, system.mcfg, system.sc
    offsets = system.offsets
    state, lm, pool = system.state, system.lm, system.pool
    key = jax.random.PRNGKey(7)

    frame = make_frame(6)
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)
    pose_R = jnp.asarray(system.cur_pose[:3, :3].astype(np.float32))
    pose_t = jnp.asarray(system.cur_pose[:3, 3].astype(np.float32))
    batch = jax.jit(lambda k: sample_rays(k, sc, points, valid, None, None))(key)
    coord_world = batch.coord @ pose_R.T + pose_t
    jax.block_until_ready(coord_world)

    ak = jax.jit(lambda c: mp.append_knn(
        lm, mc, offsets, c, sc.ray_sample_count,
        near_count=1 + sc.surface_sample_n))
    print(f"append_knn (grouped)        {timeit(lambda: jax.block_until_ready(ak(coord_world))):8.2f} ms", flush=True)

    # append_knn internals
    from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash

    @jax.jit
    def probe(c):
        grid = grid_coords(c, mc.voxel_size)
        cells = grid[:, None, :] + offsets[None, :, :]
        h = spatial_hash(cells, mc.local_hash_size)
        rows = lm.hash_rows[h]
        d = rows[..., :3] - c[:, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        lidx = rows[..., 3].astype(jnp.int32)
        v = (lidx < mc.local_capacity) & (dist2 <= mc.max_valid_dist2)
        return jnp.where(v, dist2, npts._INVALID_DIST2), lidx, rows[..., :3]

    d2, lidx, nbr = probe(coord_world)
    jax.block_until_ready((d2, lidx, nbr))
    print(f"  probe (M,33)              {timeit(lambda: jax.block_until_ready(probe(coord_world))):8.2f} ms", flush=True)

    ekm = jax.jit(lambda d: mp.exact_k_min(d, 6))
    print(f"  exact_k_min (M,33)        {timeit(lambda: jax.block_until_ready(ekm(d2))):8.2f} ms", flush=True)
    sel = ekm(d2)
    jax.block_until_ready(sel)

    tal = jax.jit(lambda: (jnp.take_along_axis(jnp.where(lidx < mc.local_capacity, lidx, mc.local_capacity), sel, axis=1),
                           jnp.take_along_axis(nbr, sel[..., None], axis=1)))
    print(f"  take_along sel            {timeit(lambda: jax.block_until_ready(tal())):8.2f} ms", flush=True)

    amk = jax.jit(lambda d: jax.lax.approx_max_k(-d, 6))
    print(f"  (approx_max_k for compare){timeit(lambda: jax.block_until_ready(amk(d2))):8.2f} ms", flush=True)

    # mapping_loop_cached and a stripped variant
    F = mc.feature_dim
    cap = mc.capacity
    feats9 = jnp.concatenate([state.geo_features, jnp.zeros((cap + 1, 1), jnp.float32)], 1)
    params = mp.TrainableParams(features=feats9, color_features=None,
                                geo=system.geo_params, sem=None, color=None)
    opt_state = mp.init_opt_state(mcfg, params)
    jax.block_until_ready((params, opt_state))

    def mlc(n):
        out = mp.mapping_loop_cached(params, opt_state, pool, state.attr_rows,
                                     mcfg, key, jnp.float32(1.0),
                                     jnp.asarray(True), num_iters=n,
                                     after_pgo=False)
        jax.block_until_ready(out)

    for n in (1, 5, 15):
        print(f"mapping_loop_cached n={n:<3}   {timeit(lambda: mlc(n), reps=3):8.2f} ms", flush=True)

    # pieces: the big-table gather and scatter at scan shapes
    gidx = jax.random.randint(key, (16384, 6), 0, cap).astype(jnp.int32)
    g9 = jax.random.normal(key, (16384, 6, 9), jnp.float32)

    def loop(body, init):
        @jax.jit
        def run(*a):
            return jax.lax.fori_loop(0, 15, lambda i, c: body(i, c, *a), init)
        return run

    gfn = loop(lambda i, c, t, ix: c + jnp.sum(t[(ix + i) % cap][:, :, 0]), jnp.float32(0))
    print(f"  15x gather (16384,6) from (2^20,9) {timeit(lambda: jax.block_until_ready(gfn(feats9, gidx))):8.2f} ms", flush=True)

    sfn = loop(lambda i, c, ix, g: c.at[(ix + i) % cap].add(g), jnp.zeros((cap + 1, 9), jnp.float32))
    print(f"  15x scatter (16384,6,9) into (2^20,9) {timeit(lambda: jax.block_until_ready(sfn(gidx, g9))):8.2f} ms", flush=True)

    # full-table adam passes
    m = jnp.zeros((cap + 1, 9), jnp.float32)
    afn = loop(lambda i, c, g: jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b + i * 0.0, c, (g, g, g)),
               (m, m, m))
    print(f"  15x 3-way dense pass over (2^20,9) {timeit(lambda: jax.block_until_ready(afn(m))):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
