"""append_knn variants at bench shapes: where do the extra ~45 ms go?

Run: python experiments/profile_appendknn.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash


def timeit(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)) * 1e3 - 24.0


def main():
    cfg = Config()
    cfg.map_capacity = 1 << 20
    cfg.local_map_capacity = 1 << 17
    cfg.buffer_size = 1 << 22
    cfg.downsample_hash_size = 1 << 19
    cfg.use_brick_hash = False  # hand-rolled probes assume the legacy per-cell table
    cfg._derive()
    mc = npts.MapConfig.from_config(cfg)
    offsets = jnp.asarray(npts.neighbor_offsets(cfg.num_nei_cells, cfg.search_alpha))

    rng = np.random.default_rng(0)
    n_pts = 34_000
    pts = rng.uniform(-20, 20, size=(n_pts, 3)).astype(np.float32)
    travel = jnp.zeros((1 << 16,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((n_pts,), bool),
                            jnp.int32(0), travel,
                            downsample_table_size=cfg.downsample_hash_size)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    jax.block_until_ready(lm.hash_rows)

    M = 229376
    coords = jnp.asarray(rng.uniform(-18, 18, size=(M, 3)).astype(np.float32))
    jax.block_until_ready(coords)

    ak = jax.jit(lambda c: mp.append_knn(lm, mc, offsets, c))
    print(f"append_knn full           {timeit(lambda: jax.block_until_ready(ak(coords))):8.2f} ms", flush=True)

    L = mc.local_capacity

    @jax.jit
    def lean(c):
        grid = grid_coords(c, mc.voxel_size)
        cells = grid[:, None, :] + offsets[None, :, :]
        h = spatial_hash(cells, mc.local_hash_size)
        rows = lm.hash_rows[h]
        nbr = rows[..., :3]
        lidx = rows[..., 3].astype(jnp.int32)
        d = nbr - c[:, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        valid = (lidx < L) & (dist2 <= mc.max_valid_dist2)
        dist2 = jnp.where(valid, dist2, npts._INVALID_DIST2)
        sel = mp.exact_k_min(dist2, 6)
        lidx_k = jnp.take_along_axis(jnp.where(valid, lidx, L), sel, axis=1)
        ok = lidx_k < L
        gidx = jnp.where(ok, lm.indices[jnp.minimum(lidx_k, L)], -1)
        return gidx

    print(f"lean (gidx only)          {timeit(lambda: jax.block_until_ready(lean(coords))):8.2f} ms", flush=True)

    @jax.jit
    def lean_noconvert(c):
        grid = grid_coords(c, mc.voxel_size)
        cells = grid[:, None, :] + offsets[None, :, :]
        h = spatial_hash(cells, mc.local_hash_size)
        rows = lm.hash_rows[h]
        nbr = rows[..., :3]
        lidx = rows[..., 3].astype(jnp.int32)
        d = nbr - c[:, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        valid = (lidx < L) & (dist2 <= mc.max_valid_dist2)
        dist2 = jnp.where(valid, dist2, npts._INVALID_DIST2)
        sel = mp.exact_k_min(dist2, 6)
        return jnp.take_along_axis(jnp.where(valid, lidx, L), sel, axis=1)

    print(f"lean (lidx only)          {timeit(lambda: jax.block_until_ready(lean_noconvert(coords))):8.2f} ms", flush=True)

    # convert cost alone
    lidx_k = lean_noconvert(coords)
    jax.block_until_ready(lidx_k)
    conv = jax.jit(lambda lk: jnp.where(lk < L, lm.indices[jnp.minimum(lk, L)], -1))
    print(f"lidx->gidx convert        {timeit(lambda: jax.block_until_ready(conv(lidx_k))):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
