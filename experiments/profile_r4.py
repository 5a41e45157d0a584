"""Round-4 composition probe: true per-iter scan cost + fixed overhead of
mapping_loop_cached, and append_knn piece costs, at bench shapes.

Timing discipline: the axon tunnel's block_until_ready can return without
blocking (verified r4), so every measurement forces a VALUE fetch and derives
costs from the SLOPE between two repetition counts (cancels RTT + dispatch).

Run: python experiments/profile_r4.py
"""

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

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.slam import mapper as mp


def fetch_ms(fn, *args, reps=4):
    """min wall ms of fn(*args) INCLUDING a forced scalar fetch."""
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
    cfg = Config()
    cfg.map_capacity = 1 << 18
    cfg.local_map_capacity = 1 << 16
    cfg.buffer_size = 1 << 21
    cfg.pool_capacity = 1 << 21
    cfg.downsample_hash_size = 1 << 19
    cfg.use_brick_hash = False  # hand-rolled probes assume the legacy per-cell table
    cfg._derive()
    mc = npts.MapConfig.from_config(cfg)
    mcfg = mp.MapperConfig.from_config(cfg)
    offsets = jnp.asarray(npts.neighbor_offsets(cfg.num_nei_cells, cfg.search_alpha))
    print(f"template K={offsets.shape[0]} local L={mc.local_capacity}", flush=True)

    rng = np.random.default_rng(0)
    # synthetic surface-ish map: points on a plane + clutter so hash cells fill
    n_pts = 36000
    pts = np.concatenate([
        np.column_stack([rng.uniform(-18, 18, n_pts // 2),
                         rng.uniform(-18, 18, n_pts // 2),
                         0.02 * rng.standard_normal(n_pts // 2)]),
        rng.uniform(-18, 18, size=(n_pts // 2, 3))]).astype(np.float32)
    travel = jnp.zeros((1 << 16,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts),
                            jnp.ones((pts.shape[0],), bool), jnp.int32(0), travel,
                            downsample_table_size=cfg.downsample_hash_size)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)

    # fill a pool with plausible rows
    S, n_rays = 7, 1 << 15
    M = n_rays * S
    coords = jnp.asarray(
        pts[rng.integers(0, pts.shape[0], M)]
        + rng.normal(0, 0.5, size=(M, 3)).astype(np.float32))
    out = mp.append_knn(lm, mc, offsets, coords, S, near_count=4)
    g, w, v = out
    pool = mp.init_pool(mcfg)
    pool = mp.pool_append(
        pool, mcfg, coords, coords, jnp.zeros((M,)),
        jnp.ones((M,)), jnp.ones((M,), bool), jnp.int32(1),
        jnp.zeros((M,), bool), None, None, g, w, v)

    L = mc.local_capacity
    featsC = jnp.concatenate([lm.geo_features, jnp.zeros((L + 1, 1))], axis=1)
    from pin_slam_tpu.models import decoder as dec
    geo = dec.init_decoder(jax.random.PRNGKey(1), cfg.feature_dim + 3,
                           cfg.geo_mlp_hidden_dim, cfg.geo_mlp_level, 1)
    params = mp.TrainableParams(features=featsC, color_features=None,
                                geo=geo, sem=None, color=None)
    opt = mp.init_opt_state(mcfg, params)
    key = jax.random.PRNGKey(0)
    one = jnp.ones((), bool)

    def loop(T, uk):
        f = lambda: mp.mapping_loop_cached(
            lm, mc, params, opt, pool, mcfg, key, jnp.float32(1.0), one,
            num_iters=T, use_kernel=uk)
        return f

    for uk in (False, True):
        tA = fetch_ms(loop(15, uk))
        tB = fetch_ms(loop(45, uk))
        per = (tB - tA) / 30.0
        fixed = tA - 15 * per
        print(f"mapping_loop_cached[kernel={uk}]: per-iter {per:6.2f} ms; "
              f"fixed (pre/post + RTT) {fixed:6.1f} ms; T=15 total {tA:6.1f}",
              flush=True)

    # append_knn slope via R-chain
    def ak_chain(R):
        @jax.jit
        def f(coords):
            def body(i, acc):
                g, w, v = mp.append_knn(lm, mc, offsets,
                                        coords + 0.001 * i, S, near_count=4)
                return acc + jnp.sum(w[:, 0]) + jnp.sum(v)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0))
        return f

    t1 = fetch_ms(ak_chain(2), coords)
    t2 = fetch_ms(ak_chain(6), coords)
    print(f"append_knn: per-call {(t2 - t1) / 4.0:6.2f} ms", flush=True)

    # probe-only (gather rows + dist2) vs full, far block only
    from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash
    c3 = coords.reshape(n_rays, S, 3)
    far = c3[:, 4:].reshape(-1, 3)

    def probe_chain(R):
        @jax.jit
        def f(far):
            def body(i, acc):
                fp = far + 0.001 * i
                grid = grid_coords(fp, mc.voxel_size)
                cells = grid[:, None, :] + offsets[None, :, :]
                h = spatial_hash(cells, mc.local_hash_size)
                rows = lm.hash_rows[h]
                d = rows[..., :3] - fp[:, None, :]
                return acc + jnp.sum(d * d)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0))
        return f

    t1 = fetch_ms(probe_chain(2), far)
    t2 = fetch_ms(probe_chain(6), far)
    print(f"far probe gather+dist2 only (98k x {offsets.shape[0]}): "
          f"{(t2 - t1) / 4.0:6.2f} ms", flush=True)

    # far _probe_rank (adds k-min + one-hot select + validity)
    def rank_chain(R):
        @jax.jit
        def f(far):
            def body(i, acc):
                g, p, v = mp._probe_rank(lm, mc, offsets, far + 0.001 * i,
                                         (far + 0.001 * i)[:, None, :], 6)
                return acc + jnp.sum(p) + jnp.sum(g)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0))
        return f

    t1 = fetch_ms(rank_chain(2), far)
    t2 = fetch_ms(rank_chain(6), far)
    print(f"far _probe_rank full: {(t2 - t1) / 4.0:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
