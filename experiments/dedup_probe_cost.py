"""Measure the pieces of a voxel-dedup group-probe for the far free-space
block (VERDICT r3 next #1): sort/scan/scatter machinery cost vs the
probe-row savings, at bench shapes on the attached device.

Timing: slope between two repetition counts with a forced value fetch
(see profile_r4.py for why block_until_ready alone is not trusted here).
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
    cfg._derive()
    mc = npts.MapConfig.from_config(cfg)
    offsets = jnp.asarray(npts.neighbor_offsets(cfg.num_nei_cells, cfg.search_alpha))

    rng = np.random.default_rng(0)
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

    N = 98304
    # far samples with bench-like voxel duplication (~34% unique): cluster
    # samples around ray-cone geometry — draw from endpoints*ratio
    ends = pts[rng.integers(0, pts.shape[0], 1 << 15)]
    ratio = rng.uniform(0.3, 1.0, size=(1 << 15, 3))
    far = (ends[:, None, :] * ratio[:, :, None]).reshape(-1, 3).astype(np.float32)
    far = jnp.asarray(far[:N])
    vsz = mc.voxel_size

    kvox = np.unique((np.floor(np.asarray(far) / vsz).astype(np.int64)
                      @ np.array([1 << 42, 1 << 21, 1], np.int64))).size
    print(f"N={N} unique voxels={kvox} ({kvox / N:.1%})", flush=True)

    # piece 1: argsort of int32 keys
    @jax.jit
    def keyed(far):
        g = jnp.floor(far / vsz).astype(jnp.int32)
        key = ((g[:, 0] + 512) << 20) + ((g[:, 1] + 512) << 10) + (g[:, 2] + 512)
        return key

    @jax.jit
    def sort_only(far):
        key = keyed(far)
        order = jnp.argsort(key)
        return order.astype(jnp.float32).sum()

    @jax.jit
    def full_machinery(far):
        key = keyed(far)
        order = jnp.argsort(key)
        ks = key[order]
        sorted_pts = far[order]
        newrun = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        pos = jnp.arange(N)
        run_start = jax.lax.cummax(jnp.where(newrun, pos, -1))
        slot_in_run = pos - run_start
        n_g = 4
        newgrp = newrun | (slot_in_run % n_g == 0)
        gid = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
        slot = slot_in_run % n_g
        G_B = 49152
        gidc = jnp.where(gid < G_B, gid, G_B)
        probe_pts = jnp.zeros((G_B, 3)).at[jnp.where(newgrp, gidc, G_B)].set(
            sorted_pts, mode="drop")
        queries = jnp.zeros((G_B, n_g, 3)).at[gidc, slot].set(
            sorted_pts, mode="drop")
        return (probe_pts.sum() + queries.sum() + gid[-1].astype(jnp.float32))

    def chain(f, R):
        @jax.jit
        def g(far):
            def body(i, acc):
                return acc + f(far + 0.001 * i)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0))
        return g

    for name, f in [("argsort", sort_only), ("machinery(all)", full_machinery)]:
        t1 = fetch_ms(chain(f, 2), far)
        t2 = fetch_ms(chain(f, 6), far)
        print(f"{name}: {(t2 - t1) / 4.0:6.2f} ms", flush=True)

    # piece 2: _probe_rank at reduced group count (G_B, n_g=4) vs today (N, 1)
    use_k = jax.default_backend() == "tpu"
    for G, n in [(98304, 1), (49152, 4), (32768, 4), (24576, 4)]:
        q = far[:G * n].reshape(G, n, 3) if G * n <= N else \
            jnp.tile(far, (2, 1))[:G * n].reshape(G, n, 3)
        p = q[:, 0]

        def pr(p=p, q=q):
            g, ppos, v = mp._probe_rank(lm, mc, offsets, p, q, 6,
                                        use_rank_kernel=use_k)
            return g.sum() + v.sum()

        def prchain(R):
            @jax.jit
            def f(p, q):
                def body(i, acc):
                    g, ppos, v = mp._probe_rank(lm, mc, offsets, p + 0.001 * i,
                                                q + 0.001 * i, 6,
                                                use_rank_kernel=use_k)
                    return acc + jnp.sum(v) + jnp.sum(g)
                return jax.lax.fori_loop(0, R, body, jnp.float32(0))
            return f

        t1 = fetch_ms(prchain(2), p, q)
        t2 = fetch_ms(prchain(6), p, q)
        print(f"_probe_rank G={G} n={n} (rows={G * 33 / 1e6:.2f}M): "
              f"{(t2 - t1) / 4.0:6.2f} ms", flush=True)

    # piece 3: result mapback — gather N rows of (k*5) + inverse-perm scatter
    ranked = jnp.arange(49152 * 4 * 30, dtype=jnp.float32).reshape(49152 * 4, 30)
    flat = jnp.asarray(rng.integers(0, 49152 * 4, N), jnp.int32)
    order = jnp.asarray(rng.permutation(N), jnp.int32)

    @jax.jit
    def mapback(ranked, flat, order):
        out_sorted = ranked[flat]
        out = jnp.zeros((N, 30)).at[order].set(out_sorted)
        return out.sum()

    t1 = fetch_ms(chain(lambda x: mapback(ranked + x[0, 0], flat, order), 2), far)
    t2 = fetch_ms(chain(lambda x: mapback(ranked + x[0, 0], flat, order), 6), far)
    print(f"mapback gather+scatter (98k x 30): {(t2 - t1) / 4.0:6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
