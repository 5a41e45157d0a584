"""Attribute the fused update_and_train time: frame_update vs mapping_loop vs
assign_local_to_global, via short dependent chains.
Run: PYTHONPATH=/root/.axon_site:. python experiments/profile_update.py
"""

import time

import numpy as np

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops.sampler import SamplerConfig, sample_rays
from pin_slam_tpu.slam import mapper as mp

N = 6


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3


def chain(body, carry0, label, n=N):
    def make(m):
        @jax.jit
        def run(carry):
            c, _ = jax.lax.scan(lambda c, i: (body(c, i), ()), carry,
                                jnp.arange(m))
            return c
        return run

    t_full = timed(make(n), carry0)
    t_base = timed(make(1), carry0)
    print(f"{label:<40} {(t_full-t_base)/(n-1):8.2f} ms/call", flush=True)


def main():
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

    mc = npts.MapConfig.from_config(cfg)
    mcfg = mp.MapperConfig.from_config(cfg)
    sc = SamplerConfig.from_config(cfg)
    offsets = jnp.asarray(npts.neighbor_offsets(cfg.num_nei_cells, cfg.search_alpha))
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    pts = rng.uniform(-20, 20, size=(34_000, 3)).astype(np.float32)
    travel = jnp.zeros((1 << 16,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((34_000,), bool),
                            jnp.int32(0), travel,
                            downsample_table_size=cfg.downsample_hash_size)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    geo = dec.init_decoder(jax.random.PRNGKey(1), cfg.feature_dim + 3,
                           cfg.geo_mlp_hidden_dim, cfg.geo_mlp_level, 1,
                           cfg.mlp_bias_on)

    N_RAYS = 1 << 15
    frame_pts = jnp.asarray(rng.uniform(-18, 18, (N_RAYS, 3)).astype(np.float32))
    frame_valid = jnp.ones((N_RAYS,), bool)
    batch = sample_rays(key, sc, frame_pts, frame_valid, None, None)
    nm = mp.compute_new_sample_mask(lm, mc, mcfg, batch.coord, batch.sdf_label,
                                    batch.valid)
    pool = mp.pool_append(mp.init_pool(mcfg, 1), mcfg, batch.coord, batch.coord,
                          batch.sdf_label, batch.weight, batch.valid,
                          jnp.int32(0), nm)
    params = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                geo=geo, sem=None, color=None)
    opt_state = mp.init_opt_state(mcfg, params)

    # mapping_loop (fast path) alone
    def b_map(carry, i):
        p, o = carry
        _, p, o, _ = mp.mapping_loop(lm, mc, p, o, pool, mcfg, offsets,
                                     jax.random.fold_in(key, i),
                                     jnp.float32(1.0), jnp.asarray(True),
                                     jnp.asarray(False), num_iters=int(cfg.iters))
        return (p, o)

    chain(b_map, (params, opt_state), f"mapping_loop fast x{cfg.iters}", n=4)

    # assign_local_to_global alone (non-donated inside scan)
    def b_assign(carry, i):
        st = carry
        lmx = lm._replace(geo_features=lm.geo_features + 1e-9 * i)
        return npts.assign_local_to_global(st, lmx, mc, travel)

    chain(b_assign, state, "assign_local_to_global")

    # build_local_map after the span-nonzero change
    def b_blm(carry, i):
        org = carry
        lm2 = npts.build_local_map(state, mc, org, jnp.int32(0), travel)
        return org + 1e-9 * lm2.count

    chain(b_blm, jnp.zeros(3), "build_local_map")

    # map_insert at the new 131k candidate width
    Sn, nst = sc.ray_sample_count, 1 + sc.surface_sample_n
    cw = batch.coord.reshape(-1, Sn, 3)[:, :nst].reshape(-1, 3)
    vs = batch.valid.reshape(-1, Sn)[:, :nst].reshape(-1)

    def b_ins(carry, i):
        st = carry
        return npts.map_insert(st, mc, cw, vs, i, travel,
                               downsample_table_size=cfg.downsample_hash_size,
                               insert_bucket=1 << 15)

    chain(b_ins, state, "map_insert (131k cands)")

    # sampler + new mask + pool append together
    def b_prep(carry, i):
        pl = carry
        b = sample_rays(jax.random.fold_in(key, i), sc, frame_pts, frame_valid,
                        None, None)
        m = mp.compute_new_sample_mask(lm, mc, mcfg, b.coord, b.sdf_label, b.valid)
        return mp.pool_append(pl, mcfg, b.coord, b.coord, b.sdf_label, b.weight,
                              b.valid, i, m)

    chain(b_prep, pool, "sample+newmask+pool_append")


if __name__ == "__main__":
    main()
