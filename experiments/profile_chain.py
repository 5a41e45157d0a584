"""True per-call device cost of each pipeline function, measured by chaining
N dependent calls inside one jitted program (immune to tunnel sync semantics).
Run: PYTHONPATH=/root/.axon_site:. python experiments/profile_chain.py
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
from pin_slam_tpu.slam import tracker as trk

N_CHAIN = 16


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3


def chain(body, carry0, label, n=N_CHAIN):
    def make(m):
        @jax.jit
        def run(carry):
            def step(c, i):
                return body(c, i), ()
            c, _ = jax.lax.scan(step, carry, jnp.arange(m))
            return c
        return run

    t_full = timed(make(n), carry0)
    t_base = timed(make(1), carry0)
    per = (t_full - t_base) / (n - 1)
    print(f"{label:<36} {per:8.2f} ms/call", flush=True)


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
    tc = trk.TrackerConfig.from_config(cfg)
    offsets = jnp.asarray(npts.neighbor_offsets(cfg.num_nei_cells, cfg.search_alpha))
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    n_pts = 34_000
    pts = rng.uniform(-20, 20, size=(n_pts, 3)).astype(np.float32)
    travel = jnp.zeros((1 << 16,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((n_pts,), bool),
                            jnp.int32(0), travel,
                            downsample_table_size=cfg.downsample_hash_size)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    geo = dec.init_decoder(jax.random.PRNGKey(1), cfg.feature_dim + 3,
                           cfg.geo_mlp_hidden_dim, cfg.geo_mlp_level, 1,
                           cfg.mlp_bias_on)

    N_RAYS = 1 << 15
    frame_pts = jnp.asarray(rng.uniform(-18, 18, (N_RAYS, 3)).astype(np.float32))
    frame_valid = jnp.ones((N_RAYS,), bool)

    # ---- sample_rays ----
    def b_sample(carry, i):
        p = carry
        batch = sample_rays(jax.random.fold_in(key, i), sc, p, frame_valid, None, None)
        return p + 1e-9 * batch.coord.mean()

    chain(b_sample, frame_pts, "sample_rays (32k rays)")

    batch = sample_rays(key, sc, frame_pts, frame_valid, None, None)
    surf_mask = batch.valid & (jnp.abs(batch.sdf_label) < 0.6)

    # ---- map_insert ----
    def b_insert(carry, i):
        st = carry
        st2 = npts.map_insert(st, mc, batch.coord, surf_mask, i, travel,
                              downsample_table_size=cfg.downsample_hash_size,
                              insert_bucket=1 << 15)
        return st2

    chain(b_insert, state, "map_insert (229k cands)")

    # ---- build_local_map ----
    def b_blm(carry, i):
        org = carry
        lm2 = npts.build_local_map(state, mc, org, jnp.int32(0), travel)
        return org + 1e-9 * lm2.attr_rows[0, 0] + 1e-9 * lm2.count

    chain(b_blm, jnp.zeros(3), "build_local_map (cap 1M -> L 131k)")

    # ---- _pack_hash_rows alone ----
    def b_pack(carry, i):
        org = carry
        hr = npts._pack_hash_rows(mc, lm.positions + org, lm.count)
        return org + 1e-9 * hr[0, 0]

    chain(b_pack, jnp.zeros(3), "_pack_hash_rows (131k -> 1M slots)")

    # ---- new sample mask ----
    def b_nm(carry, i):
        c = carry
        nm = mp.compute_new_sample_mask(lm, mc, mcfg, batch.coord + c,
                                        batch.sdf_label, batch.valid)
        return c + 1e-9 * nm.sum()

    chain(b_nm, jnp.zeros(3), "compute_new_sample_mask (229k)")

    # ---- pool_append ----
    pool = mp.init_pool(mcfg, 1)
    nm = mp.compute_new_sample_mask(lm, mc, mcfg, batch.coord, batch.sdf_label,
                                    batch.valid)

    def b_pa(carry, i):
        pl = carry
        return mp.pool_append(pl, mcfg, batch.coord, batch.coord, batch.sdf_label,
                              batch.weight, batch.valid, i, nm)

    chain(b_pa, pool, "pool_append (229k rows)")

    # ---- pool_filter ----
    pool_full = mp.pool_append(pool, mcfg, batch.coord, batch.coord,
                               batch.sdf_label, batch.weight, batch.valid,
                               jnp.int32(0), nm)

    def b_pf(carry, i):
        pl = carry
        return mp.pool_filter(pl, mcfg, jnp.zeros(3) + 1e-9 * i)

    chain(b_pf, pool_full, "pool_filter (2M pool)", n=8)

    # ---- tracker one GN iteration (via reg_iter_n chain trick) ----
    src = jnp.asarray(rng.uniform(-15, 15, (cfg.source_bucket, 3)).astype(np.float32))
    src_valid = jnp.ones((cfg.source_bucket,), bool)

    import dataclasses
    for n_it in (2, 10):
        tc_n = dataclasses.replace(tc, reg_iter_n=n_it, term_thre_deg=0.0,
                                   term_thre_m=0.0)

        def b_trk(carry, i, tc_n=tc_n):
            R0, t0 = carry
            res = trk.track_frame(lm, mc, tc_n, geo, cfg.sdf_scale, offsets,
                                  src, src_valid, R0, t0)
            return (res.R, res.t * 1e-9)

        chain(b_trk, (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)),
              f"track_frame reg_iter_n={n_it}", n=8)


if __name__ == "__main__":
    main()
