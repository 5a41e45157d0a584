"""Per-program timing on the real device at bench-identical shapes.

Times each jitted program of the per-frame pipeline in isolation (median of
repeats, block_until_ready) so optimization effort lands on real costs.
Run: python experiments/profile_stages.py
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

N_RAYS = 1 << 15


def t(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return np.median(times) * 1e3, out


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
    print(f"map count={int(state.count)} local={int(lm.count)} "
          f"K={offsets.shape[0]} bs={cfg.bs} src={cfg.source_bucket}")

    # ---- frame_update components ----
    frame_pts = jnp.asarray(rng.uniform(-18, 18, (N_RAYS, 3)).astype(np.float32))
    frame_valid = jnp.ones((N_RAYS,), bool)

    ms, batch = t(jax.jit(lambda k, p, v: sample_rays(k, sc, p, v, None, None)),
                  key, frame_pts, frame_valid)
    print(f"sample_rays            {ms:7.2f} ms  (out {batch.coord.shape})")

    surf_mask = batch.valid & (jnp.abs(batch.sdf_label) < 0.6)
    ms, state2 = t(npts.map_insert, state, mc, batch.coord, surf_mask,
                   jnp.int32(1), travel,
                   downsample_table_size=cfg.downsample_hash_size,
                   insert_bucket=min(cfg.frame_bucket, batch.coord.shape[0]))
    print(f"map_insert             {ms:7.2f} ms")

    ms, lm2 = t(npts.build_local_map, state, mc, jnp.zeros(3), jnp.int32(0), travel)
    print(f"build_local_map        {ms:7.2f} ms")

    ms, newm = t(mp.compute_new_sample_mask, lm, mc, mcfg, batch.coord,
                 batch.sdf_label, batch.valid)
    print(f"compute_new_sample_mask{ms:7.2f} ms")

    pool = mp.init_pool(mcfg, 1)
    ms, pool = t(mp.pool_append, pool, mcfg, batch.coord, batch.coord,
                 batch.sdf_label, batch.weight, batch.valid, jnp.int32(0), newm)
    print(f"pool_append            {ms:7.2f} ms")

    ms, _ = t(mp.pool_filter, pool, mcfg, jnp.zeros(3))
    print(f"pool_filter            {ms:7.2f} ms")

    # ---- mapping loop ----
    params = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                geo=geo, sem=None, color=None)
    opt_state = mp._fused_adam(mcfg)[0](params)
    args = dict(num_iters=int(cfg.iters))
    ms, _ = t(mp.mapping_loop, lm, mc, params, opt_state, pool, mcfg, offsets,
              key, jnp.float32(1.0), jnp.asarray(True), jnp.asarray(False), **args)
    print(f"mapping_loop x{cfg.iters:2d}       {ms:7.2f} ms  ({ms/cfg.iters:5.2f} ms/iter)")

    import dataclasses
    mcfg_ne = dataclasses.replace(mcfg, ekional_loss_on=False)
    ms, _ = t(mp.mapping_loop, lm, mc, params, opt_state, pool, mcfg_ne, offsets,
              key, jnp.float32(1.0), jnp.asarray(True), jnp.asarray(False), **args)
    print(f"  no-eikonal           {ms:7.2f} ms  ({ms/cfg.iters:5.2f} ms/iter)")

    for bs_try in (4096, 8192):
        mcfg_b = dataclasses.replace(mcfg, bs=bs_try)
        ms, _ = t(mp.mapping_loop, lm, mc, params, opt_state, pool, mcfg_b, offsets,
                  key, jnp.float32(1.0), jnp.asarray(True), jnp.asarray(False), **args)
        print(f"  bs={bs_try:5d}            {ms:7.2f} ms  ({ms/cfg.iters:5.2f} ms/iter)")

    # ---- tracker ----
    src = jnp.asarray(rng.uniform(-15, 15, (cfg.source_bucket, 3)).astype(np.float32))
    src_valid = jnp.ones((cfg.source_bucket,), bool)
    R0 = jnp.eye(3, dtype=jnp.float32)
    t0v = jnp.zeros((3,), jnp.float32)
    ms, res = t(trk.track_frame, lm, mc, tc, geo, cfg.sdf_scale, offsets,
                src, src_valid, R0, t0v)
    iters = int(res.iterations)
    print(f"track_frame            {ms:7.2f} ms  ({iters} iters -> {ms/max(iters+1,1):5.2f} ms/iter)")

    import dataclasses as dc
    for n_it in (1, 5):
        tc_n = dc.replace(tc, reg_iter_n=n_it)
        ms, res = t(trk.track_frame, lm, mc, tc_n, geo, cfg.sdf_scale, offsets,
                    src, src_valid, R0, t0v)
        print(f"  reg_iter_n={n_it:2d}        {ms:7.2f} ms")

    # knn + interpolate alone at training batch shape
    q = jnp.asarray(rng.uniform(-15, 15, (cfg.bs, 3)).astype(np.float32))

    @jax.jit
    def knn_only(lm, q):
        return npts.knn_search(lm, mc, q, offsets).lidx

    ms, lidx = t(knn_only, lm, q)
    print(f"knn_search bs={cfg.bs}  {ms:7.2f} ms")

    @jax.jit
    def interp_fwd(lm, q, lidx):
        f, _, w, _ = npts.interpolate_features(lm, mc, q, lidx)
        s, _ = dec.blended_sdf(geo, f, w, mc.weighted_first, cfg.sdf_scale)
        return s

    ms, _ = t(interp_fwd, lm, q, lidx)
    print(f"interp+decode fwd      {ms:7.2f} ms")

    @jax.jit
    def train_grad(feats, q, lidx):
        def loss(f):
            lmf = lm._replace(geo_features=f)
            gf, _, w, _ = npts.interpolate_features(lmf, mc, q, lidx)
            s, _ = dec.blended_sdf(geo, gf, w, mc.weighted_first, cfg.sdf_scale)
            return jnp.sum(s**2)
        return jax.grad(loss)(feats)

    ms, _ = t(train_grad, lm.geo_features, q, lidx)
    print(f"feature-grad bwd       {ms:7.2f} ms  (scatter-add into (L+1,F))")


if __name__ == "__main__":
    main()
