"""Quantify the axon tunnel's fixed dispatch/transfer costs + mapping_loop
internals.  Run: PYTHONPATH=/root/.axon_site:. python experiments/profile_dispatch.py
"""

import dataclasses
import time

import numpy as np

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.slam import mapper as mp


def t(fn, *args, reps=7, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return np.median(times) * 1e3


def main():
    # ---- fixed costs ----
    tiny = jnp.zeros((8,), jnp.float32)

    @jax.jit
    def nop(x):
        return x + 1.0

    print(f"empty-program round trip   {t(nop, tiny):7.2f} ms")

    big_np = np.zeros((1 << 15, 4), np.float32)

    def h2d():
        return jax.block_until_ready(jnp.asarray(big_np))

    print(f"H2D 512 KB                 {t(lambda: h2d()):7.2f} ms")

    small_np = np.zeros((16,), np.float32)
    print(f"H2D 64 B                   {t(lambda: jax.block_until_ready(jnp.asarray(small_np))):7.2f} ms")

    dev = jnp.zeros((1 << 15, 4), jnp.float32) + 1
    print(f"D2H 512 KB                 {t(lambda: np.asarray(dev)):7.2f} ms")

    # two programs back-to-back, one sync at the end: does the 2nd pay again?
    @jax.jit
    def nop2(x):
        return x * 2.0

    def chain2():
        return jax.block_until_ready(nop2(nop(tiny)))

    print(f"2 chained programs, 1 sync {t(chain2):7.2f} ms")

    def chain8():
        x = tiny
        for _ in range(4):
            x = nop2(nop(x))
        return jax.block_until_ready(x)

    print(f"8 chained programs, 1 sync {t(chain8):7.2f} ms")

    # ---- mapping_loop internals ----
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
    pool = mp.init_pool(mcfg, 1)
    # fill pool with plausible rows
    P = mcfg.pool_capacity
    rows = np.zeros((P + 1, mp.POOL_DIM), np.float32)
    rows[:, :3] = rng.uniform(-20, 20, (P + 1, 3))
    rows[:, 3] = rng.normal(P + 1) * 0.1
    rows[:, 4] = 1.0
    rows[:, 5] = 0.0
    pool = pool._replace(rows=jnp.asarray(rows),
                         fill=jnp.int32(P), head=jnp.int32(0),
                         new_count=jnp.int32(1000),
                         new_idx=jnp.arange(mcfg.new_idx_capacity, dtype=jnp.int32))

    params = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                geo=geo, sem=None, color=None)
    opt_state = mp.make_optimizer(mcfg).init(params)

    def run(mcfg_v, label, n_iters=15):
        ms = t(mp.mapping_loop, lm, mc, params, opt_state, pool, mcfg_v, offsets,
               key, jnp.float32(1.0), jnp.asarray(True), jnp.asarray(False),
               num_iters=n_iters, reps=5)
        print(f"{label:<28} {ms:7.2f} ms  ({ms/n_iters:5.2f} ms/iter)")

    run(mcfg, "mapping_loop full")
    run(dataclasses.replace(mcfg, ekional_loss_on=False), "  no eikonal")

    # isolate: a stripped scan doing ONLY batch gather + knn + fwd/bwd + adam
    opt = mp.make_optimizer(mcfg)

    def make_loop(do_gather=True, do_knn=True, do_grad=True, do_adam=True,
                  do_cert=True):
        @jax.jit
        def loop(params, opt_state, idx_all):
            L = mc.local_capacity

            def one(carry, idx):
                p, o, cert = carry
                if do_gather:
                    br = pool.rows[idx]
                    coord = br[:, :3]
                    label = br[:, 3]
                else:
                    coord = jnp.zeros((mcfg.bs, 3), jnp.float32)
                    label = jnp.zeros((mcfg.bs,), jnp.float32)
                if do_knn:
                    knn = npts.knn_search(lm, mc, coord, offsets)
                    lidx = knn.lidx
                else:
                    lidx = jnp.zeros((mcfg.bs, mc.nn_k), jnp.int32)

                def loss_fn(p):
                    lmf = lm._replace(geo_features=p.features)
                    f, _, w, _ = npts.interpolate_features(lmf, mc, coord, lidx)
                    s, _ = dec.blended_sdf(p.geo, f, w, True, mcfg.sdf_scale)
                    return jnp.mean((s - label) ** 2), w

                if do_grad:
                    (l, w), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
                else:
                    l, w = loss_fn(p)
                    g = jax.tree.map(jnp.zeros_like, p)
                if do_adam:
                    up, o = opt.update(g, o, p)
                    import optax
                    p = optax.apply_updates(p, up)
                if do_cert:
                    valid_k = lidx < L
                    cert = cert.at[jnp.where(valid_k, lidx, L).reshape(-1)].add(
                        jnp.where(valid_k, w, 0.0).reshape(-1))
                return (p, o, cert), l

            acc0 = jnp.zeros((L + 1,), jnp.float32)
            (p, o, cert), hist = jax.lax.scan(one, (params, opt_state, acc0), idx_all)
            return p, cert, hist

        return loop

    idx_all = jax.random.randint(key, (15, mcfg.bs), 0, P)
    for kw, label in [
        (dict(), "stripped full"),
        (dict(do_cert=False), "  -cert scatter"),
        (dict(do_cert=False, do_adam=False), "  -adam too"),
        (dict(do_cert=False, do_adam=False, do_grad=False), "  fwd only"),
        (dict(do_cert=False, do_adam=False, do_grad=False, do_knn=False), "  -knn (gather+interp)"),
        (dict(do_cert=False, do_adam=False, do_grad=False, do_gather=False), "  -pool gather"),
    ]:
        loop = make_loop(**kw)
        ms = t(loop, params, opt_state, idx_all, reps=5)
        print(f"{label:<28} {ms:7.2f} ms  ({ms/15:5.2f} ms/iter)")


if __name__ == "__main__":
    main()
