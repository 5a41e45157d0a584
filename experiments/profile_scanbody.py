"""Bisect the mapping scan body: what makes one Adam iteration cost 4.7 ms
when gather+scatter+adam should be ~2 ms?  All variants run T=15 chained
iterations inside one jit (the axon tunnel makes single-op timing lie).

Run: python experiments/profile_scanbody.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.slam import mapper as mp

B, k, F, L, T = 16384, 6, 8, 131072, 15


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = (min(ts) * 1e3 - 24.0) / T
    print(f"{name:<52} {ms:8.2f} ms/iter", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((L + 1, F + 1)), jnp.float32)
    geo = dec.init_decoder(jax.random.PRNGKey(1), F + 3, 64, 1, 1)
    idx = jnp.asarray(rng.integers(0, L, (T, B, k)), jnp.int32)
    w = jnp.asarray(rng.random((T, B, k)), jnp.float32)
    vecb = jnp.asarray(rng.standard_normal((T, B, 3)), jnp.float32)
    label = jnp.asarray(rng.standard_normal((T, B)) * 0.1, jnp.float32)

    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=B,
        bs_new_sample=2048, iters=T, lr=0.01, adam_eps=1e-15,
        sigma_sigmoid=0.1, sdf_scale=0.055, loss_weight_on=False,
        ekional_loss_on=False, weight_e=0.5, gradient_decimation=10,
        num_grad_step=0.06, surface_sample_range=0.25, semantic_on=False,
        color_on=False, weight_s=1.0, weight_i=1.0)
    _, adam_step = mp._fused_adam(mcfg)

    class PP(jnp.ndarray.__class__ if False else object):
        pass

    params = mp.TrainableParams(features=feats, color_features=None, geo=geo,
                                sem=None, color=None)
    opt = mp.init_opt_state(mcfg, params)

    # (a) forward only: gather + einsum + mlp, scan carries nothing trainable
    @jax.jit
    def fwd_only(feats, idx, w, vecb):
        def body(c, x):
            i, ww, vb = x
            f = feats[i]
            gf = jnp.concatenate([jnp.einsum("bk,bkf->bf", ww, f[..., :F]), vb], -1)
            s = dec.sdf(geo, gf, 0.055)
            return c + jnp.sum(s), None
        out, _ = jax.lax.scan(body, jnp.float32(0), (idx, w, vecb))
        return out

    timed("fwd only (gather+einsum+mlp)", fwd_only, feats, idx, w, vecb)

    # (b) fwd + bwd grads wrt features (gather + scatter-add)
    @jax.jit
    def fwd_bwd(feats, idx, w, vecb, label):
        def body(c, x):
            i, ww, vb, lb = x
            def loss_fn(ft):
                f = ft[i]
                gf = jnp.concatenate([jnp.einsum("bk,bkf->bf", ww, f[..., :F]), vb], -1)
                s = dec.sdf(geo, gf, 0.055)
                return jnp.mean((s - lb) ** 2)
            l, g = jax.value_and_grad(loss_fn)(c)
            return c - 0.01 * g, l
        out, ls = jax.lax.scan(body, feats, (idx, w, vecb, label))
        return out

    timed("fwd+bwd sgd (gather+mlp bwd+scatter)", fwd_bwd, feats, idx, w, vecb, label)

    # (c) + decoder grads too
    @jax.jit
    def fwd_bwd_dec(params, idx, w, vecb, label):
        def body(p, x):
            i, ww, vb, lb = x
            def loss_fn(pp):
                f = pp.features[i]
                gf = jnp.concatenate([jnp.einsum("bk,bkf->bf", ww, f[..., :F]), vb], -1)
                s = dec.sdf(pp.geo, gf, 0.055)
                return jnp.mean((s - lb) ** 2)
            l, g = jax.value_and_grad(loss_fn)(p)
            p = jax.tree.map(lambda a, b: a - 0.01 * b, p,
                             jax.tree.map(lambda x: x, g))
            return p, l
        out, ls = jax.lax.scan(body, params, (idx, w, vecb, label))
        return out.features


    # (d) + fused adam
    @jax.jit
    def full_adam(params, opt, idx, w, vecb, label):
        def body(carry, x):
            p, o = carry
            i, ww, vb, lb = x
            def loss_fn(pp):
                f = pp.features[i]
                gf = jnp.concatenate([jnp.einsum("bk,bkf->bf", ww, f[..., :F]), vb], -1)
                s = dec.sdf(pp.geo, gf, 0.055)
                return jnp.mean((s - lb) ** 2)
            l, g = jax.value_and_grad(loss_fn)(p)
            p, o = adam_step(p, g, o)
            return (p, o), l
        (p, o), ls = jax.lax.scan(body, (params, opt), (idx, w, vecb, label))
        return p.features

    timed("+ fused adam", full_adam, params, opt, idx, w, vecb, label)

    # (e) the sentinel row pin (per-iter .at[L].set) on top
    @jax.jit
    def full_pin(params, opt, idx, w, vecb, label):
        def body(carry, x):
            p, o = carry
            i, ww, vb, lb = x
            def loss_fn(pp):
                f = pp.features[i]
                gf = jnp.concatenate([jnp.einsum("bk,bkf->bf", ww, f[..., :F]), vb], -1)
                s = dec.sdf(pp.geo, gf, 0.055)
                return jnp.mean((s - lb) ** 2)
            l, g = jax.value_and_grad(loss_fn)(p)
            p, o = adam_step(p, g, o)
            p = p._replace(features=p.features.at[L].set(0.0))
            return (p, o), l
        (p, o), ls = jax.lax.scan(body, (params, opt), (idx, w, vecb, label))
        return p.features

    timed("+ sentinel row pin", full_pin, params, opt, idx, w, vecb, label)


if __name__ == "__main__":
    main()
