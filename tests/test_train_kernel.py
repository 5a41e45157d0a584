"""Parity of the Pallas training-iteration kernels (interpret mode on CPU)
against jax.value_and_grad over the identical loss — the same math
mapper.mapping_loop_cached differentiates (ref utils/mapper.py:425-593)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pin_slam_tpu.ops import train_kernel as tk


def _decoder(key, in_dim, H):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    W1 = jax.random.normal(k1, (in_dim, H), jnp.float32) * 0.3
    b1 = jax.random.normal(k2, (H,), jnp.float32) * 0.1
    W2 = jax.random.normal(k3, (H, 1), jnp.float32) * 0.3
    b2 = jax.random.normal(k4, (), jnp.float32) * 0.1
    return W1, b1, W2, b2


def _mlp_ref(x, W1, b1, W2, b2):
    h = jax.nn.relu(x @ W1 + b1)
    return (h @ W2)[:, 0] + b2


@pytest.mark.parametrize("wf", [True, False])
def test_train_iter_parity(wf):
    B, k, F, VD, H = 256, 6, 8, 3, 64
    sigma, scale = 0.1, 0.055
    C = F + 1
    rng = np.random.default_rng(3)
    cfg = tk.TrainKernelConfig(B=B, k=k, F=F, VD=VD, H=H, sigma=sigma,
                               scale=scale, weighted_first=wf, tiles=4)
    feats = jnp.asarray(rng.standard_normal((B, k * C)).astype(np.float32))
    w = jnp.asarray(rng.random((B, k)).astype(np.float32))
    w = w / jnp.sum(w, axis=1, keepdims=True)
    vec = jnp.asarray(rng.standard_normal(
        (B, VD if wf else k * VD)).astype(np.float32) * 0.2)
    label = jnp.asarray(rng.standard_normal((B,)).astype(np.float32) * 0.3)
    wt = jnp.asarray((rng.random(B) * (rng.random(B) > 0.1)).astype(np.float32))
    W1, b1, W2, b2 = _decoder(jax.random.PRNGKey(0), F + VD, H)

    def loss_ref(feats, W1, b1, W2, b2):
        f3 = feats.reshape(B, k, C)
        if wf:
            gf = jnp.einsum("bk,bkf->bf", w, f3[..., :F])
            x = jnp.concatenate([gf, vec], axis=1)
            pred = _mlp_ref(x, W1, b1, W2, b2) * scale
        else:
            xin = jnp.concatenate([f3[..., :F], vec.reshape(B, k, VD)], -1)
            per = _mlp_ref(xin.reshape(B * k, -1), W1, b1, W2, b2).reshape(B, k)
            pred = jnp.sum(per * w, axis=1) * scale
        z = pred / sigma
        tgt = jax.nn.sigmoid(label / sigma)
        bce = jnp.maximum(z, 0) - z * tgt + jnp.log1p(jnp.exp(-jnp.abs(z)))
        cert = jnp.sum(w * f3[..., F])
        return jnp.sum(bce * wt) + cert

    ref_loss, grads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        feats, W1, b1, W2, b2)
    loss, dfeats, dW1, db1, dW2, db2 = tk.fused_train_iter(
        cfg, feats, w, vec, label, wt, W1, b1, W2, b2, interpret=True)

    # kernel's reported loss excludes the certainty bookkeeping term
    cert = float(jnp.sum(w * feats.reshape(B, k, C)[..., F]))
    np.testing.assert_allclose(float(loss), float(ref_loss) - cert, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dfeats), np.asarray(grads[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dW1), np.asarray(grads[1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(grads[2]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dW2), np.asarray(grads[3]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(db2), float(grads[4]), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("wf", [True, False])
def test_eikonal_iter_parity(wf):
    n, k, F, VD, H = 64, 6, 8, 3, 64
    scale, step = 0.055, 0.06
    C = F + 1
    rng = np.random.default_rng(5)
    cfg = tk.EikKernelConfig(n=n, k=k, F=F, VD=VD, H=H, scale=scale,
                             step=step, weighted_first=wf)
    feats = jnp.asarray(rng.standard_normal((n, k * C)).astype(np.float32))
    wst = jnp.asarray(rng.random((6 * n, k)).astype(np.float32))
    wst = wst / jnp.sum(wst, axis=1, keepdims=True)
    vst = jnp.asarray(rng.standard_normal(
        (6 * n, VD if wf else k * VD)).astype(np.float32) * 0.2)
    esc = jnp.asarray((rng.random(n) * (rng.random(n) > 0.1)).astype(np.float32))
    W1, b1, W2, b2 = _decoder(jax.random.PRNGKey(1), F + VD, H)

    def loss_ref(feats, W1, b1, W2, b2):
        f3 = feats.reshape(n, k, C)
        w3 = wst.reshape(6, n, k)
        if wf:
            stf = jnp.einsum("jnk,nkf->jnf", w3, f3[..., :F])
            x = jnp.concatenate([stf.reshape(6 * n, F), vst], axis=1)
            sdf = (_mlp_ref(x, W1, b1, W2, b2) * scale).reshape(6, n)
        else:
            v3 = vst.reshape(6, n, k, VD)
            xin = jnp.concatenate(
                [jnp.broadcast_to(f3[None, :, :, :F], (6, n, k, F)), v3], -1)
            per = _mlp_ref(xin.reshape(-1, F + VD), W1, b1, W2, b2
                           ).reshape(6, n, k)
            sdf = jnp.sum(per * w3, axis=-1) * scale
        g = jnp.stack([sdf[0] - sdf[3], sdf[1] - sdf[4], sdf[2] - sdf[5]],
                      -1) / (2 * step)
        norm = jnp.sqrt(jnp.sum(g * g, -1) + 1e-12)
        cert = jnp.einsum("jnk,nk->", w3, f3[..., F])
        return jnp.sum((norm - 1.0) ** 2 * esc) + cert

    ref_loss, grads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        feats, W1, b1, W2, b2)
    loss, dfeats, dW1, db1, dW2, db2 = tk.fused_eikonal_iter(
        cfg, feats, wst, vst, esc, W1, b1, W2, b2, interpret=True)

    cert = float(jnp.einsum("jnk,nk->", wst.reshape(6, n, k),
                            feats.reshape(n, k, C)[..., F]))
    np.testing.assert_allclose(float(loss), float(ref_loss) - cert, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dfeats), np.asarray(grads[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dW1), np.asarray(grads[1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(grads[2]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dW2), np.asarray(grads[3]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(db2), float(grads[4]), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("wf", [True, False])
def test_mapping_loop_kernel_parity(wf):
    """mapping_loop_cached(use_kernel=True) (interpret mode on CPU) against
    the XLA autodiff path: same params/opt-state/certainty outputs."""
    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.slam import mapper as mp
    from pin_slam_tpu.config import Config

    cfg = Config()
    cfg.map_capacity = 1 << 12
    cfg.local_map_capacity = 1 << 10
    cfg.buffer_size = 1 << 14
    cfg.pool_capacity = 1 << 12
    cfg.downsample_hash_size = 1 << 12
    cfg.bs = 80
    cfg.bs_new_sample = 16
    cfg.iters = 3
    cfg.weighted_first = wf
    cfg._derive()
    mc = npts.MapConfig.from_config(cfg)
    mcfg = mp.MapperConfig.from_config(cfg)
    offsets = jnp.asarray(npts.neighbor_offsets(cfg.num_nei_cells,
                                                cfg.search_alpha))

    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, size=(600, 3)).astype(np.float32)
    travel = jnp.zeros((1 << 10,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts),
                            jnp.ones((600,), bool), jnp.int32(0), travel,
                            downsample_table_size=cfg.downsample_hash_size)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)

    M = 280
    coords = jnp.asarray(pts[rng.integers(0, 600, M)]
                         + rng.normal(0, 0.2, (M, 3)).astype(np.float32))
    out = mp.append_knn(lm, mc, offsets, coords, 7, near_count=4,
                        per_neighbor_vecs=not wf)
    pool = mp.init_pool(mcfg)
    pool = mp.pool_append(
        pool, mcfg, coords, coords,
        jnp.asarray(rng.normal(0, 0.2, M).astype(np.float32)),
        jnp.ones((M,)), jnp.ones((M,), bool), jnp.int32(1),
        jnp.zeros((M,), bool), None, None, out[0], out[1], out[2],
        knn_nbr_vec=out[3] if not wf else None)

    L = mc.local_capacity
    featsC = jnp.concatenate(
        [0.01 * jnp.asarray(rng.standard_normal(
            (L + 1, cfg.feature_dim)).astype(np.float32)),
         jnp.zeros((L + 1, 1))], axis=1)
    geo = dec.init_decoder(jax.random.PRNGKey(1), cfg.feature_dim + 3,
                           cfg.geo_mlp_hidden_dim, cfg.geo_mlp_level, 1)
    params = mp.TrainableParams(features=featsC, color_features=None,
                                geo=geo, sem=None, color=None)
    opt = mp.init_opt_state(mcfg, params)
    key = jax.random.PRNGKey(0)
    one = jnp.ones((), bool)

    outs = {}
    for use_kernel in (False, True):
        lm_o, p_o, opt_o, hist = mp.mapping_loop_cached(
            lm, mc, params, opt, pool, mcfg, key, jnp.float32(1.0), one,
            num_iters=cfg.iters, use_kernel=use_kernel)
        outs[use_kernel] = (lm_o, p_o, hist)

    lm_a, p_a, h_a = outs[False]
    lm_b, p_b, h_b = outs[True]
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_a),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_b.features),
                               np.asarray(p_a.features), rtol=1e-3, atol=2e-5)
    for (Wa, ba), (Wb, bb) in zip(p_a.geo.hidden + (p_a.geo.out,),
                                  p_b.geo.hidden + (p_b.geo.out,)):
        np.testing.assert_allclose(np.asarray(Wb), np.asarray(Wa),
                                   rtol=1e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(bb), np.asarray(ba),
                                   rtol=1e-3, atol=2e-5)
    # certainty/ts bookkeeping folded into the local map rows
    np.testing.assert_allclose(np.asarray(lm_b.attr_rows[:, 7]),
                               np.asarray(lm_a.attr_rows[:, 7]),
                               rtol=1e-3, atol=1e-4)


def test_probe_rank_kernel_parity():
    """Pallas candidate-ranking kernel (interpret mode) against the XLA
    _probe_rank at both block shapes (shared near ball n=5, far n=1)."""
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.slam import mapper as mp
    from pin_slam_tpu.config import Config

    cfg = Config()
    cfg.map_capacity = 1 << 12
    cfg.local_map_capacity = 1 << 10
    cfg.buffer_size = 1 << 14
    cfg.downsample_hash_size = 1 << 12
    cfg._derive()
    mc = npts.MapConfig.from_config(cfg)
    offsets = jnp.asarray(npts.neighbor_offsets(cfg.num_nei_cells,
                                                cfg.search_alpha))
    rng = np.random.default_rng(1)
    pts = rng.uniform(-3, 3, size=(700, 3)).astype(np.float32)
    travel = jnp.zeros((1 << 10,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts),
                            jnp.ones((700,), bool), jnp.int32(0), travel,
                            downsample_table_size=cfg.downsample_hash_size)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)

    for n in (1, 5):
        G = 300
        probe = jnp.asarray(pts[rng.integers(0, 700, G)]
                            + rng.normal(0, 0.1, (G, 3)).astype(np.float32))
        q = probe[:, None, :] + jnp.asarray(
            rng.normal(0, 0.2, (G, n, 3)).astype(np.float32))
        g_a, p_a, v_a = mp._probe_rank(lm, mc, offsets, probe, q, 6)
        g_b, p_b, v_b = mp._probe_rank(lm, mc, offsets, probe, q, 6,
                                       use_rank_kernel=True)
        np.testing.assert_array_equal(np.asarray(v_b), np.asarray(v_a))
        np.testing.assert_array_equal(np.asarray(g_b), np.asarray(g_a))
        # positions of INVALID slots are unspecified; compare valid only
        np.testing.assert_allclose(
            np.asarray(p_b)[np.asarray(v_a)], np.asarray(p_a)[np.asarray(v_a)],
            rtol=1e-6, atol=1e-6)
