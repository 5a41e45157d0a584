"""Hand-derived d(SDF)/d(query point) for the tracker's inner loop.

The registration while_loop needs per-point SDF values and spatial gradients
every iteration.  ``jax.vjp`` through the full query re-materializes the
gather graph and emits feature-table cotangent scatters; this closed form
computes the same gradient with two small matmuls and (B,k) elementwise math:

    sdf(p)   = s * MLP(h),  h = sum_i w_i(p) [f_i ; v_i(p)]
    dsdf/dp  = sum_i a_i dw_i/dp + sum_i w_i R_i^T g_v
    a_i      = g_h . [f_i ; v_i]          (g_h = s * dMLP/dh, manual backprop)
    dw_i/dp  = (dwhat_i - w_i sum_j dwhat_j) / S,  dwhat_i = -2 v_i whati^2

Exactness against jax.grad is unit-tested (weighted_first=True path; the
per-neighbor blending mode falls back to vjp).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.models.neural_points import _INVALID_DIST2


def _mlp_value_and_input_grad(params: dec.DecoderParams, h: jax.Array,
                              sdf_scale: float) -> Tuple[jax.Array, jax.Array]:
    """Forward through the Linear-ReLU trunk + manual backprop to the input.

    h: (B, D). Returns (sdf (B,), g_h (B, D))."""
    acts = []
    x = h
    for W, b in params.hidden:
        z = x @ W
        if b is not None:
            z = z + b
        acts.append((x, z > 0))
        x = jax.nn.relu(z)
    W_out, b_out = params.out
    out = x @ W_out
    if b_out is not None:
        out = out + b_out
    sdf = out[..., 0] * sdf_scale

    # backward: d out[...,0] / d h
    g = jnp.broadcast_to(W_out[:, 0] * sdf_scale, x.shape)  # (B, H)
    for (inp, mask), (W, b) in zip(reversed(acts), reversed(params.hidden)):
        g = (g * mask) @ W.T
    return sdf, g


def _core(mc: npts.MapConfig, geo_params: dec.DecoderParams, sdf_scale: float,
          pts: jax.Array, nbr_pos: jax.Array, quat: jax.Array,
          feats: jax.Array, valid: jax.Array,
          after_pgo) -> Tuple[jax.Array, jax.Array]:
    """Shared dense math: (B,k) selected neighbors -> (sdf, grad).

    Inputs are already-gathered per-neighbor rows; no random access here."""
    eps = mc.idw_eps
    v_raw = pts[:, None, :] - nbr_pos                   # (B,k,3)
    d2 = jnp.sum(v_raw * v_raw, axis=-1)
    d2 = jnp.where(valid, d2, _INVALID_DIST2)

    from pin_slam_tpu.ops.transforms import apply_quaternion_rotation

    v_rot = apply_quaternion_rotation(quat, v_raw)
    v = jnp.where(jnp.asarray(after_pgo), v_rot, v_raw)
    v = jnp.where(valid[..., None], v, 0.0)

    feats = jnp.where(valid[..., None], feats, 0.0)     # (B,k,F)

    w_hat = 1.0 / (d2 + eps)
    w_hat = jnp.where(valid, w_hat, 0.0)
    nn_any = jnp.any(valid, axis=-1, keepdims=True)
    w_hat = jnp.where(nn_any, w_hat, eps)
    S = jnp.sum(w_hat, axis=-1, keepdims=True)          # (B,1)
    w = w_hat / S
    w = jnp.where(valid, w, 0.0)

    fv = jnp.concatenate([feats, v], axis=-1)           # (B,k,F+3)
    h = jnp.sum(fv * w[..., None], axis=1)              # (B,F+3)

    sdf, g_h = _mlp_value_and_input_grad(geo_params, h, sdf_scale)

    # gradient through the IDW weights
    a = jnp.einsum("bkd,bd->bk", fv, g_h)               # (B,k)
    dw_hat = -2.0 * v_raw * (w_hat**2)[..., None]       # (B,k,3), zero for invalid
    dw_hat = jnp.where(valid[..., None], dw_hat, 0.0)
    sum_dw = jnp.sum(dw_hat, axis=1, keepdims=True)     # (B,1,3)
    dw = (dw_hat - w[..., None] * sum_dw) / S[..., None]
    grad = jnp.einsum("bk,bkj->bj", a, dw)

    # gradient through the offset vectors: d v_i/dp = R_i^T (passive rotation)
    g_v = g_h[:, -3:]                                   # (B,3)
    # transpose action of the passive rotation == active rotation by quat
    quat_w = quat[..., :1]
    quat_xyz = quat[..., 1:]
    t2 = 2.0 * jnp.cross(quat_xyz, jnp.broadcast_to(g_v[:, None, :], v_raw.shape))
    g_v_rot = (g_v[:, None, :] + quat_w * t2 + jnp.cross(quat_xyz, t2))
    g_v_k = jnp.where(jnp.asarray(after_pgo), g_v_rot,
                      jnp.broadcast_to(g_v[:, None, :], v_raw.shape))
    grad = grad + jnp.einsum("bk,bkj->bj", w, g_v_k)

    return sdf, grad


def _core_pn(mc: npts.MapConfig, geo_params: dec.DecoderParams,
             sdf_scale: float, pts: jax.Array, nbr_pos: jax.Array,
             quat: jax.Array, feats: jax.Array, valid: jax.Array,
             after_pgo) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-neighbor analytic core for ``weighted_first=False`` (r5): each of
    the k neighbors is decoded with its own feature + offset vector and the k
    SDF PREDICTIONS are IDW-blended (ref model/neural_points.py:660-665,
    run_kitti's interpolation mode — previously this mode fell back to
    jax.vjp WITHOUT the candidate cache, re-probing the hash every GN
    iteration: the dominant cost of the KITTI odometry program).

        sdf      = sum_i w_i(p) o_i,   o_i = s * MLP([f_i ; v_i(p)])
        dsdf/dp  = sum_i o_i dw_i/dp + sum_i w_i R_i^T g_{v,i}

    Also returns the IDW-weighted std of the per-neighbor predictions — the
    reference's tracker gates on it in this mode (utils/tracker.py:305-309);
    the weighted_first path has a single prediction and no std."""
    eps = mc.idw_eps
    v_raw = pts[:, None, :] - nbr_pos                   # (B,k,3)
    d2 = jnp.sum(v_raw * v_raw, axis=-1)
    d2 = jnp.where(valid, d2, _INVALID_DIST2)

    from pin_slam_tpu.ops.transforms import apply_quaternion_rotation

    v_rot = apply_quaternion_rotation(quat, v_raw)
    v = jnp.where(jnp.asarray(after_pgo), v_rot, v_raw)
    v = jnp.where(valid[..., None], v, 0.0)
    feats = jnp.where(valid[..., None], feats, 0.0)     # (B,k,F)

    w_hat = 1.0 / (d2 + eps)
    w_hat = jnp.where(valid, w_hat, 0.0)
    nn_any = jnp.any(valid, axis=-1, keepdims=True)
    w_hat = jnp.where(nn_any, w_hat, eps)
    S = jnp.sum(w_hat, axis=-1, keepdims=True)          # (B,1)
    w = w_hat / S
    w = jnp.where(valid, w, 0.0)

    B, k = d2.shape
    fv = jnp.concatenate([feats, v], axis=-1)           # (B,k,F+3)
    o_flat, g_flat = _mlp_value_and_input_grad(
        geo_params, fv.reshape(B * k, -1), sdf_scale)
    o = o_flat.reshape(B, k)                            # per-neighbor preds
    g_in = g_flat.reshape(B, k, -1)

    sdf = jnp.sum(w * o, axis=1)
    sdf_std = jnp.sqrt(jnp.maximum(
        jnp.sum(w * (o - sdf[:, None]) ** 2, axis=1), 0.0))

    dw_hat = -2.0 * v_raw * (w_hat**2)[..., None]
    dw_hat = jnp.where(valid[..., None], dw_hat, 0.0)
    sum_dw = jnp.sum(dw_hat, axis=1, keepdims=True)
    dw = (dw_hat - w[..., None] * sum_dw) / S[..., None]
    grad = jnp.einsum("bk,bkj->bj", o, dw)

    g_v = g_in[..., -3:]                                # (B,k,3)
    quat_w = quat[..., :1]
    quat_xyz = quat[..., 1:]
    t2 = 2.0 * jnp.cross(quat_xyz, g_v)
    g_v_rot = g_v + quat_w * t2 + jnp.cross(quat_xyz, t2)
    g_v_k = jnp.where(jnp.asarray(after_pgo), g_v_rot, g_v)
    grad = grad + jnp.einsum("bk,bkj->bj", w, g_v_k)

    return sdf, grad, sdf_std


def sdf_value_and_grad(lm: npts.LocalMap, mc: npts.MapConfig,
                       geo_params: dec.DecoderParams, sdf_scale: float,
                       offsets: jax.Array, pts: jax.Array,
                       after_pgo=False) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (sdf (B,), grad (B,3), nn_count (B,), sdf_std (B,)).

    Matches interpolate_features + decoder blending + jax.grad exactly, in
    BOTH interpolation modes (weighted_first feature blend / per-neighbor
    prediction blend).
    """
    assert mc.pos_encoding_band == 0, "positional encoding needs the vjp path"
    L = mc.local_capacity
    knn = npts.knn_search(lm, mc, pts, offsets)
    valid = knn.lidx < L
    safe_idx = jnp.where(valid, knn.lidx, L)

    pose = lm.attr_rows[safe_idx]                       # (B,k,16) one gather
    nbr_pos = pose[..., npts.C_POS]
    quat = pose[..., npts.C_QUAT]
    feats = lm.geo_features[safe_idx]                   # (B,k,F)
    if mc.weighted_first:
        sdf, grad = _core(mc, geo_params, sdf_scale, pts, nbr_pos, quat,
                          feats, valid, after_pgo)
        sdf_std = jnp.zeros_like(sdf)
    else:
        sdf, grad, sdf_std = _core_pn(mc, geo_params, sdf_scale, pts,
                                      nbr_pos, quat, feats, valid, after_pgo)
    return sdf, grad, knn.nn_count, sdf_std


class CandCache(NamedTuple):
    """Per-source-point probe candidates, hash-probed ONCE per probe pose.

    The registration while_loop moves the pose by millimetres between
    iterations, yet the reference re-runs the full hash probe + 5 gathers
    every iteration (ref utils/tracker.py:92-106 -> model/neural_points.py:
    459-509).  On TPU random row-gathers are the dominant cost, so the PROBE
    (the B x K hash-row gather) is hoisted here; every GN iteration then
    re-ranks the cached candidate positions by exact dist^2 (dense VPU math),
    one-hot-selects the k winners (MXU), and gathers attr/features for just
    those B x k rows — r5: gathering the FULL candidate set's attributes into
    the cache (the r2-r4 design) cost 3 wide gathers per refresh, which at
    K=81 run_kitti shapes dominated the odometry program whenever the pose
    moved past the refresh margin.  Selected neighbors are always a subset
    of what a fresh probe would see, re-validated by the exact
    dist^2 <= max_valid_dist2 gate each iteration.
    """

    xs: jax.Array       # (B,M) f32 candidate x (invalid -> 1e5)
    ys: jax.Array       # (B,M)
    zs: jax.Array       # (B,M)
    lidx: jax.Array     # (B,M) i32 local indices, sentinel = local_capacity


def probe_candidates(lm: npts.LocalMap, mc: npts.MapConfig, pts: jax.Array,
                     offsets, keep: int = 16) -> CandCache:
    """Hash-probe the neighbor template at ``pts`` (world frame): ONE packed
    hash-row gather (the only wide random access of the tracking loop —
    whole-BRICK rows when ``offsets`` is a ProbeTemplate on a brick-layout
    map, ~K/nsub physical rows), then PRE-RANK to the nearest ``keep``
    candidates at the probe pose: the GN iterations' dense re-rank/select
    math scales with the cached candidate count (r5; the full K=81 set
    measured ~9 ms/iteration at run_kitti shapes).  Within the refresh
    margin (0.25 voxel) the top-k of the top-16 equals the top-k of all K in
    practice; the cache contract is unchanged (selected neighbors are a
    subset of a fresh probe's, re-validated by the exact dist^2 gate each
    iteration).  Everything stays 2-D field-major — (B,K,3) candidate
    tensors tile-pad their minor dim 3 -> 128 on TPU."""
    L = mc.local_capacity
    brick_mode = isinstance(offsets, npts.ProbeTemplate) and mc.nsub > 1
    if brick_mode:
        rows_fm = npts.brick_gather_fm(lm, mc, offsets, pts)
        Kc = rows_fm.shape[1] // 5
        xs, ys, zs = (rows_fm[:, 0 * Kc:1 * Kc], rows_fm[:, 1 * Kc:2 * Kc],
                      rows_fm[:, 2 * Kc:3 * Kc])
        lidx = rows_fm[:, 3 * Kc:4 * Kc].astype(jnp.int32)
    else:
        cells_t = (offsets.cells if isinstance(offsets, npts.ProbeTemplate)
                   else offsets)
        grid = npts.grid_coords(pts, mc.voxel_size)
        cells = grid[:, None, :] + cells_t[None, :, :]
        h = npts.subcell_hash(mc, cells)
        rows = lm.hash_rows[h]                          # (B,K,·) one gather
        Kc = cells_t.shape[0]
        xs, ys, zs = rows[..., 0], rows[..., 1], rows[..., 2]
        lidx = rows[..., 3].astype(jnp.int32)
    valid = lidx < L
    # invalid slots get a far-away position so the dist^2 gate kills them at
    # every future pose, matching knn_search's (lidx < L) condition
    far = jnp.float32(1e5)
    xs = jnp.where(valid, xs, far)
    ys = jnp.where(valid, ys, far)
    zs = jnp.where(valid, zs, far)
    lidx = jnp.where(valid, lidx, L)
    M = max(min(keep, Kc), mc.nn_k)
    if M >= Kc:
        return CandCache(xs=xs, ys=ys, zs=zs, lidx=lidx)
    d2 = ((xs - pts[:, 0:1]) ** 2 + (ys - pts[:, 1:2]) ** 2
          + (zs - pts[:, 2:3]) ** 2)
    # exact top-M (approx_max_k's recall guarantee is only verified for k=6
    # here; a miss at probe time would silently drop a true nearest neighbor
    # for the whole cache lifetime)
    sel = npts.exact_k_min(jnp.where(valid, d2, _INVALID_DIST2), M)
    onehot = (sel[..., None] ==
              jnp.arange(Kc, dtype=sel.dtype)[None, None, :]).astype(pts.dtype)

    def pick(a):
        return jnp.einsum("bms,bs->bm", onehot, a)

    lidx_m = jnp.round(pick(lidx.astype(pts.dtype))).astype(jnp.int32)
    ok = lidx_m < L
    return CandCache(xs=jnp.where(ok, pick(xs), far),
                     ys=jnp.where(ok, pick(ys), far),
                     zs=jnp.where(ok, pick(zs), far),
                     lidx=jnp.minimum(lidx_m, L))


def sdf_value_and_grad_cached(cache: CandCache, lm: npts.LocalMap,
                              mc: npts.MapConfig,
                              geo_params: dec.DecoderParams, sdf_scale: float,
                              pts: jax.Array,
                              after_pgo=False) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Same result as ``sdf_value_and_grad`` but from a CandCache: re-rank
    cached candidates by dist^2 at the current pose (2-D field-major VPU
    math), one-hot-select the k winners (MXU), gather attr/features for the
    selected B x k rows only, and run the shared analytic core."""
    L = mc.local_capacity
    M = cache.lidx.shape[1]
    d2 = ((cache.xs - pts[:, 0:1]) ** 2 + (cache.ys - pts[:, 1:2]) ** 2
          + (cache.zs - pts[:, 2:3]) ** 2)              # (B,M) dense
    valid_all = (cache.lidx < L) & (d2 <= mc.max_valid_dist2)
    nn_count = jnp.sum(valid_all, axis=-1, dtype=jnp.int32)
    d2 = jnp.where(valid_all, d2, _INVALID_DIST2)

    k = min(mc.nn_k, M)
    neg, sel = jax.lax.approx_max_k(-d2, k)             # k smallest dist^2
    d2_k = -neg
    valid = d2_k < _INVALID_DIST2
    onehot = (sel[..., None] ==
              jnp.arange(M, dtype=sel.dtype)[None, None, :]).astype(pts.dtype)
    # positions + value-cast local indices ride the same MXU select (indices
    # are exact in f32 below 2^24; matmul precision pinned HIGHEST globally)
    pk = jnp.einsum("bks,bsf->bkf", onehot,
                    jnp.stack([cache.xs, cache.ys, cache.zs,
                               cache.lidx.astype(pts.dtype)], axis=-1))
    pos_k = pk[..., :3]
    lidx_k = jnp.round(pk[..., 3]).astype(jnp.int32)
    safe = jnp.where(valid, jnp.minimum(lidx_k, L), L)
    attr = lm.attr_rows[safe]                           # (B,k,16) small gather
    quat = attr[..., npts.C_QUAT]
    feats = lm.geo_features[safe]                       # (B,k,F) small gather
    if mc.weighted_first:
        sdf, grad = _core(mc, geo_params, sdf_scale, pts, pos_k,
                          quat, feats, valid, after_pgo)
        sdf_std = jnp.zeros_like(sdf)
    else:
        sdf, grad, sdf_std = _core_pn(mc, geo_params, sdf_scale, pts,
                                      pos_k, quat, feats, valid, after_pgo)
    return sdf, grad, nn_count, sdf_std
