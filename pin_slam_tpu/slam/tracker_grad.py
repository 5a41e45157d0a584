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


def sdf_value_and_grad(lm: npts.LocalMap, mc: npts.MapConfig,
                       geo_params: dec.DecoderParams, sdf_scale: float,
                       offsets: jax.Array, pts: jax.Array,
                       after_pgo=False) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (sdf (B,), grad (B,3), nn_count (B,)).

    weighted_first=True only (asserted); matches interpolate_features +
    decoder.sdf + jax.grad exactly.
    """
    assert mc.weighted_first, "analytic gradient implemented for weighted_first"
    assert mc.pos_encoding_band == 0, "positional encoding needs the vjp path"
    L = mc.local_capacity
    knn = npts.knn_search(lm, mc, pts, offsets)
    valid = knn.lidx < L
    safe_idx = jnp.where(valid, knn.lidx, L)

    pose = lm.attr_rows[safe_idx]                       # (B,k,16) one gather
    nbr_pos = pose[..., npts.C_POS]
    quat = pose[..., npts.C_QUAT]
    feats = lm.geo_features[safe_idx]                   # (B,k,F)
    sdf, grad = _core(mc, geo_params, sdf_scale, pts, nbr_pos, quat, feats,
                      valid, after_pgo)
    return sdf, grad, knn.nn_count


class CandCache(NamedTuple):
    """Per-source-point neighbor candidates, gathered ONCE per probe pose.

    The registration while_loop moves the pose by millimetres between
    iterations, yet the reference re-runs the full hash probe + 5 gathers
    every iteration (ref utils/tracker.py:92-106 -> model/neural_points.py:
    459-509).  On TPU random row-gathers are the dominant cost (~9 ns/row via
    the scalar gather engine), so we hoist them: probe the voxel-hash
    neighborhood and densely gather position/orientation/features for ALL K
    template cells once, then every GN iteration is pure dense math over the
    (B,K,...) arrays — dist^2 re-ranking, top-k, one-hot matmul selection —
    which the VPU/MXU stream at HBM speed.  The cache is refreshed (lax.cond)
    whenever the pose has moved far enough that the probed cell neighborhoods
    could have changed (> probe_margin), so selected neighbors are always a
    subset of what a fresh probe would see, re-validated by the exact
    dist^2 <= max_valid_dist2 gate each iteration.
    """

    lidx: jax.Array     # (B,K) i32 local indices, sentinel = local_capacity
    packed: jax.Array   # (B,K,7+F) f32: [pos(3) | quat(4) | feats(F)]


def probe_candidates(lm: npts.LocalMap, mc: npts.MapConfig, pts: jax.Array,
                     offsets: jax.Array) -> CandCache:
    """Hash-probe the K-cell template at ``pts`` (world frame) and gather all
    candidate rows densely (the only random access of the tracking loop)."""
    L = mc.local_capacity
    grid = npts.grid_coords(pts, mc.voxel_size)
    cells = grid[:, None, :] + offsets[None, :, :]
    h = npts.subcell_hash(mc, cells)
    rows = lm.hash_rows[h]                              # (B,K,·) one gather
    lidx = rows[..., 3].astype(jnp.int32)
    valid = lidx < L
    safe = jnp.where(valid, lidx, L)
    attr = lm.attr_rows[safe]                           # (B,K,16)
    feats = lm.geo_features[safe]                       # (B,K,F)
    # invalid slots get a far-away position so the dist^2 gate kills them at
    # every future pose, matching knn_search's (lidx < L) condition
    pos = jnp.where(valid[..., None], rows[..., :3], 1e5)
    packed = jnp.concatenate(
        [pos, attr[..., npts.C_QUAT], jnp.where(valid[..., None], feats, 0.0)],
        axis=-1)
    return CandCache(lidx=jnp.where(valid, lidx, L), packed=packed)


def sdf_value_and_grad_cached(cache: CandCache, mc: npts.MapConfig,
                              geo_params: dec.DecoderParams, sdf_scale: float,
                              pts: jax.Array,
                              after_pgo=False) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Same result as ``sdf_value_and_grad`` but from a CandCache — zero
    random HBM access: re-rank cached candidates by dist^2 at the current
    pose, approx top-k, select rows with a one-hot batched matmul (MXU), and
    run the shared analytic core."""
    L = mc.local_capacity
    K = cache.lidx.shape[1]
    pos = cache.packed[..., :3]
    d = pts[:, None, :] - pos
    d2 = jnp.sum(d * d, axis=-1)                        # (B,K) dense
    valid_all = (cache.lidx < L) & (d2 <= mc.max_valid_dist2)
    nn_count = jnp.sum(valid_all, axis=-1, dtype=jnp.int32)
    d2 = jnp.where(valid_all, d2, _INVALID_DIST2)

    k = min(mc.nn_k, K)
    neg, sel = jax.lax.approx_max_k(-d2, k)             # k smallest dist^2
    d2_k = -neg
    valid = d2_k < _INVALID_DIST2
    onehot = (sel[..., None] ==
              jnp.arange(K, dtype=sel.dtype)[None, None, :]).astype(pts.dtype)
    pk = jnp.einsum("bks,bsf->bkf", onehot, cache.packed)  # (B,k,7+F) MXU select
    sdf, grad = _core(mc, geo_params, sdf_scale, pts, pk[..., :3],
                      pk[..., 3:7], pk[..., 7:], valid, after_pgo)
    return sdf, grad, nn_count
