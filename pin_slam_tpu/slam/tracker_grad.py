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

from typing import Tuple

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
    L, eps = mc.local_capacity, mc.idw_eps
    knn = npts.knn_search(lm, mc, pts, offsets)
    valid = knn.lidx < L
    safe_idx = jnp.where(valid, knn.lidx, L)

    pose = lm.attr_rows[safe_idx]                       # (B,k,16) one gather
    nbr_pos = pose[..., npts.C_POS]
    quat = pose[..., npts.C_QUAT]
    v_raw = pts[:, None, :] - nbr_pos                   # (B,k,3)
    d2 = jnp.sum(v_raw * v_raw, axis=-1)
    d2 = jnp.where(valid, d2, _INVALID_DIST2)

    from pin_slam_tpu.ops.transforms import apply_quaternion_rotation

    v_rot = apply_quaternion_rotation(quat, v_raw)
    v = jnp.where(jnp.asarray(after_pgo), v_rot, v_raw)
    v = jnp.where(valid[..., None], v, 0.0)

    feats = jnp.where(valid[..., None], lm.geo_features[safe_idx], 0.0)  # (B,k,F)

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

    return sdf, grad, knn.nn_count
