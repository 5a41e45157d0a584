"""SE(3) / quaternion geometry (JAX device ops + numpy host ops).

Re-designed equivalents of the reference's torch tensor geometry kernels
(reference utils/tools.py:316-407,540-567 and utils/tracker.py:573-600):
transforms, quaternion algebra (wxyz convention), se(3) exp/log, slerp deskewing.
Device math is float32 on local-scale coordinates; global pose bookkeeping stays
float64 on host (numpy) because TPUs have no fast f64 (SURVEY.md section 7.0.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ----------------------------------------------------------------------
# point transforms (device)
# ----------------------------------------------------------------------


def transform_points(points: jax.Array, pose: jax.Array) -> jax.Array:
    """Apply one 4x4 (or 3x4) homogeneous transform to [N,3] points.

    Equivalent behavior to reference utils/tools.py:386-399.
    """
    R = pose[:3, :3].astype(points.dtype)
    t = pose[:3, 3].astype(points.dtype)
    return points @ R.T + t


def transform_points_rt(points: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Apply rotation+translation given separately (avoids 4x4 packing in jit)."""
    return points @ R.T.astype(points.dtype) + t.astype(points.dtype)


def transform_points_batch(points: jax.Array, poses: jax.Array) -> jax.Array:
    """Per-point transforms: points [N,3], poses [N,4,4] (ref utils/tools.py:401-407)."""
    R = poses[:, :3, :3].astype(points.dtype)
    t = poses[:, :3, 3].astype(points.dtype)
    return jnp.einsum("nij,nj->ni", R, points) + t


# ----------------------------------------------------------------------
# quaternions (wxyz), matching the reference's conventions
# ----------------------------------------------------------------------


def apply_quaternion_rotation(quat: jax.Array, points: jax.Array) -> jax.Array:
    """Passive rotation p' = q^-1 p q, batch-broadcast (ref utils/tools.py:316-323)."""
    quat_w = quat[..., :1]
    quat_xyz = -quat[..., 1:]
    t = 2.0 * jnp.cross(quat_xyz, points)
    return points + quat_w * t + jnp.cross(quat_xyz, t)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1*q2 for [...,4] wxyz (ref utils/tools.py:355-369)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=-1,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Batch [...,3,3] -> wxyz quaternion.

    Numerically-robust variant (the reference's sqrt(1+trace)/2 form,
    utils/tools.py:326-333, fails near trace=-1; we use the standard
    branch-free maximal-pivot construction instead).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    qw = 0.5 * jnp.sqrt(jnp.clip(1.0 + m00 + m11 + m22, 1e-12))
    qx = 0.5 * jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12))
    qy = 0.5 * jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12))
    qz = 0.5 * jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12))

    # four candidate constructions, pick the best-conditioned (largest pivot)
    c0 = jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw)], -1)
    c1 = jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx)], -1)
    c2 = jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy)], -1)
    c3 = jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz], -1)

    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # [...,4cand,4]
    pivots = jnp.stack([qw, qx, qy, qz], axis=-1)  # [...,4]
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Batch wxyz quaternion [...,4] -> [...,3,3] (ref utils/tools.py:336-353)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = jnp.stack(
        [
            1 - 2 * (y2 + z2), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (x2 + z2), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (x2 + y2),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def quat_slerp(q0: jax.Array, q1: jax.Array, u: jax.Array) -> jax.Array:
    """Spherical interpolation between unit quaternions, u in [0,1], broadcast over u."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - u, jnp.sin((1.0 - u) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, u, jnp.sin(u * theta) / jnp.where(small, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ----------------------------------------------------------------------
# so(3)/se(3)
# ----------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """[...,3] -> [...,3,3] cross-product matrix (ref utils/tracker.py:573-578)."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zero], -1),
        ],
        axis=-2,
    )


def so3_expmap(w: jax.Array) -> jax.Array:
    """Rodrigues: axis-angle [...,3] -> rotation matrix (ref utils/tracker.py:580-589),
    with a Taylor fallback at small angles (the reference divides by zero there).

    The norm is eps-guarded: jnp.linalg.norm has a NaN gradient at exactly 0,
    which poisons any optimization differentiating through expmap at identity."""
    angle = jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True) + 1e-24)
    small = angle < 1e-7
    safe = jnp.where(small, 1.0, angle)
    A = jnp.where(small, 1.0 - angle**2 / 6.0, jnp.sin(safe) / safe)[..., None]
    B = jnp.where(small, 0.5 - angle**2 / 24.0, (1.0 - jnp.cos(safe)) / safe**2)[..., None]
    S = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), S.shape)
    return eye + A * S + B * (S @ S)


def so3_logmap(R: jax.Array) -> jax.Array:
    """Rotation matrix [...,3,3] -> axis-angle [...,3]."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos)
    vee = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    small = angle < 1e-6
    scale = jnp.where(small, 0.5 + angle**2 / 12.0, angle / (2.0 * jnp.where(small, 1.0, jnp.sin(angle))))
    return scale[..., None] * vee


def se3_expmap(xi: jax.Array) -> jax.Array:
    """se(3) [...,6] (rot first, then trans — the tracker's ordering,
    ref utils/tracker.py:504-507) -> [...,4,4]."""
    w, v = xi[..., :3], xi[..., 3:]
    angle = jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True) + 1e-24)  # NaN-grad guard
    small = angle < 1e-7
    safe = jnp.where(small, 1.0, angle)
    A = jnp.where(small, 1.0 - angle**2 / 6.0, jnp.sin(safe) / safe)[..., None]
    B = jnp.where(small, 0.5 - angle**2 / 24.0, (1.0 - jnp.cos(safe)) / safe**2)[..., None]
    C = jnp.where(small, 1.0 / 6.0 - angle**2 / 120.0, (safe - jnp.sin(safe)) / safe**3)[..., None]
    S = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), S.shape)
    R = eye + A * S + B * (S @ S)
    V = eye + B * S + C * (S @ S)
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_logmap(T: jax.Array) -> jax.Array:
    """[...,4,4] -> se(3) [...,6] (rot, trans ordering)."""
    w = so3_logmap(T[..., :3, :3])
    angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = angle < 1e-7
    safe = jnp.where(small, 1.0, angle)
    half = safe * 0.5
    cot = half / jnp.tan(half)
    coef = jnp.where(small, 1.0 / 12.0 + angle**2 / 720.0, (1.0 - cot) / safe**2)[..., None]
    S = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), S.shape)
    Vinv = eye - 0.5 * S + coef * (S @ S)
    v = (Vinv @ T[..., :3, 3:])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def rotation_angle(R: jax.Array) -> jax.Array:
    """Rotation angle in radians of a 3x3 matrix (ref utils/tracker.py:591-600)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


# ----------------------------------------------------------------------
# deskewing (motion undistortion)
# ----------------------------------------------------------------------


def deskew_points(points: jax.Array, ts: jax.Array, rel_pose: jax.Array, valid: jax.Array | None = None,
                  ts_mid_pose: float = 0.5) -> jax.Array:
    """Slerp-based motion undistortion (ref utils/tools.py:540-567).

    points: [N,3] in sensor frame; ts: [N] per-point time (any scale — min/max
    normalized to [0,1]); rel_pose: 4x4 T_last<-cur relative motion.
    valid: optional [N] bool mask excluding padding from the min/max normalization.
    """
    if valid is None:
        tmin, tmax = jnp.min(ts), jnp.max(ts)
    else:
        big, small = jnp.float32(jnp.inf), jnp.float32(-jnp.inf)
        tmin = jnp.min(jnp.where(valid, ts, big))
        tmax = jnp.max(jnp.where(valid, ts, small))
    u = (ts - tmin) / jnp.maximum(tmax - tmin, 1e-9) - ts_mid_pose  # [-0.5, 0.5]

    q1 = rotmat_to_quat(rel_pose[:3, :3].astype(points.dtype))
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=points.dtype)
    # slerp from identity: scale the log; sign of u handled by slerp weights
    q_u = quat_slerp(q0[None, :], q1[None, :], u[:, None])
    R_u = quat_to_rotmat(q_u)
    t_u = u[:, None] * rel_pose[:3, 3].astype(points.dtype)
    return jnp.einsum("nij,nj->ni", R_u, points) + t_u


# ----------------------------------------------------------------------
# host (numpy, f64) pose helpers
# ----------------------------------------------------------------------


def np_se3_inverse(T: np.ndarray) -> np.ndarray:
    R, t = T[:3, :3], T[:3, 3]
    out = np.eye(4, dtype=np.float64)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


def np_rotation_angle_deg(R: np.ndarray) -> float:
    return float(np.degrees(np.arccos(np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0))))
