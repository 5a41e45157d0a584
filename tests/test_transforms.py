"""Unit tests for SE(3)/quaternion geometry vs closed-form / scipy."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from pin_slam_tpu.ops import transforms as tf


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(rng.integers(1 << 30)))


def test_transform_points_matches_numpy(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    R = random_rotations(rng, 1).as_matrix()[0]
    t = rng.normal(size=3)
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    out = np.asarray(tf.transform_points(jnp.asarray(pts), jnp.asarray(T)))
    np.testing.assert_allclose(out, pts @ R.T + t, rtol=1e-5, atol=1e-5)


def test_transform_points_batch(rng):
    pts = rng.normal(size=(16, 3)).astype(np.float32)
    Rs = random_rotations(rng, 16).as_matrix()
    ts = rng.normal(size=(16, 3))
    Ts = np.tile(np.eye(4), (16, 1, 1))
    Ts[:, :3, :3], Ts[:, :3, 3] = Rs, ts
    out = np.asarray(tf.transform_points_batch(jnp.asarray(pts), jnp.asarray(Ts, dtype=np.float32)))
    expect = np.einsum("nij,nj->ni", Rs, pts) + ts
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_quat_roundtrip(rng):
    Rs = random_rotations(rng, 50).as_matrix().astype(np.float32)
    q = tf.rotmat_to_quat(jnp.asarray(Rs))
    R2 = np.asarray(tf.quat_to_rotmat(q))
    np.testing.assert_allclose(R2, Rs, atol=1e-5)


def test_quat_roundtrip_degenerate():
    # 180-degree rotations break the naive sqrt(1+trace) construction
    axes = np.eye(3)
    Rs = Rotation.from_rotvec(np.pi * axes).as_matrix().astype(np.float32)
    q = tf.rotmat_to_quat(jnp.asarray(Rs))
    R2 = np.asarray(tf.quat_to_rotmat(q))
    np.testing.assert_allclose(R2, Rs, atol=1e-5)


def test_quat_multiply_matches_scipy(rng):
    ra, rb = random_rotations(rng, 8), random_rotations(rng, 8)
    qa = np.roll(ra.as_quat(), 1, axis=-1)  # xyzw -> wxyz
    qb = np.roll(rb.as_quat(), 1, axis=-1)
    q = np.asarray(tf.quat_multiply(jnp.asarray(qa, dtype=np.float32), jnp.asarray(qb, dtype=np.float32)))
    expect = np.roll((ra * rb).as_quat(), 1, axis=-1)
    # sign ambiguity
    sign = np.sign(np.sum(q * expect, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, expect * sign, atol=1e-5)


def test_apply_quaternion_rotation_is_passive(rng):
    """q applied passively == R(q)^T p (the reference's convention,
    utils/tools.py:316-323)."""
    r = random_rotations(rng, 4)
    q = np.roll(r.as_quat(), 1, axis=-1).astype(np.float32)
    pts = rng.normal(size=(4, 3)).astype(np.float32)
    out = np.asarray(tf.apply_quaternion_rotation(jnp.asarray(q), jnp.asarray(pts)))
    expect = np.einsum("nji,nj->ni", r.as_matrix(), pts)  # R^T p
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(20, 3)).astype(np.float32) * 0.5
    R = tf.so3_expmap(jnp.asarray(w))
    w2 = np.asarray(tf.so3_logmap(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)
    # against scipy
    np.testing.assert_allclose(np.asarray(R), Rotation.from_rotvec(w).as_matrix(), atol=1e-5)


def test_so3_expmap_small_angle():
    w = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = np.asarray(tf.so3_expmap(w))
    np.testing.assert_allclose(R, np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(20, 6)).astype(np.float32) * 0.3
    T = tf.se3_expmap(jnp.asarray(xi))
    xi2 = np.asarray(tf.se3_logmap(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)
    # bottom row well-formed
    np.testing.assert_allclose(np.asarray(T)[:, 3], np.tile([0, 0, 0, 1.0], (20, 1)), atol=0)


def test_quat_slerp_against_scipy(rng):
    r = random_rotations(rng, 2)
    times = [0.0, 1.0]
    slerp = Slerp(times, r)
    u = np.linspace(0, 1, 7)
    expect = np.roll(slerp(u).as_quat(), 1, axis=-1)
    q0 = np.roll(r[0].as_quat(), 1).astype(np.float32)
    q1 = np.roll(r[1].as_quat(), 1).astype(np.float32)
    got = np.asarray(tf.quat_slerp(jnp.asarray(q0)[None], jnp.asarray(q1)[None], jnp.asarray(u, dtype=np.float32)[:, None]))
    sign = np.sign(np.sum(got * expect, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, expect * sign, atol=1e-4)


def test_deskew_endpoints(rng):
    """Points at ts=mid stay put; ts=1 gets half the relative motion applied."""
    pts = rng.normal(size=(3, 3)).astype(np.float32) * 10
    rel = np.eye(4, dtype=np.float32)
    rel[:3, 3] = [1.0, 0, 0]
    ts = np.asarray([0.0, 0.5, 1.0], dtype=np.float32)
    out = np.asarray(tf.deskew_points(jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(rel)))
    np.testing.assert_allclose(out[1], pts[1], atol=1e-5)  # mid: unchanged
    np.testing.assert_allclose(out[0], pts[0] + [-0.5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[2], pts[2] + [0.5, 0, 0], atol=1e-5)


def test_rotation_angle(rng):
    ang = 0.7
    R = Rotation.from_rotvec([0, 0, ang]).as_matrix().astype(np.float32)
    got = float(tf.rotation_angle(jnp.asarray(R)))
    assert got == pytest.approx(ang, abs=1e-5)
