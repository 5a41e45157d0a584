"""Unrolled small-matrix routines vs numpy linalg."""

import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.ops import smallmat


def spd6(rng):
    A = rng.normal(size=(6, 6))
    return (A @ A.T + 6 * np.eye(6)).astype(np.float32)


def test_cholesky_solve6(rng):
    for _ in range(10):
        A = spd6(rng)
        b = rng.normal(size=6).astype(np.float32)
        x = np.asarray(smallmat.cholesky_solve6(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(A @ x, b, rtol=2e-4, atol=2e-4)


def test_cholesky_inverse6(rng):
    A = spd6(rng)
    inv = np.asarray(smallmat.cholesky_inverse6(jnp.asarray(A)))
    np.testing.assert_allclose(A @ inv, np.eye(6), atol=2e-4)


def test_sym_eigvals_min3(rng):
    for _ in range(20):
        B = rng.normal(size=(3, 3))
        A = (B @ B.T).astype(np.float32)
        lam = float(smallmat.sym_eigvals_min3(jnp.asarray(A)))
        expect = np.linalg.eigvalsh(A)[0]
        np.testing.assert_allclose(lam, expect, rtol=1e-3, atol=1e-4)
    # diagonal degenerate case
    A = np.diag([3.0, 1.0, 2.0]).astype(np.float32)
    assert float(smallmat.sym_eigvals_min3(jnp.asarray(A))) == 1.0
