"""Unrolled small-matrix routines for inside jitted device loops.

XLA's generic ``jnp.linalg`` lowering for tiny systems (LU / syevd) is built
for batched large matrices; on TPU a single 6x6 solve inside a while_loop both
compiles for minutes and runs through scalar-slow paths.  These fully-unrolled
closed forms compile to a handful of VPU ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_solve6(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for a 6x6 SPD matrix via unrolled Cholesky."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def cholesky_inverse6(A: jax.Array) -> jax.Array:
    """Inverse of a 6x6 SPD matrix via 6 unrolled Cholesky solves."""
    eye = jnp.eye(6, dtype=A.dtype)
    cols = [cholesky_solve6(A, eye[:, i]) for i in range(6)]
    return jnp.stack(cols, axis=1)


def sym_eigvals_min3(A: jax.Array) -> jax.Array:
    """Smallest eigenvalue of a symmetric 3x3 matrix, closed form
    (trigonometric method; Smith 1961)."""
    p1 = A[0, 1] ** 2 + A[0, 2] ** 2 + A[1, 2] ** 2
    q = (A[0, 0] + A[1, 1] + A[2, 2]) / 3.0
    p2 = ((A[0, 0] - q) ** 2 + (A[1, 1] - q) ** 2 + (A[2, 2] - q) ** 2 + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    B = (A - q * jnp.eye(3, dtype=A.dtype)) / p
    detB = (B[0, 0] * (B[1, 1] * B[2, 2] - B[1, 2] * B[2, 1])
            - B[0, 1] * (B[1, 0] * B[2, 2] - B[1, 2] * B[2, 0])
            + B[0, 2] * (B[1, 0] * B[2, 1] - B[1, 1] * B[2, 0]))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: q + 2p cos(phi + 2k pi/3); the minimum is at k=1 (phi+2pi/3)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    # degenerate (diagonal) case: p1 == 0
    diag_min = jnp.minimum(jnp.minimum(A[0, 0], A[1, 1]), A[2, 2])
    return jnp.where(p1 < 1e-20, diag_min, lam_min)
