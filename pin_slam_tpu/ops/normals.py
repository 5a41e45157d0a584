"""Surface-normal estimation for registration source clouds.

The reference plumbs per-point normals into the tracker's normal-consistency
weight ``0.5 + |n . grad_unit|`` (reference utils/tracker.py:331-359) but ships
the extractor itself commented out (dataset/slam_dataset.py:350-365, so
``cur_source_normals`` is always None there).  This module provides the
missing extractor as a TPU-native batched kernel: per-frame voxel hash over
the (already downsampled) source cloud, a 3^3-cell neighbor probe, masked
3x3 covariance, and a closed-form smallest-eigenvector — all fixed-shape,
jit-friendly, no host round trips.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash

_SENTINEL = 1e8


def smallest_eigenvector3(C: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched smallest eigenpair of symmetric 3x3 matrices.

    C: (..., 3, 3).  Returns (eigvec (...,3) unit, eigval (...,)).
    Eigenvalue by the trigonometric closed form (Smith 1961, the batched
    sibling of ops/smallmat.sym_eigvals_min3); eigenvector as the largest
    cross product of rows of ``C - lam_min I`` (the null-space direction).
    """
    a00, a11, a22 = C[..., 0, 0], C[..., 1, 1], C[..., 2, 2]
    a01, a02, a12 = C[..., 0, 1], C[..., 0, 2], C[..., 1, 2]
    p1 = a01**2 + a02**2 + a12**2
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    B = (C - q[..., None, None] * jnp.eye(3, dtype=C.dtype)) / p[..., None, None]
    detB = (B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
            - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
            + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0]))
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    diag_min = jnp.minimum(jnp.minimum(a00, a11), a22)
    lam = jnp.where(p1 < 1e-20, diag_min, lam)

    M = C - lam[..., None, None] * jnp.eye(3, dtype=C.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    cands = jnp.stack([jnp.cross(r1, r2), jnp.cross(r2, r0), jnp.cross(r0, r1)],
                      axis=-2)                                    # (...,3,3)
    norms = jnp.linalg.norm(cands, axis=-1)                       # (...,3)
    best = jnp.argmax(norms, axis=-1)
    vec = jnp.take_along_axis(cands, best[..., None, None]
                              .repeat(3, axis=-1), axis=-2)[..., 0, :]
    n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    # fully degenerate (isotropic) neighborhoods: fall back to +z; callers
    # should gate on the returned eigen-gap / neighbor count anyway
    fallback = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], C.dtype), vec.shape)
    vec = jnp.where(n > 1e-12, vec / jnp.maximum(n, 1e-12), fallback)
    return vec, lam


def estimate_normals(points: jax.Array, valid: jax.Array, cell: float,
                     hash_size: int = 1 << 16, min_neighbors: int = 4,
                     max_planarity: float = 0.5) -> Tuple[jax.Array, jax.Array]:
    """Per-point PCA normals of a (downsampled) sensor-frame cloud.

    points: (N,3) padded; valid: (N,) bool; cell: neighbor grid pitch, of the
    order of the source voxel-downsample size.  One point per hash slot
    (last-write-wins — inputs are voxel-downsampled so slots rarely contend);
    each point probes its 3^3 neighborhood, accumulates a masked covariance,
    and takes the smallest eigenvector, oriented toward the sensor origin
    (LiDAR sees the near side of every surface).

    Returns (normals (N,3) unit, normal_valid (N,) bool).  A normal is valid
    when >= ``min_neighbors`` neighbors contributed and the neighborhood is
    plane-like (lam_min / mean_lam < max_planarity).
    """
    N = points.shape[0]
    pts = jnp.where(valid[:, None], points, _SENTINEL)

    # per-frame packed table: slot -> [x, y, z]
    h = spatial_hash(grid_coords(pts, cell), hash_size)
    slot = jnp.where(valid, h, hash_size)
    table = jnp.full((hash_size + 1, 3), _SENTINEL, pts.dtype).at[slot].set(pts)

    r = jnp.arange(-1, 2)
    offs = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    cells = grid_coords(pts, cell)[:, None, :] + offs[None, :, :]   # (N,27,3)
    nbr = table[spatial_hash(cells, hash_size)]                     # (N,27,3)

    d = nbr - pts[:, None, :]
    dist2 = jnp.sum(d * d, axis=-1)
    near = dist2 < (2.0 * cell) ** 2                                # (N,27)
    cnt = jnp.sum(near, axis=-1)

    w = near.astype(pts.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mu = jnp.sum(jnp.where(near[..., None], nbr, 0.0), axis=1) / wsum
    dc = jnp.where(near[..., None], nbr - mu[:, None, :], 0.0)      # (N,27,3)
    C = jnp.einsum("nki,nkj->nij", dc, dc) / wsum[..., None]

    normal, lam_min = smallest_eigenvector3(C)
    trace = C[..., 0, 0] + C[..., 1, 1] + C[..., 2, 2]
    planar = lam_min < max_planarity * (trace / 3.0 + 1e-12)

    # orient toward the sensor (origin of the sensor frame)
    toward = -jnp.sum(normal * pts, axis=-1)
    normal = jnp.where((toward < 0.0)[:, None], -normal, normal)

    normal_valid = valid & (cnt >= min_neighbors) & planar
    return normal, normal_valid
