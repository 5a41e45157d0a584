"""3-D spatial hashing (voxel-grid keys) on device.

Equivalent of the reference's 3-prime voxel hash
(reference model/neural_points.py:69,214-218, utils/tools.py:723-733):
``floor(p/voxel) . primes mod buffer_size``.  The reference computes this in
int64; TPUs have no fast int64, so we do the multiply-accumulate in uint32
(wrap-around arithmetic == mod 2^32) before the final mod — an equally-good
hash family with the same collision statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# large primes, same as the reference
PRIMES = (73856093, 19349669, 83492791)


def grid_coords(points: jax.Array, voxel_size: float) -> jax.Array:
    """floor(p / voxel) as int32 [...,3]."""
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def spatial_hash(grid: jax.Array, table_size: int) -> jax.Array:
    """Hash int32 grid coords [...,3] -> slot index [..] in [0, table_size)."""
    g = grid.astype(jnp.uint32)
    h = g[..., 0] * jnp.uint32(PRIMES[0]) + g[..., 1] * jnp.uint32(PRIMES[1]) + g[..., 2] * jnp.uint32(PRIMES[2])
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def hash_points(points: jax.Array, voxel_size: float, table_size: int) -> jax.Array:
    return spatial_hash(grid_coords(points, voxel_size), table_size)
