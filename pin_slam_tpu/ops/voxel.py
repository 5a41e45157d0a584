"""Voxel-grid downsampling with static shapes (masks instead of index lists).

TPU-native equivalents of the reference's scatter-amin voxel downsampling
(reference utils/tools.py:409-477).  The reference returns a dynamically-sized
index list via torch.unique + scatter_reduce(amin); XLA needs static shapes, so
we instead return a *boolean keep-mask* over the (padded) input, computed with a
single scatter-min into a scratch hash table:

    packed = (quantized_value << IDX_BITS) | point_index
    table[hash(voxel)] <- min(packed)            (one jnp .at[].min scatter)
    keep  = table[hash(voxel)] == packed

The arg-min payload trick is the same one the reference uses
(utils/tools.py:433-441); hashing replaces the exact torch.unique (collision
probability ~N^2/2H, negligible for H >= 16N, and a lost voxel is re-observed
next frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash

_VAL_BITS = 10  # max quantization levels for the per-voxel score
_SENTINEL = np.int32(2**30)  # plain numpy: a module-level jnp constant would
#                              initialize the XLA backend at import time,
#                              breaking jax.distributed.initialize() ordering
_SENTINEL_U = np.uint32(0xFFFFFFFF)


def _val_bits(n: int) -> int:
    """Score bits of the packed (score << idx_bits | idx) argmin word.

    uint32 packing: idx needs ceil(log2(n)) bits, the score gets the rest
    (capped at _VAL_BITS).  Tie-breaking (same score -> lowest idx wins) is
    independent of the split, so results are bit-identical across sizes;
    only the score QUANTIZATION coarsens for maps beyond 2^22 points
    (2^24-cap rehash: 256 levels — the score is a preference heuristic,
    ref utils/tools.py:444-477 packs value*N+idx in int64 the same way)."""
    idx_bits = max(1, (int(n) - 1).bit_length())
    vb = min(_VAL_BITS, 32 - idx_bits)
    assert vb >= 4, f"too many points for packed argmin: {n}"
    return vb


def _scatter_argmin_mask(key: jax.Array, score_q: jax.Array, valid: jax.Array, table_size: int) -> jax.Array:
    """Keep-mask of per-key score-argmin winners.
    score_q: int32 in [0, 2^_val_bits(n))."""
    n = key.shape[0]
    idx_bits = 32 - _val_bits(n)
    idx = jnp.arange(n, dtype=jnp.uint32)
    packed = (score_q.astype(jnp.uint32) << idx_bits) | idx
    packed = jnp.where(valid, packed, _SENTINEL_U)
    slot = jnp.where(valid, key, table_size)  # dump slot for padding
    table = jnp.full((table_size + 1,), _SENTINEL_U, dtype=jnp.uint32)
    table = table.at[slot].min(packed, mode="drop")
    return (table[slot] == packed) & valid


def voxel_down_sample_mask(points: jax.Array, valid: jax.Array, voxel_size: float,
                           table_size: int) -> jax.Array:
    """Keep the point closest to its voxel center (ref utils/tools.py:409-442).

    points: [N,3] (padded); valid: [N] bool. Returns [N] bool keep-mask.
    """
    grid = grid_coords(points, voxel_size)
    key = spatial_hash(grid, table_size)
    center = (grid.astype(points.dtype) + 0.5) * voxel_size
    dist2 = jnp.sum((points - center) ** 2, axis=-1)
    # max distance-to-center inside a voxel is (sqrt(3)/2 * voxel)^2
    norm = (0.75 * voxel_size * voxel_size)
    vb = _val_bits(points.shape[0])
    score_q = jnp.clip((dist2 / norm * ((1 << vb) - 1)).astype(jnp.int32),
                       0, (1 << vb) - 1)
    return _scatter_argmin_mask(key, score_q, valid, table_size)


def voxel_down_sample_min_value_mask(points: jax.Array, valid: jax.Array, voxel_size: float,
                                     values: jax.Array, table_size: int) -> jax.Array:
    """Keep the point with the minimum ``values`` per voxel
    (ref utils/tools.py:444-477; used for time/certainty-preferring rehash).
    """
    grid = grid_coords(points, voxel_size)
    key = spatial_hash(grid, table_size)
    vmax = jnp.max(jnp.where(valid, values, -jnp.inf))
    vmin = jnp.min(jnp.where(valid, values, jnp.inf))
    span = jnp.maximum(vmax - vmin, 1e-12)
    vb = _val_bits(points.shape[0])
    score_q = jnp.clip(((values - vmin) / span * ((1 << vb) - 1)).astype(jnp.int32),
                       0, (1 << vb) - 1)
    return _scatter_argmin_mask(key, score_q, valid, table_size)


def random_down_sample_mask(key: jax.Array, n: int, valid: jax.Array, ratio: float) -> jax.Array:
    """Random decimation keep-mask (ref dataset/slam_dataset.py random downsample)."""
    keep = jax.random.uniform(key, (n,)) < ratio
    return keep & valid


def crop_mask(points: jax.Array, valid: jax.Array, min_range: float, max_range: float,
              min_z: float, max_z: float) -> jax.Array:
    """Range + z crop (ref dataset/slam_dataset.py:260-374 preprocess)."""
    d = jnp.linalg.norm(points, axis=-1)
    return (valid & (d > min_range) & (d < max_range)
            & (points[..., 2] > min_z) & (points[..., 2] < max_z))


def pad_to(points, n: int, fill=0.0):
    """Host-side helper: pad/truncate [M,...] array to [n,...], return (arr, valid)."""
    import numpy as np

    m = points.shape[0]
    out_shape = (n,) + points.shape[1:]
    out = np.full(out_shape, fill, dtype=points.dtype)
    k = min(m, n)
    out[:k] = points[:k]
    valid = np.zeros((n,), dtype=bool)
    valid[:k] = True
    return out, valid
