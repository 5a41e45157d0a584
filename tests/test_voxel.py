"""Unit tests for voxel downsampling / cropping vs brute-force numpy."""

import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.ops import voxel


def brute_force_closest_to_center(points, voxel_size):
    """Reference semantics of utils/tools.py:409-442: keep, per voxel, the point
    closest to the voxel center."""
    grid = np.floor(points / voxel_size).astype(np.int64)
    center = (grid + 0.5) * voxel_size
    dist = np.linalg.norm(points - center, axis=1)
    keys = {}
    for i, (g, d) in enumerate(zip(map(tuple, grid), dist)):
        if g not in keys or d < keys[g][0]:
            keys[g] = (d, i)
    return sorted(i for _, i in keys.values())


def test_voxel_down_sample_matches_bruteforce(rng):
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    valid = np.ones(500, dtype=bool)
    mask = np.asarray(voxel.voxel_down_sample_mask(jnp.asarray(pts), jnp.asarray(valid), 0.5, 1 << 16))
    got = sorted(np.nonzero(mask)[0].tolist())
    expect = brute_force_closest_to_center(pts, 0.5)
    # one winner per voxel (up to rare hash collisions merging two voxels), and
    # winners match brute force up to score quantization
    assert 0.98 * len(expect) <= len(got) <= len(expect)
    agree = len(set(got) & set(expect))
    assert agree >= 0.95 * len(expect)


def test_voxel_down_sample_one_per_voxel(rng):
    pts = rng.uniform(-2, 2, size=(1000, 3)).astype(np.float32)
    valid = np.ones(1000, dtype=bool)
    mask = np.asarray(voxel.voxel_down_sample_mask(jnp.asarray(pts), jnp.asarray(valid), 0.4, 1 << 16))
    grid = np.floor(pts[mask] / 0.4).astype(np.int64)
    uniq = {tuple(g) for g in grid}
    assert len(uniq) == mask.sum()


def test_voxel_down_sample_respects_valid(rng):
    pts = np.zeros((64, 3), dtype=np.float32)  # all in one voxel
    pts[:32] = rng.uniform(0.01, 0.09, size=(32, 3))
    valid = np.zeros(64, dtype=bool)
    valid[:32] = True
    mask = np.asarray(voxel.voxel_down_sample_mask(jnp.asarray(pts), jnp.asarray(valid), 0.5, 1 << 12))
    assert mask.sum() == 1
    assert mask[:32].sum() == 1


def test_min_value_downsample(rng):
    pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    values = rng.uniform(0, 10, size=200).astype(np.float32)
    valid = np.ones(200, dtype=bool)
    mask = np.asarray(voxel.voxel_down_sample_min_value_mask(
        jnp.asarray(pts), jnp.asarray(valid), 0.5, jnp.asarray(values), 1 << 14))
    grid = np.floor(pts / 0.5).astype(np.int64)
    # for each kept point, it should have (nearly) the min value in its voxel
    vox_min = {}
    for g, v in zip(map(tuple, grid), values):
        vox_min[g] = min(vox_min.get(g, np.inf), v)
    kept = np.nonzero(mask)[0]
    span = values.max() - values.min()
    for i in kept:
        g = tuple(grid[i])
        assert values[i] <= vox_min[g] + span / 1023 + 1e-5


def test_crop_mask():
    pts = np.asarray([[1.0, 0, 0], [10, 0, 0], [100, 0, 0], [10, 0, -8], [10, 0, 70]], dtype=np.float32)
    valid = np.ones(5, dtype=bool)
    mask = np.asarray(voxel.crop_mask(jnp.asarray(pts), jnp.asarray(valid), 2.5, 60.0, -4.0, 60.0))
    np.testing.assert_array_equal(mask, [False, True, False, False, False])


def test_pad_to(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out, valid = voxel.pad_to(pts, 16)
    assert out.shape == (16, 3) and valid.sum() == 10
    out2, valid2 = voxel.pad_to(pts, 4)
    assert out2.shape == (4, 3) and valid2.sum() == 4
