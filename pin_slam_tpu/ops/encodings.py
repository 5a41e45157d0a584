"""Positional encoders for the query-to-neighbor offset vector.

TPU-native equivalents of the reference encoders (reference
model/neural_points.py:706-763), applied to the [B, K, 3] offset vectors
before they are concatenated to the neighbor features
(model/neural_points.py:610-611).  Both are pure elementwise/matmul math, so
they fuse into the surrounding query under XLA.  The Gaussian variant's
projection matrix is derived deterministically from a fixed seed so that a
saved map decodes identically after reload (the reference pickles the module
buffer instead, utils/tools.py:224-238).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def encoded_dim(in_dim: int, bands: int, gaussian: bool) -> int:
    """Output width of the encoder; ``in_dim`` when encoding is off
    (ref model/neural_points.py:716,757)."""
    if bands <= 0:
        return in_dim
    if gaussian:
        return in_dim + 2 * bands
    return in_dim * (2 * bands + 1)


@lru_cache(maxsize=8)
def _nerf_scales(bands: int, freq: float, base: float) -> np.ndarray:
    """logspace(0, log_base(freq/2), bands) — geometric frequency ladder
    (ref model/neural_points.py:726-727)."""
    hi = np.log(freq / 2.0) / np.log(base)
    return (base ** np.linspace(0.0, hi, bands)).astype(np.float32)


@lru_cache(maxsize=8)
def _gaussian_B(in_dim: int, bands: int, freq: float, seed: int) -> np.ndarray:
    """Fixed random projection, N(0, freq^2) (ref model/neural_points.py:752-753)."""
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((in_dim, bands)) * freq).astype(np.float32)


def positional_encode(x: jax.Array, bands: int, freq: float, base: float,
                      gaussian: bool, seed: int = 42) -> jax.Array:
    """Encode offsets x: [..., D] -> [..., encoded_dim(D, bands, gaussian)].

    NeRF-style (ref model/neural_points.py:720-739): per input dimension
    ``[sin(pi s_0 x) .. sin(pi s_B x), cos(pi s_0 x) .. cos(pi s_B x), x]``
    flattened over dimensions.  Gaussian Fourier features
    (ref :745-763): ``[x, sin(2 pi x @ B), cos(2 pi x @ B)]``.
    Identity when ``bands <= 0``.
    """
    if bands <= 0:
        return x
    if gaussian:
        B = jnp.asarray(_gaussian_B(x.shape[-1], bands, float(freq), seed))
        proj = (2.0 * jnp.pi) * (x @ B)
        return jnp.concatenate([x, jnp.sin(proj), jnp.cos(proj)], axis=-1)
    scales = jnp.asarray(_nerf_scales(bands, float(freq), float(base)))
    xs = x[..., None] * scales * jnp.pi                       # [..., D, bands]
    enc = jnp.concatenate([jnp.sin(xs), jnp.cos(xs), x[..., None]], axis=-1)
    return enc.reshape(*x.shape[:-1], x.shape[-1] * (2 * bands + 1))
