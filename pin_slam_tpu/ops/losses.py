"""Training losses (reference utils/loss.py:9-155).

All losses take a ``valid`` mask (padding-aware means) since TPU batches are
statically shaped.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, valid: Optional[jax.Array]) -> jax.Array:
    if valid is None:
        return jnp.mean(x)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, x, 0.0)) / denom


def sdf_bce_loss(pred: jax.Array, label: jax.Array, sigma: float,
                 weight: Optional[jax.Array] = None, weighted: bool = False,
                 valid: Optional[jax.Array] = None) -> jax.Array:
    """Main BCE-with-logits SDF loss: the label is squashed to an occupancy
    probability via sigmoid(label/sigma) (ref utils/loss.py:40-47)."""
    target = jax.nn.sigmoid(label / sigma)
    logits = pred / sigma
    # numerically-stable BCE-with-logits
    per = jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weighted and weight is not None:
        per = per * weight
    return _masked_mean(per, valid)


def sdf_zhong_loss(pred: jax.Array, label: jax.Array, trunc_dist: Optional[float] = None,
                   weight: Optional[jax.Array] = None, weighted: bool = False,
                   valid: Optional[jax.Array] = None) -> jax.Array:
    """Shift-aware truncated loss (ref utils/loss.py:50-65)."""
    mid = label / 2.0
    mid_abs = jnp.abs(mid)
    shift = jnp.abs(pred - mid)
    loss = jnp.where(shift > mid_abs, shift - mid_abs, 0.0)
    if trunc_dist is not None:
        surface = jnp.abs(label) < trunc_dist
        loss = jnp.where(surface, jnp.abs(pred - label), loss)
    if weighted and weight is not None:
        loss = loss * weight
    return _masked_mean(loss, valid)


def sdf_diff_loss(pred: jax.Array, label: jax.Array, weight: jax.Array,
                  scale: float = 1.0, l2: bool = True,
                  valid: Optional[jax.Array] = None) -> jax.Array:
    """Weighted L1/L2 (ref utils/loss.py:9-17; note the reference divides by the
    count, i.e. a weighted sum / N — reproduced here)."""
    diff = (pred - label) / scale
    per = weight * (diff**2 if l2 else jnp.abs(diff))
    return _masked_mean(per, valid)


def color_diff_loss(pred: jax.Array, label: jax.Array, weight: Optional[jax.Array] = None,
                    weighted: bool = False, l2: bool = False,
                    valid: Optional[jax.Array] = None) -> jax.Array:
    """(ref utils/loss.py:27-37)."""
    diff = pred - label
    per = diff**2 if l2 else jnp.abs(diff)
    if weighted and weight is not None:
        per = per * weight[:, None]
    if valid is not None:
        valid = jnp.broadcast_to(valid[:, None], per.shape)
    return _masked_mean(per, valid)


def eikonal_loss(grad: jax.Array, valid: Optional[jax.Array] = None) -> jax.Array:
    """MSE of |grad| against 1 (ref utils/mapper.py:546-547).

    The norm is epsilon-guarded: samples with no map neighbors have an exactly
    zero numerical gradient and jnp's norm has a NaN derivative at 0 (torch
    returns the subgradient 0 there, so the reference never trips this).
    """
    norm = jnp.sqrt(jnp.sum(grad * grad, axis=-1) + 1e-12)
    per = (norm - 1.0) ** 2
    return _masked_mean(per, valid)


def sem_nll_loss(log_prob: jax.Array, label: jax.Array,
                 valid: Optional[jax.Array] = None) -> jax.Array:
    """NLL over log-softmax outputs (ref utils/mapper.py:553-560)."""
    picked = -jnp.take_along_axis(log_prob, label[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return _masked_mean(picked, valid)
