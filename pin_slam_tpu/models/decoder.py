"""Shared tiny MLP decoder with SDF / occupancy / semantic / color heads.

TPU-native equivalent of the reference decoder (reference model/decoder.py:15-156):
same architecture — ``Linear(F+3 -> H) -> ReLU -> [Linear(H->H) -> ReLU]* ->
Linear(H -> out)`` with the SDF head scaled by
``logistic_gaussian_ratio * sigma_sigmoid_m`` under BCE loss
(model/decoder.py:51-54).  Parameters are a plain pytree (list of (W, b)),
matmuls hit the MXU; f32 by default with an optional bf16 compute path.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DecoderParams(NamedTuple):
    hidden: Tuple[Tuple[jax.Array, Optional[jax.Array]], ...]  # ((W,b),...) W: [in,out]
    out: Tuple[jax.Array, Optional[jax.Array]]


def init_decoder(key: jax.Array, in_dim: int, hidden_dim: int, hidden_level: int,
                 out_dim: int, bias_on: bool = True) -> DecoderParams:
    """Kaiming-uniform init matching torch.nn.Linear defaults (U(+-1/sqrt(fan_in)))
    so training dynamics match the reference decoder."""
    layers = []
    d = in_dim
    keys = jax.random.split(key, hidden_level + 1)
    for i in range(hidden_level):
        bound = 1.0 / jnp.sqrt(d)
        kw, kb = jax.random.split(keys[i])
        W = jax.random.uniform(kw, (d, hidden_dim), jnp.float32, -bound, bound)
        b = jax.random.uniform(kb, (hidden_dim,), jnp.float32, -bound, bound) if bias_on else None
        layers.append((W, b))
        d = hidden_dim
    bound = 1.0 / jnp.sqrt(d)
    kw, kb = jax.random.split(keys[-1])
    W_out = jax.random.uniform(kw, (d, out_dim), jnp.float32, -bound, bound)
    b_out = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound) if bias_on else None
    return DecoderParams(hidden=tuple(layers), out=(W_out, b_out))


def _mlp(params: DecoderParams, x: jax.Array, compute_dtype=None) -> jax.Array:
    """Shared trunk + head. x: [..., in_dim] -> [..., out_dim]."""
    h = x if compute_dtype is None else x.astype(compute_dtype)
    for W, b in params.hidden:
        Wc = W if compute_dtype is None else W.astype(compute_dtype)
        h = h @ Wc
        if b is not None:
            h = h + (b if compute_dtype is None else b.astype(compute_dtype))
        h = jax.nn.relu(h)
    W, b = params.out
    Wc = W if compute_dtype is None else W.astype(compute_dtype)
    out = h @ Wc
    if b is not None:
        out = out + (b if compute_dtype is None else b.astype(compute_dtype))
    return out.astype(x.dtype)


def sdf(params: DecoderParams, features: jax.Array, sdf_scale: float) -> jax.Array:
    """Scaled SDF prediction (ref model/decoder.py:66-88). [...,F+3] -> [...]"""
    return _mlp(params, features)[..., 0] * sdf_scale


def time_conditioned_sdf(params: DecoderParams, features: jax.Array,
                         ts: jax.Array, sdf_scale: float) -> jax.Array:
    """SDF head with a per-query timestamp channel appended to the feature
    vector (ref model/decoder.py:91-112 ``time_conditionded_sdf``; the decoder
    must have been initialized with ``in_dim = feature_dim + 1``, ref
    model/decoder.py:37).  Dormant in every shipped reference profile but part
    of the decoder surface.

    features: (..., F); ts: broadcastable to features[..., :1].
    """
    t = jnp.broadcast_to(jnp.asarray(ts, features.dtype)[..., None],
                         features.shape[:-1] + (1,))
    return _mlp(params, jnp.concatenate([features, t], axis=-1))[..., 0] * sdf_scale


def occupancy(params: DecoderParams, features: jax.Array, sdf_scale: float) -> jax.Array:
    """Occupancy probability (ref model/decoder.py:115-117)."""
    return jax.nn.sigmoid(_mlp(params, features)[..., 0] * -1.0)


def sem_label_prob(params: DecoderParams, features: jax.Array) -> jax.Array:
    """Per-class log-probabilities (ref model/decoder.py:120-134)."""
    return jax.nn.log_softmax(_mlp(params, features), axis=-1)


def sem_label(params: DecoderParams, features: jax.Array) -> jax.Array:
    return jnp.argmax(sem_label_prob(params, features), axis=-1)


def regress_color(params: DecoderParams, features: jax.Array) -> jax.Array:
    """Clamped color/intensity regression (ref model/decoder.py:140-156)."""
    return jnp.clip(_mlp(params, features), 0.0, 1.0)


def blended_sdf(params: DecoderParams, features: jax.Array, weights: jax.Array,
                weighted_first: bool, sdf_scale: float):
    """SDF under either interpolation mode.

    weighted_first=True: features [B,F+3] (already IDW-blended) -> one decode,
    std = 0 (ref model/neural_points.py:660-665 + utils/mapper.py:466-468).
    weighted_first=False: features [B,k,F+3] -> per-neighbor decode, IDW blend
    of the k SDFs + weighted std (ref utils/tracker.py:240-249).
    Returns (sdf [B], sdf_std [B]).
    """
    if weighted_first:
        out = sdf(params, features, sdf_scale)
        return out, jnp.zeros_like(out)
    per = sdf(params, features, sdf_scale)                 # (B,k)
    mean = jnp.sum(per * weights, axis=-1)
    var = jnp.sum(weights * (per - mean[..., None]) ** 2, axis=-1)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))


def blended_head(head_fn, params: DecoderParams, features: jax.Array,
                 weights: jax.Array, weighted_first: bool) -> jax.Array:
    """Generic blend for sem/color heads (ref utils/tracker.py:258-268)."""
    if weighted_first:
        return head_fn(params, features)
    per = head_fn(params, features)                        # (B,k,C)
    return jnp.sum(per * weights[..., None], axis=-2)


def freeze_tree_mask(params: DecoderParams, frozen: bool):
    """Pytree of bools for optax.masked: True = trainable."""
    return jax.tree.map(lambda _: not frozen, params)
