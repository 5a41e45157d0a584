"""Loss tests vs closed form and torch BCEWithLogits parity."""

import jax.numpy as jnp
import numpy as np
import torch

from pin_slam_tpu.ops import losses


def test_bce_matches_torch(rng):
    pred = rng.normal(size=256).astype(np.float32) * 0.2
    label = rng.normal(size=256).astype(np.float32) * 0.2
    sigma = 0.1
    ours = float(losses.sdf_bce_loss(jnp.asarray(pred), jnp.asarray(label), sigma))
    t_target = torch.sigmoid(torch.from_numpy(label) / sigma)
    t_loss = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(pred) / sigma, t_target)
    assert abs(ours - float(t_loss)) < 1e-5


def test_bce_weighted_matches_torch(rng):
    pred = rng.normal(size=128).astype(np.float32) * 0.2
    label = rng.normal(size=128).astype(np.float32) * 0.2
    w = rng.uniform(0.5, 1.5, size=128).astype(np.float32)
    sigma = 0.1
    ours = float(losses.sdf_bce_loss(jnp.asarray(pred), jnp.asarray(label), sigma,
                                     jnp.asarray(w), weighted=True))
    t_target = torch.sigmoid(torch.from_numpy(label) / sigma)
    t_loss = torch.nn.BCEWithLogitsLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(pred) / sigma, t_target)
    assert abs(ours - float(t_loss)) < 1e-5


def test_bce_valid_mask(rng):
    pred = rng.normal(size=64).astype(np.float32)
    label = rng.normal(size=64).astype(np.float32)
    full = float(losses.sdf_bce_loss(jnp.asarray(pred[:32]), jnp.asarray(label[:32]), 0.1))
    masked = float(losses.sdf_bce_loss(jnp.asarray(pred), jnp.asarray(label), 0.1,
                                       valid=jnp.asarray(np.arange(64) < 32)))
    assert abs(full - masked) < 1e-6


def test_zhong_loss_zero_inside():
    # prediction exactly at label/2 midpoint -> zero loss away from surface
    label = jnp.asarray([1.0, -1.0])
    pred = label / 2
    assert float(losses.sdf_zhong_loss(pred, label)) == 0.0


def test_eikonal():
    g = jnp.asarray([[1.0, 0, 0], [0, 2.0, 0]])
    assert abs(float(losses.eikonal_loss(g)) - 0.5) < 1e-6
    assert abs(float(losses.eikonal_loss(g, valid=jnp.asarray([True, False])))) < 1e-6


def test_sem_nll_matches_torch(rng):
    logits = rng.normal(size=(32, 20)).astype(np.float32)
    label = rng.integers(0, 20, size=32)
    logp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    expect = torch.nn.NLLLoss()(logp, torch.from_numpy(label))
    ours = float(losses.sem_nll_loss(jnp.asarray(logp.numpy()), jnp.asarray(label)))
    assert abs(ours - float(expect)) < 1e-5


def test_color_diff(rng):
    pred = rng.uniform(size=(16, 3)).astype(np.float32)
    label = rng.uniform(size=(16, 3)).astype(np.float32)
    ours = float(losses.color_diff_loss(jnp.asarray(pred), jnp.asarray(label)))
    assert abs(ours - np.abs(pred - label).mean()) < 1e-6
