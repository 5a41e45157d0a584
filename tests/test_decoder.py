"""Decoder tests: shapes, head semantics, and parity vs an equivalent torch MLP."""

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.models import decoder as dec


def test_sdf_shape_and_scale():
    key = jax.random.PRNGKey(0)
    params = dec.init_decoder(key, 11, 64, 1, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 11))
    out1 = dec.sdf(params, x, 1.0)
    out2 = dec.sdf(params, x, 0.055)
    assert out1.shape == (32,)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1) * 0.055, rtol=1e-6)


def test_occupancy_is_sigmoid_of_negated_logit():
    key = jax.random.PRNGKey(0)
    params = dec.init_decoder(key, 11, 64, 1, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 11))
    logits = dec._mlp(params, x)[..., 0]
    occ = dec.occupancy(params, x, 0.055)
    np.testing.assert_allclose(np.asarray(occ), 1 / (1 + np.exp(np.asarray(logits))), rtol=1e-5)


def test_sem_log_prob_normalized():
    params = dec.init_decoder(jax.random.PRNGKey(0), 11, 64, 1, 20)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 11))
    logp = dec.sem_label_prob(params, x)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)
    lab = dec.sem_label(params, x)
    assert lab.shape == (8,) and int(lab.max()) < 20


def test_color_clamped():
    params = dec.init_decoder(jax.random.PRNGKey(0), 11, 64, 1, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 11)) * 10
    c = np.asarray(dec.regress_color(params, x))
    assert (c >= 0).all() and (c <= 1).all()


def test_parity_vs_torch_mlp():
    """Same weights -> same SDF as a torch replica of the reference decoder
    (reference model/decoder.py:66-88: Linear-ReLU chain + scaled output)."""
    import torch

    params = dec.init_decoder(jax.random.PRNGKey(3), 11, 64, 1, 1)
    x = np.random.default_rng(0).normal(size=(128, 11)).astype(np.float32)

    tl1 = torch.nn.Linear(11, 64)
    tlo = torch.nn.Linear(64, 1)
    with torch.no_grad():
        tl1.weight.copy_(torch.from_numpy(np.asarray(params.hidden[0][0]).T))
        tl1.bias.copy_(torch.from_numpy(np.asarray(params.hidden[0][1])))
        tlo.weight.copy_(torch.from_numpy(np.asarray(params.out[0]).T))
        tlo.bias.copy_(torch.from_numpy(np.asarray(params.out[1])))
        tout = tlo(torch.relu(tl1(torch.from_numpy(x)))).squeeze(1) * 0.055

    jout = dec.sdf(params, jnp.asarray(x), 0.055)
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), rtol=1e-5, atol=1e-6)


def test_grad_flows():
    params = dec.init_decoder(jax.random.PRNGKey(0), 11, 64, 1, 1)

    def loss(p, x):
        return jnp.sum(dec.sdf(p, x, 0.055) ** 2)

    x = jax.random.normal(jax.random.PRNGKey(1), (16, 11))
    g = jax.grad(loss)(params, x)
    assert float(jnp.abs(g.hidden[0][0]).sum()) > 0
    gx = jax.grad(loss, argnums=1)(params, x)
    assert gx.shape == x.shape


def test_time_conditioned_sdf():
    """Time channel appended to the feature vector (ref model/decoder.py:91-112)."""
    import jax
    import jax.numpy as jnp

    from pin_slam_tpu.models import decoder as dec

    F = 8
    params = dec.init_decoder(jax.random.PRNGKey(0), F + 1, 32, 1, 1)
    feats = jax.random.normal(jax.random.PRNGKey(1), (64, F))
    ts = jnp.linspace(0.0, 1.0, 64)
    out = dec.time_conditioned_sdf(params, feats, ts, 0.055)
    assert out.shape == (64,)
    # equals the plain head on manually concatenated input
    ref = dec.sdf(params, jnp.concatenate([feats, ts[:, None]], -1), 0.055)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    # the time channel matters: different ts -> different sdf
    out2 = dec.time_conditioned_sdf(params, feats, ts + 0.5, 0.055)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-4
