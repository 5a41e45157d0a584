"""Positional encoders (ref model/neural_points.py:706-763): parity of the
NeRF log-frequency encoder against a torch transcription of the reference
formula, Gaussian Fourier feature invariants, and end-to-end query/gradient
flow with encoding enabled."""

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops.encodings import encoded_dim, positional_encode
from tests.test_neural_points import make_map, small_config


def torch_reference_pe(x, bands, freq, base):
    """Direct transcription of the reference PositionalEncoder.forward
    (model/neural_points.py:720-739)."""
    import torch

    x = torch.as_tensor(x)[..., :, None]
    orig = x
    scales = torch.logspace(0.0, torch.log(torch.tensor(float(freq) / 2))
                            / torch.log(torch.tensor(float(base))), bands,
                            base=float(base), dtype=x.dtype)
    scales = scales[(*((None,) * (len(x.shape) - 1)), Ellipsis)]
    x = x * scales * torch.pi
    x = torch.cat([x.sin(), x.cos()], dim=-1)
    x = torch.cat((x, orig), dim=-1)
    return x.flatten(-2, -1).numpy()


def test_nerf_pe_matches_reference_formula(rng):
    import torch

    from pin_slam_tpu.ops.encodings import _nerf_scales

    x = rng.uniform(-0.5, 0.5, size=(64, 6, 3)).astype(np.float32)
    for bands, freq, base in [(4, 200.0, 2.0), (8, 50.0, 2.0), (3, 200.0, 10.0)]:
        # frequency ladder matches torch.logspace to f32 round-off
        t_scales = torch.logspace(0.0, torch.log(torch.tensor(freq / 2))
                                  / torch.log(torch.tensor(base)), bands,
                                  base=base).numpy()
        np.testing.assert_allclose(_nerf_scales(bands, freq, base), t_scales,
                                   rtol=1e-6)
        ours = np.asarray(positional_encode(jnp.asarray(x), bands, freq, base, False))
        ref = torch_reference_pe(x, bands, freq, base)
        assert ours.shape == (64, 6, 3 * (2 * bands + 1))
        assert ours.shape[-1] == encoded_dim(3, bands, False)
        # trig of phases up to x*freq/2*pi ~ 157 rad amplifies f32 ladder ULPs;
        # 5e-3 bounds that while still catching layout/formula errors
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_gaussian_ff_invariants(rng):
    x = rng.uniform(-0.5, 0.5, size=(32, 3)).astype(np.float32)
    bands = 16
    out = np.asarray(positional_encode(jnp.asarray(x), bands, 200.0, 2.0, True))
    assert out.shape == (32, 3 + 2 * bands)
    assert out.shape[-1] == encoded_dim(3, bands, True)
    # passthrough of the raw coords (ref model/neural_points.py:757)
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
    # sin^2 + cos^2 == 1 bandwise
    s, c = out[:, 3:3 + bands], out[:, 3 + bands:]
    np.testing.assert_allclose(s**2 + c**2, 1.0, atol=1e-5)
    # deterministic across calls (fixed seed): a reloaded map decodes identically
    out2 = np.asarray(positional_encode(jnp.asarray(x), bands, 200.0, 2.0, True))
    np.testing.assert_allclose(out, out2)


def test_band0_is_identity(rng):
    x = rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)
    out = positional_encode(jnp.asarray(x), 0, 200.0, 2.0, False)
    np.testing.assert_allclose(np.asarray(out), x)
    assert encoded_dim(3, 0, False) == 3


def test_query_with_encoding_runs_and_grads_flow(rng):
    """interpolate_features + decoder with pos_encoding_band>0: output width is
    F + encoded_dim, and jax.grad w.r.t. query points is finite and nonzero
    (the tracker's vjp fallback path)."""
    bands = 4
    mc = small_config(pos_encoding_band=bands, pos_encoding_freq=200.0,
                      pos_encoding_base=2.0)
    pts = rng.uniform(-4, 4, size=(600, 3)).astype(np.float32)
    state, lm, _ = make_map(mc, pts)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.5))
    q = rng.uniform(-3, 3, size=(32, 3)).astype(np.float32)

    knn = npts.knn_search(lm, mc, jnp.asarray(q), offsets)
    feat, _, w, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), knn.lidx)
    P = encoded_dim(3, bands, False)
    assert feat.shape == (32, mc.feature_dim + P)

    params = dec.init_decoder(jax.random.PRNGKey(0), mc.feature_dim + P, 32, 1, 1)
    # give features signal so the SDF isn't constant
    lm = lm._replace(geo_features=jnp.asarray(
        rng.standard_normal(lm.geo_features.shape).astype(np.float32)))

    def f(p):
        k = npts.knn_search(lm, mc, p, offsets)
        g, _, wts, _ = npts.interpolate_features(lm, mc, p, k.lidx)
        s, _ = dec.blended_sdf(params, g, wts, mc.weighted_first, 0.1375)
        return jnp.sum(s)

    grad = np.asarray(jax.grad(f)(jnp.asarray(q)))
    assert np.all(np.isfinite(grad))
    assert np.abs(grad).max() > 0
