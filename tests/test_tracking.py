"""Registration test: train a map on a synthetic room, then recover a known
small SE(3) perturbation of a fresh scan (the reference's validation scenario,
SURVEY.md section 7.1 step 4).

The map is trained once per session (600 iters x bs 8192, mirroring the
reference's first-frame budget of 600 iters x bs 16384, utils/config.py:241-242)
and shared by all tracker tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pin_slam_tpu.slam import tracker as trk
from tests.test_mapping import build_and_train, ray_box_endpoints


@pytest.fixture(scope="module")
def trained_map():
    rng = np.random.default_rng(7)
    return rng, build_and_train(rng, n_rays=8192, iters=600, bs=8192)


def test_tracker_recovers_perturbation(trained_map):
    rng, (mc, mcfg, state, lm, params, offsets, travel, _) = trained_map
    tc = trk.TrackerConfig(reg_iter_n=40, mask_min_nn_count=6)

    # ground-truth motion: ~1.5 deg rotation + ~15 cm translation
    rot_gt = Rotation.from_rotvec([0.01, 0.02, -0.015])
    t_gt = np.asarray([0.10, -0.08, 0.05])

    # fresh scan of the same walls, expressed in the *sensor* frame of the
    # perturbed pose: p_sensor = R_gt^T (p_world - t_gt)
    world_pts = ray_box_endpoints(rng, 2048)
    source = (rot_gt.as_matrix().T @ (world_pts - t_gt).T).T.astype(np.float32)

    res = trk.track_frame(
        lm, mc, tc, params.geo, 0.055, offsets,
        jnp.asarray(source), jnp.ones(2048, dtype=bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))

    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    assert bool(res.valid), f"tracking flagged invalid: res={res.sdf_residual_cm}"

    rot_err_deg = np.degrees(
        np.arccos(np.clip((np.trace(rot_gt.as_matrix().T @ R_est) - 1) / 2, -1, 1)))
    t_err = np.linalg.norm(t_est - t_gt)
    # tolerances sized to the residual bias of the learned field (~2 cm)
    assert rot_err_deg < 0.6, rot_err_deg
    assert t_err < 0.06, t_err
    assert float(res.sdf_residual_cm) < 10.0
    assert int(res.valid_count) > 1000


def test_tracker_identity_stays_put(trained_map):
    rng, (mc, mcfg, state, lm, params, offsets, travel, _) = trained_map
    tc = trk.TrackerConfig(reg_iter_n=20)
    source = ray_box_endpoints(rng, 1024)
    res = trk.track_frame(
        lm, mc, tc, params.geo, 0.055, offsets,
        jnp.asarray(source), jnp.ones(1024, dtype=bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    assert bool(res.valid)
    assert np.linalg.norm(np.asarray(res.t)) < 0.04
    ang = np.degrees(np.arccos(np.clip((np.trace(np.asarray(res.R)) - 1) / 2, -1, 1)))
    assert ang < 0.4


def test_tracker_fails_gracefully_far_from_map(trained_map):
    """With the scan far outside the mapped region the health gates must
    trip (ref utils/tracker.py:118-135)."""
    rng, (mc, mcfg, state, lm, params, offsets, travel, _) = trained_map
    tc = trk.TrackerConfig(reg_iter_n=10)
    source = ray_box_endpoints(rng, 512) + np.float32([200.0, 0, 0])
    res = trk.track_frame(
        lm, mc, tc, params.geo, 0.055, offsets,
        jnp.asarray(source), jnp.ones(512, dtype=bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    assert not bool(res.valid)
