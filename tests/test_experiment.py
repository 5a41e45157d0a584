"""Experiment utilities: run dirs + implicit map save/load round-trip
(the pin_map.pth analog, reference utils/tools.py:224-267 + vis_pin_map.py:54-70)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.utils import experiment as exp
from tests.test_neural_points import make_map, small_config


def test_setup_experiment(tmp_path):
    cfg = Config()
    cfg.name = "unit"
    cfg.output_root = str(tmp_path)
    run_path = exp.setup_experiment(cfg)
    assert os.path.isdir(os.path.join(run_path, "map"))
    assert os.path.isfile(os.path.join(run_path, "meta", "run.json"))
    assert cfg.run_path == run_path


def test_implicit_map_roundtrip(tmp_path, rng):
    mc = small_config()
    pts = rng.uniform(-4, 4, size=(500, 3)).astype(np.float32)
    state, lm, travel = make_map(mc, pts)
    count = int(state.count)
    feats = rng.normal(size=(count, mc.feature_dim)).astype(np.float32)
    state = state._replace(geo_features=state.geo_features.at[:count].set(feats))
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    geo = dec.init_decoder(jax.random.PRNGKey(0), 11, 64, 1, 1)

    path = str(tmp_path / "pin_map.npz")
    exp.save_implicit_map(path, state, geo)
    state2, geo2, sem2, color2 = exp.load_implicit_map(path, mc)

    assert int(state2.count) == count
    np.testing.assert_allclose(np.asarray(state2.positions[:count]),
                               np.asarray(state.positions[:count]))
    np.testing.assert_allclose(np.asarray(state2.geo_features[:count]), feats)
    assert sem2 is None and color2 is None
    np.testing.assert_allclose(np.asarray(geo2.hidden[0][0]), np.asarray(geo.hidden[0][0]))

    # rebuilt hash answers queries like the original
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    q = np.asarray(state.positions[:16])
    r1 = npts.knn_search(lm, mc, jnp.asarray(q), offsets)
    lm2 = npts.build_local_map(state2, mc, jnp.zeros(3), jnp.int32(0), travel)
    r2 = npts.knn_search(lm2, mc, jnp.asarray(q), offsets)
    np.testing.assert_array_equal(np.asarray(r1.nn_count), np.asarray(r2.nn_count))

    # SDF parity through the loaded decoder
    feat1, _, _, _ = npts.interpolate_features(lm, mc, jnp.asarray(q), r1.lidx)
    feat2, _, _, _ = npts.interpolate_features(lm2, mc, jnp.asarray(q), r2.lidx)
    s1 = dec.sdf(geo, feat1, 0.055)
    s2 = dec.sdf(geo2, feat2, 0.055)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_stage_timer():
    t = exp.StageTimer()
    t.start()
    t.lap("a")
    t.lap("b")
    t.commit()
    t.start()
    t.lap("a")
    t.commit()
    table = t.table()
    assert table.shape == (2, 2)
    assert (table >= 0).all()
