"""Pose-graph optimization tests: closing a drifting loop must pull the
trajectory back onto ground truth (reference utils/pgo.py behavior)."""

import numpy as np
from scipy.spatial.transform import Rotation

from pin_slam_tpu.slam import pgo


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        xi = rng.normal(size=6) * 0.5
        np.testing.assert_allclose(pgo.se3_log(pgo.se3_exp(xi)), xi, atol=1e-8)


def test_adjoint_property():
    rng = np.random.default_rng(1)
    T = pgo.se3_exp(rng.normal(size=6) * 0.3)
    xi = rng.normal(size=6) * 0.1
    # T exp(xi) T^-1 == exp(Ad(T) xi)
    left = T @ pgo.se3_exp(xi) @ np.linalg.inv(T)
    right = pgo.se3_exp(pgo.adjoint(T) @ xi)
    np.testing.assert_allclose(left, right, atol=1e-6)


def make_square_trajectory(n_per_side=10, side=10.0):
    """Ground truth square loop in the plane."""
    poses = []
    T = np.eye(4)
    step = side / n_per_side
    for side_i in range(4):
        for _ in range(n_per_side):
            poses.append(T.copy())
            T = T @ pgo.se3_exp(np.array([0, 0, 0, step, 0, 0]))
        T = T @ pgo.se3_exp(np.array([0, 0, np.pi / 2, 0, 0, 0]))
    poses.append(T.copy())
    return np.stack(poses)


def test_loop_closure_corrects_drift():
    gt = make_square_trajectory()
    n = len(gt)
    rng = np.random.default_rng(3)

    # simulate odometry with a small systematic yaw drift
    rel_meas = []
    for i in range(1, n):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise = pgo.se3_exp(np.array([0, 0, 0.004, 0.01, 0, 0]))
        rel_meas.append(rel @ noise)

    pgm = pgo.PoseGraphManager()
    est = [np.eye(4)]
    pgm.add_frame_node(0, est[0])
    for i in range(1, n):
        est.append(est[-1] @ rel_meas[i - 1])
        pgm.add_frame_node(i, est[-1])
        pgm.add_odometry_factor(i, i - 1, rel_meas[i - 1])

    drift_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_before > 0.3  # noise accumulated

    # perfect loop measurement between last and first frame
    rel_loop = np.linalg.inv(gt[0]) @ gt[-1]
    pgm.add_loop_factor(n - 1, 0, rel_loop)
    opt = pgm.optimize_pose_graph()

    drift_after = np.linalg.norm(opt[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_after < 0.05, (drift_before, drift_after)
    # intermediate poses also improve
    mid_err = np.linalg.norm(opt[n // 2][:3, 3] - gt[n // 2][:3, 3])
    assert mid_err < drift_before

    # first node stayed fixed
    np.testing.assert_allclose(opt[0], np.eye(4), atol=1e-9)


def test_pose_diff_and_drift_estimate():
    pgm = pgo.PoseGraphManager()
    old = np.stack([np.eye(4)] * 3)
    for i in range(3):
        pgm.add_frame_node(i, np.eye(4))
    diff = pgm.get_pose_diff(old)
    np.testing.assert_allclose(diff, np.stack([np.eye(4)] * 3), atol=1e-12)

    travel = [0.0, 10.0, 30.0]
    d = pgm.estimate_drift(travel, 2)
    assert abs(d - 0.3) < 1e-9


def test_write_g2o(tmp_path):
    pgm = pgo.PoseGraphManager()
    pgm.add_frame_node(0, np.eye(4))
    T1 = pgo.se3_exp(np.array([0, 0, 0.1, 1.0, 0, 0]))
    pgm.add_frame_node(1, T1)
    pgm.add_odometry_factor(1, 0, T1)
    path = str(tmp_path / "graph.g2o")
    pgm.write_g2o(path)
    lines = open(path).read().strip().splitlines()
    assert sum(l.startswith("VERTEX_SE3:QUAT") for l in lines) == 2
    assert sum(l.startswith("EDGE_SE3:QUAT") for l in lines) == 1
