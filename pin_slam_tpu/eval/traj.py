"""Trajectory evaluation: ATE (Horn alignment) + KITTI relative drift.

Equivalent of the reference metrics (reference eval/eval_traj_utils.py:13-231)
without the evo dependency: pure numpy.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def align_umeyama(gt_xyz: np.ndarray, est_xyz: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form SE(3) alignment (Horn/Umeyama, no scale)
    (ref eval/eval_traj_utils.py:66-101).  Returns (R, t) mapping est -> gt."""
    mu_g = gt_xyz.mean(0)
    mu_e = est_xyz.mean(0)
    X = est_xyz - mu_e
    Y = gt_xyz - mu_g
    C = Y.T @ X / gt_xyz.shape[0]
    U, _, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = mu_g - R @ mu_e
    return R, t


def absolute_error(gt_poses: np.ndarray, est_poses: np.ndarray,
                   align: bool = True) -> Tuple[float, float]:
    """ATE RMSE (m) and mean rotation error (deg)
    (ref eval/eval_traj_utils.py:13-56)."""
    n = min(len(gt_poses), len(est_poses))
    gt, est = np.asarray(gt_poses)[:n], np.asarray(est_poses)[:n]
    gt_xyz, est_xyz = gt[:, :3, 3], est[:, :3, 3]
    if align and n >= 3:
        R, t = align_umeyama(gt_xyz, est_xyz)
    else:
        R, t = np.eye(3), np.zeros(3)
    est_aligned = est_xyz @ R.T + t
    ate_rmse = float(np.sqrt(np.mean(np.sum((est_aligned - gt_xyz) ** 2, axis=1))))

    rot_errs = []
    for i in range(n):
        dR = (R @ est[i, :3, :3]).T @ gt[i, :3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1.0, 1.0)))
        rot_errs.append(ang)
    return ate_rmse, float(np.mean(rot_errs))


def _trajectory_distances(poses: np.ndarray) -> np.ndarray:
    d = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    return np.concatenate([[0.0], np.cumsum(d)])


def relative_error(gt_poses: np.ndarray, est_poses: np.ndarray,
                   lengths: List[float] = (100, 200, 300, 400, 500, 600, 700, 800),
                   step: int = 10) -> Tuple[float, float]:
    """KITTI average relative drift over 100..800 m segments: (%, deg/m)
    (ref eval/eval_traj_utils.py:103-166)."""
    n = min(len(gt_poses), len(est_poses))
    gt, est = np.asarray(gt_poses)[:n], np.asarray(est_poses)[:n]
    dist = _trajectory_distances(gt)

    errs_t, errs_r = [], []
    for first in range(0, n, step):
        for length in lengths:
            target = dist[first] + length
            last = int(np.searchsorted(dist, target))
            if last >= n:
                continue
            dT_gt = np.linalg.inv(gt[first]) @ gt[last]
            dT_est = np.linalg.inv(est[first]) @ est[last]
            E = np.linalg.inv(dT_est) @ dT_gt
            t_err = np.linalg.norm(E[:3, 3]) / length
            r_err = np.degrees(np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1))) / length
            errs_t.append(t_err)
            errs_r.append(r_err)
    if not errs_t:
        return 0.0, 0.0
    return float(np.mean(errs_t) * 100.0), float(np.mean(errs_r))
