"""Frame pipeline + pose bookkeeping (host side).

Equivalent of the reference ``SLAMDataset`` (reference dataset/slam_dataset.py:29-628):
frame file discovery, per-frame read/preprocess (range crop, downsampling,
deskew, constant-velocity initial guess), odometry pose lists, travel distance,
stop / lose-track detection, and result writing.  Device-facing outputs are
padded to static buckets (XLA static shapes).
"""

from __future__ import annotations

import csv
import os
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset import io as pio
from pin_slam_tpu.ops.transforms import deskew_points, np_se3_inverse
from pin_slam_tpu.ops.voxel import pad_to

PC_EXTS = {".bin", ".ply", ".pcd", ".npy"}


class Frame:
    """One preprocessed frame, padded for the device."""

    def __init__(self, points, valid, colors, sem_labels, point_ts, raw_count):
        self.points = points          # (B,3) f32 sensor frame (padded)
        self.valid = valid            # (B,) bool
        self.colors = colors          # (B,C) or None
        self.sem_labels = sem_labels  # (B,) or None
        self.point_ts = point_ts      # (B,) f32 normalized or None
        self.raw_count = raw_count


class SLAMDataset:
    def __init__(self, config: Config):
        self.config = config
        self.silence = config.silence

        self.pc_filenames: List[str] = []
        if config.pc_path and os.path.isdir(config.pc_path):
            self.pc_filenames = [
                os.path.join(config.pc_path, f)
                for f in pio.natural_sort(os.listdir(config.pc_path))
                if os.path.splitext(f)[1].lower() in PC_EXTS
            ]
        self.total_pc_count = len(self.pc_filenames)

        # GT poses (optional)
        self.gt_poses: Optional[np.ndarray] = None
        self.gt_pose_provided = False
        if config.pose_path and os.path.exists(config.pose_path):
            if config.pose_path.endswith(".txt"):
                try:
                    poses = pio.read_kitti_poses(config.pose_path)
                except ValueError:
                    poses, _ = pio.read_tum_poses(config.pose_path)
            else:
                poses, _ = pio.read_tum_poses(config.pose_path)
            calib = None
            if config.calib_path and os.path.exists(config.calib_path):
                calib = pio.read_kitti_calib(config.calib_path).get("Tr")
            if calib is not None:
                poses = pio.apply_kitti_calib(poses, calib)
            if config.first_frame_ref:
                poses = np.einsum("ij,njk->nik", np_se3_inverse(poses[0]), poses)
            self.gt_poses = poses
            self.gt_pose_provided = True

        # odometry bookkeeping (ref slam_dataset.py:80-117)
        self.odom_poses: List[np.ndarray] = []   # f64 4x4, world<-sensor
        self.pgo_poses: List[np.ndarray] = []
        self.travel_dist: List[float] = [0.0]
        self.last_pose = np.eye(4)
        self.last_odom_tran = np.eye(4)          # constant-velocity model
        self.stop_status = False
        self.lose_track = False
        self.consecutive_lose_track_frame = 0
        self.stop_count = 0
        self.time_table: List[List[float]] = []
        self.processed_frame = 0

        self.cur_sem_labels = None
        self.cur_point_ts = None

    # ------------------------------------------------------------------
    def __len__(self):
        return self.total_pc_count

    def read_frame(self, frame_id: int):
        """Disk -> numpy (ref slam_dataset.py:199-231).

        Semantic labels come back as LEARNING-MAPPED classes in [0, 20):
        raw SemanticKITTI ids are reduced through the learning map and
        outlier / moving-class points are dropped from the frame
        (ref dataset/slam_dataset.py:296-299 + :856-875 ``filter_sem_kitti``,
        gated by ``filter_moving_object``)."""
        path = self.pc_filenames[frame_id]
        points, colors, ts = pio.read_point_cloud(path)
        sem = None
        if self.config.semantic_on and self.config.label_path:
            lab_path = os.path.join(
                self.config.label_path,
                os.path.splitext(os.path.basename(path))[0] + ".label")
            if os.path.exists(lab_path):
                raw = pio.read_semantic_labels(lab_path)
                from pin_slam_tpu.utils.semantic_kitti import apply_learning_map

                sem = apply_learning_map(raw)
                # outlier filter (raw ids 0 = unlabeled, 1 = outlier) + the
                # moving-object filter (raw ids >= 100 are moving classes)
                inlier = raw > 1
                if self.config.filter_moving_object:
                    inlier &= raw < 100
                points, colors, sem, ts = _mask_all(points, colors, sem, ts,
                                                    inlier)
        if ts is None and self.config.deskew:
            ts = recover_point_ts(points, self.config.lidar_type_guess)
        return points, colors, sem, ts

    def preprocess_frame(self, frame_id: int) -> Frame:
        """Crop + downsample + (optional) deskew, padded to the frame bucket
        (ref slam_dataset.py:260-374)."""
        cfg = self.config
        points, colors, sem, ts = self.read_frame(frame_id)

        if cfg.kitti_correction_on and cfg.correction_deg != 0.0:
            points = intrinsic_correct(points, cfg.correction_deg)

        # adaptive crop range (ref slam_dataset.py:264-274, used for NCD)
        crop_max_range = cfg.max_range
        if cfg.adaptive_range_on and points.shape[0] > 0:
            pc_max = points.max(axis=0)
            pc_min = points.min(axis=0)
            min_x_range = min(abs(pc_max[0]), abs(pc_min[0]))
            min_y_range = min(abs(pc_max[1]), abs(pc_min[1]))
            crop_max_range = min(cfg.max_range, 2.0 * max(min_x_range, min_y_range))

        d = np.linalg.norm(points, axis=1)
        keep = (d > cfg.min_range) & (d < crop_max_range) \
            & (points[:, 2] > cfg.min_z) & (points[:, 2] < cfg.max_z)
        points = points[keep]
        colors = colors[keep] if colors is not None else None
        sem = sem[keep] if sem is not None else None
        ts = ts[keep] if ts is not None else None

        rng = np.random.default_rng(cfg.seed + frame_id)
        if cfg.rand_downsample:
            if cfg.rand_down_r < 1.0:
                idx = rng.random(points.shape[0]) < cfg.rand_down_r
                points, colors, sem, ts = _mask_all(points, colors, sem, ts, idx)
        # cap at the bucket with random selection to avoid head-of-scan bias
        bucket = cfg.frame_bucket
        if points.shape[0] > bucket:
            idx = rng.choice(points.shape[0], bucket, replace=False)
            points, colors, sem, ts = _take_all(points, colors, sem, ts, idx)

        # deskew with the constant-velocity relative motion (ref :344-351)
        if cfg.deskew and ts is not None and self.processed_frame > 0:
            pts_j = deskew_points(jnp.asarray(points), jnp.asarray(ts, dtype=np.float32),
                                  jnp.asarray(self.last_odom_tran, dtype=np.float32))
            points = np.asarray(pts_j)

        pad_pts, valid = pad_to(points.astype(np.float32), bucket)
        pad_col = pad_to(colors.astype(np.float32), bucket)[0] if colors is not None else None
        pad_sem = pad_to(sem.astype(np.int32), bucket)[0] if sem is not None else None
        pad_ts = pad_to(ts.astype(np.float32), bucket)[0] if ts is not None else None
        return Frame(pad_pts, valid, pad_col, pad_sem, pad_ts, points.shape[0])

    # ------------------------------------------------------------------
    def initial_guess(self) -> np.ndarray:
        """Constant-velocity initial guess (ref slam_dataset.py:325-336)."""
        if not self.config.uniform_motion_on or len(self.odom_poses) == 0:
            return self.last_pose.copy()
        return self.last_pose @ self.last_odom_tran

    def update_odom_pose(self, cur_pose: np.ndarray, valid: bool = True) -> None:
        """Pose bookkeeping: travel distance, stop + lose-track detection
        (ref slam_dataset.py:376-430)."""
        cfg = self.config
        # defensive SO(3) projection: device f32 rotations carry ~1e-7..1e-3
        # scale error which compounds through the frame-to-frame pose chain
        U, _, Vt = np.linalg.svd(cur_pose[:3, :3])
        cur_pose = cur_pose.copy()
        cur_pose[:3, :3] = U @ np.diag([1.0, 1.0, np.linalg.det(U @ Vt)]) @ Vt
        if not valid:
            self.lose_track = True
            self.consecutive_lose_track_frame += 1
            cur_pose = self.initial_guess()
        else:
            self.lose_track = False
            self.consecutive_lose_track_frame = 0

        cur_odom_tran = np_se3_inverse(self.last_pose) @ cur_pose
        tran_m = float(np.linalg.norm(cur_odom_tran[:3, 3]))

        # one-frame jump check (ref :404-408)
        if tran_m > 40.0 * cfg.surface_sample_range_m and len(self.odom_poses) > 0:
            self.lose_track = True
            self.consecutive_lose_track_frame += 1
            cur_pose = self.initial_guess()
            cur_odom_tran = np_se3_inverse(self.last_pose) @ cur_pose
            tran_m = float(np.linalg.norm(cur_odom_tran[:3, 3]))

        self.travel_dist.append(self.travel_dist[-1] + tran_m)

        # stop detection (ref :385-395)
        if tran_m < 0.01 * cfg.voxel_size_m:
            self.stop_count += 1
        else:
            self.stop_count = 0
        self.stop_status = self.stop_count > cfg.stop_frame_thre

        if not self.lose_track:
            self.last_odom_tran = cur_odom_tran
        self.odom_poses.append(cur_pose.copy())
        self.pgo_poses.append(cur_pose.copy())
        self.last_pose = cur_pose.copy()
        self.processed_frame += 1

        if self.consecutive_lose_track_frame > 20:
            raise RuntimeError("tracking lost for 20+ consecutive frames — aborting "
                               "(ref slam_dataset.py:424-430)")

    def update_poses_after_pgo(self, pgo_poses: np.ndarray) -> None:
        """(ref slam_dataset.py:432-435)."""
        self.pgo_poses = [pgo_poses[i].copy() for i in range(len(pgo_poses))]
        self.last_pose = self.pgo_poses[-1].copy()

    def travel_dist_array(self, capacity: int = 1 << 16) -> np.ndarray:
        out = np.zeros((capacity,), dtype=np.float32)
        n = min(len(self.travel_dist), capacity)
        out[:n] = self.travel_dist[:n]
        out[n:] = self.travel_dist[-1] if self.travel_dist else 0.0
        return out

    # ------------------------------------------------------------------
    def write_results(self, run_path: str) -> dict:
        """Save poses (KITTI + TUM), timing table, and — when GT is available —
        ATE/drift metrics (ref slam_dataset.py:484-558)."""
        os.makedirs(run_path, exist_ok=True)
        poses = np.asarray(self.pgo_poses if self.config.pgo_on else self.odom_poses)
        pio.write_kitti_poses(os.path.join(run_path, "odom_poses_kitti.txt"), poses)
        pio.write_tum_poses(os.path.join(run_path, "odom_poses_tum.txt"), poses)
        if self.time_table:
            np.save(os.path.join(run_path, "time_table.npy"), np.asarray(self.time_table))

        metrics = {}
        if self.gt_pose_provided and len(poses) > 1:
            from pin_slam_tpu.eval.traj import (absolute_error, plot_trajectories,
                                               relative_error)

            gt = self.gt_poses[: len(poses)]
            ate_rmse, ate_rot = absolute_error(gt, poses, align=self.config.eval_traj_align)
            drift, drift_rot = relative_error(gt, poses)
            metrics = {"ate_rmse_m": ate_rmse, "ate_rot_deg": ate_rot,
                       "drift_percent": drift, "drift_deg_per_m": drift_rot}
            with open(os.path.join(run_path, "pose_eval.csv"), "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(list(metrics.keys()))
                w.writerow([f"{v:.6f}" for v in metrics.values()])
            # 2-D + 3-D trajectory plots (ref slam_dataset.py:554-558)
            plot_trajectories(run_path, poses, gt)
        elif len(poses) > 1:
            from pin_slam_tpu.eval.traj import plot_trajectories

            plot_trajectories(run_path, poses)
        return metrics


    def write_merged_point_cloud(self, run_path: str, vox_down_m: float = 0.1,
                                 frame_stride: int = 2,
                                 max_points_per_frame: int = 30000) -> str:
        """Replay the sequence through the final poses and write one merged,
        voxel-downsampled point cloud (ref dataset/slam_dataset.py:560-628)."""
        poses = self.pgo_poses if self.config.pgo_on else self.odom_poses
        rng = np.random.default_rng(self.config.seed)
        merged = {}
        cfg = self.config
        for i in range(0, min(len(poses), self.total_pc_count), max(frame_stride, 1)):
            points, colors, _, _ = self.read_frame(i)
            d = np.linalg.norm(points, axis=1)
            keep = (d > cfg.min_range) & (d < cfg.max_range)
            points = points[keep]
            colors = colors[keep] if colors is not None else None
            if points.shape[0] > max_points_per_frame:
                sel = rng.choice(points.shape[0], max_points_per_frame, replace=False)
                points = points[sel]
                colors = colors[sel] if colors is not None else None
            T = poses[i]
            world = points @ T[:3, :3].T + T[:3, 3]
            keys = np.floor(world / vox_down_m).astype(np.int64)
            for k, p, c in zip(map(tuple, keys), world,
                               colors if colors is not None else [None] * len(world)):
                if k not in merged:
                    merged[k] = (p, c)
        pts = np.asarray([v[0] for v in merged.values()], dtype=np.float32)
        cols = None
        if merged and next(iter(merged.values()))[1] is not None:
            cols = np.asarray([v[1] for v in merged.values()], dtype=np.float32)
            if cols.ndim == 1:
                cols = cols[:, None]
            if cols.shape[1] == 1:                 # intensity -> gray RGB
                cols = np.repeat(cols, 3, axis=1)
            if cols.max(initial=0) > 1.0:
                cols = cols / 255.0
        out = os.path.join(run_path, "map", "merged_point_cloud.ply")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        pio.write_ply(out, pts, colors=cols)
        return out


def _mask_all(points, colors, sem, ts, mask):
    return (points[mask],
            colors[mask] if colors is not None else None,
            sem[mask] if sem is not None else None,
            ts[mask] if ts is not None else None)


def _take_all(points, colors, sem, ts, idx):
    return (points[idx],
            colors[idx] if colors is not None else None,
            sem[idx] if sem is not None else None,
            ts[idx] if ts is not None else None)


def intrinsic_correct(points: np.ndarray, correct_deg: float = 0.0) -> np.ndarray:
    """KITTI vertical-angle intrinsic correction (ref slam_dataset.py:837-854,
    per CT-ICP / IMLS-SLAM): lift each point's vertical angle by correct_deg."""
    if correct_deg == 0.0:
        return points
    out = points.copy()
    dist = np.linalg.norm(points[:, :3], axis=1)
    v_ang = np.arcsin(np.clip(points[:, 2] / np.maximum(dist, 1e-12), -1.0, 1.0))
    v_ang_c = v_ang + np.radians(correct_deg)
    hor_scale = np.cos(v_ang_c) / np.maximum(np.cos(v_ang), 1e-12)
    out[:, 0] *= hor_scale
    out[:, 1] *= hor_scale
    out[:, 2] = dist * np.sin(v_ang_c)
    return out


def recover_point_ts(points: np.ndarray, lidar_type: str = "velodyne") -> np.ndarray:
    """Per-point timestamp recovery from scan yaw for spinning lidars
    (ref dataset/slam_dataset.py:234-257)."""
    yaw = -np.arctan2(points[:, 1], points[:, 0])  # clockwise scan
    ts = (yaw / np.pi + 1.0) / 2.0                 # [0,1]
    return ts.astype(np.float32)
