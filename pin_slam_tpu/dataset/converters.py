"""RGB-D dataset converters: Replica / TUM / NeuralRGBD -> per-frame
back-projected PLY + KITTI-format poses, so RGB-D sequences reuse the LiDAR
pipeline (reference dataset/converter/*_to_pin_format.py, SURVEY.md C17)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from pin_slam_tpu.dataset import io as pio


def backproject_depth(depth: np.ndarray, fx: float, fy: float, cx: float, cy: float,
                      color: Optional[np.ndarray] = None, depth_scale: float = 1.0,
                      max_depth: float = 10.0, stride: int = 1
                      ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Depth image [H,W] (+optional color [H,W,3]) -> camera-frame point cloud."""
    d = depth.astype(np.float64) / depth_scale
    H, W = d.shape
    vs, us = np.meshgrid(np.arange(0, H, stride), np.arange(0, W, stride), indexing="ij")
    z = d[vs, us]
    ok = (z > 0) & (z < max_depth)
    z = z[ok]
    u, v = us[ok], vs[ok]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = np.stack([x, y, z], axis=1).astype(np.float32)
    cols = None
    if color is not None:
        cols = color[vs, us][ok]
        if cols.dtype == np.uint8:
            cols = cols.astype(np.float32) / 255.0
    return pts, cols


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def convert_replica(seq_dir: str, out_dir: str, max_frames: Optional[int] = None,
                    depth_scale: float = 6553.5, stride: int = 2) -> int:
    """Replica (results/frameXXXXXX.jpg + depthXXXXXX.png + traj.txt)
    -> rgbd_ply/*.ply + poses.txt (ref dataset/converter/replica_to_pin_format.py)."""
    # Replica camera intrinsics (1200x680, as in the NICE-SLAM/Co-SLAM configs)
    fx = fy = 600.0
    cx, cy = 599.5, 339.5

    res_dir = os.path.join(seq_dir, "results")
    traj = np.loadtxt(os.path.join(seq_dir, "traj.txt")).reshape(-1, 4, 4)
    os.makedirs(os.path.join(out_dir, "rgbd_ply"), exist_ok=True)

    n = len(traj) if max_frames is None else min(len(traj), max_frames)
    poses = []
    for i in range(n):
        depth = _load_image(os.path.join(res_dir, f"depth{i:06d}.png"))
        rgb_path = os.path.join(res_dir, f"frame{i:06d}.jpg")
        color = _load_image(rgb_path) if os.path.exists(rgb_path) else None
        pts, cols = backproject_depth(depth, fx, fy, cx, cy, color,
                                      depth_scale=depth_scale, stride=stride)
        pio.write_ply(os.path.join(out_dir, "rgbd_ply", f"{i:06d}.ply"), pts, colors=cols)
        poses.append(traj[i])
    pio.write_kitti_poses(os.path.join(out_dir, "poses.txt"), np.stack(poses))
    return n


def convert_tum(seq_dir: str, out_dir: str, max_frames: Optional[int] = None,
                depth_scale: float = 5000.0, stride: int = 2,
                max_dt: float = 0.02) -> int:
    """TUM RGB-D (rgb.txt/depth.txt/groundtruth.txt) -> rgbd_ply + poses
    (ref dataset/converter/tum_to_pin_format.py): associate rgb/depth/gt by
    timestamp, back-project, write per-frame PLY."""
    fx, fy, cx, cy = 525.0, 525.0, 319.5, 239.5  # TUM default intrinsics

    def read_list(name):
        out = []
        with open(os.path.join(seq_dir, name)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                out.append((float(parts[0]), parts[1:]))
        return out

    rgb = read_list("rgb.txt")
    depth = read_list("depth.txt")
    gt_poses, gt_ts = pio.read_tum_poses(os.path.join(seq_dir, "groundtruth.txt"))

    os.makedirs(os.path.join(out_dir, "rgbd_ply"), exist_ok=True)
    d_ts = np.asarray([t for t, _ in depth])
    poses = []
    count = 0
    for t_rgb, rgb_file in rgb:
        j = int(np.argmin(np.abs(d_ts - t_rgb)))
        if abs(d_ts[j] - t_rgb) > max_dt:
            continue
        k = int(np.argmin(np.abs(gt_ts - t_rgb)))
        if abs(gt_ts[k] - t_rgb) > max_dt:
            continue
        dimg = _load_image(os.path.join(seq_dir, depth[j][1][0]))
        cimg = _load_image(os.path.join(seq_dir, rgb_file[0]))
        pts, cols = backproject_depth(dimg, fx, fy, cx, cy, cimg,
                                      depth_scale=depth_scale, stride=stride)
        pio.write_ply(os.path.join(out_dir, "rgbd_ply", f"{count:06d}.ply"), pts, colors=cols)
        poses.append(gt_poses[k])
        count += 1
        if max_frames is not None and count >= max_frames:
            break
    if poses:
        pio.write_kitti_poses(os.path.join(out_dir, "poses.txt"), np.stack(poses))
    return count


def convert_neuralrgbd(seq_dir: str, out_dir: str, max_frames: Optional[int] = None,
                       depth_scale: float = 1000.0, stride: int = 2) -> int:
    """NeuralRGBD format (images/ depth/ poses.txt + focal.txt)
    -> rgbd_ply + poses (ref dataset/converter/neuralrgbd_to_pin_format.py)."""
    focal = float(open(os.path.join(seq_dir, "focal.txt")).read().split()[0])
    depth_dir = os.path.join(seq_dir, "depth_filtered")
    if not os.path.isdir(depth_dir):
        depth_dir = os.path.join(seq_dir, "depth")
    img_dir = os.path.join(seq_dir, "images")
    depth_files = pio.natural_sort([f for f in os.listdir(depth_dir) if f.endswith(".png")])
    img_files = pio.natural_sort([f for f in os.listdir(img_dir)
                                  if f.endswith((".png", ".jpg"))]) if os.path.isdir(img_dir) else []
    traj = np.loadtxt(os.path.join(seq_dir, "poses.txt")).reshape(-1, 4, 4)
    # NeuralRGBD poses use an OpenGL-style camera: flip y/z to camera frame
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    os.makedirs(os.path.join(out_dir, "rgbd_ply"), exist_ok=True)

    n = min(len(depth_files), len(traj))
    if max_frames is not None:
        n = min(n, max_frames)
    poses = []
    for i in range(n):
        dimg = _load_image(os.path.join(depth_dir, depth_files[i]))
        H, W = dimg.shape[:2]
        cimg = (_load_image(os.path.join(img_dir, img_files[i]))
                if i < len(img_files) else None)
        pts, cols = backproject_depth(dimg, focal, focal, W / 2 - 0.5, H / 2 - 0.5,
                                      cimg, depth_scale=depth_scale, stride=stride)
        pio.write_ply(os.path.join(out_dir, "rgbd_ply", f"{i:06d}.ply"), pts, colors=cols)
        poses.append(traj[i] @ flip)
    pio.write_kitti_poses(os.path.join(out_dir, "poses.txt"), np.stack(poses))
    return n
