#!/usr/bin/env python3
"""Online/streaming SLAM node — the ``pin_slam_ros.py`` equivalent
(reference pin_slam_ros.py:44-491).

The compute core is transport-agnostic (``StreamingSlam`` below): push point
cloud frames from any source, get poses + map artifacts back.  When rospy is
importable the same core is exposed as a ROS 1 node subscribing to
``PointCloud2`` and publishing TF/odometry/path/neural-point topics; in this
TPU build environment ROS is not installed, so the node gates at startup with
a clear message while the streaming core stays fully usable (and tested).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


class StreamingSlam:
    """Push-based SLAM session (the ROS-independent core of reference C22).

    Usage:
        s = StreamingSlam(cfg)
        for cloud in source:                    # [N,3] or [N,4(+)] numpy
            pose = s.push_frame(cloud)          # 4x4 world<-sensor
        s.finish("./out_dir")
    """

    def __init__(self, config):
        from pin_slam_tpu.dataset.slam_dataset import SLAMDataset
        from pin_slam_tpu.slam.pipeline import SlamSystem

        config.pc_path = ""  # no disk-backed frames
        self.dataset = SLAMDataset(config)
        self.system = SlamSystem(config, dataset=self.dataset)
        self.config = config
        self.last_msg_time = time.time()

    def push_frame(self, points: np.ndarray, point_ts=None) -> np.ndarray:
        """Process one sensor frame; returns the current pose estimate."""
        from pin_slam_tpu.dataset.slam_dataset import Frame
        from pin_slam_tpu.ops.voxel import pad_to

        cfg = self.config
        self.last_msg_time = time.time()
        xyz = np.asarray(points, dtype=np.float32)[:, :3]
        colors = (np.asarray(points[:, 3:3 + max(cfg.color_channel, 1)], dtype=np.float32)
                  if cfg.color_on and points.shape[1] > 3 else None)

        d = np.linalg.norm(xyz, axis=1)
        keep = (d > cfg.min_range) & (d < cfg.max_range) \
            & (xyz[:, 2] > cfg.min_z) & (xyz[:, 2] < cfg.max_z)
        xyz = xyz[keep]
        colors = colors[keep] if colors is not None else None
        if xyz.shape[0] > cfg.frame_bucket:
            idx = np.random.default_rng(self.system.frame_id).choice(
                xyz.shape[0], cfg.frame_bucket, replace=False)
            xyz = xyz[idx]
            colors = colors[idx] if colors is not None else None

        pad_pts, valid = pad_to(xyz, cfg.frame_bucket)
        pad_col = pad_to(colors, cfg.frame_bucket)[0] if colors is not None else None
        frame = Frame(pad_pts, valid, pad_col, None, None, xyz.shape[0])
        self.system.process_frame(frame)
        return self.system.cur_pose.copy()

    def neural_point_cloud(self, down_rate: int = 11) -> np.ndarray:
        """Prime-stride-decimated neural point map for publishing
        (ref pin_slam_ros.py:278-391)."""
        count = int(self.system.state.count)
        return np.asarray(self.system.state.positions[:count:down_rate])

    def finish(self, out_dir: str) -> dict:
        """Save results + maps (the save_results/save_mesh services,
        ref pin_slam_ros.py:119-148).  Always persists the implicit map."""
        self.config.save_map = True
        metrics = self.dataset.write_results(out_dir)
        self.system.save_artifacts(out_dir)
        return metrics


def main() -> int:
    try:
        import rospy  # noqa: F401
    except ImportError:
        print("pin_slam_ros: rospy is not available in this environment.\n"
              "The streaming core is importable as pin_slam_ros.StreamingSlam —\n"
              "push numpy frames directly, or run the batch driver: pin_slam.py",
              file=sys.stderr)
        return 3

    # ---- ROS 1 node path (runs only where ROS is installed) ----
    import rospy
    from sensor_msgs.msg import PointCloud2
    import sensor_msgs.point_cloud2 as pc2

    from pin_slam_tpu.config import Config

    rospy.init_node("pin_slam_tpu")
    cfg = Config()
    cfg_path = rospy.get_param("~config", "")
    if cfg_path:
        cfg.load(cfg_path)
    slam = StreamingSlam(cfg)

    def callback(msg):
        pts = np.asarray(list(pc2.read_points(msg, field_names=("x", "y", "z"),
                                              skip_nans=True)), dtype=np.float32)
        slam.push_frame(pts)

    rospy.Subscriber(rospy.get_param("~cloud_topic", "/points"), PointCloud2,
                     callback, queue_size=4)
    timeout_s = cfg.timeout_duration_s if hasattr(cfg, "timeout_duration_s") else 30
    rate = rospy.Rate(2)
    while not rospy.is_shutdown():
        if time.time() - slam.last_msg_time > timeout_s and slam.system.frame_id > 0:
            break  # silence watchdog (ref pin_slam_ros.py:243-255)
        rate.sleep()
    slam.finish(cfg.output_root or "./experiments/ros_run")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
