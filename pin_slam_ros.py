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
        self.last_mapping_cloud = xyz        # cropped sensor-frame mapping cloud
        self.system.process_frame(frame)
        return self.system.cur_pose.copy()

    def neural_point_cloud(self, down_rate: int = None) -> np.ndarray:
        """Prime-stride-decimated neural point map for publishing; the stride
        adapts to the map size through the reference's prime-number ladder
        (ref pin_slam_ros.py:348-353, utils/config.py:322)."""
        count = int(self.system.state.count)
        if down_rate is None:
            ladder = self.config.publish_np_map_down_rate_list
            level = min(count // 500000, len(ladder) - 1)
            down_rate = ladder[level]
        return np.asarray(self.system.state.positions[:count:down_rate])

    def finish(self, out_dir: str) -> dict:
        """Save results + maps (the save_results/save_mesh services,
        ref pin_slam_ros.py:119-148).  Always persists the implicit map."""
        self.config.save_map = True
        metrics = self.dataset.write_results(out_dir)
        self.system.save_artifacts(out_dir)
        return metrics


def _pose_to_quat_t(pose: np.ndarray):
    """4x4 -> (qx,qy,qz,qw), t — host math, no tf dependency."""
    from pin_slam_tpu.ops.transforms import rotmat_to_quat

    q = np.asarray(rotmat_to_quat(pose[:3, :3].astype(np.float32)))  # (w,x,y,z)
    return (float(q[1]), float(q[2]), float(q[3]), float(q[0])), pose[:3, 3]


class PinSlamRosNode:
    """ROS 1 node around ``StreamingSlam`` with the reference's publisher and
    service surface (ref pin_slam_ros.py:44-148, 278-391): TF + odometry +
    path + per-frame mapping/registration clouds + adaptively decimated
    neural-point map, plus ``save_results`` / ``save_mesh`` services and the
    silence-timeout watchdog.

    All ROS modules are imported lazily in ``__init__`` so the class is
    constructible under a faked rospy in tests (and cleanly absent without
    ROS installed).
    """

    def __init__(self, cfg, cloud_topic: str = None, init_node: bool = True):
        import rospy
        import nav_msgs.msg as nav_msgs
        import std_msgs.msg as std_msgs
        import tf2_ros
        from geometry_msgs.msg import PoseStamped, TransformStamped
        from nav_msgs.msg import Odometry
        from sensor_msgs.msg import PointCloud2, PointField
        from std_srvs.srv import Empty, EmptyResponse

        self._rospy = rospy
        self._msgs = dict(
            Path=nav_msgs.Path, Odometry=Odometry, PoseStamped=PoseStamped,
            TransformStamped=TransformStamped, PointCloud2=PointCloud2,
            PointField=PointField, Header=std_msgs.Header,
            EmptyResponse=EmptyResponse)
        import sensor_msgs.point_cloud2 as pc2

        self._pc2 = pc2

        if init_node:
            rospy.init_node("pin_slam_tpu")
        self.global_frame_name = rospy.get_param("~global_frame_name", "map")
        self.sensor_frame_name = rospy.get_param("~sensor_frame_name",
                                                 "range_sensor")
        self.cfg = cfg
        self.slam = StreamingSlam(cfg)
        self.out_dir = cfg.output_root or "./experiments/ros_run"

        q = 10
        self.traj_pub = rospy.Publisher("~pin_path", nav_msgs.Path, queue_size=q)
        self.path_msg = nav_msgs.Path()
        self.path_msg.header.frame_id = self.global_frame_name
        self.odom_pub = rospy.Publisher("~odometry", Odometry, queue_size=q)
        self.frame_input_pub = rospy.Publisher("~frame/input", PointCloud2,
                                               queue_size=q)
        self.frame_map_pub = rospy.Publisher("~frame/mapping", PointCloud2,
                                             queue_size=q)
        self.frame_reg_pub = rospy.Publisher("~frame/registration", PointCloud2,
                                             queue_size=q)
        self.map_pub = rospy.Publisher("~map/neural_points", PointCloud2,
                                       queue_size=q)
        self.tf_broadcaster = tf2_ros.TransformBroadcaster()

        rospy.Service("~save_results", Empty, self._save_results_cb)
        rospy.Service("~save_mesh", Empty, self._save_mesh_cb)

        topic = cloud_topic or rospy.get_param("~cloud_topic", "/points")
        rospy.Subscriber(topic, PointCloud2, self.frame_callback, queue_size=4)
        self._last_pgo_count = 0

    # ---- services (ref pin_slam_ros.py:119-148) ----
    def _save_results_cb(self, _req):
        self._rospy.loginfo("pin_slam_tpu: save_results service")
        self.slam.dataset.write_results(self.out_dir)
        return self._msgs["EmptyResponse"]()

    def _save_mesh_cb(self, _req):
        self._rospy.loginfo("pin_slam_tpu: save_mesh service")
        save_mesh_prev = self.cfg.save_mesh
        self.cfg.save_mesh = True
        self.slam.system.save_artifacts(self.out_dir)
        self.cfg.save_mesh = save_mesh_prev
        return self._msgs["EmptyResponse"]()

    # ---- per-frame path ----
    def frame_callback(self, msg):
        pts = np.asarray(list(self._pc2.read_points(
            msg, field_names=("x", "y", "z"), skip_nans=True)), dtype=np.float32)
        if pts.size == 0:
            return
        self.slam.push_frame(pts)
        self.publish_msg(msg)

    def _xyz_cloud(self, frame_id: str, pts: np.ndarray):
        PointField, Header = self._msgs["PointField"], self._msgs["Header"]
        fields = [PointField("x", 0, PointField.FLOAT32, 1),
                  PointField("y", 4, PointField.FLOAT32, 1),
                  PointField("z", 8, PointField.FLOAT32, 1)]
        header = Header()
        header.stamp = self._rospy.Time.now()
        header.frame_id = frame_id
        return self._pc2.create_cloud(header, fields, pts.astype(np.float32))

    def publish_msg(self, input_pc_msg=None):
        """TF + odometry + path + map/frame clouds (ref pin_slam_ros.py:278-391)."""
        rospy = self._rospy
        cfg = self.cfg
        slam = self.slam
        (qx, qy, qz, qw), t = _pose_to_quat_t(slam.system.cur_pose)

        pose_msg = self._msgs["PoseStamped"]()
        pose_msg.header.stamp = rospy.Time.now()
        pose_msg.header.frame_id = self.global_frame_name
        pose_msg.pose.orientation.x = qx
        pose_msg.pose.orientation.y = qy
        pose_msg.pose.orientation.z = qz
        pose_msg.pose.orientation.w = qw
        pose_msg.pose.position.x, pose_msg.pose.position.y, \
            pose_msg.pose.position.z = map(float, t)

        odom_msg = self._msgs["Odometry"]()
        odom_msg.header = pose_msg.header
        odom_msg.child_frame_id = self.sensor_frame_name
        odom_msg.pose.pose = pose_msg.pose
        self.odom_pub.publish(odom_msg)

        tf_msg = self._msgs["TransformStamped"]()
        tf_msg.header.stamp = rospy.Time.now()
        tf_msg.header.frame_id = self.global_frame_name
        tf_msg.child_frame_id = self.sensor_frame_name
        tf_msg.transform.rotation.x = qx
        tf_msg.transform.rotation.y = qy
        tf_msg.transform.rotation.z = qz
        tf_msg.transform.rotation.w = qw
        tf_msg.transform.translation.x, tf_msg.transform.translation.y, \
            tf_msg.transform.translation.z = map(float, t)
        self.tf_broadcaster.sendTransform(tf_msg)

        # path: append, or rebuild entirely after a PGO correction
        # (ref pin_slam_ros.py:315-336 loop_corrected branch)
        pgm = slam.system.pgm
        pgo_count = pgm.pgo_count if pgm is not None else 0
        if pgo_count > self._last_pgo_count:
            self._last_pgo_count = pgo_count
            self.path_msg.poses = []
            for pose in slam.dataset.pgo_poses:
                (qx2, qy2, qz2, qw2), t2 = _pose_to_quat_t(pose)
                pm = self._msgs["PoseStamped"]()
                pm.header.stamp = rospy.Time.now()
                pm.header.frame_id = self.global_frame_name
                pm.pose.orientation.x = qx2
                pm.pose.orientation.y = qy2
                pm.pose.orientation.z = qz2
                pm.pose.orientation.w = qw2
                pm.pose.position.x, pm.pose.position.y, pm.pose.position.z = \
                    map(float, t2)
                self.path_msg.poses.append(pm)
        else:
            self.path_msg.poses.append(pose_msg)
        self.path_msg.header.stamp = rospy.Time.now()
        self.traj_pub.publish(self.path_msg)

        # decimated neural-point map in the global frame
        if cfg.publish_np_map:
            self.map_pub.publish(self._xyz_cloud(self.global_frame_name,
                                                 slam.neural_point_cloud()))
        # current mapping cloud in the sensor frame (ref pin_slam_ros.py
        # publishes the downsampled mapping frame on ~frame/mapping)
        mc = getattr(slam, "last_mapping_cloud", None)
        if mc is not None:
            self.frame_map_pub.publish(self._xyz_cloud(self.sensor_frame_name,
                                                       mc))
        # current registration source cloud in the sensor frame
        if slam.system.last_source is not None:
            src, src_valid = slam.system.last_source[0], slam.system.last_source[1]
            src_np = np.asarray(src)[np.asarray(src_valid)]
            self.frame_reg_pub.publish(self._xyz_cloud(self.sensor_frame_name,
                                                       src_np))
        if cfg.republish_raw_input and input_pc_msg is not None:
            input_pc_msg.header = self._xyz_cloud(self.sensor_frame_name,
                                                  np.zeros((0, 3))).header
            self.frame_input_pub.publish(input_pc_msg)

    def spin(self):
        """Silence watchdog loop (ref pin_slam_ros.py:243-255)."""
        rospy = self._rospy
        rate = rospy.Rate(2)
        while not rospy.is_shutdown():
            if (time.time() - self.slam.last_msg_time > self.cfg.timeout_duration_s
                    and self.slam.system.frame_id > 0):
                break
            rate.sleep()
        self.slam.finish(self.out_dir)


def main() -> int:
    try:
        import rospy  # noqa: F401
    except ImportError:
        print("pin_slam_ros: rospy is not available in this environment.\n"
              "The streaming core is importable as pin_slam_ros.StreamingSlam —\n"
              "push numpy frames directly, or run the batch driver: pin_slam.py",
              file=sys.stderr)
        return 3

    from pin_slam_tpu.config import Config

    # reference arg convention: pin_slam_ros.py <config> [cloud_topic]
    # (ref pin_slam_ros.py:470-491)
    cfg = Config()
    if len(sys.argv) > 1:
        cfg.load(sys.argv[1])
    topic = sys.argv[2] if len(sys.argv) > 2 else None
    node = PinSlamRosNode(cfg, cloud_topic=topic)
    node.spin()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
