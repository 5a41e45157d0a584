"""ROS node surface smoke test under a FAKED rospy (VERDICT r2 missing #3):
the node must publish TF + odometry + path + decimated neural-point map per
frame and register save_results/save_mesh services
(ref pin_slam_ros.py:119-148, 278-391)."""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ns(**kw):
    return types.SimpleNamespace(**kw)


class _FakePub:
    def __init__(self, topic):
        self.topic = topic
        self.msgs = []

    def publish(self, m):
        self.msgs.append(m)


class _Header:
    def __init__(self):
        self.stamp = None
        self.frame_id = ""


class _PoseStamped:
    def __init__(self):
        self.header = _Header()
        self.pose = _ns(orientation=_ns(x=0.0, y=0.0, z=0.0, w=1.0),
                        position=_ns(x=0.0, y=0.0, z=0.0))


class _Odometry:
    def __init__(self):
        self.header = None
        self.child_frame_id = ""
        self.pose = _ns(pose=None)


class _TransformStamped:
    def __init__(self):
        self.header = _Header()
        self.child_frame_id = ""
        self.transform = _ns(rotation=_ns(x=0.0, y=0.0, z=0.0, w=1.0),
                             translation=_ns(x=0.0, y=0.0, z=0.0))


class _Path:
    def __init__(self):
        self.header = _Header()
        self.poses = []


class _PointField:
    FLOAT32 = 7

    def __init__(self, name, offset, datatype, count):
        self.name, self.offset = name, offset


class _PointCloud2:
    def __init__(self, pts=None):
        self.pts = pts
        self.header = _Header()


class _Broadcaster:
    def __init__(self):
        self.sent = []

    def sendTransform(self, m):
        self.sent.append(m)


@pytest.fixture
def fake_ros(monkeypatch):
    pubs, services, subscribers = {}, {}, {}

    rospy = types.ModuleType("rospy")
    rospy.init_node = lambda name: None
    rospy.get_param = lambda name, default=None: default
    rospy.Publisher = lambda topic, typ, queue_size=10: pubs.setdefault(
        topic, _FakePub(topic))
    rospy.Service = lambda name, typ, cb: services.setdefault(name, cb)
    rospy.Subscriber = lambda topic, typ, cb, queue_size=4: subscribers.setdefault(
        topic, cb)
    rospy.Time = _ns(now=lambda: 0.0)
    rospy.loginfo = lambda *a, **k: None
    rospy.Rate = lambda hz: _ns(sleep=lambda: None)
    rospy.is_shutdown = lambda: True

    nav = types.ModuleType("nav_msgs")
    nav_msg = types.ModuleType("nav_msgs.msg")
    nav_msg.Path, nav_msg.Odometry = _Path, _Odometry
    nav.msg = nav_msg

    std = types.ModuleType("std_msgs")
    std_msg = types.ModuleType("std_msgs.msg")
    std_msg.Header = _Header
    std.msg = std_msg

    geo = types.ModuleType("geometry_msgs")
    geo_msg = types.ModuleType("geometry_msgs.msg")
    geo_msg.PoseStamped, geo_msg.TransformStamped = _PoseStamped, _TransformStamped
    geo.msg = geo_msg

    sens = types.ModuleType("sensor_msgs")
    sens_msg = types.ModuleType("sensor_msgs.msg")
    sens_msg.PointCloud2, sens_msg.PointField = _PointCloud2, _PointField
    sens.msg = sens_msg
    pc2 = types.ModuleType("sensor_msgs.point_cloud2")
    pc2.create_cloud = lambda header, fields, pts: _ns(header=header,
                                                       pts=np.asarray(pts))
    pc2.read_points = lambda msg, field_names=None, skip_nans=True: list(msg.pts)
    sens.point_cloud2 = pc2

    srv = types.ModuleType("std_srvs")
    srv_srv = types.ModuleType("std_srvs.srv")
    srv_srv.Empty = object
    srv_srv.EmptyResponse = _ns
    srv.srv = srv_srv

    tf2 = types.ModuleType("tf2_ros")
    tf2.TransformBroadcaster = _Broadcaster

    mods = {"rospy": rospy, "nav_msgs": nav, "nav_msgs.msg": nav_msg,
            "std_msgs": std, "std_msgs.msg": std_msg,
            "geometry_msgs": geo, "geometry_msgs.msg": geo_msg,
            "sensor_msgs": sens, "sensor_msgs.msg": sens_msg,
            "sensor_msgs.point_cloud2": pc2,
            "std_srvs": srv, "std_srvs.srv": srv_srv, "tf2_ros": tf2}
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return _ns(pubs=pubs, services=services, subscribers=subscribers)


def test_ros_node_publishes_and_serves(tmp_path, rng, fake_ros):
    from pin_slam_tpu.config import Config
    from pin_slam_ros import PinSlamRosNode
    from tests.test_mapping import ray_box_endpoints

    cfg = Config()
    cfg.min_range, cfg.max_range = 0.5, 20.0
    cfg.bs, cfg.iters = 2048, 5
    cfg.init_iter_ratio = 2
    cfg.reg_iter_n = 30
    cfg.silence = True
    cfg.map_capacity = 1 << 15
    cfg.local_map_capacity = 1 << 14
    cfg.buffer_size = 1 << 18
    cfg.frame_bucket = 1 << 12
    cfg.source_bucket = 1 << 10
    cfg.downsample_hash_size = 1 << 16
    cfg.pool_capacity = 1 << 16
    cfg._derive()
    cfg.output_root = str(tmp_path)

    node = PinSlamRosNode(cfg, cloud_topic="/points", init_node=False)

    # both services registered (ref pin_slam_ros.py:119-148)
    assert "~save_results" in fake_ros.services
    assert "~save_mesh" in fake_ros.services
    # the subscriber is wired
    assert "/points" in fake_ros.subscribers

    # push two frames through the real callback
    cb = fake_ros.subscribers["/points"]
    for f in range(2):
        pts = ray_box_endpoints(rng, 4096) + np.float32([0.02 * f, 0, 0])
        cb(_ns(pts=[tuple(p) for p in pts], header=_Header()))

    # TF broadcast + odometry + path + neural point map all published
    assert len(node.tf_broadcaster.sent) == 2
    tfm = node.tf_broadcaster.sent[-1]
    assert tfm.header.frame_id == "map"
    assert tfm.child_frame_id == "range_sensor"

    odom = fake_ros.pubs["~odometry"].msgs
    assert len(odom) == 2 and odom[-1].child_frame_id == "range_sensor"
    qn = np.linalg.norm([odom[-1].pose.pose.orientation.x,
                         odom[-1].pose.pose.orientation.y,
                         odom[-1].pose.pose.orientation.z,
                         odom[-1].pose.pose.orientation.w])
    assert abs(qn - 1.0) < 1e-4

    path = fake_ros.pubs["~pin_path"].msgs
    assert len(path[-1].poses) == 2

    np_map = fake_ros.pubs["~map/neural_points"].msgs
    assert len(np_map) == 2 and np_map[-1].pts.shape[0] > 10

    # frame 0 has no registration source yet (tracking starts at frame 1)
    reg = fake_ros.pubs["~frame/registration"].msgs
    assert len(reg) == 1 and reg[-1].pts.shape[0] > 10

    # save_results service writes pose files
    fake_ros.services["~save_results"](None)
    assert os.path.exists(os.path.join(cfg.output_root, "odom_poses_kitti.txt"))
