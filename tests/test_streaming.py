"""Streaming (ROS-core) driver test: push numpy frames, get poses + artifacts
(reference pin_slam_ros.py behavior minus the transport)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_streaming_slam(tmp_path, rng):
    from pin_slam_tpu.config import Config
    from pin_slam_ros import StreamingSlam
    from tests.test_mapping import ray_box_endpoints

    cfg = Config()
    cfg.min_range, cfg.max_range = 0.5, 20.0
    cfg.bs, cfg.iters = 2048, 8
    cfg.reg_iter_n = 30
    cfg.silence = True
    cfg.map_capacity = 1 << 16
    cfg.local_map_capacity = 1 << 15
    cfg.buffer_size = 1 << 20
    cfg.frame_bucket = 1 << 13
    cfg.source_bucket = 1 << 11
    cfg.downsample_hash_size = 1 << 17
    cfg.pool_capacity = 1 << 17
    cfg._derive()
    cfg.output_root = str(tmp_path)

    slam = StreamingSlam(cfg)
    for f in range(3):
        pts = ray_box_endpoints(rng, 4096) + np.float32([0.02 * f, 0, 0])
        pose = slam.push_frame(pts)
        assert pose.shape == (4, 4)
        assert np.isfinite(pose).all()

    npc = slam.neural_point_cloud(down_rate=3)
    assert npc.shape[0] > 50

    out = str(tmp_path / "stream_out")
    slam.finish(out)
    assert os.path.exists(os.path.join(out, "odom_poses_kitti.txt"))
    assert os.path.exists(os.path.join(out, "map", "neural_points.ply"))
