"""Stop-frame handling (ref pin_slam.py:234-246): when the robot is
stationary the map/pool update is skipped (no new observations) and
adaptive_mode trains fewer iterations — round-3 `_stop_train` program."""

import dataclasses

import numpy as np

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.ops.voxel import pad_to
from pin_slam_tpu.slam.pipeline import SlamSystem


def _room_scan(rng, origin):
    walls = []
    for axis, sign in [(0, -6.0), (0, 6.0), (1, -6.0), (1, 6.0)]:
        n_w = 6000
        w = np.empty((n_w, 3))
        w[:, axis] = sign + 0.02 * rng.standard_normal(n_w)
        w[:, 1 - axis] = rng.uniform(-6, 6, n_w)
        w[:, 2] = rng.uniform(-1.0, 2.0, n_w)
        walls.append(w)
    g = np.column_stack([rng.uniform(-5, 5, 4000), rng.uniform(-5, 5, 4000),
                         np.full(4000, -1.2)])
    pts = np.concatenate(walls + [g]) - origin
    return pts.astype(np.float32)


def test_stop_frames_skip_map_update(rng):
    cfg = Config()
    # GT-driven mapping isolates the stop path from tracking quality — the
    # stop gate applies to track_on=False runs too (ref pin_slam.py:234-246)
    cfg.track_on = False
    cfg.pgo_on = False
    cfg.silence = True
    cfg.adaptive_mode = True          # iteration reduction on stop
    cfg.stop_frame_thre = 2
    cfg.min_range, cfg.max_range = 0.5, 15.0
    cfg.bs, cfg.iters = 2048, 12
    cfg.init_iter_ratio = 2
    cfg.reg_iter_n = 30
    cfg.map_capacity = 1 << 15
    cfg.local_map_capacity = 1 << 14
    cfg.buffer_size = 1 << 18
    cfg.frame_bucket = 1 << 13
    cfg.source_bucket = 1 << 11
    cfg.downsample_hash_size = 1 << 16
    cfg.pool_capacity = 1 << 17
    cfg._derive()

    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    def push(i, origin):
        pts = _room_scan(np.random.default_rng(100 + i), origin)
        arr, valid = pad_to(pts, cfg.frame_bucket)
        T = np.eye(4)
        T[:3, 3] = origin
        system.cur_pose = T          # GT pose feed (track_on=False path)
        system.process_frame(Frame(points=arr, valid=valid, colors=None,
                                   sem_labels=None, point_ts=None,
                                   raw_count=pts.shape[0]))

    # moving phase
    for i in range(4):
        push(i, np.array([0.3 * i, 0.0, 0.0]))
    assert not system.dataset.stop_status

    # stationary phase: identical pose; stop_status engages after
    # stop_frame_thre identical-translation frames
    fills, counts = [], []
    for i in range(4, 12):
        push(i, np.array([0.9, 0.0, 0.0]))
        fills.append(int(system.pool.fill))
        counts.append(int(system.state.count))
    assert system.dataset.stop_status, "stop detection never engaged"

    # once stopped, the map/pool update is skipped entirely: the pool fill
    # and map count FREEZE for the late stationary frames
    assert fills[-1] == fills[-2] == fills[-3], fills
    assert counts[-1] == counts[-2] == counts[-3], counts
    # but they did grow during the moving + pre-stop frames
    assert fills[0] > 0 and counts[0] > 100

    # motion resumes -> updates resume
    push(12, np.array([1.3, 0.0, 0.0]))
    push(13, np.array([1.7, 0.0, 0.0]))
    assert int(system.pool.fill) > fills[-1]
    assert not system.dataset.stop_status
