"""Tests for auxiliary components: semantic utils, mesh eval, converters,
mesher grid queries, sdf slices."""

import os

import numpy as np

import jax.numpy as jnp

from pin_slam_tpu.eval.mesh import eval_mesh, nn_distances, sample_mesh_surface
from pin_slam_tpu.ops.marching_cubes import marching_tetrahedra
from pin_slam_tpu.utils import semantic_kitti as sk


def test_semantic_learning_map():
    raw = np.asarray([0, 10, 30, 40, 70, 252, 259])
    lab = sk.apply_learning_map(raw)
    np.testing.assert_array_equal(lab, [0, 1, 6, 9, 15, 1, 5])
    colors = sk.labels_to_colors(lab)
    assert colors.shape == (7, 3) and colors.dtype == np.uint8
    assert len(sk.SEM_KITTI_CLASS_NAMES) == 20


def sphere_mesh(n=48, r=1.0):
    xs = np.linspace(-1.5, 1.5, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    sdf = np.linalg.norm(g, axis=-1) - r
    return marching_tetrahedra(sdf, origin=(-1.5, -1.5, -1.5), spacing=xs[1] - xs[0])


def test_mesh_eval_perfect_match(rng):
    verts, faces = sphere_mesh()
    gt = sample_mesh_surface(verts, faces, 20000, seed=1)
    m = eval_mesh(verts, faces, gt, n_samples=20000, threshold=0.05)
    assert m["fscore"] > 0.99
    # chamfer floor set by sample density: 20k points on a 4*pi sphere
    assert m["chamfer_l1"] < 0.02


def test_mesh_eval_detects_mismatch(rng):
    verts, faces = sphere_mesh()
    gt = sample_mesh_surface(verts, faces, 20000, seed=1) * 1.5  # wrong scale
    m = eval_mesh(verts, faces, gt, n_samples=20000, threshold=0.05)
    assert m["fscore"] < 0.5
    assert m["chamfer_l1"] > 0.1


def test_nn_distances():
    a = np.asarray([[0.0, 0, 0], [1, 0, 0]])
    b = np.asarray([[0.0, 0, 0.5]])
    np.testing.assert_allclose(nn_distances(a, b), [0.5, np.sqrt(1.25)], atol=1e-12)


def test_backproject_depth():
    from pin_slam_tpu.dataset.converters import backproject_depth

    depth = np.full((4, 4), 2000, dtype=np.uint16)  # 2 m at scale 1000
    pts, cols = backproject_depth(depth, fx=2.0, fy=2.0, cx=1.5, cy=1.5,
                                  depth_scale=1000.0)
    assert pts.shape == (16, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0)
    # center pixel maps to the optical axis
    center = pts[np.argmin(np.abs(pts[:, 0]) + np.abs(pts[:, 1]))]
    np.testing.assert_allclose(center, [0.5, 0.5, 2.0], atol=1.01)


def test_replica_converter_roundtrip(tmp_path, rng):
    """Miniature Replica-format sequence -> converter -> readable frames."""
    from PIL import Image

    from pin_slam_tpu.dataset.converters import convert_replica
    from pin_slam_tpu.dataset.io import read_point_cloud, read_kitti_poses

    seq = tmp_path / "room0"
    os.makedirs(seq / "results")
    n = 3
    for i in range(n):
        depth = (rng.uniform(0.5, 3.0, size=(64, 96)) * 6553.5).astype(np.uint16)
        Image.fromarray(depth).save(seq / "results" / f"depth{i:06d}.png")
        rgb = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
        Image.fromarray(rgb).save(seq / "results" / f"frame{i:06d}.jpg")
    traj = np.tile(np.eye(4), (n, 1, 1))
    traj[:, 0, 3] = np.arange(n) * 0.1
    np.savetxt(seq / "traj.txt", traj.reshape(n, 16))

    out = tmp_path / "converted"
    count = convert_replica(str(seq), str(out), stride=4)
    assert count == n
    pts, cols, _ = read_point_cloud(str(out / "rgbd_ply" / "000000.ply"))
    assert pts.shape[0] > 100 and cols is not None
    assert (pts[:, 2] > 0.4).all() and (pts[:, 2] < 3.1).all()
    poses = read_kitti_poses(str(out / "poses.txt"))
    np.testing.assert_allclose(poses[:, 0, 3], np.arange(n) * 0.1, atol=1e-8)


def test_mesher_reconstructs_trained_box(rng):
    """Device grid query + host marching tetrahedra on a trained map."""
    from tests.test_mapping import build_and_train

    mc, mcfg, state, lm, params, offsets, travel, _ = build_and_train(
        rng, n_rays=4096, iters=200)
    from pin_slam_tpu.slam.mesher import Mesher, MesherConfig

    mesher = Mesher(MesherConfig(mc_res_m=0.2, mesh_min_nn=6, query_bucket=1 << 15,
                                 min_cluster_vertices=50), mc, offsets)
    amin = np.asarray([-4.5, -4.5, -4.5])
    amax = np.asarray([4.5, 4.5, 4.5])
    verts, faces, colors, sems = mesher.recon_aabb_mesh(lm, params.geo, 0.055,
                                                        amin, amax)
    assert verts.shape[0] > 500, "mesh should capture the box walls"
    # reconstructed surface lies near the +-4 walls
    linf = np.abs(verts).max(axis=1)
    frac_near_wall = ((linf > 3.6) & (linf < 4.4)).mean()
    assert frac_near_wall > 0.8, frac_near_wall

    # SDF slice produces points
    pts, sdf = mesher.sdf_slice(lm, params.geo, 0.055,
                                center=np.zeros(3), extent=4.0, height=0.0)
    assert pts.shape[0] > 100
