"""Dataset IO tests: PLY/PCD/bin round-trips, pose formats, calib."""

import numpy as np
import pytest

from pin_slam_tpu.dataset import io as pio


def test_natural_sort():
    names = ["10.bin", "2.bin", "1.bin", "000003.bin"]
    assert pio.natural_sort(names) == ["1.bin", "2.bin", "000003.bin", "10.bin"]


def test_kitti_bin_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    p = tmp_path / "000000.bin"
    pts.tofile(p)
    out = pio.read_kitti_bin(str(p))
    np.testing.assert_array_equal(out, pts)
    xyz, intensity, ts = pio.read_point_cloud(str(p))
    np.testing.assert_array_equal(xyz, pts[:, :3])
    np.testing.assert_array_equal(intensity[:, 0], pts[:, 3])


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    colors = rng.uniform(size=(50, 3)).astype(np.float32)
    normals = rng.normal(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    pio.write_ply(p, pts, colors=colors, normals=normals)
    d = pio.read_ply(p)
    np.testing.assert_allclose(np.stack([d["x"], d["y"], d["z"]], 1), pts, atol=1e-6)
    np.testing.assert_allclose(
        np.stack([d["red"], d["green"], d["blue"]], 1) / 255.0, colors, atol=1 / 255.0)
    xyz, col, ts = pio.read_point_cloud(p)
    np.testing.assert_allclose(xyz, pts, atol=1e-6)
    assert col.shape == (50, 3)


def test_ply_mesh_roundtrip(tmp_path, rng):
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], dtype=np.int64)
    p = str(tmp_path / "mesh.ply")
    pio.write_ply(p, verts, faces=faces)
    d = pio.read_ply(p)
    np.testing.assert_array_equal(d["faces"], faces)


def test_kitti_poses_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    n = 7
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = Rotation.random(n, random_state=0).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(n, 3)) * 10
    p = str(tmp_path / "poses.txt")
    pio.write_kitti_poses(p, poses)
    out = pio.read_kitti_poses(p)
    np.testing.assert_allclose(out, poses, atol=1e-8)


def test_tum_poses_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    n = 5
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = Rotation.random(n, random_state=1).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    p = str(tmp_path / "poses_tum.txt")
    pio.write_tum_poses(p, poses, timestamps=np.arange(n) * 0.1)
    out, ts = pio.read_tum_poses(p)
    np.testing.assert_allclose(out, poses, atol=1e-6)
    np.testing.assert_allclose(ts, np.arange(n) * 0.1)


def test_calib_and_frame_transform(tmp_path):
    Tr = np.eye(4)
    Tr[:3, 3] = [0.1, -0.2, 0.3]
    with open(tmp_path / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in Tr[:3].reshape(-1)) + "\n")
    calib = pio.read_kitti_calib(str(tmp_path / "calib.txt"))
    np.testing.assert_allclose(calib["Tr"], Tr)

    poses_cam = np.tile(np.eye(4), (3, 1, 1))
    poses_cam[:, 0, 3] = [0, 1, 2]
    lidar = pio.apply_kitti_calib(poses_cam, Tr)
    expect = np.einsum("ij,njk,kl->nil", np.linalg.inv(Tr), poses_cam, Tr)
    np.testing.assert_allclose(lidar, expect, atol=1e-12)


def test_semantic_labels(tmp_path):
    raw = np.asarray([1, 2 | (5 << 16), 0xFFFF0000 | 42], dtype=np.uint32)
    p = tmp_path / "000000.label"
    raw.tofile(p)
    lab = pio.read_semantic_labels(str(p))
    np.testing.assert_array_equal(lab, [1, 2, 42])


def test_las_roundtrip(tmp_path, rng):
    pts = (rng.normal(size=(500, 3)) * 50.0).astype(np.float64)
    intensity = rng.integers(0, 1000, size=500).astype(np.float32)
    colors = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    gps = np.sort(rng.uniform(0, 10, size=500))

    # format 3 (gps + rgb)
    p = str(tmp_path / "cloud.las")
    pio.write_las(p, pts, intensity=intensity, colors=colors, gps_time=gps)
    d = pio.read_las(p)
    xyz = np.stack([d["x"], d["y"], d["z"]], axis=1)
    np.testing.assert_allclose(xyz, pts, atol=1e-4)  # quantized at 1e-4 scale
    np.testing.assert_allclose(d["intensity"], intensity)
    np.testing.assert_allclose(
        np.stack([d["red"], d["green"], d["blue"]], axis=1), colors, atol=1 / 65535)
    np.testing.assert_allclose(d["gps_time"], gps)

    # format 0 (bare) through the dispatching reader
    p0 = str(tmp_path / "bare.las")
    pio.write_las(p0, pts, intensity=intensity)
    out, color, ts = pio.read_point_cloud(p0)
    np.testing.assert_allclose(out, pts.astype(np.float32), atol=1e-3)
    assert color.shape == (500, 1) and ts is None


def test_las_rejects_laz_and_bad_signature(tmp_path):
    p = str(tmp_path / "x.las")
    pio.write_las(p, np.zeros((1, 3)))
    raw = bytearray(open(p, "rb").read())
    raw[104] |= 0x80  # LAZ compression flag
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="LAZ"):
        pio.read_las(p)
    open(p, "wb").write(b"NOPE" + bytes(raw[4:]))
    with pytest.raises(ValueError, match="signature"):
        pio.read_las(p)
