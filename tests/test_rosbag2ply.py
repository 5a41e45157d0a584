"""scripts/rosbag2ply.py: pure-python ROS1 bag -> per-frame PLY extraction
(ref scripts/rosbag2ply.py:10-47), tested against a synthesized v2.0 bag with
both a bare message record and a bz2-compressed chunk."""

import bz2
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        field = k.encode() + b"=" + v
        out += struct.pack("<I", len(field)) + field
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _pc2_body(pts: np.ndarray, intensity: np.ndarray) -> bytes:
    n = pts.shape[0]
    body = struct.pack("<I", 7)                       # header.seq
    body += struct.pack("<II", 10, 500)               # stamp
    fid = b"velodyne"
    body += struct.pack("<I", len(fid)) + fid
    body += struct.pack("<II", 1, n)                  # height, width
    body += struct.pack("<I", 4)                      # 4 fields
    for name, off in (("x", 0), ("y", 4), ("z", 8), ("intensity", 12)):
        nb = name.encode()
        body += struct.pack("<I", len(nb)) + nb
        body += struct.pack("<IBI", off, 7, 1)        # offset, FLOAT32, count
    body += struct.pack("<B", 0)                      # is_bigendian
    body += struct.pack("<II", 16, 16 * n)            # point_step, row_step
    blob = np.concatenate([pts.astype(np.float32),
                           intensity.astype(np.float32)[:, None]],
                          axis=1).tobytes()
    body += struct.pack("<I", len(blob)) + blob
    body += struct.pack("<B", 1)                      # is_dense
    return body


def _write_bag(path, clouds):
    conn_rec = _record(
        {"op": b"\x07", "conn": struct.pack("<I", 0), "topic": b"/points"},
        _header({"type": b"sensor_msgs/PointCloud2",
                 "md5sum": b"x", "message_definition": b""}))
    msgs = []
    for i, (pts, inten) in enumerate(clouds):
        msgs.append(_record(
            {"op": b"\x02", "conn": struct.pack("<I", 0),
             "time": struct.pack("<II", 100 + i, 7)},
            _pc2_body(pts, inten)))
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", 1),
                         "chunk_count": struct.pack("<I", 1)}, b"\x00" * 8))
        # first message inside a bz2 chunk (with its connection)
        chunk_payload = conn_rec + msgs[0]
        f.write(_record({"op": b"\x05", "compression": b"bz2",
                         "size": struct.pack("<I", len(chunk_payload))},
                        bz2.compress(chunk_payload)))
        # second message as a bare top-level record
        f.write(msgs[1])


def test_rosbag2ply_roundtrip(tmp_path, rng):
    import rosbag2ply

    clouds = []
    for _ in range(2):
        pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
        inten = rng.uniform(0, 1, 500).astype(np.float32)
        clouds.append((pts, inten))
    bag = str(tmp_path / "test.bag")
    _write_bag(bag, clouds)

    frames = list(rosbag2ply.read_pointcloud2_frames(bag))
    assert len(frames) == 2
    for (stamp, pts, inten), (ref_pts, ref_int) in zip(frames, clouds):
        np.testing.assert_allclose(pts, ref_pts, rtol=1e-6)
        np.testing.assert_allclose(inten, ref_int, rtol=1e-6)

    out = str(tmp_path / "ply")
    assert rosbag2ply.main([bag, out, "/points"]) == 0
    files = sorted(os.listdir(out))
    assert len(files) == 2 and files[0].endswith(".ply")

    # the written frames read back through the standard IO path
    from pin_slam_tpu.dataset import io as pio

    pts2, color, _ = pio.read_point_cloud(os.path.join(out, files[0]))
    assert pts2.shape[0] == 500
