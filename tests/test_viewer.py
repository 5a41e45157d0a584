"""Self-contained HTML viewer artifact (C20 headless equivalent)."""

import base64
import json
import re

import numpy as np

from pin_slam_tpu.utils.viewer_html import export_html


def test_export_html_layers(tmp_path, rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    verts = rng.normal(size=(30, 3)).astype(np.float32)
    faces = rng.integers(0, 30, size=(40, 3)).astype(np.uint32)
    traj = np.cumsum(rng.normal(size=(50, 3)), axis=0).astype(np.float32)
    colors = rng.uniform(0, 1, size=(30, 3)).astype(np.float32)

    p = export_html(str(tmp_path / "viewer.html"), scan=pts,
                    neural_points=pts * 2, mesh_verts=verts, mesh_faces=faces,
                    mesh_colors=colors, trajectory=traj)
    html = open(p).read()
    assert "<canvas" in html and "webgl2" in html
    # no external resources: self-contained must not fetch anything
    assert "http://" not in html and "https://" not in html

    layers = json.loads(re.search(r"const EMBEDDED = (\{.*?\});\n", html,
                                  re.S).group(1))
    assert set(layers) == {"scan", "neural points", "mesh", "trajectory"}
    # round-trip one layer's binary payload
    dec = np.frombuffer(base64.b64decode(layers["mesh"]["pos"]), np.float32)
    np.testing.assert_allclose(dec.reshape(-1, 3), verts)
    fdec = np.frombuffer(base64.b64decode(layers["mesh"]["faces"]), np.uint32)
    np.testing.assert_array_equal(fdec.reshape(-1, 3), faces)
    # key bindings mirror the reference visualizer's toggles
    assert {layers[k]["key"] for k in layers} == {"s", "p", "m", "t"}


def test_export_html_decimates(tmp_path, rng):
    pts = rng.normal(size=(100_000, 3)).astype(np.float32)
    p = export_html(str(tmp_path / "v.html"), neural_points=pts)
    html = open(p).read()
    layers = json.loads(re.search(r"const EMBEDDED = (\{.*?\});\n", html,
                                  re.S).group(1))
    n = len(base64.b64decode(layers["neural points"]["pos"])) // 12
    assert n == 100_000  # under the cap: kept whole

    p2 = export_html(str(tmp_path / "v2.html"), neural_points=pts)
    assert open(p2).read() == html  # deterministic


def test_export_html_live_mode(tmp_path, rng):
    """Live mode: viewer.html is a polling shell written once;
    viewer_data.js refreshes per call with layers + meta (camera state and
    toggles live browser-side)."""
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    p = export_html(str(tmp_path / "viewer.html"), neural_points=pts,
                    live=True, meta={"frame": 7, "map_points": 500})
    html = open(p).read()
    assert "const LIVE = true" in html
    assert "viewer_data.js" in html
    data = open(tmp_path / "viewer_data.js").read()
    assert data.startswith("window.__PIN_DATA(")
    layers = json.loads(re.search(r"__PIN_DATA\((\{.*\}), \{", data).group(1))
    assert "neural points" in layers
    meta = json.loads(re.search(r"\}, (\{[^{]*\})\);$", data).group(1))
    assert meta["frame"] == 7 and meta["rev"] == 7 and meta["map_points"] == 500

    # second refresh: shell untouched, sidecar rewritten with the new rev
    export_html(str(tmp_path / "viewer.html"), neural_points=pts * 2,
                live=True, meta={"frame": 9})
    assert open(p).read() == html
    assert '"rev": 9' in open(tmp_path / "viewer_data.js").read().replace(
        '"rev":9', '"rev": 9')
