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


def test_pool_layer(tmp_path, rng):
    """The data-pool layer (ref visualizer data_pool toggle) is exported with
    label-sign coloring."""
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    lbl = rng.normal(size=300).astype(np.float32) * 0.2
    p = export_html(str(tmp_path / "v.html"), pool_points=pts, pool_labels=lbl)
    html = open(p).read()
    assert "data pool" in html


def test_control_channel_pause_step_mesh(tmp_path, monkeypatch):
    """The pipeline's control.json poll (viewer pause/step/mesh-now — the
    reference's visualizer run control, utils/visualizer.py:344-346)."""
    import json as _json
    import threading
    import time as _time

    from pin_slam_tpu.config import Config
    from pin_slam_tpu.slam.pipeline import SlamSystem

    S = object.__new__(SlamSystem)      # control methods only — no device init
    S.config = Config()
    S.config.run_path = str(tmp_path)
    S.frame_id = 3

    # no control file: no-op
    S._poll_control()
    assert not getattr(S, "_mesh_now", False)

    # mesh_now: one-shot, consumed from the file
    S._write_control({"mesh_now": True})
    S._poll_control()
    assert S._mesh_now is True
    assert _json.load(open(tmp_path / "control.json")) == {}

    # pause + step: blocks until a step is granted
    S._write_control({"pause": True})

    def release():
        _time.sleep(0.6)
        S._write_control({"pause": True, "step": 2})

    t = threading.Thread(target=release)
    t.start()
    t0 = _time.perf_counter()
    S._poll_control()                   # consumes one step
    took = _time.perf_counter() - t0
    t.join()
    assert took > 0.4                   # actually waited for the release
    assert _json.load(open(tmp_path / "control.json"))["step"] == 1
    S._poll_control()                   # second step passes immediately
    assert _json.load(open(tmp_path / "control.json"))["step"] == 0

    # pause_at_loop flag is latched for the loop-closure hook
    S._write_control({"pause_at_loop": True})
    S._poll_control()
    assert S._pause_at_loop is True


def test_viewer_server_control_post(tmp_path):
    """utils/viewer_server.py merges POST /control into control.json."""
    import json as _json
    import threading
    import urllib.request

    from pin_slam_tpu.utils.viewer_server import make_handler
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("localhost", 0), make_handler(str(tmp_path)))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://localhost:{port}/control",
            data=_json.dumps({"pause": True}).encode(), method="POST")
        assert urllib.request.urlopen(req, timeout=10).status == 200
        req = urllib.request.Request(
            f"http://localhost:{port}/control",
            data=_json.dumps({"step": 3}).encode(), method="POST")
        urllib.request.urlopen(req, timeout=10)
        state = _json.load(open(tmp_path / "control.json"))
        assert state == {"pause": True, "step": 3}
    finally:
        httpd.shutdown()


def test_control_live_mc_retune(tmp_path):
    """control.json mc_res_m / mesh_min_nn re-parameterize the periodic
    mesher live (ref utils/visualizer.py:211-242 key-tuning)."""
    from pin_slam_tpu.config import Config
    from pin_slam_tpu.slam.pipeline import SlamSystem

    S = object.__new__(SlamSystem)
    S.config = Config()
    S.config.run_path = str(tmp_path)
    S.frame_id = 1
    S._vis_mesher = object()           # stands in for a built mesher
    S._write_control({"mc_res_m": 0.2, "mesh_min_nn": 6})
    S._poll_control()
    assert S._mc_overrides == {"mc_res_m": 0.2, "mesh_min_nn": 6}
    assert not hasattr(S, "_vis_mesher")   # dropped -> rebuilt with overrides
    # unchanged overrides don't thrash the mesher
    S._vis_mesher = object()
    S._poll_control()
    assert hasattr(S, "_vis_mesher")
