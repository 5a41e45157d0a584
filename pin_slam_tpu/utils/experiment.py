"""Experiment runtime: run-dir setup, seeding, timing, checkpointing.

Equivalent of the reference's experiment utilities (reference utils/tools.py:36-274):
``setup_experiment`` creates a timestamped run dir and copies the config for
reproducibility; ``save_implicit_map``/``load_implicit_map`` persist the
neural-point map SoA + decoder params (the ``pin_map.pth`` analog,
utils/tools.py:224-267) as an ``.npz`` that vis tools reload.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional, Tuple

import numpy as np


def setup_experiment(cfg, argv=None) -> str:
    """Create run dir, seed, copy config (ref utils/tools.py:36-86)."""
    ts = time.strftime("%Y-%m-%d_%H-%M-%S")
    run_name = f"{cfg.name}_{ts}"
    run_path = os.path.join(cfg.output_root or "./experiments", run_name)
    for sub in ("map", "mesh", "meta"):
        os.makedirs(os.path.join(run_path, sub), exist_ok=True)
    cfg.run_path = run_path
    cfg.run_name = run_name

    np.random.seed(cfg.seed)

    # reproducibility breadcrumbs (ref utils/tools.py:69-77)
    meta = {"argv": argv or [], "seed": cfg.seed, "time": ts}
    try:
        import subprocess

        meta["git_commit"] = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL,
            cwd=os.path.dirname(os.path.abspath(__file__))).decode().strip()
    except Exception:
        pass
    with open(os.path.join(run_path, "meta", "run.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return run_path


# ----------------------------------------------------------------------
# map persistence (pin_map.pth analog)
# ----------------------------------------------------------------------


def _flatten_decoder(params) -> dict:
    out = {}
    if params is None:
        return out
    for i, (W, b) in enumerate(params.hidden):
        out[f"hidden_{i}_W"] = np.asarray(W)
        if b is not None:
            out[f"hidden_{i}_b"] = np.asarray(b)
    out["out_W"] = np.asarray(params.out[0])
    if params.out[1] is not None:
        out["out_b"] = np.asarray(params.out[1])
    return out


def _unflatten_decoder(blob: dict):
    from pin_slam_tpu.models.decoder import DecoderParams

    if "out_W" not in blob:
        return None
    hidden = []
    i = 0
    while f"hidden_{i}_W" in blob:
        hidden.append((blob[f"hidden_{i}_W"], blob.get(f"hidden_{i}_b")))
        i += 1
    return DecoderParams(hidden=tuple(hidden), out=(blob["out_W"], blob.get("out_b")))


def save_implicit_map(path: str, state, geo_params, sem_params=None,
                      color_params=None, extra: Optional[dict] = None) -> None:
    """Persist the global map SoA + decoders (ref utils/tools.py:224-238)."""
    count = int(state.count)
    blob = {
        "positions": np.asarray(state.positions[:count]),
        "orientations": np.asarray(state.orientations[:count]),
        "geo_features": np.asarray(state.geo_features[:count]),
        "ts_create": np.asarray(state.ts_create[:count]),
        "ts_update": np.asarray(state.ts_update[:count]),
        "certainties": np.asarray(state.certainties[:count]),
    }
    if state.color_features is not None:
        blob["color_features"] = np.asarray(state.color_features[:count])
    for name, params in (("geo", geo_params), ("sem", sem_params), ("color", color_params)):
        for k, v in _flatten_decoder(params).items():
            blob[f"decoder_{name}_{k}"] = v
    if extra:
        for k, v in extra.items():
            blob[f"extra_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **blob)


def load_implicit_map(path: str, mc) -> Tuple[object, object, object, object]:
    """Reload a saved map into a fresh MapState + decoders and rebuild the hash
    (the vis_pin_map.py load path, reference vis_pin_map.py:54-70)."""
    import jax.numpy as jnp

    from pin_slam_tpu.models import neural_points as npts

    blob = dict(np.load(path, allow_pickle=False))
    n = blob["positions"].shape[0]
    assert n <= mc.capacity, f"saved map ({n} pts) exceeds capacity {mc.capacity}"

    state = npts.init_map_state(mc)
    attr = state.attr_rows
    attr = attr.at[:n, npts.C_POS].set(blob["positions"])
    attr = attr.at[:n, npts.C_QUAT].set(blob["orientations"])
    attr = attr.at[:n, npts.C_CERT].set(blob["certainties"])
    attr = attr.at[:n, npts.C_TSC].set(blob["ts_create"].astype(np.float32))
    attr = attr.at[:n, npts.C_TSU].set(blob["ts_update"].astype(np.float32))
    state = state._replace(
        attr_rows=attr,
        geo_features=state.geo_features.at[:n].set(blob["geo_features"]),
        count=jnp.asarray(n, jnp.int32),
    )
    if "color_features" in blob and state.color_features is not None:
        state = state._replace(
            color_features=state.color_features.at[:n].set(blob["color_features"]))
    state = npts.recreate_hash(state, mc, jnp.int32(int(blob["ts_create"].max(initial=0))))

    def dec_of(name):
        prefix = f"decoder_{name}_"
        sub = {k[len(prefix):]: v for k, v in blob.items() if k.startswith(prefix)}
        return _unflatten_decoder(sub)

    return state, dec_of("geo"), dec_of("sem"), dec_of("color")


class StageTimer:
    """Per-frame stage wall clock, accounting like the reference's T0-T8 probes
    (reference pin_slam.py:103-269); ``table()`` yields the time_table.npy rows."""

    def __init__(self):
        self.rows = []
        self._cur = {}
        self._t0 = None
        self._order = []

    def start(self):
        self._cur = {}
        self._order = []
        self._t0 = time.perf_counter()

    def lap(self, name: str):
        t = time.perf_counter()
        self._cur[name] = t - self._t0
        self._order.append(name)
        self._t0 = t

    def commit(self):
        self.rows.append(self._cur)

    def table(self) -> np.ndarray:
        keys = sorted({k for r in self.rows for k in r})
        return np.asarray([[r.get(k, 0.0) for k in keys] for r in self.rows])
