#!/usr/bin/env python3
"""Offline map inspector / mesher — the ``vis_pin_map.py`` equivalent
(reference vis_pin_map.py:24-136): load a saved implicit map, rebuild the hash,
reconstruct a mesh at arbitrary resolution, export PLY artifacts.

Usage:
    python vis_pin_map.py <run_dir_or_map.npz> [mc_res_m] [out_mesh.ply] [crop.ply]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    map_path = argv[0]
    if os.path.isdir(map_path):
        map_path = os.path.join(map_path, "map", "pin_map.npz")
    mc_res = float(argv[1]) if len(argv) > 1 else 0.1
    out_mesh = argv[2] if len(argv) > 2 else os.path.join(
        os.path.dirname(map_path), f"mesh_{int(mc_res*100)}cm.ply")
    crop_ply = argv[3] if len(argv) > 3 else None

    import jax.numpy as jnp

    from pin_slam_tpu.dataset import io as pio
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.slam.mesher import Mesher, MesherConfig, split_chunks
    from pin_slam_tpu.utils.experiment import load_implicit_map
    from pin_slam_tpu.utils.platform import (enable_compilation_cache,
                                             set_matmul_precision)

    enable_compilation_cache()
    set_matmul_precision()   # value-carrying contractions in the query view

    blob = np.load(map_path)
    n_pts = blob["positions"].shape[0]
    cap = 1 << max(12, (n_pts - 1).bit_length())
    feature_dim = blob["geo_features"].shape[1]
    mc = npts.MapConfig(
        capacity=cap, local_capacity=cap, hash_size=max(1 << 22, 4 * cap),
        voxel_size=0.3, feature_dim=feature_dim,
        color_on="color_features" in blob, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=1e6,
        travel_dist_window=1e9, local_hash_size=max(1 << 22, 4 * cap))
    state, geo, sem, color = load_implicit_map(map_path, mc)
    print(f"[vis_pin_map] loaded {int(state.count)} neural points from {map_path}")

    # the whole map becomes a read-only query view (global query mode,
    # ref vis_pin_map.py:70 recreate_hash + global queries)
    lm = npts.build_query_view(state, mc, jnp.zeros(3, jnp.float32),
                               jnp.float32(1e6))
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))

    pts = np.asarray(state.positions[: int(state.count)])
    if crop_ply:
        d = pio.read_ply(crop_ply)
        crop = np.stack([d["x"], d["y"], d["z"]], 1)
        lo, hi = crop.min(0) - 1, crop.max(0) + 1
        pts = pts[((pts >= lo) & (pts <= hi)).all(1)]
        print(f"[vis_pin_map] cropped to {len(pts)} points inside {crop_ply}")

    mesher = Mesher(MesherConfig(mc_res_m=mc_res, mesh_min_nn=8,
                                 query_bucket=1 << 17), mc, offsets)
    chunks = split_chunks(pts, chunk_m=60.0, pad=1.0)
    print(f"[vis_pin_map] reconstructing {len(chunks)} chunk(s) at {mc_res} m ...")
    verts, faces, colors, sems = mesher.recon_aabb_collections_mesh(
        lm, geo, 0.055, chunks, color_params=color, sem_params=sem)
    print(f"[vis_pin_map] mesh: {len(verts)} vertices, {len(faces)} faces")

    from pin_slam_tpu.ops.marching_cubes import vertex_normals

    if len(verts):
        normals = vertex_normals(verts, faces)
        pio.write_ply(out_mesh, verts, colors=colors, normals=normals, faces=faces)
        print(f"[vis_pin_map] wrote {out_mesh}")

    # interactive inspection artifact (C20 equivalent: self-contained WebGL
    # viewer with neural-point / mesh layer toggles)
    from pin_slam_tpu.utils.viewer_html import export_html

    viewer = os.path.join(os.path.dirname(out_mesh) or ".", "viewer.html")
    export_html(viewer, neural_points=pts,
                mesh_verts=verts if len(verts) else None,
                mesh_faces=faces if len(verts) else None,
                mesh_colors=colors if len(verts) else None)
    print(f"[vis_pin_map] wrote {viewer}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
