"""Mesh reconstruction from the implicit map.

Equivalent of the reference mesher (reference utils/mesher.py:41-485): regular
SDF grid queries inside AABBs (device, chunked static-shape batches), a
neighbor-count marching mask, isosurface extraction (host), vertex
color/semantic painting, and SDF slice clouds for visualization.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops import marching_cubes as mcubes


@dataclasses.dataclass(frozen=True)
class MesherConfig:
    mc_res_m: float = 0.1
    pad_voxel: int = 2
    skip_top_voxel: int = 2
    mc_mask_on: bool = True
    mesh_min_nn: int = 8
    min_cluster_vertices: int = 200
    query_bucket: int = 1 << 18
    semantic_on: bool = False
    color_on: bool = False

    @staticmethod
    def from_config(cfg) -> "MesherConfig":
        return MesherConfig(
            mc_res_m=cfg.mc_res_m, pad_voxel=cfg.pad_voxel,
            skip_top_voxel=cfg.skip_top_voxel, mc_mask_on=cfg.mc_mask_on,
            mesh_min_nn=cfg.mesh_min_nn, min_cluster_vertices=cfg.min_cluster_vertices,
            query_bucket=cfg.mesh_query_bucket, semantic_on=cfg.semantic_on,
            color_on=cfg.color_on)


@partial(jax.jit, static_argnames=("mc",))
def _grid_query(lm: npts.LocalMap, mc: npts.MapConfig,
                geo_params: dec.DecoderParams, sdf_scale: float, offsets: jax.Array,
                pts: jax.Array):
    """One padded chunk of SDF + neighbor-count queries (ref utils/mesher.py:41-136)."""
    knn = npts.knn_search(lm, mc, pts, offsets)
    feat, _, w, _ = npts.interpolate_features(lm, mc, pts, knn.lidx)
    sdf, _ = dec.blended_sdf(geo_params, feat, w, mc.weighted_first, sdf_scale)
    return sdf, knn.nn_count


@partial(jax.jit, static_argnames=("mc",))
def _grid_query_color_sem(lm, mc, geo_params, color_params, sem_params,
                          sdf_scale: float, offsets, pts):
    knn = npts.knn_search(lm, mc, pts, offsets)
    geo_feat, color_feat, w, _ = npts.interpolate_features(
        lm, mc, pts, knn.lidx, query_color=color_params is not None)
    color = (dec.blended_head(dec.regress_color, color_params, color_feat, w,
                              mc.weighted_first)
             if color_params is not None else None)
    sem = (jnp.argmax(dec.blended_head(dec.sem_label_prob, sem_params, geo_feat, w,
                                       mc.weighted_first), axis=-1)
           if sem_params is not None else None)
    return color, sem


class Mesher:
    def __init__(self, cfg: MesherConfig, mc: npts.MapConfig, offsets,
                 dp_mesh=None):
        """``dp_mesh``: optional jax.sharding.Mesh — grid-query chunks are
        then sharded over its data axis (map/decoder replicated), so final
        mesh reconstruction scales with the device count (VERDICT r3 next
        #7; ref chunking knob: utils/mesher.py:86-93 infer_bs)."""
        self.cfg = cfg
        self.mc = mc
        self.offsets = offsets
        self._dp_mesh = dp_mesh
        self._dp_queries = {}

    def _dp_query(self, sdf_scale):
        key = float(sdf_scale)
        if key not in self._dp_queries:
            from pin_slam_tpu.parallel import mesh as pmesh

            self._dp_queries[key] = pmesh.make_sharded_query(
                self._dp_mesh, self.mc, self.offsets, key)
        return self._dp_queries[key]

    # ------------------------------------------------------------------
    def query_sdf_grid(self, lm, geo_params, sdf_scale,
                       coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Batched SDF query over arbitrary world coords (host numpy in/out)."""
        n = coords.shape[0]
        B = self.cfg.query_bucket
        sdf_out = np.zeros(n, np.float32)
        nn_out = np.zeros(n, np.int32)
        dpq = self._dp_query(sdf_scale) if self._dp_mesh is not None else None
        for s in range(0, n, B):
            e = min(s + B, n)
            chunk = np.zeros((B, 3), np.float32)
            chunk[: e - s] = coords[s:e]
            if dpq is not None:
                sdf, nn = dpq(lm, geo_params, jnp.asarray(chunk))
            else:
                sdf, nn = _grid_query(lm, self.mc, geo_params, sdf_scale,
                                      self.offsets, jnp.asarray(chunk))
            sdf_out[s:e] = np.asarray(sdf[: e - s])
            nn_out[s:e] = np.asarray(nn[: e - s])
        return sdf_out, nn_out

    def recon_aabb_mesh(self, lm, geo_params, sdf_scale,
                        aabb_min: np.ndarray, aabb_max: np.ndarray,
                        color_params=None, sem_params=None):
        """Reconstruct one AABB (ref utils/mesher.py:420-485).

        Returns (vertices, faces, colors|None, sems|None) in world coordinates.
        """
        res = self.cfg.mc_res_m
        lo = np.floor(aabb_min / res) - self.cfg.pad_voxel
        hi = np.ceil(aabb_max / res) + self.cfg.pad_voxel
        hi[2] -= self.cfg.skip_top_voxel  # (ref utils/mesher.py:163: skip roof artifacts)
        dims = np.maximum((hi - lo).astype(int) + 1, 2)
        ii = np.arange(dims[0]) + lo[0]
        jj = np.arange(dims[1]) + lo[1]
        kk = np.arange(dims[2]) + lo[2]
        grid = np.stack(np.meshgrid(ii, jj, kk, indexing="ij"), axis=-1).reshape(-1, 3) * res
        grid = grid.astype(np.float32)

        sdf, nn = self.query_sdf_grid(lm, geo_params, sdf_scale, grid)
        sdf3 = sdf.reshape(dims)
        mask3 = (nn >= self.cfg.mesh_min_nn).reshape(dims) if self.cfg.mc_mask_on else None

        # NOTE: the decoder predicts positive in free space; flip so "inside
        # object" is negative for the iso-surfacer
        verts, faces = mcubes.marching_tetrahedra(-sdf3, mask3,
                                                  origin=lo * res, spacing=res)
        if verts.shape[0] and self.cfg.min_cluster_vertices > 0:
            verts, faces = mcubes.filter_isolated_vertices(verts, faces,
                                                           self.cfg.min_cluster_vertices)
        colors = sems = None
        if verts.shape[0] and (color_params is not None or sem_params is not None):
            colors, sems = self._paint_vertices(lm, geo_params, color_params,
                                                sem_params, sdf_scale, verts)
        return verts, faces, colors, sems

    def recon_aabb_collections_mesh(self, lm, geo_params, sdf_scale,
                                    aabbs: List[Tuple[np.ndarray, np.ndarray]],
                                    color_params=None, sem_params=None):
        """Chunked reconstruction over a list of AABBs (ref utils/mesher.py:396-418)."""
        all_v, all_f, all_c, all_s = [], [], [], []
        off = 0
        for amin, amax in aabbs:
            v, f, c, s = self.recon_aabb_mesh(lm, geo_params, sdf_scale, amin, amax,
                                              color_params, sem_params)
            if v.shape[0] == 0:
                continue
            all_v.append(v)
            all_f.append(f + off)
            off += v.shape[0]
            if c is not None:
                all_c.append(c)
            if s is not None:
                all_s.append(s)
        if not all_v:
            z = np.zeros((0, 3), np.float32)
            return z, np.zeros((0, 3), np.int64), None, None
        return (np.concatenate(all_v), np.concatenate(all_f),
                np.concatenate(all_c) if all_c else None,
                np.concatenate(all_s) if all_s else None)

    def _paint_vertices(self, lm, geo_params, color_params, sem_params,
                        sdf_scale, verts: np.ndarray):
        """Vertex color/semantic estimation (ref utils/mesher.py:339-365)."""
        n = verts.shape[0]
        B = self.cfg.query_bucket
        colors = np.zeros((n, 3), np.float32) if color_params is not None else None
        sems = np.zeros((n,), np.int32) if sem_params is not None else None
        for s in range(0, n, B):
            e = min(s + B, n)
            chunk = np.zeros((B, 3), np.float32)
            chunk[: e - s] = verts[s:e]
            c, sm = _grid_query_color_sem(lm, self.mc, geo_params, color_params,
                                          sem_params, sdf_scale, self.offsets,
                                          jnp.asarray(chunk))
            if colors is not None and c is not None:
                cc = np.asarray(c[: e - s])
                colors[s:e] = cc if cc.shape[1] == 3 else np.repeat(cc, 3, axis=1)
            if sems is not None and sm is not None:
                sems[s:e] = np.asarray(sm[: e - s])
        return colors, sems

    # ------------------------------------------------------------------
    def sdf_slice(self, lm, geo_params, sdf_scale,
                  center: np.ndarray, extent: float, height: float,
                  res: Optional[float] = None):
        """Horizontal SDF slice point cloud for visualization
        (ref utils/mesher.py:380-394)."""
        res = res or self.cfg.mc_res_m
        xs = np.arange(center[0] - extent, center[0] + extent, res)
        ys = np.arange(center[1] - extent, center[1] + extent, res)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        pts = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, height)], axis=-1).astype(np.float32)
        sdf, nn = self.query_sdf_grid(lm, geo_params, sdf_scale, pts)
        ok = nn >= 1
        return pts[ok], sdf[ok]


def split_chunks(points: np.ndarray, chunk_m: float = 100.0,
                 pad: float = 0.0) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Partition a point cloud's AABB into ~chunk_m-sized sub-AABBs for chunked
    meshing (ref utils/tools.py:480-537)."""
    if points.shape[0] == 0:
        return []
    lo, hi = points.min(0) - pad, points.max(0) + pad
    spans = np.maximum(hi - lo, 1e-6)
    n = np.maximum(np.ceil(spans[:2] / chunk_m).astype(int), 1)
    out = []
    for i in range(n[0]):
        for j in range(n[1]):
            amin = np.array([lo[0] + i * spans[0] / n[0], lo[1] + j * spans[1] / n[1], lo[2]])
            amax = np.array([lo[0] + (i + 1) * spans[0] / n[0],
                             lo[1] + (j + 1) * spans[1] / n[1], hi[2]])
            sel = ((points[:, 0] >= amin[0]) & (points[:, 0] < amax[0])
                   & (points[:, 1] >= amin[1]) & (points[:, 1] < amax[1]))
            if sel.any():
                out.append((amin, amax))
    return out
