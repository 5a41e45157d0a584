"""Along-ray sampling for SDF supervision.

TPU-native equivalent of the reference sampler (reference utils/data_sampler.py:20-192):
per LiDAR ray — 1 exact endpoint + N_surf Gaussian close-to-surface samples +
N_front/N_behind uniform free-space samples, projective-distance SDF labels
(sign-flipped at utils/data_sampler.py:171), distance-based weights whose sign
flags free-space samples.  Differences: statically-shaped (padded rays carry a
valid mask through), and samples are emitted directly in ray-major order
(the reference generates type-major and transposes, :167-181).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    surface_sample_range_m: float = 0.25
    surface_sample_n: int = 3
    free_front_n: int = 2
    free_behind_n: int = 1
    free_sample_begin_ratio: float = 0.3
    free_sample_end_dist_m: float = 1.0
    sigma_base: float = 0.1
    dist_weight_on: bool = True
    dist_weight_scale: float = 0.8
    max_range: float = 60.0
    behind_dropoff_on: bool = False

    @property
    def ray_sample_count(self) -> int:
        return 1 + self.surface_sample_n + self.free_front_n + self.free_behind_n

    @staticmethod
    def from_config(cfg) -> "SamplerConfig":
        return SamplerConfig(
            surface_sample_range_m=cfg.surface_sample_range_m,
            surface_sample_n=cfg.surface_sample_n,
            free_front_n=cfg.free_front_n,
            free_behind_n=cfg.free_behind_n,
            free_sample_begin_ratio=cfg.free_sample_begin_ratio,
            free_sample_end_dist_m=cfg.free_sample_end_dist_m,
            sigma_base=cfg.sigma_sigmoid_m,
            dist_weight_on=cfg.dist_weight_on,
            dist_weight_scale=cfg.dist_weight_scale,
            max_range=cfg.max_range,
            behind_dropoff_on=cfg.behind_dropoff_on,
        )


class SampleBatch(NamedTuple):
    coord: jax.Array        # (N*S, 3) sensor-frame sample positions (ray-major)
    sdf_label: jax.Array    # (N*S,) projective SDF labels (+ in front of surface)
    weight: jax.Array       # (N*S,) |w| = sample weight; sign<0 = free space
    valid: jax.Array        # (N*S,) bool
    sem_label: Optional[jax.Array]    # (N*S,) int32 or None
    color_label: Optional[jax.Array]  # (N*S, C) or None


def sample_rays(key: jax.Array, sc: SamplerConfig, points: jax.Array, valid: jax.Array,
                sem_label: Optional[jax.Array] = None,
                color: Optional[jax.Array] = None) -> SampleBatch:
    """points: (N,3) sensor-frame ray endpoints (padded); valid: (N,)."""
    n = points.shape[0]
    S = sc.ray_sample_count
    dist = jnp.linalg.norm(points, axis=1)                      # (N,)
    safe_dist = jnp.maximum(dist, 1e-6)

    k_surf, k_front, k_behind = jax.random.split(key, 3)
    sigma_ratio = 2.0  # margin keeping free samples out of the surface band (ref :78)

    # Part 0+1: exact endpoint (displacement 0) + Gaussian surface samples
    disp_surf = (jax.random.normal(k_surf, (n, sc.surface_sample_n))
                 * sc.surface_sample_range_m)                   # (N, n_surf)
    disp_surface_block = jnp.concatenate(
        [jnp.zeros((n, 1), points.dtype), disp_surf], axis=1)   # (N, 1+n_surf)
    ratio_surface = disp_surface_block / safe_dist[:, None] + 1.0

    # Part 2: free space in front (ref :79-87)
    free_max_ratio = 1.0 - sigma_ratio * sc.surface_sample_range_m / safe_dist[:, None]
    u_front = jax.random.uniform(k_front, (n, sc.free_front_n))
    ratio_front = (u_front * (free_max_ratio - sc.free_sample_begin_ratio)
                   + sc.free_sample_begin_ratio)
    disp_front = (ratio_front - 1.0) * safe_dist[:, None]

    # Part 3: free space behind (ref :89-101)
    behind_min = 1.0 + sigma_ratio * sc.surface_sample_range_m / safe_dist[:, None]
    behind_max = sc.free_sample_end_dist_m / safe_dist[:, None] + 1.0
    u_behind = jax.random.uniform(k_behind, (n, sc.free_behind_n))
    ratio_behind = u_behind * (behind_max - behind_min) + behind_min
    disp_behind = (ratio_behind - 1.0) * safe_dist[:, None]

    ratio = jnp.concatenate([ratio_surface, ratio_front, ratio_behind], axis=1)  # (N,S)
    disp = jnp.concatenate([disp_surface_block, disp_front, disp_behind], axis=1)

    coord = points[:, None, :] * ratio[:, :, None]              # (N,S,3)

    # weights (ref :123-143): surface part gets the distance weight, free space
    # weight 1; sign flipped negative on free-space samples
    weight = jnp.ones((n, S), points.dtype)
    if sc.dist_weight_on:
        w_dist = (1.0 + sc.dist_weight_scale * 0.5
                  - (dist / sc.max_range) * sc.dist_weight_scale)  # [0.6, 1.4]
        n_surf_tot = 1 + sc.surface_sample_n
        weight = weight.at[:, :n_surf_tot].set(w_dist[:, None])
    if sc.behind_dropoff_on:
        dropoff_min = 0.2 * sc.free_sample_end_dist_m
        dropoff_max = sc.free_sample_end_dist_m
        dw = jnp.clip((dropoff_max - disp) / (dropoff_max - dropoff_min), 0.0, 1.0)
        weight = weight * (dw * 0.8 + 0.2)
    n_surf_tot = 1 + sc.surface_sample_n
    free_flag = jnp.arange(S) >= n_surf_tot
    weight = jnp.where(free_flag[None, :], -weight, weight)

    # labels: projective distance, sign convention of ref :148-151,171
    sdf_label = -disp

    valid_out = jnp.broadcast_to(valid[:, None], (n, S))

    sem_out = None
    if sem_label is not None:
        sem_out = jnp.where(jnp.arange(S)[None, :] < n_surf_tot,
                            sem_label[:, None], 0).astype(jnp.int32)
        sem_out = sem_out.reshape(-1)
    color_out = None
    if color is not None:
        c = jnp.where((jnp.arange(S) < n_surf_tot)[None, :, None],
                      color[:, None, :], 0.0)
        color_out = c.reshape(n * S, -1)

    return SampleBatch(
        coord=coord.reshape(n * S, 3),
        sdf_label=sdf_label.reshape(-1),
        weight=weight.reshape(-1),
        valid=valid_out.reshape(-1),
        sem_label=sem_out,
        color_label=color_out,
    )
