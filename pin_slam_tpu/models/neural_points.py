"""Neural point map: fixed-capacity SoA point buffer + spatial voxel hash + kNN
feature interpolation — the TPU-native re-design of the reference's map core
(reference model/neural_points.py:18-703).

Design deltas vs the reference (SURVEY.md section 7.0):

* The reference grows tensors with torch.cat each frame and boolean-masks local
  views (model/neural_points.py:248-268).  XLA requires static shapes, so here
  the global map is a pre-allocated ``(capacity+1)``-row structure-of-arrays with
  an active ``count``; row ``capacity`` is the *sentinel/padding row* (mirroring
  the reference's -1 padding-row trick, model/neural_points.py:78,259-265) and
  every invalid index points at it.  Inserts are masked scatters at
  ``count + cumsum(mask)`` offsets; the local map is a fixed-size gathered slice.
* All hash/gather/top-k/IDW math is fused into jitted functions over
  ``[B, K]``-shaped tensors; indices are int32 (no fast int64 on TPU); the hash
  multiply-accumulate wraps in uint32 (see ops/hash3d.py).
* Everything is functional: map mutation returns a new ``MapState`` pytree; the
  certainty scatter-add of the reference (model/neural_points.py:640-648)
  becomes a functional ``.at[].add``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash
from pin_slam_tpu.ops.transforms import apply_quaternion_rotation, quat_multiply
from pin_slam_tpu.ops.voxel import voxel_down_sample_mask, voxel_down_sample_min_value_mask

# far-away sentinel position: any query within the map is > max_valid_dist2 from it
_SENTINEL_POS = 1e8
_INVALID_DIST2 = 9e3  # matches reference model/neural_points.py:561


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Static (hashable) map geometry parameters, closed over by jitted fns."""

    capacity: int                 # max global neural points
    local_capacity: int           # max local-map neural points
    hash_size: int                # voxel hash table slots
    voxel_size: float
    feature_dim: int
    color_on: bool
    nn_k: int                     # k nearest neighbors used for interpolation
    max_valid_dist2: float        # 3*((num_nei_cells+1)*voxel)^2, ref :457
    local_map_radius: float
    travel_dist_window: float     # local_map_radius * local_map_travel_dist_ratio
    feature_std: float = 0.0
    idw_eps: float = 1e-15
    use_mid_ts: bool = False
    layer_norm_on: bool = False
    weighted_first: bool = True   # True: blend features then decode once;
    #                               False: decode each neighbor, blend SDFs
    #                               (ref utils/config.py:89, neural_points.py:660-665)
    local_hash_size: int = 1 << 22  # slots of the per-frame packed local hash

    @staticmethod
    def from_config(cfg) -> "MapConfig":
        return MapConfig(
            capacity=cfg.map_capacity,
            local_capacity=cfg.local_map_capacity,
            hash_size=cfg.buffer_size,
            voxel_size=cfg.voxel_size_m,
            feature_dim=cfg.feature_dim,
            color_on=cfg.color_on,
            nn_k=cfg.query_nn_k,
            max_valid_dist2=cfg.max_valid_dist2,
            local_map_radius=cfg.local_map_radius,
            travel_dist_window=cfg.diff_travel_dist_local,
            feature_std=cfg.feature_std,
            use_mid_ts=cfg.use_mid_ts,
            layer_norm_on=cfg.layer_norm_on,
            weighted_first=cfg.weighted_first,
            local_hash_size=max(1 << 20, 1 << (int(cfg.local_map_capacity) - 1).bit_length() + 4),
        )


def neighbor_offsets(num_nei_cells: int, search_alpha: float) -> np.ndarray:
    """Sphere-clipped integer offset template (ref model/neural_points.py:430-453).

    K = 81 for (2, 0.5); K = 33 for (2, 0.2); K = 1 for (1, 0.0).
    """
    r = np.arange(-num_nei_cells, num_nei_cells + 1)
    dx = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    keep = (dx**2).sum(-1) < (num_nei_cells + search_alpha) ** 2
    return dx[keep].astype(np.int32)


class MapState(NamedTuple):
    """Global neural point map (SoA, capacity+1 rows, last row = sentinel)."""

    positions: jax.Array       # (cap+1, 3) f32, sentinel at 1e8
    orientations: jax.Array    # (cap+1, 4) f32 wxyz
    geo_features: jax.Array    # (cap+1, F) f32
    color_features: Optional[jax.Array]  # (cap+1, F) or None
    ts_create: jax.Array       # (cap+1,) i32
    ts_update: jax.Array       # (cap+1,) i32
    certainties: jax.Array     # (cap+1,) f32
    count: jax.Array           # () i32
    hash_table: jax.Array      # (H+1,) i32; value `cap` = empty; slot H = dump


class LocalMap(NamedTuple):
    """Fixed-size trainable window of the map (ref model/neural_points.py:272-313).

    All per-point arrays have ``local_capacity+1`` rows; row L is the sentinel.

    TPU layout notes: random row-gathers are the hot-path cost (~3 ms per 540k
    rows on v5e), so everything a kNN probe needs is packed into ONE 16-byte
    row of ``hash_rows`` (position + local index), and everything interpolation
    needs beyond the trainable features into one 32-byte row of ``pose_rows``
    (position, quaternion, certainty snapshot).  This replaces the reference's
    five separate gathers per probe (model/neural_points.py:476-499,555-616).
    """

    indices: jax.Array         # (L+1,) i32 local->global, pad = cap
    positions: jax.Array       # (L+1, 3)
    orientations: jax.Array    # (L+1, 4)
    geo_features: jax.Array    # (L+1, F) — the trainable tensor
    color_features: Optional[jax.Array]
    certainties: jax.Array     # (L+1,)
    ts_update: jax.Array       # (L+1,) i32
    count: jax.Array           # () i32
    global2local: jax.Array    # (cap+1,) i32 -> [0,L], sentinel L
    origin: jax.Array          # (3,) f32 sensor position at (re)build time
    hash_rows: jax.Array       # (H_l+1, 4) f32: [x, y, z, bitcast(local idx)]
    pose_rows: jax.Array       # (L+1, 8) f32: [x, y, z, qw, qx, qy, qz, certainty]


# ----------------------------------------------------------------------
# construction
# ----------------------------------------------------------------------


def init_map_state(mc: MapConfig) -> MapState:
    cap, F = mc.capacity, mc.feature_dim
    return MapState(
        positions=jnp.full((cap + 1, 3), _SENTINEL_POS, dtype=jnp.float32),
        orientations=jnp.zeros((cap + 1, 4), dtype=jnp.float32).at[:, 0].set(1.0),
        geo_features=jnp.zeros((cap + 1, F), dtype=jnp.float32),
        color_features=jnp.zeros((cap + 1, F), dtype=jnp.float32) if mc.color_on else None,
        ts_create=jnp.zeros((cap + 1,), dtype=jnp.int32),
        ts_update=jnp.zeros((cap + 1,), dtype=jnp.int32),
        certainties=jnp.zeros((cap + 1,), dtype=jnp.float32),
        count=jnp.zeros((), dtype=jnp.int32),
        hash_table=jnp.full((mc.hash_size + 1,), cap, dtype=jnp.int32),
    )


def _pack_hash_rows(mc: MapConfig, positions: jax.Array, count: jax.Array) -> jax.Array:
    """Build the packed per-frame local hash: slot -> [x, y, z, bitcast(lidx)]."""
    L, Hl = mc.local_capacity, mc.local_hash_size
    lidx = jnp.arange(L + 1, dtype=jnp.int32)
    active = lidx < count
    h = spatial_hash(grid_coords(positions, mc.voxel_size), Hl)
    slot = jnp.where(active, h, Hl)                      # pads go to the dump slot
    # the index payload is VALUE-cast to f32 (exact for < 2^24), NOT bitcast:
    # int32 bit patterns of small indices are denormal floats and TPUs flush
    # denormals to zero anywhere the value crosses the VPU — a bitcast payload
    # silently reads back as index 0 on real hardware (CPU preserves the bits,
    # which is exactly the kind of bug fake-device tests cannot catch)
    rows = jnp.concatenate([positions, lidx.astype(jnp.float32)[:, None]], axis=1)
    sentinel_row = jnp.concatenate(
        [jnp.full((3,), _SENTINEL_POS, jnp.float32),
         jnp.asarray([L], jnp.float32)])
    table = jnp.broadcast_to(sentinel_row, (Hl + 1, 4))
    return table.at[slot].set(rows)


def _pack_pose_rows(positions: jax.Array, orientations: jax.Array,
                    certainties: jax.Array) -> jax.Array:
    return jnp.concatenate([positions, orientations, certainties[:, None]], axis=1)


def init_local_map(mc: MapConfig) -> LocalMap:
    L, F = mc.local_capacity, mc.feature_dim
    positions = jnp.full((L + 1, 3), _SENTINEL_POS, dtype=jnp.float32)
    orientations = jnp.zeros((L + 1, 4), dtype=jnp.float32).at[:, 0].set(1.0)
    certainties = jnp.zeros((L + 1,), dtype=jnp.float32)
    count = jnp.zeros((), dtype=jnp.int32)
    return LocalMap(
        indices=jnp.full((L + 1,), mc.capacity, dtype=jnp.int32),
        positions=positions,
        orientations=orientations,
        geo_features=jnp.zeros((L + 1, F), dtype=jnp.float32),
        color_features=jnp.zeros((L + 1, F), dtype=jnp.float32) if mc.color_on else None,
        certainties=certainties,
        ts_update=jnp.zeros((L + 1,), dtype=jnp.int32),
        count=count,
        global2local=jnp.full((mc.capacity + 1,), L, dtype=jnp.int32),
        origin=jnp.zeros((3,), dtype=jnp.float32),
        hash_rows=_pack_hash_rows(mc, positions, count),
        pose_rows=_pack_pose_rows(positions, orientations, certainties),
    )


# ----------------------------------------------------------------------
# map update (insert)
# ----------------------------------------------------------------------


def map_insert(state: MapState, mc: MapConfig, points: jax.Array, valid: jax.Array,
               cur_ts: jax.Array, travel_dist: jax.Array,
               rng: Optional[jax.Array] = None,
               downsample_table_size: int = 1 << 20) -> MapState:
    """Insert new observations (ref model/neural_points.py:205-270 ``update``).

    points: (M,3) world-frame candidate points (padded); valid: (M,) bool.
    Pipeline: voxel-downsample (closest-to-center) -> hash -> keep points whose
    voxel slot is empty / collided (>sqrt(3)*voxel away) / stale (travel-dist
    window exceeded) -> masked scatter-append at ``count + cumsum``.
    """
    cap = mc.capacity

    keep = voxel_down_sample_mask(points, valid, mc.voxel_size, downsample_table_size)

    grid = grid_coords(points, mc.voxel_size)
    h = spatial_hash(grid, mc.hash_size)
    existing = state.hash_table[h]                       # (M,) global idx, cap = empty
    vec = state.positions[existing] - points
    dist2 = jnp.sum(vec * vec, axis=-1)
    delta_travel = travel_dist[cur_ts] - travel_dist[state.ts_update[existing]]
    is_empty = existing == cap
    update_mask = keep & (
        is_empty
        | (dist2 > 3.0 * mc.voxel_size**2)
        | (delta_travel > mc.travel_dist_window)
    )

    # allocate rows: count + prefix-sum over the mask; overflow rows are dropped
    offs = jnp.cumsum(update_mask.astype(jnp.int32)) - 1
    new_idx = state.count + offs
    update_mask = update_mask & (new_idx < cap)
    write_idx = jnp.where(update_mask, new_idx, cap)     # drops go to sentinel row

    n_f = mc.feature_dim
    if mc.feature_std > 0 and rng is not None:
        new_feats = mc.feature_std * jax.random.normal(rng, (points.shape[0], n_f), dtype=jnp.float32)
    else:
        new_feats = jnp.zeros((points.shape[0], n_f), dtype=jnp.float32)

    identity_q = jnp.zeros((points.shape[0], 4), jnp.float32).at[:, 0].set(1.0)
    ts_fill = jnp.full((points.shape[0],), 1, jnp.int32) * cur_ts

    positions = state.positions.at[write_idx].set(points.astype(jnp.float32))
    orientations = state.orientations.at[write_idx].set(identity_q)
    geo_features = state.geo_features.at[write_idx].set(new_feats)
    color_features = (state.color_features.at[write_idx].set(new_feats)
                      if state.color_features is not None else None)
    ts_create = state.ts_create.at[write_idx].set(ts_fill)
    ts_update = state.ts_update.at[write_idx].set(ts_fill)
    certainties = state.certainties.at[write_idx].set(0.0)

    # restore the sentinel row (dropped/padded writes land there)
    positions = positions.at[cap].set(_SENTINEL_POS)
    orientations = orientations.at[cap].set(jnp.array([1.0, 0, 0, 0], jnp.float32))
    geo_features = geo_features.at[cap].set(0.0)
    if color_features is not None:
        color_features = color_features.at[cap].set(0.0)
    ts_create = ts_create.at[cap].set(0)
    ts_update = ts_update.at[cap].set(0)
    certainties = certainties.at[cap].set(0.0)

    # point the hash slots at the new rows (only for inserted points)
    slot = jnp.where(update_mask, h, mc.hash_size)       # dump slot for the rest
    hash_table = state.hash_table.at[slot].set(write_idx)

    new_count = jnp.minimum(state.count + jnp.sum(update_mask, dtype=jnp.int32), cap)

    return MapState(positions, orientations, geo_features, color_features,
                    ts_create, ts_update, certainties, new_count, hash_table)


# ----------------------------------------------------------------------
# local map
# ----------------------------------------------------------------------


def build_local_map(state: MapState, mc: MapConfig, origin: jax.Array,
                    cur_ts: jax.Array, travel_dist: jax.Array) -> LocalMap:
    """Select points within radius AND travel-dist window into a fixed-size
    trainable slice (ref model/neural_points.py:272-313 ``reset_local_map``)."""
    cap, L = mc.capacity, mc.local_capacity

    vec = state.positions[:cap] - origin
    dist2 = jnp.sum(vec * vec, axis=-1)
    if mc.use_mid_ts:
        ts_used = (state.ts_create[:cap] + state.ts_update[:cap]) // 2
    else:
        ts_used = state.ts_create[:cap]
    delta_travel = jnp.abs(travel_dist[cur_ts] - travel_dist[ts_used])
    active = jnp.arange(cap, dtype=jnp.int32) < state.count
    mask = active & (dist2 < mc.local_map_radius**2) & (delta_travel < mc.travel_dist_window)

    idx = jnp.nonzero(mask, size=L, fill_value=cap)[0].astype(jnp.int32)
    count = jnp.sum(mask, dtype=jnp.int32)
    # if the window overflows L we silently keep the first L (lowest indices =
    # oldest points); count saturates so downstream treats it as full
    count = jnp.minimum(count, L)

    idx_pad = jnp.concatenate([idx, jnp.array([cap], jnp.int32)])

    positions = state.positions[idx_pad]
    orientations = state.orientations[idx_pad]
    geo_features = state.geo_features[idx_pad]
    color_features = state.color_features[idx_pad] if state.color_features is not None else None
    certainties = state.certainties[idx_pad].at[L].set(0.0)
    ts_update = state.ts_update[idx_pad].at[L].set(0)

    global2local = jnp.full((cap + 1,), L, dtype=jnp.int32)
    global2local = global2local.at[idx].set(jnp.arange(L, dtype=jnp.int32), mode="drop")
    global2local = global2local.at[cap].set(L)

    return LocalMap(indices=idx_pad, positions=positions, orientations=orientations,
                    geo_features=geo_features, color_features=color_features,
                    certainties=certainties, ts_update=ts_update, count=count,
                    global2local=global2local, origin=origin.astype(jnp.float32),
                    hash_rows=_pack_hash_rows(mc, positions, count),
                    pose_rows=_pack_pose_rows(positions, orientations, certainties))


def assign_local_to_global(state: MapState, lm: LocalMap, mc: MapConfig) -> MapState:
    """Write trained local features/certainties/ts back into the global map
    (ref model/neural_points.py:315-324)."""
    cap = mc.capacity
    geo_features = state.geo_features.at[lm.indices].set(lm.geo_features)
    geo_features = geo_features.at[cap].set(0.0)
    certainties = state.certainties.at[lm.indices].set(lm.certainties)
    certainties = certainties.at[cap].set(0.0)
    ts_update = state.ts_update.at[lm.indices].set(lm.ts_update)
    ts_update = ts_update.at[cap].set(0)
    color_features = state.color_features
    if color_features is not None and lm.color_features is not None:
        color_features = color_features.at[lm.indices].set(lm.color_features).at[cap].set(0.0)
    return state._replace(geo_features=geo_features, certainties=certainties,
                          ts_update=ts_update, color_features=color_features)


# ----------------------------------------------------------------------
# query: hash-probe -> kNN -> IDW interpolation
# ----------------------------------------------------------------------


class KnnResult(NamedTuple):
    lidx: jax.Array       # (B, k) local indices, sentinel = L
    nn_count: jax.Array   # (B,) valid neighbors BEFORE top-k (can exceed k)


def knn_search(lm: LocalMap, mc: MapConfig, points: jax.Array,
               offsets: jax.Array) -> KnnResult:
    """Voxel-hash neighborhood probe + top-k by distance
    (ref model/neural_points.py:459-509 ``radius_neighborhood_search`` +
    :555-565 sort/top-k).  Non-differentiable (pure indexing).

    TPU-first: ONE packed row-gather from ``lm.hash_rows`` yields neighbor
    position + local index together; the reference's separate hash-table /
    position / timestamp / travel-dist / global2local gathers
    (model/neural_points.py:476-499) collapse into it.  The travel-dist
    time filter is inherent: the local map is built time-windowed
    (build_local_map), so every row in the table already satisfies it.

    points: (B,3); offsets: (K,3) int32 template.
    Returns local indices into ``lm`` arrays (sentinel = local_capacity).
    """
    L = mc.local_capacity

    grid = grid_coords(points, mc.voxel_size)                  # (B,3)
    cells = grid[:, None, :] + offsets[None, :, :]             # (B,K,3)
    h = spatial_hash(cells, mc.local_hash_size)                # (B,K)
    rows = lm.hash_rows[h]                                     # (B,K,4) one gather
    nbr = rows[..., :3]
    lidx = rows[..., 3].astype(jnp.int32)   # value-cast payload (see _pack_hash_rows)

    d = nbr - points[:, None, :]
    dist2 = jnp.sum(d * d, axis=-1)                            # (B,K)
    valid = (lidx < L) & (dist2 <= mc.max_valid_dist2)         # collision filter
    lidx = jnp.where(valid, lidx, L)
    nn_count = jnp.sum(valid, axis=-1, dtype=jnp.int32)

    dist2 = jnp.where(valid, dist2, _INVALID_DIST2)
    k = min(mc.nn_k, offsets.shape[0])
    _, sel = jax.lax.top_k(-dist2, k)                          # k smallest distances
    knn_lidx = jnp.take_along_axis(lidx, sel, axis=1)
    return KnnResult(lidx=knn_lidx, nn_count=nn_count)


def interpolate_features(lm: LocalMap, mc: MapConfig, points: jax.Array,
                         knn_lidx: jax.Array, after_pgo: bool = False,
                         query_color: bool = False):
    """IDW feature interpolation at the k selected neighbors — the differentiable
    half of ``query_feature`` (ref model/neural_points.py:574-665).

    Gradients flow into ``lm.geo_features`` (mapping) and ``points`` (tracking):
    both the neighbor offset vectors and the IDW weights are recomputed here from
    ``points`` so jax.grad sees the full dependency, exactly as the reference's
    autograd graph does.

    Returns (geo_feat [B,F+3], color_feat or None, weights [B,k], certainty [B]).
    """
    L = mc.local_capacity
    valid = knn_lidx < L                                        # (B,k)
    safe_idx = jnp.where(valid, knn_lidx, L)

    pose = lm.pose_rows[safe_idx]                               # (B,k,8) one gather
    nbr_pos = pose[..., :3]
    quat = pose[..., 3:7]
    cert = pose[..., 7]
    vec = points[:, None, :] - nbr_pos
    dist2 = jnp.sum(vec * vec, axis=-1)                         # (B,k) differentiable
    dist2 = jnp.where(valid, dist2, _INVALID_DIST2)

    # after_pgo may be a traced bool: rotate the offset vector into each neural
    # point's frame (ref model/neural_points.py:606-607) and select
    vec_rot = apply_quaternion_rotation(quat, vec)
    vec = jnp.where(jnp.asarray(after_pgo), vec_rot, vec)
    vec = jnp.where(valid[..., None], vec, 0.0)

    feats = lm.geo_features[safe_idx]                           # (B,k,F)
    feats = jnp.where(valid[..., None], feats, 0.0)
    if mc.layer_norm_on:
        mu = jnp.mean(feats, axis=-1, keepdims=True)
        sig = jnp.std(feats, axis=-1, keepdims=True) + 1e-6
        feats = (feats - mu) / sig

    eps = mc.idw_eps
    w = 1.0 / (dist2 + eps)                                     # IDW, ref :618
    w = jnp.where(valid, w, 0.0)
    nn_any = jnp.any(valid, axis=-1, keepdims=True)
    w = jnp.where(nn_any, w, eps)                               # all-invalid row: avoid 0/0
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(valid, w, 0.0)

    geo_vec = jnp.concatenate([feats, vec], axis=-1)            # (B,k,F+3)
    if mc.weighted_first:
        geo_out = jnp.sum(geo_vec * w[..., None], axis=1)       # (B,F+3)
    else:
        geo_out = geo_vec                                       # per-neighbor (B,k,F+3)

    color_out = None
    if query_color and lm.color_features is not None:
        cfeats = jnp.where(valid[..., None], lm.color_features[safe_idx], 0.0)
        color_vec = jnp.concatenate([cfeats, vec], axis=-1)
        color_out = (jnp.sum(color_vec * w[..., None], axis=1)
                     if mc.weighted_first else color_vec)

    # certainty snapshot from the packed row (within-frame staleness during
    # training is harmless: the live accumulator is lm.certainties)
    cert = jnp.where(valid, cert, 0.0)
    certainty_q = jnp.sum(cert * w, axis=-1)

    return geo_out, color_out, w, certainty_q


def accumulate_certainty(lm: LocalMap, mc: MapConfig, knn_lidx: jax.Array,
                         weights: jax.Array, query_ts: Optional[jax.Array] = None) -> LocalMap:
    """Training-mode bookkeeping: scatter-add IDW weights into per-point
    certainty, scatter-max the query timestamp into ts_update
    (ref model/neural_points.py:634-652)."""
    L = mc.local_capacity
    valid = knn_lidx < L
    idx = jnp.where(valid, knn_lidx, L)
    certainties = lm.certainties.at[idx.reshape(-1)].add(
        jnp.where(valid, weights, 0.0).reshape(-1)).at[L].set(0.0)
    ts_update = lm.ts_update
    if query_ts is not None:
        ts_b = jnp.broadcast_to(query_ts[:, None], idx.shape)
        ts_update = ts_update.at[idx.reshape(-1)].max(
            jnp.where(valid, ts_b, 0).reshape(-1)).at[L].set(0)
    return lm._replace(certainties=certainties, ts_update=ts_update)


def query_certainty(lm: LocalMap, mc: MapConfig, points: jax.Array) -> jax.Array:
    """Max neighbor certainty in the query's own voxel
    (ref model/neural_points.py:511-525; the reference narrows the search
    template to the center cell only, utils/mapper.py:297-303)."""
    center = np.zeros((1, 3), dtype=np.int32)
    res = knn_search(lm, mc, points, jnp.asarray(center))
    valid = res.lidx < mc.local_capacity
    cert = jnp.where(valid, lm.certainties[jnp.where(valid, res.lidx, mc.local_capacity)], 0.0)
    return jnp.max(cert, axis=-1)


# ----------------------------------------------------------------------
# map maintenance: deformation after PGO, rehash, prune
# ----------------------------------------------------------------------


def adjust_map(state: MapState, mc: MapConfig, pose_diff: jax.Array) -> MapState:
    """Elastic map deformation after PGO: move every neural point by the pose
    correction of its (mid-)timestamp and compose its quaternion
    (ref model/neural_points.py:355-370).

    pose_diff: (T,4,4) f32 per-frame old->new pose correction.
    """
    cap = mc.capacity
    if mc.use_mid_ts:
        ts_used = (state.ts_create + state.ts_update) // 2
    else:
        ts_used = state.ts_create
    T = pose_diff[ts_used]                                      # (cap+1,4,4)
    R, t = T[:, :3, :3], T[:, :3, 3]
    positions = jnp.einsum("nij,nj->ni", R, state.positions) + t
    positions = positions.at[cap].set(_SENTINEL_POS)

    from pin_slam_tpu.ops.transforms import rotmat_to_quat  # local import avoids cycle
    dq = rotmat_to_quat(R)
    orientations = quat_multiply(dq, state.orientations)
    orientations = orientations.at[cap].set(jnp.array([1.0, 0, 0, 0], jnp.float32))
    return state._replace(positions=positions, orientations=orientations)


def recreate_hash(state: MapState, mc: MapConfig, cur_ts: jax.Array,
                  downsample_table_size: int = 1 << 21) -> MapState:
    """Rebuild the voxel hash from current point positions, preferring (per
    voxel) the point whose timestamp is closest to now
    (ref model/neural_points.py:372-428, kept_points=True path)."""
    cap = mc.capacity
    active = jnp.arange(cap + 1, dtype=jnp.int32) < state.count
    if mc.use_mid_ts:
        ts_used = (state.ts_create + state.ts_update) // 2
    else:
        ts_used = state.ts_create
    ts_diff = jnp.abs(ts_used - cur_ts).astype(jnp.float32)
    keep = voxel_down_sample_min_value_mask(state.positions, active, mc.voxel_size,
                                            ts_diff, downsample_table_size)
    h = spatial_hash(grid_coords(state.positions, mc.voxel_size), mc.hash_size)
    slot = jnp.where(keep, h, mc.hash_size)
    hash_table = jnp.full((mc.hash_size + 1,), cap, dtype=jnp.int32)
    idx = jnp.arange(cap + 1, dtype=jnp.int32)
    hash_table = hash_table.at[slot].set(jnp.where(keep, idx, cap))
    return state._replace(hash_table=hash_table)


def prune_map(state: MapState, mc: MapConfig, travel_dist: jax.Array, cur_ts: jax.Array,
              prune_certainty_thre: float) -> MapState:
    """Deactivate inactive low-certainty points (ref model/neural_points.py:329-353).

    TPU variant: instead of compacting the arrays (dynamic shapes), pruned rows
    are tombstoned — moved to the sentinel position so no query can ever reach
    them; their rows are NOT reclaimed (capacity is the budget).
    """
    cap = mc.capacity
    active = jnp.arange(cap + 1, dtype=jnp.int32) < state.count
    diff_travel = jnp.abs(travel_dist[cur_ts] - travel_dist[state.ts_update])
    inactive = diff_travel > mc.travel_dist_window
    prune = active & inactive & (state.certainties < prune_certainty_thre)
    positions = jnp.where(prune[:, None], _SENTINEL_POS, state.positions)
    return state._replace(positions=positions)
