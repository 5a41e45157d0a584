"""City-scale spatial map sharding: the neural-point buffer + voxel hash
sharded over a device-mesh axis, queries sharded over another.

The reference holds the whole map (point SoA + 5e7-slot hash) in one device's
memory (reference model/neural_points.py:73-93) — its only scaling levers are
the local-map window and pruning (SURVEY.md section 5.7).  This module is the
TPU-native scale-out that SURVEY.md section 2.4 item 2 calls for: pooled HBM
across chips for maps larger than one chip, with ICI collectives placed by us
via ``shard_map`` (the "How to Scale Your Model" recipe).

Design
======
Mesh ``("data", "map")``:

* **Ownership**: every voxel is owned by exactly one map shard,
  ``shard = hash_owner(voxel) mod S`` with primes decorrelated from the slot
  hash, so ownership and table position are independent.
* **Insert** is communication-free: every device sees the (replicated) frame
  candidates and masks them to its owned voxels before the ordinary
  ``map_insert``; per-voxel dedup within a shard equals global per-voxel dedup
  restricted to that shard.
* **Query** gathers *candidates, not the map*: each shard probes its own hash
  for the K neighbor cells, keeps its local top-k, and contributes a packed
  payload row per candidate (position, quaternion, certainty, features).  One
  ``all_gather`` of ``k`` payload rows per shard per query crosses the map
  axis (k*(F+9) floats — tiny vs re-sharding queries or maps); the exact
  global top-k and the IDW/decoder math run locally.  Numerics match the
  single-device query bit-for-bit up to hash-collision sets and top-k ties.
* **Training**: the per-shard global feature tensors are the trainables; the
  differentiable path runs through the payload ``all_gather``, whose transpose
  (``psum_scatter``) automatically reduces feature cotangents back onto the
  owning shard, and the batch ("data") axis transpose psums the decoder
  gradients — both placed by shard_map AD, riding ICI.

The single-host data-parallel path (map replicated) lives in
``pin_slam_tpu/parallel/mesh.py``; this module is the map-memory scale-out.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.models.neural_points import (
    ATTR_DIM, C_CERT, C_POS, C_QUAT, C_TRC, _INVALID_DIST2, _SENTINEL_POS,
    MapConfig, MapState,
)
from pin_slam_tpu.ops import losses
from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash

DATA_AXIS = "data"
MAP_AXIS = "map"

# ownership hash primes — decorrelated from ops.hash3d.PRIMES so that the
# shard id and the in-table slot of a voxel are independent
_OWNER_PRIMES = (2654435761, 805459861, 3674653429)


def shard_of(grid: jax.Array, n_shards: int) -> jax.Array:
    """Owning map-shard of each voxel. grid: int32 [...,3] -> int32 [...]"""
    g = grid.astype(jnp.uint32)
    h = (g[..., 0] * jnp.uint32(_OWNER_PRIMES[0])
         + g[..., 1] * jnp.uint32(_OWNER_PRIMES[1])
         + g[..., 2] * jnp.uint32(_OWNER_PRIMES[2]))
    return (h % jnp.uint32(n_shards)).astype(jnp.int32)


def make_mesh2d(n_data: int, n_map: int) -> Mesh:
    devs = jax.devices()
    need = n_data * n_map
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_data, n_map)
    return Mesh(grid, (DATA_AXIS, MAP_AXIS))


def shard_config(mc: MapConfig, n_map: int) -> MapConfig:
    """Per-shard MapConfig: capacity and hash table split across shards."""
    return dataclasses.replace(
        mc,
        capacity=max(1, mc.capacity // n_map),
        hash_size=max(2, mc.hash_size // n_map),
    )


def _map_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(MAP_AXIS))


def _data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_sharded_map(mesh: Mesh, smc: MapConfig) -> MapState:
    """Stacked per-shard MapState: every array gains a leading shard axis
    sharded over MAP_AXIS (and replicated over DATA_AXIS)."""

    @partial(shard_map, mesh=mesh, in_specs=(), out_specs=P(MAP_AXIS))
    def _init():
        s = npts.init_map_state(smc)
        return jax.tree.map(lambda x: x[None], s)

    return jax.jit(_init)()


def put_replicated(mesh: Mesh, tree):
    sh = _replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def put_data_sharded(mesh: Mesh, tree):
    sh = _data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def make_sharded_insert(mesh: Mesh, smc: MapConfig,
                        downsample_table_size: int = 1 << 20):
    """insert(sstate, points, valid, cur_ts, travel_dist) -> sstate.

    points (M,3) / valid (M,) are replicated; each shard masks to its owned
    voxels and runs the ordinary map_insert — zero communication.
    """
    n_map = mesh.shape[MAP_AXIS]

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(MAP_AXIS), P(), P(), P(), P()),
             out_specs=P(MAP_AXIS))
    def insert(sstate, points, valid, cur_ts, travel_dist):
        state = jax.tree.map(lambda x: x[0], sstate)
        own = shard_of(grid_coords(points, smc.voxel_size), n_map) \
            == jax.lax.axis_index(MAP_AXIS)
        new = npts.map_insert(state, smc, points, valid & own, cur_ts,
                              travel_dist,
                              downsample_table_size=downsample_table_size)
        return jax.tree.map(lambda x: x[None], new)

    return insert


# payload row layout per candidate: [pos(3), quat(4), cert(1), feat(F)]
def _payload_dim(smc: MapConfig) -> int:
    return 8 + smc.feature_dim


def _local_candidates(state: MapState, smc: MapConfig, points: jax.Array,
                      offsets: jax.Array, travel_now: jax.Array):
    """Per-shard hash probe + local top-k.  Returns (payload (B,k,8+F),
    dist2 (B,k), valid (B,k), nn_count (B,)).

    Mirrors the single-device knn_search + feature gather
    (models/neural_points.py) but probes the shard's GLOBAL hash table
    directly (no local-map indirection — pooled HBM makes the trainable
    window unnecessary) and applies the reference's travel-dist neighbor
    filter in-query (reference model/neural_points.py:480-488).
    """
    cap = smc.capacity
    grid = grid_coords(points, smc.voxel_size)                  # (B,3)
    cells = grid[:, None, :] + offsets[None, :, :]              # (B,K,3)
    h = spatial_hash(cells, smc.hash_size)                      # (B,K)
    gidx = state.hash_table[h]                                  # (B,K) cap = empty
    rows = state.attr_rows[gidx]                                # (B,K,16) one gather
    nbr = rows[..., C_POS]
    d = nbr - points[:, None, :]
    dist2 = jnp.sum(d * d, axis=-1)
    in_window = jnp.abs(travel_now - rows[..., C_TRC]) < smc.travel_dist_window
    valid = (gidx < cap) & (dist2 <= smc.max_valid_dist2) & in_window
    dist2 = jnp.where(valid, dist2, _INVALID_DIST2)
    nn_count = jnp.sum(valid, axis=-1, dtype=jnp.int32)

    k = min(smc.nn_k, offsets.shape[0])
    _, sel = jax.lax.top_k(-dist2, k)                           # k smallest
    kidx = jnp.take_along_axis(gidx, sel, axis=1)               # (B,k)
    kvalid = jnp.take_along_axis(valid, sel, axis=1)
    kdist2 = jnp.take_along_axis(dist2, sel, axis=1)
    safe = jnp.where(kvalid, kidx, cap)

    krows = state.attr_rows[safe]                               # (B,k,16)
    feats = state.geo_features[safe]                            # (B,k,F)
    payload = jnp.concatenate(
        [krows[..., :8], jnp.where(kvalid[..., None], feats, 0.0)], axis=-1)
    # invalid candidates carry the sentinel position so the merged top-k and
    # the IDW weights reject them by distance alone
    sentinel = jnp.zeros((_payload_dim(smc),), jnp.float32).at[:3].set(_SENTINEL_POS).at[3].set(1.0)
    payload = jnp.where(kvalid[..., None], payload, sentinel)
    return payload, kdist2, kvalid, nn_count


def _merge_and_blend(points: jax.Array, payload: jax.Array, dist2: jax.Array,
                     valid: jax.Array, smc: MapConfig):
    """Global top-k over the gathered (B, S*k) candidates + IDW blend.

    Differentiable in ``payload`` features and ``points`` (offset vectors and
    IDW weights recomputed from positions, as the single-device
    interpolate_features does).
    Returns (geo_feat (B, F+3) or (B,k,F+3), weights, certainty (B,)).
    """
    k = min(smc.nn_k, dist2.shape[-1])
    _, sel = jax.lax.top_k(-dist2, k)                           # (B,k) of S*k
    pay = jnp.take_along_axis(payload, sel[..., None], axis=1)  # (B,k,8+F)
    vld = jnp.take_along_axis(valid, sel, axis=1)

    nbr_pos = pay[..., 0:3]
    cert = pay[..., 7]
    feats = jnp.where(vld[..., None], pay[..., 8:], 0.0)
    vec = points[:, None, :] - nbr_pos
    d2 = jnp.sum(vec * vec, axis=-1)
    d2 = jnp.where(vld, d2, _INVALID_DIST2)
    vec = jnp.where(vld[..., None], vec, 0.0)

    w = 1.0 / (d2 + smc.idw_eps)
    w = jnp.where(vld, w, 0.0)
    nn_any = jnp.any(vld, axis=-1, keepdims=True)
    w = jnp.where(nn_any, w, smc.idw_eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(vld, w, 0.0)

    geo_vec = jnp.concatenate([feats, vec], axis=-1)            # (B,k,F+3)
    geo_out = jnp.sum(geo_vec * w[..., None], axis=1) if smc.weighted_first else geo_vec
    certainty = jnp.sum(jnp.where(vld, cert, 0.0) * w, axis=-1)
    return geo_out, w, certainty


def make_spatial_query(mesh: Mesh, smc: MapConfig, offsets_np: np.ndarray,
                       sdf_scale: float):
    """query(sstate, geo_params, points, travel_now) -> (sdf, nn_count).

    points sharded over DATA_AXIS; map shards over MAP_AXIS; decoder
    replicated.  One all_gather of candidate payloads per query crosses the
    map axis.
    """
    offsets = jnp.asarray(offsets_np)

    # check_vma=False: the per-query outputs are value-replicated over the map
    # axis because they are computed from all_gather'ed candidates, which the
    # static varying-axes check cannot prove
    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(MAP_AXIS), P(), P(DATA_AXIS), P()),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
    def query(sstate, geo_params, points, travel_now):
        state = jax.tree.map(lambda x: x[0], sstate)
        payload, dist2, valid, nn_count = _local_candidates(
            state, smc, points, offsets, travel_now)
        payload = jax.lax.all_gather(payload, MAP_AXIS, axis=1, tiled=True)
        dist2 = jax.lax.all_gather(dist2, MAP_AXIS, axis=1, tiled=True)
        valid = jax.lax.all_gather(valid, MAP_AXIS, axis=1, tiled=True)
        nn_count = jax.lax.psum(nn_count, MAP_AXIS)
        geo_feat, w, _ = _merge_and_blend(points, payload, dist2, valid, smc)
        sdf, _ = dec.blended_sdf(geo_params, geo_feat, w, smc.weighted_first,
                                 sdf_scale)
        return sdf, nn_count

    return query


class SpatialTrainables(NamedTuple):
    features: jax.Array       # (S, cap_s+1, F) sharded P(MAP_AXIS)
    geo: dec.DecoderParams    # replicated


def make_spatial_train_step(mesh: Mesh, smc: MapConfig, offsets_np: np.ndarray,
                            *, lr: float, adam_eps: float, sigma_sigmoid: float,
                            sdf_scale: float, loss_weight_on: bool):
    """Jitted spatially-sharded SGD step on (per-shard features, decoder).

    step(sstate, trainables, opt_state, batch) -> (trainables, opt_state, loss)
    batch: ShardedBatch-like with coord/sdf_label/weight/valid sharded over
    DATA_AXIS.  Feature grads land on their owning shard via the all_gather
    transpose (psum_scatter over MAP_AXIS); decoder grads psum over DATA_AXIS.
    """
    import optax

    offsets = jnp.asarray(offsets_np)
    opt = optax.adam(learning_rate=lr, b1=0.9, b2=0.99, eps=adam_eps)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(MAP_AXIS), P(MAP_AXIS), P(), P(DATA_AXIS), P()),
             out_specs=P(DATA_AXIS), check_vma=False)
    def forward(sstate, features, geo_params, points, travel_now):
        state = jax.tree.map(lambda x: x[0], sstate)
        state = state._replace(geo_features=features[0])
        payload, dist2, valid, _ = _local_candidates(
            state, smc, points, offsets, travel_now)
        payload = jax.lax.all_gather(payload, MAP_AXIS, axis=1, tiled=True)
        dist2 = jax.lax.all_gather(dist2, MAP_AXIS, axis=1, tiled=True)
        valid = jax.lax.all_gather(valid, MAP_AXIS, axis=1, tiled=True)
        geo_feat, w, _ = _merge_and_blend(points, payload, dist2, valid, smc)
        sdf, _ = dec.blended_sdf(geo_params, geo_feat, w, smc.weighted_first,
                                 sdf_scale)
        return sdf

    @jax.jit
    def step(sstate, trainables: SpatialTrainables, opt_state, batch):
        def loss_fn(tr: SpatialTrainables):
            pred = forward(sstate, tr.features, tr.geo, batch.coord,
                           batch.travel_now)
            return losses.sdf_bce_loss(pred, batch.sdf_label, sigma_sigmoid,
                                       batch.weight, loss_weight_on,
                                       valid=batch.valid)

        loss, grads = jax.value_and_grad(loss_fn)(trainables)
        updates, new_opt = opt.update(grads, opt_state, trainables)
        new_tr = optax.apply_updates(trainables, updates)
        return new_tr, new_opt, loss

    return step, opt


class SpatialBatch(NamedTuple):
    coord: jax.Array       # (B,3) sharded P(DATA_AXIS)
    sdf_label: jax.Array   # (B,)
    weight: jax.Array      # (B,)
    valid: jax.Array       # (B,)
    travel_now: jax.Array  # () replicated


def shard_spatial_batch(mesh: Mesh, batch: SpatialBatch) -> SpatialBatch:
    ds = _data_sharding(mesh)
    rep = _replicated(mesh)
    return SpatialBatch(
        coord=jax.device_put(batch.coord, ds),
        sdf_label=jax.device_put(batch.sdf_label, ds),
        weight=jax.device_put(batch.weight, ds),
        valid=jax.device_put(batch.valid, ds),
        travel_now=jax.device_put(batch.travel_now, rep),
    )
