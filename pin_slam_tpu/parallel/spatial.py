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


# ======================================================================
# Live SlamSystem backend (VERDICT r3 next #5): global map sharded over
# MAP_AXIS, bounded local window replicated.
# ======================================================================
#
# The library functions above train directly against the sharded GLOBAL map.
# The live SLAM loop instead keeps its heavily-optimized single-device local
# window (tracker GN/LM, pool-cached kNN, Pallas kernels) and shards only the
# UNBOUNDED global state — the thing that outgrows one chip's HBM (the
# reference's one-device global SoA + 5e7-slot hash,
# /root/reference/model/neural_points.py:73-93):
#
# * insert: communication-free per-shard ownership masking (as above)
# * local-map build: each shard extracts ITS in-window members with the
#   ordinary build_local_map, one all_gather of the (L_s+1)-row blocks
#   crosses the map axis, and the replicated merge compacts them into ONE
#   merged LocalMap whose global indices are shard-block encoded
#   (g = shard*(cap_s+1) + row) — odometry, training, meshing, loop
#   detection all run on it UNCHANGED
# * write-back: shard s's members occupy one contiguous rank range of the
#   merged local rows (global-id order is shard-major), so each shard slices
#   its trained block and runs the ordinary dense-span assign_local_to_global
#   — communication-free
#
# PGO + elastic map deformation ARE sharded (r5): adjust/recreate run
# per-shard (communication-free), loop verification extracts a merged window
# at the loop pose through the same all_gather path, and the pool kNN-cache
# refresh reads the flattened stacked attr rows (their layout IS the
# shard-block-encoded global id space).  Remaining v1 limitations (asserted
# in the pipeline): BA's joint pose+feature refinement and composition with
# dp_devices>1 are not yet sharded.


class LiveSpatialBackend(NamedTuple):
    mesh: Mesh
    smc: MapConfig            # per-shard config
    mc_merged: MapConfig      # what the rest of the pipeline uses
    n_map: int
    init_state: "object"      # () -> stacked sharded MapState
    init_slms: "object"       # () -> stacked sharded LocalMap
    insert: "object"          # (sstate, pts, valid, ts, travel, bucket) -> sstate
    extract: "object"         # (sstate, origin, ts, travel[, travel_window])
    #                           -> (slms, merged LocalMap)
    writeback: "object"       # (sstate, slms, attr, geo, col, travel) -> sstate
    adjust: "object"          # (sstate, pose_diff (T,4,4)) -> sstate
    recreate: "object"        # (sstate, cur_ts) -> sstate


def make_live_backend(mesh: Mesh, mc_user: MapConfig, n_map: int,
                      downsample_table_size: int = 1 << 20,
                      insert_bucket: int = 1 << 14) -> LiveSpatialBackend:
    """Build the sharded-global-map backend for SlamSystem (see module note).

    ``mc_user``: the single-device MapConfig the YAML describes; per-shard
    capacities divide it.  The returned ``mc_merged`` (capacity
    ``n_map*(cap_s+1)-1`` for shard-block-encoded global ids, local capacity
    ``n_map*L_s``) is what every consumer of the merged LocalMap must use.
    """
    smc = dataclasses.replace(
        mc_user,
        capacity=max(1, mc_user.capacity // n_map),
        hash_size=max(2, mc_user.hash_size // n_map),
        local_capacity=max(1, mc_user.local_capacity // n_map))
    cs1 = smc.capacity + 1
    Ls = smc.local_capacity
    merged_cap = n_map * cs1 - 1
    # shard-block-encoded global ids ride through f32 value-casts in hash
    # rows and the pool kNN cache; the merged capacity (not just the user
    # capacity) must stay within f32's exact-integer range (ADVICE r4 #3 —
    # merged_cap = map_capacity + n_map - 1 can exceed the MapConfig bound)
    if merged_cap > (1 << 24):
        raise ValueError(
            f"map_shards={n_map}: merged capacity {merged_cap} "
            f"(map_capacity + map_shards - 1) exceeds 2^24; shard-block "
            f"global ids would lose exactness in f32 casts — reduce "
            f"map_capacity or map_shards")
    Lm = n_map * Ls
    mc_merged = dataclasses.replace(mc_user, capacity=merged_cap,
                                    local_capacity=Lm)

    def init_state():
        @partial(shard_map, mesh=mesh, in_specs=(), out_specs=P(MAP_AXIS))
        def _init():
            return jax.tree.map(lambda x: x[None], npts.init_map_state(smc))
        return jax.jit(_init)()

    def init_slms():
        @partial(shard_map, mesh=mesh, in_specs=(), out_specs=P(MAP_AXIS))
        def _init():
            return jax.tree.map(lambda x: x[None], npts.init_local_map(smc))
        return jax.jit(_init)()

    @partial(shard_map, mesh=mesh,
             in_specs=(P(MAP_AXIS), P(), P(), P(), P()),
             out_specs=P(MAP_AXIS))
    def _insert(sstate, points, valid, cur_ts, travel):
        state = jax.tree.map(lambda x: x[0], sstate)
        own = shard_of(grid_coords(points, smc.voxel_size), n_map) \
            == jax.lax.axis_index(MAP_AXIS)
        # the ownership mask leaves each shard ~1/n_map of the frame's
        # survivors, so the per-call bucket can be far below the frame width —
        # map_insert's whole-bucket room guard (count <= cap - bucket) then
        # lets the shard fill close to its capacity instead of refusing
        # inserts at cap/2
        new = npts.map_insert(state, smc, points, valid & own, cur_ts, travel,
                              downsample_table_size=downsample_table_size,
                              insert_bucket=min(points.shape[0], insert_bucket,
                                                smc.capacity))
        return jax.tree.map(lambda x: x[None], new)

    def insert(sstate, points, valid, cur_ts, travel):
        return _insert(sstate, points, valid, cur_ts, travel)

    # the per-query outputs of the gather half are value-replicated over the
    # map axis (they come from all_gather), which the static varying-axes
    # check cannot prove -> check_vma=False (as the library query above)
    @partial(shard_map, mesh=mesh,
             in_specs=(P(MAP_AXIS), P(), P(), P(), P()),
             out_specs=(P(MAP_AXIS), P()), check_vma=False)
    def _extract_blocks(sstate, origin, cur_ts, travel, travel_window):
        state = jax.tree.map(lambda x: x[0], sstate)
        lm_s = npts.build_local_map(state, smc, origin, cur_ts, travel,
                                    travel_window=travel_window)
        s = jax.lax.axis_index(MAP_AXIS)
        gidx = jnp.where(lm_s.indices < smc.capacity,
                         s * cs1 + lm_s.indices, merged_cap)
        blocks = (gidx, lm_s.attr_rows, lm_s.geo_features,
                  lm_s.color_features, lm_s.count, lm_s.member_mask)
        gathered = jax.lax.all_gather(blocks, MAP_AXIS)   # (n_map, ...)
        return jax.tree.map(lambda x: x[None], lm_s), gathered

    def extract(sstate, origin, cur_ts, travel, travel_window=None):
        if travel_window is None:
            travel_window = jnp.float32(smc.travel_dist_window)
        slms, g = _extract_blocks(sstate, origin, cur_ts, travel,
                                  jnp.asarray(travel_window, jnp.float32))
        gidx_g, attr_g, geo_g, col_g, counts_g, mm_g = g

        # merged compaction: flat order = (shard, in-shard rank) = ascending
        # shard-block global id, the SAME order as the concatenated member
        # masks — so the rank-based global->local remap downstream
        # (mapper.mapping_loop_cached, assign) works unchanged
        nrow = n_map * (Ls + 1)
        active = (jnp.arange(Ls + 1, dtype=jnp.int32)[None, :]
                  < counts_g[:, None]).reshape(-1)
        rankf = jnp.cumsum(active.astype(jnp.int32)) - 1
        # keep-first overflow trim: members are kept SHARD-MAJOR (all of
        # shard 0 before any of shard 1), which differs from the single-
        # device policy of keeping the lowest global indices (= oldest
        # points) when the merged window overflows Lm (ADVICE r4 #4).  In
        # practice each shard's window is Ls-bounded so the merged window
        # only overflows when every shard is simultaneously full; documented
        # at the `tpu: map_shards` knob (config.py).
        active = active & (rankf < Lm)
        j = jnp.nonzero(active, size=Lm, fill_value=nrow)[0].astype(jnp.int32)
        j_pad = jnp.concatenate([j, jnp.array([nrow], jnp.int32)])

        def take(flat, sentinel_row):
            padded = jnp.concatenate([flat, sentinel_row[None]], axis=0)
            return padded[j_pad]

        F = smc.feature_dim
        indices = take(gidx_g.reshape(nrow), jnp.asarray(merged_cap, jnp.int32))
        attr = take(attr_g.reshape(nrow, ATTR_DIM), npts._attr_sentinel_row())
        geo = take(geo_g.reshape(nrow, F), jnp.zeros((F,), jnp.float32))
        col = (take(col_g.reshape(nrow, F), jnp.zeros((F,), jnp.float32))
               if col_g is not None else None)
        count = jnp.minimum(jnp.sum(counts_g), Lm)

        mm = mm_g.reshape(n_map * cs1)                     # (merged_cap+1,)
        rank = jnp.cumsum(mm.astype(jnp.int32)) - 1
        mm = mm & (rank < Lm)

        merged = npts.LocalMap(
            indices=indices, attr_rows=attr, geo_features=geo,
            color_features=col, count=count, member_mask=mm,
            lo1=jnp.zeros((), jnp.int32), lo2=jnp.zeros((), jnp.int32),
            origin=origin.astype(jnp.float32),
            hash_rows=npts._pack_hash_rows(mc_merged, attr[:, C_POS], count,
                                           indices))
        return slms, merged

    @partial(shard_map, mesh=mesh,
             in_specs=(P(MAP_AXIS), P(MAP_AXIS), P(), P(), P(), P()),
             out_specs=P(MAP_AXIS), check_vma=False)
    def _writeback(sstate, slms, m_attr, m_geo, m_col, travel):
        state = jax.tree.map(lambda x: x[0], sstate)
        lm_s = jax.tree.map(lambda x: x[0], slms)
        s = jax.lax.axis_index(MAP_AXIS)
        counts_g = jax.lax.all_gather(lm_s.count, MAP_AXIS)
        start = jnp.sum(jnp.where(jnp.arange(n_map) < s, counts_g, 0)
                        ).astype(jnp.int32)
        n_in = jnp.clip(Lm - start, 0, lm_s.count)         # merged-overflow trim
        rank_s = jnp.cumsum(lm_s.member_mask.astype(jnp.int32)) - 1
        mm2 = lm_s.member_mask & (rank_s < n_in)

        F = smc.feature_dim
        pad_a = jnp.zeros((Ls, ATTR_DIM), jnp.float32)
        pad_f = jnp.zeros((Ls, F), jnp.float32)
        attr_s = jax.lax.dynamic_slice(
            jnp.concatenate([m_attr, pad_a]), (start, 0), (Ls + 1, ATTR_DIM))
        geo_s = jax.lax.dynamic_slice(
            jnp.concatenate([m_geo, pad_f]), (start, 0), (Ls + 1, F))
        col_s = (jax.lax.dynamic_slice(
            jnp.concatenate([m_col, pad_f]), (start, 0), (Ls + 1, F))
            if m_col is not None else None)
        lm_w = lm_s._replace(attr_rows=attr_s, geo_features=geo_s,
                             color_features=col_s, member_mask=mm2)
        new = npts.assign_local_to_global(state, lm_w, smc, travel)
        return jax.tree.map(lambda x: x[None], new)

    def writeback(sstate, slms, m_attr, m_geo, m_col, travel):
        return _writeback(sstate, slms, m_attr, m_geo, m_col, travel)

    # ---- PGO elastic deformation under spatial sharding (VERDICT r4 #5).
    # adjust_map is per-point SE(3) by creation timestamp — embarrassingly
    # parallel per shard; the hash rebuild is per-shard local.  Deformed
    # points KEEP their original shard (ownership is not re-balanced): a
    # point pushed across a spatial ownership boundary stays where it is and
    # remains findable through the merged window; the only effect is that a
    # NEW point in the same voxel now inserts into the neighbor shard, i.e.
    # a cross-shard duplicate the reference's own rehash would also keep
    # (model/neural_points.py:372-428 keeps duplicates on purpose).
    @partial(shard_map, mesh=mesh, in_specs=(P(MAP_AXIS), P()),
             out_specs=P(MAP_AXIS))
    def _adjust(sstate, pose_diff):
        state = jax.tree.map(lambda x: x[0], sstate)
        new = npts.adjust_map(state, smc, pose_diff)
        return jax.tree.map(lambda x: x[None], new)

    @partial(shard_map, mesh=mesh, in_specs=(P(MAP_AXIS), P()),
             out_specs=P(MAP_AXIS))
    def _recreate(sstate, cur_ts):
        state = jax.tree.map(lambda x: x[0], sstate)
        new = npts.recreate_hash(state, smc, cur_ts,
                                 downsample_table_size=downsample_table_size)
        return jax.tree.map(lambda x: x[None], new)

    return LiveSpatialBackend(
        mesh=mesh, smc=smc, mc_merged=mc_merged, n_map=n_map,
        init_state=init_state, init_slms=init_slms, insert=insert,
        extract=extract, writeback=writeback,
        adjust=lambda sstate, diff: _adjust(sstate, diff),
        recreate=lambda sstate, ts: _recreate(sstate, ts))


def gather_state_dense(sstate, smc: MapConfig, n_map: int):
    """Host-side: stacked sharded MapState -> dense compacted numpy arrays
    (positions, attr_rows, geo_features, color_features-or-None, shard-block
    global ids, total count) for artifacts/eval (pin_map.npz, viewer, final
    mesh)."""
    cs1 = smc.capacity + 1
    attr = np.asarray(sstate.attr_rows).reshape(n_map * cs1, ATTR_DIM)
    geo = np.asarray(sstate.geo_features).reshape(n_map * cs1, -1)
    col = (np.asarray(sstate.color_features).reshape(n_map * cs1, -1)
           if sstate.color_features is not None else None)
    counts = np.asarray(sstate.count).reshape(-1)
    rows = []
    for s in range(n_map):
        rows.append(np.arange(s * cs1, s * cs1 + int(counts[s])))
    rows = (np.concatenate(rows) if rows else
            np.zeros((0,), np.int64)).astype(np.int64)
    return (attr[rows, :3], attr[rows], geo[rows],
            col[rows] if col is not None else None, rows.astype(np.int32),
            int(counts.sum()))
