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
from functools import partial
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
    local_hash_size: int = 1 << 22  # SUB-CELL slots of the per-frame packed local hash
    # brick-packed hash rows (r5, PERF.md): pack the (bx,by,bz) cells of a
    # BRICK into one physical hash row, so the K-cell probe template becomes
    # a ~K/prod(brick)-row gather at the same per-row cost (TPU row gathers
    # pay per row, nearly independent of width).  (1,1,1) = legacy per-cell
    # rows.  Candidate-set semantics are preserved exactly via an integer
    # parity-indexed membership mask (see make_probe_template).
    brick: tuple = (1, 1, 1)
    # positional encoding of the offset vector (ref model/neural_points.py:610-611,
    # 706-763; off in every shipped reference profile)
    pos_encoding_band: int = 0
    pos_encoding_freq: float = 200.0
    pos_encoding_base: float = 2.0
    use_gaussian_pe: bool = False

    @property
    def nsub(self) -> int:
        """Cells per brick row (1 = legacy per-cell layout)."""
        bx, by, bz = self.brick
        return bx * by * bz

    @property
    def brick_rows(self) -> int:
        """Physical brick rows of the local hash (sub-cell slots / nsub)."""
        return self.local_hash_size // self.nsub

    @property
    def assign_span(self) -> int:
        """Static row span of each dense local<->global transfer window.

        Local-map membership is constrained at build time to two contiguous
        index spans of this size (the tail = current pass, plus one anchored at
        the oldest member = pre-loop pass), so the trained-feature write-back
        is two dense slice merges instead of a 60-90 ns/row scatter."""
        return min(self.capacity, 2 * self.local_capacity)

    @staticmethod
    def from_config(cfg) -> "MapConfig":
        if int(cfg.map_capacity) > (1 << 24):
            # global indices ride f32 value-casts (hash rows, pool kNN cache)
            # — exact only below 2^24
            raise ValueError("map_capacity must be <= 2^24 (f32 value-cast indices)")
        wb = getattr(cfg, "use_brick_hash", False)
        if isinstance(wb, (tuple, list)):
            brick = tuple(int(b) for b in wb)
        elif wb is True or wb in ("true", "auto"):
            brick = (2, 2, 1)
        else:
            brick = (1, 1, 1)
        nsub = brick[0] * brick[1] * brick[2]
        return MapConfig(
            brick=brick,
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
            pos_encoding_band=cfg.pos_encoding_band,
            pos_encoding_freq=float(cfg.pos_encoding_freq),
            pos_encoding_base=float(cfg.pos_encoding_base),
            use_gaussian_pe=cfg.use_gaussian_pe,
            # measured on real TPU: random row-gathers run ~2.3x faster while
            # the table stays under ~16 MB (cache-resident); 2^20 slots x 32 B
            # sits exactly at that cliff, so the local accel hash is capped
            # there and never below 8x the point count (collision control).
            # Brick rows are 20 B/sub-cell (5 f32) vs 32 B/cell, so the
            # sub-cell cap can rise to 2^21 before matching the legacy bytes
            # — KITTI's 2^18-point window then keeps its brick load moderate
            local_hash_size=min(
                1 << 21 if nsub > 1 else 1 << 20,
                max(1 << 19, 1 << ((int(cfg.local_map_capacity) - 1).bit_length() + 3))),
        )


def neighbor_offsets(num_nei_cells: int, search_alpha: float) -> np.ndarray:
    """Sphere-clipped integer offset template (ref model/neural_points.py:430-453).

    K = 81 for (2, 0.5); K = 33 for (2, 0.2); K = 1 for (1, 0.0).
    """
    r = np.arange(-num_nei_cells, num_nei_cells + 1)
    dx = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    keep = (dx**2).sum(-1) < (num_nei_cells + search_alpha) ** 2
    return dx[keep].astype(np.int32)


class ProbeTemplate(NamedTuple):
    """Probe-template pytree for the append-time kNN probe (mapper._probe_rank).

    ``cells`` is the classic (K,3) sphere-clipped offset template.  Under the
    brick hash layout the probe instead gathers ``bricks[parity(q)]`` whole
    brick rows (Kb ~ K/nsub — the row-count saving) and masks the gathered
    sub-cells with ``memb[parity(q)]`` so the CANDIDATE SET is exactly the
    occupants of the hash slots the K template cells address — integer-exact
    membership, no approximation (PERF.md r5 brick packing)."""

    cells: jax.Array    # (K, 3) i32
    bricks: jax.Array   # (P, Kb, 3) i32 parity-indexed brick offsets (P=nsub)
    memb: jax.Array     # (P, Kb*nsub) f32 template-membership of each sub-cell


def make_probe_template(mc: MapConfig, num_nei_cells: int,
                        search_alpha: float) -> ProbeTemplate:
    """Host-side construction of the parity-indexed brick probe template.

    For a query in cell g with parity p = g mod brick, the bricks containing
    any template cell are brick(g) + floor((p + t)/brick) over template
    offsets t — the RELATIVE brick offsets depend only on p, so all P = nsub
    variants are precomputed.  The sub-cell (o, s) of variant p covers cell
    offset dx = o*brick + s - p; ``memb`` records whether dx is a template
    member (all-integer => bit-exact candidate parity with the per-cell
    probe under the same hash function)."""
    cells = neighbor_offsets(num_nei_cells, search_alpha)
    bx, by, bz = mc.brick
    bvec = np.asarray([bx, by, bz], np.int64)
    nsub = mc.nsub
    cell_set = {tuple(c) for c in cells.tolist()}
    subs = np.stack(np.meshgrid(np.arange(bx), np.arange(by), np.arange(bz),
                                indexing="ij"), axis=-1).reshape(-1, 3)
    bricks_per_p, memb_per_p = [], []
    parities = [np.asarray([px, py, pz], np.int64)
                for px in range(bx) for py in range(by) for pz in range(bz)]
    kb = 0
    for p in parities:
        b = np.unique(np.floor_divide(cells + p, bvec), axis=0).astype(np.int32)
        bricks_per_p.append(b)
        kb = max(kb, len(b))
    far = np.int32(1 << 20)   # padded slots hash somewhere harmless; memb = 0
    for j, (p, b) in enumerate(zip(parities, bricks_per_p)):
        m = np.zeros((kb, nsub), np.float32)
        for i in range(len(b)):
            for s in range(nsub):
                dx = b[i] * bvec + subs[s] - p
                m[i, s] = float(tuple(int(v) for v in dx) in cell_set)
        bricks_per_p[j] = np.concatenate(
            [b, np.full((kb - len(b), 3), far, np.int32)])
        # s-major candidate order (c = s*Kb + kb) to match the probe's
        # field-major unpack (_brick_gather_fm concatenates per sub-cell)
        memb_per_p.append(m.T.reshape(-1))
    return ProbeTemplate(
        cells=jnp.asarray(cells),
        bricks=jnp.asarray(np.stack(bricks_per_p)),
        memb=jnp.asarray(np.stack(memb_per_p)))


# Packed per-point attribute row layout (f32).  TPU scatters/gathers pay per
# ROW, almost independent of row width, so every non-trainable per-point field
# lives in ONE (…,16) array: a map insert is ONE attribute scatter instead of
# six, and a local-map build is ONE attribute gather (plus the feature
# tensors, which stay separate because they are trained).  Timestamps are
# value-cast f32 (exact below 2^24 frames); travel distances are stored as
# VALUES at write time so no ``travel_dist[ts]`` mega-gather is ever needed.
ATTR_DIM = 16
HASH_ROW_DIM = 8           # legacy local-hash row: [x, y, z, lidx, gidx, pad x3]
BRICK_SUB_DIM = 5          # brick-layout sub-cell row: [x, y, z, lidx, gidx]
C_POS = slice(0, 3)        # x, y, z
C_QUAT = slice(3, 7)       # qw, qx, qy, qz
C_CERT = 7                 # accumulated certainty
C_TSC = 8                  # creation frame id (f32 value-cast)
C_TSU = 9                  # last-update frame id (f32 value-cast)
C_TRC = 10                 # travel distance at creation
C_TRU = 11                 # travel distance at last update
C_WRITEBACK = slice(C_CERT, C_TRU + 1)  # columns the local map writes back


def _attr_sentinel_row() -> jax.Array:
    row = jnp.zeros((ATTR_DIM,), jnp.float32)
    row = row.at[0].set(_SENTINEL_POS).at[1].set(_SENTINEL_POS).at[2].set(_SENTINEL_POS)
    return row.at[3].set(1.0)  # identity quaternion


class MapState(NamedTuple):
    """Global neural point map (capacity+1 rows, last row = sentinel)."""

    attr_rows: jax.Array       # (cap+1, 16) f32 packed attributes (see C_*)
    geo_features: jax.Array    # (cap+1, F) f32
    color_features: Optional[jax.Array]  # (cap+1, F) or None
    count: jax.Array           # () i32
    hash_table: jax.Array      # (H+1,) i32; value `cap` = empty; slot H = dump

    # read-only views (kept for mesher/eval/IO compatibility)
    @property
    def positions(self) -> jax.Array:
        return self.attr_rows[:, C_POS]

    @property
    def orientations(self) -> jax.Array:
        return self.attr_rows[:, C_QUAT]

    @property
    def certainties(self) -> jax.Array:
        return self.attr_rows[:, C_CERT]

    @property
    def ts_create(self) -> jax.Array:
        return self.attr_rows[:, C_TSC].astype(jnp.int32)

    @property
    def ts_update(self) -> jax.Array:
        return self.attr_rows[:, C_TSU].astype(jnp.int32)


class LocalMap(NamedTuple):
    """Fixed-size trainable window of the map (ref model/neural_points.py:272-313).

    All per-point arrays have ``local_capacity+1`` rows; row L is the sentinel.

    TPU layout notes: random row-gathers/scatters are the hot-path cost and
    are paid per ROW, so everything a kNN probe needs is packed into ONE
    16-byte row of ``hash_rows`` (position + local index) and all other
    non-trainable attributes into one ``attr_rows`` row shared with the
    global layout.  This replaces the reference's five separate gathers per
    probe (model/neural_points.py:476-499,555-616).
    """

    indices: jax.Array         # (L+1,) i32 local->global, pad = cap
    attr_rows: jax.Array       # (L+1, 16) f32 packed attributes (see C_*)
    geo_features: jax.Array    # (L+1, F) — the trainable tensor
    color_features: Optional[jax.Array]
    count: jax.Array           # () i32
    member_mask: jax.Array     # (cap+1,) bool: global rows in this local map;
    #                            local row of a member = its rank in the mask
    lo1: jax.Array             # () i32 anchor of span 1 (oldest member)
    lo2: jax.Array             # () i32 anchor of span 2 (buffer tail)
    origin: jax.Array          # (3,) f32 sensor position at (re)build time
    hash_rows: jax.Array       # (H_l+1, 8) f32: [x, y, z, float(lidx), float(gidx), pad...]

    @property
    def positions(self) -> jax.Array:
        return self.attr_rows[:, C_POS]

    @property
    def orientations(self) -> jax.Array:
        return self.attr_rows[:, C_QUAT]

    @property
    def certainties(self) -> jax.Array:
        return self.attr_rows[:, C_CERT]

    @property
    def ts_update(self) -> jax.Array:
        return self.attr_rows[:, C_TSU].astype(jnp.int32)

    @property
    def pose_rows(self) -> jax.Array:
        """[x,y,z,qw,qx,qy,qz,cert] view used by interpolation."""
        return self.attr_rows[:, :8]


# ----------------------------------------------------------------------
# construction
# ----------------------------------------------------------------------


def init_map_state(mc: MapConfig) -> MapState:
    cap, F = mc.capacity, mc.feature_dim
    return MapState(
        attr_rows=jnp.broadcast_to(_attr_sentinel_row(), (cap + 1, ATTR_DIM)),
        geo_features=jnp.zeros((cap + 1, F), dtype=jnp.float32),
        color_features=jnp.zeros((cap + 1, F), dtype=jnp.float32) if mc.color_on else None,
        count=jnp.zeros((), dtype=jnp.int32),
        hash_table=jnp.full((mc.hash_size + 1,), cap, dtype=jnp.int32),
    )


def subcell_hash(mc: MapConfig, cells: jax.Array) -> jax.Array:
    """Row index of a CELL coordinate [...,3] in the local hash table.

    Legacy layout (brick (1,1,1)): plain spatial hash over sub-cell slots.
    Brick layout: hash the cell's brick, then its in-brick sub-cell index —
    ``hash(brick) * nsub + linear(sub)``.  Both return indices into
    ``lm.hash_rows``'s row axis (flat sub-cell rows)."""
    if mc.nsub == 1:
        return spatial_hash(cells, mc.local_hash_size)
    bx, by, bz = mc.brick
    bvec = jnp.asarray([bx, by, bz], jnp.int32)
    bco = jnp.floor_divide(cells, bvec)
    sub = cells - bco * bvec
    s = sub[..., 0] * (by * bz) + sub[..., 1] * bz + sub[..., 2]
    return spatial_hash(bco, mc.brick_rows) * mc.nsub + s


def _pack_hash_rows(mc: MapConfig, positions: jax.Array, count: jax.Array,
                    indices: Optional[jax.Array] = None) -> jax.Array:
    """Build the packed per-frame local hash:
    slot -> [x, y, z, lidx, gidx, ...] (f32; TPU gathers pay per ROW,
    so the extra global-index payload is free — it saves the mapping append
    path a (B*k,) local->global remap gather).

    Legacy layout: (local_hash_size+1, 8) rows, one CELL per row.
    Brick layout (mc.brick != (1,1,1)): ((brick_rows+1)*nsub, 5) flat
    SUB-CELL rows; a probe gathers whole bricks as (brick_rows+1, nsub*5)
    reshaped views (nsub cells per physical row — the row-count saving), and
    per-cell consumers (tracker/mesher/certainty) address single sub-cell
    rows via ``subcell_hash``.

    The index payloads are VALUE-cast to f32 (exact for < 2^24), NOT bitcast:
    int32 bit patterns of small indices are denormal floats and TPUs flush
    denormals to zero anywhere the value crosses the VPU — a bitcast payload
    silently reads back as index 0 on real hardware (CPU preserves the bits,
    which is exactly the kind of bug fake-device tests cannot catch)."""
    L = mc.local_capacity
    lidx = jnp.arange(L + 1, dtype=jnp.int32)
    active = lidx < count
    cells = grid_coords(positions, mc.voxel_size)
    gidx = (indices if indices is not None
            else jnp.full((L + 1,), mc.capacity, jnp.int32))
    if mc.nsub == 1:
        Hl = mc.local_hash_size
        slot = jnp.where(active, subcell_hash(mc, cells), Hl)  # pads -> dump
        rows = jnp.concatenate(
            [positions, lidx.astype(jnp.float32)[:, None],
             gidx.astype(jnp.float32)[:, None],
             jnp.zeros((L + 1, 3), jnp.float32)], axis=1)
        sentinel_row = jnp.concatenate(
            [jnp.full((3,), _SENTINEL_POS, jnp.float32),
             jnp.asarray([L, mc.capacity, 0.0, 0.0, 0.0], jnp.float32)])
        table = jnp.broadcast_to(sentinel_row, (Hl + 1, HASH_ROW_DIM))
        return table.at[slot].set(rows)
    nsub, Hb = mc.nsub, mc.brick_rows
    # pads go to the dump BRICK's first sub-cell row (bricks Hb.. are never
    # gathered: probe hashes land in [0, Hb))
    slot = jnp.where(active, subcell_hash(mc, cells), Hb * nsub)
    rows = jnp.concatenate(
        [positions, lidx.astype(jnp.float32)[:, None],
         gidx.astype(jnp.float32)[:, None]], axis=1)
    sentinel_row = jnp.concatenate(
        [jnp.full((3,), _SENTINEL_POS, jnp.float32),
         jnp.asarray([L, mc.capacity], jnp.float32)])
    table = jnp.broadcast_to(sentinel_row, ((Hb + 1) * nsub, BRICK_SUB_DIM))
    return table.at[slot].set(rows)


def init_local_map(mc: MapConfig) -> LocalMap:
    L, F = mc.local_capacity, mc.feature_dim
    attr_rows = jnp.broadcast_to(_attr_sentinel_row(), (L + 1, ATTR_DIM))
    count = jnp.zeros((), dtype=jnp.int32)
    return LocalMap(
        indices=jnp.full((L + 1,), mc.capacity, dtype=jnp.int32),
        attr_rows=attr_rows,
        geo_features=jnp.zeros((L + 1, F), dtype=jnp.float32),
        color_features=jnp.zeros((L + 1, F), dtype=jnp.float32) if mc.color_on else None,
        count=count,
        member_mask=jnp.zeros((mc.capacity + 1,), dtype=bool),
        lo1=jnp.zeros((), dtype=jnp.int32),
        lo2=jnp.zeros((), dtype=jnp.int32),
        origin=jnp.zeros((3,), dtype=jnp.float32),
        hash_rows=_pack_hash_rows(mc, attr_rows[:, C_POS], count),
    )


# ----------------------------------------------------------------------
# map update (insert)
# ----------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mc", "downsample_table_size", "insert_bucket"))
def map_insert(state: MapState, mc: MapConfig, points: jax.Array, valid: jax.Array,
               cur_ts: jax.Array, travel_dist: jax.Array,
               rng: Optional[jax.Array] = None,
               downsample_table_size: int = 1 << 20,
               insert_bucket: Optional[int] = None) -> MapState:
    """Insert new observations (ref model/neural_points.py:205-270 ``update``).

    points: (M,3) world-frame candidate points (padded); valid: (M,) bool.
    Pipeline: voxel-downsample (closest-to-center) -> hash -> keep points whose
    voxel slot is empty / collided (>sqrt(3)*voxel away) / stale (travel-dist
    window exceeded) -> compact the survivors to ``insert_bucket`` rows ->
    append them as ONE contiguous ``dynamic_update_slice`` at ``count``.

    TPU-first: appended rows are contiguous by construction, so the append is
    a dense slice write, not a scatter (profiled on real TPU: row scatters
    cost ~60-90 ns/row; the attr+feature scatters over a full sample bucket
    were ~36 ms/frame).  Only the hash-slot update (narrow, one int32 per
    inserted point) remains a scatter.  ``insert_bucket`` bounds the inserts
    per call (survivors past it are dropped — per-frame voxel-downsampled
    insert counts are far below any sane bucket); once the map has less than
    one bucket of room, further inserts are dropped whole (the reference
    grows without bound; our capacity is the budget).
    """
    cap = mc.capacity
    m = points.shape[0]
    bucket = min(m, cap) if insert_bucket is None else min(insert_bucket, m, cap)

    keep = voxel_down_sample_mask(points, valid, mc.voxel_size, downsample_table_size)

    grid = grid_coords(points, mc.voxel_size)
    h = spatial_hash(grid, mc.hash_size)
    existing = state.hash_table[h]                       # (M,) global idx, cap = empty
    old = state.attr_rows[existing]                      # ONE attribute gather
    vec = old[:, C_POS] - points
    dist2 = jnp.sum(vec * vec, axis=-1)
    travel_now = travel_dist[cur_ts]
    delta_travel = travel_now - old[:, C_TRU]            # stored travel value
    is_empty = existing == cap
    update_mask = keep & (
        is_empty
        | (dist2 > 3.0 * mc.voxel_size**2)
        | (delta_travel > mc.travel_dist_window)
    )

    ins_idx = jnp.nonzero(update_mask, size=bucket, fill_value=0)[0].astype(jnp.int32)
    n_ins = jnp.sum(update_mask, dtype=jnp.int32)
    ok = state.count <= cap - bucket                     # whole-bucket room guard
    placed = (jnp.arange(bucket, dtype=jnp.int32) < n_ins) & ok

    pts_c = points[ins_idx].astype(jnp.float32)          # (bucket, 3)
    h_c = h[ins_idx]

    n_f = mc.feature_dim
    if mc.feature_std > 0 and rng is not None:
        feats_c = mc.feature_std * jax.random.normal(rng, (bucket, n_f), dtype=jnp.float32)
    else:
        feats_c = jnp.zeros((bucket, n_f), dtype=jnp.float32)

    ts_f = jnp.full((bucket,), 1.0, jnp.float32) * cur_ts.astype(jnp.float32)
    trav_f = jnp.full((bucket,), 1.0, jnp.float32) * travel_now
    rows = jnp.zeros((bucket, ATTR_DIM), jnp.float32)
    rows = rows.at[:, C_POS].set(pts_c)
    rows = rows.at[:, 3].set(1.0)                        # identity quaternion
    rows = rows.at[:, C_TSC].set(ts_f).at[:, C_TSU].set(ts_f)
    rows = rows.at[:, C_TRC].set(trav_f).at[:, C_TRU].set(trav_f)

    # dense read-modify-write append at [start, start+bucket)
    start = jnp.minimum(state.count, cap - bucket)
    cur_attr = jax.lax.dynamic_slice(state.attr_rows, (start, 0), (bucket, ATTR_DIM))
    attr_rows = jax.lax.dynamic_update_slice(
        state.attr_rows, jnp.where(placed[:, None], rows, cur_attr), (start, 0))
    cur_geo = jax.lax.dynamic_slice(state.geo_features, (start, 0), (bucket, n_f))
    geo_features = jax.lax.dynamic_update_slice(
        state.geo_features, jnp.where(placed[:, None], feats_c, cur_geo), (start, 0))
    if state.color_features is not None:
        cur_col = jax.lax.dynamic_slice(state.color_features, (start, 0), (bucket, n_f))
        color_features = jax.lax.dynamic_update_slice(
            state.color_features, jnp.where(placed[:, None], feats_c, cur_col), (start, 0))
    else:
        color_features = None

    # point the hash slots at the new rows (narrow scatter, inserted rows only)
    slot = jnp.where(placed, h_c, mc.hash_size)          # dump slot for the rest
    hash_table = state.hash_table.at[slot].set(
        jnp.where(placed, start + jnp.arange(bucket, dtype=jnp.int32), cap))

    new_count = state.count + jnp.sum(placed, dtype=jnp.int32)

    return MapState(attr_rows, geo_features, color_features, new_count, hash_table)


# ----------------------------------------------------------------------
# local map
# ----------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mc",))
def build_local_map(state: MapState, mc: MapConfig, origin: jax.Array,
                    cur_ts: jax.Array, travel_dist: jax.Array,
                    travel_window: Optional[jax.Array] = None) -> LocalMap:
    """Select points within radius AND travel-dist window into a fixed-size
    trainable slice (ref model/neural_points.py:272-313 ``reset_local_map``).

    ``travel_window`` (traced scalar) overrides ``mc.travel_dist_window`` —
    used by loop verification to reconstruct the map roughly AS IT WAS at the
    loop time, excluding points inserted during the recent (drifted) revisit
    pass (the reference gets this via its ts-aware ``recreate_hash`` at the
    loop pose, model/neural_points.py:372-428 + pin_slam.py:187-188)."""
    cap, L = mc.capacity, mc.local_capacity

    vec = state.attr_rows[:cap, C_POS] - origin
    dist2 = jnp.sum(vec * vec, axis=-1)
    travel_now = travel_dist[cur_ts]
    if mc.use_mid_ts:
        ts_used = ((state.attr_rows[:cap, C_TSC] + state.attr_rows[:cap, C_TSU]) / 2
                   ).astype(jnp.int32)
        travel_used = travel_dist[ts_used]               # gather only on this path
    else:
        travel_used = state.attr_rows[:cap, C_TRC]       # stored value, no gather
    delta_travel = jnp.abs(travel_now - travel_used)
    window = mc.travel_dist_window if travel_window is None else travel_window
    rows = jnp.arange(cap, dtype=jnp.int32)
    active = rows < state.count
    mask = active & (dist2 < mc.local_map_radius**2) & (delta_travel < window)

    # constrain membership to TWO contiguous index spans so the write-back
    # (assign_local_to_global) is dense slice merges instead of row scatters:
    # span 2 = the buffer tail (the current pass — inserts are append-only, so
    # recent points are index-contiguous), span 1 anchored at the OLDEST
    # member (the pre-loop pass when a revisit pulls old points back into the
    # window).  Members between the spans (3+ separate passes through the same
    # place) are dropped; the rank cap below drops overflow the same way.
    #
    # TPU-first: the member compaction (nonzero) runs over the two S-row span
    # slices (2S rows), NOT the whole capacity — a full-width nonzero is a
    # capacity-wide scatter (~9.4 ms at 1M rows on v5e vs ~4.7 ms at 2x262k).
    S = mc.assign_span
    lo1 = jnp.argmax(mask).astype(jnp.int32)             # first member (0 if none)
    lo2 = jnp.maximum(state.count - S, 0)
    pad = jnp.zeros((S,), bool)
    mask_pad = jnp.concatenate([mask, pad])              # slices never clamp
    # span 1 rows already covered by span 2 are masked out (no double count)
    m1 = (jax.lax.dynamic_slice(mask_pad, (lo1,), (S,))
          & (lo1 + jnp.arange(S, dtype=jnp.int32) < lo2))
    m2 = jax.lax.dynamic_slice(mask_pad, (lo2,), (S,))
    mm = jnp.concatenate([m1, m2])                       # (2S,)
    # if the window overflows L we silently keep the first L (lowest indices =
    # oldest points); count saturates so downstream treats it as full
    rank = jnp.cumsum(mm.astype(jnp.int32)) - 1
    mm = mm & (rank < L)

    j = jnp.nonzero(mm, size=L, fill_value=2 * S)[0].astype(jnp.int32)
    idx = jnp.where(j < S, lo1 + j,
                    jnp.where(j < 2 * S, lo2 + (j - S), cap))
    count = jnp.sum(mm, dtype=jnp.int32)

    # rebuild the (cap+1,) membership mask from the capped span slices with
    # two dense updates (assign_local_to_global derives local ranks from it)
    mask_full = jnp.zeros((cap + S,), bool)
    mask_full = jax.lax.dynamic_update_slice(mask_full, mm[:S], (lo1,))
    # span 1 never writes rows >= lo2 (masked above), so this is disjoint
    mask_full = jax.lax.dynamic_update_slice(mask_full, mm[S:], (lo2,))
    mask = mask_full[:cap]

    idx_pad = jnp.concatenate([idx, jnp.array([cap], jnp.int32)])

    attr_rows = state.attr_rows[idx_pad]                 # ONE attribute gather
    attr_rows = attr_rows.at[L].set(_attr_sentinel_row())
    geo_features = state.geo_features[idx_pad]
    color_features = state.color_features[idx_pad] if state.color_features is not None else None

    member_mask = jnp.concatenate([mask, jnp.zeros((1,), bool)])

    return LocalMap(indices=idx_pad, attr_rows=attr_rows,
                    geo_features=geo_features, color_features=color_features,
                    count=count, member_mask=member_mask, lo1=lo1, lo2=lo2,
                    origin=origin.astype(jnp.float32),
                    hash_rows=_pack_hash_rows(mc, attr_rows[:, C_POS], count,
                                              idx_pad))


@partial(jax.jit, static_argnames=("mc",))
def build_query_view(state: MapState, mc: MapConfig, origin: jax.Array,
                     radius: jax.Array) -> LocalMap:
    """Read-only local map over ALL points within ``radius`` of ``origin`` —
    no travel-window filter and no contiguous-span constraint (members may be
    spread across the whole index range).  For offline/whole-map queries:
    chunked meshing past ``local_capacity`` and the map inspector
    (ref vis_pin_map.py:70 'global query mode' recreate_hash).  NOT for the
    training path: ``assign_local_to_global`` requires the span structure
    that ``build_local_map`` guarantees."""
    cap, L = mc.capacity, mc.local_capacity

    vec = state.attr_rows[:cap, C_POS] - origin
    dist2 = jnp.sum(vec * vec, axis=-1)
    rows = jnp.arange(cap, dtype=jnp.int32)
    mask = (rows < state.count) & (dist2 < radius**2)
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    mask = mask & (rank < L)                    # overflow: keep the oldest L

    idx = jnp.nonzero(mask, size=L, fill_value=cap)[0].astype(jnp.int32)
    count = jnp.sum(mask, dtype=jnp.int32)
    idx_pad = jnp.concatenate([idx, jnp.array([cap], jnp.int32)])

    attr_rows = state.attr_rows[idx_pad]
    attr_rows = attr_rows.at[L].set(_attr_sentinel_row())
    geo_features = state.geo_features[idx_pad]
    color_features = (state.color_features[idx_pad]
                      if state.color_features is not None else None)
    member_mask = jnp.concatenate([mask, jnp.zeros((1,), bool)])

    return LocalMap(indices=idx_pad, attr_rows=attr_rows,
                    geo_features=geo_features, color_features=color_features,
                    count=count, member_mask=member_mask,
                    lo1=jnp.zeros((), jnp.int32), lo2=jnp.zeros((), jnp.int32),
                    origin=origin.astype(jnp.float32),
                    hash_rows=_pack_hash_rows(mc, attr_rows[:, C_POS], count,
                                              idx_pad))


@partial(jax.jit, static_argnames=("mc",), donate_argnums=(0,))
def assign_local_to_global(state: MapState, lm: LocalMap, mc: MapConfig,
                           travel_dist: Optional[jax.Array] = None) -> MapState:
    """Write trained local features + certainty/ts bookkeeping back into the
    global map (ref model/neural_points.py:315-324).  The input map state is
    DONATED: callers always rebind (``state = assign_local_to_global(state,
    ...)``), and donation lets XLA run the span merges in place instead of
    copying the multi-hundred-MB global tables.

    TPU-first: local membership is confined to two contiguous index spans at
    build time (see build_local_map), so the write-back is two DENSE slice
    merges — slice the span out, gather each member's trained row by its rank
    in ``member_mask`` (a gather from the small local tables), select, write
    the span back with ``dynamic_update_slice``.  Row scatters (60-90 ns/row
    on TPU) never touch the big global tables.

    The merged attribute row carries [cert, ts_update, travel_update] updates;
    position/quaternion/creation columns are unchanged copies from build time
    (any global deformation rebuilds the local map first).  ``travel_dist``
    (frame -> cumulative travel) refreshes the stored travel_update value to
    match the possibly-bumped ts_update (ref model/neural_points.py:634-652).
    """
    cap, L, S = mc.capacity, mc.local_capacity, mc.assign_span
    n_f = mc.feature_dim

    wb = lm.attr_rows
    if travel_dist is not None:
        tru = travel_dist[lm.attr_rows[:, C_TSU].astype(jnp.int32)]
        wb = wb.at[:, C_TRU].set(tru)
    wb = wb.at[L].set(_attr_sentinel_row())
    geo_wb = lm.geo_features.at[L].set(0.0)
    col_wb = (lm.color_features.at[L].set(0.0)
              if lm.color_features is not None else None)

    # member local row = rank of the global row among all members
    rank = jnp.cumsum(lm.member_mask.astype(jnp.int32)) - 1   # (cap+1,)

    def merge(carry, lo):
        attr_rows, geo_features, color_features = carry
        m_s = jax.lax.dynamic_slice(lm.member_mask, (lo,), (S,))
        r_s = jax.lax.dynamic_slice(rank, (lo,), (S,))
        src = jnp.where(m_s, jnp.minimum(r_s, L), L)          # (S,) into lm rows

        cur = jax.lax.dynamic_slice(attr_rows, (lo, 0), (S, ATTR_DIM))
        attr_rows = jax.lax.dynamic_update_slice(
            attr_rows, jnp.where(m_s[:, None], wb[src], cur), (lo, 0))

        cur_g = jax.lax.dynamic_slice(geo_features, (lo, 0), (S, n_f))
        geo_features = jax.lax.dynamic_update_slice(
            geo_features, jnp.where(m_s[:, None], geo_wb[src], cur_g), (lo, 0))

        if color_features is not None and col_wb is not None:
            cur_c = jax.lax.dynamic_slice(color_features, (lo, 0), (S, n_f))
            color_features = jax.lax.dynamic_update_slice(
                color_features, jnp.where(m_s[:, None], col_wb[src], cur_c), (lo, 0))
        return attr_rows, geo_features, color_features

    carry = (state.attr_rows, state.geo_features, state.color_features)
    # span 1 is contained in the tail span whenever lo1 >= lo2 (equal lengths)
    # — the common no-loop case; skip its merge entirely then
    carry = jax.lax.cond(lm.lo1 < lm.lo2,
                         lambda c: merge(c, lm.lo1), lambda c: c, carry)
    attr_rows, geo_features, color_features = merge(carry, lm.lo2)

    return state._replace(geo_features=geo_features, attr_rows=attr_rows,
                          color_features=color_features)


def compute_global2local(lm: LocalMap) -> np.ndarray:
    """(cap+1,) global row -> local row (or L for non-members), derived from
    the member mask.  Host-side helper for tests/tools; the device pipeline
    never materializes this (the rank is computed densely per span)."""
    mask = np.asarray(lm.member_mask)
    L = lm.geo_features.shape[0] - 1
    rank = np.cumsum(mask.astype(np.int64)) - 1
    return np.where(mask, np.minimum(rank, L), L).astype(np.int32)


def exact_k_min(d2: jax.Array, k: int):
    """Indices of the k smallest values along the last axis, ascending —
    exact, via k iterative argmin passes (cheap VPU sweeps).  Replaces
    ``jax.lax.approx_max_k`` where its PartialReduce lowering is slow
    (measured 18 ms at (245760, 33) vs ~4 ms for the sweeps)."""
    K = d2.shape[-1]
    cols = jnp.arange(K, dtype=jnp.int32)
    sel = []
    d = d2
    for _ in range(k):
        j = jnp.argmin(d, axis=-1).astype(jnp.int32)
        sel.append(j)
        d = jnp.where(cols == j[..., None], jnp.inf, d)
    return jnp.stack(sel, axis=-1)


# ----------------------------------------------------------------------
# query: hash-probe -> kNN -> IDW interpolation
# ----------------------------------------------------------------------


class KnnResult(NamedTuple):
    lidx: jax.Array       # (B, k) local indices, sentinel = L
    nn_count: jax.Array   # (B,) valid neighbors BEFORE top-k (can exceed k)


def brick_gather_fm(lm: LocalMap, mc: MapConfig, tmpl: "ProbeTemplate",
                    probe_pts: jax.Array) -> jax.Array:
    """Brick-layout probe gather at ``probe_pts`` -> FIELD-MAJOR rows.

    ONE (G, Kb) whole-brick row gather (Kb ~ K/nsub physical rows — the
    row-count saving over the per-cell probe) unpacked to field-major
    (G, 5*Kc) columns [x*Kc | y*Kc | z*Kc | lidx*Kc | gidx*Kc] with
    candidate order c = s*Kb + kb.  Sub-cells outside the sphere template
    (the brick cover is a superset) get their lidx masked to the sentinel via
    the integer-exact parity membership table, so the CANDIDATE SET equals
    the per-cell probe's under the brick hash function.  Everything stays
    2-D: 3-D reshapes with tiny minor dims tile-pad catastrophically on TPU
    (measured 25.6x memory expansion -> OOM; experiments/profile_brick.py)."""
    bx, by, bz = mc.brick
    nsub, Hb = mc.nsub, mc.brick_rows
    bvec = jnp.asarray([bx, by, bz], jnp.int32)
    g = grid_coords(probe_pts, mc.voxel_size)
    bco = jnp.floor_divide(g, bvec)
    p = g - bco * bvec
    bidx = p[:, 0] * (by * bz) + p[:, 1] * bz + p[:, 2]       # (G,)
    boffs = tmpl.bricks[bidx]                                 # (G,Kb,3)
    hb = spatial_hash(bco[:, None, :] + boffs, Hb)            # (G,Kb)
    raw = lm.hash_rows.reshape(Hb + 1, nsub * BRICK_SUB_DIM)[hb]
    memb = tmpl.memb[bidx]                                    # (G, nsub*Kb)
    fields = []
    for f in range(BRICK_SUB_DIM):
        fields.append(jnp.concatenate(
            [raw[:, :, s * BRICK_SUB_DIM + f] for s in range(nsub)],
            axis=1))                                          # (G, nsub*Kb)
    L = mc.local_capacity
    fields[3] = jnp.where(memb > 0.5, fields[3], float(L))    # mask non-members
    return jnp.concatenate(fields, axis=1)                    # (G, 5*Kc)


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
    h = subcell_hash(mc, cells)                                # (B,K)
    rows = lm.hash_rows[h]                                     # (B,K,·) one gather
    nbr = rows[..., :3]
    lidx = rows[..., 3].astype(jnp.int32)   # value-cast payload (see _pack_hash_rows)

    d = nbr - points[:, None, :]
    dist2 = jnp.sum(d * d, axis=-1)                            # (B,K)
    valid = (lidx < L) & (dist2 <= mc.max_valid_dist2)         # collision filter
    lidx = jnp.where(valid, lidx, L)
    nn_count = jnp.sum(valid, axis=-1, dtype=jnp.int32)

    dist2 = jnp.where(valid, dist2, _INVALID_DIST2)
    k = min(mc.nn_k, offsets.shape[0])
    # approx_max_k lowers to the TPU PartialReduce op — measured 3x faster
    # than lax.top_k at this shape and exact for k=6 of <=128 candidates
    # (verified against top_k in tests/test_neural_points.py)
    _, sel = jax.lax.approx_max_k(-dist2, k)                   # k smallest distances
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

    pose = lm.attr_rows[safe_idx]                               # (B,k,16) one gather
    nbr_pos = pose[..., C_POS]
    quat = pose[..., C_QUAT]
    cert = pose[..., C_CERT]
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

    if mc.pos_encoding_band > 0:
        # encode the offset vector (ref model/neural_points.py:610-611)
        from pin_slam_tpu.ops.encodings import positional_encode
        vec = positional_encode(vec, mc.pos_encoding_band, mc.pos_encoding_freq,
                                mc.pos_encoding_base, mc.use_gaussian_pe)

    geo_vec = jnp.concatenate([feats, vec], axis=-1)            # (B,k,F+P)
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
    idx = jnp.where(valid, knn_lidx, L).reshape(-1)
    attr = lm.attr_rows.at[idx, C_CERT].add(
        jnp.where(valid, weights, 0.0).reshape(-1))
    if query_ts is not None:
        ts_b = jnp.broadcast_to(query_ts[:, None], valid.shape).astype(jnp.float32)
        attr = attr.at[idx, C_TSU].max(jnp.where(valid, ts_b, 0.0).reshape(-1))
    attr = attr.at[L].set(_attr_sentinel_row())
    return lm._replace(attr_rows=attr)


def query_certainty(lm: LocalMap, mc: MapConfig, points: jax.Array) -> jax.Array:
    """Max neighbor certainty in the query's own voxel
    (ref model/neural_points.py:511-525; the reference narrows the search
    template to the center cell only, utils/mapper.py:297-303).

    Lean path: one narrow hash-row gather + one SCALAR gather from a dense
    certainty column (the full knn_search + 64-byte attr-row gather measured
    ~10 ms at frame shapes; this is ~4 ms)."""
    L = mc.local_capacity
    h = subcell_hash(mc, grid_coords(points, mc.voxel_size))
    rows = lm.hash_rows[h]                                  # (B, ·) one gather
    nbr = rows[:, :3]
    lidx = rows[:, 3].astype(jnp.int32)
    d = nbr - points
    valid = (lidx < L) & (jnp.sum(d * d, axis=-1) <= mc.max_valid_dist2)
    cert_col = lm.attr_rows[:, C_CERT]                      # dense column slice
    return jnp.where(valid, cert_col[jnp.where(valid, lidx, L)], 0.0)


# ----------------------------------------------------------------------
# map maintenance: deformation after PGO, rehash, prune
# ----------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mc",))
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

    from pin_slam_tpu.ops.transforms import rotmat_to_quat  # local import avoids cycle
    dq = rotmat_to_quat(R)
    orientations = quat_multiply(dq, state.orientations)
    attr_rows = state.attr_rows.at[:, C_POS].set(positions)
    attr_rows = attr_rows.at[:, C_QUAT].set(orientations)
    attr_rows = attr_rows.at[cap].set(_attr_sentinel_row())
    return state._replace(attr_rows=attr_rows)


@partial(jax.jit, static_argnames=("mc", "downsample_table_size"))
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


@partial(jax.jit, static_argnames=("mc", "prune_certainty_thre",
                                   "downsample_table_size"))
def finalize_map(state: MapState, mc: MapConfig, travel_dist: jax.Array,
                 cur_ts: jax.Array, prune_certainty_thre: float,
                 downsample_table_size: int = 1 << 21) -> MapState:
    """End-of-run map finalization (ref pin_slam.py:360-361): merge duplicate
    neural points (one survivor per voxel, preferring the most recently
    created — ref model/neural_points.py:372-428 ``recreate_hash`` with
    kept_points=False) and prune inactive low-certainty points
    (ref model/neural_points.py:329-353).  Unlike the in-run ``prune_map``
    tombstoning, this COMPACTS the survivors to the buffer front (the saved
    map shrinks) and rebuilds the hash over them.
    """
    cap = mc.capacity
    rows = jnp.arange(cap + 1, dtype=jnp.int32)
    active = rows < state.count
    if mc.use_mid_ts:
        ts_used = (state.ts_create + state.ts_update) // 2
    else:
        ts_used = state.ts_create
    ts_diff = jnp.abs(ts_used - cur_ts).astype(jnp.float32)
    keep_voxel = voxel_down_sample_min_value_mask(
        state.positions, active, mc.voxel_size, ts_diff, downsample_table_size)
    diff_travel = jnp.abs(travel_dist[cur_ts] - state.attr_rows[:, C_TRU])
    prune = (diff_travel > mc.travel_dist_window) \
        & (state.certainties < prune_certainty_thre)
    keep = active & keep_voxel & ~prune

    perm = jnp.nonzero(keep, size=cap + 1, fill_value=cap)[0].astype(jnp.int32)
    count = jnp.sum(keep, dtype=jnp.int32)
    attr_rows = state.attr_rows[perm]
    attr_rows = attr_rows.at[cap].set(_attr_sentinel_row())
    in_count = rows < count
    attr_rows = jnp.where(in_count[:, None], attr_rows,
                          _attr_sentinel_row()[None, :])
    geo_features = jnp.where(in_count[:, None], state.geo_features[perm], 0.0)
    color_features = (jnp.where(in_count[:, None], state.color_features[perm], 0.0)
                      if state.color_features is not None else None)

    h = spatial_hash(grid_coords(attr_rows[:, C_POS], mc.voxel_size), mc.hash_size)
    slot = jnp.where(in_count, h, mc.hash_size)
    hash_table = jnp.full((mc.hash_size + 1,), cap, dtype=jnp.int32)
    hash_table = hash_table.at[slot].set(jnp.where(in_count, rows, cap))
    return MapState(attr_rows, geo_features, color_features, count, hash_table)


@partial(jax.jit, static_argnames=("mc", "prune_certainty_thre"))
def prune_map(state: MapState, mc: MapConfig, travel_dist: jax.Array, cur_ts: jax.Array,
              prune_certainty_thre: float) -> MapState:
    """Deactivate inactive low-certainty points (ref model/neural_points.py:329-353).

    TPU variant: instead of compacting the arrays (dynamic shapes), pruned rows
    are tombstoned — moved to the sentinel position so no query can ever reach
    them; their rows are NOT reclaimed (capacity is the budget).
    """
    cap = mc.capacity
    active = jnp.arange(cap + 1, dtype=jnp.int32) < state.count
    diff_travel = jnp.abs(travel_dist[cur_ts] - state.attr_rows[:, C_TRU])
    inactive = diff_travel > mc.travel_dist_window
    prune = active & inactive & (state.certainties < prune_certainty_thre)
    positions = jnp.where(prune[:, None], _SENTINEL_POS, state.positions)
    attr_rows = state.attr_rows.at[:, C_POS].set(positions)
    return state._replace(attr_rows=attr_rows)
