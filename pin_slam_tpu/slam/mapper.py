"""Incremental mapping: device-resident replay pool + jitted SDF training step.

TPU-native re-design of the reference mapper (reference utils/mapper.py:110-668):

* The reference's dynamically-growing data pool (utils/mapper.py:71-78,185-266)
  becomes a fixed-capacity ring buffer with a head pointer; the periodic
  window-radius filter is a masked compaction (static-shape ``nonzero(size=P)``).
* The reference's python training loop (15 Adam iters per frame, one kernel
  launch per op, utils/mapper.py:446-573) becomes ONE jitted ``lax.fori_loop``
  over iterations: batch index sampling, kNN query, decoding, BCE+eikonal
  losses, adam update all fused into a single XLA program per frame.
* Eikonal regularization uses the same decimated central-difference numerical
  gradient (utils/mapper.py:683-733), i.e. 6 extra feature queries on bs/10
  points, traced into the same program.
* Decoder freeze after N frames (utils/tools.py:199-206) is a traced 0/1 gradient
  scale, avoiding recompilation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops import losses
from pin_slam_tpu.ops.transforms import apply_quaternion_rotation, transform_points


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    pool_capacity: int
    new_idx_capacity: int
    bs: int
    bs_new_sample: int
    iters: int
    lr: float
    adam_eps: float
    sigma_sigmoid: float
    sdf_scale: float
    loss_weight_on: bool
    ekional_loss_on: bool
    weight_e: float
    gradient_decimation: int
    num_grad_step: float          # voxel_size * num_grad_step_ratio
    surface_sample_range: float
    semantic_on: bool
    color_on: bool
    weight_s: float
    weight_i: float
    sem_class_count: int = 20
    window_radius: float = 60.0
    new_certainty_thre: float = 1.0
    vec_dim: int = 3              # width of the cached blended offset vector
    #                               (= encoded_dim(3, band) with pos encoding)
    weighted_first: bool = True   # False: per-neighbor decode + prediction
    #                               blend (ref utils/config.py:89); the pool
    #                               rows then additionally cache PER-NEIGHBOR
    #                               offset vectors (k * vec_dim extra columns)

    @property
    def pool_dim(self) -> int:
        return pool_dim(self.vec_dim) + (0 if self.weighted_first
                                         else 6 * self.vec_dim)

    @staticmethod
    def from_config(cfg) -> "MapperConfig":
        from pin_slam_tpu.ops.encodings import encoded_dim
        return MapperConfig(
            vec_dim=encoded_dim(cfg.pos_input_dim, cfg.pos_encoding_band,
                                cfg.use_gaussian_pe),
            weighted_first=cfg.weighted_first,
            pool_capacity=int(cfg.pool_capacity),
            new_idx_capacity=min(int(cfg.pool_capacity), 1 << 17),
            bs=cfg.bs,
            bs_new_sample=cfg.bs_new_sample,
            iters=cfg.iters,
            lr=cfg.lr,
            adam_eps=cfg.adam_eps,
            sigma_sigmoid=cfg.sigma_sigmoid_m,
            sdf_scale=cfg.sdf_scale,
            loss_weight_on=cfg.loss_weight_on,
            ekional_loss_on=cfg.ekional_loss_on,
            weight_e=cfg.weight_e,
            gradient_decimation=cfg.gradient_decimation,
            num_grad_step=cfg.voxel_size_m * cfg.num_grad_step_ratio,
            surface_sample_range=cfg.surface_sample_range_m,
            semantic_on=cfg.semantic_on,
            color_on=cfg.color_on,
            weight_s=cfg.weight_s,
            weight_i=cfg.weight_i,
            sem_class_count=cfg.sem_class_count,
            window_radius=cfg.window_radius,
            new_certainty_thre=cfg.new_certainty_thre,
        )


# Packed pool-row layout: the training batch gather touches ONE (P, pool_dim)
# array (TPU gathers pay per ROW, almost independent of row width — measured
# ~6.5-12.6 ns/row vs 53 ms for the 33-cell per-sample hash probe).  Besides
# the sample itself, each row CACHES the sample's full kNN GEOMETRY, computed
# ONCE at append time from the dilated candidate table (the reference
# re-queries per batch, utils/mapper.py:461 -> model/neural_points.py:459-509;
# on TPU that probe was 53+18 ms per frame):
#   * the k=6 GLOBAL neighbor indices (for the training feature gather, after
#     a per-frame global->local rank remap),
#   * the normalized IDW weights, and
#   * the weight-blended (optionally encoded, optionally quat-rotated) offset
#     vector — the geometric half of the decoder input.
# Weights/vectors depend only on positions, which never move outside PGO/BA
# deformation — the pipeline refreshes the cache (pool_refresh_cache) on those
# events.  Neighbor SETS are frozen at append: points inserted near an
# existing sample later do not join its set until the region is re-observed
# (the map voxel-saturates within a few frames of first observation, so the
# staleness window is short); a set member that leaves the local-map window
# maps to the sentinel row at remap time (its feature contribution drops to
# zero), matching the reference's travel-window query filter.
POOL_DIM = 24           # for vec_dim=3 (no positional encoding); see pool_dim()
P_COORD = slice(0, 3)   # world-frame sample coords
P_LABEL = 3             # sdf label
P_WEIGHT = 4            # weight (sign flags freespace)
P_TS = 5                # frame id (f32 value-cast)
P_LOCAL = slice(6, 9)   # sensor-frame coords (for BA/PGO re-transforms)
P_KNN = slice(9, 15)    # k=6 GLOBAL neighbor indices (f32 value-cast, -1 = none)
P_W = slice(15, 21)     # cached normalized IDW weights of the k neighbors
P_VEC0 = 21             # cached blended offset vector starts here (vec_dim wide)


def pool_dim(vec_dim: int = 3) -> int:
    return P_VEC0 + vec_dim


def p_vec(vec_dim: int = 3) -> slice:
    return slice(P_VEC0, P_VEC0 + vec_dim)


def p_nbr_vec(vec_dim: int = 3, k: int = 6) -> slice:
    """Per-neighbor (encoded) offset-vector columns — present only in the
    weighted_first=False layout (per-neighbor decoding needs each neighbor's
    own geometric input, ref model/neural_points.py:660-665)."""
    return slice(P_VEC0 + vec_dim, P_VEC0 + vec_dim + k * vec_dim)


class PoolState(NamedTuple):
    """Replay data pool (ref utils/mapper.py:71-78), fixed capacity P."""

    rows: jax.Array         # (P+1, 16) packed rows (see P_* column map)
    sem_label: Optional[jax.Array]    # (P+1,) i32
    color_label: Optional[jax.Array]  # (P+1,C)
    head: jax.Array         # () i32 ring write position
    fill: jax.Array         # () i32 number of valid entries
    new_idx: jax.Array      # (N_new,) i32 indices of "new-region" samples
    new_count: jax.Array    # () i32

    # read-only views (BA, tests, diagnostics)
    @property
    def coord(self) -> jax.Array:
        return self.rows[:, P_COORD]

    @property
    def sdf_label(self) -> jax.Array:
        return self.rows[:, P_LABEL]

    @property
    def weight(self) -> jax.Array:
        return self.rows[:, P_WEIGHT]

    @property
    def ts(self) -> jax.Array:
        return self.rows[:, P_TS].astype(jnp.int32)

    @property
    def local_coord(self) -> jax.Array:
        return self.rows[:, P_LOCAL]

    @property
    def knn_gidx(self) -> jax.Array:
        return self.rows[:, P_KNN].astype(jnp.int32)


def init_pool(mcfg: MapperConfig, color_channel: int = 3) -> PoolState:
    P = mcfg.pool_capacity
    rows = jnp.zeros((P + 1, mcfg.pool_dim), jnp.float32)
    rows = rows.at[:, P_KNN].set(-1.0)
    return PoolState(
        rows=rows,
        sem_label=jnp.zeros((P + 1,), jnp.int32) if mcfg.semantic_on else None,
        color_label=jnp.zeros((P + 1, color_channel), jnp.float32) if mcfg.color_on else None,
        head=jnp.zeros((), jnp.int32),
        fill=jnp.zeros((), jnp.int32),
        new_idx=jnp.zeros((mcfg.new_idx_capacity,), jnp.int32),
        new_count=jnp.zeros((), jnp.int32),
    )


exact_k_min = npts.exact_k_min   # canonical home: models/neural_points.py


def idw_blend(points: jax.Array, nbr_pos: jax.Array, valid: jax.Array,
              quat: Optional[jax.Array] = None, pos_encode=None,
              idw_eps: float = 1e-15, return_per_neighbor: bool = False):
    """Normalized IDW weights + weight-blended (encoded) offset vector at
    fixed neighbor positions — the pure-geometry half of the reference's
    ``query_feature`` (model/neural_points.py:574-632), shared by the
    append-time cache fill, the post-PGO cache refresh, and the eikonal
    stencil inside the training scan.

    points (...,3), nbr_pos (...,k,3), valid (...,k), quat (...,k,4) or None
    (per-neighbor offset rotation, identity until PGO deformation,
    ref model/neural_points.py:606-607).  Returns (w (...,k), vec_blend)."""
    vec = points[..., None, :] - nbr_pos
    dist2 = jnp.sum(vec * vec, axis=-1)
    dist2 = jnp.where(valid, dist2, npts._INVALID_DIST2)
    if quat is not None:
        vec = apply_quaternion_rotation(quat, vec)
    vec = jnp.where(valid[..., None], vec, 0.0)
    w = 1.0 / (dist2 + idw_eps)
    w = jnp.where(valid, w, 0.0)
    nn_any = jnp.any(valid, axis=-1, keepdims=True)
    w = jnp.where(nn_any, w, idw_eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(valid, w, 0.0)
    enc = pos_encode(vec) if pos_encode is not None else vec
    vec_blend = jnp.einsum("...k,...kp->...p", w, enc,
                           precision=jax.lax.Precision.HIGHEST)
    if return_per_neighbor:
        return w, vec_blend, enc
    return w, vec_blend


# canonical home: models/neural_points.py (the tracker's probe cache shares it)
_brick_gather_fm = npts.brick_gather_fm


def _probe_rank(lm, mc, offsets, probe_pts, query_pts, k,
                use_rank_kernel: bool = False):
    """Probe the local hash at ``probe_pts``' neighbor cells, rank the shared
    candidate set by each ``query_pts`` row's exact distances.

    probe_pts (G,3); query_pts (G,n,3) — the n queries of group g share probe
    g's candidate ball.  Returns (gidx (G,n,k) i32 global ids, w-geometry
    inputs: nbr_pos (G,n,k,3), valid (G,n,k)).

    ``offsets``: a plain (K,3) cell template, or a ``ProbeTemplate`` — with
    a brick-layout ``mc`` the latter probes whole BRICK rows (~K/nsub row
    gathers at identical candidate sets; PERF.md r5).

    ``use_rank_kernel``: fuse the post-gather distance/validity/k-min/select
    chain into one Pallas kernel (ops/rank_kernel.py) — same semantics, no
    (G,n,K) HBM intermediates.
    """
    from pin_slam_tpu.ops.hash3d import grid_coords

    L = mc.local_capacity
    brick_mode = isinstance(offsets, npts.ProbeTemplate) and mc.nsub > 1
    cells_t = offsets.cells if isinstance(offsets, npts.ProbeTemplate) else offsets
    G, n = query_pts.shape[0], query_pts.shape[1]
    if brick_mode:
        rows_fm = _brick_gather_fm(lm, mc, offsets, probe_pts)
        Kc = rows_fm.shape[1] // 5
    else:
        grid = grid_coords(probe_pts, mc.voxel_size)
        cells = grid[:, None, :] + cells_t[None, :, :]
        h = npts.subcell_hash(mc, cells)
        rows = lm.hash_rows[h]                            # (G,K,·) probe
        Kc = cells_t.shape[0]
    if use_rank_kernel:
        from pin_slam_tpu.ops.rank_kernel import (RankKernelConfig,
                                                  probe_rank_pallas)

        if not brick_mode:
            rows_fm = jnp.transpose(rows[..., :5], (0, 2, 1)).reshape(G, 5 * Kc)
        rcfg = RankKernelConfig(G=G, n=n, K=Kc, k=k, L=L,
                                max_valid_dist2=mc.max_valid_dist2)
        return probe_rank_pallas(
            rcfg, rows_fm, query_pts.reshape(G, 3 * n),
            interpret=jax.default_backend() == "cpu")
    if brick_mode:
        nbr = jnp.stack([rows_fm[:, 0 * Kc:1 * Kc], rows_fm[:, 1 * Kc:2 * Kc],
                         rows_fm[:, 2 * Kc:3 * Kc]], axis=-1)  # (G,Kc,3)
        lidx = rows_fm[:, 3 * Kc:4 * Kc].astype(jnp.int32)
        gidx = rows_fm[:, 4 * Kc:5 * Kc].astype(jnp.int32)
    else:
        nbr = rows[..., :3]
        lidx = rows[..., 3].astype(jnp.int32)
        gidx = rows[..., 4].astype(jnp.int32)

    d = nbr[:, None, :, :] - query_pts[:, :, None, :]     # (G,n,K,3)
    dist2 = jnp.sum(d * d, axis=-1)                       # (G,n,K)
    valid = (lidx[:, None, :] < L) & (dist2 <= mc.max_valid_dist2)
    dist2 = jnp.where(valid, dist2, npts._INVALID_DIST2)

    sel = exact_k_min(dist2, k)                           # (G,n,k)
    # one-hot MXU selection: take_along_axis lowers to per-ELEMENT gathers on
    # TPU (measured ~30 ms at these shapes vs ~2 ms for the einsum select)
    onehot = (sel[..., None] == jnp.arange(Kc, dtype=sel.dtype)
              ).astype(jnp.float32)                       # (G,n,k,K)
    payload = jnp.concatenate(
        [nbr, gidx.astype(jnp.float32)[..., None]], axis=-1)       # (G,K,4)
    # HIGHEST precision: the payload carries value-cast INDICES (up to 2^24)
    # and metric positions — the TPU MXU's default bf16 inputs corrupt both
    sel_pay = jnp.einsum("gnkK,gKc->gnkc", onehot, payload,
                         precision=jax.lax.Precision.HIGHEST)
    pos_k = sel_pay[..., :3]
    gidx_sel = jnp.round(sel_pay[..., 3]).astype(jnp.int32)
    valid_k = jnp.einsum("gnkK,gnK->gnk", onehot, valid.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST) > 0.5
    gidx_k = jnp.where(valid_k, gidx_sel, -1)
    return gidx_k, pos_k, valid_k


def dedup_group_probe(lm, mc, offsets, probe_pts, queries, k, budget: int,
                      n_g: int, use_rank_kernel: bool = False):
    """Exact voxel-dedup probe (VERDICT r3 next #1): items whose probe points
    share a VOXEL share one hash-ball gather.

    ``probe_pts`` (N,3) — one probe point per item; ``queries`` (N,q,3) — the
    q query positions of each item (q=1 for individually-probed free-space
    samples; q=near_count for the per-ray shared-ball block, where the item is
    the ray and the probe point its endpoint).

    Items are sorted by an EXACT frame-recentered voxel key and packed into
    groups of up to ``n_g`` same-voxel items; each of the first ``budget``
    groups probes its voxel's neighbor-cell ball once and ranks all its
    items' queries within it (``_probe_rank`` with n = n_g*q).  Because
    grouped items share the exact voxel, in-budget results are BIT-IDENTICAL
    to probing each item individually (same candidate rows, same exact
    distances, same tie-breaking) — this is pure row-count dedup, not an
    approximation.  The measured duplication (bench scene: 34% unique far
    voxels, 39% unique endpoint voxels) makes a 0.5N budget cover typical
    frames; items in groups past the budget (pathological all-unique frames)
    come back all-invalid — supervision dropped for the frame, never wrong.

    Returns (gidx (N,q,k) i32, pos (N,q,k,3), valid (N,q,k), dropped (N,))
    in ORIGINAL item order; ``dropped`` marks items in groups past the budget
    whose kNN came back all-invalid (callers should exclude those samples
    from the pool so they are genuinely skipped, not trained against an
    empty-feature decode — ADVICE r4 #2).
    """
    N, q = queries.shape[0], queries.shape[1]
    G_B = max(8, budget)
    gc = jnp.floor(probe_pts / mc.voxel_size).astype(jnp.int32)
    # exact 30-bit key after per-frame recentering: a frame's probe extent is
    # bounded by 2*max_range (≤ ~120 m / voxel ≪ 1024 cells per axis), so
    # subtracting the frame min keeps every in-range item's key exact; the
    # clip only touches garbage coords from padded rays
    gc = jnp.clip(gc - jnp.min(gc, axis=0), 0, 1023)
    key = (gc[:, 0] << 20) + (gc[:, 1] << 10) + gc[:, 2]
    order = jnp.argsort(key)                       # stable (jnp default)
    ks = key[order]
    sp = probe_pts[order]
    sq = queries[order]

    pos_i = jnp.arange(N, dtype=jnp.int32)
    newrun = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    run_start = jax.lax.cummax(jnp.where(newrun, pos_i, -1))
    slot_in_run = pos_i - run_start
    newgrp = newrun | (slot_in_run % n_g == 0)
    gid = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
    slot = slot_in_run % n_g
    over = gid >= G_B

    # group probe points: first item of each in-budget group (one writer per
    # group); out-of-budget groups keep the sentinel -> far-away voxel ball
    # whose ranked output is never read back
    probe = jnp.full((G_B, 3), 1e6, jnp.float32).at[
        jnp.where(newgrp & ~over, gid, G_B)].set(sp, mode="drop")
    # group queries: item (gid, slot) owns rows [slot*q, (slot+1)*q)
    qrow = (gid * n_g + slot) * q
    qidx = (jnp.where(over, jnp.int32(G_B * n_g * q), qrow)[:, None]
            + jnp.arange(q, dtype=jnp.int32)[None, :]).reshape(-1)
    gq = jnp.zeros((G_B * n_g * q, 3), jnp.float32).at[qidx].set(
        sq.reshape(-1, 3), mode="drop").reshape(G_B, n_g * q, 3)

    gidx_g, pos_g, valid_g = _probe_rank(lm, mc, offsets, probe, gq, k,
                                         use_rank_kernel=use_rank_kernel)

    # map back: pack -> gather each item's q rows -> unsort.  The pack keeps
    # the mapback ONE wide row-gather + one row-scatter (per-row costs
    # dominate; see the append_knn docstring)
    packed = jnp.concatenate(
        [gidx_g.astype(jnp.float32)[..., None], pos_g,
         valid_g.astype(jnp.float32)[..., None]], axis=-1)   # (G,nq,k,5)
    packed = packed.reshape(G_B * n_g * q, k * 5)
    rows = packed[jnp.minimum(qidx, G_B * n_g * q - 1)]      # (N*q, k*5)
    # over-budget items: zero the whole row -> valid False -> gidx -1 below
    rows = jnp.where(jnp.repeat(over, q)[:, None], 0.0, rows)
    out = jnp.zeros((N, q * k * 5), jnp.float32).at[order].set(
        rows.reshape(N, q * k * 5))                          # unsort
    out = out.reshape(N, q, k, 5)
    gidx = jnp.round(out[..., 0]).astype(jnp.int32)
    pos = out[..., 1:4]
    valid = out[..., 4] > 0.5
    dropped = jnp.zeros((N,), bool).at[order].set(over)
    return jnp.where(valid, gidx, -1), pos, valid, dropped


def append_knn(lm: npts.LocalMap, mc, offsets: jax.Array, coords: jax.Array,
               ray_sample_count: int, near_count: int,
               behind_count: int = 0, far_offsets: Optional[jax.Array] = None,
               quats: Optional[jax.Array] = None, pos_encode=None,
               per_neighbor_vecs: bool = False,
               use_rank_kernel: bool = False,
               dedup_far_budget: int = 0, dedup_near_budget: int = 0,
               return_dropped: bool = False):
    """kNN + cached geometry of one frame's samples at append time, with the
    probe SHARED along each ray (see the pool-row layout note): the first
    ``near_count`` samples of a ray (endpoint + Gaussian surface + behind —
    all within ~the surface-sample range of the endpoint) rank within the
    ENDPOINT's neighbor-cell ball, probed once per ray; the remaining
    free-space samples probe individually.  This cuts the probe's gathered
    rows (the dominant cost: ~7 ns per row on TPU regardless of row width)
    from (samples x K) to ((rays + n_free x rays) x K) — 2.3x for the 1+3+2+1
    reference layout — while distances/ranking stay exact per sample; only a
    candidate beyond the endpoint's ball but inside a surface sample's own
    ball is missed (bounded by the Gaussian sample range, a fraction of the
    ball radius).  One probe per sample per LIFETIME instead of per training
    batch (the reference re-queries per batch, utils/mapper.py:461 ->
    model/neural_points.py:459-509).

    Runs right after this frame's ``map_insert`` + ``build_local_map``, so the
    frame's own surface points are already in the index (matching the
    reference's query-after-update ordering, utils/mapper.py:163-176,461).

    coords: (n_rays * ray_sample_count, 3) ray-major samples; the per-ray
    layout is [endpoint, surface x n_surf, free-front x n_front, behind x
    n_behind] (ops/sampler.py) — ``near_count`` = 1 + n_surf.

    ``behind_count`` > 0 additionally routes the trailing behind-surface
    samples through the ENDPOINT's shared ball: neural points live ON
    surfaces, so a behind sample's neighbors (0.5-1 m inside the hit surface)
    are the same endpoint-region points the shared ball already holds — only
    a second surface sheet within ~1 m behind the first (a double wall
    thicker than the ball radius) contributes candidates the shared ball
    misses.  Distances/ranking stay exact per sample.  This cuts the
    individually-probed free samples from n_front+n_behind to n_front per
    ray (the probe's gathered rows are the dominant frame_update cost:
    ~7 ns/row x 33 cells x every individually-probed sample).

    Front free-space samples spread along the whole ray and always probe
    individually.

    ``dedup_far_budget`` / ``dedup_near_budget`` > 0 route the free-space /
    shared-ball probes through ``dedup_group_probe`` with that static group
    budget: items sharing a probe voxel share one ball gather (bit-identical
    in-budget results; the measured bench/KITTI duplication fits comfortably
    in 0.5 x items / 0.7 x rays — see dedup_group_probe).

    ``quats``: (cap+1, 4) global quaternion rows for the post-PGO offset
    rotation (identity until map deformation), or None.

    Returns (gidx (M,k) i32 GLOBAL ids, w (M,k), vec_blend (M,vec_dim)).
    """
    cells_t = (offsets.cells if isinstance(offsets, npts.ProbeTemplate)
               else offsets)
    k = min(mc.nn_k, cells_t.shape[0])
    Sn = ray_sample_count
    n_rays = coords.shape[0] // Sn
    c3 = coords.reshape(n_rays, Sn, 3)

    if behind_count > 0:
        near = jnp.concatenate([c3[:, :near_count],
                                c3[:, Sn - behind_count:]], axis=1)
        far = c3[:, near_count:Sn - behind_count]
    else:
        near = c3[:, :near_count]
        far = c3[:, near_count:]

    if dedup_near_budget > 0:
        g_near, p_near, v_near, d_near = dedup_group_probe(
            lm, mc, offsets, c3[:, 0], near, k, dedup_near_budget, n_g=2,
            use_rank_kernel=use_rank_kernel)
    else:
        g_near, p_near, v_near = _probe_rank(lm, mc, offsets, c3[:, 0], near,
                                             k, use_rank_kernel=use_rank_kernel)
        d_near = jnp.zeros((n_rays,), bool)
    if far.shape[1] > 0:
        far_flat = far.reshape(-1, 3)
        # optional narrower template for the individually-probed free-space
        # samples (config far_num_nei_cells): they carry free-space BCE labels
        # whose sigmoid targets saturate away from surfaces, so a shorter
        # candidate reach costs little supervision while the probe's gathered
        # rows (the dominant frame_update cost) shrink proportionally
        if dedup_far_budget > 0:
            g_far, p_far, v_far, d_far = dedup_group_probe(
                lm, mc, offsets if far_offsets is None else far_offsets,
                far_flat, far_flat[:, None, :], k, dedup_far_budget, n_g=4,
                use_rank_kernel=use_rank_kernel)
        else:
            g_far, p_far, v_far = _probe_rank(
                lm, mc, offsets if far_offsets is None else far_offsets,
                far_flat, far_flat[:, None, :], k,
                use_rank_kernel=use_rank_kernel)
            d_far = jnp.zeros((far_flat.shape[0],), bool)
        g_far = g_far.reshape(n_rays, -1, k)
        p_far = p_far.reshape(n_rays, -1, k, 3)
        v_far = v_far.reshape(n_rays, -1, k)
        d_far = d_far.reshape(n_rays, -1)
    else:
        g_far = jnp.zeros((n_rays, 0, k), jnp.int32)
        p_far = jnp.zeros((n_rays, 0, k, 3), jnp.float32)
        v_far = jnp.zeros((n_rays, 0, k), bool)
        d_far = jnp.zeros((n_rays, 0), bool)

    # reassemble in the sampler's per-ray order
    # [near prefix, free-front, behind (from the shared-ball block)]
    gidx = jnp.concatenate(
        [g_near[:, :near_count], g_far, g_near[:, near_count:]], axis=1)
    pos = jnp.concatenate(
        [p_near[:, :near_count], p_far, p_near[:, near_count:]], axis=1)
    valid = jnp.concatenate(
        [v_near[:, :near_count], v_far, v_near[:, near_count:]], axis=1)

    gidx = gidx.reshape(-1, k)
    pos = pos.reshape(-1, k, 3)
    valid = valid.reshape(-1, k)
    quat = (quats[jnp.where(gidx >= 0, jnp.minimum(gidx, mc.capacity),
                            mc.capacity)] if quats is not None else None)
    extra = ()
    if return_dropped:
        # per-sample budget-drop mask in the sampler's per-ray order (the
        # near block shares its ray's drop flag)
        n_near = near.shape[1]
        d_nearb = jnp.broadcast_to(d_near[:, None], (n_rays, n_near))
        dropped = jnp.concatenate(
            [d_nearb[:, :near_count], d_far, d_nearb[:, near_count:]],
            axis=1).reshape(-1)
        extra = (dropped,)
    if per_neighbor_vecs:
        # weighted_first=False layout: each neighbor's own (encoded) offset
        # vector is cached too (the per-neighbor decoder input)
        w, vec_blend, enc = idw_blend(coords, pos, valid, quat, pos_encode,
                                      mc.idw_eps, return_per_neighbor=True)
        return (gidx, w, vec_blend, enc) + extra
    w, vec_blend = idw_blend(coords, pos, valid, quat, pos_encode, mc.idw_eps)
    return (gidx, w, vec_blend) + extra


@partial(jax.jit, static_argnames=("mcfg",))
def pool_append(pool: PoolState, mcfg: MapperConfig, coord_world: jax.Array,
                coord_local: jax.Array, sdf_label: jax.Array, weight: jax.Array,
                valid: jax.Array, cur_ts: jax.Array,
                new_mask: jax.Array,
                sem_label: Optional[jax.Array] = None,
                color_label: Optional[jax.Array] = None,
                knn_gidx: Optional[jax.Array] = None,
                knn_w: Optional[jax.Array] = None,
                knn_vec: Optional[jax.Array] = None,
                knn_nbr_vec: Optional[jax.Array] = None) -> PoolState:
    """Ring-buffer append of one frame's samples (ref utils/mapper.py:185-199).

    TPU-first: the frame's rows are PACKED first (one wide build), then
    valid rows are compacted to the bucket front with ONE wide row-gather and
    written as ONE contiguous ``dynamic_update_slice`` — no row scatters and
    no per-column gathers.  The head advances by the VALID count, so the pool
    stays densely packed with valid samples like the reference's; the bucket's
    padded tail (marked ``ts = -1``) transiently occupies the rows just past
    the head and is overwritten by the next append.  The head resets to 0 when
    a bucket would cross the end, so a write never wraps (the overwritten rows
    are the oldest ones either way).

    ``new_mask`` flags low-certainty close-to-surface samples for boosted
    sampling (ref utils/mapper.py:274-310); their pool indices are recorded.
    ``knn_gidx`` / ``knn_w`` / ``knn_vec``: the per-sample cached kNN from
    ``append_knn`` (see the pool-row layout note).
    """
    P = mcfg.pool_capacity
    n = coord_world.shape[0]
    if n > P:
        raise ValueError(f"frame sample bucket {n} exceeds pool capacity {P}")
    head = jnp.where(pool.head + n > P, 0, pool.head)

    if knn_gidx is None:
        knn_gidx = jnp.full((n, 6), -1, jnp.int32)
    kk = knn_gidx.shape[1]

    # pack the frame bucket, THEN compact with one wide row-gather.
    # P_KNN starts at the -1 sentinel so a kk < 6 kNN never leaves column
    # zeros behind that would read back as global point id 0 (ADVICE r2 #3)
    built = jnp.zeros((n, mcfg.pool_dim), jnp.float32)
    built = built.at[:, P_KNN].set(-1.0)
    built = built.at[:, P_COORD].set(coord_world.astype(jnp.float32))
    built = built.at[:, P_LABEL].set(sdf_label)
    built = built.at[:, P_WEIGHT].set(weight)
    built = built.at[:, P_TS].set(cur_ts.astype(jnp.float32))
    built = built.at[:, P_LOCAL].set(coord_local.astype(jnp.float32))
    built = built.at[:, 9:9 + kk].set(knn_gidx.astype(jnp.float32))
    if knn_w is not None:
        built = built.at[:, 15:15 + kk].set(knn_w)
    if knn_vec is not None:
        built = built.at[:, P_VEC0:P_VEC0 + knn_vec.shape[1]].set(knn_vec)
    if knn_nbr_vec is not None:
        # (n, k, vec_dim) per-neighbor encoded offsets -> flat tail columns
        nv = knn_nbr_vec.reshape(n, -1)
        built = built.at[:, mcfg.pool_dim - nv.shape[1]:].set(nv)

    perm = jnp.nonzero(valid, size=n, fill_value=n)[0].astype(jnp.int32)
    n_valid = jnp.sum(valid, dtype=jnp.int32)
    in_valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    new_rows = jnp.where(in_valid[:, None], built[jnp.minimum(perm, n - 1)], 0.0)
    new_rows = new_rows.at[:, P_TS].set(jnp.where(in_valid, new_rows[:, P_TS], -1.0))
    new_rows = new_rows.at[:, P_KNN].set(
        jnp.where(in_valid[:, None], new_rows[:, P_KNN], -1.0))

    rows = jax.lax.dynamic_update_slice(pool.rows, new_rows, (head, 0))
    sem = (jax.lax.dynamic_update_slice(
        pool.sem_label, sem_label[jnp.minimum(perm, n - 1)] * in_valid, (head,))
        if pool.sem_label is not None else None)
    col = (jax.lax.dynamic_update_slice(
        pool.color_label,
        color_label[jnp.minimum(perm, n - 1)] * in_valid[:, None].astype(jnp.float32),
        (head, 0))
        if pool.color_label is not None else None)

    new_head = head + n_valid
    fill = jnp.minimum(jnp.maximum(pool.fill, new_head), P)

    # record the pool indices of new-region samples of this frame: positions of
    # new_mask rows WITHIN the valid-compacted order
    nm_compact = in_valid & new_mask[jnp.minimum(perm, n - 1)]
    new_idx = jnp.nonzero(nm_compact, size=mcfg.new_idx_capacity, fill_value=0)[0]
    new_pool_idx = head + new_idx.astype(jnp.int32)
    new_count = jnp.minimum(jnp.sum(nm_compact, dtype=jnp.int32),
                            mcfg.new_idx_capacity)

    return pool._replace(rows=rows,
                         sem_label=sem, color_label=col, head=new_head % P,
                         fill=fill, new_idx=new_pool_idx, new_count=new_count)


@partial(jax.jit, static_argnames=("mcfg",))
def pool_filter(pool: PoolState, mcfg: MapperConfig, origin: jax.Array) -> PoolState:
    """Window-radius compaction (ref utils/mapper.py:229-263): drop samples
    outside ``window_radius`` of the sensor, compact the survivors."""
    P = mcfg.pool_capacity
    in_fill = (jnp.arange(P + 1, dtype=jnp.int32) < pool.fill) \
        & (pool.rows[:, P_TS] >= 0.0)
    d2 = jnp.sum((pool.rows[:, P_COORD] - origin) ** 2, axis=-1)
    keep = in_fill & (d2 < mcfg.window_radius**2)
    perm = jnp.nonzero(keep, size=P + 1, fill_value=P)[0].astype(jnp.int32)
    count = jnp.sum(keep, dtype=jnp.int32)
    rows = pool.rows[perm]
    rows = rows.at[P].set(
        jnp.zeros((mcfg.pool_dim,), jnp.float32).at[P_KNN].set(-1.0))
    return pool._replace(
        rows=rows,
        sem_label=pool.sem_label[perm] if pool.sem_label is not None else None,
        color_label=pool.color_label[perm] if pool.color_label is not None else None,
        head=count % P,
        fill=count,
        new_count=jnp.zeros((), jnp.int32),  # frame indices invalidated by compaction
    )


@jax.jit
def pool_retransform(pool: PoolState, poses: jax.Array) -> PoolState:
    """Re-derive world coords of the whole pool from (updated) per-frame poses —
    used after PGO / BA (ref utils/mapper.py:381-383 ``transform_data_pool``)."""
    T = poses[jnp.maximum(pool.ts, 0)]
    coord = jnp.einsum("nij,nj->ni", T[:, :3, :3], pool.local_coord) + T[:, :3, 3]
    return pool._replace(rows=pool.rows.at[:, P_COORD].set(coord))


@partial(jax.jit, static_argnames=("mc", "pos_encode"))
def pool_refresh_cache(pool: PoolState, state_attr_rows: jax.Array,
                       mc, pos_encode=None) -> PoolState:
    """Recompute every pool row's cached kNN geometry (weights + blended
    offset vector) from the CURRENT global point positions/quaternions —
    called after PGO map deformation or BA pose refinement has moved either
    the neural points or the samples (the neighbor SETS stay frozen; the
    reference instead re-queries per batch and so picks the deformation up
    implicitly, model/neural_points.py:574-632 after adjust_map)."""
    cap = mc.capacity
    gidx = pool.rows[:, P_KNN].astype(jnp.int32)            # (P+1, k)
    safe = jnp.where(gidx >= 0, jnp.minimum(gidx, cap), cap)
    rows = state_attr_rows[safe]                            # (P+1, k, 16)
    nbr_pos = rows[..., :3]
    quat = rows[..., 3:7]           # non-identity once PGO has deformed the map
    coord = pool.rows[:, P_COORD]
    d = nbr_pos - coord[:, None, :]
    valid = (gidx >= 0) & (jnp.sum(d * d, axis=-1) <= mc.max_valid_dist2)
    w, vec_blend, enc = idw_blend(coord, nbr_pos, valid, quat, pos_encode,
                                  mc.idw_eps, return_per_neighbor=True)
    new_rows = pool.rows.at[:, P_W].set(w)
    vd = vec_blend.shape[-1]
    new_rows = new_rows.at[:, P_VEC0:P_VEC0 + vd].set(vec_blend)
    if pool.rows.shape[1] > P_VEC0 + vd:   # per-neighbor layout present
        new_rows = new_rows.at[:, P_VEC0 + vd:].set(
            enc.reshape(enc.shape[0], -1))
    return pool._replace(rows=new_rows)


# ----------------------------------------------------------------------
# training step
# ----------------------------------------------------------------------


class TrainableParams(NamedTuple):
    features: jax.Array                 # local map geo features (L+1, F)
    color_features: Optional[jax.Array]
    geo: dec.DecoderParams
    sem: Optional[dec.DecoderParams]
    color: Optional[dec.DecoderParams]


class AdamState(NamedTuple):
    count: jax.Array   # () i32
    m: TrainableParams  # first moments (same pytree as params)
    v: TrainableParams  # second moments


def _fused_adam(mcfg: MapperConfig):
    """Adam(0.9, 0.99, eps=1e-15) identical to ``optax.adam`` math
    (ref utils/tools.py:89-116, utils/config.py:240-247), but computed in ONE
    tree pass so XLA emits one fused read(g,m,v,p)/write(m,v,p) kernel per
    leaf — the optax scale_by_adam -> scale -> apply_updates chain measured
    ~1.9 ms/iter of unfused elementwise passes over the feature table."""
    b1, b2, lr, eps = 0.9, 0.99, mcfg.lr, mcfg.adam_eps

    def init(params) -> AdamState:
        z = jax.tree.map(jnp.zeros_like, params)
        return AdamState(count=jnp.zeros((), jnp.int32), m=z,
                         v=jax.tree.map(jnp.zeros_like, params))

    def step(params, grads, st: AdamState):
        c = st.count + 1
        bc1 = 1.0 - b1 ** c.astype(jnp.float32)
        bc2 = 1.0 - b2 ** c.astype(jnp.float32)

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = jax.tree.leaves(grads)
        flat_m = jax.tree.leaves(st.m)
        flat_v = jax.tree.leaves(st.v)
        new_p, new_m, new_v = [], [], []
        for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            new_p.append(p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps))
            new_m.append(m)
            new_v.append(v)
        return (jax.tree.unflatten(treedef, new_p),
                AdamState(count=c, m=jax.tree.unflatten(treedef, new_m),
                          v=jax.tree.unflatten(treedef, new_v)))

    return init, step


def make_optimizer(mcfg: MapperConfig):
    """Adam(0.9, 0.99, eps=1e-15) over features + decoders
    (ref utils/tools.py:89-116, utils/config.py:240-247)."""
    return optax.adam(learning_rate=mcfg.lr, b1=0.9, b2=0.99, eps=mcfg.adam_eps)


def _sample_batch_indices(key, pool: PoolState, mcfg: MapperConfig, use_new: jax.Array,
                          num_iters: int):
    """Mixed new/history batches for ALL iterations at once (ref
    utils/mapper.py:323-338): up to bs_new from the newly-observed set, the
    rest uniform over the pool.  Returns (num_iters, bs) i32.

    Generated OUTSIDE the training scan: in-loop RNG key slicing/splitting
    serializes the scan on tiny SMEM scalar kernels (~2 ms/iter measured),
    while one fused batch of randints is a single cheap vector kernel.
    """
    k1, k2 = jax.random.split(key)
    fill = jnp.maximum(pool.fill, 1)
    idx_hist = jax.random.randint(k1, (num_iters, mcfg.bs), 0, fill)
    n_new = jnp.minimum(pool.new_count, mcfg.bs_new_sample) * use_new.astype(jnp.int32)
    pick = jax.random.randint(k2, (num_iters, mcfg.bs_new_sample), 0,
                              jnp.maximum(pool.new_count, 1))
    idx_new = pool.new_idx[pick]
    # the last n_new slots of each batch come from the new set
    slot = jnp.arange(mcfg.bs)[None, :]
    take_new = slot >= (mcfg.bs - n_new)
    new_for_slot = jnp.take_along_axis(
        idx_new, jnp.clip(slot - (mcfg.bs - n_new), 0, mcfg.bs_new_sample - 1), axis=1)
    return jnp.where(take_new, new_for_slot, idx_hist)


def _query_sdf(lm, mc, mcfg, offsets, pts, params: TrainableParams, after_pgo):
    """kNN + interpolate + decode at pts. Returns (sdf, knn, weights, features)."""
    knn = npts.knn_search(lm, mc, pts, offsets)
    lmf = lm._replace(geo_features=params.features)
    geo_feat, _, w, _ = npts.interpolate_features(lmf, mc, pts, knn.lidx, after_pgo=after_pgo)
    sdf_pred, _ = dec.blended_sdf(params.geo, geo_feat, w, mc.weighted_first, mcfg.sdf_scale)
    return sdf_pred, knn, w, geo_feat


def init_opt_state(mcfg: MapperConfig, params: TrainableParams) -> AdamState:
    """Fresh Adam moments for the mapping loop (re-inited per frame, matching
    the reference's per-frame ``setup_optimizer``, utils/mapper.py:430-441)."""
    return _fused_adam(mcfg)[0](params)


@partial(jax.jit, static_argnames=("mc", "mcfg", "num_iters"))
def mapping_loop(lm: npts.LocalMap, mc: npts.MapConfig,
                 params: TrainableParams, opt_state: AdamState, pool: PoolState,
                 mcfg: MapperConfig, offsets: jax.Array,
                 key: jax.Array, decoder_lr_scale: jax.Array,
                 use_new: jax.Array, after_pgo: jax.Array, num_iters: int):
    """The per-frame training loop, fully fused on device
    (ref utils/mapper.py:425-593 ``mapping``).

    Returns (lm with updated certainties, params, opt_state, loss_history).

    TPU-first (fast path, weighted_first & no layer-norm): everything that
    does NOT depend on the trained features is hoisted OUT of the iteration
    scan and batched over all ``num_iters`` iterations at once — the pool-row
    gather, the kNN hash probe, the IDW weights/offset blend (pure geometry),
    and the certainty/ts bookkeeping (one scatter for the whole frame).  The
    scan body is left with just: feature gather -> blend -> MLP -> backward
    scatter -> fused Adam.  Profiled on v5e this cuts the serialized per-iter
    cost from ~11.7 ms to the gather+scatter+Adam core.
    """
    if mc.weighted_first and not mc.layer_norm_on:
        return _mapping_loop_fast(lm, mc, params, opt_state, pool, mcfg,
                                  offsets, key, decoder_lr_scale, use_new,
                                  after_pgo, num_iters)
    return _mapping_loop_general(lm, mc, params, opt_state, pool, mcfg,
                                 offsets, key, decoder_lr_scale, use_new,
                                 after_pgo, num_iters)


def _mapping_loop_general(lm: npts.LocalMap, mc: npts.MapConfig,
                          params: TrainableParams, opt_state: AdamState,
                          pool: PoolState, mcfg: MapperConfig, offsets: jax.Array,
                          key: jax.Array, decoder_lr_scale: jax.Array,
                          use_new: jax.Array, after_pgo: jax.Array, num_iters: int):
    """Reference-shaped per-iteration path (per-neighbor decoding and/or
    feature layer-norm, where the interpolation depends on the features)."""
    _, adam_step = _fused_adam(mcfg)
    dec_ = mcfg.gradient_decimation
    n_grad = mcfg.bs // dec_
    L = mc.local_capacity

    def one_iter(carry, idx):
        params_c, opt_state_c, cert_acc, ts_acc = carry
        lm_c = lm
        batch_rows = pool.rows[idx]                       # ONE packed gather
        coord = batch_rows[:, P_COORD]
        sdf_label = batch_rows[:, P_LABEL]
        weight = jnp.abs(batch_rows[:, P_WEIGHT])
        ts_batch = batch_rows[:, P_TS].astype(jnp.int32)
        # rows are written densely per frame; padded-ray rows carry ts = -1
        in_pool = (idx < pool.fill) & (batch_rows[:, P_TS] >= 0.0)

        # kNN is pure indexing — hoist it out of the differentiated fn
        knn = npts.knn_search(lm_c, mc, coord, offsets)

        # eikonal stencil points: +-eps along each axis on a decimated subset
        # (ref utils/mapper.py:683-733).  The stencil offset (0.2*voxel) is far
        # inside the neighborhood validity radius, so the base point's kNN set
        # is reused for all 6 stencil points instead of re-probing the hash —
        # the interpolation distances/weights are still recomputed exactly.
        if mcfg.ekional_loss_on:
            sub = coord[:n_grad]
            eps_mat = jnp.eye(3, dtype=coord.dtype) * mcfg.num_grad_step
            stencil = jnp.concatenate(
                [sub[None] + eps_mat[:, None, :], sub[None] - eps_mat[:, None, :]], axis=0
            ).reshape(-1, 3)  # (6*n_grad, 3)
            knn_st_lidx = jnp.tile(knn.lidx[:n_grad], (6, 1))
        else:
            stencil, knn_st_lidx = None, None

        def loss_fn(p: TrainableParams):
            lmf = lm_c._replace(geo_features=p.features)
            geo_feat, _, w, _ = npts.interpolate_features(lmf, mc, coord, knn.lidx,
                                                          after_pgo=after_pgo)
            sdf_pred, _ = dec.blended_sdf(p.geo, geo_feat, w, mc.weighted_first,
                                          mcfg.sdf_scale)
            loss = losses.sdf_bce_loss(sdf_pred, sdf_label, mcfg.sigma_sigmoid,
                                       weight, mcfg.loss_weight_on, valid=in_pool)
            aux = {"sdf_loss": loss, "w": jax.lax.stop_gradient(w)}

            if mcfg.ekional_loss_on:
                geo_st, _, w_st, _ = npts.interpolate_features(lmf, mc, stencil, knn_st_lidx,
                                                               after_pgo=after_pgo)
                sdf_st_flat, _ = dec.blended_sdf(p.geo, geo_st, w_st, mc.weighted_first,
                                                 mcfg.sdf_scale)
                sdf_st = sdf_st_flat.reshape(6, n_grad)
                g = jnp.stack(
                    [(sdf_st[0] - sdf_st[3]), (sdf_st[1] - sdf_st[4]), (sdf_st[2] - sdf_st[5])],
                    axis=-1) / (2.0 * mcfg.num_grad_step)
                eik = losses.eikonal_loss(g, valid=in_pool[:n_grad])
                loss = loss + mcfg.weight_e * eik
                aux["eikonal_loss"] = eik
                aux["w_st"] = jax.lax.stop_gradient(w_st)

            if mcfg.semantic_on and p.sem is not None:
                sem_logp = dec.blended_head(dec.sem_label_prob, p.sem, geo_feat, w,
                                            mc.weighted_first)
                sem_lab = pool.sem_label[idx]
                sem_valid = in_pool & (sem_lab > 0)
                sem_l = losses.sem_nll_loss(sem_logp, sem_lab, valid=sem_valid)
                loss = loss + mcfg.weight_s * sem_l
                aux["sem_loss"] = sem_l

            if mcfg.color_on and p.color is not None:
                lmc = lmf._replace(color_features=p.color_features)
                _, color_feat, _, _ = npts.interpolate_features(
                    lmc, mc, coord, knn.lidx, after_pgo=after_pgo, query_color=True)
                color_pred = dec.blended_head(dec.regress_color, p.color, color_feat,
                                              w, mc.weighted_first)
                surf = in_pool & (jnp.abs(sdf_label) < mcfg.surface_sample_range)
                col_l = losses.color_diff_loss(color_pred, pool.color_label[idx],
                                               weight, mcfg.loss_weight_on, valid=surf)
                loss = loss + mcfg.weight_i * col_l
                aux["color_loss"] = col_l

            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_c)

        # decoder freeze: scale decoder grads by 0/1 (ref utils/tools.py:199-206)
        grads = grads._replace(
            geo=jax.tree.map(lambda g: g * decoder_lr_scale, grads.geo),
            sem=jax.tree.map(lambda g: g * decoder_lr_scale, grads.sem)
            if grads.sem is not None else None,
            color=jax.tree.map(lambda g: g * decoder_lr_scale, grads.color)
            if grads.color is not None else None,
        )
        params_c, opt_state_c = adam_step(params_c, grads, opt_state_c)
        # keep the sentinel feature row pinned at zero
        params_c = params_c._replace(
            features=params_c.features.at[mc.local_capacity].set(0.0))

        # certainty bookkeeping (ref model/neural_points.py:634-652).
        # TPU-first: accumulate into flat (L+1,) vectors carried by the scan
        # instead of scattering into the strided attr rows every iteration
        # (strided scatters profiled at ~0.7 ms each per iter); the fold into
        # attr columns happens ONCE after the scan.  The stencil's 6 replicas
        # share the base point's kNN set, so their weights are pre-reduced and
        # merged into the same single scatter-add.
        valid_k = knn.lidx < L
        idxf = jnp.where(valid_k, knn.lidx, L)
        wf = jnp.where(valid_k, aux["w"], 0.0)
        if mcfg.ekional_loss_on:
            w_st_sum = aux["w_st"].reshape(6, n_grad, -1).sum(axis=0)
            idxf = jnp.concatenate([idxf.reshape(-1), idxf[:n_grad].reshape(-1)])
            wf = jnp.concatenate(
                [wf.reshape(-1),
                 jnp.where(valid_k[:n_grad], w_st_sum, 0.0).reshape(-1)])
        else:
            idxf, wf = idxf.reshape(-1), wf.reshape(-1)
        cert_acc = cert_acc.at[idxf].add(wf)
        tsb = jnp.broadcast_to(ts_batch[:, None], valid_k.shape).astype(jnp.float32)
        ts_acc = ts_acc.at[jnp.where(valid_k, knn.lidx, L).reshape(-1)].max(
            jnp.where(valid_k, tsb, 0.0).reshape(-1))

        return (params_c, opt_state_c, cert_acc, ts_acc), loss

    idx_all = _sample_batch_indices(key, pool, mcfg, use_new, num_iters)
    acc0 = jnp.zeros((L + 1,), jnp.float32)
    (params, opt_state, cert_acc, ts_acc), loss_hist = jax.lax.scan(
        one_iter, (params, opt_state, acc0, acc0), idx_all)

    # fold the accumulators into the attribute columns (one vector pass)
    attr = lm.attr_rows
    attr = attr.at[:, npts.C_CERT].set(attr[:, npts.C_CERT] + cert_acc)
    attr = attr.at[:, npts.C_TSU].set(jnp.maximum(attr[:, npts.C_TSU], ts_acc))
    attr = attr.at[L].set(npts._attr_sentinel_row())
    lm = lm._replace(attr_rows=attr)
    return lm, params, opt_state, loss_hist


def _mapping_loop_fast(lm: npts.LocalMap, mc: npts.MapConfig,
                       params: TrainableParams, opt_state: AdamState,
                       pool: PoolState, mcfg: MapperConfig, offsets: jax.Array,
                       key: jax.Array, decoder_lr_scale: jax.Array,
                       use_new: jax.Array, after_pgo: jax.Array, num_iters: int):
    """Hoisted training loop (weighted-first interpolation, no layer-norm).

    Produces the same numbers as ``_mapping_loop_general``: the IDW weights and
    offset-vector blends are pure geometry (independent of the trainable
    features), so they are computed for ALL iterations in one batched pass;
    the scan body keeps only the feature-dependent work.
    """
    from pin_slam_tpu.ops.encodings import positional_encode

    _, adam_step = _fused_adam(mcfg)
    T, B, k = num_iters, mcfg.bs, min(mc.nn_k, offsets.shape[0])
    L = mc.local_capacity
    eik = mcfg.ekional_loss_on
    n_grad = B // mcfg.gradient_decimation if eik else 0

    def encode_vec(vec):
        if mc.pos_encoding_band > 0:
            return positional_encode(vec, mc.pos_encoding_band,
                                     mc.pos_encoding_freq, mc.pos_encoding_base,
                                     mc.use_gaussian_pe)
        return vec

    def geometry(coords, valid, nbr_pos, quat):
        """IDW weights + blended (encoded) offset vectors at fixed neighbors.
        coords (...,3), valid (...,k), nbr_pos (...,k,3), quat (...,k,4)
        -> (w, vec_blend)."""
        vec = coords[..., None, :] - nbr_pos
        dist2 = jnp.sum(vec * vec, axis=-1)
        dist2 = jnp.where(valid, dist2, npts._INVALID_DIST2)
        vec_rot = apply_quaternion_rotation(quat, vec)
        vec = jnp.where(jnp.asarray(after_pgo), vec_rot, vec)
        vec = jnp.where(valid[..., None], vec, 0.0)

        w = 1.0 / (dist2 + mc.idw_eps)
        w = jnp.where(valid, w, 0.0)
        nn_any = jnp.any(valid, axis=-1, keepdims=True)
        w = jnp.where(nn_any, w, mc.idw_eps)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        w = jnp.where(valid, w, 0.0)

        vec_blend = jnp.einsum("...k,...kp->...p", w, encode_vec(vec))
        return w, vec_blend

    # ---- all iterations' batches at once ----
    idx_all = _sample_batch_indices(key, pool, mcfg, use_new, num_iters)  # (T,B)
    flat_idx = idx_all.reshape(-1)
    rows = pool.rows[flat_idx]                              # ONE packed gather
    coord = rows[:, P_COORD]                                # (T*B,3)
    labels = rows[:, P_LABEL].reshape(T, B)
    weights = jnp.abs(rows[:, P_WEIGHT]).reshape(T, B)
    ts_flat = rows[:, P_TS]
    in_pool = ((flat_idx < pool.fill) & (ts_flat >= 0.0)).reshape(T, B)

    knn = npts.knn_search(lm, mc, coord, offsets)           # (T*B,k)
    valid_k = knn.lidx < L
    safe_idx = jnp.where(valid_k, knn.lidx, L)
    pose = lm.attr_rows[safe_idx]                           # (T*B,k,16) ONE gather
    nbr_pos, quat = pose[..., npts.C_POS], pose[..., npts.C_QUAT]
    w, vec_blend = geometry(coord, valid_k, nbr_pos, quat)

    sem_lab = pool.sem_label[idx_all] if (mcfg.semantic_on and params.sem is not None) else None
    col_lab = pool.color_label[flat_idx].reshape(T, B, -1) \
        if (mcfg.color_on and params.color is not None) else None

    # ---- eikonal stencil geometry (shares the base points' kNN sets,
    # ref utils/mapper.py:683-733 + the reuse note in the general path) ----
    if eik:
        # the stencil shares the base points' neighbor sets, so their gathered
        # pose rows are REUSED (broadcast) — no second 884k-row attr gather
        coord_r = coord.reshape(T, B, 3)[:, :n_grad]        # (T,n,3)
        eps_mat = jnp.eye(3, dtype=coord.dtype) * mcfg.num_grad_step
        stencil = jnp.concatenate(
            [coord_r[:, None] + eps_mat[None, :, None, :],
             coord_r[:, None] - eps_mat[None, :, None, :]], axis=1)  # (T,6,n,3)
        valid_b = valid_k.reshape(T, B, k)[:, :n_grad]      # (T,n,k)
        nbr_b = nbr_pos.reshape(T, B, k, 3)[:, :n_grad]
        quat_b = quat.reshape(T, B, k, 4)[:, :n_grad]
        w_st, vecb_st = geometry(
            stencil,
            jnp.broadcast_to(valid_b[:, None], (T, 6, n_grad, k)),
            jnp.broadcast_to(nbr_b[:, None], (T, 6, n_grad, k, 3)),
            jnp.broadcast_to(quat_b[:, None], (T, 6, n_grad, k, 4)))
        vecb_st = vecb_st.reshape(T, 6 * n_grad, -1)
    else:
        w_st = jnp.zeros((T, 0, 0, k), jnp.float32)
        vecb_st = jnp.zeros((T, 0, vec_blend.shape[-1]), jnp.float32)

    # ---- certainty / ts bookkeeping for the WHOLE frame in one pass
    # (ref model/neural_points.py:634-652; same totals as per-iter updates) ----
    cert_acc = jnp.zeros((L + 1,), jnp.float32)
    wf = jnp.where(valid_k, w, 0.0).reshape(-1)
    idxf = safe_idx.reshape(-1)
    if eik:
        w_st_sum = w_st.sum(axis=1).reshape(-1, k)          # (T*n,k) 6 replicas
        valid_b = valid_k.reshape(T, B, k)[:, :n_grad].reshape(-1, k)
        idx_b = safe_idx.reshape(T, B, k)[:, :n_grad].reshape(-1, k)
        idxf = jnp.concatenate([idxf, idx_b.reshape(-1)])
        wf = jnp.concatenate([wf, jnp.where(valid_b, w_st_sum, 0.0).reshape(-1)])
    cert_acc = cert_acc.at[idxf].add(wf)
    ts_b = jnp.broadcast_to(ts_flat.reshape(T, B)[..., None], (T, B, k))
    ts_acc = jnp.zeros((L + 1,), jnp.float32).at[safe_idx.reshape(-1)].max(
        jnp.where(valid_k, ts_b.reshape(-1, k), 0.0).reshape(-1))

    attr = lm.attr_rows
    attr = attr.at[:, npts.C_CERT].set(attr[:, npts.C_CERT] + cert_acc)
    attr = attr.at[:, npts.C_TSU].set(jnp.maximum(attr[:, npts.C_TSU], ts_acc))
    attr = attr.at[L].set(npts._attr_sentinel_row())
    lm_out = lm._replace(attr_rows=attr)

    # ---- the scan: only feature-dependent work ----
    xs = dict(
        safe_idx=safe_idx.reshape(T, B, k), w=w.reshape(T, B, k),
        vec_blend=vec_blend.reshape(T, B, -1), label=labels, weight=weights,
        in_pool=in_pool, w_st=w_st, vecb_st=vecb_st)
    if sem_lab is not None:
        xs["sem_lab"] = sem_lab
    if col_lab is not None:
        xs["col_lab"] = col_lab

    def one_iter(carry, x):
        params_c, opt_c = carry

        def loss_fn(p: TrainableParams):
            feats = p.features[x["safe_idx"]]               # (B,k,F) one gather
            geo_feat = jnp.concatenate(
                [jnp.einsum("bk,bkf->bf", x["w"], feats), x["vec_blend"]], -1)
            sdf_pred = dec.sdf(p.geo, geo_feat, mcfg.sdf_scale)
            loss = losses.sdf_bce_loss(sdf_pred, x["label"], mcfg.sigma_sigmoid,
                                       x["weight"], mcfg.loss_weight_on,
                                       valid=x["in_pool"])
            if eik:
                f_base = feats[:n_grad]                     # reuse, no re-gather
                st_feat = jnp.einsum("jnk,nkf->jnf", x["w_st"], f_base)
                geo_st = jnp.concatenate(
                    [st_feat.reshape(6 * n_grad, -1), x["vecb_st"]], -1)
                sdf_st = dec.sdf(p.geo, geo_st, mcfg.sdf_scale).reshape(6, n_grad)
                g = jnp.stack([sdf_st[0] - sdf_st[3], sdf_st[1] - sdf_st[4],
                               sdf_st[2] - sdf_st[5]], -1) / (2.0 * mcfg.num_grad_step)
                loss = loss + mcfg.weight_e * losses.eikonal_loss(
                    g, valid=x["in_pool"][:n_grad])
            if "sem_lab" in x and p.sem is not None:
                sem_logp = dec.sem_label_prob(p.sem, geo_feat)
                sem_valid = x["in_pool"] & (x["sem_lab"] > 0)
                loss = loss + mcfg.weight_s * losses.sem_nll_loss(
                    sem_logp, x["sem_lab"], valid=sem_valid)
            if "col_lab" in x and p.color is not None:
                cfeats = p.color_features[x["safe_idx"]]
                color_feat = jnp.concatenate(
                    [jnp.einsum("bk,bkf->bf", x["w"], cfeats), x["vec_blend"]], -1)
                color_pred = dec.regress_color(p.color, color_feat)
                surf = x["in_pool"] & (jnp.abs(x["label"]) < mcfg.surface_sample_range)
                loss = loss + mcfg.weight_i * losses.color_diff_loss(
                    color_pred, x["col_lab"], x["weight"], mcfg.loss_weight_on,
                    valid=surf)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params_c)
        grads = grads._replace(
            geo=jax.tree.map(lambda g: g * decoder_lr_scale, grads.geo),
            sem=jax.tree.map(lambda g: g * decoder_lr_scale, grads.sem)
            if grads.sem is not None else None,
            color=jax.tree.map(lambda g: g * decoder_lr_scale, grads.color)
            if grads.color is not None else None)
        params_c, opt_c = adam_step(params_c, grads, opt_c)
        params_c = params_c._replace(features=params_c.features.at[L].set(0.0))
        return (params_c, opt_c), loss

    (params, opt_state), loss_hist = jax.lax.scan(one_iter, (params, opt_state), xs)
    return lm_out, params, opt_state, loss_hist
def kernel_path_supported(mc: npts.MapConfig, mcfg: MapperConfig,
                          geo: dec.DecoderParams) -> bool:
    """Whether the Pallas fused-iteration kernels cover this configuration
    (ops/train_kernel.py): geo-only heads, single hidden layer with bias,
    no feature layer-norm, tile-divisible batch."""
    return (not mcfg.semantic_on and not mcfg.color_on
            and not mc.layer_norm_on
            and len(geo.hidden) == 1
            and geo.hidden[0][1] is not None and geo.out[1] is not None
            and mcfg.bs % 128 == 0   # 16 tiles x 8-sublane blocks
            and (mcfg.bs // mcfg.gradient_decimation > 0
                 or not mcfg.ekional_loss_on))


@partial(jax.jit, static_argnames=("mc", "mcfg", "num_iters", "after_pgo",
                                   "pos_encode", "axis_name", "unroll",
                                   "use_kernel"))
def mapping_loop_cached(lm: npts.LocalMap, mc: npts.MapConfig,
                        params: TrainableParams, opt_state: AdamState,
                        pool: PoolState,
                        mcfg: MapperConfig, key: jax.Array,
                        decoder_lr_scale: jax.Array, use_new: jax.Array,
                        num_iters: int, after_pgo: bool = False,
                        pos_encode=None, axis_name=None, unroll: int = 1,
                        use_kernel: bool = False):
    """The per-frame training loop with POOL-CACHED kNN — the TPU-native
    production path (ref utils/mapper.py:425-593 ``mapping``).

    Design (see the pool-row layout note): every batch row carries its k=6
    global neighbor indices PLUS the precomputed IDW weights and blended
    offset vector, so an iteration is pure dense math + one feature gather +
    one backward scatter — no hash probe, no neighbor attribute gathers, no
    per-batch geometry.  The cached GLOBAL indices are remapped to LOCAL rows
    once per frame (one narrow gather from a dense rank table): training
    still operates on the compact (L+1, F+1) LOCAL feature table, which is
    cache-resident — measured 6x faster for both the scan's gather and its
    backward scatter than the (cap+1) global table.  Neighbors outside the
    current local-map window map to the sentinel row (their cached weight is
    zeroed, their feature contribution drops out), which matches the
    reference's travel-window query filter (model/neural_points.py:480-488).
    Only the eikonal stencil still touches neighbor positions — for the
    DECIMATED subset only, one small gather per frame.

    ``params.features`` is the (L+1, F+1) local feature table where column
    F is the CERTAINTY CHANNEL: a loss term ``sum(w * feats[:, F])`` makes the
    autodiff backward scatter deliver the per-point IDW-weight sums
    (ref model/neural_points.py:634-652 certainty accumulation) in the SAME
    scatter as the feature gradients — column F's raw gradient is extracted
    per iteration and zeroed before Adam, and its values stay pinned at 0.

    Returns (lm with updated cert/ts bookkeeping, params, opt_state,
    loss_hist); the caller writes features back to the global map via
    ``assign_local_to_global`` exactly as the legacy paths do.

    ``axis_name``: when set (inside ``shard_map``), runs DATA-PARALLEL over
    the batch axis: each device samples its own batch shard (key folded with
    the axis index), per-device gradients are ``pmean``-reduced over ICI
    before the (replicated, identical) Adam update — the standard pjit DP
    recipe; ``mcfg.bs`` is then the PER-DEVICE batch (see
    parallel.mesh.make_sharded_mapping_loop).
    """
    _, adam_step = _fused_adam(mcfg)
    if axis_name is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        axis_size = jax.lax.psum(1, axis_name)
    T, B = num_iters, mcfg.bs
    F = params.features.shape[1] - 1                      # feature dim (col F = cert)
    L = mc.local_capacity
    cap = mc.capacity
    k = 6
    eik = mcfg.ekional_loss_on
    n_grad = B // mcfg.gradient_decimation if eik else 0

    # ---- all iterations' batches at once: ONE wide row gather ----
    idx_all = _sample_batch_indices(key, pool, mcfg, use_new, num_iters)  # (T,B)
    flat_idx = idx_all.reshape(-1)
    rows = pool.rows[flat_idx]                            # (T*B, pool_dim)
    labels = rows[:, P_LABEL].reshape(T, B)
    weights = jnp.abs(rows[:, P_WEIGHT]).reshape(T, B)
    ts_flat = rows[:, P_TS]
    in_pool = ((flat_idx < pool.fill) & (ts_flat >= 0.0)).reshape(T, B)
    gidx = rows[:, P_KNN].astype(jnp.int32)               # (T*B, k)

    # global -> local remap via the dense member-rank table
    rank = jnp.cumsum(lm.member_mask.astype(jnp.int32)) - 1   # (cap+1,)
    local_of = jnp.where(lm.member_mask, jnp.minimum(rank, L), L)
    lidx = local_of[jnp.where(gidx >= 0, jnp.minimum(gidx, cap), cap)]
    valid_k = (gidx >= 0) & (lidx < L)
    safe_g = jnp.where(valid_k, lidx, L)

    # newest pool ts among this frame's samples — the ts_update proxy folded
    # into touched points after the scan (see the fold below)
    ts_proxy = jnp.max(jnp.where(in_pool, ts_flat.reshape(T, B), 0.0))
    if axis_name is not None:
        ts_proxy = jax.lax.pmax(ts_proxy, axis_name)

    # cached geometry (computed once at append time; refreshed on PGO/BA
    # deformation).  A neighbor that has since LEFT the local-map window gets
    # its weight zeroed (feature contribution drops out, like the reference's
    # travel filter); the remaining weights keep their append-time
    # normalization, consistent with the cached blended offset vector.
    w = jnp.where(valid_k, rows[:, P_W], 0.0)             # (T*B, k)
    VD = mcfg.vec_dim
    vec_blend = rows[:, P_VEC0:P_VEC0 + VD]
    wf_first = mcfg.weighted_first
    nbr_vec = (None if wf_first
               else rows[:, P_VEC0 + VD:].reshape(-1, k, VD))  # (T*B,k,VD)

    sem_lab = pool.sem_label[idx_all] if (mcfg.semantic_on and params.sem is not None) else None
    col_lab = pool.color_label[flat_idx].reshape(T, B, -1) \
        if (mcfg.color_on and params.color is not None) else None

    # ---- eikonal stencil geometry: shares the base points' kNN sets, but
    # needs fresh per-stencil distances -> ONE small neighbor-position gather
    # over the decimated subset (ref utils/mapper.py:683-733) ----
    if eik:
        # slice the decimated rows FIRST: extracting full-width (T*B, 3)
        # coords materializes a 125 MB tile-padded array for a 1/decimation
        # subset
        coord_r = rows.reshape(T, B, -1)[:, :n_grad, 0:3]
        eps_mat = jnp.eye(3, dtype=coord_r.dtype) * mcfg.num_grad_step
        stencil = jnp.concatenate(
            [coord_r[:, None] + eps_mat[None, :, None, :],
             coord_r[:, None] - eps_mat[None, :, None, :]], axis=1)  # (T,6,n,3)
        valid_b = valid_k.reshape(T, B, k)[:, :n_grad]
        sg_b = safe_g.reshape(T, B, k)[:, :n_grad]        # (T,n,k) local rows
        pose_b = lm.attr_rows[sg_b]                       # (T,n,k,16) small gather
        nbr_b = pose_b[..., :3]
        quat_b = pose_b[..., 3:7] if after_pgo else None
        w_st, vecb_st, enc_st = idw_blend(
            stencil,
            jnp.broadcast_to(nbr_b[:, None], (T, 6, n_grad, k, 3)),
            jnp.broadcast_to(valid_b[:, None], (T, 6, n_grad, k)),
            jnp.broadcast_to(quat_b[:, None], (T, 6, n_grad, k, 4))
            if after_pgo else None,
            pos_encode, mc.idw_eps, return_per_neighbor=True)
        vecb_st = vecb_st.reshape(T, 6 * n_grad, -1)
        nvec_st = enc_st.reshape(T, 6 * n_grad, k, VD)
    else:
        w_st = jnp.zeros((T, 0, 0, k), jnp.float32)
        vecb_st = jnp.zeros((T, 0, VD), jnp.float32)
        nvec_st = jnp.zeros((T, 0, k, VD), jnp.float32)

    # FLAT (T, B*k)/(T, B*VD) trailing layouts: a (T, B, k) scan input
    # tile-pads its k=6 minor dim to 128 (21x memory expansion, ~125 MB per
    # array at run_kitti shapes); the per-iteration fns view (B,k)/(B,VD)
    xs = dict(
        safe_g=safe_g.reshape(T, B * k),
        w=jnp.where(valid_k, w, 0.0).reshape(T, B * k),
        vec_blend=vec_blend.reshape(T, B * VD), label=labels, weight=weights,
        in_pool=in_pool, w_st=w_st, vecb_st=vecb_st)
    if not wf_first:
        # FLAT (T, B, k*VD) layout: the natural (T, B, k, VD) shape tile-pads
        # its (k=6, VD=3) minor dims to (8, 128) on TPU — a 57x memory
        # expansion (~1 GB materialized at run_kitti shapes) carried through
        # the scan; consumers reshape the minor dims back per use site
        xs["nbr_vec"] = nbr_vec.reshape(T, B, k * VD)
        xs["nvec_st"] = nvec_st.reshape(T, nvec_st.shape[1], k * VD)
    if sem_lab is not None:
        xs["sem_lab"] = sem_lab
    if col_lab is not None:
        xs["col_lab"] = col_lab

    if use_kernel:
        # ---- Pallas fused-iteration path (ops/train_kernel.py): the scan
        # body becomes gather -> kernel -> scatter-add -> fused Adam.  The
        # batch-wide masked-mean denominators are folded into premultiplied
        # per-row weights here so the kernels stay tile-local. ----
        from pin_slam_tpu.ops import train_kernel as tkn

        W1_, b1_ = params.geo.hidden[0]
        Hdim = W1_.shape[1]
        kcfg = tkn.TrainKernelConfig(
            B=B, k=k, F=F, VD=VD, H=Hdim, sigma=mcfg.sigma_sigmoid,
            scale=mcfg.sdf_scale, weighted_first=wf_first)
        ecfg = tkn.EikKernelConfig(
            n=n_grad, k=k, F=F, VD=VD, H=Hdim, scale=mcfg.sdf_scale,
            step=mcfg.num_grad_step, weighted_first=wf_first) if eik else None
        interp = jax.default_backend() == "cpu"

        inp_f = in_pool.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(inp_f, axis=1), 1.0)
        wt_base = weights if mcfg.loss_weight_on else jnp.ones_like(weights)
        xs["wt_eff"] = wt_base * inp_f / denom[:, None]
        if eik:
            inp_e = inp_f[:, :n_grad]
            denom_e = jnp.maximum(jnp.sum(inp_e, axis=1), 1.0)
            xs["esc"] = mcfg.weight_e * inp_e / denom_e[:, None]
            xs["wst2"] = xs.pop("w_st").reshape(T, 6 * n_grad, k)
            if not wf_first:
                xs["nvst2"] = xs.pop("nvec_st")      # already (T, 6n, k*VD) flat
    else:
        kcfg = ecfg = interp = None

    def kernel_iter(params_c, x):
        """One iteration via the fused kernels; returns (loss, grads)."""
        from pin_slam_tpu.ops import train_kernel as tkn

        # unflatten the tile-padding-hostile minor dims (see the xs layout
        # note): stored flat, viewed (B,k)/(B,VD) per iteration
        x = dict(x)
        x["safe_g"] = x["safe_g"].reshape(B, k)
        x["w"] = x["w"].reshape(B, k)
        x["vec_blend"] = x["vec_blend"].reshape(B, VD)
        geo = params_c.geo
        W1c, b1c = geo.hidden[0]
        W2c, b2c = geo.out
        feats2 = params_c.features[x["safe_g"]].reshape(B, k * (F + 1))
        vin = x["vec_blend"] if wf_first else x["nbr_vec"]
        loss, dfe, dW1, db1, dW2, db2 = tkn.fused_train_iter(
            kcfg, feats2, x["w"], vin, x["label"], x["wt_eff"],
            W1c, b1c, W2c, b2c[0], interpret=interp)
        gfeat = jnp.zeros_like(params_c.features).at[
            x["safe_g"].reshape(-1)].add(dfe.reshape(B * k, F + 1))
        if eik:
            vst = (x["vecb_st"] if wf_first else x["nvst2"])
            el, dfe_e, dW1e, db1e, dW2e, db2e = tkn.fused_eikonal_iter(
                ecfg, feats2[:n_grad], x["wst2"], vst, x["esc"],
                W1c, b1c, W2c, b2c[0], interpret=interp)
            loss = loss + el
            dW1, db1, dW2, db2 = (dW1 + dW1e, db1 + db1e,
                                  dW2 + dW2e, db2 + db2e)
            gfeat = gfeat.at[x["safe_g"][:n_grad].reshape(-1)].add(
                dfe_e.reshape(n_grad * k, F + 1))
        grads = params_c._replace(
            features=gfeat,
            geo=dec.DecoderParams(hidden=((dW1, db1),), out=(dW2, db2[None])),
            color_features=None, sem=None, color=None)
        return loss, grads

    def one_iter(carry, x):
        params_c, opt_c, cert_acc = carry
        # unflatten the tile-padding-hostile minor dims (see the xs layout
        # note): stored flat, viewed (B,k)/(B,VD) per iteration
        x = dict(x)
        x["safe_g"] = x["safe_g"].reshape(B, k)
        x["w"] = x["w"].reshape(B, k)
        x["vec_blend"] = x["vec_blend"].reshape(B, VD)

        def loss_fn(p: TrainableParams):
            feats = p.features[x["safe_g"]]               # (B,k,F+1) one gather
            geo_feat = jnp.concatenate(
                [jnp.einsum("bk,bkf->bf", x["w"], feats[..., :F]),
                 x["vec_blend"]], -1)
            if wf_first:
                sdf_pred = dec.sdf(p.geo, geo_feat, mcfg.sdf_scale)
            else:
                # per-neighbor decode + IDW blend of the k PREDICTIONS
                # (ref model/neural_points.py:660-665, utils/config.py:89);
                # each neighbor's input is its own feature + offset vector
                per_in = jnp.concatenate([feats[..., :F], x["nbr_vec"].reshape(B, k, VD)], -1)
                sdf_k = dec.sdf(p.geo, per_in, mcfg.sdf_scale)       # (B,k)
                sdf_pred = jnp.sum(sdf_k * x["w"], axis=-1)
            loss = losses.sdf_bce_loss(sdf_pred, x["label"], mcfg.sigma_sigmoid,
                                       x["weight"], mcfg.loss_weight_on,
                                       valid=x["in_pool"])
            # certainty channel: grad(col F) == per-point IDW weight sums
            cert_term = jnp.sum(x["w"] * feats[..., F])
            if eik:
                f_base = feats[:n_grad]
                if wf_first:
                    st_feat = jnp.einsum("jnk,nkf->jnf", x["w_st"],
                                         f_base[..., :F])
                    geo_st = jnp.concatenate(
                        [st_feat.reshape(6 * n_grad, -1), x["vecb_st"]], -1)
                    sdf_st = dec.sdf(p.geo, geo_st,
                                     mcfg.sdf_scale).reshape(6, n_grad)
                else:
                    st_in = jnp.concatenate(
                        [jnp.broadcast_to(f_base[None, :, :, :F],
                                          (6,) + f_base[..., :F].shape
                                          ).reshape(6 * n_grad, k, F),
                         x["nvec_st"].reshape(6 * n_grad, k, VD)], -1)
                    sdf_st_k = dec.sdf(p.geo, st_in, mcfg.sdf_scale)
                    sdf_st = jnp.sum(
                        sdf_st_k * x["w_st"].reshape(6 * n_grad, k),
                        axis=-1).reshape(6, n_grad)
                g = jnp.stack([sdf_st[0] - sdf_st[3], sdf_st[1] - sdf_st[4],
                               sdf_st[2] - sdf_st[5]], -1) / (2.0 * mcfg.num_grad_step)
                loss = loss + mcfg.weight_e * losses.eikonal_loss(
                    g, valid=x["in_pool"][:n_grad])
                cert_term = cert_term + jnp.einsum(
                    "jnk,nk->", x["w_st"], f_base[..., F])
            if "sem_lab" in x and p.sem is not None:
                if wf_first:
                    sem_logp = dec.sem_label_prob(p.sem, geo_feat)
                else:
                    # per-neighbor decode + weighted blend of the LOG-probs,
                    # matching the reference's weighted_first=False head
                    # (ref utils/mapper.py:470-473; ADVICE r3 #1)
                    sem_k = dec.sem_label_prob(p.sem, per_in)        # (B,k,S)
                    sem_logp = jnp.einsum("bk,bks->bs", x["w"], sem_k)
                sem_valid = x["in_pool"] & (x["sem_lab"] > 0)
                loss = loss + mcfg.weight_s * losses.sem_nll_loss(
                    sem_logp, x["sem_lab"], valid=sem_valid)
            if "col_lab" in x and p.color is not None:
                cfeats = p.color_features[x["safe_g"]]
                if wf_first:
                    color_feat = jnp.concatenate(
                        [jnp.einsum("bk,bkf->bf", x["w"], cfeats),
                         x["vec_blend"]], -1)
                    color_pred = dec.regress_color(p.color, color_feat)
                else:
                    # per-neighbor color decode + prediction blend
                    # (ref utils/mapper.py:474-477; ADVICE r3 #1)
                    cin = jnp.concatenate([cfeats, x["nbr_vec"].reshape(B, k, VD)], -1)
                    color_k = dec.regress_color(p.color, cin)        # (B,k,C)
                    color_pred = jnp.einsum("bk,bkc->bc", x["w"], color_k)
                surf = x["in_pool"] & (jnp.abs(x["label"]) < mcfg.surface_sample_range)
                loss = loss + mcfg.weight_i * losses.color_diff_loss(
                    color_pred, x["col_lab"], x["weight"], mcfg.loss_weight_on,
                    valid=surf)
            return loss + cert_term, loss

        (_, loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_c)
        if axis_name is not None:
            # DP all-reduce over ICI: identical replicated updates everywhere
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        # harvest the certainty channel's raw gradient; keep it out of Adam.
        # (under DP, pmean halved the per-point weight sums -> restore the SUM)
        cert_raw = grads.features[:, F]
        if axis_name is not None:
            cert_raw = cert_raw * axis_size
        cert_acc = cert_acc + cert_raw
        grads = grads._replace(features=grads.features.at[:, F].set(0.0))
        grads = grads._replace(
            geo=jax.tree.map(lambda g: g * decoder_lr_scale, grads.geo),
            sem=jax.tree.map(lambda g: g * decoder_lr_scale, grads.sem)
            if grads.sem is not None else None,
            color=jax.tree.map(lambda g: g * decoder_lr_scale, grads.color)
            if grads.color is not None else None)
        params_c, opt_c = adam_step(params_c, grads, opt_c)
        params_c = params_c._replace(features=params_c.features.at[L].set(0.0))
        return (params_c, opt_c, cert_acc), loss

    cert0 = jnp.zeros((L + 1,), jnp.float32)
    if use_kernel:
        # ---- dedicated scan for the Pallas path with a COMPACT carry:
        # (features, packed-decoder-vector) -> 2 fused-Adam leaves instead of
        # 5, one merged scatter for main+eikonal row grads, certainty
        # harvested from the scatter output.  Fewer kernels per iteration is
        # the point: the scan body's launch count dominates the residual cost
        # over the gather/scatter/Adam floor. ----
        from pin_slam_tpu.ops import train_kernel as tkn

        Hd = kcfg.H
        id_ = kcfg.in_dim
        iW1 = id_ * Hd

        def pack_geo(g: dec.DecoderParams):
            return jnp.concatenate([g.hidden[0][0].reshape(-1), g.hidden[0][1],
                                    g.out[0].reshape(-1), g.out[1]])

        def unpack_vec(v):
            return (v[:iW1].reshape(id_, Hd), v[iW1:iW1 + Hd],
                    v[iW1 + Hd:iW1 + 2 * Hd].reshape(Hd, 1),
                    v[iW1 + 2 * Hd:iW1 + 2 * Hd + 1])

        pk = (params.features, pack_geo(params.geo))
        opt_k = AdamState(opt_state.count,
                          (opt_state.m.features, pack_geo(opt_state.m.geo)),
                          (opt_state.v.features, pack_geo(opt_state.v.geo)))

        def one_iter_k(carry, x):
            (feats_t, gvec), opt_c, cert_acc = carry
            # unflatten the tile-padding-hostile minor dims (see the xs layout
            # note): stored flat, viewed (B,k)/(B,VD) per iteration
            x = dict(x)
            x["safe_g"] = x["safe_g"].reshape(B, k)
            x["w"] = x["w"].reshape(B, k)
            x["vec_blend"] = x["vec_blend"].reshape(B, VD)
            W1c, b1c, W2c, b2c = unpack_vec(gvec)
            feats2 = feats_t[x["safe_g"]].reshape(B, k * (F + 1))
            vin = (x["vec_blend"] if wf_first
                   else x["nbr_vec"].reshape(B, k * VD))
            loss, dfe, dW1, db1, dW2, db2 = tkn.fused_train_iter(
                kcfg, feats2, x["w"], vin, x["label"], x["wt_eff"],
                W1c, b1c, W2c, b2c[0], interpret=interp)
            idx_cat = x["safe_g"].reshape(-1)
            val_cat = dfe.reshape(B * k, F + 1)
            if eik:
                vst = (x["vecb_st"] if wf_first else x["nvst2"])
                el, dfe_e, dW1e, db1e, dW2e, db2e = tkn.fused_eikonal_iter(
                    ecfg, feats2[:n_grad], x["wst2"], vst, x["esc"],
                    W1c, b1c, W2c, b2c[0], interpret=interp)
                loss = loss + el
                dW1, db1, dW2, db2 = (dW1 + dW1e, db1 + db1e,
                                      dW2 + dW2e, db2 + db2e)
                idx_cat = jnp.concatenate(
                    [idx_cat, x["safe_g"][:n_grad].reshape(-1)])
                val_cat = jnp.concatenate(
                    [val_cat, dfe_e.reshape(n_grad * k, F + 1)])
            gfeat = jnp.zeros_like(feats_t).at[idx_cat].add(val_cat)
            cert_acc = cert_acc + gfeat[:, F]
            gfeat = gfeat.at[:, F].set(0.0)
            gvec_grad = decoder_lr_scale * jnp.concatenate(
                [dW1.reshape(-1), db1, dW2.reshape(-1), db2[None]])
            (feats_t, gvec), opt_c = adam_step(
                (feats_t, gvec), (gfeat, gvec_grad), opt_c)
            feats_t = feats_t.at[L].set(0.0)
            return ((feats_t, gvec), opt_c, cert_acc), loss

        ((feats_f, gvec_f), opt_k, cert_acc), loss_hist = jax.lax.scan(
            one_iter_k, (pk, opt_k, cert0), xs, unroll=unroll)

        def unpack_tp(t):
            fx, gv = t
            w1u, b1u, w2u, b2u = unpack_vec(gv)
            return params._replace(
                features=fx,
                geo=dec.DecoderParams(hidden=((w1u, b1u),), out=(w2u, b2u)))

        params = unpack_tp((feats_f, gvec_f))
        opt_state = AdamState(opt_k.count, unpack_tp(opt_k.m),
                              unpack_tp(opt_k.v))
    else:
        # unroll>1 trades compile time for fewer per-iteration kernel-launch
        # sequences (the scan body is ~dozens of small fused kernels whose
        # launch overhead is a measurable slice of the ~4.7 ms/iter on v5e)
        (params, opt_state, cert_acc), loss_hist = jax.lax.scan(
            one_iter, (params, opt_state, cert0), xs, unroll=unroll)

    # ---- fold certainty/ts bookkeeping into the local attribute rows (dense
    # column ops; ref model/neural_points.py:634-652).  ts_update uses the
    # frame-level max sampled ts as a proxy for the exact per-point max —
    # touched points get an at-most-slightly-fresher stamp, which only
    # lengthens their retention in the travel window.  assign_local_to_global
    # re-derives the stored travel value from ts_update as before. ----
    touched = cert_acc > 0.0
    attr = lm.attr_rows
    attr = attr.at[:, npts.C_CERT].set(attr[:, npts.C_CERT] + cert_acc)
    attr = attr.at[:, npts.C_TSU].set(
        jnp.where(touched, jnp.maximum(attr[:, npts.C_TSU], ts_proxy),
                  attr[:, npts.C_TSU]))
    attr = attr.at[L].set(npts._attr_sentinel_row())
    lm_out = lm._replace(attr_rows=attr)
    return lm_out, params, opt_state, loss_hist


@partial(jax.jit, static_argnames=("mc", "mcfg", "num_iters", "window", "lr_pose_ratio"))
def bundle_adjustment_loop(lm: npts.LocalMap, mc: npts.MapConfig,
                           params: TrainableParams, pool: PoolState,
                           mcfg: MapperConfig, offsets: jax.Array,
                           poses_full: jax.Array, window_start: jax.Array,
                           pose_xi: jax.Array, key: jax.Array,
                           num_iters: int, window: int,
                           lr_pose_ratio: float = 0.1):
    """Sliding-window bundle adjustment: jointly optimize the last ``window``
    poses (se3) and the local map features on surface samples
    (ref utils/mapper.py:596-668 ``bundle_adjustment``).

    poses_full: (T,4,4) f32 current per-frame poses (fixed outside the window).
    pose_xi: (window, 6) se3 corrections, LEFT-composed with the current poses.
    Loss = mean(sdf(T(ts) @ local_coord)^2) over surface samples (ref :652).
    Returns (params, pose_xi, loss_history).
    """
    from pin_slam_tpu.ops.transforms import se3_expmap

    opt = make_optimizer(mcfg)
    surface = jnp.abs(pool.sdf_label) < 1e-6      # exact-endpoint samples

    def one_iter(carry, it_key):
        params_c, xi_c, opt_state_c, opt_state_pose = carry
        idx = jax.random.randint(it_key, (mcfg.bs,), 0, jnp.maximum(pool.fill, 1))
        valid = (idx < pool.fill) & surface[idx] & (pool.rows[idx, P_TS] >= 0.0)
        local = pool.local_coord[idx]
        ts = pool.ts[idx]

        def loss_fn(p, xi):
            T_base = poses_full[ts]                               # (B,4,4)
            in_win = ts >= window_start
            widx = jnp.clip(ts - window_start, 0, window - 1)
            dT = se3_expmap(xi)[widx]                             # (B,4,4)
            eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), dT.shape)
            dT = jnp.where(in_win[:, None, None], dT, eye)
            T = jnp.einsum("nij,njk->nik", dT, T_base)
            coord = jnp.einsum("nij,nj->ni", T[:, :3, :3], local) + T[:, :3, 3]
            sdf_pred, knn, w, _ = _query_sdf(lm, mc, mcfg, offsets, coord,
                                             p, jnp.ones((), bool))
            per = jnp.where(valid, sdf_pred**2, 0.0)
            return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1)

        loss, (g_p, g_xi) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params_c, xi_c)
        # decoders stay frozen during BA (ref utils/mapper.py:602-607: only
        # neural point features + poses are optimized)
        g_p = g_p._replace(geo=jax.tree.map(jnp.zeros_like, g_p.geo),
                           sem=jax.tree.map(jnp.zeros_like, g_p.sem)
                           if g_p.sem is not None else None,
                           color=jax.tree.map(jnp.zeros_like, g_p.color)
                           if g_p.color is not None else None)
        updates, opt_state_c = opt.update(g_p, opt_state_c, params_c)
        params_c = optax.apply_updates(params_c, updates)
        params_c = params_c._replace(
            features=params_c.features.at[mc.local_capacity].set(0.0))
        up_xi, opt_state_pose = opt.update(g_xi, opt_state_pose, xi_c)
        xi_c = xi_c + lr_pose_ratio * up_xi
        return (params_c, xi_c, opt_state_c, opt_state_pose), loss

    opt_state = opt.init(params)
    opt_state_pose = opt.init(pose_xi)
    keys = jax.random.split(key, num_iters)
    (params, pose_xi, _, _), loss_hist = jax.lax.scan(
        one_iter, (params, pose_xi, opt_state, opt_state_pose), keys)
    return params, pose_xi, loss_hist


@partial(jax.jit, static_argnames=("mc", "mcfg"))
def compute_new_sample_mask(lm: npts.LocalMap, mc: npts.MapConfig,
                            mcfg: MapperConfig, coord_world: jax.Array, sdf_label: jax.Array,
                            valid: jax.Array):
    """Flag current-frame samples in newly-observed regions: low certainty AND
    close to surface (ref utils/mapper.py:274-310)."""
    cert = npts.query_certainty(lm, mc, coord_world)
    return (valid & (cert < mcfg.new_certainty_thre)
            & (jnp.abs(sdf_label) < mcfg.surface_sample_range * 3.0))
