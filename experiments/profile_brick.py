"""Brick-packed hash rows (VERDICT r4 next #2b): pack the 2x2x2 = 8 voxel
cells of a BRICK into one physical hash row, so the K-cell probe template
becomes a ~K/4-brick template gathered at the same per-row cost.

PERF.md r4 measured that TPU hash-row gathers pay per ROW, nearly
independent of row width (4.5-4.7 ns/row across 2^19-2^21-slot tables);
K=81 (run_kitti search_alpha 0.5) then costs 15.3M row gathers ~ 70 ms of
pure gather per frame.  A 2x2x2 brick covers any 5-cell axis span with
exactly 3 brick spans regardless of parity, so the sphere-clipped templates
become (computed in this file):

    K=33  (bench,  n=2 alpha=0.2)  -> 11 brick rows  (3.0x fewer)
    K=81  (kitti,  n=2 alpha=0.5)  -> 20 brick rows  (4.05x fewer)

The candidate SET stays exact: each gathered sub-cell candidate is kept only
if its own voxel (recomputed from its stored position) lies inside the
original sphere template — the same membership the per-cell probe
guarantees by construction.  The only semantic delta is hash-collision
fine structure: the per-cell table can surface a "lucky collision" (a point
from an out-of-template cell that hashed into a probed slot and happens to
lie within max_valid_dist2); the brick path's membership test drops those.

This experiment measures, on the real device, chained no-DCE:
  1. per-cell probe+rank at kitti shapes (the r4 production path)
  2. brick probe+rank at identical shapes
  3. the pure-gather floors of both
and verifies candidate-set equality (modulo lucky collisions, counted).

Run: python experiments/profile_brick.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import (enable_compilation_cache,
                                         set_matmul_precision)

enable_compilation_cache()
set_matmul_precision()

import jax
import jax.numpy as jnp

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash
from pin_slam_tpu.slam import mapper as mp

R = 4


def fetch_ms(fn, *args, reps=3):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def chain(body):
    @jax.jit
    def run(*args):
        def step(i, c):
            return c + body(i, *args)
        return jax.lax.fori_loop(0, R, step, jnp.float32(0))
    return run


def timed(name, body, *args):
    t = fetch_ms(chain(body), *args)
    t0 = fetch_ms(chain(lambda i, *a: jnp.float32(0.0)), *args)
    ms = (t - t0) / R
    print(f"{name:<52} {ms:8.2f} ms", flush=True)
    return ms


# ----------------------------------------------------------------------
# brick template + packing (prototype of the production version)
# ----------------------------------------------------------------------


def brick_templates(offsets: np.ndarray):
    """(8, Kb, 3) parity-indexed brick-offset templates for a cell template.

    For a query in cell g, the bricks containing any template cell are
    floor((g + t)/2) = floor(g/2) + floor((p + t)/2) with p = g mod 2 —
    so the RELATIVE brick offsets depend only on the parity vector p.
    All 8 parities give the same count for sphere templates (padded to the
    max with a far-away offset otherwise)."""
    outs = []
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                b = np.unique(np.floor((offsets + [px, py, pz]) / 2).astype(np.int32),
                              axis=0)
                outs.append(b)
    kb = max(len(b) for b in outs)
    far = np.int32(1 << 20)
    padded = np.stack([
        np.concatenate([b, np.full((kb - len(b), 3), far, np.int32)])
        for b in outs])
    return padded  # (8, Kb, 3)


def pack_brick_rows(mc, positions, count, indices, hb_size):
    """((Hb+1)*8, 5) flat table: sub-cell rows [x,y,z,lidx,gidx]; read as
    (Hb+1, 40) brick rows."""
    L = mc.local_capacity
    lidx = jnp.arange(L + 1, dtype=jnp.int32)
    active = lidx < count
    g = grid_coords(positions, mc.voxel_size)
    brick = jnp.floor_divide(g, 2)
    sub = g - 2 * brick                       # (L+1,3) in {0,1}
    s = sub[:, 0] * 4 + sub[:, 1] * 2 + sub[:, 2]
    hb = spatial_hash(brick, hb_size)
    flat = jnp.where(active, hb * 8 + s, hb_size * 8)
    rows = jnp.concatenate(
        [positions, lidx.astype(jnp.float32)[:, None],
         indices.astype(jnp.float32)[:, None]], axis=1)
    sent = jnp.asarray([npts._SENTINEL_POS, npts._SENTINEL_POS,
                        npts._SENTINEL_POS, L, mc.capacity], jnp.float32)
    table = jnp.broadcast_to(sent, ((hb_size + 1) * 8, 5))
    return table.at[flat].set(rows)


def brick_probe(table, mc, tmpl8, r2_cells, pts, k, hb_size):
    """Probe + exact rank through the brick table; returns (lidx (B,k),
    d2 (B,k)) with the per-cell probe's candidate-set semantics."""
    L = mc.local_capacity
    g = grid_coords(pts, mc.voxel_size)
    brick = jnp.floor_divide(g, 2)
    p = g - 2 * brick
    bidx = p[:, 0] * 4 + p[:, 1] * 2 + p[:, 2]             # (B,)
    offs = tmpl8[bidx]                                      # (B,Kb,3) tiny-table gather
    hb = spatial_hash(brick[:, None, :] + offs, hb_size)    # (B,Kb)
    rows = table.reshape(hb_size + 1, 40)[hb]               # (B,Kb,40) THE gather
    rows = rows.reshape(pts.shape[0], -1, 5)                # (B,Kb*8,5)
    nbr = rows[..., :3]
    lidx = rows[..., 3].astype(jnp.int32)
    d = nbr - pts[:, None, :]
    dist2 = jnp.sum(d * d, axis=-1)
    # exact template membership from the candidate's own voxel
    dc = grid_coords(nbr, mc.voxel_size) - g[:, None, :]
    memb = jnp.sum(dc * dc, axis=-1) < r2_cells
    valid = (lidx < L) & (dist2 <= mc.max_valid_dist2) & memb
    dist2 = jnp.where(valid, dist2, npts._INVALID_DIST2)
    sel = mp.exact_k_min(dist2, k)
    lidx_k = jnp.take_along_axis(jnp.where(valid, lidx, L), sel, axis=1)
    d2_k = jnp.take_along_axis(dist2, sel, axis=1)
    return lidx_k, d2_k


def cell_probe(lm, mc, offsets, pts, k):
    L = mc.local_capacity
    grid = grid_coords(pts, mc.voxel_size)
    cells = grid[:, None, :] + offsets[None, :, :]
    h = spatial_hash(cells, mc.local_hash_size)
    rows = lm.hash_rows[h]
    nbr = rows[..., :3]
    lidx = rows[..., 3].astype(jnp.int32)
    d = nbr - pts[:, None, :]
    dist2 = jnp.sum(d * d, axis=-1)
    valid = (lidx < L) & (dist2 <= mc.max_valid_dist2)
    dist2 = jnp.where(valid, dist2, npts._INVALID_DIST2)
    sel = mp.exact_k_min(dist2, k)
    lidx_k = jnp.take_along_axis(jnp.where(valid, lidx, L), sel, axis=1)
    d2_k = jnp.take_along_axis(dist2, sel, axis=1)
    return lidx_k, d2_k


def _time_one(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def production():
    """Measure the PRODUCTION probe paths (mapper._probe_rank with the rank
    kernel) under legacy vs brick MapConfigs at bench/kitti shapes."""
    import dataclasses as dc

    # (G, n) shaped like the real append_knn dedup-group calls:
    # bench far = 0.625 * 98k items in n_g=4 groups; kitti far = 0.625 * 123k
    for label, n_nei, alpha, n_pts, n_grp, n_per, local_cap in [
            ("bench K=33", 2, 0.2, 34_000, 61_440, 4, 1 << 16),
            ("kitti K=81", 2, 0.5, 200_000, 76_800, 4, 1 << 18)]:
        cfg = Config()
        cfg.map_capacity = 1 << 22
        cfg.local_map_capacity = local_cap
        cfg.buffer_size = 1 << 23
        cfg.downsample_hash_size = 1 << 21
        cfg.num_nei_cells = n_nei
        cfg.search_alpha = alpha
        cfg.voxel_size_m = 0.4
        cfg._derive()
        mc_b = npts.MapConfig.from_config(cfg)
        mc_c = dc.replace(mc_b, brick=(1, 1, 1),
                          local_hash_size=min(1 << 20, mc_b.local_hash_size))
        tmpl = npts.make_probe_template(mc_b, n_nei, alpha)
        offsets = jnp.asarray(npts.neighbor_offsets(n_nei, alpha))
        Kb = tmpl.bricks.shape[1]
        print(f"\n== production {label}: Kb={Kb} bricks x {mc_b.nsub} "
              f"(Kc={Kb*mc_b.nsub}), G={n_grp} n={n_per} ==", flush=True)

        rng = np.random.default_rng(0)
        pts = rng.uniform(-20, 20, size=(n_pts, 3)).astype(np.float32)
        travel = jnp.zeros((1 << 16,), jnp.float32)
        lms = {}
        for name, mc in (("cell", mc_c), ("brick", mc_b)):
            state = npts.init_map_state(mc)
            state = npts.map_insert(state, mc, jnp.asarray(pts),
                                    jnp.ones((n_pts,), bool), jnp.int32(0),
                                    travel,
                                    downsample_table_size=cfg.downsample_hash_size)
            lms[name] = npts.build_local_map(state, mc, jnp.zeros(3),
                                             jnp.int32(0), travel)
            jax.block_until_ready(lms[name].hash_rows)
        q = jnp.asarray(rng.uniform(-18, 18, size=(n_grp, 3)).astype(np.float32))
        qn = q[:, None, :] + jnp.asarray(
            rng.uniform(-0.2, 0.2, size=(n_grp, n_per, 3)).astype(np.float32))

        # single-dispatch timing (the fori_loop chain wrapper makes the rank
        # kernel's serialized chunk scan exceed the scoped-vmem budget);
        # subtract the measured tunnel RTT of a trivial fetch
        trivial = jax.jit(lambda x: jnp.sum(x[:8]))
        _ = float(trivial(q))
        rtt = min(_time_one(lambda: float(trivial(q))) for _ in range(5))
        print(f"  (tunnel rtt {rtt*1e3:.1f} ms)", flush=True)
        for name, mc, offs in (("cell", mc_c, offsets), ("brick", mc_b, tmpl)):
            lm = lms[name]
            f = jax.jit(lambda qq, lm=lm, mc=mc, offs=offs: jnp.sum(
                mp._probe_rank(lm, mc, offs, qq[:, 0], qq, 6,
                               use_rank_kernel=True)[1]))
            qs = [qn + i * 1e-5 for i in range(4)]
            _ = float(f(qs[0]))                       # compile
            ts = [_time_one(lambda i=i: float(f(qs[i]))) for i in range(4)]
            print(f"  {name:<6} _probe_rank+kernel  "
                  f"{(min(ts) - rtt) * 1e3:8.2f} ms", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    production()
    if "--prototype" not in sys.argv:
        return
    # the standalone prototype below OOMs at kitti shapes via the (G,Kc,5)
    # reshape (25.6x tile padding) — kept for the gather-floor measurements
    for label, n_nei, alpha, n_pts, n_q, local_cap in [
            ("bench K=33", 2, 0.2, 34_000, 229_376, 1 << 16),
            ("kitti K=81", 2, 0.5, 200_000, 196_608, 1 << 18)]:
        cfg = Config()
        cfg.map_capacity = 1 << 22
        cfg.local_map_capacity = local_cap
        cfg.buffer_size = 1 << 23
        cfg.downsample_hash_size = 1 << 21
        cfg.num_nei_cells = n_nei
        cfg.search_alpha = alpha
        cfg.voxel_size_m = 0.4
        cfg._derive()
        mc = npts.MapConfig.from_config(cfg)
        offsets_np = npts.neighbor_offsets(n_nei, alpha)
        offsets = jnp.asarray(offsets_np)
        K = len(offsets_np)
        tmpl8_np = brick_templates(offsets_np)
        tmpl8 = jnp.asarray(tmpl8_np)
        Kb = tmpl8_np.shape[1]
        r2_cells = float((n_nei + alpha) ** 2)
        # brick table sized so sub-cell slot count ~ the per-cell table's
        hb_size = mc.local_hash_size // 8
        print(f"\n== {label}: K={K} -> Kb={Kb} bricks ({K/Kb:.2f}x fewer rows); "
              f"cells table {mc.local_hash_size} x 32B, "
              f"brick table {hb_size} x 160B ==", flush=True)

        rng = np.random.default_rng(0)
        pts = rng.uniform(-20, 20, size=(n_pts, 3)).astype(np.float32)
        travel = jnp.zeros((1 << 16,), jnp.float32)
        state = npts.init_map_state(mc)
        state = npts.map_insert(state, mc, jnp.asarray(pts),
                                jnp.ones((n_pts,), bool), jnp.int32(0), travel,
                                downsample_table_size=cfg.downsample_hash_size)
        lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
        table = pack_brick_rows(mc, lm.attr_rows[:, npts.C_POS], lm.count,
                                lm.indices, hb_size)
        jax.block_until_ready((lm.hash_rows, table))

        q = jnp.asarray(rng.uniform(-18, 18, size=(n_q, 3)).astype(np.float32))

        # correctness: same k-NN sets (modulo lucky collisions)
        lc, dc_ = jax.jit(lambda qq: cell_probe(lm, mc, offsets, qq, 6))(q[:65536])
        lb, db_ = jax.jit(lambda qq: brick_probe(table, mc, tmpl8, r2_cells,
                                                 qq, 6, hb_size))(q[:65536])
        same = np.asarray(jnp.all(lc == lb, axis=1))
        d_same = np.asarray(jnp.all(jnp.abs(dc_ - db_) < 1e-6, axis=1))
        print(f"   kNN rows identical: {same.mean()*100:.3f}%  "
              f"dist-identical: {d_same.mean()*100:.3f}%  "
              f"(delta = lucky hash collisions)", flush=True)

        # chained timings
        timed(f"  per-cell probe+rank (K={K})",
              lambda i, qq: jnp.sum(cell_probe(
                  lm, mc, offsets, qq + i * 1e-5, 6)[1]), q)
        timed(f"  brick probe+rank    (Kb={Kb})",
              lambda i, qq: jnp.sum(brick_probe(
                  table, mc, tmpl8, r2_cells, qq + i * 1e-5, 6, hb_size)[1]), q)

        # pure-gather floors
        def cell_gather(i, qq):
            grid = grid_coords(qq + i * 1e-5, mc.voxel_size)
            h = spatial_hash(grid[:, None, :] + offsets[None, :, :],
                             mc.local_hash_size)
            return jnp.sum(lm.hash_rows[h][..., 0])

        def brick_gather(i, qq):
            g = grid_coords(qq + i * 1e-5, mc.voxel_size)
            brick = jnp.floor_divide(g, 2)
            p = g - 2 * brick
            bidx = p[:, 0] * 4 + p[:, 1] * 2 + p[:, 2]
            hb = spatial_hash(brick[:, None, :] + tmpl8[bidx], hb_size)
            return jnp.sum(table.reshape(hb_size + 1, 40)[hb][..., 0])

        timed(f"  per-cell pure gather ({n_q}x{K} rows x 32B)", cell_gather, q)
        timed(f"  brick    pure gather ({n_q}x{Kb} rows x 160B)", brick_gather, q)


if __name__ == "__main__":
    main()
