"""Decompose frame_update (117 ms at bench shapes): time each stage's jitted
piece standalone, chained R times per program so tunnel RTT amortizes.

Run: python experiments/profile_frameupdate.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp

from bench import N_RAYS, lidar_scan, make_world, sensor_pose
from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops.sampler import sample_rays
from pin_slam_tpu.ops.voxel import pad_to, voxel_down_sample_mask
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.slam.pipeline import SlamSystem

R = 8


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = (min(ts) * 1e3 - 24.0) / R
    print(f"{name:<44} {ms:8.2f} ms", flush=True)
    return ms


def chain(body):
    @jax.jit
    def run(*args):
        def step(i, c):
            return body(i, c, *args)
        return jax.lax.fori_loop(0, R, step, jnp.float32(0))
    return run


def main():
    rng = np.random.default_rng(0)
    world = make_world(rng)
    cfg = Config()
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.map_capacity = 1 << 18
    cfg.local_map_capacity = 1 << 16
    cfg.buffer_size = 1 << 21
    cfg.pool_capacity = 1 << 21
    cfg.downsample_hash_size = 1 << 19
    cfg.frame_bucket = 1 << 15
    cfg._derive()
    cfg.log_loss_per_frame = False
    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    def make_frame(i):
        Rm, t = sensor_pose(i)
        pts = lidar_scan(rng, world, t, Rm, N_RAYS)
        arr, valid = pad_to(pts, N_RAYS)
        return Frame(points=arr, valid=valid, colors=None, sem_labels=None,
                     point_ts=None, raw_count=pts.shape[0])

    for i in range(6):
        system.process_frame(make_frame(i))
    jax.block_until_ready(system.lm.attr_rows)
    print("setup done", flush=True)

    mc, mcfg, sc = system.mc, system.mcfg, system.sc
    state, lm, pool = system.state, system.lm, system.pool
    offsets = system.offsets
    frame = make_frame(6)
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)
    pose_R = jnp.asarray(system.cur_pose[:3, :3].astype(np.float32))
    pose_t = jnp.asarray(system.cur_pose[:3, 3].astype(np.float32))
    key = jax.random.PRNGKey(7)
    fid = jnp.int32(system.frame_id)
    travel = system._travel
    jax.block_until_ready((points, valid))

    # stage pieces, chained (i-dependent input tweaks defeat caching)
    def s_voxmask(i, c, pts, vld):
        keep = voxel_down_sample_mask(pts + i * 1e-4, vld, cfg.vox_down_m,
                                      cfg.downsample_hash_size)
        return c + jnp.sum(keep)

    timed("voxel_down_sample_mask (frame)", chain(s_voxmask), points, valid)

    def s_sample(i, c, pts, vld):
        b = sample_rays(jax.random.fold_in(key, i), sc, pts, vld, None, None)
        return c + jnp.sum(b.coord[:, 0])

    timed("sample_rays", chain(s_sample), points, valid)

    batch = jax.jit(lambda k: sample_rays(k, sc, points, valid, None, None))(key)
    coord_world = batch.coord @ pose_R.T + pose_t
    Sn, n_surf_tot = sc.ray_sample_count, 1 + sc.surface_sample_n
    cw_surf = coord_world.reshape(-1, Sn, 3)[:, :n_surf_tot].reshape(-1, 3)
    lbl_surf = batch.sdf_label.reshape(-1, Sn)[:, :n_surf_tot].reshape(-1)
    vld_surf = batch.valid.reshape(-1, Sn)[:, :n_surf_tot].reshape(-1)
    surf_mask = vld_surf & (jnp.abs(lbl_surf)
                            < cfg.surface_sample_range_m * cfg.map_surface_ratio)
    jax.block_until_ready((coord_world, surf_mask))

    def s_insert(i, c, st_attr, pts, msk):
        st = state._replace(attr_rows=st_attr)
        st2 = npts.map_insert(st, mc, pts + i * 1e-5, msk, fid, travel,
                              downsample_table_size=cfg.downsample_hash_size,
                              insert_bucket=min(cfg.frame_bucket, pts.shape[0]))
        return c + st2.count.astype(jnp.float32)

    timed("map_insert", chain(s_insert), state.attr_rows, cw_surf, surf_mask)

    def s_blm(i, c, st_attr):
        st = state._replace(attr_rows=st_attr)
        lm2 = npts.build_local_map(st, mc, pose_t + i * 1e-5, fid, travel)
        return c + lm2.count.astype(jnp.float32)

    timed("build_local_map", chain(s_blm), state.attr_rows)

    def s_newmask(i, c, cw):
        nm = mp.compute_new_sample_mask(lm, mc, mcfg, cw + i * 1e-5,
                                        batch.sdf_label, batch.valid)
        return c + jnp.sum(nm)

    timed("compute_new_sample_mask", chain(s_newmask), coord_world)

    def s_append(i, c, cw):
        g, w, v = mp.append_knn(lm, mc, offsets, cw + i * 1e-5,
                                sc.ray_sample_count, 1 + sc.surface_sample_n)
        return c + jnp.sum(w)

    timed("append_knn (probe+rank+idw)", chain(s_append), coord_world)

    g, w, v = jax.jit(lambda cw: mp.append_knn(
        lm, mc, offsets, cw, sc.ray_sample_count,
        1 + sc.surface_sample_n))(coord_world)
    jax.block_until_ready((g, w, v))

    def s_pool(i, c, cw, gg, ww, vv):
        p2 = mp.pool_append(pool, mcfg, cw + i * 1e-5, batch.coord,
                            batch.sdf_label, batch.weight, batch.valid,
                            fid, jnp.zeros_like(batch.valid), None, None,
                            gg, ww, vv)
        return c + p2.fill.astype(jnp.float32)

    timed("pool_append", chain(s_pool), coord_world, g, w, v)


def append_internals():
    """Bisect append_knn: probe gather vs dist2 vs k-min vs idw."""
    rng = np.random.default_rng(0)
    from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash

    Hl = 1 << 19
    L = 1 << 16
    n_rays, n_near, K = 32768, 4, 33
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    for W in (4, 8):
        tbl = jnp.asarray(rng.standard_normal((Hl + 1, W)), jnp.float32)
        pts = jnp.asarray(rng.uniform(-20, 20, (n_rays, 3)), jnp.float32)
        near = jnp.asarray(rng.uniform(-20, 20, (n_rays, n_near, 3)), jnp.float32)

        def probe_only(i, c, t, p):
            grid = grid_coords(p + i * 1e-4, 0.3)
            cells = grid[:, None, :] + offsets[None, :, :]
            h = spatial_hash(cells, Hl)
            rows = t[h]
            return c + jnp.sum(rows[..., 0])

        timed(f"near probe gather (32k,33) rows {W*4}B", chain(probe_only), tbl, pts)

        def probe3(i, c, t, p):
            # free-sample probes too: 3x rows
            grid = grid_coords(p + i * 1e-4, 0.3)
            cells = grid[:, None, :] + offsets[None, :, :]
            h = spatial_hash(cells, Hl)
            s = jnp.sum(t[h][..., 0]) + jnp.sum(t[(h + 1) % Hl][..., 0]) \
                + jnp.sum(t[(h + 2) % Hl][..., 0])
            return c + s

        timed(f"3x probe gathers rows {W*4}B", chain(probe3), tbl, pts)

    tbl = jnp.asarray(rng.standard_normal((Hl + 1, 8)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-20, 20, (n_rays, 3)), jnp.float32)
    near = jnp.asarray(rng.uniform(-20, 20, (n_rays, n_near, 3)), jnp.float32)

    def probe_rank(i, c, t, p, q):
        grid = grid_coords(p + i * 1e-4, 0.3)
        cells = grid[:, None, :] + offsets[None, :, :]
        h = spatial_hash(cells, Hl)
        rows = t[h]
        nbr = rows[..., :3]
        d = nbr[:, None, :, :] - q[:, :, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        return c + jnp.sum(dist2)

    timed("near probe + dist2 (32k,4,33)", chain(probe_rank), tbl, pts, near)

    def probe_rank_kmin(i, c, t, p, q):
        grid = grid_coords(p + i * 1e-4, 0.3)
        cells = grid[:, None, :] + offsets[None, :, :]
        h = spatial_hash(cells, Hl)
        rows = t[h]
        nbr = rows[..., :3]
        d = nbr[:, None, :, :] - q[:, :, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        sel = npts.exact_k_min(dist2, 6)
        return c + jnp.sum(sel)

    timed("+ exact_k_min(6)", chain(probe_rank_kmin), tbl, pts, near)

    def full_group(i, c, t, p, q):
        grid = grid_coords(p + i * 1e-4, 0.3)
        cells = grid[:, None, :] + offsets[None, :, :]
        h = spatial_hash(cells, Hl)
        rows = t[h]
        nbr = rows[..., :3]
        lidx = rows[..., 3].astype(jnp.int32)
        gidx = rows[..., 4].astype(jnp.int32)
        d = nbr[:, None, :, :] - q[:, :, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        valid = (lidx[:, None, :] < L) & (dist2 <= 2.43)
        dist2 = jnp.where(valid, dist2, 9e3)
        sel = npts.exact_k_min(dist2, 6)
        take = lambda a: jnp.take_along_axis(
            jnp.broadcast_to(a[:, None], valid.shape), sel, axis=-1)
        g_k = jnp.where(jnp.take_along_axis(valid, sel, axis=-1), take(gidx), -1)
        pos_k = jnp.take_along_axis(
            jnp.broadcast_to(nbr[:, None], q.shape[:2] + nbr.shape[1:]),
            sel[..., None], axis=-2)
        return c + jnp.sum(pos_k) + jnp.sum(g_k)

    timed("+ takes (full _probe_rank)", chain(full_group), tbl, pts, near)


if __name__ == "__main__":
    if "--internals" in sys.argv:
        append_internals()
    else:
        main()
