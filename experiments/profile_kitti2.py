"""Second-level decomposition of the kitti-profile frame_update (262 ms) and
training iteration (6.64 ms) — chained piece timings at the exact shapes.

Run on the TPU: python experiments/profile_kitti2.py
"""

import dataclasses
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

from bench import KITTI_N_RAYS, lidar_scan, make_world, sensor_pose
from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops.sampler import sample_rays
from pin_slam_tpu.ops.voxel import pad_to, voxel_down_sample_mask
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.slam.pipeline import SlamSystem

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
    print(f"{name:<46} {(t - t0) / R:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    world = make_world(rng)
    cfg = Config()
    cfg.load("config/lidar_slam/run_kitti.yaml")
    cfg.pc_path = cfg.pose_path = cfg.calib_path = ""
    cfg.kitti_correct = False
    cfg.o3d_vis_on = False
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.map_capacity = 1 << 22
    cfg.local_map_capacity = 1 << 18
    cfg.buffer_size = 1 << 23
    cfg.pool_capacity = 1 << 23
    cfg.downsample_hash_size = 1 << 21
    cfg.frame_bucket = KITTI_N_RAYS
    cfg.mapping_bucket = 1 << 16
    cfg.probe_dedup_budget = 0.625
    cfg._derive()
    cfg.log_loss_per_frame = False
    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    def make_frame(i):
        Rm, t = sensor_pose(i)
        pts = lidar_scan(rng, world, t, Rm, KITTI_N_RAYS, n_az=1800, n_el=128)
        arr, valid = pad_to(pts, cfg.frame_bucket)
        return Frame(points=arr, valid=valid, colors=None, sem_labels=None,
                     point_ts=None, raw_count=pts.shape[0])

    for i in range(7):
        system.process_frame(make_frame(i))
    print("setup done", flush=True)

    mc, mcfg, sc = system.mc, system.mcfg, system.sc
    state, lm, pool = system.state, system.lm, system.pool
    offsets = system.offsets
    frame = make_frame(7)
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)
    pose_R = jnp.asarray(system.cur_pose[:3, :3].astype(np.float32))
    pose_t = jnp.asarray(system.cur_pose[:3, 3].astype(np.float32))
    key = jax.random.PRNGKey(7)
    fid = jnp.int32(7)
    travel = system._travel
    jax.block_until_ready((points, valid))

    Mb = cfg.mapping_bucket

    def s_keepcompact(i, pts, vld):
        keep = voxel_down_sample_mask(pts + i * 1e-4, vld, cfg.vox_down_m,
                                      cfg.downsample_hash_size)
        v = vld & keep
        cidx = jnp.nonzero(v, size=Mb, fill_value=pts.shape[0])[0]
        return jnp.sum(cidx.astype(jnp.float32))

    timed("keep-mask + compaction (131k -> 64k)", s_keepcompact, points, valid)

    # compacted points for the rest
    keep = jax.jit(lambda p, v: voxel_down_sample_mask(
        p, v, cfg.vox_down_m, cfg.downsample_hash_size))(points, valid)
    v = valid & keep
    cidx = jnp.nonzero(v, size=Mb, fill_value=points.shape[0])[0]
    cpts = jnp.concatenate([points, jnp.zeros((1, 3))])[cidx]
    cval = jnp.arange(Mb) < jnp.sum(v, dtype=jnp.int32)
    print(f"  survivors: {int(jnp.sum(v))} / {points.shape[0]}", flush=True)

    def s_sample(i, p, vl):
        b = sample_rays(jax.random.fold_in(key, i), sc, p, vl, None, None)
        return jnp.sum(b.coord[:, 0])

    timed(f"sample_rays ({Mb}x{sc.ray_sample_count})", s_sample, cpts, cval)

    batch = jax.jit(lambda k: sample_rays(k, sc, cpts, cval, None, None))(key)
    coord_world = batch.coord @ pose_R.T + pose_t
    Sn, n_surf_tot = sc.ray_sample_count, 1 + sc.surface_sample_n
    cw_surf = coord_world.reshape(-1, Sn, 3)[:, :n_surf_tot].reshape(-1, 3)
    lbl_surf = batch.sdf_label.reshape(-1, Sn)[:, :n_surf_tot].reshape(-1)
    vld_surf = batch.valid.reshape(-1, Sn)[:, :n_surf_tot].reshape(-1)
    surf_mask = vld_surf & (jnp.abs(lbl_surf)
                            < cfg.surface_sample_range_m * cfg.map_surface_ratio)
    jax.block_until_ready((coord_world, surf_mask))
    print(f"  surf candidates: {cw_surf.shape[0]}", flush=True)

    import os as _os
    if _os.environ.get("MEASURE_EXTRA"):
        run_extra(system, state, lm, pool, mc, mcfg, sc, cfg, offsets, key,
                  fid, travel, points, valid, pose_R, pose_t, coord_world,
                  batch)
        return

    def s_insert(i, attr, p, m):
        st = state._replace(attr_rows=attr)
        st2 = npts.map_insert(st, mc, p + i * 1e-5, m, fid, travel,
                              downsample_table_size=cfg.downsample_hash_size,
                              insert_bucket=min(cfg.frame_bucket, p.shape[0]))
        return st2.count.astype(jnp.float32)

    timed("map_insert (bucket=frame_bucket)", s_insert, state.attr_rows,
          cw_surf, surf_mask)

    def s_insert2(i, attr, p, m):
        st = state._replace(attr_rows=attr)
        st2 = npts.map_insert(st, mc, p + i * 1e-5, m, fid, travel,
                              downsample_table_size=cfg.downsample_hash_size,
                              insert_bucket=min(Mb, p.shape[0]))
        return st2.count.astype(jnp.float32)

    timed("map_insert (bucket=mapping_bucket)", s_insert2, state.attr_rows,
          cw_surf, surf_mask)

    def s_blm(i, attr):
        st = state._replace(attr_rows=attr)
        lm2 = npts.build_local_map(st, mc, pose_t + i * 1e-5, fid, travel)
        return lm2.count.astype(jnp.float32)

    timed("build_local_map (cap 4M)", s_blm, state.attr_rows)

    def s_newmask(i, cw):
        nm = mp.compute_new_sample_mask(lm, mc, mcfg, cw + i * 1e-5,
                                        batch.sdf_label, batch.valid)
        return jnp.sum(nm)

    timed("compute_new_sample_mask (524k)", s_newmask, coord_world)

    n_rays_f = coord_world.shape[0] // Sn
    n_far = n_rays_f * (Sn - n_surf_tot)

    tmpl = system.append_tmpl    # brick probe template (r5) when enabled

    def s_append(i, cw):
        out = mp.append_knn(lm, mc, tmpl, cw + i * 1e-5, Sn,
                            near_count=n_surf_tot,
                            per_neighbor_vecs=not mcfg.weighted_first,
                            use_rank_kernel=system._use_rank_kernel,
                            dedup_far_budget=int(n_far * cfg.probe_dedup_budget))
        return jnp.sum(out[1])

    timed("append_knn (dedup, wf=False vecs)", s_append, coord_world)

    out = jax.jit(lambda cw: mp.append_knn(
        lm, mc, tmpl, cw, Sn, near_count=n_surf_tot,
        per_neighbor_vecs=not mcfg.weighted_first,
        use_rank_kernel=system._use_rank_kernel,
        dedup_far_budget=int(n_far * cfg.probe_dedup_budget)))(coord_world)
    jax.block_until_ready(out[0])

    def s_pool(i, cw):
        p2 = mp.pool_append(pool, mcfg, cw + i * 1e-5, batch.coord,
                            batch.sdf_label, batch.weight, batch.valid,
                            fid, jnp.zeros_like(batch.valid), None, None,
                            out[0], out[1], out[2], knn_nbr_vec=out[3])
        return p2.fill.astype(jnp.float32)

    timed("pool_append (524k x 63 cols)", s_pool, coord_world)

    # training per-iter: kernel vs XLA at these shapes
    L = mc.local_capacity
    featsC = jnp.concatenate([lm.geo_features,
                              jnp.zeros((L + 1, 1), jnp.float32)], axis=1)
    params = mp.TrainableParams(features=featsC, color_features=None,
                                geo=system.geo_params, sem=None, color=None)
    opt = mp.init_opt_state(mcfg, params)
    one = jnp.ones((), bool)
    for uk, un in ((True, 5), (True, 1), (False, 1)):
        def loop(T, uk=uk, un=un):
            return lambda: mp.mapping_loop_cached(
                lm, mc, params, opt, pool, mcfg, key, jnp.float32(1.0), one,
                num_iters=T, use_kernel=uk, unroll=un)
        tA = fetch_ms(loop(15))
        tB = fetch_ms(loop(45))
        per = (tB - tA) / 30.0
        print(f"mapping_loop[kernel={uk},unroll={un}]: per-iter {per:6.2f} ms;"
              f" fixed {tA - 15 * per:6.1f}; T=15 {tA:6.1f}", flush=True)





def extra():
    """r5: the remaining unexplained budget — full u&t single call, assign,
    the append sub-pieces, and the training loop's fixed cost."""
    import experiments  # noqa  (path bootstrap above)


# appended r5 measurements run from main() via MEASURE_EXTRA=1
def run_extra(system, state, lm, pool, mc, mcfg, sc, cfg, offsets, key, fid,
              travel, points, valid, pose_R, pose_t, coord_world, batch):
    import time as _t

    # full fused update_and_train: ONE program (what the frame actually pays)
    geo, sem, col = system.geo_params, system.sem_params, system.color_params

    def uat():
        out = system._update_and_train(
            jax.tree.map(jnp.copy, state), jax.tree.map(jnp.copy, lm),
            jax.tree.map(jnp.copy, pool), key, (geo, sem, col),
            jnp.copy(travel), jnp.int32(0), points, valid, pose_R, pose_t,
            jnp.asarray(True), jnp.float32(0.9), fid, None, None,
            jnp.float32(1.0), False)
        return out[0].count

    t0 = _t.perf_counter()
    r = uat()
    jax.block_until_ready(r)
    t_warm = _t.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = _t.perf_counter()
        jax.block_until_ready(uat())
        ts.append(_t.perf_counter() - t0)
    print(f"update_and_train FULL program: {min(ts)*1e3:7.1f} ms "
          f"(first {t_warm*1e3:.0f})", flush=True)

    # assign_local_to_global
    def s_assign(i, attr):
        st = state._replace(attr_rows=attr)
        st2 = npts.assign_local_to_global(st, lm, mc, travel)
        return st2.attr_rows[0, 0] + i * 0.0

    timed("assign_local_to_global", s_assign, state.attr_rows)

    # append sub-pieces: far-dedup GATHER alone vs full probe+rank
    tmpl = system.append_tmpl
    n_rays_f = coord_world.shape[0] // sc.ray_sample_count
    n_surf_tot = 1 + sc.surface_sample_n
    c3 = coord_world.reshape(n_rays_f, sc.ray_sample_count, 3)
    far = c3[:, n_surf_tot:].reshape(-1, 3)
    G_B = int(n_rays_f * (sc.ray_sample_count - n_surf_tot)
              * cfg.probe_dedup_budget)

    def s_fargather(i, fp):
        fm = npts.brick_gather_fm(lm, mc, tmpl, fp[:G_B] + i * 1e-5)
        return jnp.sum(fm[:, 0])

    timed(f"  far brick gather alone ({G_B} x Kb rows)", s_fargather, far)

    def s_farrank(i, fp):
        g, p, vd = mp._probe_rank(lm, mc, tmpl, fp[:G_B] + i * 1e-5,
                                  (fp[:G_B] + i * 1e-5)[:, None, :], 6,
                                  use_rank_kernel=system._use_rank_kernel)
        return jnp.sum(p)

    timed(f"  far probe+rank n=1 ({G_B} groups)", s_farrank, far)

    # training fixed cost: batch mega-gather + remap alone
    T, B = cfg.iters, cfg.bs
    idx = jax.random.randint(key, (T * B,), 0, mcfg.pool_capacity)

    def s_poolgather(i, ix):
        rows = pool.rows[(ix + i) % mcfg.pool_capacity]
        return jnp.sum(rows[:, 0])

    timed(f"  training pool mega-gather ({T * B} x {mcfg.pool_dim} cols)",
          s_poolgather, idx)

    rank = jnp.cumsum(lm.member_mask.astype(jnp.int32)) - 1

    def s_remap(i, ix):
        rows = pool.rows[(ix + i) % mcfg.pool_capacity]
        gidx = rows[:, mp.P_KNN].astype(jnp.int32)
        local_of = jnp.where(lm.member_mask,
                             jnp.minimum(rank, mc.local_capacity),
                             mc.local_capacity)
        lidx = local_of[jnp.where(gidx >= 0, jnp.minimum(gidx, mc.capacity),
                                  mc.capacity)]
        return jnp.sum(lidx)

    timed(f"  gather + global->local remap ({T * B * 6} elems)", s_remap, idx)


if __name__ == "__main__":
    main()
