"""Measurements for the append-probe dedup + scan-body diet:
  - argsort cost at (229376,) i32 (DCE-proofed)
  - unique-cell count of a real bench frame's samples
  - nonzero compaction cost at 229k
  - probe at reduced static bucket sizes
  - mapping scan body bisect: fwd / +grad / +adam on the (L+1,9) local table

Run: python experiments/profile_dedup.py
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

from bench import make_world, sensor_pose, lidar_scan, N_RAYS
from pin_slam_tpu.config import Config
from pin_slam_tpu.dataset.slam_dataset import Frame
from pin_slam_tpu.ops.voxel import pad_to
from pin_slam_tpu.ops.sampler import sample_rays
from pin_slam_tpu.slam.pipeline import SlamSystem
from pin_slam_tpu.slam import mapper as mp
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.ops import losses
from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash


def timeit(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)) * 1e3 - 24.0


def main():
    rng = np.random.default_rng(0)
    world = make_world(rng)

    cfg = Config()
    cfg.pgo_on = False
    cfg.silence = True
    cfg.min_range, cfg.max_range = 2.0, 20.0
    cfg.map_capacity = 1 << 20
    cfg.local_map_capacity = 1 << 17
    cfg.buffer_size = 1 << 22
    cfg.pool_capacity = 1 << 21
    cfg.downsample_hash_size = 1 << 19
    cfg.frame_bucket = 1 << 15
    cfg.use_brick_hash = False  # hand-rolled probes assume the legacy per-cell table
    cfg._derive()
    cfg.log_loss_per_frame = False
    system = SlamSystem(cfg)
    system.tc = dataclasses.replace(system.tc, min_valid_ratio=0.1)

    def make_frame(i):
        R, t = sensor_pose(i)
        pts = lidar_scan(rng, world, t, R, N_RAYS)
        arr, valid = pad_to(pts, N_RAYS)
        return Frame(points=arr, valid=valid, colors=None, sem_labels=None,
                     point_ts=None, raw_count=pts.shape[0])

    for i in range(6):
        system.process_frame(make_frame(i))
    jax.block_until_ready(system.lm.attr_rows)
    print("setup done", flush=True)

    mc, mcfg = system.mc, system.mcfg
    lm = system.lm
    key = jax.random.PRNGKey(7)
    frame = make_frame(6)
    points = jnp.asarray(frame.points)
    valid = jnp.asarray(frame.valid)
    pose_R = jnp.asarray(system.cur_pose[:3, :3].astype(np.float32))
    pose_t = jnp.asarray(system.cur_pose[:3, 3].astype(np.float32))
    batch = jax.jit(lambda k: sample_rays(k, system.sc, points, valid, None, None))(key)
    coords = batch.coord @ pose_R.T + pose_t
    jax.block_until_ready(coords)
    M = coords.shape[0]

    # ---- unique cells (host) ----
    grid_np = np.floor(np.asarray(coords) / mc.voxel_size).astype(np.int64)
    u = np.unique(grid_np, axis=0).shape[0]
    print(f"samples {M}, unique cells {u} ({u/M:.2%})", flush=True)
    # sorted-run heads (what the device dedup sees, incl. hash collisions)
    h_np = np.asarray(jax.jit(lambda c: spatial_hash(grid_coords(c, mc.voxel_size),
                                                     mc.local_hash_size))(coords))
    print(f"unique hash slots {np.unique(h_np).size}", flush=True)

    # ---- argsort cost ----
    h_dev = jnp.asarray(h_np.astype(np.int32))

    @jax.jit
    def srt(h):
        def body(i, c):
            o = jnp.argsort(h + i)
            return c + o[0] + o[-1]
        return jax.lax.fori_loop(0, 10, body, jnp.int32(0))

    print(f"argsort 229k i32 (x10 amortized)   {timeit(lambda: jax.block_until_ready(srt(h_dev)))/10:8.2f} ms", flush=True)

    @jax.jit
    def nz(h):
        def body(i, c):
            flag = (h + i) % 3 == 0
            idx = jnp.nonzero(flag, size=98304, fill_value=0)[0]
            return c + idx[0] + idx[-1]
        return jax.lax.fori_loop(0, 10, body, jnp.int32(0))

    print(f"nonzero(229k->98304) (x10)         {timeit(lambda: jax.block_until_ready(nz(h_dev)))/10:8.2f} ms", flush=True)

    # ---- probe at bucket sizes ----
    offsets = system.offsets
    for PB in (229376, 98304, 65536):
        idx = jnp.asarray(rng.integers(0, M, PB).astype(np.int32))
        sub = coords[idx]
        jax.block_until_ready(sub)

        @jax.jit
        def probe(c):
            grid = grid_coords(c, mc.voxel_size)
            cells = grid[:, None, :] + offsets[None, :, :]
            h = spatial_hash(cells, mc.local_hash_size)
            rows = lm.hash_rows[h]
            return jnp.sum(rows[:, 0, 0])

        print(f"probe bucket {PB:<8}              {timeit(lambda: jax.block_until_ready(probe(sub))):8.2f} ms", flush=True)

    # ---- wide block re-gather (M rows of 528B) ----
    blocks = jax.random.normal(key, (98304, 33 * 4), jnp.float32)
    uid = jax.random.randint(key, (M,), 0, 98304)

    @jax.jit
    def blk(b, uidv):
        return jnp.sum(b[uidv][:, 0])

    print(f"block re-gather (M x 528B)         {timeit(lambda: jax.block_until_ready(blk(blocks, uid))):8.2f} ms", flush=True)

    # ---- scan body bisect on the local (L+1, 9) table ----
    L = mc.local_capacity
    featsC = jnp.concatenate([lm.geo_features, jnp.zeros((L + 1, 1), jnp.float32)], 1)
    geo = system.geo_params
    B, k, F = mcfg.bs, 6, mc.feature_dim
    safe_g = jax.random.randint(key, (15, B, k), 0, L)
    w = jax.random.uniform(key, (15, B, k))
    vecb = jax.random.normal(key, (15, B, 3), jnp.float32) * 0.1
    label = jax.random.normal(key, (15, B), jnp.float32) * 0.1
    _, adam_step = mp._fused_adam(mcfg)
    params = mp.TrainableParams(features=featsC, color_features=None, geo=geo,
                                sem=None, color=None)
    opt0 = mp.init_opt_state(mcfg, params)
    jax.block_until_ready((safe_g, w, vecb, opt0))

    def make_scan(do_grad, do_adam, do_eik):
        n_grad = B // mcfg.gradient_decimation

        @jax.jit
        def run(p, o):
            def one(carry, x):
                pc, oc = carry
                sg, wx, vb, lb = x

                def loss_fn(pp):
                    feats = pp.features[sg]
                    gf = jnp.concatenate([jnp.einsum("bk,bkf->bf", wx, feats[..., :F]), vb], -1)
                    s = dec.sdf(pp.geo, gf, mcfg.sdf_scale)
                    loss = losses.sdf_bce_loss(s, lb, mcfg.sigma_sigmoid,
                                               jnp.ones_like(lb), False)
                    loss = loss + jnp.sum(wx * feats[..., F])
                    if do_eik:
                        fb = feats[:n_grad]
                        st = jnp.einsum("jnk,nkf->jnf",
                                        jnp.broadcast_to(wx[:n_grad][None], (6, n_grad, k)),
                                        fb[..., :F])
                        gst = jnp.concatenate(
                            [st.reshape(6 * n_grad, -1),
                             jnp.broadcast_to(vb[:n_grad][None], (6, n_grad, 3)).reshape(6 * n_grad, 3)], -1)
                        sst = dec.sdf(pp.geo, gst, mcfg.sdf_scale).reshape(6, n_grad)
                        gg = jnp.stack([sst[0] - sst[3], sst[1] - sst[4], sst[2] - sst[5]], -1)
                        loss = loss + 0.5 * losses.eikonal_loss(gg / (2 * mcfg.num_grad_step))
                    return loss

                if do_grad:
                    loss, g = jax.value_and_grad(loss_fn)(pc)
                    g = g._replace(features=g.features.at[:, F].set(0.0))
                    if do_adam:
                        pc, oc = adam_step(pc, g, oc)
                        pc = pc._replace(features=pc.features.at[L].set(0.0))
                else:
                    loss = loss_fn(pc)
                return (pc, oc), loss

            (p, o), hist = jax.lax.scan(one, (p, o), (safe_g, w, vecb, label))
            return hist

        return run

    for kw, name in [((False, False, False), "fwd only"),
                     ((True, False, False), "fwd+bwd"),
                     ((True, True, False), "fwd+bwd+adam"),
                     ((True, True, True), "fwd+bwd+adam+eik")]:
        r = make_scan(*kw)
        print(f"scan15 {name:<20}        {timeit(lambda: jax.block_until_ready(r(params, opt0))):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
