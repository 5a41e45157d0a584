"""Benchmark: end-to-end synthetic SLAM throughput + hot-kernel rates on the
attached accelerator.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: frames/s of the full odometry+mapping loop at KITTI-like
per-frame workload (reference real-time target = 10 Hz sensor rate,
/root/reference/README.md:99-101 -> vs_baseline = fps / 10).
Extras: SDF train queries/s (fwd+bwd) and registration iters/s.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def ray_scene(rng, n, half=40.0):
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = (half / np.abs(d)).min(axis=1)
    return (d * tmax[:, None]).astype(np.float32)


def main():
    from pin_slam_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.ops.sampler import SamplerConfig, sample_rays
    from pin_slam_tpu.slam import mapper as mp
    from pin_slam_tpu.slam import tracker as trk

    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform

    # KITTI-like workload sizes (reference: bs 16384, 15 iters/frame,
    # ~6k source points x <=50 reg iters; utils/config.py:240-247,162-174)
    mc = npts.MapConfig(
        capacity=1 << 20, local_capacity=1 << 17, hash_size=1 << 22, voxel_size=0.4,
        feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.4) ** 2, local_map_radius=62.0,
        travel_dist_window=310.0)
    mcfg = mp.MapperConfig(
        pool_capacity=1 << 20, new_idx_capacity=1 << 17, bs=16384, bs_new_sample=2048,
        iters=15, lr=0.01, adam_eps=1e-15, sigma_sigmoid=0.1, sdf_scale=0.055,
        loss_weight_on=False, ekional_loss_on=True, weight_e=0.5,
        gradient_decimation=10, num_grad_step=0.08, surface_sample_range=0.25,
        semantic_on=False, color_on=False, weight_s=1.0, weight_i=1.0)
    sc = SamplerConfig(max_range=60.0)
    tc = trk.TrackerConfig(reg_iter_n=50)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))

    n_rays = 1 << 15            # ~32k rays/frame after preprocessing
    n_src = 1 << 13             # registration source points
    n_frames_bench = 12
    travel_np = np.arange(1 << 12, dtype=np.float32) * 1.0
    travel = jnp.asarray(np.concatenate([travel_np, np.full((1 << 16) - travel_np.size,
                                                            travel_np[-1], np.float32)]))

    state = npts.init_map_state(mc)
    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)

    key = jax.random.PRNGKey(0)

    def one_frame(state, lm, params, frame_id, pose_t, warm):
        """odometry (50 reg iters) + map insert + local map + 15 train iters"""
        t_frame0 = time.perf_counter()
        pts = ray_scene(rng, n_rays)
        origin = np.asarray([pose_t, 0.0, 0.0], np.float32)

        timings = {}
        if frame_id > 0:
            src = pts[:n_src]
            t0 = time.perf_counter()
            res = trk.track_frame(lm, mc, tc, params.geo, 0.055, offsets,
                                  jnp.asarray(src), jnp.ones((n_src,), bool),
                                  jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
            jax.block_until_ready(res.t)
            timings["track_s"] = time.perf_counter() - t0
            timings["track_iters"] = int(res.iterations)

        batch = sample_rays(jax.random.fold_in(key, frame_id), sc, jnp.asarray(pts),
                            jnp.ones((n_rays,), bool))
        coord_world = batch.coord + jnp.asarray(origin)
        surf = batch.valid & (jnp.abs(batch.sdf_label) < 0.125)
        t0 = time.perf_counter()
        state = npts.map_insert(state, mc, coord_world, surf, jnp.int32(frame_id),
                                travel, downsample_table_size=1 << 20)
        lm = npts.build_local_map(state, mc, jnp.asarray(origin), jnp.int32(frame_id),
                                  travel)
        jax.block_until_ready(lm.count)
        timings["map_update_s"] = time.perf_counter() - t0

        pool = one_frame.pool
        pool = mp.pool_append(pool, mcfg, coord_world, batch.coord, batch.sdf_label,
                              batch.weight, batch.valid, jnp.int32(frame_id),
                              jnp.zeros_like(batch.valid))
        one_frame.pool = pool

        params = params._replace(features=lm.geo_features)
        opt_state = mp.make_optimizer(mcfg).init(params)
        t0 = time.perf_counter()
        lm2, params, _, _ = mp.mapping_loop(
            lm, mc, params, opt_state, pool, mcfg, offsets,
            jax.random.fold_in(key, 1000 + frame_id),
            jnp.float32(1.0), jnp.zeros((), bool), jnp.zeros((), bool),
            num_iters=mcfg.iters)
        jax.block_until_ready(params.features)
        timings["train_s"] = time.perf_counter() - t0
        lm = lm2._replace(geo_features=params.features)
        state = npts.assign_local_to_global(state, lm, mc)
        timings["frame_s"] = time.perf_counter() - t_frame0
        return state, lm, params, timings

    lm = npts.init_local_map(mc)
    params = mp.TrainableParams(features=lm.geo_features, color_features=None,
                                geo=geo, sem=None, color=None)
    one_frame.pool = mp.init_pool(mcfg)

    # warmup / compile
    state, lm, params, _ = one_frame(state, lm, params, 0, 0.0, warm=True)
    state, lm, params, _ = one_frame(state, lm, params, 1, 1.0, warm=True)

    frame_times, track_times, train_times, track_iters = [], [], [], []
    for f in range(2, 2 + n_frames_bench):
        state, lm, params, tm = one_frame(state, lm, params, f, float(f), warm=False)
        frame_times.append(tm["frame_s"])
        train_times.append(tm["train_s"])
        if "track_s" in tm:
            track_times.append(tm["track_s"])
            track_iters.append(max(tm["track_iters"], 1))

    fps = 1.0 / float(np.mean(frame_times))
    # fwd+bwd queries per train iter: bs + 6*bs/decimation eikonal stencil
    q_per_iter = mcfg.bs * (1 + 6 / mcfg.gradient_decimation)
    train_qps = q_per_iter * mcfg.iters / float(np.mean(train_times))
    reg_iters_per_s = float(np.sum(track_iters) / np.sum(track_times)) if track_times else 0.0

    print(json.dumps({
        "metric": "synthetic_slam_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),   # reference real-time target: 10 Hz
        "platform": platform,
        "sdf_train_queries_per_s": round(train_qps),
        "registration_iters_per_s": round(reg_iters_per_s, 1),
        "map_points": int(state.count),
        "local_points": int(lm.count),
    }))


if __name__ == "__main__":
    main()
