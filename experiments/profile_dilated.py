"""Micro-benchmarks for the dilated candidate-table design:

- scatter of (N, W) f32 rows into a (H, K, W) table at random (slot, col)
  positions (the incremental insert-time update and the periodic rebuild)
- gather of (B,) rows from a (H, K*W) f32 table (the per-sample probe)
- the dist2 + exact-k-min ranking at probe shapes

Run: python experiments/profile_dilated.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

RTT = 0.0  # report raw wall times; compare relative


def timeit(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)) * 1e3


def main():
    rng = np.random.default_rng(0)
    K, W = 33, 5
    Hd = 1 << 19

    table = jnp.zeros((Hd + 1, K, W), jnp.float32)
    jax.block_until_ready(table)

    # --- scatter: incremental insert (bucket x K rows) ---
    for bucket in (4096, 16384, 65536):
        slots = jnp.asarray(rng.integers(0, Hd, (bucket, K)), jnp.int32)
        cols = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (bucket, K))
        rows = jnp.asarray(rng.standard_normal((bucket, K, W)), jnp.float32)

        @jax.jit
        def scat(t, s, c, r):
            return t.at[s, c].set(r)

        jax.block_until_ready(scat(table, slots, cols, rows))
        ms = timeit(lambda: jax.block_until_ready(scat(table, slots, cols, rows)))
        n = bucket * K
        print(f"scatter set ({bucket}x{K})x{W} = {n:>8} rows  {ms:7.2f} ms "
              f"({ms*1e6/n:6.1f} ns/row)", flush=True)

    # --- scatter as one flat index (slot*K+col) into (Hd*K, W) ---
    bucket = 16384
    slots = jnp.asarray(rng.integers(0, Hd, (bucket, K)), jnp.int32)
    cols = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (bucket, K))
    flat_idx = (slots * K + cols).reshape(-1)
    rows = jnp.asarray(rng.standard_normal((bucket * K, W)), jnp.float32)
    tflat = table.reshape(-1, W)

    @jax.jit
    def scat_flat(t, i, r):
        return t.at[i].set(r)

    jax.block_until_ready(scat_flat(tflat, flat_idx, rows))
    ms = timeit(lambda: jax.block_until_ready(scat_flat(tflat, flat_idx, rows)))
    n = bucket * K
    print(f"scatter set flat {n:>8} rows of {W}f32    {ms:7.2f} ms ({ms*1e6/n:6.1f} ns/row)",
          flush=True)

    # --- K separate narrow scatters (one per offset column) ---
    @jax.jit
    def scat_cols(t, s, r):
        for j in range(K):
            t = t.at[s[:, j], j].set(r[:, j])
        return t

    jax.block_until_ready(scat_cols(table, slots, rows.reshape(bucket, K, W)))
    ms = timeit(lambda: jax.block_until_ready(
        scat_cols(table, slots, rows.reshape(bucket, K, W))))
    print(f"scatter set {K} col-scatters of {bucket}  {ms:7.2f} ms ({ms*1e6/n:6.1f} ns/row)",
          flush=True)

    # --- gather: per-sample wide row probe ---
    for B in (32768, 229376):
        h = jnp.asarray(rng.integers(0, Hd, (B,)), jnp.int32)

        @jax.jit
        def gath(t, hh):
            return t[hh]

        jax.block_until_ready(gath(table, h))
        ms = timeit(lambda: jax.block_until_ready(gath(table, h)))
        bw = B * K * W * 4 / (ms / 1e3) / 1e9
        print(f"gather {B:>7} rows of {K}x{W}f32 ({K*W*4}B) {ms:7.2f} ms "
              f"({ms*1e6/B:6.1f} ns/row, {bw:5.1f} GB/s)", flush=True)

    # --- ranking: dist2 + 6 argmin sweeps at probe shape ---
    B = 229376
    cand = jnp.asarray(rng.standard_normal((B, K, 3)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 3)), jnp.float32)

    from pin_slam_tpu.slam.mapper import exact_k_min

    @jax.jit
    def rank(c, qq):
        d = c - qq[:, None, :]
        d2 = jnp.sum(d * d, -1)
        sel = exact_k_min(d2, 6)
        return jnp.take_along_axis(d2, sel, axis=1)

    jax.block_until_ready(rank(cand, q))
    ms = timeit(lambda: jax.block_until_ready(rank(cand, q)))
    print(f"dist2+exact_k_min(6) at ({B},{K})   {ms:7.2f} ms", flush=True)

    # --- narrow gather reference: (B*k,) i32 from (1M,) ---
    big = jnp.zeros((1 << 20,), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 1 << 20, (229376 * 6,)), jnp.int32)

    @jax.jit
    def gnarrow(t, i):
        return t[i]

    jax.block_until_ready(gnarrow(big, idx))
    ms = timeit(lambda: jax.block_until_ready(gnarrow(big, idx)))
    print(f"narrow gather {idx.shape[0]} i32          {ms:7.2f} ms "
          f"({ms*1e6/idx.shape[0]:6.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
