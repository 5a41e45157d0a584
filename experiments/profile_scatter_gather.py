"""Micro-benchmarks for the two dominant costs of _update_and_train:
(a) the knn hash-probe gather (245760 x 33 rows from a 2^20-row table)
(b) the per-iteration feature-gradient scatter-add (98304 rows into 131073 x 8)

Each variant runs R times inside ONE jitted fori_loop (data-dependent carry)
so the ~24 ms tunnel round trip is amortized out.

Run: python experiments/profile_scatter_gather.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

from functools import partial

import jax
import jax.numpy as jnp

B, K, k, F = 245760, 33, 6, 8
L = 131072           # local capacity
H = 1 << 20          # local hash size
N_UPD = 98304        # per-iteration scatter rows (16384 * 6)
R = 20               # repetitions inside the loop


def timed(name, fn, *args, reps=3, r=R):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = (min(ts) * 1e3 - 24.0) / r   # subtract tunnel RT, per-op
    print(f"{name:<44} {ms:8.2f} ms", flush=True)
    return ms


def loop(body, init, xs=None):
    @jax.jit
    def run(*args):
        def step(i, c):
            return body(i, c, *args)
        return jax.lax.fori_loop(0, R, step, init)
    return run


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    table = jax.random.normal(k1, (H + 1, 4), jnp.float32)
    h_idx = jax.random.randint(k2, (B, K), 0, H).astype(jnp.int32)
    h_sorted = jnp.sort(h_idx[:, 0])[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    h_sorted = h_sorted % H

    # (a) gathers
    def g_base(i, c, tbl, idx):
        rows = tbl[(idx + i) % H]
        return c + jnp.sum(rows[:, 0, 0])

    timed("probe gather (B,K) from (2^20,4) f32", loop(g_base, jnp.float32(0)), table, h_idx)
    timed("probe gather SORTED queries", loop(g_base, jnp.float32(0)), table, h_sorted)

    table8 = jax.random.normal(k1, (H + 1, 2), jnp.float32)

    def g_8b(i, c, tbl, idx):
        rows = tbl[(idx + i) % H]
        return c + jnp.sum(rows[:, 0, 0])

    timed("probe gather 8-byte rows (2^20,2) f32", loop(g_8b, jnp.float32(0)), table8, h_idx)

    table_small = jax.random.normal(k1, ((1 << 18) + 1, 4), jnp.float32)

    def g_small(i, c, tbl, idx):
        rows = tbl[(idx + i) % (1 << 18)]
        return c + jnp.sum(rows[:, 0, 0])

    timed("probe gather from (2^18,4) table (4MB)", loop(g_small, jnp.float32(0)), table_small, h_idx)

    # wide-row gather: B rows of (K,4)=528B each from a (L, K*4) table
    wide = jax.random.normal(k1, (L, K * 4), jnp.float32)
    w_idx = jax.random.randint(k2, (B,), 0, L).astype(jnp.int32)

    def g_wide(i, c, tbl, idx):
        rows = tbl[(idx + i) % L]
        return c + jnp.sum(rows[:, 0])

    timed(f"WIDE gather (B,) rows of {K*4*4}B from (L,132)", loop(g_wide, jnp.float32(0)), wide, w_idx)

    # narrow gather at selected-k width (the scan body's feature gather)
    feats = jax.random.normal(k1, (L + 1, F), jnp.float32)
    f_idx = jax.random.randint(k3, (16384, k), 0, L).astype(jnp.int32)

    def g_feat(i, c, tbl, idx):
        rows = tbl[(idx + i) % L]
        return c + jnp.sum(rows[:, 0, 0])

    timed("feature gather (16384,6) rows", loop(g_feat, jnp.float32(0)), feats, f_idx)

    # (b) scatters
    upd_idx = jax.random.randint(k3, (N_UPD,), 0, L).astype(jnp.int32)
    upd_sorted = jnp.sort(upd_idx)
    g = jax.random.normal(k4, (N_UPD, F), jnp.float32)

    def s_base(i, c, idx, gg):
        return c.at[(idx + i) % L].add(gg)

    acc0 = jnp.zeros((L + 1, F), jnp.float32)
    timed("scatter-add 98304x8 baseline", loop(s_base, acc0), upd_idx, g)

    def s_sorted(i, c, idx, gg):
        return c.at[idx].add(gg + i, indices_are_sorted=True)

    timed("scatter-add sorted (hint)", loop(s_sorted, acc0), upd_sorted, g)

    def s_unique(i, c, idx, gg):
        return c.at[idx].add(gg + i, indices_are_sorted=True, unique_indices=True)

    timed("scatter-add sorted+unique (hint, unsound)", loop(s_unique, acc0), upd_sorted, g)

    def s_seg(i, c, idx, gg):
        return c + jax.ops.segment_sum(gg + i, idx, num_segments=L + 1)

    timed("segment_sum", loop(s_seg, acc0), upd_idx, g)

    def s_seg_sorted(i, c, idx, gg):
        return c + jax.ops.segment_sum(gg + i, idx, num_segments=L + 1,
                                       indices_are_sorted=True)

    timed("segment_sum sorted", loop(s_seg_sorted, acc0), upd_sorted, g)

    # sort cost itself
    def s_sortop(i, c, idx, gg):
        s = jnp.sort(idx + i)
        return c + jnp.float32(s[0])

    timed("sort 98304 i32", loop(s_sortop, jnp.float32(0)), upd_idx, g)

    def s_argsortop(i, c, idx, gg):
        s = jnp.argsort(idx + i)
        return c + jnp.float32(s[0])

    timed("argsort 98304 i32", loop(s_argsortop, jnp.float32(0)), upd_idx, g)

    # one-hot MXU scatter, packed 16 rows/tile: G[(L/16),128] = onehot_hi^T @ g16
    def s_onehot(i, c, idx, gg):
        idx = (idx + i) % L
        hi = idx // 16
        lo = idx % 16
        onehot_lo = (lo[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :])
        g16 = (onehot_lo[:, :, None] * gg[:, None, :]).reshape(N_UPD, 128)
        # contraction over n: (L/16, N) @ (N, 128) via onehot_hi
        oh_hi = jax.nn.one_hot(hi, L // 16, dtype=jnp.bfloat16)   # (N, L/16)
        out = jax.lax.dot_general(
            oh_hi.astype(jnp.bfloat16).T, g16.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return c + out.reshape(L, F)[: L + 1].sum() * 0 + c

    # the one-hot (98304, 8192) bf16 = 1.6GB -> skip; too big. measure a
    # blocked version at 1/16 scale to extrapolate instead
    n_small = N_UPD // 16

    def s_onehot_small(i, c, idx, gg):
        idx = (idx[:n_small] + i) % (L // 16)
        oh = jax.nn.one_hot(idx, L // 16, dtype=jnp.bfloat16)     # (n, L/16)
        out = jax.lax.dot_general(
            oh.T, gg[:n_small].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return c + jnp.sum(out)

    ms = timed("one-hot matmul scatter (1/256 work)", loop(s_onehot_small, jnp.float32(0)), upd_idx, g)
    print(f"  -> extrapolated full: {ms*256:8.2f} ms")


if __name__ == "__main__":
    main()
