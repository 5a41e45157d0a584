"""Micro-benchmarks for the dilated candidate-table design, using the
R-chained fori_loop pattern (single-op timings through the axon tunnel are
untrustworthy — see profile_scatter_gather.py).

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

K, W = 33, 5
Hd = 1 << 19
R = 10


def timed(name, fn, *args, reps=3, r=R):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = (min(ts) * 1e3 - 24.0) / r
    print(f"{name:<46} {ms:8.2f} ms", flush=True)
    return ms


def loop(body, init):
    @jax.jit
    def run(*args):
        def step(i, c):
            return body(i, c, *args)
        return jax.lax.fori_loop(0, R, step, init)
    return run


def main():
    rng = np.random.default_rng(0)
    table = jnp.zeros((Hd + 1, K, W), jnp.float32)
    jax.block_until_ready(table)

    # --- scatter: incremental insert (bucket x K rows) ---
    for bucket in (8192, 65536, 131072):
        slots = jnp.asarray(rng.integers(0, Hd, (bucket, K)), jnp.int32)
        cols = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (bucket, K))
        rows = jnp.asarray(rng.standard_normal((bucket, K, W)), jnp.float32)

        def s_body(i, c, t, s, cc, r):
            t = t.at[(s + i) % Hd, cc].set(r + i)
            return t

        n = bucket * K
        ms = timed(f"scatter set ({bucket}x{K})x{W} = {n} rows",
                   loop(s_body, table), table, slots, cols, rows)
        print(f"    -> {ms * 1e6 / n:6.1f} ns/row", flush=True)

    # --- gather: per-sample wide row probe ---
    for B in (32768, 229376):
        h = jnp.asarray(rng.integers(0, Hd, (B,)), jnp.int32)

        def g_body(i, c, t, hh):
            rows = t[(hh + i) % Hd]
            return c + jnp.sum(rows[:, 0, 0])

        ms = timed(f"gather {B} rows of {K}x{W}f32 ({K*W*4}B)",
                   loop(g_body, jnp.float32(0)), table, h)
        bw = B * K * W * 4 / (ms / 1e3) / 1e9
        print(f"    -> {ms * 1e6 / B:6.1f} ns/row, {bw:6.1f} GB/s", flush=True)

    # --- wider rows (with quat): (Hd, K, 9) ---
    table9 = jnp.zeros((Hd + 1, K, 9), jnp.float32)
    B = 229376
    h = jnp.asarray(rng.integers(0, Hd, (B,)), jnp.int32)

    def g9_body(i, c, t, hh):
        rows = t[(hh + i) % Hd]
        return c + jnp.sum(rows[:, 0, 0])

    ms = timed(f"gather {B} rows of {K}x9f32 ({K*9*4}B)",
               loop(g9_body, jnp.float32(0)), table9, h)
    print(f"    -> {ms * 1e6 / B:6.1f} ns/row", flush=True)

    # --- ranking: dist2 + 6 argmin sweeps at probe shape ---
    cand = jnp.asarray(rng.standard_normal((B, K, 3)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 3)), jnp.float32)

    from pin_slam_tpu.models.neural_points import exact_k_min

    def r_body(i, c, cc, qq):
        d = cc - (qq[:, None, :] + i)
        d2 = jnp.sum(d * d, -1)
        sel = exact_k_min(d2, 6)
        return c + jnp.sum(jnp.take_along_axis(d2, sel, axis=1))

    timed(f"dist2+exact_k_min(6) at ({B},{K})", loop(r_body, jnp.float32(0)),
          cand, q)

    # --- narrow remap gather: (B*k,) i32 from (1M,) ---
    big = jnp.zeros((1 << 20,), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 1 << 20, (B * 6,)), jnp.int32)

    def n_body(i, c, t, ii):
        return c + jnp.sum(t[(ii + i) % (1 << 20)])

    ms = timed(f"narrow gather {B*6} i32 from (2^20,)",
               loop(n_body, jnp.int32(0)), big, idx)
    print(f"    -> {ms * 1e6 / (B*6):6.1f} ns/row", flush=True)


if __name__ == "__main__":
    main()


def flat_layouts():
    """2-D layouts: (Hd, K*W) flat rows — the round-1 wide-gather regime."""
    rng = np.random.default_rng(0)
    B = 229376
    for W2 in (K * W, 168):
        tbl = jnp.zeros((Hd + 1, W2), jnp.float32)
        h = jnp.asarray(rng.integers(0, Hd, (B,)), jnp.int32)

        def g_body(i, c, t, hh):
            rows = t[(hh + i) % Hd]
            return c + jnp.sum(rows[:, 0])

        ms = timed(f"gather {B} rows from 2-D (Hd,{W2}) {W2*4}B",
                   loop(g_body, jnp.float32(0)), tbl, h)
        print(f"    -> {ms * 1e6 / B:6.1f} ns/row, "
              f"{B * W2 * 4 / (ms/1e3) / 1e9:6.1f} GB/s", flush=True)

    # 2-D scatter variants for the incremental column write
    bucket = 8192
    tbl = jnp.zeros((Hd + 1, K * W), jnp.float32)
    slots = jnp.asarray(rng.integers(0, Hd, (bucket, K)), jnp.int32)
    rows5 = jnp.asarray(rng.standard_normal((bucket, K, W)), jnp.float32)

    def s2_body(i, c, t, s, r):
        # K separate scatters, each writing a contiguous 5-f32 sub-row via a
        # 2-index scatter at (slot, j*W)
        for j in range(K):
            c = c.at[(s[:, j] + i) % Hd, j * W:(j + 1) * W].set(r[:, j] + i)
        return c

    ms = timed(f"2-D col-scatter ({bucket}x{K})x{W}",
               loop(s2_body, tbl), tbl, slots, rows5)
    print(f"    -> {ms * 1e6 / (bucket*K):6.1f} ns/row", flush=True)

    # scatter whole flat rows: one slot per point, full K*W row
    # (only usable for a QUERY-cell-addressed rebuild, not incremental)
    rows_full = jnp.asarray(rng.standard_normal((bucket, K * W)), jnp.float32)

    def s3_body(i, c, t, s, r):
        return c.at[(s[:, 0] + i) % Hd].set(r + i)

    ms = timed(f"2-D full-row scatter {bucket} rows of {K*W*4}B",
               loop(s3_body, tbl), tbl, slots, rows_full)
    print(f"    -> {ms * 1e6 / bucket:6.1f} ns/row", flush=True)


def scatter_add_variants():
    """scatter-ADD maintenance candidates: adds lower much better than sets."""
    rng = np.random.default_rng(0)
    bucket = 8192
    flat = jnp.zeros(((Hd + 1) * K, W), jnp.float32)
    slots = jnp.asarray(rng.integers(0, Hd, (bucket, K)), jnp.int32)
    cols = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (bucket, K))
    rows = jnp.asarray(rng.standard_normal((bucket * K, W)), jnp.float32)

    def a_body(i, c, t, s, cc, r):
        idx = (((s + i) % Hd) * K + cc).reshape(-1)
        return c.at[idx].add(r + i)

    n = bucket * K
    ms = timed(f"flat scatter-ADD {n} rows of {W}f32",
               loop(a_body, flat), flat, slots, cols, rows)
    print(f"    -> {ms * 1e6 / n:6.1f} ns/row", flush=True)

    # gather the same pieces (the delta read for add-based replace)
    def g_body(i, c, t, s, cc):
        idx = (((s + i) % Hd) * K + cc).reshape(-1)
        return c + jnp.sum(t[idx])

    ms = timed(f"flat piece-gather {n} rows of {W}f32",
               loop(g_body, jnp.float32(0)), flat, slots, cols)
    print(f"    -> {ms * 1e6 / n:6.1f} ns/row", flush=True)

    # big rebuild-scale scatter-ADD: 131072x33
    bucket2 = 131072
    slots2 = jnp.asarray(rng.integers(0, Hd, (bucket2, K)), jnp.int32)
    cols2 = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (bucket2, K))
    rows2 = jnp.asarray(rng.standard_normal((bucket2 * K, W)), jnp.float32)
    ms = timed(f"flat scatter-ADD {bucket2*K} rows of {W}f32 (rebuild scale)",
               loop(a_body, flat), flat, slots2, cols2, rows2)
    print(f"    -> {ms * 1e6 / (bucket2*K):6.1f} ns/row", flush=True)

    # does the (Hd*K, W) flat table keep the fast QUERY gather? rows are
    # (K, W) blocks = K consecutive rows of the flat table per query
    B = 229376
    h = jnp.asarray(rng.integers(0, Hd, (B,)), jnp.int32)

    def q_body(i, c, t, hh):
        base = ((hh + i) % Hd) * K
        idx = base[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        return c + jnp.sum(t[idx.reshape(-1)][:, 0])

    ms = timed(f"query gather {B} x {K} consecutive {W}f32 rows",
               loop(q_body, jnp.float32(0)), flat, h)
    print(f"    -> {ms * 1e6 / B:6.1f} ns/query ({ms*1e6/(B*K):5.2f} ns/row)",
          flush=True)

    # alternative: keep table 2-D (Hd,168) for queries; scatter-add pieces at
    # (slot, col*W + j) 2-index -> measure
    tbl2 = jnp.zeros((Hd + 1, K * W + 3), jnp.float32)
    rows3 = jnp.asarray(rng.standard_normal((bucket, K, W)), jnp.float32)

    def a2_body(i, c, t, s, r):
        cc = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32) * W, (bucket, K))
        # one scatter per W column offset, 2-index (slot, col)
        for w in range(W):
            c = c.at[(s + i) % Hd, cc + w].add(r[..., w] + i)
        return c

    ms = timed(f"2-D piecewise scatter-ADD ({bucket}x{K})x{W}",
               loop(a2_body, tbl2), tbl2, slots, rows3)
    print(f"    -> {ms * 1e6 / n:6.1f} ns/row", flush=True)
