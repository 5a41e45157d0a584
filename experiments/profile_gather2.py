"""Serialization-proof gather micro-bench: run N dependency-chained repetitions
of each op inside ONE jitted scan, so per-op cost = (t_chain - t_base) / N
regardless of tunnel sync semantics.
Run: PYTHONPATH=/root/.axon_site:. python experiments/profile_gather2.py
"""

import time

import numpy as np

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

N_CHAIN = 64
N_IDX = 540_000  # one training iter's probe volume (16384 x 33)


def timed(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3


def chain_cost(body, init_carry, label):
    """body(carry, i) -> carry; times N_CHAIN scan steps minus a 1-step base."""

    def make(n):
        @jax.jit
        def run(carry):
            def step(c, i):
                return body(c, i), ()
            c, _ = jax.lax.scan(step, carry, jnp.arange(n))
            return c
        return run

    t_full = timed(make(N_CHAIN), init_carry)
    t_base = timed(make(1), init_carry)
    per = (t_full - t_base) / (N_CHAIN - 1)
    print(f"{label:<44} {per:7.3f} ms/op   (chain {t_full:7.1f} ms)")
    return per


def main():
    rng = np.random.default_rng(0)

    # --- row gather from tables of different sizes ---
    for log_rows, width in [(20, 4), (19, 4), (18, 4), (20, 2), (22, 4)]:
        rows = 1 << log_rows
        table = jnp.asarray(rng.normal(size=(rows, width)).astype(np.float32))
        idx0 = jnp.asarray(rng.integers(0, rows, size=N_IDX).astype(np.int32))

        def body(carry, i, table=table, rows=rows):
            idx, acc = carry
            g = table[idx]                                   # (N_IDX, width)
            acc = acc + g[:, 0]
            # new indices depend on gathered data -> true serialization
            idx = (idx + g[:, -1].astype(jnp.int32) + i) % rows
            return (idx, acc)

        mb = rows * width * 4 / 2**20
        chain_cost(body, (idx0, jnp.zeros((N_IDX,), jnp.float32)),
                   f"row gather 540k from 2^{log_rows}x{width} ({mb:5.1f} MB)")

    # --- scatter-add 98k rows into (L+1, 8) ---
    L = (1 << 17) + 1
    idx0 = jnp.asarray(rng.integers(0, L - 1, size=98_304).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(98_304, 8)).astype(np.float32))

    def body_sc(carry, i):
        acc, idx = carry
        acc = acc.at[idx].add(vals)
        idx = (idx + 1 + acc[0, 0].astype(jnp.int32) % 2) % (L - 1)
        return (acc, idx)

    chain_cost(body_sc, (jnp.zeros((L, 8), jnp.float32), idx0),
               "scatter-add 98k rows into (131k,8)")

    # --- flat scatter-add 108k elems into (L+1,) ---
    idx0 = jnp.asarray(rng.integers(0, L - 1, size=108_000).astype(np.int32))
    vals1 = jnp.asarray(rng.normal(size=(108_000,)).astype(np.float32))

    def body_sc1(carry, i):
        acc, idx = carry
        acc = acc.at[idx].add(vals1)
        idx = (idx + 1 + acc[0].astype(jnp.int32) % 2) % (L - 1)
        return (acc, idx)

    chain_cost(body_sc1, (jnp.zeros((L,), jnp.float32), idx0),
               "scatter-add 108k elems into (131k,)")

    # --- approx_max_k vs top_k on (16384, 33) ---
    d0 = jnp.asarray(rng.normal(size=(16384, 33)).astype(np.float32))

    def body_amk(carry, i):
        d = carry
        v, s = jax.lax.approx_max_k(d, 6)
        return d + 1e-6 * v.sum() + 1e-9 * s.sum()

    chain_cost(body_amk, d0, "approx_max_k k=6 on (16384,33)")

    def body_tk(carry, i):
        d = carry
        v, s = jax.lax.top_k(d, 6)
        return d + 1e-6 * v.sum() + 1e-9 * s.sum()

    chain_cost(body_tk, d0, "top_k k=6 on (16384,33)")

    # --- nonzero at 1M ---
    m0 = jnp.asarray((rng.random(1 << 20) < 0.1))

    def body_nz(carry, i):
        m, acc = carry
        nz = jnp.nonzero(m, size=1 << 17, fill_value=0)[0]
        acc = acc + nz[0] + nz[-1]
        m = jnp.roll(m, 1 + acc % 2)
        return (m, acc)

    chain_cost(body_nz, (m0, jnp.int32(0)), "nonzero(size=131k) over 2^20 + roll")

    # --- spatial hash + gather + topk fused (one knn equivalent) ---
    from pin_slam_tpu.ops.hash3d import grid_coords, spatial_hash
    Hl = 1 << 20
    hash_rows = jnp.asarray(rng.normal(size=(Hl + 1, 4)).astype(np.float32))
    pts0 = jnp.asarray(rng.uniform(-20, 20, size=(16384, 3)).astype(np.float32))
    offsets = jnp.asarray(
        np.stack(np.meshgrid(*([np.arange(-2, 3)] * 3), indexing="ij"), -1)
        .reshape(-1, 3)[:33].astype(np.int32))

    def body_knn(carry, i):
        pts = carry
        grid = grid_coords(pts, 0.3)
        cells = grid[:, None, :] + offsets[None]
        h = spatial_hash(cells, Hl)
        rows = hash_rows[h]
        d2 = jnp.sum((rows[..., :3] - pts[:, None, :]) ** 2, -1)
        _, sel = jax.lax.approx_max_k(-d2, 6)
        return pts + 1e-7 * d2.mean() + 1e-9 * sel.sum()

    chain_cost(body_knn, pts0, "full knn probe 16384x33 (hash+gather+topk)")


if __name__ == "__main__":
    main()
