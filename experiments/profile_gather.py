"""Micro-bench: random row-gather cost vs table size and row width; nonzero,
cumsum, scatter costs at pipeline shapes.
Run: PYTHONPATH=/root/.axon_site:. python experiments/profile_gather.py
"""

import time

import numpy as np

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def t(fn, *args, reps=7):
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return np.median(times) * 1e3


def main():
    rng = np.random.default_rng(0)
    n_idx = 540_000  # one training iter's probe count (16384 x 33)

    print("--- random row gathers (n=540k) ---")
    for log_rows, width in [(20, 4), (20, 2), (19, 4), (19, 2), (18, 4),
                            (21, 4), (20, 8), (20, 1)]:
        rows = 1 << log_rows
        table = jnp.asarray(rng.normal(size=(rows, width)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, rows, size=n_idx).astype(np.int32))

        gather = jax.jit(lambda tb, ix: tb[ix].sum(axis=0))
        ms = t(gather, table, idx)
        mb = rows * width * 4 / 2**20
        print(f"table 2^{log_rows} x {width} f32 ({mb:6.1f} MB): {ms:7.2f} ms "
              f"({ms*1e6/n_idx:5.1f} ns/row)")

    print("--- flat element gather (n=540k) ---")
    table = jnp.asarray(rng.normal(size=(1 << 22,)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1 << 22, size=n_idx).astype(np.int32))
    ms = t(jax.jit(lambda tb, ix: tb[ix].sum()), table, idx)
    print(f"flat 16MB f32:                     {ms:7.2f} ms ({ms*1e6/n_idx:5.1f} ns/el)")

    print("--- scatter-add (n=540k rows) ---")
    for width, L in [(8, (1 << 17) + 1), (1, (1 << 17) + 1)]:
        acc = jnp.zeros((L, width), jnp.float32) if width > 1 else jnp.zeros((L,), jnp.float32)
        idx = jnp.asarray(rng.integers(0, L - 1, size=n_idx).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=(n_idx, width)).astype(np.float32).squeeze())

        scat = jax.jit(lambda a, ix, v: a.at[ix].add(v))
        ms = t(scat, acc, idx, vals)
        print(f"scatter-add into ({L},{width}):   {ms:7.2f} ms ({ms*1e6/n_idx:5.1f} ns/row)")

    print("--- nonzero / cumsum / argmax at pipeline shapes ---")
    for n, size in [(1 << 20, 1 << 17), (229_376, 1 << 15), (32_768, 1 << 15)]:
        mask = jnp.asarray(rng.random(n) < 0.1)
        nz = jax.jit(lambda m: jnp.nonzero(m, size=size, fill_value=0)[0])
        ms = t(nz, mask)
        print(f"nonzero(size={size}) over {n}:   {ms:7.2f} ms")
    m = jnp.asarray(rng.random(1 << 20) < 0.1)
    print(f"cumsum over 2^20:                  {t(jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32))), m):7.2f} ms")
    print(f"argmax over 2^20:                  {t(jax.jit(lambda m: jnp.argmax(m)), m):7.2f} ms")

    print("--- top_k / approx_max_k (16384, 33) ---")
    d = jnp.asarray(rng.normal(size=(16384, 33)).astype(np.float32))
    print(f"approx_max_k k=6:                  {t(jax.jit(lambda d: jax.lax.approx_max_k(d, 6)), d):7.2f} ms")
    print(f"top_k k=6:                         {t(jax.jit(lambda d: jax.lax.top_k(d, 6)), d):7.2f} ms")

    print("--- packed 2-col decode overhead ---")
    rows = 1 << 20
    tab2 = jnp.asarray(rng.integers(0, 1 << 24, size=(rows, 2)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, size=n_idx).astype(np.int32))

    @jax.jit
    def gather_decode(tb, ix):
        r = tb[ix]
        lidx = r[:, 0].astype(jnp.int32)
        packed = r[:, 1].astype(jnp.int32)
        x = (packed >> 16) & 0xFF
        y = (packed >> 8) & 0xFF
        z = packed & 0xFF
        return (lidx + x + y + z).sum()

    print(f"gather+decode 2^20 x 2 (8 MB):     {t(gather_decode, tab2, idx):7.2f} ms")


if __name__ == "__main__":
    main()
