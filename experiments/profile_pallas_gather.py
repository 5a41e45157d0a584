"""Pallas feasibility microbench: in-kernel random row gather / scatter-add on
a VMEM-resident feature table — the primitive the fused training kernel needs.

Timing discipline (memory/tpu-cost-model): single-op timings through the axon
tunnel lie; every measurement here runs R in-kernel repetitions and reports the
SLOPE between two R values, which cancels the ~26 ms RTT and launch overhead.

Run: python experiments/profile_pallas_gather.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pin_slam_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 65536          # local feature table rows (bench local_map_capacity)
F = 8              # feature width
B = 16384          # batch
K = 6              # neighbors / batch row


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, out


def make_gather_kernel(reps):
    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]                      # (L, F) VMEM value
        idx = idx_ref[:]                      # (B*K,) i32

        def body(t, acc):
            ix = (idx + t) % L
            g = jnp.take(tab, ix, axis=0)     # (B*K, F) random row gather
            return acc + jnp.sum(g, axis=0)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((F,), jnp.float32))

    return jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((F,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    ))


def make_scatter_kernel(reps):
    def kern(tab_ref, idx_ref, val_ref, out_ref):
        idx = idx_ref[:]
        val = val_ref[:]

        def body(t, tab):
            ix = (idx + t) % L
            return tab.at[ix].add(val)        # random row scatter-add

        out_ref[:] = jax.lax.fori_loop(0, reps, body, tab_ref[:])

    return jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((L, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    ))


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((L, F)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, size=(B * K,)).astype(np.int32))
    val = jnp.asarray(rng.standard_normal((B * K, F)).astype(np.float32))

    # ---- XLA baselines (chained) ----
    def xla_gather(reps):
        @jax.jit
        def f(tab, idx):
            def body(t, acc):
                return acc + jnp.sum(jnp.take(tab, (idx + t) % L, axis=0), axis=0)
            return jax.lax.fori_loop(0, reps, body, jnp.zeros((F,), jnp.float32))
        return f

    def xla_scatter(reps):
        @jax.jit
        def f(tab, idx, val):
            def body(t, tb):
                return tb.at[(idx + t) % L].add(val)
            return jax.lax.fori_loop(0, reps, body, tab)
        return f

    for name, mk, args in [
        ("xla gather ", xla_gather, (tab, idx)),
        ("xla scatter", xla_scatter, (tab, idx, val)),
    ]:
        t1, _ = timed(mk(10), *args)
        t2, _ = timed(mk(60), *args)
        per = (t2 - t1) / 50.0
        print(f"{name}: per-rep {per:7.3f} ms ({per * 1e6 / (B * K):6.1f} ns/row)",
              flush=True)

    # ---- Pallas ----
    try:
        g10 = make_gather_kernel(10)
        t1, o1 = timed(g10, tab, idx)
        g60 = make_gather_kernel(60)
        t2, _ = timed(g60, tab, idx)
        per = (t2 - t1) / 50.0
        print(f"pallas gather : per-rep {per:7.3f} ms "
              f"({per * 1e6 / (B * K):6.1f} ns/row)  checksum={float(o1[0]):.3f}",
              flush=True)
        ref = None
        for _ in range(1):
            def body(t, acc):
                return acc + jnp.sum(jnp.take(tab, (idx + t) % L, axis=0), axis=0)
            ref = jax.lax.fori_loop(0, 10, body, jnp.zeros((F,), jnp.float32))
        print("gather allclose vs xla:", bool(jnp.allclose(o1, ref, rtol=1e-4)),
              flush=True)
    except Exception as e:
        print("pallas gather FAIL:", type(e).__name__, str(e)[:400], flush=True)

    try:
        s10 = make_scatter_kernel(10)
        t1, o1 = timed(s10, tab, idx, val)
        s60 = make_scatter_kernel(60)
        t2, _ = timed(s60, tab, idx, val)
        per = (t2 - t1) / 50.0
        print(f"pallas scatter: per-rep {per:7.3f} ms "
              f"({per * 1e6 / (B * K):6.1f} ns/row)", flush=True)

        def body(t, tb):
            return tb.at[(idx + t) % L].add(val)
        ref = jax.lax.fori_loop(0, 10, body, tab)
        print("scatter allclose vs xla:",
              bool(jnp.allclose(o1, ref, rtol=1e-3, atol=1e-3)), flush=True)
    except Exception as e:
        print("pallas scatter FAIL:", type(e).__name__, str(e)[:400], flush=True)


if __name__ == "__main__":
    main()
