"""Pallas TPU kernel for the append-time kNN candidate RANKING.

``mapper._probe_rank`` ranks each sample's hash-probed candidate ball (K=33
rows) by exact distance, keeps the k=6 nearest, and selects their payloads.
In XLA this materializes (G,n,K)-shaped intermediates for the distance/
validity/k-min/one-hot-select chain — measured ~13 ms/frame at bench shapes
on v5e over the ~25 ms probe-gather floor.  This kernel fuses the whole
chain after the (XLA) hash-row gather.

Layout: the gathered rows arrive FIELD-MAJOR — (G, 5*K) with columns
[x*K | y*K | z*K | lidx*K | gidx*K] (one XLA transpose+slice of the
(G,K,8) gather output) — so every per-candidate operation is a lane-aligned
(TB, K) vector op.  Outputs are packed (G, n*k*5) rows:
[gidx, x, y, z, valid] per selected neighbor.

The call is CHUNKED over row blocks: this XLA toolchain stages every Pallas
operand/result in the 16 MB scoped-vmem budget (verified: a single
32k x 264 operand requested 59.8 MB and failed to compile), so each call is
kept to ~8 MB of padded operands.

Selection reproduces ``exact_k_min`` exactly: k argmin passes with
first-occurrence tie-breaking (iota tie-break), invalid candidates pinned at
the reference's INVALID_DIST2 (model/neural_points.py:561).

2-D-only values, concat-based assembly (see ops/train_kernel.py for the
Mosaic constraints this respects).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INVALID_DIST2 = 9e3      # matches models/neural_points.py


@dataclasses.dataclass(frozen=True)
class RankKernelConfig:
    G: int                # probe groups (padded to tiles*8)
    n: int                # queries per group sharing the candidate ball
    K: int                # candidates per ball (template size)
    k: int                # neighbors kept
    L: int                # local capacity (lidx >= L -> invalid)
    max_valid_dist2: float
    TB: int = 1024        # tile rows

    @property
    def tiles(self) -> int:
        return self.G // self.TB


def _rank_kernel(cfg: RankKernelConfig, rows_ref, q_ref, out_ref):
    K, k, n = cfg.K, cfg.k, cfg.n
    rows = rows_ref[...]                       # (TB, 5K) field-major
    q = q_ref[...]                             # (TB, 3n)
    out_cols = out_ref.shape[1]
    xs = rows[:, 0 * K:1 * K]
    ys = rows[:, 1 * K:2 * K]
    zs = rows[:, 2 * K:3 * K]
    lidx = rows[:, 3 * K:4 * K]
    gidx = rows[:, 4 * K:5 * K]
    iota = jax.lax.broadcasted_iota(jnp.int32, (cfg.TB, K), 1
                                    ).astype(jnp.float32)
    lvalid = lidx < float(cfg.L)

    outs = []
    for qq in range(n):
        qx = q[:, 3 * qq + 0:3 * qq + 1]
        qy = q[:, 3 * qq + 1:3 * qq + 2]
        qz = q[:, 3 * qq + 2:3 * qq + 3]
        dx, dy, dz = xs - qx, ys - qy, zs - qz
        d2 = dx * dx + dy * dy + dz * dz
        valid = lvalid & (d2 <= cfg.max_valid_dist2)
        d2m = jnp.where(valid, d2, _INVALID_DIST2)
        for _ in range(k):
            dmin = jnp.min(d2m, axis=1, keepdims=True)
            cand = jnp.where(d2m == dmin, iota, float(K))
            j = jnp.min(cand, axis=1, keepdims=True)
            jm = iota == j
            sel = lambda a: jnp.sum(jnp.where(jm, a, 0.0), axis=1,
                                    keepdims=True)
            v_ok = sel(valid.astype(jnp.float32))
            g_out = jnp.where(v_ok > 0.5, sel(gidx), -1.0)
            outs.extend([g_out, sel(xs), sel(ys), sel(zs), v_ok])
            # mask ABOVE the invalid level (exact_k_min uses inf): an
            # exhausted ball must re-pick untouched INVALID columns, never a
            # previously selected valid one
            d2m = jnp.where(jm, jnp.float32(3e38), d2m)
    pad = out_cols - n * k * 5
    if pad:
        # the output block ALIASES the rows operand (same (TB, 5K) shape) so
        # the toolchain's full-operand scoped-vmem staging is shared — the
        # separate out staging disappears and the row chunk can grow
        outs.append(jnp.zeros((cfg.TB, pad), jnp.float32))
    out_ref[...] = jnp.concatenate(outs, axis=1)




def probe_rank_pallas(cfg: RankKernelConfig, rows_fm, queries,
                      interpret: bool = False):
    """rows_fm (G0, 5K) field-major gathered rows; queries (G0, 3n).

    Returns (gidx (G0,n,k) i32, pos (G0,n,k,3), valid (G0,n,k)) — identical
    semantics to mapper._probe_rank's ranking."""
    G0 = rows_fm.shape[0]
    # temporaries scale with n (per-query (TB,K) live values): shrink the
    # tile so the kernel's VMEM footprint stays flat across block shapes
    tb_max = max(8, 1024 // max(cfg.n, 1) // 8 * 8)
    TB = min(cfg.TB, tb_max, -(-G0 // 8) * 8)
    # chunk rows: the scoped-vmem budget constrains the STAGED operands
    # (every operand/result padded to 128 lanes: rows 5K->256, queries->128,
    # out->ceil(nk5/128)*128), NOT the per-tile temporaries — so the chunk
    # can be much larger than the tile.  ~8 MB of staged rows per call;
    # kitti-profile shapes previously ran 4*TB=1024-row chunks = ~180
    # serialized kernel launches/frame at ~0.5 ms each (measured 137 ms
    # append; the launch train, not the math, dominated)
    cols0 = cfg.n * cfg.k * 5
    # alias the output into the rows operand when it fits (same (CH, 5K)
    # block): the toolchain stages FULL operands in scoped vmem, so sharing
    # the buffer both removes the output's staging AND lets the chunk grow —
    # fewer serialized kernel launches (measured ~0.35 ms/launch, the
    # dominant term of the kitti append at r4 chunk sizes)
    alias = 5 * cfg.K >= cols0
    pad128 = lambda c: -(-c // 128) * 128
    staged_row_bytes = (pad128(5 * cfg.K) + pad128(3 * cfg.n)
                        + (0 if alias else pad128(cols0))) * 4
    # 6 MB staged target: the toolchain's true staging overhead measured
    # ~2x this model at some shapes (a 4096-row n=1 chunk once left only
    # 0.14 MB of the 16 MB budget)
    CH = min(max(TB, (6 * 2 ** 20 // staged_row_bytes) // TB * TB),
             max(TB, G0))
    CH = -(-CH // TB) * TB
    cfg = dataclasses.replace(cfg, TB=TB)
    G = -(-G0 // CH) * CH
    if G != G0:
        # padded groups: sentinel rows (lidx = L) rank to all-invalid
        pad_r = jnp.zeros((G - G0, rows_fm.shape[1]), jnp.float32)
        pad_r = pad_r.at[:, 3 * cfg.K:4 * cfg.K].set(float(cfg.L))
        rows_fm = jnp.concatenate([rows_fm, pad_r], 0)
        queries = jnp.concatenate(
            [queries, jnp.zeros((G - G0, queries.shape[1]), jnp.float32)], 0)

    cfg = dataclasses.replace(cfg, G=CH)
    cols = 5 * cfg.K if alias else cols0
    call = pl.pallas_call(
        functools.partial(_rank_kernel, cfg),
        grid_spec=pl.GridSpec(
            grid=(CH // TB,),
            in_specs=[
                pl.BlockSpec((TB, rows_fm.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, queries.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((CH, cols), jnp.float32),
        input_output_aliases={0: 0} if alias else {},
        interpret=interpret,
    )
    # lax.scan serializes the chunk calls: scheduled concurrently, their
    # scoped-vmem allocations SUM (8 x ~7 MB failed the 16 MB budget)
    n_ch = G // CH
    if n_ch == 1:
        out = call(rows_fm, queries)
    else:
        def one(_, rq):
            r, qv = rq
            return None, call(r, qv)
        _, out = jax.lax.scan(
            one, None,
            (rows_fm.reshape(n_ch, CH, -1), queries.reshape(n_ch, CH, -1)))
        out = out.reshape(G, -1)

    out = out[:G0, :cols0].reshape(G0, cfg.n, cfg.k, 5)
    gidx = jnp.round(out[..., 0]).astype(jnp.int32)
    pos = out[..., 1:4]
    valid = out[..., 4] > 0.5
    gidx = jnp.where(valid, gidx, -1)
    return gidx, pos, valid
