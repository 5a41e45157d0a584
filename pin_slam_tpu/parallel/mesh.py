"""Multi-chip scaling: device mesh + sharded training / query steps.

The reference has no distributed execution at all (SURVEY.md section 2.4); this
module adds the TPU-native scaling story: query points / training batches are
sharded over a ``jax.sharding.Mesh`` data axis, the neural-point map and decoder
are replicated, and XLA inserts the psum all-reduce for feature/decoder
gradients over ICI automatically (pjit partitioning — the "How to Scale Your
Model" recipe: pick a mesh, annotate shardings, let XLA place collectives).

Map-memory sharding (spatial sharding of the point buffer + hash across hosts)
is the city-scale follow-up; the local-map-windowed workload of the reference
fits comfortably in one chip's HBM (SURVEY.md section 2.4 item 2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops import losses
from pin_slam_tpu.slam import mapper as mp

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else min(n_devices, len(devs))
    return Mesh(np.asarray(devs[:n]), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


class ShardedBatch(NamedTuple):
    coord: jax.Array      # (B,3) world-frame query/sample coords
    sdf_label: jax.Array  # (B,)
    weight: jax.Array     # (B,)
    valid: jax.Array      # (B,)


def shard_batch(mesh: Mesh, batch: ShardedBatch) -> ShardedBatch:
    sh = batch_sharded(mesh)
    return ShardedBatch(*(jax.device_put(x, sh) for x in batch))


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_train_step(mesh: Mesh, mc: npts.MapConfig, mcfg: mp.MapperConfig,
                            offsets: jax.Array):
    """Jitted data-parallel train step: batch sharded over DATA_AXIS, map +
    decoder replicated; the gradient all-reduce rides ICI (inserted by XLA).

    Returns step(lm, params, opt_state, batch) -> (params, opt_state, loss).
    """
    opt = mp.make_optimizer(mcfg)

    @partial(jax.jit,
             in_shardings=(replicated(mesh), replicated(mesh),
                           replicated(mesh), batch_sharded(mesh)),
             out_shardings=(replicated(mesh), replicated(mesh), replicated(mesh)))
    def step(lm, params, opt_state, batch: ShardedBatch):
        knn = npts.knn_search(lm, mc, batch.coord, offsets)

        def loss_fn(p: mp.TrainableParams):
            lmf = lm._replace(geo_features=p.features)
            feat, _, w, _ = npts.interpolate_features(lmf, mc, batch.coord, knn.lidx)
            pred, _ = dec.blended_sdf(p.geo, feat, w, mc.weighted_first, mcfg.sdf_scale)
            return losses.sdf_bce_loss(pred, batch.sdf_label, mcfg.sigma_sigmoid,
                                       batch.weight, mcfg.loss_weight_on,
                                       valid=batch.valid)

        import optax

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    return step


def make_sharded_mapping_loop(mesh: Mesh, mc: npts.MapConfig,
                              mcfg: mp.MapperConfig, num_iters: int,
                              after_pgo: bool = False, pos_encode=None):
    """The PRODUCTION per-frame training loop (mapper.mapping_loop_cached),
    data-parallel over the device mesh: each device draws its own batch shard
    from the (replicated) replay pool, gradients are pmean-reduced over ICI
    inside the scan, and the replicated Adam update keeps params identical
    everywhere — total batch = mcfg.bs, split mcfg.bs // n per device.

    Drop-in for mapping_loop_cached's (lm, params, opt_state, pool, key,
    dec_scale, use_new) -> (lm, params, opt_state, loss_hist) call shape;
    the SlamSystem routes through this when config.dp_devices > 1.
    """
    import dataclasses

    from jax.experimental.shard_map import shard_map

    n = int(np.prod(mesh.devices.shape))
    if mcfg.bs % n:
        raise ValueError(f"bs {mcfg.bs} not divisible by {n} devices")
    mcfg_dp = dataclasses.replace(
        mcfg, bs=mcfg.bs // n,
        bs_new_sample=max(1, mcfg.bs_new_sample // n))

    def inner(lm, params, opt_state, pool, key, dec_scale, use_new):
        return mp.mapping_loop_cached(
            lm, mc, params, opt_state, pool, mcfg_dp, key, dec_scale, use_new,
            num_iters=num_iters, after_pgo=after_pgo, pos_encode=pos_encode,
            axis_name=DATA_AXIS)

    return shard_map(inner, mesh=mesh,
                     in_specs=(P(), P(), P(), P(), P(), P(), P()),
                     out_specs=(P(), P(), P(), P()), check_rep=False)


def make_sharded_query(mesh: Mesh, mc: npts.MapConfig, offsets: jax.Array,
                       sdf_scale: float):
    """Jitted data-parallel SDF inference: query points sharded, map replicated
    (mesh grid queries / registration query fan-out)."""

    @partial(jax.jit,
             in_shardings=(replicated(mesh), replicated(mesh), batch_sharded(mesh)),
             out_shardings=(batch_sharded(mesh), batch_sharded(mesh)))
    def query(lm, geo_params, pts):
        knn = npts.knn_search(lm, mc, pts, offsets)
        feat, _, w, _ = npts.interpolate_features(lm, mc, pts, knn.lidx)
        sdf, _ = dec.blended_sdf(geo_params, feat, w, mc.weighted_first, sdf_scale)
        return sdf, knn.nn_count

    return query
