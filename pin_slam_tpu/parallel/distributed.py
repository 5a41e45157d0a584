"""Multi-host execution: ``jax.distributed`` bring-up + DCN-aware global mesh.

The reference is strictly single-process / single-GPU (SURVEY.md section 2.4);
the TPU-native scaling story across HOSTS is:

* every host runs the same SLAM driver and feeds the same sensor stream (SLAM
  is sequential — one sensor), so the dataset/pose books stay replicated;
* the training batch is data-parallel across ALL devices of ALL hosts: the
  global mesh is built host-major (DCN axis outermost), so XLA's gradient
  all-reduce decomposes hierarchically — reduce-scatter/all-gather over ICI
  within each host first, then the small decoder+feature deltas over DCN
  (the "How to Scale Your Model" recipe: DCN traffic must be the outer,
  low-frequency axis);
* host-side back-end state (pose graph, loop descriptors) is identical on
  every host because it is derived from the same fetched results —
  deterministic, no broadcast needed.

A 2-host measurement cannot run in this environment (one tunneled chip); the
degenerate single-process path below exercises the same code (tests/
test_distributed.py + __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from jax.sharding import Mesh

from pin_slam_tpu.parallel.mesh import DATA_AXIS

HOST_AXIS = "host"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up ``jax.distributed`` when a multi-process launch is configured.

    Configuration sources, in priority order:
      1. explicit arguments;
      2. ``PIN_SLAM_COORDINATOR`` / ``PIN_SLAM_NUM_PROCESSES`` /
         ``PIN_SLAM_PROCESS_ID`` environment variables;
      3. ``PIN_SLAM_DIST=1`` — cluster auto-detection
         (``jax.distributed.initialize()`` with no arguments, which works on
         Cloud TPU pods and SLURM/OpenMPI launchers).

    Returns True when distributed mode was initialized; False for the
    (default) single-process run.  Must be called BEFORE any device use.
    """
    import jax

    env = os.environ
    coordinator_address = coordinator_address or env.get("PIN_SLAM_COORDINATOR")
    if num_processes is None:
        num_processes = int(env.get("PIN_SLAM_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(env.get("PIN_SLAM_PROCESS_ID", "-1") or -1)

    if coordinator_address and num_processes > 1 and process_id >= 0:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    if env.get("PIN_SLAM_DIST", "0") == "1":
        jax.distributed.initialize()
        return True
    return False


def make_global_mesh(n_devices: Optional[int] = None) -> Mesh:
    """One flat ``data`` axis over every device of every process, ordered
    HOST-MAJOR so the DCN hop is the outermost stride of the collective ring
    (XLA then runs the all-reduce hierarchically: ICI within a host, DCN
    between hosts).  Degenerates to the single-host mesh at process_count=1 —
    the same code path the tests and the dry run exercise.
    """
    import jax

    n_proc = jax.process_count()
    if n_proc > 1:
        try:
            from jax.experimental import mesh_utils

            per_host = len(jax.local_devices())
            # (hosts, devices-per-host) hybrid mesh -> flatten host-major
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, per_host), dcn_mesh_shape=(n_proc, 1),
                devices=jax.devices())
            flat = devices.reshape(-1)
        except ValueError:
            # platforms without slice topology info (e.g. the 2-process CPU
            # test rig): host-major = sort by (process, id) — for a FLAT
            # 1-axis mesh this is exactly what the hybrid helper produces
            flat = np.asarray(sorted(jax.devices(),
                                     key=lambda d: (d.process_index, d.id)))
    else:
        devs = jax.devices()
        n = len(devs) if n_devices is None else min(n_devices, len(devs))
        flat = np.asarray(devs[:n])
    return Mesh(flat, (DATA_AXIS,))


def host_count() -> int:
    import jax

    return jax.process_count()
