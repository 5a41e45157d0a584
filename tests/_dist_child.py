"""Child process of the 2-process jax.distributed test (test_distributed.py).

Usage: python tests/_dist_child.py <process_id> <num_processes> <port> <out>

Brings up jax.distributed through the PRODUCTION env-var path
(parallel/distributed.py initialize), asserts the host-major global mesh,
runs the shared mapping-step fixture over DCN+fake-ICI, and writes the
results to <out>.npz for the parent to compare.
"""

import os
import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["PIN_SLAM_COORDINATOR"] = f"localhost:{port}"
    os.environ["PIN_SLAM_NUM_PROCESSES"] = str(nproc)
    os.environ["PIN_SLAM_PROCESS_ID"] = str(pid)

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))     # repo root (pin_slam_tpu)
    sys.path.insert(0, here)                      # tests/ (_dist_fixture)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pin_slam_tpu.parallel import distributed as pdist

    assert pdist.initialize() is True
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    mesh = pdist.make_global_mesh()
    flat = list(mesh.devices.reshape(-1))
    assert len(flat) == 4 * nproc
    # host-major: the DCN (process) axis must be the OUTER stride
    procs = [d.process_index for d in flat]
    assert procs == sorted(procs), f"mesh not host-major: {procs}"

    from _dist_fixture import run_mapping_step

    hist, feats = run_mapping_step(mesh)

    import numpy as np

    np.savez(out, hist=hist, feats=feats, procs=np.asarray(procs))
    print(f"child {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
