"""Platform helpers: persistent XLA compilation cache + platform forcing.

On the remote-attached TPU, every one-off compile pays a tunnel round trip;
the persistent cache makes warm starts near-instant across processes.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get("PIN_SLAM_TPU_CACHE",
                                  os.path.expanduser("~/.cache/pin_slam_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs


def force_platform(name: str) -> None:
    import jax

    jax.config.update("jax_platforms", name)


def set_matmul_precision(precision: str = "highest") -> None:
    """Pin the default matmul precision for this process.

    Every matmul in this framework is tiny (64-wide MLPs, k=6 blends, one-hot
    selects) and several carry value-cast indices or metric coordinates that
    the TPU MXU's default bf16 input rounding corrupts silently (measured:
    bench reg_valid 0/12 with the default).  Entry points call this explicitly
    so the guarantee doesn't rely on constructing a ``SlamSystem``
    (ADVICE r2 #4: library paths like the ``vis_pin_map`` query view need it
    too, and a constructor should not silently mutate process-global state).
    """
    import jax

    jax.config.update("jax_default_matmul_precision", precision)
