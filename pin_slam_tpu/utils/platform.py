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
