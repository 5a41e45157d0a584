"""Optional wandb logging surface (ref utils/tools.py:119-132 ``setup_wandb``,
utils/mapper.py:586-590 per-iter loss logging, pin_slam.py:346-348 per-frame
timing logging).

The wandb package is not part of this image, so the surface degrades to a
no-op unless wandb is importable AND ``config.wandb_vis_on`` is set — the
call sites stay unconditional and cost nothing when disabled.
"""

from __future__ import annotations

from typing import Optional

_run = None
_enabled = False


def setup_wandb(config, run_name: str = "") -> bool:
    """Initialize a wandb run from the Config (ref utils/tools.py:119-132).
    Returns True when live logging is active."""
    global _run, _enabled
    _enabled = False
    if not getattr(config, "wandb_vis_on", False):
        return False
    try:
        import wandb
    except ImportError:
        if not config.silence:
            print("[wandb_log] wandb_vis_on set but wandb is not installed; "
                  "logging disabled")
        return False
    _run = wandb.init(project="pin-slam-tpu", name=run_name or config.name,
                      config={k: v for k, v in vars(config).items()
                              if isinstance(v, (int, float, str, bool))})
    _enabled = True
    return True


def log(metrics: dict, step: Optional[int] = None) -> None:
    """Log a metrics dict (no-op unless setup_wandb enabled a run)."""
    if _enabled and _run is not None:
        _run.log(metrics, step=step)


def finish() -> None:
    global _run, _enabled
    if _enabled and _run is not None:
        _run.finish()
    _run, _enabled = None, False
