"""Environment-driven JAX platform selection for CLI entry points.

On this host a sitecustomize force-registers the TPU plugin and the
standard ``JAX_PLATFORMS`` env var is ignored; the working override is
``jax.config.update("jax_platforms", ...)`` before any backend
initializes.  ``CP360_PLATFORM=cpu`` gives subprocesses (the supervisor's
children, CI) a reliable way to pick the backend.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("CP360_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def apply_platform(cfg=None) -> None:
    """Config-aware platform pick: CP360_PLATFORM wins, else the reference's
    ``use_gpu`` key (config.yaml:11 — there it gates .cuda() calls; here
    ``use_gpu: false`` means "stay off the accelerator", i.e. force the CPU
    backend).  Call after loading the config, before any backend
    initializes."""
    if not os.environ.get("CP360_PLATFORM") and cfg is not None \
            and not getattr(cfg, "use_gpu", True):
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        apply_platform_env()
