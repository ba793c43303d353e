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
