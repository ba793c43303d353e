"""Environment-driven JAX platform selection for CLI entry points.

On this host a sitecustomize force-registers the TPU plugin and the
standard ``JAX_PLATFORMS`` env var is ignored; the working override is
``jax.config.update("jax_platforms", ...)`` before any backend
initializes.  ``CP360_PLATFORM=cpu`` gives subprocesses (the supervisor's
children, CI) a reliable way to pick the backend.
"""

from __future__ import annotations

import os


def guard_compile_cache() -> bool:
    """Disable a configured persistent compilation cache before TPU work.

    The axon TPU plugin deterministically WEDGES when executing a
    cache-DESERIALIZED executable (reproduced round 3: the jit dispatch
    returns, the first result fetch never does — see CLAUDE.md), so a
    populated cache turns every warm start into a silent hang.  Every CLI
    calls this before the backend initializes; set
    ``CP360_ALLOW_COMPILE_CACHE=1`` to opt back in on hosts whose plugin
    executes deserialized programs correctly.  Returns True if a
    configured cache was disabled.
    """
    if os.environ.get("CP360_ALLOW_COMPILE_CACHE") == "1":
        return False
    configured = bool(os.environ.pop("JAX_COMPILATION_CACHE_DIR", None))
    import jax

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        configured = True
    if configured:
        jax.config.update("jax_compilation_cache_dir", None)
        import sys

        print(
            "cp360: persistent compilation cache DISABLED — executing "
            "cache-deserialized executables wedges this TPU plugin "
            "(set CP360_ALLOW_COMPILE_CACHE=1 to keep it)",
            file=sys.stderr,
        )
    return configured


def apply_platform_env() -> None:
    plat = os.environ.get("CP360_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    if plat != "cpu":  # a CPU-forced run never touches the wedge-prone plugin
        guard_compile_cache()


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
