"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding code is validated without TPU hardware the standard way:
XLA's host platform is forced to expose 8 devices.

Note: this machine's sitecustomize pre-imports jax and registers the 'axon'
TPU plugin with JAX_PLATFORMS=axon, so setting the env var here is too late —
jax.config must be updated directly (before any backend initializes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
