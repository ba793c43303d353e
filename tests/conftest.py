"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding code is validated without TPU hardware the standard way:
XLA's host platform is forced to expose 8 devices.  Must run before jax is
imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
