"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated without TPU hardware by simulating 8 devices
on CPU (the JAX analog of a v5e-8 slice for compilation/collective purposes).
Pallas kernels run in interpreter mode on CPU automatically.

Note: the environment's sitecustomize imports jax and latches the platform
before conftest runs, so the platform must be overridden via jax.config, and
XLA_FLAGS must be set before the CPU backend is first initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
