"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`) — the TPU-native answer to
testing multi-node layouts without a physical pod. Must run before jax import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: tests never run on the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# sitecustomize pre-imports jax._src, which latches JAX_PLATFORMS from the
# ambient env (axon) before this file runs — override via config, not env.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
