"""Test config: force a LOCAL CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware.

The session image installs a sitecustomize that registers the remote
TPU (axon) PJRT plugin in every Python process and force-updates
``jax_platforms`` to "axon,cpu" — overriding the JAX_PLATFORMS env var.
Backends initialise lazily, so updating the config back to "cpu" here
(before any jax use) restores a local CPU run; XLA_FLAGS must be set
before the CPU client is created to get the 8 virtual devices.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
