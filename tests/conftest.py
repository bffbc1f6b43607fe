"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (set BEFORE jax import)."""

import os
import sys

# Force CPU: the session env presets JAX_PLATFORMS=axon (remote TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
