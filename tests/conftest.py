"""Test harness config: force CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU even if the ambient environment selects a TPU platform (e.g.
# JAX_PLATFORMS=axon): unit tests must be hermetic and fast.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
