"""Test harness config: force CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU even if the ambient environment selects a TPU platform (e.g.
# JAX_PLATFORMS=axon): unit tests must be hermetic and fast.
# JAX_PLATFORMS alone is NOT enough: the axon site hook re-registers the
# tunneled TPU as the default backend whenever PALLAS_AXON_POOL_IPS is
# set, silently routing "cpu" test runs through the TPU (discovered when
# a TPU-only miscompile surfaced in this suite).  Drop the pool var so
# the plugin never engages; TPU behavior is covered by tpu_check.py +
# bench.py on real hardware.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax AT INTERPRETER BOOT (before this
# file runs), so jax's config has already snapshotted JAX_PLATFORMS=axon
# from the ambient env — the os.environ writes above are too late for
# the platform choice (discovered round 3: the whole suite was silently
# running on the tunneled TPU, 1 device, contending with bench runs).
# Backends are not initialized yet at conftest time, so forcing the
# config value directly still works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Isolate the engine's capacity-memory file per test session: tests must
# not read (or pollute) the user's production ~/.cache capmem — shared
# state made retry-budget tests order-dependent and skewed bench tuning.
import tempfile  # noqa: E402

os.environ["SAHARA_CAPMEM_PATH"] = os.path.join(
    tempfile.gettempdir(), f"sahara_capmem_test_{os.getpid()}.json"
)
