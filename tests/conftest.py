"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-device sharding tests run against ``xla_force_host_platform_device_count``
virtual CPU devices — the mechanism SURVEY.md §4 prescribes for testing
multi-chip code without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize registers an "axon" TPU backend and forces
# jax_platforms="axon,cpu" via jax.config — which overrides the env var. Tests
# must run on the virtual 8-device CPU mesh, so force the config back before
# any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable jax_compilation_cache_dir here. jaxlib 0.9.0's CPU
# executable deserialization aborts the process (SIGABRT in
# compilation_cache.get_executable_and_time) when reading back its own
# entries, so the persistent cache cannot be used on the test mesh. Suite
# time is managed by marking heavyweight end-to-end tests `slow` instead.
