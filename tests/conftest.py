"""Test configuration: force a virtual 8-device CPU mesh.

Tests must run without TPU hardware.  The environment may preload jax with a
TPU platform plugin (sitecustomize); ``jax.config.update`` still switches the
platform as long as no backend has been initialized, and XLA_FLAGS is read at
first backend init, so both are applied here before any jax op runs.
Sharding tests rely on ``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Geometry einsums must not silently drop to bf16 on accelerators.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: pass-program compiles dominate suite wall time
# (minutes each on CPU); repeated local runs hit the cache and drop to
# seconds.  Fresh checkouts still pay full compile once.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
