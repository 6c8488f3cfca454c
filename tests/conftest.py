"""Test config: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of exercising the multi-device path on a
single host (mimic/tests/test_training.py:116-119 runs DDP via mp.spawn on
one node); here a forced host-platform device count gives 8 CPU 'chips'
for mesh/sharding tests without TPU hardware.

Note: the environment's sitecustomize may force-register a remote TPU
backend and override JAX_PLATFORMS, so the CPU override must go through
jax.config *after* import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persist compiled executables across test runs (the suite is compile-bound)
jax.config.update("jax_compilation_cache_dir", "/tmp/mopoe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
