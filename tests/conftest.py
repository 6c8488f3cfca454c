"""Test config: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of exercising the multi-device path on a
single host (mimic/tests/test_training.py:116-119 runs DDP via mp.spawn on
one node); here a forced host-platform device count gives 8 CPU 'chips'
for mesh/sharding tests without TPU hardware.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
