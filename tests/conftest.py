"""Test configuration: run the whole suite on an 8-device virtual CPU mesh.

Mirrors the reference's strategy of testing distributed logic with localhost
CPU processes (`/root/reference/espnet/test/test_distributed_launch.py`);
for JAX the equivalent is xla_force_host_platform_device_count.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
