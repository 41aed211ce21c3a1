"""Test configuration: run the whole suite on an 8-device virtual CPU mesh.

Mirrors the reference's strategy of testing distributed logic with localhost
CPU processes (`/root/reference/espnet/test/test_distributed_launch.py`);
for JAX the equivalent is xla_force_host_platform_device_count.

Note: this environment preloads jax with a TPU ('axon') backend via
sitecustomize, so JAX_PLATFORMS in os.environ is not enough — the platform
must be forced through jax.config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite compiles many tiny models
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/agacs_tpu/jax_test"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
