import os

# Run the test suite on a virtual 8-device CPU mesh so sharding paths are
# exercised without TPU hardware (SURVEY.md §4: the multi-host test story).
# NOTE: the JAX_PLATFORMS env var alone does not override the axon TPU plugin
# in this image; jax.config does.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
