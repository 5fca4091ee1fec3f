import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# are exercised without TPU hardware (see SURVEY.md §4 implication (c)).
#
# Note: this image's sitecustomize registers the experimental "axon" TPU
# platform and pins JAX_PLATFORMS=axon at interpreter start, so the env var
# alone is not enough — jax.config.update below is what actually forces CPU
# (it must run before any backend is initialized).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
