import os

# Unit tests always run on CPU with a virtual 8-device mesh so multi-chip
# sharding is exercised without hardware (SURVEY.md §4.5). The env var must
# be set before backend init; the jax.config.update then overrides the TPU
# plugin's programmatic jax_platforms forcing (it calls
# jax.config.update("jax_platforms", ...) from sitecustomize, which beats
# env vars).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
