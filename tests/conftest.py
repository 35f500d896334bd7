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

# Persistent XLA compile cache for the whole suite (VERDICT r3 next-7):
# half the suite's cost was recompiling near-identical tiny programs
# across test processes and runs. Exported as env vars so SPAWNED
# children (CLI integration tests, 2-process DCN tests) inherit the same
# host-keyed dir even when they never call the framework's init hook —
# jax honors JAX_COMPILATION_CACHE_DIR natively. Opt out with
# MFAS_TEST_COMPILE_CACHE=0 (e.g. to measure true cold compiles).
if os.environ.get("MFAS_TEST_COMPILE_CACHE", "1") != "0":
    from mfas_tpu.data.native import _host_tag

    _cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~/.cache/mfas_tpu/xla"), f"host-{_host_tag()}")
    os.makedirs(_cache_dir, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
