"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPUs the standard way —
`--xla_force_host_platform_device_count=8` (SURVEY.md §4).  This environment
pins JAX_PLATFORMS=axon (the TPU tunnel) in the profile and something re-adds
it at import, so the platform is forced via jax.config, which wins.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# the CPU AOT loader logs a (harmless, enormous) machine-feature banner per
# cache hit; silence C++ ERROR-and-below logs for the test run
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the GAN train step / trainer tests spend
# minutes in XLA CPU compilation; repeat runs on the same machine hit the
# cache and finish in seconds.  VISPEECH_NO_JAX_CACHE=1 disables.
if not os.environ.get("VISPEECH_NO_JAX_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("VISPEECH_JAX_CACHE_DIR", "/tmp/vispeech_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
