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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
