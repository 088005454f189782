"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPUs the standard way —
`--xla_force_host_platform_device_count=8` (SURVEY.md §4).  This environment
pins JAX_PLATFORMS=axon (the TPU tunnel) in the profile and something re-adds
it at import, so the platform is forced via jax.config, which wins.
"""

import os

# VISPEECH_TEST_PLATFORM=tpu runs the suite against the real chip —
# required for the TPU-only tier (in-kernel dropout tests etc. skip on
# CPU: no interpreter PRNG lowering).  Default: 8 virtual CPU devices.
_TEST_PLATFORM = os.environ.get("VISPEECH_TEST_PLATFORM", "cpu")
if _TEST_PLATFORM == "cpu":
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

if _TEST_PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU tier: f32 matmuls on TPU default to fast bf16 passes (~6e-3
    # error), which breaks the torch-oracle / XLA-parity tolerances that
    # CPU runs exactly.  The tier tests CORRECTNESS, so pin exact f32
    # matmuls; perf benches use the production default separately.
    jax.config.update("jax_default_matmul_precision", "highest")
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

if _TEST_PLATFORM == "cpu":
    assert jax.devices()[0].platform == "cpu", jax.devices()

# ---------------------------------------------------------------- smoke tier
# `pytest -m smoke` = a <3-minute-cold slice touching every subsystem
# shallowly (round-4 review item #7: one suite invocation must fit a
# 10-minute cold budget; the full fast tier only fits warm).  Curated here
# in ONE place rather than scattered marks: prefixes select whole
# host-only modules; exact ids select the cheapest jit-bearing test of
# each device-code subsystem.
SMOKE_PREFIXES = (
    "tests/test_text.py",           # L0 text frontend (host-only)
    "tests/test_dataset.py",        # L2 data pipeline (numpy)
    "tests/test_offline_tools.py",  # L1 offline tools (host)
    "tests/test_utils.py",          # checkpoints/logging (tiny arrays)
    "tests/test_infer.py::TestBatchPlanning",   # serving planner (host)
)
SMOKE_PREFIX_IDS = (
    # one cheap representative per device subsystem (prefix match so
    # parametrized variants ride along)
    "tests/test_dsp.py::TestSpectrogram::test_frame_count",
    "tests/test_ops_core.py::TestSpline::test_forward_inverse_identity",
    "tests/test_ops_core.py::TestWNAndBlocks::test_wn_mask_and_cond",
    "tests/test_pallas_kernels.py::TestRelativeSelfAttention::test_matches_xla",
    "tests/test_sharding.py::test_intended_params_get_model_axis",
    "tests/test_serving_policy.py::test_default_policy_per_backend",
)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        nid = item.nodeid
        if any(nid.startswith(p) for p in SMOKE_PREFIXES + SMOKE_PREFIX_IDS):
            item.add_marker(_pytest.mark.smoke)
