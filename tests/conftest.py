"""Test environment: force the portable CPU backend with 8 virtual devices
so multi-chip sharding is exercised without TPU hardware (SURVEY.md section 4
"Implication for the TPU build"). Must run before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The preinstalled 'axon' TPU plugin ignores the JAX_PLATFORMS env var in
# this image; the config flag does win.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
    "tests must run on the 8-device virtual CPU mesh, got: " + str(jax.devices())
)

# Persistent XLA compilation cache: the suite's wall time is dominated by
# repeat CPU compiles of the same 608² programs across test processes
# (subprocess-driven CLI/serving tests re-pay every compile). Cache keys
# are HLO hashes, so results are unaffected. Disable with
# SFA3D_TEST_NO_COMPILE_CACHE=1 to measure true cold-compile behavior.
if not os.environ.get("SFA3D_TEST_NO_COMPILE_CACHE"):
    from sfa3d_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(os.path.expanduser("~"), ".cache", "sfa3d_tpu",
                     "xla_cache_tests")
    )


@pytest.fixture()
def rng():
    # function-scoped: every test draws from the same fresh seed, so test
    # data does not depend on execution order (a session-scoped generator
    # made tolerances flake under -x vs full-suite runs)
    return np.random.default_rng(2020)
