import os

# Tests run on a virtual multi-device CPU mesh; Pallas kernels run in
# interpret mode (see qeft_tpu.ops). XLA_FLAGS must be set before the CPU
# backend initializes. The axon sitecustomize force-registers the TPU
# backend at interpreter startup and overrides JAX_PLATFORMS, so the
# platform must be forced back to cpu via jax.config, not the env.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests"
    )


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    jaxlib aborts (SIGABRT) when one process accumulates too many large
    interpret-mode executables — round 3 hit it serializing test_tp_train's
    programs and quarantined that one file into a subprocess; round 4's new
    kernel tests moved the breaking point into the middle of the suite.
    Clearing per module keeps the peak executable count bounded for every
    ordering instead of patching whichever file crosses the line this time."""
    yield
    jax.clear_caches()
