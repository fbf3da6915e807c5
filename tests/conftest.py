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
