"""Test configuration: force an 8-device CPU platform so the full 4-axis
(dp, fsdp, tp, sp) mesh and ring collectives are exercised without TPU
hardware. Must run before jax initializes its backends."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# env-var JAX_PLATFORMS is overridden by the axon TPU plugin in this image;
# the config API wins over plugin auto-selection.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 forced CPU devices, got {len(devices)}"
    return devices
