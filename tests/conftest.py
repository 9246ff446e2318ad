"""Test configuration: force an 8-device CPU platform so the full 4-axis
(dp, fsdp, tp, sp) mesh and ring collectives are exercised without TPU
hardware. Must run before jax initializes its backends."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # XLA-CPU kills the process when a collective's participants don't
    # all arrive within 40s; with 8 device threads time-slicing this
    # host's SINGLE core, deep-context ring steps between permutes blow
    # that easily (observed: F rendezvous.cc termination at 128K tokens,
    # tests/test_ring_stress.py). These are watchdogs, not correctness.
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
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
