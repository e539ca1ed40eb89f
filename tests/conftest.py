"""Test environment: 8 virtual CPU devices so mesh/sharding tests run
without TPU hardware (the driver separately dry-runs the multichip path).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# force-override: the sandbox exports JAX_PLATFORMS=axon (the TPU tunnel),
# and tests must run hermetically on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the sandbox's sitecustomize force-registers the axon TPU backend via
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the env
# var -- override it back AFTER jax import, before any backend init
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    f"tests expect the 8-device virtual CPU mesh, got {jax.devices()}")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long multi-process tests (spawn fresh JAX procs)")
