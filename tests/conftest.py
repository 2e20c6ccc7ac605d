"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon, so env vars alone don't
stick — we override via jax.config before any backend is initialized
(backend init is lazy; conftest runs before test modules import devices).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (multi-minute)"
    )
