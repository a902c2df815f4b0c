"""Test config: run everything on CPU with 8 virtual devices.

The standard JAX fake-mesh technique (SURVEY.md §4): multi-device tests run
on ``xla_force_host_platform_device_count=8`` CPU devices.  Note this
container's sitecustomize force-registers the axon TPU backend at interpreter
start, so the platform must be overridden via ``jax.config`` (env vars alone
are too late by conftest time).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs
