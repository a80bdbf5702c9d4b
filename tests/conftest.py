"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The environment's sitecustomize pins JAX_PLATFORMS to the remote TPU
# tunnel; the config API (post-import, pre-backend-init) overrides it.
jax.config.update("jax_platforms", "cpu")

import pytest

from particle_simulation_tpu import cross_section


@pytest.fixture(scope="session")
def sine_table():
    return cross_section.load_table()


@pytest.fixture(scope="session")
def const_table():
    return cross_section.load_table(cross_section.bundled_paths()[1])
