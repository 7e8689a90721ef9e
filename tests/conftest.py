"""Test environment: CPU backend, 8 virtual devices, float64 enabled.

Mirrors the reference's strategy of building a float64 debug library for
numeric verification (cpp/CMakeLists.txt:20-37) and adds what the reference
never needed: a virtual 8-device mesh so multi-chip sharding logic is
testable without TPU hardware (SURVEY.md §4).

Note: the surrounding environment may pre-import jax with a remote TPU
backend pinned (sitecustomize); env vars are too late by conftest time, so we
override through jax.config, which takes effect because no backend has been
initialized yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1)
