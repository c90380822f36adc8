"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (the reference has no
distributed tests at all — SURVEY.md §4).

NOTE: in this environment the `axon` TPU plugin ignores ``JAX_PLATFORMS``;
``jax.config.update("jax_platforms", ...)`` (set before backend init) is the
reliable mechanism. TPU matmuls also default to bf16 inputs, which would
break fp32 parity tolerances — CPU gives exact fp32.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
