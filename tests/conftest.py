"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment pre-registers a TPU PJRT plugin (axon) and pins
JAX_PLATFORMS=axon, so the env var alone is not enough; jax.config.update
after import is authoritative.  Sharding/collective tests exercise a
multi-chip topology without TPU hardware; kernels run in interpret mode
where needed.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_TESTS = "/root/reference/tests"

# Test tiers (pytest.ini markers): the interpret-mode Pallas modules are
# ~94% of the suite's wall time, so the in-round gate is
# `pytest -m fast` (~3 min) and kernel changes run `-m kernels` (~40 min);
# the full suite stays the round-end gate.
KERNEL_MODULES = {
    "test_pallas", "test_circ", "test_multi", "test_wavefront_pallas",
    "test_expand",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__.rsplit(".", 1)[-1]
        if name in KERNEL_MODULES:
            item.add_marker(pytest.mark.kernels)
        else:
            item.add_marker(pytest.mark.fast)
        if item.name.startswith("test_long"):
            item.add_marker(pytest.mark.long)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def fixtures_dir():
    return REFERENCE_TESTS
