"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4).

NOTE: the environment's sitecustomize registers the ``axon`` TPU plugin
and force-sets ``jax_platforms="axon,cpu"`` via ``jax.config.update`` —
the JAX_PLATFORMS env var alone does NOT stick.  Tests must run on local
CPU (fast, and they must not contend with benchmarks for the tunneled
chip), so re-update the config here before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.local_device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
