"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-device without a cluster": XLA's host
platform is forced to expose 8 devices so jax.sharding tests exercise real
collectives, and all Pallas kernels fall back to their XLA-equivalent paths
(equivalence between the two is itself under test in test_sampling.py).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon sitecustomize registers the TPU plugin before conftest runs, so the
# env var alone is not enough — force the platform through the config API.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
