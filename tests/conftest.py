"""Test configuration: force a virtual 8-device CPU mesh BEFORE jax
initialises, so pjit/shard_map collectives are exercised without TPUs
(survey section 4 test-strategy notes)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The axon TPU plugin registers itself via sitecustomize and overrides
# JAX_PLATFORMS from the environment, so force CPU via the config API
# (must happen before any backend is initialised).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_dataset():
    """Small synthetic split shared across tests."""
    from hypergraph_diffusion_for_recommendation_tpu.data import synthetic_dataset

    train, test, _ = synthetic_dataset(n_users=120, n_items=300, mean_degree=20.0, seed=3)
    return train, test


@pytest.fixture(scope="session")
def tiny_kg_dataset():
    from hypergraph_diffusion_for_recommendation_tpu.data import synthetic_dataset

    return synthetic_dataset(n_users=120, n_items=300, mean_degree=20.0, seed=3, with_kg=True)
