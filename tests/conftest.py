"""Test config: force CPU backend with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere (SURVEY.md §4 test strategy).
"""

import os

# Force-set: the container pre-sets JAX_PLATFORMS=axon (TPU tunnel) and its
# sitecustomize re-asserts it via jax.config at interpreter start, so the env
# var alone is not enough — override the live config before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
